package graft

import graft.engine.{ConnOptions, GraftEngine}
import graft.streaming.Changelog
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** API-parity tests: the README walkthrough (README.md:29-123) and the
  * demo_simple scenario (demo.py:58-108) re-expressed on the Scala facade,
  * plus MV/changelog/subscription semantics. */
class EngineSpec extends SparkSpec {

  private lazy val rw: GraftEngine = GraftEngine.open(ConnOptions(), Some(spark))

  private def productSchema = StructType(Seq(
    StructField("product", StringType), StructField("price", DoubleType)))

  test("handshake: version table + version() function") {
    assert(rw.fetch("SELECT version() AS v").head.getString(0).startsWith("graft-"))
    assert(rw.fetch("SELECT * FROM _risingwave_py_version").map(_.getInt(0)) == Seq(1))
  }

  test("README walkthrough: table -> inserts -> MV avg -> incremental update") {
    rw.createTable("test_product", productSchema)
    // buffered inserts: buf_size=5, nothing visible pre-flush boundary
    rw.insertRow("test_product", values = Map("product" -> "A", "price" -> 10.0))
    rw.insertRow("test_product", values = Map("product" -> "A", "price" -> 20.0))
    rw.insertRow("test_product", values = Map("product" -> "B", "price" -> 30.0))
    rw.insertRow("test_product", values = Map("product" -> "B", "price" -> 50.0), forceFlush = true)

    val m = rw.mv("SELECT product, avg(price) AS avg_price FROM test_product GROUP BY product",
      "product_avg")
    rw.flush()
    val state1 = rw.fetch("SELECT * FROM product_avg").map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(state1 == Map("A" -> 15.0, "B" -> 40.0))

    // incremental: new insert shifts only A
    rw.insertRow("test_product", values = Map("product" -> "A", "price" -> 30.0), forceFlush = true)
    val state2 = rw.fetch("SELECT * FROM product_avg").map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(state2 == Map("A" -> 20.0, "B" -> 40.0))
  }

  test("MV invariant: incremental state equals batch re-evaluation") {
    rw.createTable("inv_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    val rnd = new scala.util.Random(7)
    rw.mv("SELECT k, sum(v) AS sv, count(*) AS n FROM inv_t GROUP BY k", "inv_mv")
    for (_ <- 1 to 3) {
      for (_ <- 1 to 17)
        rw.insertRow("inv_t", values = Map("k" -> s"k${rnd.nextInt(5)}", "v" -> rnd.nextInt(100).toDouble))
      rw.flush()
      val inc = rw.fetch("SELECT * FROM inv_mv")
        .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
      val batch = rw.fetch("SELECT k, sum(v) AS sv, count(*) AS n FROM inv_t GROUP BY k")
        .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
      assert(inc == batch)
    }
  }

  test("demo_simple: tumble MV via SQL DDL, changelog ops incl. corrections") {
    rw.execute("CREATE SCHEMA IF NOT EXISTS risingwave_py_demo")
    rw.execute(
      """CREATE TABLE IF NOT EXISTS risingwave_py_demo.tick (
        |  symbol STRING, timestamp TIMESTAMPTZ, open FLOAT, high FLOAT,
        |  low FLOAT, close FLOAT, volume FLOAT)""".stripMargin)
    rw.execute(
      """CREATE MATERIALIZED VIEW IF NOT EXISTS risingwave_py_demo.tick_analytics AS
        |SELECT window_start, window_end, symbol, ROUND(avg(close)) AS avg_price
        |FROM tumble(risingwave_py_demo.tick, timestamp, interval '10 seconds')
        |GROUP BY window_start, window_end, symbol""".stripMargin)

    val ops = ArrayBuffer[(String, Double)]()
    val sub = rw.subscriptionFor("tick_analytics", "risingwave_py_demo").declareCursor()

    def tick(sym: String, ts: String, close: Double) =
      rw.insertRow("tick", "risingwave_py_demo", forceFlush = false, Map(
        "symbol" -> sym, "timestamp" -> Timestamp.valueOf(ts),
        "open" -> close, "high" -> close, "low" -> close,
        "close" -> close, "volume" -> 1.0))

    tick("ANT", "2024-01-01 00:00:01", 100.0)
    tick("ANT", "2024-01-01 00:00:03", 200.0)
    rw.execute("FLUSH")
    tick("ANT", "2024-01-01 00:00:07", 600.0) // same window -> correction
    tick("BEE", "2024-01-01 00:00:12", 50.0)  // new window  -> insert
    rw.execute("FLUSH")

    val seen = Iterator.continually(sub.fetch(10)).takeWhile(_.nonEmpty).flatten.toSeq
    // change row layout: payload..., op (second-to-last), rw_timestamp (last)
    val opNames = seen.map(r => r.getString(r.length - 2))
    assert(opNames.contains(Changelog.OpInsert))
    assert(opNames.contains(Changelog.OpUpdateDelete))
    assert(opNames.contains(Changelog.OpUpdateInsert))
    // rw_timestamp (last col) strictly increasing
    val ts = seen.map(r => r.getLong(r.length - 1))
    assert(ts == ts.sorted && ts.distinct.size == ts.size)

    // final MV state equals batch recompute over the raw ticks
    val got = rw.fetch(
      "SELECT symbol, avg_price FROM risingwave_py_demo.tick_analytics ORDER BY symbol, avg_price")
      .map(r => (r.getString(0), r.getDouble(1)))
    val exp = rw.fetch(
      """SELECT symbol, ROUND(avg(close)) AS avg_price
        |FROM tumble(risingwave_py_demo.tick, timestamp, interval '10 seconds')
        |GROUP BY window_start, window_end, symbol ORDER BY symbol, avg_price""".stripMargin)
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got == exp)
    assert(got.map(_._2).toSet == Set(300.0, 50.0)) // corrected avg for ANT window 0-10s
  }

  test("subscription: SINCE replay and blocking consume with at-least-once progress") {
    rw.createTable("sub_t", StructType(Seq(StructField("x", LongType))))
    rw.mv("SELECT x FROM sub_t", "sub_mv") // identity (append) MV
    val subAll = rw.subscriptionFor("sub_mv").declareCursor(Some(0L))

    (1L to 7L).foreach(x => rw.insertRow("sub_t", values = Map("x" -> x)))
    rw.flush()

    // SINCE 0 replays everything; fetch respects max batch size
    val b1 = subAll.fetch(3)
    assert(b1.size == 3)
    val rest = subAll.fetch(100)
    assert(b1.size + rest.size == 7)
    assert((b1 ++ rest).map(_.getLong(0)).toSet == (1L to 7L).toSet)
    assert((b1 ++ rest).forall(_.getString(1) == Changelog.OpInsert))

    // blocking consume on a user thread (reference threading pattern)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val sub2 = rw.subscriptionFor("sub_mv", subName = "sub_mv_progress", persistProgress = true)
      .declareCursor(Some(0L))
    val th = new Thread(() => sub2.consume(rows => rows.foreach(r => seen.add(r.getLong(0))), 5))
    th.start()
    rw.insertRow("sub_t", values = Map("x" -> 8L), forceFlush = true)
    val deadline = System.currentTimeMillis() + 10000
    while (seen.size < 8 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    sub2.close(); th.join(5000)
    assert(seen.size == 8)
    // progress persisted after delivery (K7): stored offset == cursor position
    val prog = rw.fetch("SELECT progress FROM risingwave_py_sub_progress WHERE sub_name = 'sub_mv_progress'")
    assert(prog.nonEmpty && prog.head.getLong(0) == sub2.currentPosition)
  }

  test("MV over the persisted-progress table cascades (reference persist-progress flow)") {
    // the reference's own monitoring shape: `risingwave/core.py:506-513`
    // creates the upsert progress table, `:550-557` upserts one row per
    // delivered batch. An aggregate MV over that table must maintain
    // through the table's keyed changelog (round-8 upsert cascades) —
    // batch re-running it per FLUSH would scale with table size, not with
    // the delivered batches.
    rw.createTable("pp_t", StructType(Seq(StructField("x", LongType))))
    rw.mv("SELECT x FROM pp_t", "pp_mv")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val sub = rw.subscriptionFor("pp_mv", subName = "pp_progress", persistProgress = true)
      .declareCursor(Some(0L))
    val mon = rw.mv(
      "SELECT sub_name, CAST(MAX(progress) AS BIGINT) AS p " +
        "FROM risingwave_py_sub_progress GROUP BY sub_name", "pp_monitor")
    assert(mon.isChangelogCascadeMode,
      "aggregate over the upsert progress table must consume its changelog")
    val th = new Thread(() => sub.consume(rows => rows.foreach(r => seen.add(r.getLong(0))), 5))
    th.start()
    rw.insertRow("pp_t", values = Map("x" -> 1L), forceFlush = true)
    rw.insertRow("pp_t", values = Map("x" -> 2L), forceFlush = true)
    val deadline = System.currentTimeMillis() + 10000
    while (seen.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    sub.close(); th.join(5000)
    assert(seen.size == 2)
    rw.flush()
    // the monitor tracked the upserts incrementally and reads the final
    // persisted offset (== the cursor position after delivery)
    val got = rw.fetch("SELECT p FROM pp_monitor WHERE sub_name = 'pp_progress'")
    assert(got.nonEmpty && got.head.getLong(0) == sub.currentPosition,
      s"monitor MV must track persisted progress, got $got")
    assert(mon.isChangelogCascadeMode, "mode must survive epochs")
  }

  test("upsert table with version column keeps max-version row (K6)") {
    rw.execute(
      """CREATE TABLE vt (k STRING PRIMARY KEY, v BIGINT)
        |ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v)""".stripMargin)
    rw.execute("INSERT INTO vt VALUES ('a', 2)")
    rw.execute("INSERT INTO vt VALUES ('a', 5)")
    rw.execute("INSERT INTO vt VALUES ('a', 3)") // stale version: must not win
    rw.execute("INSERT INTO vt VALUES ('b', 1)")
    rw.execute("FLUSH")
    val got = rw.fetch("SELECT k, v FROM vt ORDER BY k").map(r => (r.getString(0), r.getLong(1)))
    assert(got == Seq(("a", 5L), ("b", 1L)))
  }

  test("PK face rides the merged-face map tier; versions, DML and the latch hold (round 14)") {
    val rw2 = GraftEngine.open(ConnOptions(), Some(spark))
    rw2.execute(
      """CREATE TABLE mf (k STRING PRIMARY KEY, v BIGINT)
        |ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v)""".stripMargin)
    val t = rw2.table("mf").get
    rw2.execute("INSERT INTO mf VALUES ('a', 2), ('b', 1)")
    rw2.execute("INSERT INTO mf VALUES ('a', 5)")
    rw2.execute("INSERT INTO mf VALUES ('a', 3)") // stale version: must not win
    rw2.execute("FLUSH")
    assert(t.faceIsLocal, "a bounded scalar-keyed PK face must ride the driver map")
    assert(t.batchDF.queryExecution.logical
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "the map face must be a LocalRelation — no dedup window, no history scan")
    def face(): Seq[(String, Long)] =
      rw2.fetch("SELECT k, v FROM mf ORDER BY k").map(r => (r.getString(0), r.getLong(1)))
    assert(face() == Seq(("a", 5L), ("b", 1L)),
      "map point upserts must replay the (version DESC NULLS LAST, __seq DESC) winner rule")
    // DML rewrite invalidates; the next read re-seeds from the new segment
    rw2.execute("UPDATE mf SET v = 9 WHERE k = 'b'")
    rw2.execute("FLUSH")
    assert(face() == Seq(("a", 5L), ("b", 9L)))
    assert(t.faceIsLocal, "post-DML read must re-seed the map from the rewritten history")
    // over-bound: the latch is monotone and the window face takes over
    t.mergedFaceMax = 2
    rw2.execute("INSERT INTO mf VALUES ('c', 1), ('d', 1)")
    rw2.execute("FLUSH")
    assert(!t.faceIsLocal, "outgrowing the bound must drop the map for good")
    assert(face() == Seq(("a", 5L), ("b", 9L), ("c", 1L), ("d", 1L)),
      "the window face must serve identical rows after the latch")
    rw2.execute("INSERT INTO mf VALUES ('a', 7)")
    rw2.execute("FLUSH")
    assert(!t.faceIsLocal, "the oversize latch is monotone")
    assert(face() == Seq(("a", 7L), ("b", 9L), ("c", 1L), ("d", 1L)))
    rw2.close()
  }

  test("batch-rerun MV over static parquet emits Delete on shrink") {
    // MV over a filtered live table: deleting is modeled by key disappearing
    rw.createTable("del_t", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    // batch-mode MV: aggregate with HAVING is not streamable -> batch rerun
    rw.mv("SELECT k, sum(v) AS sv FROM del_t GROUP BY k HAVING sum(v) < 100", "del_mv")
    rw.insertRow("del_t", values = Map("k" -> "a", "v" -> 10L), forceFlush = true)
    assert(rw.fetch("SELECT * FROM del_mv").map(_.getString(0)) == Seq("a"))
    rw.insertRow("del_t", values = Map("k" -> "a", "v" -> 200L), forceFlush = true) // a out of HAVING
    val sub = rw.subscriptionFor("del_mv").declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(100)).takeWhile(_.nonEmpty).flatten.toSeq
      .map(r => r.getString(r.length - 2))
    assert(ops.contains(Changelog.OpInsert) && ops.contains(Changelog.OpDelete))
    assert(rw.fetch("SELECT * FROM del_mv").isEmpty)
  }

  test("information_schema + checkExist (S2/S3/C8)") {
    val cols = rw.fetch(
      """SELECT column_name FROM information_schema.columns
        |WHERE table_name = 'test_product' AND table_schema = 'public'
        |ORDER BY ordinal_position""".stripMargin).map(_.getString(0))
    assert(cols == Seq("product", "price"))
    assert(rw.checkExist("test_product"))
    assert(!rw.checkExist("nope_not_here"))
  }

  test("watermarked MV (W9): state-bounded tumble agg still matches batch on in-order data") {
    rw.createTable("wm_t", StructType(Seq(
      StructField("ts", TimestampType), StructField("v", DoubleType))))
    rw.mv(
      """SELECT window_start, count(*) AS n FROM tumble(wm_t, ts, interval '10 seconds')
        |GROUP BY window_start""".stripMargin,
      "wm_mv", watermarks = Map("wm_t" -> ("ts", "30 seconds")))
    def ins(ts: String, v: Double) =
      rw.insertRow("wm_t", values = Map("ts" -> Timestamp.valueOf(ts), "v" -> v))
    ins("2024-01-01 00:00:01", 1); ins("2024-01-01 00:00:05", 2)
    rw.flush()
    ins("2024-01-01 00:00:11", 3); ins("2024-01-01 00:00:21", 4)
    rw.flush()
    val got = rw.fetch("SELECT count(*) AS windows, sum(n) AS rows FROM wm_mv").head
    assert(got.getLong(0) == 3 && got.getLong(1) == 4)
  }

  test("EXPLAIN / SHOW / DESCRIBE introspection passthrough (2.11)") {
    assert(rw.fetch("EXPLAIN SELECT * FROM test_product").head.getString(0)
      .contains("Physical Plan"))
    assert(rw.fetch("SHOW TABLES").nonEmpty)
    val desc = rw.fetch("DESCRIBE test_product").map(_.getString(0))
    assert(desc.contains("product") && desc.contains("price"))
    val mvNames = rw.fetch("SHOW MATERIALIZED VIEWS").map(_.getString(0))
    assert(mvNames.contains("product_avg"), s"got $mvNames")
  }

  test("MV-on-MV chain: FLUSH propagates through dependent views in order") {
    rw.createTable("chain_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    rw.mv("SELECT k, sum(v) AS sv FROM chain_t GROUP BY k", "chain_mv1")
    // second MV reads the first (batch-rerun mode; refreshed after mv1 at FLUSH)
    rw.mv("SELECT count(*) AS n_keys, sum(sv) AS total FROM chain_mv1", "chain_mv2")
    rw.insertRow("chain_t", values = Map("k" -> "a", "v" -> 1.0))
    rw.insertRow("chain_t", values = Map("k" -> "b", "v" -> 2.0), forceFlush = true)
    val r1 = rw.fetch("SELECT * FROM chain_mv2").head
    assert(r1.getLong(0) == 2 && r1.getDouble(1) == 3.0)
    rw.insertRow("chain_t", values = Map("k" -> "c", "v" -> 4.0), forceFlush = true)
    val r2 = rw.fetch("SELECT * FROM chain_mv2").head
    assert(r2.getLong(0) == 3 && r2.getDouble(1) == 7.0)
  }

  test("insert via SQL errors on missing table like the reference (RuntimeError)") {
    intercept[RuntimeException] {
      rw.insertRow("missing_table", values = Map("x" -> 1))
    }
  }

  test("global-aggregate MV (no grouping keys in output) stays correct across epochs") {
    // `SELECT count(*) FROM t` has no key columns to merge update-mode deltas
    // on — must maintain via batch re-run, never retain stale rows
    rw.createTable("glob_t", StructType(Seq(StructField("x", LongType))))
    val m = rw.mv("SELECT count(*) AS n, sum(x) AS sx FROM glob_t", "glob_mv")
    for (epoch <- 1 to 3) {
      rw.insertRow("glob_t", values = Map("x" -> epoch.toLong), forceFlush = true)
      val rows = rw.fetch("SELECT * FROM glob_mv")
      assert(rows.length == 1, s"epoch $epoch: expected 1 row, got ${rows.length}")
      assert(rows.head.getLong(0) == epoch.toLong)
      assert(rows.head.getLong(1) == (1 to epoch).sum.toLong)
    }
    // changelog must carry retractions (UpdateDelete/UpdateInsert), not
    // bare Inserts of each new aggregate value: one Insert for the initial
    // (0, null) row the empty table materializes, then an update pair per
    // epoch
    val sub = m.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .map(r => r.getString(r.length - 2))
    assert(ops.count(_ == "Insert") == 1)
    assert(ops.count(_ == "UpdateInsert") == 3)
    assert(ops.count(_ == "UpdateDelete") == 3)
    assert(ops.count(_ == "Delete") == 0)
  }

  test("aggregate projecting away its grouping key maintains distinct-value rows") {
    rw.createTable("proj_t", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    rw.mv("SELECT sum(v) AS sv FROM proj_t GROUP BY k", "proj_mv")
    rw.insertRow("proj_t", values = Map("k" -> "a", "v" -> 1L))
    rw.insertRow("proj_t", values = Map("k" -> "b", "v" -> 10L), forceFlush = true)
    rw.insertRow("proj_t", values = Map("k" -> "a", "v" -> 2L), forceFlush = true)
    val got = rw.fetch("SELECT * FROM proj_mv").map(_.getLong(0)).sorted
    assert(got == Seq(3L, 10L), s"got $got")
  }

  test("UPDATE and DELETE on a PK table flow through to MV state and changelog") {
    rw.execute("CREATE TABLE dml_t (k STRING PRIMARY KEY, v BIGINT)")
    val m = rw.mv("SELECT k, v FROM dml_t", "dml_mv")
    rw.execute("INSERT INTO dml_t VALUES ('a', 1), ('b', 2), ('c', 3)")
    rw.execute("FLUSH")
    rw.execute("UPDATE dml_t SET v = v * 10 WHERE k <> 'c'")
    rw.execute("FLUSH")
    val afterUpdate = rw.fetch("SELECT k, v FROM dml_t ORDER BY k")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(afterUpdate == Seq(("a", 10L), ("b", 20L), ("c", 3L)))
    rw.execute("DELETE FROM dml_t WHERE v >= 20")
    rw.execute("FLUSH")
    val afterDelete = rw.fetch("SELECT k, v FROM dml_mv ORDER BY k")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(afterDelete == Seq(("a", 10L), ("c", 3L)))
    // changelog saw the retractions, not just inserts
    val sub = m.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(ops.count(_._3 == "Insert") == 3)
    assert(ops.contains(("a", 1L, "UpdateDelete")) && ops.contains(("a", 10L, "UpdateInsert")))
    assert(ops.contains(("b", 20L, "Delete")))
  }

  test("MV over an upsert (PK) table resolves versions AND cascades its changelog") {
    rw.execute(
      """CREATE TABLE upsmv_t (id STRING PRIMARY KEY, grp STRING, v BIGINT)
        |ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v)""".stripMargin)
    val m = rw.mv("SELECT grp, count(*) AS n, sum(v) AS sv FROM upsmv_t GROUP BY grp", "upsmv_mv")
    // round 8: the table emits its own 4-op changelog, so the aggregate
    // folds upsert retractions incrementally instead of batch re-running
    // the statement at every FLUSH (the round-7 verdict's #1 item)
    assert(m.isChangelogCascadeMode,
      "aggregate over an upsert table must take the changelog-cascade path")
    rw.execute("INSERT INTO upsmv_t VALUES ('x', 'g1', 1), ('y', 'g1', 2)")
    rw.execute("FLUSH")
    // re-insert key x with a higher version — count must stay 2, not 3
    rw.execute("INSERT INTO upsmv_t VALUES ('x', 'g1', 5)")
    rw.execute("FLUSH")
    val st = rw.fetch("SELECT grp, n, sv FROM upsmv_mv")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(st == Seq(("g1", 2L, 7L)))
    // a LOSING version (v=3 < 5 for key x) emits nothing and changes nothing
    rw.execute("INSERT INTO upsmv_t VALUES ('x', 'g1', 3)")
    rw.execute("FLUSH")
    val st2 = rw.fetch("SELECT grp, n, sv FROM upsmv_mv")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(st2 == Seq(("g1", 2L, 7L)))
    assert(m.isChangelogCascadeMode, "mode must survive the epochs")
  }

  test("aggregate MV over a PK table stays incremental across UPDATE and DELETE") {
    rw.execute("CREATE TABLE dmlc_t (k STRING PRIMARY KEY, grp STRING, v BIGINT)")
    val m = rw.mv(
      "SELECT grp, count(*) AS n, sum(v) AS sv FROM dmlc_t GROUP BY grp", "dmlc_mv")
    assert(m.isChangelogCascadeMode)
    rw.execute("INSERT INTO dmlc_t VALUES ('a', 'g1', 1), ('b', 'g1', 2), ('c', 'g2', 3)")
    rw.execute("FLUSH")
    // DML retractions flow through the TABLE changelog, so the cascade MV
    // is NOT demoted (round-7 verdict item 4) — it folds them
    rw.execute("UPDATE dmlc_t SET v = v * 10 WHERE grp = 'g1'")
    rw.execute("FLUSH")
    assert(m.isChangelogCascadeMode, "UPDATE must not demote a cascade MV")
    val afterUpdate = rw.fetch("SELECT grp, n, sv FROM dmlc_mv ORDER BY grp")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(afterUpdate == Seq(("g1", 2L, 30L), ("g2", 1L, 3L)))
    rw.execute("DELETE FROM dmlc_t WHERE v >= 20")
    rw.execute("FLUSH")
    assert(m.isChangelogCascadeMode, "DELETE must not demote a cascade MV")
    val afterDelete = rw.fetch("SELECT grp, n, sv FROM dmlc_mv ORDER BY grp")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(afterDelete == Seq(("g1", 1L, 10L), ("g2", 1L, 3L)))
    // the MV's changelog carried the group-level retractions
    val sub = m.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    assert(ops.contains(("g1", 3L, "UpdateDelete")) && ops.contains(("g1", 30L, "UpdateInsert")))
    assert(ops.contains(("g1", 10L, "UpdateInsert")))
  }

  test("ephemeral tables spill past the threshold: queries, MV backfill, rowCount intact") {
    spark.conf.set("graft.table.spillThreshold", "10")
    try {
      rw.createTable("eph_t", StructType(Seq(
        StructField("k", StringType), StructField("v", LongType))))
      val t = rw.table("eph_t").get
      (0 until 40).grouped(8).foreach(g =>
        t.insert(g.map(i => Row(s"k$i", i.toLong)).toSeq))
      assert(t.rowCount == 40)
      assert(rw.fetch("SELECT count(*) AS c FROM eph_t").head.getLong(0) == 40)
      assert(rw.fetch("SELECT CAST(sum(v) AS BIGINT) AS s FROM eph_t").head.getLong(0) ==
        (0 until 40).sum.toLong)
      // a late-created MV backfills through spilled segments + tail
      rw.mv("SELECT count(*) AS n FROM eph_t", "eph_mv")
      rw.flush()
      assert(rw.fetch("SELECT n FROM eph_mv").head.getLong(0) == 40)
    } finally spark.conf.unset("graft.table.spillThreshold")
  }

  test("changelog persists as parquet segments; SINCE replay crosses segment boundaries") {
    rw.createTable("spill_t", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    val m = rw.mv("SELECT k, v FROM spill_t", "spill_mv")
    // 24 changelog rows in 6 epochs → 6 executor-written segments
    for (epoch <- 0 until 6) {
      val rows = (0 until 4).map(i => Row(s"k${epoch * 4 + i}", (epoch * 4 + i).toLong))
      rw.table("spill_t").get.insert(rows)
      rw.flush()
    }
    val sub = m.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(5)).takeWhile(_.nonEmpty).flatten.toSeq
    assert(ops.length == 24)
    val offs = ops.map(r => r.getLong(r.length - 1))
    assert(offs == offs.sorted, "replay must preserve offset order across segment boundaries")
    assert(ops.map(_.getString(0)).toSet == (0 until 24).map(i => s"k$i").toSet)
  }

  test("streaming MV-on-MV chain: stateless cleanse feeds an incremental aggregate") {
    rw.createTable("chs_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    // MV1: stateless filter (streaming append mode → has a streaming face)
    rw.mv("SELECT k, v FROM chs_t WHERE v >= 0", "chs_clean")
    // MV2: aggregate OVER MV1 — must run as a streaming update-mode agg
    val m2 = rw.mv("SELECT k, count(*) AS n, sum(v) AS sv FROM chs_clean GROUP BY k", "chs_agg")
    rw.insertRow("chs_t", values = Map("k" -> "a", "v" -> 1.0))
    rw.insertRow("chs_t", values = Map("k" -> "a", "v" -> -5.0)) // filtered out
    rw.insertRow("chs_t", values = Map("k" -> "b", "v" -> 2.0), forceFlush = true)
    val s1 = rw.fetch("SELECT k, n, sv FROM chs_agg")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s1 == Map("a" -> ((1L, 1.0)), "b" -> ((1L, 2.0))))
    rw.insertRow("chs_t", values = Map("k" -> "a", "v" -> 3.0), forceFlush = true)
    val s2 = rw.fetch("SELECT k, n, sv FROM chs_agg")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s2 == Map("a" -> ((2L, 4.0)), "b" -> ((1L, 2.0))))
    // the downstream changelog carries keyed update pairs, not rebuild noise
    val sub = m2.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .map(r => r.getString(r.length - 2))
    assert(ops.count(_ == "Insert") == 2)
    assert(ops.count(_ == "UpdateInsert") == 1 && ops.count(_ == "UpdateDelete") == 1)
    // dropping the upstream while a dependent exists must be rejected
    intercept[RuntimeException] { rw.execute("DROP MATERIALIZED VIEW chs_clean") }
  }

  test("hop-window MV via SQL DDL maintains sliding aggregates incrementally") {
    rw.execute(
      """CREATE TABLE hopmv_t (sym STRING, ts TIMESTAMPTZ, price FLOAT)""")
    rw.execute(
      """CREATE MATERIALIZED VIEW hop_avg AS
        |SELECT window_start, sym, round(avg(price)) AS avg_price, count(*) AS n
        |FROM hop(hopmv_t, ts, interval '10 seconds', interval '30 seconds')
        |GROUP BY window_start, sym""".stripMargin)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    rw.insertRow("hopmv_t", values = Map("sym" -> "A", "ts" -> ts(5), "price" -> 10.0))
    rw.insertRow("hopmv_t", values = Map("sym" -> "A", "ts" -> ts(15), "price" -> 30.0), forceFlush = true)
    // t=5 covers starts {-20,-10,0}; t=15 covers {-10,0,10}: both land in -10 and 0
    val st = rw.fetch(
      "SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws, avg_price, n FROM hop_avg ORDER BY ws")
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(st == Seq(
      (-20L, 10.0, 1L), (-10L, 20.0, 2L), (0L, 20.0, 2L), (10L, 30.0, 1L)))
    // incremental: one more tick updates only the windows it falls into
    rw.insertRow("hopmv_t", values = Map("sym" -> "A", "ts" -> ts(25), "price" -> 50.0), forceFlush = true)
    val st2 = rw.fetch(
      "SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws, avg_price, n FROM hop_avg ORDER BY ws")
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(st2 == Seq(
      (-20L, 10.0, 1L), (-10L, 20.0, 2L), (0L, 30.0, 3L), (10L, 40.0, 2L), (20L, 50.0, 1L)))
  }

  test("INSERT INTO ... SELECT appends through the live ingest path") {
    rw.execute("CREATE TABLE insel_src (k STRING, v BIGINT)")
    rw.execute("CREATE TABLE insel_dst (k STRING, v BIGINT)")
    rw.execute("INSERT INTO insel_src VALUES ('a', 1), ('b', 2), ('c', 3)")
    rw.execute("FLUSH")
    rw.execute("INSERT INTO insel_dst SELECT k, v * 10 FROM insel_src WHERE v >= 2")
    rw.execute("FLUSH")
    val got = rw.fetch("SELECT k, v FROM insel_dst ORDER BY k")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got == Seq(("b", 20L), ("c", 30L)))
    // explicit column list with NULL fill
    rw.execute("INSERT INTO insel_dst (k) SELECT upper(k) FROM insel_src WHERE v = 1")
    rw.execute("FLUSH")
    val withNull = rw.fetch("SELECT k, v FROM insel_dst WHERE k = 'A'").head
    assert(withNull.isNullAt(1))
  }

  test("registered extension functions compose with streaming MVs") {
    rw.execute("CREATE TABLE xfn_t (id BIGINT, text STRING)")
    // stateless projection using engine-registered sketch functions →
    // streaming append MV
    rw.mv("""SELECT id, rolling_hash(text) AS rfp,
             simhash64(split(trim(text), '\\s+')) AS sig FROM xfn_t""", "xfn_mv")
    rw.execute("INSERT INTO xfn_t VALUES (1, 'alpha beta gamma'), (2, 'alpha beta gamma')")
    rw.execute("FLUSH")
    val rows = rw.fetch("SELECT id, rfp, sig FROM xfn_mv ORDER BY id")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 2)
    assert(rows(0)._2 == rows(1)._2 && rows(0)._3 == rows(1)._3) // same text, same sketches
    val expected = "alpha beta gamma".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(rows(0)._2 == expected)
  }

  test("EMIT ON WINDOW CLOSE + watermark emits only finalized windows, insert-only") {
    rw.createTable("eowc_t", StructType(Seq(
      StructField("sym", StringType), StructField("ts", TimestampType),
      StructField("price", DoubleType))))
    val m = rw.mv(
      """SELECT window_start, count(*) AS n
        |FROM tumble(eowc_t, ts, interval '10 seconds')
        |GROUP BY window_start EMIT ON WINDOW CLOSE""".stripMargin,
      "eowc_mv", watermarks = Map("eowc_t" -> (("ts", "0 seconds"))))
    def tick(sec: Long) =
      rw.insertRow("eowc_t", values = Map(
        "sym" -> "A", "ts" -> new Timestamp(sec * 1000), "price" -> 1.0), forceFlush = true)
    tick(1); tick(5)
    // watermark hasn't passed window [0,10) yet → nothing emitted
    assert(rw.fetch("SELECT * FROM eowc_mv").isEmpty)
    tick(15)
    tick(16) // extra tick so the watermark update (from t=15) takes effect
    val s1 = rw.fetch("SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws, n FROM eowc_mv")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1 == Seq((0L, 2L)), s"got $s1")
    tick(27); tick(28)
    val s2 = rw.fetch(
      "SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws, n FROM eowc_mv ORDER BY ws")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s2 == Seq((0L, 2L), (10L, 2L)), s"got $s2")
    // final-only emission: the changelog never retracts
    val sub = m.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .map(r => r.getString(r.length - 2))
    assert(ops.nonEmpty && ops.forall(_ == "Insert"))
  }

  test("streaming MV on the RocksDB state store backend stays correct") {
    val rdb = GraftEngine.open(ConnOptions(stateStore = "rocksdb"), Some(spark))
    try {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      rdb.createTable("rdb_t", StructType(Seq(
        StructField("k", StringType), StructField("v", DoubleType))))
      rdb.mv("SELECT k, count(*) AS n, sum(v) AS sv FROM rdb_t GROUP BY k", "rdb_mv")
      for (epoch <- 1 to 2) {
        for (i <- 1 to 7)
          rdb.insertRow("rdb_t", values = Map("k" -> s"k${i % 3}", "v" -> i.toDouble))
        rdb.flush()
        val inc = rdb.fetch("SELECT * FROM rdb_mv")
          .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
        val batch = rdb.fetch("SELECT k, count(*) AS n, sum(v) AS sv FROM rdb_t GROUP BY k")
          .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
        assert(inc == batch, s"epoch $epoch")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming MV with NULL grouping keys merges the NULL group correctly") {
    rw.createTable("nullk_t", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    val m = rw.mv("SELECT k, count(*) AS n, sum(v) AS sv FROM nullk_t GROUP BY k", "nullk_mv")
    rw.table("nullk_t").get.insert(Seq(Row(null, 1L), Row("a", 2L)))
    rw.flush()
    rw.table("nullk_t").get.insert(Seq(Row(null, 10L)))
    rw.flush()
    val rows = rw.fetch("SELECT k, n, sv FROM nullk_mv")
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // exactly ONE row for the NULL group, with merged state
    assert(rows == Seq(("<null>", 2L, 11L), ("a", 1L, 2L)), s"got $rows")
    // and its second change is an update pair, not a duplicate Insert
    val sub = m.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .filter(r => r.isNullAt(0)).map(r => r.getString(r.length - 2))
    assert(ops.count(_ == "Insert") == 1 && ops.count(_ == "UpdateInsert") == 1,
      s"null-group ops: $ops")
  }

  test("DELETE keeps rows where the predicate is NULL (three-valued logic)") {
    rw.execute("CREATE TABLE del3vl_t (k STRING, v BIGINT)")
    rw.table("del3vl_t").get.insert(Seq(Row("a", null), Row("b", 5L), Row("c", 30L)))
    rw.execute("FLUSH")
    rw.execute("DELETE FROM del3vl_t WHERE v >= 20")
    rw.execute("FLUSH")
    val left = rw.fetch("SELECT k FROM del3vl_t ORDER BY k").map(_.getString(0))
    assert(left == Seq("a", "b"), s"got $left — NULL-predicate row must survive")
  }

  test("MV projecting only part of its grouping keys never drops sibling groups") {
    rw.createTable("partk_t", StructType(Seq(
      StructField("k1", StringType), StructField("k2", StringType),
      StructField("v", LongType))))
    // grouped by (k1, k2) but only k1 survives → must NOT maintain keyed
    // on the non-unique k1 (that would drop sibling (k1, k2') rows)
    rw.mv("SELECT k1, sum(v) AS sv FROM partk_t GROUP BY k1, k2", "partk_mv")
    rw.table("partk_t").get.insert(Seq(Row("a", "x", 1L), Row("a", "y", 10L)))
    rw.execute("FLUSH")
    rw.table("partk_t").get.insert(Seq(Row("a", "x", 2L)))
    rw.execute("FLUSH")
    val rows = rw.fetch("SELECT k1, sv FROM partk_mv ORDER BY sv")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows == Seq(("a", 3L), ("a", 10L)), s"got $rows")
  }

  test("streaming MV created after UPDATE on a non-PK table sees mutated state") {
    rw.execute("CREATE TABLE postmut_t (k STRING, v BIGINT)")
    rw.execute("INSERT INTO postmut_t VALUES ('a', 1), ('b', 2)")
    rw.execute("FLUSH")
    rw.execute("UPDATE postmut_t SET v = 100 WHERE k = 'a'")
    rw.execute("FLUSH")
    // created after the mutation: must not replay the stale append log
    rw.mv("SELECT k, sum(v) AS sv FROM postmut_t GROUP BY k", "postmut_mv")
    rw.execute("FLUSH")
    val rows = rw.fetch("SELECT k, sv FROM postmut_mv ORDER BY k")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows == Seq(("a", 100L), ("b", 2L)), s"got $rows")
  }

  test("DROP MV is not blocked by a same-named column in another MV's select list") {
    rw.createTable("dropq_t", StructType(Seq(
      StructField("target_mv", IntegerType), StructField("v", IntegerType))))
    rw.execute("CREATE MATERIALIZED VIEW target_mv AS SELECT v FROM dropq_t")
    // other_mv references `target_mv` only as a COLUMN after a select-list
    // comma — the old text match blocked this drop spuriously
    rw.execute("CREATE MATERIALIZED VIEW other_mv AS SELECT v, target_mv FROM dropq_t")
    rw.execute("DROP MATERIALIZED VIEW target_mv")
    assert(!rw.checkExist("target_mv"))
    // a REAL source dependency still blocks, in FROM and in JOIN position
    rw.execute("CREATE MATERIALIZED VIEW base_mv AS SELECT v FROM dropq_t")
    rw.execute("CREATE MATERIALIZED VIEW dep_mv AS SELECT v FROM base_mv")
    intercept[RuntimeException](rw.execute("DROP MATERIALIZED VIEW base_mv"))
    rw.execute("DROP MATERIALIZED VIEW dep_mv")
    rw.execute("DROP MATERIALIZED VIEW base_mv")
    rw.execute("DROP MATERIALIZED VIEW other_mv")
  }

  test("tumble MV with a sub-second window size") {
    rw.createTable("msw_t", StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType))))
    rw.mv(
      """SELECT window_start, count(*) AS n, sum(v) AS sv
        |FROM tumble(msw_t, ts, interval '500 milliseconds')
        |GROUP BY window_start""".stripMargin, "msw_mv")
    rw.table("msw_t").get.insert(Seq(
      Row(new Timestamp(100L), 1L), Row(new Timestamp(400L), 2L),
      Row(new Timestamp(700L), 4L), Row(new Timestamp(1200L), 8L)))
    rw.flush()
    val rows = rw.fetch(
      "SELECT CAST(unix_millis(window_start) AS BIGINT) AS ws, n, sv FROM msw_mv ORDER BY ws")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows == Seq((0L, 2L, 3L), (500L, 1L, 4L), (1000L, 1L, 8L)), s"got $rows")
  }

  test("EOWC with sub-second windows closes at true window end (unix_millis)") {
    rw.createTable("eowcms_t", StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType))))
    val m = rw.mv(
      """SELECT window_start, count(*) AS n
        |FROM tumble(eowcms_t, ts, interval '500 milliseconds')
        |GROUP BY window_start EMIT ON WINDOW CLOSE""".stripMargin,
      "eowcms_mv", watermarks = Map("eowcms_t" -> (("ts", "0 seconds"))))
    assert(m.isStreamingMode)
    def tick(ms: Long) =
      rw.insertRow("eowcms_t", values = Map("ts" -> new Timestamp(ms), "v" -> 1L),
        forceFlush = true)
    tick(100); tick(400)
    assert(rw.fetch("SELECT * FROM eowcms_mv").isEmpty)
    tick(700); tick(800)
    // watermark 700ms: window [0,500) closed, but [500,1000) must stay
    // pending — a whole-second close check truncated its start to 0 and
    // computed close=500ms, emitting it half a window early
    val s1 = rw.fetch("SELECT CAST(unix_millis(window_start) AS BIGINT) AS ws, n FROM eowcms_mv")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1 == Seq((0L, 2L)), s"got $s1")
    tick(1300); tick(1400)
    val s2 = rw.fetch(
      "SELECT CAST(unix_millis(window_start) AS BIGINT) AS ws, n FROM eowcms_mv ORDER BY ws")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s2 == Seq((0L, 2L), (500L, 2L)), s"got $s2")
  }

  test("EOWC with a non-Keyed aggregate falls back to batch and stays correct") {
    rw.createTable("eowcnk_t", StructType(Seq(
      StructField("k", StringType), StructField("ts", TimestampType),
      StructField("v", LongType))))
    // GROUP BY (window_start, k) projecting k away → Multiset mode: must
    // NOT stream EOWC (the pending buffer would merge on aggregate values
    // and double-emit updated windows); batch fallback is correct
    val m = rw.mv(
      """SELECT window_start, sum(v) AS sv
        |FROM tumble(eowcnk_t, ts, interval '10 seconds')
        |GROUP BY window_start, k EMIT ON WINDOW CLOSE""".stripMargin,
      "eowcnk_mv", watermarks = Map("eowcnk_t" -> (("ts", "0 seconds"))))
    assert(!m.isStreamingMode, "non-Keyed EOWC must not be admitted to streaming")
    def tick(sec: Long, k: String, v: Long) =
      rw.insertRow("eowcnk_t", values = Map(
        "k" -> k, "ts" -> new Timestamp(sec * 1000), "v" -> v), forceFlush = true)
    tick(1, "a", 1); tick(5, "a", 2); tick(3, "b", 10)
    tick(15, "a", 4); tick(16, "b", 20)
    val rows = rw.fetch(
      "SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws, sv FROM eowcnk_mv ORDER BY ws, sv")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows == Seq((0L, 3L), (0L, 10L), (10L, 4L), (10L, 20L)), s"got $rows")
  }

  test("insertDF streams large inputs in bounded chunks (no whole-DF collect)") {
    rw.createTable("bulk_t", StructType(Seq(StructField("id", LongType))))
    val t = rw.table("bulk_t").get
    // 1M rows through the chunked toLocalIterator path: 10+ chunks at the
    // 100k default — the old collect() materialized all rows at once
    t.insertDF(spark.range(1000000).toDF("id"))
    rw.flush()
    assert(t.rowCount == 1000000L)
    val agg = rw.fetch("SELECT count(*) AS n, sum(id) AS s FROM bulk_t").head
    assert(agg.getLong(0) == 1000000L && agg.getLong(1) == 499999500000L)
  }

  test("INSERT…SELECT bulk ingest is executor-side; upsert ordering preserved") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val callSites = ArrayBuffer[String]()
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        val cs = Option(jobStart.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        callSites.synchronized { callSites += cs }
      }
    }
    rw.execute(
      """CREATE TABLE blkv (id BIGINT PRIMARY KEY, v BIGINT)
        |ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v)""".stripMargin)
    // 50k rows over 1000 keys; per key the max version is id + 49000
    spark.range(50000).selectExpr("id % 1000 AS id", "id AS v")
      .createOrReplaceTempView("blk_src")
    spark.sparkContext.addSparkListener(listener)
    try {
      rw.execute("INSERT INTO blkv SELECT id, v FROM blk_src")
      rw.execute("FLUSH")
      Thread.sleep(1000)
    } finally spark.sparkContext.removeSparkListener(listener)
    // with NO attached streaming readers, the bulk path must be fully
    // executor-side: rows land in a stamped parquet segment — never a
    // driver collect, never even a toLocalIterator chunk walk
    // `count at` too (round-9): the staged segment used to be re-read with
    // an extra count() job; the count now rides a LongAccumulator
    val off = callSites.synchronized {
      callSites.filter(cs => (cs.startsWith("collect at") ||
        cs.startsWith("toLocalIterator at") || cs.startsWith("count at")) &&
        (cs.contains("LiveTable.scala") || cs.contains("GraftEngine.scala")))
    }
    assert(off.isEmpty, s"bulk ingest crossed the driver: ${off.distinct.mkString(", ")}")
    val agg = rw.fetch("SELECT count(*) AS n, sum(v) AS s FROM blkv").head
    assert(agg.getLong(0) == 1000L, "upsert resolution must keep one row per key")
    assert(agg.getLong(1) == 49000L * 1000L + 999L * 1000L / 2,
      "the max-version row must win within the bulk segment")
    // cross-path version gating: a LOWER version through the buffered path
    // must not overwrite the bulk row; a HIGHER one must
    rw.execute("INSERT INTO blkv VALUES (0, 5)")
    rw.execute("FLUSH")
    assert(rw.fetch("SELECT v FROM blkv WHERE id = 0").head.getLong(0) == 49000L)
    rw.execute("INSERT INTO blkv VALUES (0, 99999)")
    rw.execute("FLUSH")
    assert(rw.fetch("SELECT v FROM blkv WHERE id = 0").head.getLong(0) == 99999L)
  }

  test("bulk ingest feeds attached streaming MVs through their faces") {
    rw.createTable("blks_t", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    rw.mv("SELECT k, count(*) AS n, sum(v) AS sv FROM blks_t GROUP BY k", "blks_mv")
    spark.range(10000).selectExpr("CAST(id % 4 AS STRING) AS k", "id AS v")
      .createOrReplaceTempView("blks_src")
    rw.execute("INSERT INTO blks_t SELECT k, v FROM blks_src")
    rw.execute("FLUSH")
    val got = rw.fetch("SELECT k, n, sv FROM blks_mv ORDER BY k")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = (0 until 4).map { m =>
      val vs = (0 until 10000).filter(_ % 4 == m).map(_.toLong)
      (m.toString, vs.size.toLong, vs.sum)
    }
    assert(got == want, "the attached maintainer must see every bulk row exactly once")
  }

  test("composite table-level PRIMARY KEY (a, b) and DECIMAL(10,2) parse correctly") {
    rw.execute(
      """CREATE TABLE ddl_pk2 (a INT, b INT, price DECIMAL(10,2), note VARCHAR(32),
        |PRIMARY KEY (a, b))""".stripMargin)
    val t = rw.table("ddl_pk2").get
    assert(t.schema.fieldNames.toSeq == Seq("a", "b", "price", "note"))
    assert(t.schema("price").dataType == DecimalType(10, 2))
    assert(t.schema("note").dataType == StringType)
    assert(t.primaryKey == Seq("a", "b"))
    // upsert on the composite key: same (a,b) replaces, different b appends
    rw.execute("INSERT INTO ddl_pk2 VALUES (1, 1, 10.00, 'x'), (1, 2, 20.00, 'y')")
    rw.execute("INSERT INTO ddl_pk2 VALUES (1, 1, 30.00, 'z')")
    rw.execute("FLUSH")
    val rows = rw.fetch("SELECT a, b, CAST(price AS DOUBLE) AS p FROM ddl_pk2 ORDER BY a, b")
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows == Seq((1, 1, 30.0), (1, 2, 20.0)))
  }
}
