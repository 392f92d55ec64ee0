package graft

import graft.engine._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Restart durability (SURVEY §9 gap; round-4 verdict item 2): with a
  * configured `dataDir`, live-table rows, changelog segments, and
  * subscription progress all persist across `close()` + `GraftEngine.open`
  * on the same dir — the reference's server retains them server-side.
  * Re-created MVs rebuild their snapshot from the restored tables WITHOUT
  * re-emitting the recovered history as fresh changelog ops. */
class DurabilitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private def drain(sub: Subscription): Seq[Seq[Any]] =
    Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty)
      .flatten.map(_.toSeq).toSeq

  test("SINCE-0 replay is identical after close + reopen on the same data dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("du_t", schema)
    rw1.mv("SELECT k, count(*) AS n FROM du_t GROUP BY k", "du_mv")
    val t = rw1.table("du_t").get
    t.insert(Seq(Row("a", 1L), Row("b", 2L))); rw1.flush()
    t.insert(Seq(Row("a", 3L))); rw1.flush()
    val ops1 = drain(rw1.mvByName("du_mv").get.subscription().declareCursor(Some(0L)))
    assert(ops1.nonEmpty)
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    // du_t was restored from its row segments; the re-created MV rebuilds
    // its snapshot from the restored rows but must NOT re-emit them as ops
    rw2.mv("SELECT k, count(*) AS n FROM du_t GROUP BY k", "du_mv")
    val ops2 = drain(rw2.mvByName("du_mv").get.subscription().declareCursor(Some(0L)))
    assert(ops2 == ops1, "retained history (incl. offsets) must replay identically")
    assert(rw2.mvByName("du_mv").get.df.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet == Set(("a", 2L), ("b", 1L)), "snapshot must rebuild from restored rows")
    rw2.close()
  }

  test("live table rows survive reopen; a dependent MV backfills from them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("dt_t", schema)
    rw1.table("dt_t").get.insert(Seq(Row("a", 1L), Row("b", 2L), Row("a", 3L)))
    rw1.flush()
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    // no re-issued DDL: the table restores itself (schema from _graft_meta,
    // rows from segments) and is immediately queryable
    val rows = rw2.fetch("SELECT k, v FROM dt_t ORDER BY v")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows == Seq(("a", 1L), ("b", 2L), ("a", 3L)))
    // a NEW MV over the restored table backfills through its face stream
    val m = rw2.mv("SELECT k, count(*) AS n FROM dt_t GROUP BY k", "dt_mv")
    rw2.flush()
    assert(m.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L), ("b", 1L)), "dependent MV must backfill restored rows")
    // and being a FRESH MV (no recovered changelog), its backfill IS emitted
    val ops = drain(m.subscription().declareCursor(Some(0L)))
    assert(ops.map(_.head).toSet == Set("a", "b"))
    // post-restore ingest continues the restored sequence (upsert ordering)
    rw2.table("dt_t").get.insert(Seq(Row("c", 4L)))
    rw2.flush()
    assert(rw2.fetch("SELECT count(*) FROM dt_t").head.getLong(0) == 4L)
    rw2.close()
  }

  test("upsert version resolution survives reopen (segment __seq continuity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.execute(
      """CREATE TABLE dv_t (id STRING PRIMARY KEY, v BIGINT)
        |ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(v)""".stripMargin)
    rw1.execute("INSERT INTO dv_t VALUES ('x', 5), ('y', 1)")
    rw1.execute("FLUSH")
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    // a LOWER version arriving after reopen must not overwrite
    rw2.execute("INSERT INTO dv_t VALUES ('x', 3)")
    rw2.execute("FLUSH")
    val st = rw2.fetch("SELECT id, v FROM dv_t ORDER BY id")
      .map(r => (r.getString(0), r.getLong(1)))
    assert(st == Seq(("x", 5L), ("y", 1L)),
      "restored version column must still gate upserts")
    rw2.close()
  }

  test("durable MV snapshots: reopen restores batch and cascade state without re-executing statements") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    // batch-mode MV (PK table source) + streaming→cascade chain
    rw1.execute("CREATE TABLE ds_pk (id STRING PRIMARY KEY, v BIGINT)")
    rw1.mv("SELECT id, v FROM ds_pk", "ds_pk_mv")
    rw1.createTable("ds_ev", schema)
    rw1.mv("SELECT k, count(*) AS n FROM ds_ev GROUP BY k", "ds_up")
    rw1.mv("SELECT substring(k, 1, 1) AS g, CAST(SUM(n) AS BIGINT) AS n " +
      "FROM ds_up GROUP BY substring(k, 1, 1)", "ds_dn")
    rw1.execute("INSERT INTO ds_pk VALUES ('x', 1), ('y', 2)")
    rw1.table("ds_ev").get.insert(Seq(Row("a1", 1L), Row("a2", 2L), Row("b1", 3L)))
    rw1.flush()
    val pkOps1 = drain(rw1.mvByName("ds_pk_mv").get.subscription().declareCursor(Some(0L)))
    val dnOps1 = drain(rw1.mvByName("ds_dn").get.subscription().declareCursor(Some(0L)))
    rw1.close() // final flush barrier + snapshot persist

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    val pkMv = rw2.mv("SELECT id, v FROM ds_pk", "ds_pk_mv")
    rw2.mv("SELECT k, count(*) AS n FROM ds_ev GROUP BY k", "ds_up")
    val dn = rw2.mv("SELECT substring(k, 1, 1) AS g, CAST(SUM(n) AS BIGINT) AS n " +
      "FROM ds_up GROUP BY substring(k, 1, 1)", "ds_dn")
    // reopen must be O(state): restored snapshots, zero statement runs
    assert(pkMv.statementEvals == 0L,
      "batch MV must restore its persisted snapshot, not re-run the statement")
    assert(dn.statementEvals == 0L,
      "cascade MV must restore snapshot + upstream offsets, not re-backfill")
    assert(pkMv.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("x", 1L), ("y", 2L)))
    assert(dn.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L), ("b", 1L)))
    // SINCE-0 replay identical to before the restart
    assert(drain(rw2.mvByName("ds_pk_mv").get.subscription().declareCursor(Some(0L))) == pkOps1)
    assert(drain(rw2.mvByName("ds_dn").get.subscription().declareCursor(Some(0L))) == dnOps1)
    // maintenance resumes: new ingest flows through restored offsets
    rw2.execute("INSERT INTO ds_pk VALUES ('z', 3)")
    rw2.table("ds_ev").get.insert(Seq(Row("b2", 4L)))
    rw2.flush()
    assert(pkMv.df.count() == 3)
    assert(dn.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L), ("b", 2L)))
    rw2.close()
  }

  test("durable MV snapshots: raw top-N state restores without replay or statement runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("dtn_t", schema)
    // raw (stateless-inner) top-N: all maintainer state is the carried
    // truncation, so the snapshot seeds it completely. (Grouped top-N's
    // inner is an update-mode aggregate — state-store resident — and
    // deliberately keeps replay recovery.)
    val stmt = "SELECT k, v FROM dtn_t ORDER BY v DESC, k LIMIT 2"
    val m1 = rw1.mv(stmt, "dtn_mv")
    assert(m1.isTopNMode)
    rw1.table("dtn_t").get.insert(Seq(Row("a", 10L), Row("b", 7L), Row("c", 3L),
      Row("d", 1L)))
    rw1.flush()
    rw1.table("dtn_t").get.insert(Seq(Row("c", 9L))) // displaces b
    rw1.flush()
    def vis(m: MaterializedView) = m.df.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(vis(m1) == Set(("a", 10L), ("c", 9L)))
    val ops1 = drain(m1.subscription().declareCursor(Some(0L)))
    rw1.close() // final flush + snapshot persist (data + inner + seqs)

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    val m2 = rw2.mv(stmt, "dtn_mv")
    assert(m2.isTopNMode, "restored MV must stay on the incremental top-N path")
    assert(m2.statementEvals == 0L,
      "restore must not re-run the statement over base data")
    assert(m2.consumedRows == 0L,
      "the face must backfill NOTHING — restored state covers the history")
    assert(vis(m2) == Set(("a", 10L), ("c", 9L)))
    assert(drain(m2.subscription().declareCursor(Some(0L))) == ops1,
      "SINCE-0 replay must be unchanged across the restore")
    // maintenance resumes from the restored truncation state
    rw2.table("dtn_t").get.insert(Seq(Row("e", 12L)))
    rw2.flush()
    assert(vis(m2) == Set(("e", 12L), ("a", 10L)))
    rw2.close()
  }

  test("grouped top-N restores its carried state — zero evals, zero replay") {
    // round-9: the cascade-backed grouped top-N carries ALL maintainer
    // state (n+C truncation + bound + consumed source offsets), so reopen
    // is O(state) like the raw-top-N path — no statement re-run, no source
    // replay, and later deltas still fold into full per-key history
    // because touched groups recompute against the source snapshot.
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("dtg_t", schema)
    val stmt = "SELECT k, CAST(SUM(v) AS BIGINT) AS s FROM dtg_t " +
      "GROUP BY k ORDER BY s DESC, k LIMIT 2"
    val m1 = rw1.mv(stmt, "dtg_mv")
    assert(m1.isTopNMode && m1.isChangelogCascadeMode)
    rw1.table("dtg_t").get.insert(Seq(Row("a", 10L), Row("b", 7L), Row("c", 3L)))
    rw1.flush()
    val ops1 = drain(m1.subscription().declareCursor(Some(0L)))
    rw1.close()
    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    val m2 = rw2.mv(stmt, "dtg_mv")
    assert(m2.isTopNMode && m2.isChangelogCascadeMode,
      "restored MV must stay on the cascade-backed top-N path")
    assert(m2.statementEvals == 0L,
      "restore must not re-run the inner statement over base data")
    assert(m2.consumedRows == 0L,
      "restore must not replay source rows — carried state covers them")
    def vis() = m2.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(vis() == Set(("a", 10L), ("b", 7L)))
    assert(drain(m2.subscription().declareCursor(Some(0L))) == ops1,
      "SINCE-0 replay must be unchanged across the restore")
    // maintenance resumes: b's recompute sees the FULL per-key history
    rw2.table("dtg_t").get.insert(Seq(Row("b", 8L))) // b: 15
    rw2.flush()
    assert(vis() == Set(("b", 15L), ("a", 10L)))
    rw2.close()
  }

  test("durable MV snapshots: session state (raw + frozen + cuts) restores without replay") {
    val sschema = StructType(Seq(
      StructField("k", StringType), StructField("ts", TimestampType),
      StructField("v", DoubleType)))
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("dse_t", sschema)
    val stmt =
      """SELECT window_start, window_end, k, count(*) AS n
        |FROM session(dse_t, ts, interval '10 seconds')
        |GROUP BY window_start, window_end, k""".stripMargin
    val wm = Map("dse_t" -> ("ts", "0 seconds"))
    val m1 = rw1.mv(stmt, "dse_mv", watermarks = wm)
    assert(m1.isSessionMode)
    val t = rw1.table("dse_t").get
    t.insert(Seq(Row("a", ts(0), 1.0), Row("a", ts(5), 1.0))); rw1.flush()
    Seq(1000L, 2000L, 3000L).foreach { s =>
      t.insert(Seq(Row("a", ts(s), 1.0))); rw1.flush()
    }
    def vis(m: MaterializedView) = m.df.collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond, r.getString(2),
        r.getLong(3))).toSet
    val st1 = vis(m1)
    assert(st1 == Set((0L, "a", 2L), (1000L, "a", 1L), (2000L, "a", 1L),
      (3000L, "a", 1L)))
    val counts1 = m1.sessionStateCounts
    assert(counts1._2 >= 1, s"a session must have frozen before close, got $counts1")
    val ops1 = drain(m1.subscription().declareCursor(Some(0L)))
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    val m2 = rw2.mv(stmt, "dse_mv", watermarks = wm)
    assert(m2.isSessionMode, "restored MV must stay on the session path")
    assert(m2.statementEvals == 0L,
      "restore must not re-run the statement over base data")
    assert(m2.consumedRows == 0L,
      "the face must backfill NOTHING — restored state covers the history")
    assert(vis(m2) == st1)
    assert(m2.sessionStateCounts == counts1,
      "carried raw rows AND frozen sessions must restore exactly")
    assert(drain(m2.subscription().declareCursor(Some(0L))) == ops1,
      "SINCE-0 replay must be unchanged across the restore")
    // maintenance resumes: a new session lands on the restored state, and a
    // late row under the restored cut is still gated
    val t2 = rw2.table("dse_t").get
    t2.insert(Seq(Row("a", ts(4000), 1.0))); rw2.flush()
    assert(vis(m2) == st1 + ((4000L, "a", 1L)))
    t2.insert(Seq(Row("a", ts(3), 1.0))); rw2.flush() // below the restored cut
    assert(vis(m2) == st1 + ((4000L, "a", 1L)),
      "a late row below the restored compaction cut must drop")
    rw2.close()
  }

  test("close() flushes unflushed ingest so SINCE-0 replay covers it after reopen") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("dc_t", schema)
    rw1.mv("SELECT k, count(*) AS n FROM dc_t GROUP BY k", "dc_mv")
    rw1.table("dc_t").get.insert(Seq(Row("a", 1L))); rw1.flush()
    // ingested but never explicitly flushed: close() must run a final
    // barrier, or these rows persist in the table segments with their MV
    // ops never emitted — and reopen's suppressed backfill would swallow
    // them out of the SINCE-0 history forever
    rw1.table("dc_t").get.insert(Seq(Row("a", 2L), Row("b", 3L)))
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    val mv = rw2.mv("SELECT k, count(*) AS n FROM dc_t GROUP BY k", "dc_mv")
    assert(mv.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L), ("b", 1L)), "snapshot must include the close-time ingest")
    val ops = drain(mv.subscription().declareCursor(Some(0L)))
    val finalByKey = ops.groupBy(_.head).map { case (k, os) => (k, os.last(1)) }
    assert(finalByKey == Map("a" -> 2L, "b" -> 1L),
      s"SINCE-0 replay must reconstruct the restored snapshot, got $ops")
    rw2.close()
  }

  test("a subscription outliving DROP MV drains cleanly (purge under the log monitor)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw.createTable("dd_t", schema)
    rw.mv("SELECT k, v FROM dd_t", "dd_mv")
    val t = rw.table("dd_t").get
    // one executor-written segment per epoch
    (1 to 12).foreach { i => t.insert(Seq(Row(s"k$i", i.toLong))); rw.flush() }
    val sub = rw.mvByName("dd_mv").get.subscription().declareCursor(Some(0L))
    assert(sub.fetch(3).size == 3) // reads through a persisted segment
    rw.execute("DROP MATERIALIZED VIEW dd_mv")
    assert(!new java.io.File(s"$dir/changelog").exists() ||
      new java.io.File(s"$dir/changelog").listFiles().isEmpty,
      "persisted segments must be purged on drop")
    // the cursor survives the drop: empty log, no crash on deleted paths
    assert(sub.fetch(100).isEmpty)
    rw.close()
  }

  test("persisted subscription progress resumes across reopen") {
    val dir = java.nio.file.Files.createTempDirectory("graft-durable-").toString
    val rw1 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw1.createTable("dp_t", schema)
    rw1.mv("SELECT k, v FROM dp_t", "dp_mv")
    rw1.table("dp_t").get.insert(Seq(Row("a", 1L), Row("b", 2L)))
    rw1.flush()
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val sub1 = rw1.mvByName("dp_mv").get
      .subscription("dp_sub", persistProgress = true).declareCursor(Some(0L))
    val consumer = new Thread(() => sub1.consume(rows => seen.addAndGet(rows.size), 10))
    consumer.start()
    while (seen.get() < 2) Thread.sleep(10)
    sub1.close(); consumer.join()
    rw1.close()

    val rw2 = GraftEngine.open(ConnOptions(dataDir = Some(dir)), Some(spark))
    rw2.createTable("dp_t", schema)
    rw2.mv("SELECT k, v FROM dp_t", "dp_mv")
    rw2.table("dp_t").get.insert(Seq(Row("c", 3L)))
    rw2.flush()
    // no explicit SINCE: the cursor resumes from the persisted checkpoint,
    // so only the post-restart change is delivered — not the old history
    val sub2 = rw2.mvByName("dp_mv").get
      .subscription("dp_sub", persistProgress = true).declareCursor()
    val rows = drain(sub2)
    assert(rows.map(_.head) == Seq("c"), s"expected only the new row, got $rows")
    rw2.close()
  }
}
