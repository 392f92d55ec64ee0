package graft

import graft.engine._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Incremental top-N MVs (RisingWave's TopN / GroupTopN operator shape):
  * `SELECT ... ORDER BY ... LIMIT n` statements stream their inner query
  * and re-truncate per epoch instead of re-running the whole statement at
  * every FLUSH. Displacement must emit Deletes (the op plain streaming
  * modes never produce), and ineligible shapes must fall back to batch. */
class TopNMvSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("grp", StringType), StructField("score", DoubleType)))

  test("raw top-N: incremental, displacement retracts, matches batch order") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_ev", schema)
    rw.mv("SELECT id, score FROM tn_ev ORDER BY score DESC, id LIMIT 2", "tn_mv")
    val mv = rw.mvByName("tn_mv").get
    assert(mv.isStreamingMode && mv.isTopNMode, "must use the incremental top-N path")

    val t = rw.table("tn_ev").get
    t.insert(Seq(Row(1L, "a", 5.0), Row(2L, "a", 3.0), Row(3L, "a", 1.0)))
    rw.flush()
    assert(mv.df.collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    // new leader displaces id=2 from the top 2
    t.insert(Seq(Row(4L, "a", 9.0)))
    rw.flush()
    assert(mv.df.collect().map(_.getLong(0)).toSet == Set(4L, 1L))
    assert(mv.isTopNMode)

    // the changelog carries the displacement as a Delete
    val ops = mv.subscription().declareCursor(Some(0L))
    val all = Iterator.continually(ops.fetch(100)).takeWhile(_.nonEmpty).flatten.toSeq
    val byOp = all.groupBy(r => r.getString(r.length - 2)).view.mapValues(_.size).toMap
    assert(byOp.getOrElse("Delete", 0) >= 1, s"displacement must retract: $byOp")
    rw.close()
  }

  test("grouped top-N: evicted keys re-enter via the bound-triggered re-fetch; state stays O(n)") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_rf", StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("score", DoubleType))))
    // n=2, cache margin max(2n,16)=16 → carried state = top 18 of 20 keys
    rw.mv("SELECT grp, SUM(CAST(score AS DECIMAL(18,6))) AS s FROM tn_rf " +
      "GROUP BY grp ORDER BY s DESC, grp LIMIT 2", "tn_rf_mv")
    val mv = rw.mvByName("tn_rf_mv").get
    assert(mv.isTopNMode && mv.isChangelogCascadeMode,
      "grouped top-N must take the cascade-backed incremental path")
    val t = rw.table("tn_rf").get
    // keys k01..k20 scored 1..20: top-2 {k20, k19}; k01/k02 are EVICTED
    // from the carried state (ranks 19-20 of 20 > n+C=18)
    t.insert((1 to 20).map(i => Row(i.toLong, f"k$i%02d", i.toDouble)))
    rw.flush()
    def vis() = mv.df.collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue)).toSet
    assert(vis() == Set(("k20", 20.0), ("k19", 19.0)))
    assert(mv.topNStateCount <= 18L,
      s"grouped state must truncate to n+C, got ${mv.topNStateCount}")

    // every carried key crashes below the evicted keys' frozen scores
    // (1, 2): the bound ranks inside the top 2 → underflow → re-fetch —
    // k02 and k01 drop back IN from outside the carried state entirely
    t.insert((3 to 20).map(i => Row((100 + i).toLong, f"k$i%02d", -100.0)))
    rw.flush()
    assert(vis() == Set(("k02", 2.0), ("k01", 1.0)),
      "evicted keys must re-enter through the re-fetch path")
    assert(mv.topNStateCount <= 18L, "re-fetched state must re-truncate")
    rw.close()
  }

  test("grouped top-N: bound-key re-entry must not weaken the eviction bound") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_bd", schema)
    rw.mv("SELECT grp, SUM(CAST(score AS DECIMAL(18,6))) AS s FROM tn_bd " +
      "GROUP BY grp ORDER BY s DESC, grp LIMIT 1", "tn_bd_mv")
    val mv = rw.mvByName("tn_bd_mv").get
    assert(mv.isTopNMode && mv.isChangelogCascadeMode)
    mv.topNCacheMargin = 1 // carried state = top 2 keys only
    val t = rw.table("tn_bd").get
    def vis() = mv.df.collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue)).toSet
    // epoch 1: x1/x2 kept, a@50 + b@45 evicted — the single carried bound
    // row (a@50) is the only record that keys up to 50 exist outside
    t.insert(Seq(Row(1L, "x1", 100.0), Row(2L, "x2", 90.0),
      Row(3L, "a", 50.0), Row(4L, "b", 45.0)))
    rw.flush()
    assert(vis() == Set(("x1", 100.0)))
    // epoch 2: the delta names the BOUND key (a sinks to 30). Dropping the
    // stale bound and rebuilding it from this epoch's evictions alone
    // (a@30) would orphan b@45 — no carried record of it would remain
    t.insert(Seq(Row(5L, "a", -20.0)))
    rw.flush()
    assert(vis() == Set(("x1", 100.0)))
    // epoch 3: every carried key sinks below b's frozen 45. Batch top-1 is
    // b — the incremental path reaches it only if the bound still covers
    // previously evicted keys (underflow → re-fetch)
    t.insert(Seq(Row(6L, "x1", -60.0), Row(7L, "x2", -80.0)))
    rw.flush()
    assert(vis() == Set(("b", 45.0)),
      "a previously evicted key above the sunken carried state must surface")
    assert(mv.isTopNMode)
    rw.close()
  }

  test("grouped top-N: aggregate inner keeps rankable key state so keys can re-enter") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_ev2", schema)
    rw.mv("SELECT grp, count(*) AS n FROM tn_ev2 GROUP BY grp ORDER BY n DESC, grp LIMIT 2", "tn_mv2")
    val mv = rw.mvByName("tn_mv2").get
    assert(mv.isTopNMode && mv.isChangelogCascadeMode)

    val t = rw.table("tn_ev2").get
    t.insert(Seq(Row(1L, "a", 0.0), Row(2L, "a", 0.0), Row(3L, "b", 0.0),
      Row(4L, "c", 0.0), Row(5L, "c", 0.0), Row(6L, "c", 0.0)))
    rw.flush()
    assert(mv.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("c", 3L), ("a", 2L)))

    // 'b' (currently outside the top 2) grows past 'a' — it must re-enter,
    // which requires the full per-key state, not just the visible rows
    t.insert(Seq(Row(7L, "b", 0.0), Row(8L, "b", 0.0), Row(9L, "b", 0.0)))
    rw.flush()
    assert(mv.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b", 4L), ("c", 3L)))
    rw.close()
  }

  test("ORDER BY over a projected-away column falls back to batch re-run, stays correct") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_ev3", schema)
    // score is not in the output list: the truncation cannot re-evaluate
    // over the snapshot, so the MV must fall back (and still be right)
    rw.mv("SELECT id FROM tn_ev3 ORDER BY score DESC, id LIMIT 2", "tn_mv3")
    val mv = rw.mvByName("tn_mv3").get
    assert(!mv.isTopNMode, "un-truncatable ORDER BY must not claim top-N mode")
    val t = rw.table("tn_ev3").get
    t.insert(Seq(Row(1L, "a", 1.0), Row(2L, "a", 8.0), Row(3L, "a", 5.0)))
    rw.flush()
    assert(mv.df.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    rw.close()
  }

  test("OFFSET disables incremental top-N (below-offset rows still matter)") {
    assert(Dialect.splitTopNTail(
      "SELECT id FROM t ORDER BY id LIMIT 5 OFFSET 2").isEmpty)
    assert(Dialect.splitTopNTail("SELECT id FROM t ORDER BY id LIMIT 5") ==
      Some(("SELECT id FROM t", "id", 5)))
    // ORDER inside a window/subquery is not a top-N tail
    assert(Dialect.splitTopNTail(
      "SELECT rank() OVER (ORDER BY id) FROM t").isEmpty)
    assert(Dialect.splitTopNTail(
      "SELECT * FROM (SELECT id FROM t ORDER BY id LIMIT 3) s").isEmpty)
  }

  test("two concurrent top-N MVs keep separate truncation views (no catalog collision)") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_ca", schema)
    rw.createTable("tn_cb", schema)
    val ma = rw.mv("SELECT id, score FROM tn_ca ORDER BY score DESC, id LIMIT 2", "tn_mva")
    val mb = rw.mv("SELECT id, score FROM tn_cb ORDER BY score ASC, id LIMIT 2", "tn_mvb")
    assert(ma.isTopNMode && mb.isTopNMode)
    val (ta, tb) = (rw.table("tn_ca").get, rw.table("tn_cb").get)
    // interleaved epochs: each MV re-truncates against ITS per-MV source
    // view (__topn_src_<view>); a shared name would cross-feed the states
    ta.insert(Seq(Row(1L, "a", 5.0), Row(2L, "a", 9.0), Row(3L, "a", 1.0)))
    tb.insert(Seq(Row(10L, "b", 5.0), Row(20L, "b", 9.0), Row(30L, "b", 1.0)))
    rw.flush()
    ta.insert(Seq(Row(4L, "a", 7.0)))
    tb.insert(Seq(Row(40L, "b", 0.5)))
    rw.flush()
    assert(ma.df.collect().map(_.getLong(0)).toSeq == Seq(2L, 4L),
      "DESC top-2 of table a") // 9.0, 7.0
    assert(mb.df.collect().map(_.getLong(0)).toSeq == Seq(40L, 30L),
      "ASC top-2 of table b") // 0.5, 1.0
    rw.close()
  }

  test("top-N MV as a cascade source: downstream cascades on the changelog (no stale face)") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_ev4", schema)
    rw.mv("SELECT id, score FROM tn_ev4 ORDER BY score DESC, id LIMIT 2", "tn_mv4")
    rw.mv("SELECT count(*) AS n FROM tn_mv4", "tn_down")
    val down = rw.mvByName("tn_down").get
    // round-7: a global aggregate over a top-N upstream consumes its 4-op
    // changelog (displacement Deletes included) instead of demoting to a
    // per-FLUSH batch re-run
    assert(down.isChangelogCascadeMode,
      "global rollup over a top-N MV must consume its changelog")
    val t = rw.table("tn_ev4").get
    t.insert(Seq(Row(1L, "a", 5.0), Row(2L, "a", 3.0), Row(3L, "a", 7.0)))
    rw.flush()
    assert(down.df.head.getLong(0) == 2L,
      "downstream must track the truncated snapshot, not a stale face")
    t.insert(Seq(Row(4L, "a", 9.0)))
    rw.flush()
    assert(down.df.head.getLong(0) == 2L)
    assert(down.isChangelogCascadeMode, "mode must survive epochs")
    rw.close()
  }

  test("keyed rollup over a grouped top-N cascades; displacement folds through") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_ev5", schema)
    // leaderboard: top-3 grp keys by summed score
    rw.mv("SELECT grp, SUM(CAST(score AS DECIMAL(18,6))) AS s FROM tn_ev5 " +
      "GROUP BY grp ORDER BY s DESC, grp LIMIT 3", "tn_lead")
    // rollup over the leaderboard, keyed on the first letter of the key
    rw.mv("SELECT substring(grp, 1, 1) AS g, count(*) AS n, " +
      "CAST(SUM(s) AS DOUBLE) AS sv FROM tn_lead GROUP BY substring(grp, 1, 1)",
      "tn_roll")
    val up = rw.mvByName("tn_lead").get
    val down = rw.mvByName("tn_roll").get
    assert(up.isTopNMode, "leaderboard must take the incremental top-N path")
    assert(down.isChangelogCascadeMode,
      "keyed rollup over a top-N MV must consume its changelog")

    val t = rw.table("tn_ev5").get
    t.insert(Seq(Row(1L, "a1", 10.0), Row(2L, "a2", 8.0), Row(3L, "b1", 6.0),
      Row(4L, "b2", 1.0)))
    rw.flush()
    def state() = down.df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // top-3: a1(10), a2(8), b1(6)
    assert(state() == Set(("a", 2L, 18.0), ("b", 1L, 6.0)))

    // b2 climbs to 20: displaces b1(6) from the top-3 → the cascade must
    // fold b1's Delete and b2's Insert — group b keeps ONE session but its
    // sum jumps; group a loses a2(8)
    t.insert(Seq(Row(5L, "b2", 19.0)))
    rw.flush()
    // top-3 now: b2(20), a1(10), a2(8) — b1 displaced
    assert(state() == Set(("a", 2L, 18.0), ("b", 1L, 20.0)),
      "displacement must retract the old member and fold the new one")
    assert(down.isChangelogCascadeMode, "mode must survive epochs")

    // the downstream's own changelog shows the b-group fold as an UD/UI pair
    val sub = down.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .filter(_.getString(0) == "b").map(r => r.getString(r.length - 2))
    assert(ops.count(_ == "UpdateDelete") >= 1 && ops.count(_ == "UpdateInsert") >= 1,
      s"b-group fold must be an update pair, got $ops")
    rw.close()
  }

  test("grouped top-N over a PK/upsert table maintains incrementally (round 9)") {
    // previously batch re-run (the streaming face replays raw version
    // appends); the cascade-backed path consumes the table's keyed 4-op
    // changelog, so upsert overwrites fold as retraction + recompute
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.execute(
      """CREATE TABLE tn_pk (id BIGINT PRIMARY KEY, grp STRING, score DOUBLE)
        |ON CONFLICT DO UPDATE IF NOT NULL WITH VERSION COLUMN(score)""".stripMargin)
    val mv = rw.mv("SELECT grp, CAST(SUM(score) AS DOUBLE) AS s FROM tn_pk " +
      "GROUP BY grp ORDER BY s DESC, grp LIMIT 2", "tn_pk_mv")
    assert(mv.isTopNMode && mv.isChangelogCascadeMode,
      "grouped top-N over an upsert table must take the cascade-backed path")
    rw.execute("INSERT INTO tn_pk VALUES (1, 'a', 10), (2, 'b', 8), (3, 'c', 5), (4, 'a', 2)")
    rw.execute("FLUSH")
    def vis() = mv.df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(vis() == Set(("a", 12.0), ("b", 8.0)))
    // upsert id=1 to a higher version: group a's sum changes via retraction
    rw.execute("INSERT INTO tn_pk VALUES (1, 'a', 11)")
    rw.execute("FLUSH")
    assert(vis() == Set(("a", 13.0), ("b", 8.0)))
    // upsert moves id=2 out of group b entirely: b (6? no rows → vanishes)
    rw.execute("INSERT INTO tn_pk VALUES (2, 'c', 9)")
    rw.execute("FLUSH")
    assert(vis() == Set(("c", 14.0), ("a", 13.0)),
      "a vanished group must leave and the recomputed group must rank in")
    assert(mv.isTopNMode && mv.isChangelogCascadeMode, "mode must survive epochs")
    rw.close()
  }

  test("raw top-N over a PK/upsert table folds inserts; retractions re-fetch") {
    // previously batch re-run; the raw-cascade path keeps O(n) state:
    // inserts fold in directly, a retraction touching a carried row
    // re-fetches once (the replacement is outside the carried state)
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.execute("CREATE TABLE tn_rpk (id BIGINT PRIMARY KEY, score DOUBLE)")
    val mv = rw.mv("SELECT id, score FROM tn_rpk ORDER BY score DESC, id LIMIT 2",
      "tn_rpk_mv")
    assert(mv.isTopNMode && mv.isChangelogCascadeMode,
      "raw top-N over a PK table must take the cascade-backed path")
    rw.execute("INSERT INTO tn_rpk VALUES (1, 10), (2, 8), (3, 5)")
    rw.execute("FLUSH")
    def vis() = mv.df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(vis() == Set((1L, 10.0), (2L, 8.0)))
    // pure insert: folds into the carried state without a re-fetch
    val evalsBefore = mv.statementEvals
    rw.execute("INSERT INTO tn_rpk VALUES (4, 9)")
    rw.execute("FLUSH")
    assert(vis() == Set((1L, 10.0), (4L, 9.0)))
    assert(mv.statementEvals == evalsBefore,
      "an insert-only epoch must not re-evaluate the statement")
    // PK overwrite retracts a carried row (UD 10.0 + UI 1.0): re-fetch
    rw.execute("INSERT INTO tn_rpk VALUES (1, 1)")
    rw.execute("FLUSH")
    assert(vis() == Set((4L, 9.0), (2L, 8.0)),
      "a retracted top row must be replaced from outside the carried state")
    // DELETE of a visible row: same re-fetch path through the DML fold
    rw.execute("DELETE FROM tn_rpk WHERE id = 4")
    rw.execute("FLUSH")
    assert(vis() == Set((2L, 8.0), (3L, 5.0)))
    assert(mv.isTopNMode && mv.isChangelogCascadeMode, "mode must survive epochs")
    rw.close()
  }

  test("grouped top-N folds DELETE retractions; emptied groups leave the top-N") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.execute("CREATE TABLE tn_dml (id BIGINT PRIMARY KEY, grp STRING, score DOUBLE)")
    val mv = rw.mv("SELECT grp, count(*) AS n FROM tn_dml " +
      "GROUP BY grp ORDER BY n DESC, grp LIMIT 2", "tn_dml_mv")
    assert(mv.isTopNMode && mv.isChangelogCascadeMode)
    rw.execute("INSERT INTO tn_dml VALUES (1, 'a', 1), (2, 'a', 2), (3, 'a', 3), " +
      "(4, 'b', 4), (5, 'b', 5), (6, 'c', 6)")
    rw.execute("FLUSH")
    def vis() = mv.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(vis() == Set(("a", 3L), ("b", 2L)))
    // DELETE empties group a: it must vanish from the carried state and
    // the visible top-N, letting c surface
    rw.execute("DELETE FROM tn_dml WHERE grp = 'a'")
    rw.execute("FLUSH")
    assert(vis() == Set(("b", 2L), ("c", 1L)),
      "an emptied group must leave the top-N through the retraction fold")
    assert(mv.isTopNMode && mv.isChangelogCascadeMode,
      "DML must not demote the cascade-backed top-N")
    rw.close()
  }

  test("grouped top-N over an agg-over-LEFT-join inner FOLDS (round 11 composition)") {
    // the top-N cascade's inner admission shares admitDeltaAgg, so the
    // round-11 outer-join aggregate fold composes for free: top labels by
    // fact count over an enrichment join, with dim arrivals moving facts
    // between the NULL-padded label and named ones THROUGH the fold and
    // the truncation
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tnoj_f", StructType(Seq(StructField("fid", LongType),
      StructField("uid", LongType))), primaryKey = Seq("fid"))
    rw.createTable("tnoj_d", StructType(Seq(StructField("uid", LongType),
      StructField("nm", StringType))), primaryKey = Seq("uid"))
    val mv = rw.mv("SELECT d.nm AS label, count(*) AS n FROM tnoj_f f " +
      "LEFT JOIN tnoj_d d ON d.uid = f.uid GROUP BY d.nm " +
      "ORDER BY n DESC, label LIMIT 2", "tnoj_mv")
    assert(mv.isTopNMode && mv.isDeltaAggMode,
      "the outer-join aggregate fold must back the grouped top-N (round 11)")
    val f = rw.table("tnoj_f").get
    val d = rw.table("tnoj_d").get
    d.insert(Seq(Row(1L, "ann")))
    f.insert(Seq(Row(10L, 1L), Row(11L, 1L), Row(12L, 2L), Row(13L, 3L)))
    rw.flush()
    def vis() = mv.df.collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    // counts: ann=2 (uid 1), NULL=2 (uids 2,3); ORDER BY n DESC, label —
    // NULL labels sort LAST in Spark's default asc ordering, so ann leads
    assert(vis() == Set((Some("ann"), 2L), (None, 2L)))
    val evals = mv.statementEvals
    // a late dim splits the NULL group: uid 2's fact moves to bob; at the
    // 1-count tie, ascending label order is NULLS FIRST (Spark default),
    // so the NULL label holds rank 2 — same as the batch evaluation
    d.insert(Seq(Row(2L, "bob")))
    rw.flush()
    assert(vis() == Set((Some("ann"), 2L), (None, 1L)),
      s"NULLS FIRST keeps the padded label at the tie: ${vis()}")
    val batch = rw.fetch("SELECT d.nm AS label, count(*) AS n FROM tnoj_f f " +
        "LEFT JOIN tnoj_d d ON d.uid = f.uid GROUP BY d.nm " +
        "ORDER BY n DESC, label LIMIT 2")
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(vis() == batch, "the folded top-N must equal batch evaluation")
    assert(mv.statementEvals == evals,
      "outer-join fold epochs must not re-evaluate the inner statement")
    assert(mv.isTopNMode && mv.isDeltaAggMode)
    rw.close()
  }

  test("top-N over a ROLLUP inner must not fold (hidden grouping_id) and stays correct") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("tn_ru", StructType(Seq(StructField("id", LongType),
      StructField("g1", StringType), StructField("g2", StringType),
      StructField("v", LongType))), primaryKey = Seq("id"))
    // the rollup's Aggregate groups by spark_grouping_id, which the output
    // drops — the delta-agg spec MUST refuse (its state would merge each
    // subtotal row into the base group it shadows); the grouped-top-N path
    // reaches the spec without the cascade's Multiset rejection, so this
    // pins admit's own guard end to end
    val stmt = "SELECT g1, g2, CAST(sum(v) AS BIGINT) AS sv FROM tn_ru " +
      "GROUP BY ROLLUP(g1, g2) ORDER BY sv DESC, g1 NULLS FIRST, g2 NULLS FIRST LIMIT 3"
    rw.mv(stmt, "tn_ru_mv")
    val mv = rw.mvByName("tn_ru_mv").get
    assert(!mv.isDeltaAggMode,
      "a rollup inner must not delta-accumulate — grouping_id is no output key")
    val t = rw.table("tn_ru").get
    def read() = mv.df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def batch() = rw.fetch(stmt)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    t.insert(Seq(Row(1L, "a", "x", 10L), Row(2L, "a", "y", 20L),
      Row(3L, "b", "x", 5L)))
    rw.flush()
    // grand total 35, a-subtotal 30, (a,y) 20 — subtotals must stay
    // DISTINCT rows from the NULL-keyed base groups they shadow
    assert(read() == Set((null, null, 35L), ("a", null, 30L), ("a", "y", 20L)))
    assert(read() == batch())
    // retraction flows through every rollup level
    rw.execute("DELETE FROM tn_ru WHERE id = 2")
    rw.flush()
    assert(read() == batch())
    assert(read().contains((null, null, 15L)))
    rw.close()
  }
}
