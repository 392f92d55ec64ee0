package graft

import graft.engine._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Streaming MV-on-MV cascades. Two mechanisms, by upstream shape:
  *  - append-only upstream: the upstream exposes per-reader backfilled face
  *    streams ([[graft.engine.MaterializedView.streamingFaceFor]]) and the
  *    downstream binds one as an ordinary streaming source;
  *  - AGGREGATING upstream (hourly→daily rollup — round-4 verdict item 1):
  *    no face exists (deltas are updates), so the downstream consumes the
  *    upstream's 4-op changelog as a retraction stream and folds
  *    UpdateDelete/UpdateInsert pairs into its own groups
  *    ([[graft.engine.MaterializedView.isChangelogCascadeMode]]).
  * Maintenance modes are asserted throughout — falling back to per-flush
  * batch re-run would be value-correct but defeats the point. */
class CascadeMvSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("event_id", LongType),
    StructField("kind", StringType), StructField("value", DoubleType)))

  test("filter MV → aggregate MV cascade: both streaming, values track inserts") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cas_ev", schema)
    rw.mv("SELECT event_id, kind, value FROM cas_ev WHERE kind = 'a'", "cas_f")
    rw.mv("SELECT kind, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv FROM cas_f GROUP BY kind", "cas_a")
    val up = rw.mvByName("cas_f").get
    val down = rw.mvByName("cas_a").get
    assert(up.isStreamingMode, "filter level must stream")
    assert(down.isStreamingMode, "aggregate level must bind the upstream face and stream")

    val t = rw.table("cas_ev").get
    t.insert(Seq(Row(1L, "a", 1.5), Row(2L, "b", 9.0), Row(3L, "a", 2.5)))
    rw.flush()
    assert(up.df.count() == 2)
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).doubleValue)).toSet == Set(("a", 2L, 4.0)))

    t.insert(Seq(Row(4L, "a", 6.0), Row(5L, "b", 1.0)))
    rw.flush()
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).doubleValue)).toSet == Set(("a", 3L, 10.0)))
    assert(up.isStreamingMode && down.isStreamingMode)
    rw.close()
  }

  test("downstream MV created after data flows backfills from the upstream snapshot") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cas_ev2", schema)
    rw.mv("SELECT event_id, kind, value FROM cas_ev2 WHERE kind = 'a'", "cas_f2")
    val t = rw.table("cas_ev2").get
    t.insert(Seq(Row(1L, "a", 1.0), Row(2L, "a", 2.0), Row(3L, "b", 5.0)))
    rw.flush()
    // late-created downstream must see the already-materialized upstream rows
    rw.mv("SELECT kind, count(*) AS n FROM cas_f2 GROUP BY kind", "cas_a2")
    val down = rw.mvByName("cas_a2").get
    rw.flush()
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L)), "backfill through the face stream must cover history")
    t.insert(Seq(Row(4L, "a", 3.0)))
    rw.flush()
    assert(down.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L)))
    rw.close()
  }

  test("agg→agg cascade folds retractions: an upstream key's aggregate decreases") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cag_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    rw.mv("SELECT k, count(*) AS n, SUM(CAST(v AS DECIMAL(18,6))) AS sv FROM cag_t GROUP BY k",
      "cag_up")
    rw.mv("SELECT substring(k, 1, 1) AS g, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv " +
      "FROM cag_up GROUP BY substring(k, 1, 1)", "cag_dn")
    val up = rw.mvByName("cag_up").get
    val down = rw.mvByName("cag_dn").get
    assert(up.isStreamingMode, "upstream aggregate must stream")
    assert(down.isChangelogCascadeMode,
      "downstream rollup must consume the upstream changelog, not batch re-run")

    val t = rw.table("cag_t").get
    t.insert(Seq(Row("a1", 10.0), Row("a2", 5.0), Row("b1", 3.0)))
    rw.flush()
    def state() = down.df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSet
    assert(state() == Set(("a", 2L, 15.0), ("b", 1L, 3.0)))

    // a NEGATIVE value makes upstream key a1's sum DECREASE (10 → 2): the
    // upstream emits an UD/UI pair and the downstream must fold the
    // retraction — an append-only face could never carry this
    t.insert(Seq(Row("a1", -8.0)))
    rw.flush()
    assert(state() == Set(("a", 3L, 7.0), ("b", 1L, 3.0)))
    assert(down.isChangelogCascadeMode, "mode must survive epochs")

    // the downstream's own changelog records the fold as a retraction pair
    val sub = down.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .filter(_.getString(0) == "a")
      .map(r => (r.getString(r.length - 2), r.getLong(1)))
    assert(ops == Seq(("Insert", 2L), ("UpdateDelete", 2L), ("UpdateInsert", 3L)),
      s"expected Insert then UD/UI for group a, got $ops")
    rw.close()
  }

  test("HAVING cascade: groups crossing the predicate in both directions emit Insert/Delete") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("chv_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    rw.mv("SELECT k, count(*) AS n, SUM(CAST(v AS DECIMAL(18,6))) AS sv FROM chv_t GROUP BY k",
      "chv_up")
    rw.mv("SELECT substring(k, 1, 1) AS g, SUM(sv) AS sv FROM chv_up " +
      "GROUP BY substring(k, 1, 1) HAVING SUM(sv) > 10", "chv_dn")
    val down = rw.mvByName("chv_dn").get
    assert(down.isChangelogCascadeMode,
      "HAVING must not demote the cascade to batch re-run: state and " +
        "touched-key detection run on the pre-HAVING aggregate")

    val t = rw.table("chv_t").get
    t.insert(Seq(Row("a1", 12.0), Row("b1", 5.0)))
    rw.flush()
    def state() = down.df.collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue)).toSet
    assert(state() == Set(("a", 12.0)), "only a (12 > 10) passes the predicate")

    // b crosses INTO the predicate (5 → 12); a crosses OUT (12 → 7, via an
    // upstream retraction) — the two directions the 4-op envelope must show
    t.insert(Seq(Row("b2", 7.0), Row("a1", -5.0)))
    rw.flush()
    assert(state() == Set(("b", 12.0)))
    assert(down.isChangelogCascadeMode, "mode must survive epochs")

    val sub = down.subscription().declareCursor(Some(0L))
    val ops = Iterator.continually(sub.fetch(1000)).takeWhile(_.nonEmpty).flatten.toSeq
      .map(r => (r.getString(0), r.getString(r.length - 2)))
    assert(ops.filter(_._1 == "a").map(_._2) == Seq("Insert", "Delete"),
      s"group a must enter then leave the visible snapshot, got $ops")
    assert(ops.filter(_._1 == "b").map(_._2) == Seq("Insert"),
      s"group b must appear only once it passes the predicate, got $ops")
    rw.close()
  }

  test("cascade epoch plan: the touched-key filter sits below the final Aggregate") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cpp_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    rw.mv("SELECT k, count(*) AS n FROM cpp_t GROUP BY k", "cpp_up")
    // expression grouping key (substring) — the harder pushdown case.
    // approx_percentile (a quantile sketch, non-retractable and with no
    // merge-only admission) keeps this statement OUT of the
    // delta-accumulation path (stddev folds since round 12, integral avg
    // since round 11, exact percentile since the round-12 histogram tier,
    // approx_count_distinct merge-folds insert-only since round 13) so
    // the test still pins the RECOMPUTE epoch's pushdown property.
    rw.mv("SELECT substring(k, 1, 1) AS g, CAST(SUM(n) AS BIGINT) AS n, " +
      "CAST(approx_percentile(n, 0.5) AS BIGINT) AS a FROM cpp_up GROUP BY substring(k, 1, 1)", "cpp_dn")
    val down = rw.mvByName("cpp_dn").get
    assert(down.isChangelogCascadeMode)
    assert(!down.isDeltaAggMode,
      "approx_percentile must force the recompute cascade")
    val t = rw.table("cpp_t").get
    t.insert(Seq(Row("a1", 1.0), Row("b1", 2.0)))
    rw.flush()
    t.insert(Seq(Row("a2", 3.0)))
    rw.flush()
    // per-epoch cost ∝ touched groups requires Catalyst to push the
    // left-semi key join BELOW the Aggregate (PushDownLeftSemiAntiJoin).
    // If a Spark change stopped the pushdown, every epoch would silently
    // become a full recompute over the upstream snapshot — fail loudly.
    val plan = down.lastCascadeEpochPlan.getOrElse(
      fail("cascade epoch must record its recompute plan"))
    val lines = plan.linesIterator.toVector
    val aggIdx = lines.indexWhere(_.contains("Aggregate"))
    val semiIdx = lines.indexWhere(_.contains("LeftSemi"))
    assert(semiIdx >= 0, s"expected a LeftSemi key join in the epoch plan:\n$plan")
    assert(aggIdx >= 0 && aggIdx < semiIdx,
      s"the touched-key semi join must be pushed below the final Aggregate:\n$plan")
    rw.close()
  }

  test("cascade over an enrichment join: upstream agg ⋈ static dim, rolled up") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    import spark.implicits._
    Seq(("a", "east"), ("b", "west"), ("c", "east"))
      .toDF("k", "region").createOrReplaceTempView("cjd_dim")
    rw.createTable("cjd_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    rw.mv("SELECT k, count(*) AS n, SUM(CAST(v AS DECIMAL(18,6))) AS sv " +
      "FROM cjd_t GROUP BY k", "cjd_up")
    // the downstream joins the upstream MV with a STATIC dimension and
    // re-aggregates — still exactly one MV reference, so it cascades
    val down = rw.mv(
      "SELECT d.region AS region, CAST(SUM(u.n) AS BIGINT) AS n, SUM(u.sv) AS sv " +
        "FROM cjd_up u JOIN cjd_dim d ON d.k = u.k GROUP BY d.region", "cjd_dn")
    assert(down.isChangelogCascadeMode,
      "join-enrichment rollup must consume the upstream changelog")
    val t = rw.table("cjd_t").get
    t.insert(Seq(Row("a", 10.0), Row("b", 5.0), Row("c", 2.0)))
    rw.flush()
    def state() = down.df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSet
    assert(state() == Set(("east", 2L, 12.0), ("west", 1L, 5.0)))
    t.insert(Seq(Row("a", -4.0), Row("b", 1.0)))
    rw.flush()
    assert(state() == Set(("east", 3L, 8.0), ("west", 2L, 6.0)))
    rw.close()
  }

  test("two-upstream cascade: a join of two aggregate MVs re-aggregates incrementally") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    val s2 = StructType(Seq(StructField("k", StringType), StructField("v", DoubleType)))
    rw.createTable("c2a_t", s2)
    rw.createTable("c2b_t", s2)
    rw.mv("SELECT k, SUM(CAST(v AS DECIMAL(18,6))) AS sv FROM c2a_t GROUP BY k", "c2a_up")
    rw.mv("SELECT k, SUM(CAST(v AS DECIMAL(18,6))) AS sw FROM c2b_t GROUP BY k", "c2b_up")
    val down = rw.mv(
      "SELECT substring(a.k, 1, 1) AS g, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(a.sv + b.sw) AS DOUBLE) AS tot " +
        "FROM c2a_up a JOIN c2b_up b ON a.k = b.k GROUP BY substring(a.k, 1, 1)",
      "c2_dn")
    assert(down.isChangelogCascadeMode,
      "a join of changelog-emitting MVs must cascade")

    val (ta, tb) = (rw.table("c2a_t").get, rw.table("c2b_t").get)
    ta.insert(Seq(Row("a1", 10.0), Row("a2", 5.0), Row("b1", 3.0)))
    tb.insert(Seq(Row("a1", 1.0), Row("b1", 2.0)))
    rw.flush()
    def state() = down.df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // join matches a1 and b1 only (a2 has no right side yet)
    assert(state() == Set(("a", 1L, 11.0), ("b", 1L, 5.0)))

    // SIMULTANEOUS deltas on both upstreams in one epoch: a retraction on
    // the left (a1 sum 10 → 2) and a new join match on the right (a2)
    ta.insert(Seq(Row("a1", -8.0)))
    tb.insert(Seq(Row("a2", 4.0)))
    rw.flush()
    assert(state() == Set(("a", 2L, 12.0), ("b", 1L, 5.0)))
    assert(down.isChangelogCascadeMode)
    rw.close()
  }

  test("three-level agg chain: a cascade MV is itself a cascadable upstream") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cg3_t", StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType))))
    rw.mv("SELECT k, count(*) AS n FROM cg3_t GROUP BY k", "cg3_l1")
    rw.mv("SELECT substring(k, 1, 1) AS g, CAST(SUM(n) AS BIGINT) AS n " +
      "FROM cg3_l1 GROUP BY substring(k, 1, 1)", "cg3_l2")
    rw.mv("SELECT CASE WHEN g <= 'm' THEN 'lo' ELSE 'hi' END AS band, " +
      "CAST(SUM(n) AS BIGINT) AS n FROM cg3_l2 " +
      "GROUP BY CASE WHEN g <= 'm' THEN 'lo' ELSE 'hi' END", "cg3_l3")
    assert(rw.mvByName("cg3_l1").get.isStreamingMode)
    assert(rw.mvByName("cg3_l2").get.isChangelogCascadeMode)
    assert(rw.mvByName("cg3_l3").get.isChangelogCascadeMode,
      "a cascade MV emits a changelog, so the next level must cascade too")

    val t = rw.table("cg3_t").get
    t.insert(Seq(Row("a1", 1.0), Row("a2", 1.0), Row("z1", 1.0)))
    rw.flush()
    t.insert(Seq(Row("a1", 1.0), Row("z2", 1.0)))
    rw.flush()
    val l3 = rw.mvByName("cg3_l3").get.df.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(l3 == Set(("lo", 3L), ("hi", 2L)))
    rw.close()
  }

  test("dropping the downstream MV releases its face reader on the upstream") {
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    rw.createTable("cas_ev3", schema)
    rw.mv("SELECT event_id, kind, value FROM cas_ev3 WHERE kind = 'a'", "cas_f3")
    rw.mv("SELECT kind, count(*) AS n FROM cas_f3 GROUP BY kind", "cas_a3")
    val t = rw.table("cas_ev3").get
    t.insert(Seq(Row(1L, "a", 1.0)))
    rw.flush()
    rw.execute("DROP MATERIALIZED VIEW cas_a3")
    // upstream keeps streaming and must not buffer for the dropped reader
    t.insert(Seq(Row(2L, "a", 2.0)))
    rw.flush()
    assert(rw.mvByName("cas_f3").get.df.count() == 2)
    assert(rw.mvByName("cas_a3").isEmpty)
    rw.close()
  }

  test("aggregate over a LEFT JOIN of live tables FOLDS; late dims move groups") {
    // round 11: agg-over-enrichment-join delta-accumulates — the dim (the
    // null-padded side the child is not linear in) folds via the
    // aux-partial difference pair over restricted Q(new)/Q(old); the fact
    // side keeps sign-split delta partials. A late dim arrival must move
    // facts OUT of the NULL-padded group and into the named one, through
    // the FOLD (round 10 kept this shape on touched-group recompute).
    val rw = GraftEngine.open(ConnOptions(), Some(spark))
    val factSchema = StructType(Seq(StructField("fid", LongType),
      StructField("uid", LongType), StructField("v", LongType)))
    val dimSchema = StructType(Seq(StructField("uid", LongType),
      StructField("nm", StringType)))
    rw.createTable("clj_f", factSchema, primaryKey = Seq("fid"))
    rw.createTable("clj_d", dimSchema, primaryKey = Seq("uid"))
    rw.mv("SELECT d.nm AS label, count(*) AS n, CAST(sum(f.v) AS BIGINT) AS sv " +
      "FROM clj_f f LEFT JOIN clj_d d ON d.uid = f.uid GROUP BY d.nm", "clj_mv")
    val mv = rw.mvByName("clj_mv").get
    assert(mv.isChangelogCascadeMode && mv.isDeltaAggMode,
      "agg-over-outer-join must delta-accumulate (round 11)")
    def groups: Map[Option[String], (Long, Long)] =
      mv.df.collect().map(r =>
        Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    val f = rw.table("clj_f").get
    val d = rw.table("clj_d").get
    f.insert(Seq(Row(1L, 10L, 5L), Row(2L, 10L, 7L), Row(3L, 20L, 1L)))
    rw.flush()
    assert(groups == Map(None -> ((3L, 13L))), "all facts pad into the NULL group")
    val evals = mv.statementEvals
    d.insert(Seq(Row(10L, "ann")))
    rw.flush()
    assert(groups == Map(Some("ann") -> ((2L, 12L)), None -> ((1L, 1L))),
      "a late dim must move its facts out of the NULL group")
    // both sides in one epoch: new fact for the named group + new dim
    d.insert(Seq(Row(20L, "bob")))
    f.insert(Seq(Row(4L, 10L, 2L)))
    rw.flush()
    assert(groups == Map(Some("ann") -> ((3L, 14L)), Some("bob") -> ((1L, 1L))))
    rw.execute("DELETE FROM clj_d WHERE uid = 10")
    rw.flush()
    assert(groups == Map(None -> ((3L, 14L)), Some("bob") -> ((1L, 1L))),
      "deleting the dim must move the facts back to the NULL group")
    assert(mv.statementEvals == evals,
      "outer-join fold epochs must not re-evaluate the statement")
    assert(mv.isDeltaAggMode, "DML must not demote the fold")
    rw.close()
  }
}
