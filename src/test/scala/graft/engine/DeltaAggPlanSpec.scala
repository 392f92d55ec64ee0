package graft.engine

import org.apache.spark.sql.functions._

/** Plan-shape pins for the delta-accumulation internals ([[DeltaAgg]]):
  * the state merge must never shuffle the carried state — both the
  * untouched passthrough (anti) and the touched slice (semi) join against
  * a BROADCAST key set, and only the delta-sized resummed union pays a
  * (hash-aggregate) exchange. A Spark change that stopped broadcasting
  * would silently turn every fold epoch into a two-sided state shuffle. */
class DeltaAggPlanSpec extends graft.SparkSpec {

  test("merge plan: broadcast key joins on the state side, no sort-merge join") {
    import spark.implicits._
    val stmt = spark.createDataFrame(
      Seq(("a", 1L), ("b", 2L)).toDF("grp", "v").rdd,
      Seq(("a", 1L)).toDF("grp", "v").schema)
    stmt.createOrReplaceTempView("dap_src")
    val df = spark.sql("SELECT grp, count(*) AS n, sum(v) AS sv FROM dap_src GROUP BY grp")
    val spec = DeltaAgg.admit(df.queryExecution.analyzed).getOrElse(
      fail("count/sum over a long column must be admitted"))
    val aux = DeltaAgg.aux(spark, spec, df.queryExecution.analyzed).localCheckpoint(true)
    val addAux = aux.limit(1).localCheckpoint(true)
    val delAux = aux.limit(0).localCheckpoint(true)
    val merged = DeltaAgg.merge(aux, addAux, delAux, spec)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the touched-key joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the state side must never pay a two-sided shuffle join:\n$plan")
  }

  test("admit: double sums/avg and filters reject; distinct/stddev fold (round 12)") {
    import spark.implicits._
    Seq(("a", 1.0)).toDF("grp", "d").createOrReplaceTempView("dap_d")
    Seq(("a", 1L)).toDF("grp", "v").createOrReplaceTempView("dap_v")
    def admitOf(sql: String) =
      DeltaAgg.admit(spark.sql(sql).queryExecution.analyzed)
    assert(admitOf("SELECT grp, sum(d) AS s FROM dap_d GROUP BY grp").isEmpty,
      "double sum must be rejected")
    assert(admitOf("SELECT grp, avg(d) AS a FROM dap_d GROUP BY grp").isEmpty,
      "double avg must be rejected without the tolerance flag")
    assert(admitOf("SELECT grp, avg(v) AS a FROM dap_v GROUP BY grp").nonEmpty,
      "integral avg folds exactly via the long-sum slot (round 11)")
    assert(admitOf("SELECT grp, count(DISTINCT v) AS n FROM dap_v GROUP BY grp").nonEmpty,
      "COUNT(DISTINCT) folds via the two-level reference-count tier (round 12)")
    assert(admitOf("SELECT grp, sum(DISTINCT v) AS s, avg(DISTINCT v) AS a " +
      "FROM dap_v GROUP BY grp").nonEmpty,
      "SUM/AVG(DISTINCT) over integrals fold via the two-level tier (round 12)")
    assert(admitOf("SELECT grp, sum(DISTINCT d) AS s FROM dap_d GROUP BY grp").isEmpty,
      "float SUM(DISTINCT) stays rejected — no order-insensitive re-sum exists")
    assert(admitOf("SELECT grp, stddev_samp(v) AS s FROM dap_v GROUP BY grp").nonEmpty,
      "stddev over an integral child folds via the sum-of-squares tier (round 12)")
    assert(admitOf("SELECT grp, stddev_samp(d) AS s FROM dap_d GROUP BY grp").isEmpty,
      "double-child stddev stays rejected without the tolerance flag")
    assert(admitOf("SELECT grp, count(v) FILTER (WHERE v > 0) AS n, " +
      "sum(v) FILTER (WHERE v % 2 = 0) AS se, max(v) FILTER (WHERE v < 100) AS mx " +
      "FROM dap_v GROUP BY grp").nonEmpty,
      "FILTERed plain aggregates fold — partials inherit the predicate (round 12)")
    assert(admitOf("SELECT grp, count(DISTINCT v) FILTER (WHERE v > 0) AS n " +
      "FROM dap_v GROUP BY grp").isEmpty,
      "FILTER on dk-keyed kinds rejects — refcounts ride the unfiltered row counter")
    assert(admitOf("SELECT grp, percentile(v, 0.5) FILTER (WHERE v > 0) AS p " +
      "FROM dap_v GROUP BY grp").isEmpty,
      "FILTER on the histogram tier rejects for the same reason")
    assert(admitOf("SELECT grp, corr(v, v * 2) AS c, covar_pop(v, v + 1) AS cp " +
      "FROM dap_v GROUP BY grp").nonEmpty,
      "bivariate stats over integral-under-cast children fold (round 12)")
    assert(admitOf("SELECT grp, corr(d, d) AS c FROM dap_d GROUP BY grp").isEmpty,
      "double-child corr stays rejected without the tolerance flag")
    assert(admitOf("SELECT grp, regr_slope(v, v * 2) AS sl, " +
      "regr_count(v, v) AS n, regr_r2(v, v * 3) AS r2 FROM dap_v GROUP BY grp").nonEmpty,
      "the regr_* family folds from the shared co-moments (round 12)")
    assert(admitOf("SELECT grp, regr_slope(d, d) AS sl FROM dap_d GROUP BY grp").isEmpty,
      "double-child regr stays rejected without the tolerance flag")
    assert(admitOf("SELECT grp, count(*) AS n, sum(v) AS sv FROM dap_v GROUP BY grp").nonEmpty,
      "plain count/sum must be admitted")
    assert(admitOf(
      "SELECT grp, CAST(sum(v) AS BIGINT) AS sv, count(*) > 1 AS big FROM dap_v GROUP BY grp").nonEmpty,
      "deterministic wrappers over admitted calls must be admitted")
    // round 12: exact percentile/median via the value-histogram state —
    // floats admit (the state stores values, not order-sensitive sums)
    assert(admitOf("SELECT grp, percentile(d, 0.5) AS p, median(d) AS m " +
      "FROM dap_d GROUP BY grp").nonEmpty,
      "percentile/median fold via the histogram tier, even over doubles")
    assert(admitOf("SELECT grp, percentile(d, 0.5, 2) AS p FROM dap_d GROUP BY grp").isEmpty,
      "a user-supplied frequency is not derivable from the histogram state")
    assert(admitOf("SELECT grp, max(DISTINCT v) AS m, min(DISTINCT d) AS n " +
      "FROM dap_v JOIN dap_d USING (grp) GROUP BY grp").nonEmpty,
      "MIN/MAX(DISTINCT) normalize to the plain extremum slots")
    assert(admitOf("SELECT grp, count(DISTINCT v, d) AS n " +
      "FROM dap_v JOIN dap_d USING (grp) GROUP BY grp").nonEmpty,
      "multi-argument COUNT(DISTINCT) keys the state by the tuple")
    assert(admitOf("SELECT grp, count(DISTINCT v) AS n, stddev_samp(v) AS s " +
      "FROM dap_v GROUP BY grp").nonEmpty,
      "stddev re-aggregates exactly over the two-level state (round 12)")
    // round 13: the HLL sketch admits as a merge-only slot (foldAux
    // demotes on the first retraction), but composes with neither the
    // two-level tier nor the join-merge (extremum) path
    assert(admitOf("SELECT grp, approx_count_distinct(v) AS n FROM dap_v GROUP BY grp").nonEmpty,
      "approx_count_distinct admits merge-only (round 13)")
    assert(admitOf("SELECT grp, approx_count_distinct(v) AS n, " +
      "count(DISTINCT v) AS dv FROM dap_v GROUP BY grp").isEmpty,
      "a sketch beside the exact dk state is strictly worse — recompute")
    assert(admitOf("SELECT grp, approx_count_distinct(v) AS n, max(d) AS mx " +
      "FROM dap_v JOIN dap_d USING (grp) GROUP BY grp").isEmpty,
      "the join-merge path has no sketch arithmetic — recompute")
    assert(admitOf("SELECT grp, approx_percentile(v, 0.5) AS p " +
      "FROM dap_v GROUP BY grp").isEmpty,
      "quantile sketches are non-retractable with no merge-only admission")
    // round 12: argument-at-extremum + boolean + predicated-count slots
    assert(admitOf("SELECT grp, max_by(v, d) AS latest, min_by(d, v) AS fst " +
      "FROM dap_v JOIN dap_d USING (grp) GROUP BY grp").nonEmpty,
      "max_by/min_by fold with the ordering-retraction re-fetch")
    assert(admitOf("SELECT grp, bool_and(v > 0) AS a, bool_or(v > 1) AS o, " +
      "count_if(v > 0) AS n FROM dap_v GROUP BY grp").nonEmpty,
      "bool_and/bool_or are boolean extrema; count_if is a count slot")
    // ROLLUP/CUBE plans group by spark_grouping_id, which the output
    // drops — folding would collapse a subtotal row into the base group
    // it shadows (the grouped-top-N path reaches admit without the
    // cascade's Multiset rejection, so admit must reject on its own)
    assert(admitOf("SELECT grp, count(*) AS n FROM dap_v " +
      "GROUP BY ROLLUP(grp)").isEmpty,
      "hidden grouping columns (rollup grouping_id) must reject the fold")
  }
}
