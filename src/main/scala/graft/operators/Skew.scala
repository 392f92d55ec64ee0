package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys (SURVEY §9: at 100 TB a handful
  * of keys — the empty document, a bot user — can hold an entire stage
  * hostage on one reducer).
  *
  * AQE's skew-join split handles storage-level skew automatically; these
  * helpers cover the two cases it can't: holistic aggregations whose
  * per-key state is huge (collect_list / count-distinct style), and joins
  * where one side's hot keys are known up front. Both are pure DataFrame
  * rewrites — deterministic, no sampling — so results are identical to the
  * unsalted form.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: group on
    * (key, salt) first — spreading a hot key over `buckets` reducers —
    * then combine the partials per key.
    *
    * The caller supplies both phases, e.g. partial `count(*) as c` /
    * final `sum(c) as c`, or partial `sum(x)` / final `sum(sum_x)`.
    * The salt is a deterministic hash of `saltBy` (a high-cardinality
    * column like a row id) so re-runs produce identical partials. */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBy: Column, buckets: Int,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Skew-aware equi-join: rows of `left` whose key is in `hotKeys` get a
    * random-ish (deterministic) salt in [0, buckets); `right` is exploded
    * `buckets`-fold for those keys only. Hot keys therefore spread over
    * `buckets` reducers while the long tail joins 1:1 — total shuffle
    * volume grows only by |hot ∩ right| · buckets. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 hotKeys: Seq[Any], buckets: Int,
                 saltBy: Column): DataFrame = {
    val hot = array(hotKeys.map(lit): _*)
    val l = left.withColumn("__salt",
      when(array_contains(hot, col(key)), pmod(hash(saltBy), lit(buckets)))
        .otherwise(lit(0)))
    // replicate hot-key rows of the right side once per salt bucket
    val r = right
      .withColumn("__salts",
        when(array_contains(hot, col(key)), sequence(lit(0), lit(buckets - 1)))
          .otherwise(array(lit(0))))
      .withColumn("__rsalt", explode(col("__salts")))
      .drop("__salts")
      .withColumnRenamed(key, s"__r_$key")
    l.join(r, col("__salt") === col("__rsalt") && col(key) === col(s"__r_$key"))
      .drop("__salt", "__rsalt", s"__r_$key")
  }
}
