package graft.operators

import graft.functions.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Sampling decisions hash the row's ID (mod-prime rolling hash of its
  * string form) instead of drawing RNG state: the same row is kept or
  * dropped on every run, on any cluster layout, and the decision is
  * replayable in plain SQL (the DuckDB oracle recomputes it). Map-only —
  * the filter runs inside the scan stage, no shuffle, no driver
  * coordination, so it behaves identically at 100 TB.
  */
object Sampling {

  private val Mod = 1000000007L
  /** Knuth multiplicative constant; Scramble * Mod < 2^63, so the product
    * never overflows and the same fold replays in overflow-checked SQL. */
  private val Scramble = 2654435761L

  /** The raw rolling hash is monotone in short id strings (h("42") is just
    * the polynomial of two digits — far below any percentage threshold),
    * which would turn "sample 1%" into "keep the lowest ids". One
    * multiplicative round mod the prime permutes the bucket space. */
  private def bucket(idCol: Column): Column =
    HashExpressions.rollingHash(idCol.cast("string")) * Scramble % Mod

  /** Keep ~`rate` of rows (0..1), decided by id hash. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(bucket(col(idCol)) < (Mod * rate).toLong)

  /** Per-stratum rates: rows in strata absent from `rates` are dropped.
    * The stratum column is compared as a string. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (k, r)) =>
      when(col(stratumCol).cast("string") === k, lit((Mod * r).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < threshold)
  }

  /** Domain-mixing resampler (training-data mixture control): down-sample
    * each domain toward target fraction `weights(d)` of the total corpus.
    * Acceptance rate r_d = min(1, w_d · N / n_d): domains over-represented
    * against the target shrink deterministically, under-represented ones
    * are kept whole (a resampler cannot invent rows — upsampling is the
    * training loader's job). Rows of domains absent from `weights` drop.
    *
    * Scale shape: ONE hash-aggregation pass computes the per-domain counts
    * (result bounded by domain cardinality — hundreds, not corpus-sized),
    * which collect to become literal thresholds; the corpus itself is then
    * touched once by the same map-only id-hash filter as
    * [[stratifiedSample]], inside the scan stage. */
  def mixDomains(df: DataFrame, idCol: String, domainCol: String,
                 weights: Map[String, Double]): DataFrame = {
    val counts = df.groupBy(col(domainCol).cast("string").as("__d"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val rates = weights.flatMap { case (d, w) =>
      counts.get(d).map(n => d -> math.min(1.0, w * total / n)) }
    stratifiedSample(df, idCol, domainCol, rates)
  }

  /** Cluster-stratified diversity sampling (coverage-first data selection
    * — the embedding-space analogue of [[stratifiedSample]], in the
    * spirit of SemDeDup/D4-style diversification): IVF-assign each vector
    * to its nearest centroid (deterministic hash-sampled codebook, the
    * same fixed-K quantizer model as the ANN index), then keep the top
    * `k` rows PER CLUSTER by (quality DESC, id) — a subset that covers
    * every region of embedding space instead of letting dense regions
    * crowd out the tails, with quality deciding survivors within each
    * region.
    *
    * 100 TB shape: assignment is the map-side native argmax (no
    * Exchange between scan and cid); the quality join keys on the row id
    * (AQE-skew-splittable); the only small-keyed shuffle is the
    * per-cluster top-k rank, and its Window partitions on cid with
    * K ≪ rows — each cluster's candidates funnel to one task, which is
    * the operator's documented knob (raise K for bigger corpora, exactly
    * like the ANN index's nlist). */
  def diverseTopK(emb: DataFrame, quality: DataFrame,
                  idCol: String, vecCol: String,
                  qIdCol: String, qCol: String,
                  numCentroids: Int, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.normD
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      normD(col(vecCol)).as("vn"))
    val cents = Similarity.ivfCentroids(v, numCentroids)
    val assigned = Similarity.assignToCentroids(v, cents).select("id", "cid")
    val q = quality.select(col(qIdCol).as("id"), col(qCol).cast("long").as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("q").desc, col("id"))
    assigned.join(q, Seq("id"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("cid"), col("id"), col("q"), col("rnk"))
  }
}
