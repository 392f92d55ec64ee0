package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Scale design: the query set is tiny and the corpus is huge, so the
  * corpus-side scan must stay shuffle-free — queries are broadcast, scores
  * computed inside the scan stage, and only the per-query top-k survives
  * (rank filter = TopK per partition after AQE). The LSH variant prunes the
  * corpus to colliding buckets first, trading recall for a ~2^planes
  * candidate reduction.
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors for the given query ids.
    * The broadcast of the query rows makes this a map-only scan over the
    * corpus + one shuffle for the per-query rank. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryIds: Seq[Long], k: Int): DataFrame = {
    // norms are precomputed per side BEFORE the cross join (a projection
    // below the join evaluates once per row, not once per pair) — the score
    // dot/(vn*qn) is the same expression tree as cosine(), bit-identical
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"), normD(col(vecCol)).as("vn"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"), col("vn").as("qn"))
    val scored = v
      .crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (dotD(col("qv"), col("v")) / (col("qn") * col("vn"))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("cos"), col("rank"))
  }

  /** Int8 scalar-quantized top-k — the memory-bandwidth scale path: each
    * vector is L2-normalized and quantized to 8-bit integers with ONE
    * per-vector scale (`max|x|/127`) inside the scan stage, a 4× smaller
    * corpus footprint than float32; candidates score by EXACT integer dot
    * products rescaled by the two scales (≈ cosine, since inputs are
    * normalized). Same broadcast-queries / shuffle-free-corpus shape as
    * [[bruteForceTopK]]. Quantization is `floor(x/s + 0.5)` — floor and
    * IEEE division replay bit-for-bit in overflow-checked SQL, with no
    * rounding-mode divergence — so the result is approximate vs exact
    * cosine (quantization error) but fully deterministic and
    * hash-verifiable; recall vs exact is SimilaritySpec's job. */
  def int8TopK(df: DataFrame, idCol: String, vecCol: String,
               queryIds: Seq[Long], k: Int): DataFrame = {
    val e = col(vecCol).cast("array<double>")
    val base = df
      .select(col(idCol).as("id"), e.as("e"), normD(e).as("vn"))
      .withColumn("en", transform(col("e"),
        x => when(col("vn") === 0, lit(0.0)).otherwise(x / col("vn"))))
      .withColumn("s",
        aggregate(col("en"), lit(0.0), (acc, x) => greatest(acc, abs(x))) / lit(127.0))
      .withColumn("q", transform(col("en"),
        x => when(col("s") === 0, lit(0L)).otherwise(floor(x / col("s") + lit(0.5)))))
      .select(col("id"), col("s"), col("q"))
    val q = base.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("q").as("quq"), col("s").as("qs"))
    val scored = base
      .crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (aggregate(zip_with(col("q"), col("quq"), (a, b) => a * b), lit(0L), _ + _)
          .cast("double") * col("s") * col("qs")).as("sco"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sco").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sco"), 6).as("score"), col("rank").as("rnk"))
  }

  /** Product-quantization ANN (Jégou et al. 2011, "Product quantization
    * for nearest neighbor search"): each vector splits into `m` subvectors;
    * each subspace gets its own `codebookSize`-codeword codebook (here the
    * subvectors of the deterministic hash-sampled rows — the same seeded
    * sample rule as [[ivfCentroids]], so the DuckDB oracle rebuilds the
    * codebooks exactly); a vector is stored as `m` codeword ids — at
    * dim=64/m=8 that is 8 small ints instead of 64 floats, a 16-32×
    * compression of the index. Search scores cos(q, reconstruction(x)),
    * which equals the classic ADC form Σⱼ dot(qⱼ, codewordⱼ) up to the
    * norm factors.
    *
    * Encoding is per-subspace argmin of the sequential-fold squared L2
    * distance with first-min (lowest codeword id) tiebreak — every step
    * replayable bit-for-bit in SQL. Approximate in ranking; recall vs the
    * exact top-k is pinned in SimilaritySpec.
    *
    * 100 TB shape: encoding and reconstruction are scan-stage map work
    * against a driver-constant codebook — no shuffle; the stored index is
    * the (id, codes) frame. Encode/decode are native expressions
    * ([[graft.functions.HashExpressions.PqEncode]] /
    * [[HashExpressions.PqReconstruct]], round 11 — one tight loop per row,
    * replacing the interpreted per-element lambda-HOF chain; codes are
    * bit-identical, PlanShapeSpec pins the HOF-free scan). */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             queryIds: Seq[Long], k: Int,
             m: Int = 8, codebookSize: Int = 32, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    val e = col(vecCol).cast("array<double>")
    val v = df.select(col(idCol).as("id"), e.as("e"))
    // codebook fit (model step, like ivfCentroids): subvectors of the
    // hash-scramble-sampled rows, fixed size independent of corpus scale
    val sample = v
      .orderBy(pmod(pmod(col("id"), lit(104729L)) * lit(2654435761L % 104729L),
        lit(104729L)), col("id"))
      .limit(codebookSize)
      .select(col("e")).collect().map(_.getSeq[Double](0).toIndexedSeq)
    val cbArr: Array[Array[Array[Double]]] =
      (0 until m).map(j => sample.map(row =>
        row.slice(j * sub, (j + 1) * sub).toArray).toArray).toArray
    // encode: per subspace, first-min argmin of sequential squared L2
    // (native expression — scan-stage, no lambda dispatch)
    val codes = graft.functions.HashExpressions.pqEncode(col("e"), cbArr)
    // the compressed index: id + m codeword ids (raw vectors dropped)
    val indexed = v.select(col("id"), codes.as("codes"))
    val recon = graft.functions.HashExpressions.pqReconstruct(col("codes"), cbArr)
    val reconD = indexed.withColumn("r", recon).withColumn("rn", normD(col("r")))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("e").as("qe"), normD(col("e")).as("qn"))
    // stage 1 — ADC over the compressed index: approximate cos against the
    // reconstruction, shortlist the top `shortlist` candidates per query
    val shortlist = 5 * k
    val aw = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val cands = reconD.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("qn"), col("id").as("neighbor_id"),
        (dotD(col("qe"), col("r")) / (col("qn") * col("rn"))).as("adc"))
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") <= shortlist)
      .select(col("query_id"), col("qe"), col("qn"), col("neighbor_id"))
    // stage 2 — exact refine (FAISS's IndexRefineFlat step): fetch the
    // shortlist's RAW vectors by id and re-rank with true cosine — the
    // random access touches shortlist·|queries| rows, not the corpus
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sco").desc, col("neighbor_id"))
    cands.join(v.select(col("id").as("neighbor_id"), col("e").as("ne")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("qe"), col("ne")) / (col("qn") * normD(col("ne")))).as("sco"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sco"), 6).as("score"), col("rank"))
  }

  /** Deterministic random hyperplanes for sign-LSH (seeded; public
    * random-projection construction). Exposed within graft so the DuckDB
    * oracle can embed the same constants and replicate signatures exactly. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** (id, v, sig): nPlanes-bit sign-LSH signature per vector — shared by
    * [[lshTopK]] and [[Dedup.embeddingDupPairsLsh]]. `dim` must match the
    * embedding dimensionality: a short hyperplane would zip_with-pad with
    * nulls and degenerate every signature to 0 (no pruning). */
  private[graft] def signature(df: DataFrame, idCol: String, vecCol: String,
                                   nPlanes: Int, dim: Int, seed: Long): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val sigBits = planes.zipWithIndex.map { case (p, i) =>
      when(dotD(col(vecCol), typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col(idCol).as("id"), col(vecCol).as("v"), sigBits.as("sig"))
  }

  /** IVF coarse-quantizer "fit": `numCentroids` deterministic hash-sampled
    * corpus vectors — a FIXED K independent of corpus size (the round-2
    * `id % stride` rule grew |C| linearly with n, making assignment
    * O(n²/stride)). The scramble `(id·2654435761) mod 104729` is replayable
    * in overflow-checked SQL; `orderBy.limit` compiles to
    * TakeOrderedAndProject (map-side top-K + tiny driver merge, no global
    * sort). Collecting K rows is the model-fit step of the quantizer
    * (analogous to a trained k-means codebook), not a data path.
    * Reduce-before-multiply: `((id mod p)·(m mod p)) mod p ≡ (id·m) mod p`
    * with every intermediate < p² ≈ 1.1e10, so neither Spark (ANSI) nor the
    * overflow-checked DuckDB oracle can wrap even for 2⁶³-scale ids.
    * Returns (cid, cv double-cast, cn) sorted by cid ascending. */
  private[graft] def ivfCentroids(v: DataFrame, numCentroids: Int): Array[(Long, Array[Double], Double)] =
    v.orderBy(pmod(pmod(col("id"), lit(104729L)) * lit(2654435761L % 104729L), lit(104729L)),
        col("id"))
      .limit(numCentroids)
      .select(col("id"), col("v").cast("array<double>"), col("vn"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)

  /** Map-side argmax over a fixed centroid set: `cid` of the nearest
    * centroid appended to the prepared (id, v, vn) frame with NO shuffle —
    * the centroids ride inside a native
    * [[graft.functions.HashExpressions.NearestCentroid]] expression (one
    * tight loop per row), so the inverted lists materialize inside the scan
    * stage. At scale `cid` becomes the partitioning / bucketing key of the
    * stored index. PlanShapeSpec pins the no-Exchange property. */
  private[graft] def assignToCentroids(v: DataFrame,
                                cents: Array[(Long, Array[Double], Double)]): DataFrame =
    v.withColumn("cid", graft.functions.HashExpressions.nearestCentroid(
      col("v"), cents.map(_._1), cents.map(_._2), cents.map(_._3)))

  /** One Lloyd iteration over the fixed-K codebook: assign every vector
    * (map-side argmax, no shuffle), then replace each centroid by its
    * member mean — per-dimension hash-aggregate, K·dim result rows to the
    * driver (the codebook is a driver-side constant by design). Means are
    * ROUNDED to 6 decimals so an overflow-checked SQL replay of the same
    * averages reproduces the codebook — and therefore the assignment —
    * bit-for-bit; a centroid with no members keeps its seed vector. */
  private[graft] def refineCentroids(v: DataFrame,
      cents: Array[(Long, Array[Double], Double)]): Array[(Long, Array[Double], Double)] = {
    val means = assignToCentroids(v, cents)
      .select(col("cid"), posexplode(col("v").cast("array<double>")).as(Seq("i", "x")))
      .groupBy("cid", "i").agg(round(avg(col("x")), 6).as("m"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
    cents.map { case (cid, cv, cn) =>
      means.get(cid) match {
        case Some(m) => (cid, m, math.sqrt(m.map(x => x * x).sum))
        case None => (cid, cv, cn)
      }
    }
  }

  /** [[assignToCentroids]] from a raw corpus — the IVF index-build step. */
  private[graft] def ivfAssignments(df: DataFrame, idCol: String, vecCol: String,
                                    numCentroids: Int): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"), normD(col(vecCol)).as("vn"))
    assignToCentroids(v, ivfCentroids(v, numCentroids))
  }

  /** IVF (inverted-file) ANN — the other classic scale path next to LSH:
    *   1. coarse quantizer: a fixed-K deterministic hash-sample of the
    *      corpus serves as centroids ([[ivfCentroids]]);
    *   2. one map pass assigns each vector to its nearest centroid
    *      (cos desc, centroid-id tiebreak) → the inverted lists
    *      ([[ivfAssignments]] — argmax inside the scan stage, no shuffle);
    *   3. a query probes its `nProbe` nearest centroids and brute-forces
    *      only those lists — candidate volume ~ nProbe/K of the corpus.
    * Deterministic end to end (no trained k-means), so the DuckDB oracle
    * replays it exactly. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int,
              numCentroids: Int = 32, nProbe: Int = 2,
              refineIters: Int = 0): DataFrame = {
    // per-vector norms precomputed below every join (bit-identical to
    // cosine(): dot/(an*bn) is the same expression tree, evaluated once)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"), normD(col(vecCol)).as("vn"))
    var cents = ivfCentroids(v, numCentroids)
    for (_ <- 1 to refineIters) cents = refineCentroids(v, cents)
    val assigned = assignToCentroids(v, cents)

    // nProbe nearest centroids per query vector (queries × K rows — tiny)
    val spark = df.sparkSession
    import spark.implicits._
    val centDf = cents.toSeq.map { case (cid, cv, cn) => (cid, cv.toSeq, cn) }
      .toDF("cid", "cv", "cn")
    val qv = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"), col("vn").as("qn"))
    val pw = Window.partitionBy(col("query_id")).orderBy(col("csc").desc, col("cid"))
    val probes = qv.crossJoin(broadcast(centDf))
      .select(col("query_id"), col("qv"), col("qn"), col("cid"),
        (dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("csc"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))

    // brute-force inside the probed lists only
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), "cid")
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (dotD(col("qv"), col("v")) / (col("qn") * col("vn"))).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("cos"), col("rank"))
  }

  /** IVF×PQ composed ANN (FAISS IVFPQ; Jégou et al. 2011 §IV): the coarse
    * quantizer prunes — a query touches only its `nProbe` inverted lists —
    * and the lists themselves hold PQ codes, not raw vectors, so the ADC
    * stage scores `~nProbe/K` of the corpus against an index `m`
    * bytes/vector wide. This closes the round-11 gap where [[pqTopK]] ADC'd
    * the WHOLE compressed corpus per query and [[ivfTopK]] pruned but
    * scored raw floats: the composed shape is what a 100 TB vector corpus
    * actually deploys (lists = bucketing key of the stored index, codes =
    * the only scanned payload, raw vectors touched just for the
    * shortlist·|queries| refine lookups).
    *
    * Codebooks encode RAW subvectors shared across lists (not per-list
    * residuals): the encoding stays a scan-stage map against one
    * driver-constant codebook, and the same deterministic hash-sample rule
    * as [[pqTopK]] lets the DuckDB oracle rebuild codes bit-for-bit.
    * Approximate in ranking (coarse pruning × quantization); recall vs the
    * exact top-k is pinned in SimilaritySpec. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                queryIds: Seq[Long], k: Int,
                numCentroids: Int = 32, nProbe: Int = 2,
                m: Int = 8, codebookSize: Int = 64, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    val e = col(vecCol).cast("array<double>")
    val v = df.select(col(idCol).as("id"), e.as("v"), normD(e).as("vn"))
    // coarse quantizer + inverted lists: map-side argmax, no shuffle
    val cents = ivfCentroids(v, numCentroids)
    val assigned = assignToCentroids(v, cents)
    // shared PQ codebooks, fit on the hash-sampled rows (model step)
    val sample = v
      .orderBy(pmod(pmod(col("id"), lit(104729L)) * lit(2654435761L % 104729L),
        lit(104729L)), col("id"))
      .limit(codebookSize)
      .select(col("v")).collect().map(_.getSeq[Double](0).toIndexedSeq)
    val cbArr: Array[Array[Array[Double]]] =
      (0 until m).map(j => sample.map(row =>
        row.slice(j * sub, (j + 1) * sub).toArray).toArray).toArray
    // the compressed inverted index: (cid, id, codes) — raw vectors dropped
    val indexed = assigned.select(col("id"), col("cid"),
      graft.functions.HashExpressions.pqEncode(col("v"), cbArr).as("codes"))
    val reconD = indexed
      .withColumn("r", graft.functions.HashExpressions.pqReconstruct(col("codes"), cbArr))
      .withColumn("rn2", normD(col("r")))
    // nProbe nearest centroids per query (queries × K rows — tiny)
    val spark = df.sparkSession
    import spark.implicits._
    val centDf = cents.toSeq.map { case (cid, cv, cn) => (cid, cv.toSeq, cn) }
      .toDF("cid", "cv", "cn")
    val qv = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"), col("vn").as("qn"))
    val pw = Window.partitionBy(col("query_id")).orderBy(col("csc").desc, col("cid"))
    val probes = qv.crossJoin(broadcast(centDf))
      .select(col("query_id"), col("qv"), col("qn"), col("cid"),
        (dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("csc"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    // ADC only within the probed lists; shortlist per query
    val shortlist = 5 * k
    val aw = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val cands = reconD.join(broadcast(probes), "cid")
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("qn"), col("id").as("neighbor_id"),
        (dotD(col("qv"), col("r")) / (col("qn") * col("rn2"))).as("adc"))
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") <= shortlist)
      .select(col("query_id"), col("qv"), col("qn"), col("neighbor_id"))
    // exact refine: true cosine over the shortlist's raw vectors
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sco").desc, col("neighbor_id"))
    cands.join(v.select(col("id").as("neighbor_id"), col("v").as("ne"),
        col("vn").as("nn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("qv"), col("ne")) / (col("qn") * col("nn"))).as("sco"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sco"), 6).as("score"), col("rank"))
  }

  /** Sign-LSH bucketed ANN:
    *   1. each vector gets an `nPlanes`-bit signature (sign of projection on
    *      seeded random hyperplanes) — map-only;
    *   2. candidates = corpus rows whose signature is within `maxHamming`
    *      bits of the query signature (join on broadcast query signatures);
    *   3. exact cosine + top-k on the candidate set.
    * Approximate: recall depends on nPlanes/maxHamming; the exact variant
    * above is the oracle. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int,
              nPlanes: Int = 16, dim: Int = 64, maxHamming: Int = 5,
              seed: Long = 7L): DataFrame = {
    val signed = signature(df, idCol, vecCol, nPlanes, dim, seed)
    val q = signed.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"), col("sig").as("qsig"))

    val cands = signed.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id") &&
        bit_count(col("sig").bitwiseXOR(col("qsig"))) <= maxHamming)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    cands
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("cos"), col("rank"))
  }
}
