package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines.
  *
  * Scale design: `exact` and `minhashLshPairs` are the 100 TB paths — both
  * are shuffle-on-key algorithms (fingerprint / LSH bucket) whose cost is
  * O(n) + O(candidate pairs), never O(n²). `jaccardPairsExact` /
  * `embeddingDupPairs` are O(n²) reference implementations used as the
  * correctness oracle and for small inputs.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per canonical content fingerprint.
    * Single hash-shuffle on the fingerprint; at scale this is the cheapest
    * possible dedup (map-side partial agg collapses duplicates early). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  private def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol), shingles(col(textCol), n).as("sh"))

  /** Jaccard similarity of two pre-deduplicated string arrays, computed with
    * integer set sizes (|∩| / |∪|) — bit-identical across engines. */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** All-pairs n-gram-shingle Jaccard ≥ tau. O(n²) — oracle/reference path;
    * use `minhashLshPairs` beyond ~10⁴ docs. */
  def jaccardPairsExact(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, tau: Double = 0.8): DataFrame = {
    val a = shingleSets(df, idCol, textCol, n).toDF("id_a", "sh_a")
    val b = shingleSets(df, idCol, textCol, n).toDF("id_b", "sh_b")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= tau)
      .select(col("id_a"), col("id_b"), round(col("j"), 4).as("jaccard"))
  }

  /** MinHash + banded LSH near-dup pairs, then EXACT Jaccard verification of
    * candidates. The scale path:
    *   1. one pass computes k-perm MinHash signatures (no shuffle);
    *   2. signatures split into `bands` bands, hashed → explode to
    *      (band, bucket) keys — shuffle is on bucket keys only;
    *   3. self-join within buckets yields candidate pairs (collision prob
    *      1-(1-j^r)^b: for j≥0.8, r=8, b=16 → recall ≈ 1-6e-9);
    *   4. exact Jaccard on candidates kills false positives.
    * Output therefore equals the exact all-pairs result with overwhelming
    * probability, at O(n + candidates) cost. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, tau: Double = 0.8,
                      k: Int = 128, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sets = shingleSets(df, idCol, textCol, n)

    // (id, band, bucket-hash) only — the shingle arrays must NOT ride
    // through the self-join shuffle (at 100 TB they dominate the shuffle
    // volume; candidate verification re-joins them by id instead). Persist:
    // both sides of the self-join read this, and signatures are the
    // expensive stage. MinHashBands computes the k-perm signature ONCE per
    // row and folds each band internally (a transform-over-slices spelling
    // re-evaluated the signature per band — 16x the dominant cost).
    val banded = sets.select(
      col(idCol).as("id"),
      posexplode(graft.functions.HashExpressions.minhashBands(col("sh"), k, bands, 42L))
        .as(Seq("band", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val cands = banded.select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(banded.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val a = sets.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sets.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    val pairs = cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= tau)
      .select(col("id_a"), col("id_b"), round(col("j"), 4).as("jaccard"))
    // materialize the (small) pairs, then release the cached bands — a
    // shared long-lived session must not accumulate storage memory
    // (ContextCleaner reclaims the checkpointed blocks once unreferenced)
    val out = pairs.localCheckpoint(true)
    banded.unpersist()
    out
  }

  /** Pigeonhole blocking shared by every SimHash variant: the signature
    * splits into `chunks` chunks of `bitsPer` bits; any pair within a
    * Hamming budget of `chunks - 1` must agree on ≥1 chunk, so the join key
    * is (chunk-index, chunk-value) — O(n + candidates), never all-pairs.
    * `sig` is persisted by the caller contract here: the self-join would
    * otherwise recompute the signature (bit-votes per token) on both
    * sides. */
  private def simhashBlocked(sig: DataFrame, chunks: Int, bitsPer: Int,
                             maxHamming: Int): DataFrame = {
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("sig"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1))
      }: _*)).as(Seq("chunk", "v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val l = chunked.select(col("id").as("id_a"), col("sig").as("sig_a"), col("chunk"), col("v"))
    val rgt = chunked.select(col("id").as("id_b"), col("sig").as("sig_b"), col("chunk"), col("v"))
    val pairs = l.join(rgt, Seq("chunk", "v"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val out = pairs.localCheckpoint(true)
    chunked.unpersist()
    out
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming. The default
    * signature is 56 bits built from TWO independent 28-bit mod-prime
    * SimHashes concatenated (token hash `(h·m + byte) mod 1073741789`,
    * multipliers 65537 / 65539 — large enough that even 2-character tokens
    * fill ~24 bits before the first wrap, which a ·31 fold never does, and
    * small enough that every fold step stays under 2⁴⁷). Every stage —
    * both token folds, the bit votes, the 4×14-bit pigeonhole chunks, the
    * Hamming filter — replays in overflow-checked SQL, which is what lets
    * the driver hash-verify this query end-to-end instead of rows-only.
    * [[simhashPairsXx]] is the xxhash64-mixed 64-bit twin (same blocking
    * algebra, stronger mixing, not oracle-expressible); DedupSpec pins the
    * pigeonhole exactness of both and their agreement on hamming-0 pairs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    require(56 % chunks == 0, "chunks must divide 56")
    // fused dual fold: one byte scan per token computes both halves
    val sig = df.select(col(idCol).as("id"),
      graft.functions.HashExpressions
        .simhashMod2(tokens(col(textCol)), 28, 65537L, 65539L, 1073741789L).as("sig"))
    simhashBlocked(sig, chunks, 56 / chunks, maxHamming)
  }

  /** [[simhashPairs]] with xxhash64 token mixing and the full 64-bit
    * signature — the spelling for engines where oracle expressibility is
    * irrelevant. Wraparound arithmetic cannot replay in overflow-checked
    * SQL, so this variant is pinned by ScalaTest (brute-force Hamming and
    * agreement with the mod-prime default), not the driver oracle. */
  def simhashPairsXx(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val sig = df.select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("sig"))
    simhashBlocked(sig, chunks, 64 / chunks, maxHamming)
  }

  /** Single-fold 28-bit mod-prime SimHash (multiplier 31) — the original
    * oracle-expressible variant, kept as an independently-parameterized
    * twin of [[simhashPairs]]'s two-fold default. */
  def simhashModPairs(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, bits: Int = 28): DataFrame = {
    val chunks = maxHamming + 1
    require(bits % chunks == 0, "chunks must divide bits")
    val sig = df.select(col(idCol).as("id"),
      graft.functions.HashExpressions.simhashMod(tokens(col(textCol)), bits).as("sig"))
    simhashBlocked(sig, chunks, bits / chunks, maxHamming)
  }

  /** Duplicate-cluster formation: connected components over a near-dup
    * pair graph by iterative min-label propagation — the step that turns
    * pairwise matches into dedup groups (keep `min(cluster)` per group).
    * Each round is one shuffle (join + min-aggregate) and the loop runs
    * O(component diameter) rounds — near-dup components are shallow (a
    * handful of rounds even at 100 TB), and every round's frontier is
    * checkpointed so lineage stays flat. Output: (id, cluster_id) where
    * cluster_id = min id reachable through the pair graph. */
  def duplicateClusters(pairs: DataFrame,
                        aCol: String = "id_a", bCol: String = "id_b",
                        maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("label").as("nl"))
        .select(col("src").as("nid"), col("nl"))
      val next = labels.join(neighborMin, labels("id") === col("nid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = next.alias("n")
        .join(labels.alias("p"), col("n.id") === col("p.id"))
        .filter(col("n.label") =!= col("p.label"))
        .isEmpty
      labels = next
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Embedding near-dup pairs: cosine ≥ tau. O(n²) exact form (oracle path);
    * [[embeddingDupPairsLsh]] is the scale path. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        tau: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("c"))
      .filter(col("c") >= tau)
      .select(col("id_a"), col("id_b"), round(col("c"), 6).as("cos"))
  }

  /** Sign-LSH bucketed embedding near-dup (the 100 TB path): candidates =
    * pairs whose random-hyperplane signatures agree on ≥1 of the band
    * chunks (pigeonhole over the signature, like SimHash blocking), then
    * exact cosine ≥ tau on candidates only. Approximate in recall; the
    * exact form above is the oracle. */
  def embeddingDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                           tau: Double, nPlanes: Int = 16, bandBits: Int = 4,
                           dim: Int = 64, seed: Long = 7L): DataFrame = {
    val sig = graft.operators.Similarity.signature(df, idCol, vecCol, nPlanes, dim, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = embeddingLshCandidates(sig, nPlanes / bandBits, bandBits)
    val va = sig.select(col("id").as("id_a"), col("v").as("v_a"))
    val vb = sig.select(col("id").as("id_b"), col("v").as("v_b"))
    val pairs = cands.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("c"))
      .filter(col("c") >= tau)
      .select(col("id_a"), col("id_b"), round(col("c"), 6).as("cos"))
    val out = pairs.localCheckpoint(true)
    sig.unpersist()
    out
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the corpus embeddings with the deterministic IVF coarse
    * quantizer ([[Similarity.ivfCentroids]] — fixed K hash-sampled
    * codebook, map-side argmax assignment, no shuffle), then compare
    * pairs WITHIN each cluster only and drop every row that has a
    * lower-id cluster-mate with cosine ≥ tau (deterministic min-id
    * survivor — the one-pass analogue of the paper's keep-one-per-
    * duplicate-set rule).
    *
    * Returns every row as (id, cid, kept) — survivors and casualties both
    * visible, so the decision itself is the verified artifact.
    *
    * 100 TB shape: the only shuffle is the per-cluster self-join keyed on
    * `cid` (assignment happens in the scan stage); candidate volume is
    * Σ|cluster|²/2, controlled by K — the exact knob SemDeDup runs at
    * web scale (K grows with the corpus so cluster sizes stay bounded).
    * The threshold compares the 6-decimal-rounded cosine, making the
    * keep/drop boundary replayable bit-for-bit in the DuckDB oracle. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    tau: Double, numCentroids: Int = 32): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      normD(col(vecCol)).as("vn"))
    val cents = Similarity.ivfCentroids(v, numCentroids)
    val assigned = Similarity.assignToCentroids(v, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lo = assigned.select(col("cid"), col("id").as("lo_id"),
      col("v").as("lv"), col("vn").as("ln"))
    val hi = assigned.select(col("cid"), col("id").as("hi_id"),
      col("v").as("hv"), col("vn").as("hn"))
    val dropped = hi.join(lo, Seq("cid"))
      .filter(col("lo_id") < col("hi_id"))
      .filter(round(dotD(col("hv"), col("lv")) / (col("hn") * col("ln")), 6) >= tau)
      .select(col("hi_id").as("id")).distinct()
      .withColumn("__dup", lit(true))
    val out = assigned.select(col("id"), col("cid"))
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cid"), col("__dup").isNull.as("kept"))
    val materialized = out.localCheckpoint(true)
    assigned.unpersist()
    materialized
  }

  /** Candidate stage of [[embeddingDupPairsLsh]]: pairs whose signatures
    * collide on ≥1 band. Projects (id, chunk, band-value) ONLY — the
    * embedding vectors must NOT ride the bucket self-join shuffle (at
    * 100 TB the vectors dominate shuffle volume); the caller re-joins
    * payloads by id afterwards, the same shape as [[minhashLshPairs]]'
    * shingle re-join. PlanShapeSpec pins the vector-free property. */
  private[graft] def embeddingLshCandidates(sig: DataFrame, nBands: Int,
                                            bandBits: Int): DataFrame = {
    val chunked = sig.select(col("id"),
      posexplode(array((0 until nBands).map { c =>
        shiftright(col("sig"), c * bandBits).bitwiseAND(lit((1L << bandBits) - 1))
      }: _*)).as(Seq("chunk", "cv")))
    val l = chunked.select(col("id").as("id_a"), col("chunk"), col("cv"))
    val r = chunked.select(col("id").as("id_b"), col("chunk"), col("cv"))
    l.join(r, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }
}
