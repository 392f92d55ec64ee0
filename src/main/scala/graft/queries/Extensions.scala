package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{q, rowsOnly}
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline extension operators (SURVEY §7 extension phase):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  * similarity search (exact + LSH ANN), text analysis, multimodal plumbing.
  *
  * Oracle notes: Jaccard uses integer set sizes (bit-exact across engines);
  * cosine oracles are written in DuckDB as the same sequential double fold
  * Spark computes, then rounded to 6 decimals.
  */
object Extensions {

  /** DuckDB manual double-precision cosine between list columns a.e/b.e
    * (mirrors VectorFunctions.cosine's fold shape). */
  private def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> $a[i]*$b[i])) /
       | (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i]*$a[i]))) *
       |  sqrt(list_sum(list_transform(range(1, 65), i -> $b[i]*$b[i]))))""".stripMargin

  private val duckShingles =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct([t[i]||' '||t[i+1]||' '||t[i+2] for i in range(1, len(t)-1)]) s
      |  FROM toks)""".stripMargin

  private val jaccardOracle =
    s"""$duckShingles
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)), 4) AS jaccard
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8""".stripMargin

  /** Sign-LSH signatures replicated in DuckDB: the seeded hyperplanes are
    * embedded as literals (Scala `Double.toString` round-trips), the dot
    * product uses the same sequential fold as [[graft.functions
    * .VectorFunctions.dotD]], so signatures — and therefore candidate sets —
    * are identical across engines. */
  private def duckSigCtes(nPlanes: Int, dim: Int, seed: Long): String = {
    val planes = Similarity.hyperplanes(nPlanes, dim, seed).zipWithIndex
      .map { case (p, i) => s"($i, [${p.mkString(",")}])" }
      .mkString(",\n|  ")
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
       |           FROM embeddings),
       |planes(pid, p) AS (VALUES $planes),
       |s AS (SELECT v.vec_id,
       |  CAST(sum(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), i -> v.e[i] * pl.p[i])) > 0
       |    THEN (1::BIGINT << pl.pid) ELSE 0 END) AS BIGINT) AS sig
       |  FROM v CROSS JOIN planes pl GROUP BY v.vec_id),
       |sv AS (SELECT s.vec_id, s.sig, v.e FROM s JOIN v USING (vec_id))""".stripMargin
  }

  /** Near-dup cluster CTEs shared by the clusters and survivors oracles:
    * Jaccard pairs → undirected edges → recursive reachability → min
    * reachable id per doc (requires WITH RECURSIVE at the statement head). */
  private val duckClusterCtes =
    s"""${duckShingles.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8),
       |e AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
       |reach AS (
       |  SELECT s AS id, s AS r FROM e
       |  UNION
       |  SELECT e.s, reach.r FROM e JOIN reach ON e.d = reach.id),
       |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- deduplication ----------------------------------------------------

    q("x_dedup_exact",
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS group_size
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // Exact all-pairs 3-gram shingle Jaccard (oracle path).
    q("x_dedup_jaccard_pairs", jaccardOracle) { (s, dir) =>
      Dedup.jaccardPairsExact(Tables(s, dir, "documents"), "doc_id", "text", n = 3, tau = 0.8)
    },

    // MinHash-LSH with exact candidate verification — same oracle: at the
    // fixture's similarity gap (planted pairs ≥0.96, noise <0.3) LSH recall
    // is 1 - ~1e-8, so the output equals the exact pairs.
    q("x_dedup_minhash_lsh", jaccardOracle) { (s, dir) =>
      Dedup.minhashLshPairs(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, tau = 0.8, k = 128, bands = 16)
    },

    // SimHash near-dup pairs, 56-bit signature (default): two independent
    // 28-bit mod-prime SimHashes concatenated (multipliers 65537/65539 mod
    // 1073741789 — every fold step < 2⁴⁷), so both token folds, the bit
    // votes, the 4×14-bit pigeonhole blocking, and the Hamming filter all
    // replay in DuckDB — hash-verified end-to-end (round-2..4's one
    // rows-only query, closed). The xxhash64-mixed 64-bit twin
    // (simhashPairsXx) stays spec-pinned in DedupSpec.
    q("x_dedup_simhash",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
        |h AS (SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(w) + 1),
        |      i -> CAST(ascii(substr(w, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, b) -> (a * 65537 + b) % 1073741789) AS h1,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(w) + 1),
        |      i -> CAST(ascii(substr(w, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, b) -> (a * 65539 + b) % 1073741789) AS h2
        |  FROM tok),
        |bv AS (SELECT doc_id, j,
        |    sum(CASE WHEN ((h1 >> CAST(j AS INT)) & 1) = 1 THEN 1 ELSE -1 END) AS v1,
        |    sum(CASE WHEN ((h2 >> CAST(j AS INT)) & 1) = 1 THEN 1 ELSE -1 END) AS v2
        |  FROM h, (SELECT unnest(range(28)) AS j) GROUP BY doc_id, j),
        |sig AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN v1 > 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) +
        |         (sum(CASE WHEN v2 > 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) << 28)
        |      AS BIGINT) AS sig
        |  FROM bv GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |  WHERE ((a.sig >> 0) & 16383) = ((b.sig >> 0) & 16383)
        |     OR ((a.sig >> 14) & 16383) = ((b.sig >> 14) & 16383)
        |     OR ((a.sig >> 28) & 16383) = ((b.sig >> 28) & 16383)
        |     OR ((a.sig >> 42) & 16383) = ((b.sig >> 42) & 16383))
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin) { (s, dir) =>
      Dedup.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
    },

    // SimHash with the mod-prime token hash: signature bits, pigeonhole
    // blocking, and the Hamming filter all replayed in DuckDB.
    q("x_dedup_simhash_mod",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
        |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(w) + 1),
        |      i -> CAST(ascii(substr(w, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1073741789) AS h
        |  FROM tok),
        |bv AS (SELECT doc_id, j,
        |    sum(CASE WHEN ((h >> CAST(j AS INT)) & 1) = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h, (SELECT unnest(range(28)) AS j) GROUP BY doc_id, j),
        |sig AS (SELECT doc_id, CAST(sum(CASE WHEN vote > 0
        |    THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS sig
        |  FROM bv GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |  WHERE ((a.sig >> 0) & 127) = ((b.sig >> 0) & 127)
        |     OR ((a.sig >> 7) & 127) = ((b.sig >> 7) & 127)
        |     OR ((a.sig >> 14) & 127) = ((b.sig >> 14) & 127)
        |     OR ((a.sig >> 21) & 127) = ((b.sig >> 21) & 127))
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin) { (s, dir) =>
      Dedup.simhashModPairs(Tables(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, bits = 28)
    },

    // Duplicate clusters: connected components over the exact-Jaccard pair
    // graph (min reachable id per doc). The oracle walks the same graph
    // with a recursive CTE.
    q("x_dedup_clusters",
      s"""$duckClusterCtes
         |SELECT id, cluster_id FROM cl""".stripMargin) { (s, dir) =>
      val pairs = Dedup.jaccardPairsExact(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, tau = 0.8)
      Dedup.duplicateClusters(pairs)
    },

    // Near-dup survivor selection: the full dedup pipeline — pairs →
    // clusters → keep the min-id representative per cluster, plus all
    // singletons — producing the deduplicated corpus size per cluster kind.
    q("x_dedup_survivors",
      s"""$duckClusterCtes,
         |surv AS (
         |  SELECT cluster_id AS keep_id, count(*) AS members FROM cl
         |  GROUP BY cluster_id
         |  UNION ALL
         |  SELECT doc_id, 1 FROM documents WHERE doc_id NOT IN (SELECT id FROM cl))
         |SELECT count(*) AS n_survivors,
         |  CAST(SUM(members) AS BIGINT) AS n_docs,
         |  count(*) FILTER (WHERE members > 1) AS n_dup_clusters
         |FROM surv""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.jaccardPairsExact(docs, "doc_id", "text", n = 3, tau = 0.8)
      val clusters = Dedup.duplicateClusters(pairs)
      val clustered = clusters.groupBy(col("cluster_id").as("keep_id"))
        .agg(count(lit(1)).as("members"))
      val singletons = docs.join(clusters, docs("doc_id") === clusters("id"), "left_anti")
        .select(col("doc_id").as("keep_id"), lit(1L).as("members"))
      clustered.union(singletons).agg(
        count(lit(1)).as("n_survivors"),
        sum("members").as("n_docs"),
        count(when(col("members") > 1, 1)).as("n_dup_clusters"))
    },

    // Embedding near-dup pairs, exact cosine ≥ 0.45.
    q("x_dedup_embedding",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${duckCos("a.e", "b.e")} AS c
         |      FROM v a JOIN v b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, round(c, 6) AS cos FROM p WHERE c >= 0.45""".stripMargin) {
      (s, dir) =>
        Dedup.embeddingDupPairs(Tables(s, dir, "embeddings"), "vec_id", "embedding", tau = 0.45)
    },

    // Sign-LSH bucketed embedding dedup (the scale path). The oracle
    // replicates the seeded signatures in DuckDB, so the exact candidate
    // set — pairs colliding on ≥1 of the 4×4-bit bands — and the cosine
    // verification are both hash-checked.
    q("x_dedup_embedding_lsh",
      s"""${duckSigCtes(16, 64, 7L)},
         |c AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${duckCos("a.e", "b.e")} AS cc
         |  FROM sv a JOIN sv b ON a.vec_id < b.vec_id
         |  WHERE ((a.sig >> 0) & 15) = ((b.sig >> 0) & 15)
         |     OR ((a.sig >> 4) & 15) = ((b.sig >> 4) & 15)
         |     OR ((a.sig >> 8) & 15) = ((b.sig >> 8) & 15)
         |     OR ((a.sig >> 12) & 15) = ((b.sig >> 12) & 15))
         |SELECT id_a, id_b, round(cc, 6) AS cos FROM c WHERE cc >= 0.45""".stripMargin) {
      (s, dir) =>
        Dedup.embeddingDupPairsLsh(Tables(s, dir, "embeddings"), "vec_id", "embedding", tau = 0.45)
    },

    // SemDeDup-style semantic dedup: IVF-cluster the embeddings
    // (deterministic hash-sampled codebook, same assignment CTEs as the
    // IVF ANN oracle), then within each cluster drop every row with a
    // lower-id mate at cosine ≥ τ. The oracle replays clustering, the
    // within-cluster pair scan, and the min-id survivor rule end-to-end —
    // every keep/drop decision is hash-checked. (τ = 0.35 exercises the
    // rule on the synthetic fixture; production corpora run ~0.95+.)
    q("x_dedup_semantic",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cid, e AS cv FROM v
         |      ORDER BY ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id
         |      LIMIT 32),
         |sc AS (SELECT v.vec_id, c.cid, ${duckCos("v.e", "c.cv")} AS csc
         |       FROM v CROSS JOIN c),
         |asg AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc) t
         |  WHERE rn = 1),
         |d AS (SELECT hi.vec_id AS id
         |  FROM asg hi JOIN asg lo ON hi.cid = lo.cid AND lo.vec_id < hi.vec_id
         |  JOIN v hv ON hv.vec_id = hi.vec_id
         |  JOIN v lv ON lv.vec_id = lo.vec_id
         |  WHERE round(${duckCos("hv.e", "lv.e")}, 6) >= 0.35
         |  GROUP BY hi.vec_id)
         |SELECT a.vec_id AS id, a.cid, (d.id IS NULL) AS kept
         |FROM asg a LEFT JOIN d ON d.id = a.vec_id""".stripMargin) { (s, dir) =>
      Dedup.semanticDedup(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        tau = 0.35, numCentroids = 32)
    },

    // ---- similarity search ------------------------------------------------

    q("x_sim_topk_exact",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id IN (0,1,2,3,4)),
         |sc AS (SELECT query_id, a.vec_id AS neighbor_id, ${duckCos("qe", "a.e")} AS c
         |       FROM v a CROSS JOIN q WHERE a.vec_id <> query_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
         |      FROM sc)
         |SELECT query_id, neighbor_id, round(c, 6) AS cos, rn AS rnk
         |FROM r WHERE rn <= 10""".stripMargin) { (s, dir) =>
      Similarity.bruteForceTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
        .withColumnRenamed("rank", "rnk")
    },

    // Int8 scalar-quantized ANN (the memory-bandwidth scale path: 4×
    // smaller vectors, integer dot products). Quantization = floor(x/s+0.5)
    // over the L2-normalized vector with per-vector scale max|x|/127 —
    // floor and IEEE division replay exactly, so the approximate result is
    // still hash-verified end-to-end; recall vs exact is SimilaritySpec's.
    q("x_sim_topk_int8",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |nv AS (SELECT vec_id, e,
         |  sqrt(list_sum(list_transform(range(1, 65), i -> e[i]*e[i]))) AS vn FROM v),
         |nrm AS (SELECT vec_id,
         |  list_transform(e, x -> CASE WHEN vn = 0 THEN 0 ELSE x / vn END) AS en FROM nv),
         |scl AS (SELECT vec_id, en,
         |  list_max(list_transform(en, x -> abs(x))) / 127.0 AS s FROM nrm),
         |qz AS (SELECT vec_id, s,
         |  list_transform(en, x -> CASE WHEN s = 0 THEN 0
         |    ELSE CAST(floor(x / s + 0.5) AS BIGINT) END) AS q FROM scl),
         |qq AS (SELECT vec_id AS query_id, q AS quq, s AS qs FROM qz
         |       WHERE vec_id IN (0,1,2,3,4)),
         |sc AS (SELECT query_id, a.vec_id AS neighbor_id,
         |    CAST(list_sum([a.q[i] * qq.quq[i] for i in range(1, 65)]) AS DOUBLE)
         |      * a.s * qq.qs AS sco
         |  FROM qz a CROSS JOIN qq WHERE a.vec_id <> query_id),
         |r AS (SELECT query_id, neighbor_id, sco,
         |    row_number() OVER (PARTITION BY query_id ORDER BY sco DESC, neighbor_id) AS rn
         |  FROM sc)
         |SELECT query_id, neighbor_id, round(sco, 6) AS score, rn AS rnk
         |FROM r WHERE rn <= 10""".stripMargin) { (s, dir) =>
      Similarity.int8TopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
    },

    // Product-quantization ANN (m=8 subspaces × 64 codewords — the stored
    // index is 8 small ints per vector) with the classic exact-refine tail:
    // ADC shortlist of 5k candidates against the reconstructions, then true
    // cosine re-rank. The oracle replays codebook fit (hash-sampled rows),
    // per-subspace argmin encoding, reconstruction, ADC shortlist, and the
    // refine — every stage hash-checked; recall vs exact pinned in
    // SimilaritySpec.
    q("x_sim_topk_pq",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |cb AS (SELECT row_number() OVER (ORDER BY
         |      ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id) AS cidx, e
         |    FROM v
         |    ORDER BY ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id
         |    LIMIT 64),
         |d AS (SELECT v.vec_id, j.j AS j, cb.cidx,
         |    list_sum(list_transform(range(1, 9), i ->
         |      (v.e[j.j*8+i] - cb.e[j.j*8+i]) * (v.e[j.j*8+i] - cb.e[j.j*8+i]))) AS dist
         |  FROM v CROSS JOIN (SELECT CAST(unnest(range(8)) AS INT) AS j) j CROSS JOIN cb),
         |code AS (SELECT vec_id, j, cidx FROM (
         |    SELECT vec_id, j, cidx, row_number() OVER (
         |      PARTITION BY vec_id, j ORDER BY dist, cidx) AS rn FROM d) t
         |  WHERE rn = 1),
         |recon AS (SELECT code.vec_id,
         |    flatten(list(list_slice(cb.e, j*8+1, j*8+8) ORDER BY j)) AS r
         |  FROM code JOIN cb USING (cidx) GROUP BY code.vec_id),
         |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id IN (0,1,2,3,4)),
         |adc AS (SELECT query_id, recon.vec_id AS neighbor_id, qe,
         |    ${duckCos("qe", "recon.r")} AS a
         |  FROM recon CROSS JOIN q WHERE recon.vec_id <> query_id),
         |sl AS (SELECT query_id, neighbor_id, qe FROM (
         |    SELECT query_id, neighbor_id, qe, row_number() OVER (
         |      PARTITION BY query_id ORDER BY a DESC, neighbor_id) AS rn FROM adc) t
         |  WHERE rn <= 50),
         |ref AS (SELECT sl.query_id, sl.neighbor_id, ${duckCos("sl.qe", "nv.e")} AS cc
         |  FROM sl JOIN v nv ON nv.vec_id = sl.neighbor_id),
         |r2 AS (SELECT query_id, neighbor_id, cc, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cc DESC, neighbor_id) AS rn FROM ref)
         |SELECT query_id, neighbor_id, round(cc, 6) AS score, rn AS rnk
         |FROM r2 WHERE rn <= 10""".stripMargin) { (s, dir) =>
      Similarity.pqTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, m = 8, codebookSize = 64)
        .withColumnRenamed("rank", "rnk")
    },

    // Sign-LSH ANN: approximate vs the true top-k, but fully deterministic —
    // the oracle rebuilds the same signatures and Hamming-≤5 candidate set,
    // so the result is hash-checked (recall vs exact asserted in
    // SimilaritySpec).
    q("x_sim_topk_lsh",
      s"""${duckSigCtes(16, 64, 7L)},
         |qq AS (SELECT vec_id AS query_id, sig AS qsig, e AS qe FROM sv
         |       WHERE vec_id IN (0,1,2,3,4)),
         |c AS (SELECT qq.query_id, sv.vec_id AS neighbor_id,
         |    ${duckCos("qq.qe", "sv.e")} AS cc
         |  FROM sv CROSS JOIN qq
         |  WHERE sv.vec_id <> qq.query_id
         |    AND bit_count(xor(sv.sig, qq.qsig)) <= 5),
         |r AS (SELECT query_id, neighbor_id, cc,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cc DESC, neighbor_id) AS rn
         |  FROM c)
         |SELECT query_id, neighbor_id, round(cc, 6) AS cos, rn AS rnk
         |FROM r WHERE rn <= 10""".stripMargin) { (s, dir) =>
      Similarity.lshTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
        .withColumnRenamed("rank", "rnk")
    },

    // IVF ANN: deterministic coarse quantizer (fixed K=32 hash-sampled
    // vectors — K independent of corpus size), nearest-centroid inverted
    // lists built by a map-side argmax, 2-probe search. The oracle replays
    // the whole pipeline — centroid sample, assignment, probes, in-list
    // ranking — in DuckDB.
    q("x_sim_topk_ivf",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cid, e AS cv FROM v
         |      ORDER BY ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id
         |      LIMIT 32),
         |sc AS (SELECT v.vec_id, c.cid, ${duckCos("v.e", "c.cv")} AS csc
         |       FROM v CROSS JOIN c),
         |asg AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc) t
         |  WHERE rn = 1),
         |qp AS (SELECT vec_id AS query_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc
         |    WHERE vec_id IN (0,1,2,3,4)) t
         |  WHERE rn <= 2),
         |cand AS (SELECT qp.query_id, a.vec_id AS neighbor_id,
         |    ${duckCos("qv.e", "nv.e")} AS cc
         |  FROM qp JOIN asg a USING (cid)
         |  JOIN v qv ON qv.vec_id = qp.query_id
         |  JOIN v nv ON nv.vec_id = a.vec_id
         |  WHERE a.vec_id <> qp.query_id),
         |r AS (SELECT query_id, neighbor_id, cc, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cc DESC, neighbor_id) AS rn FROM cand)
         |SELECT query_id, neighbor_id, round(cc, 6) AS cos, rn AS rnk
         |FROM r WHERE rn <= 10""".stripMargin) { (s, dir) =>
      Similarity.ivfTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, numCentroids = 32, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
    },

    // IVF with one Lloyd refinement iteration: the hash-sampled codebook is
    // replaced by per-centroid member means (rounded to 6 decimals — the
    // determinism boundary that lets DuckDB rebuild the refined codebook
    // and every downstream assignment bit-for-bit), empty lists keep their
    // seed vector. The oracle replays sample → assign → means → re-assign →
    // probe → rank end-to-end.
    q("x_sim_topk_ivf_refined",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cid, e AS cv FROM v
         |      ORDER BY ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id
         |      LIMIT 32),
         |sc AS (SELECT v.vec_id, c.cid, ${duckCos("v.e", "c.cv")} AS csc
         |       FROM v CROSS JOIN c),
         |asg AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc) t
         |  WHERE rn = 1),
         |rm AS (SELECT a.cid, i.i AS i, round(avg(v.e[i.i]), 6) AS m
         |  FROM asg a JOIN v ON v.vec_id = a.vec_id
         |  CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INT) AS i) i
         |  GROUP BY a.cid, i.i),
         |rc AS (SELECT cid, list(m ORDER BY i) AS cv2 FROM rm GROUP BY cid),
         |c2 AS (SELECT c.cid, coalesce(rc.cv2, c.cv) AS cv FROM c LEFT JOIN rc USING (cid)),
         |sc2 AS (SELECT v.vec_id, c2.cid, ${duckCos("v.e", "c2.cv")} AS csc
         |        FROM v CROSS JOIN c2),
         |asg2 AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc2) t
         |  WHERE rn = 1),
         |qp AS (SELECT vec_id AS query_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc2
         |    WHERE vec_id IN (0,1,2,3,4)) t
         |  WHERE rn <= 2),
         |cand AS (SELECT qp.query_id, a.vec_id AS neighbor_id,
         |    ${duckCos("qv.e", "nv.e")} AS cc
         |  FROM qp JOIN asg2 a USING (cid)
         |  JOIN v qv ON qv.vec_id = qp.query_id
         |  JOIN v nv ON nv.vec_id = a.vec_id
         |  WHERE a.vec_id <> qp.query_id),
         |r AS (SELECT query_id, neighbor_id, cc, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cc DESC, neighbor_id) AS rn FROM cand)
         |SELECT query_id, neighbor_id, round(cc, 6) AS cos, rn AS rnk
         |FROM r WHERE rn <= 10""".stripMargin) { (s, dir) =>
      Similarity.ivfTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, numCentroids = 32, nProbe = 2,
          refineIters = 1)
        .withColumnRenamed("rank", "rnk")
    },

    // IVF×PQ composed ANN (FAISS IVFPQ, round 12): the coarse quantizer
    // prunes to nProbe inverted lists AND the lists hold PQ codes — ADC
    // scores ~nProbe/K of the corpus against the 8-int compressed index,
    // then the classic exact-refine tail re-ranks the shortlist's raw
    // vectors. The oracle replays centroid sample → assignment → shared
    // codebook fit → encoding → probes → in-list ADC → shortlist → refine
    // end-to-end; recall vs exact pinned in SimilaritySpec.
    q("x_sim_topk_ivfpq",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cid, e AS cv FROM v
         |      ORDER BY ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id
         |      LIMIT 32),
         |sc AS (SELECT v.vec_id, c.cid, ${duckCos("v.e", "c.cv")} AS csc
         |       FROM v CROSS JOIN c),
         |asg AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc) t
         |  WHERE rn = 1),
         |cb AS (SELECT row_number() OVER (ORDER BY
         |      ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id) AS cidx, e
         |    FROM v
         |    ORDER BY ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id
         |    LIMIT 64),
         |d AS (SELECT v.vec_id, j.j AS j, cb.cidx,
         |    list_sum(list_transform(range(1, 9), i ->
         |      (v.e[j.j*8+i] - cb.e[j.j*8+i]) * (v.e[j.j*8+i] - cb.e[j.j*8+i]))) AS dist
         |  FROM v CROSS JOIN (SELECT CAST(unnest(range(8)) AS INT) AS j) j CROSS JOIN cb),
         |code AS (SELECT vec_id, j, cidx FROM (
         |    SELECT vec_id, j, cidx, row_number() OVER (
         |      PARTITION BY vec_id, j ORDER BY dist, cidx) AS rn FROM d) t
         |  WHERE rn = 1),
         |recon AS (SELECT code.vec_id,
         |    flatten(list(list_slice(cb.e, j*8+1, j*8+8) ORDER BY j)) AS r
         |  FROM code JOIN cb USING (cidx) GROUP BY code.vec_id),
         |qp AS (SELECT vec_id AS query_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc
         |    WHERE vec_id IN (0,1,2,3,4)) t
         |  WHERE rn <= 2),
         |adc AS (SELECT qp.query_id, a.vec_id AS neighbor_id,
         |    ${duckCos("qv.e", "recon.r")} AS a2
         |  FROM qp JOIN asg a USING (cid)
         |  JOIN recon ON recon.vec_id = a.vec_id
         |  JOIN v qv ON qv.vec_id = qp.query_id
         |  WHERE a.vec_id <> qp.query_id),
         |sl AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY a2 DESC, neighbor_id) AS rn FROM adc) t
         |  WHERE rn <= 50),
         |ref AS (SELECT sl.query_id, sl.neighbor_id, ${duckCos("qv.e", "nv.e")} AS cc
         |  FROM sl JOIN v nv ON nv.vec_id = sl.neighbor_id
         |  JOIN v qv ON qv.vec_id = sl.query_id),
         |r2 AS (SELECT query_id, neighbor_id, cc, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cc DESC, neighbor_id) AS rn FROM ref)
         |SELECT query_id, neighbor_id, round(cc, 6) AS score, rn AS rnk
         |FROM r2 WHERE rn <= 10""".stripMargin) { (s, dir) =>
      Similarity.ivfPqTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, numCentroids = 32, nProbe = 2,
          m = 8, codebookSize = 64)
        .withColumnRenamed("rank", "rnk")
    },

    // ---- text analysis ----------------------------------------------------

    q("x_text_tokens",
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_unique
        |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.tokenStats(Tables(s, dir, "documents"), "doc_id", "text")
    },

    q("x_text_quality",
      """WITH t AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(length(text) AS DOUBLE) AS n_chars,
        |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS word_chars
        |  FROM documents)
        |SELECT doc_id,
        |  round(punct / n_chars, 6) AS punct_ratio,
        |  round(CAST(len(list_filter(toks, x -> list_contains(
        |    ['the','a','of','and','to','in','is','that','it','for'], x))) AS DOUBLE)
        |    / len(toks), 6) AS stopword_ratio,
        |  round(word_chars / len(toks), 6) AS avg_token_len,
        |  round(least(len(toks) / 50.0, 1.0) * (1.0 - punct / n_chars), 6) AS quality
        |FROM t""".stripMargin) { (s, dir) =>
      TextAnalysis.qualityScore(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // Heuristic langid: stopword-profile argmax with profile-order
    // tie-break — the whole model is 5×10 public stopword lists, so the
    // oracle replays it verbatim.
    q("x_text_langid",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) en,
        |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','von','zu'], x))) de,
        |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','des','du','pour'], x))) fr,
        |  len(list_filter(toks, x -> list_contains(['el','la','los','las','y','es','un','una','de','por'], x))) es,
        |  len(list_filter(toks, x -> list_contains(['的','是','不','了','在','人','有','我','他','这'], x))) zh
        |  FROM t)
        |SELECT doc_id, CASE
        |  WHEN greatest(en, de, fr, es, zh) = 0 THEN 'und'
        |  WHEN en = greatest(en, de, fr, es, zh) THEN 'en'
        |  WHEN de = greatest(en, de, fr, es, zh) THEN 'de'
        |  WHEN fr = greatest(en, de, fr, es, zh) THEN 'fr'
        |  WHEN es = greatest(en, de, fr, es, zh) THEN 'es'
        |  ELSE 'zh' END AS lang_pred
        |FROM s""".stripMargin) { (s, dir) =>
      TextAnalysis.languageId(Tables(s, dir, "documents"), "doc_id", "text")
    },

    q("x_text_fingerprint",
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.fingerprint(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // BPE-ish pre-tokenizer counting — same regex in both engines.
    q("x_text_tokens_bpe",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_alpha,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num
        |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.bpeTokenStats(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // Rolling-hash fingerprint: (h*31 + codePoint) mod 1e9+7 over the
    // canonical text — the modulus keeps every intermediate overflow-free,
    // and both sides fold unicode code points (length()/ascii() count and
    // read characters), so the replay is exact on any corpus, not just
    // the ASCII fixture.
    q("x_text_rolling_fp",
      """WITH c AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(t) + 1),
        |      i -> CAST(ascii(substr(t, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS rfp
        |FROM c""".stripMargin) { (s, dir) =>
      TextAnalysis.rollingFingerprint(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // Deterministic stratified sampling: per-stratum keep rates decided by
    // the mod-prime id hash — the oracle recomputes every keep/drop
    // decision, so the sampled set itself is hash-verified.
    q("x_sample_stratified",
      """WITH h AS (SELECT doc_id, CAST(doc_id % 3 AS VARCHAR) AS stratum,
        |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(doc_id::VARCHAR) + 1),
        |        i -> CAST(ascii(substr(doc_id::VARCHAR, CAST(i AS INT), 1)) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) * 2654435761) % 1000000007 AS hb
        |  FROM documents),
        |kept AS (SELECT doc_id, stratum FROM h
        |  WHERE (stratum = '0' AND hb < CAST(floor(1000000007 * 0.5) AS BIGINT))
        |     OR (stratum = '1' AND hb < CAST(floor(1000000007 * 0.2) AS BIGINT)))
        |SELECT stratum, count(*) AS n_kept, CAST(min(doc_id) AS BIGINT) AS first_id
        |FROM kept GROUP BY stratum""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .withColumn("stratum", (col("doc_id") % 3).cast("string"))
      graft.operators.Sampling
        .stratifiedSample(docs, "doc_id", "stratum", Map("0" -> 0.5, "1" -> 0.2))
        .groupBy("stratum")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_id"))
    },

    // Domain-mixing resampler: per-source acceptance rates derived from
    // the measured counts (min(1, w·N/n) — src2 target 20% of corpus is
    // UNDER-represented, so it keeps whole; the others shrink), selection
    // by the same replayable id hash as x_sample_stratified. The oracle
    // recomputes the counts, the rates, and the hash in SQL.
    q("x_mix_domains",
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
        |r AS (SELECT c.source, least(1.0, w.w * t.total / c.n) AS rate
        |  FROM c, t, (VALUES ('src2', 0.20), ('src3', 0.01),
        |              ('src5', 0.02), ('src7', 0.003)) AS w(s, w)
        |  WHERE c.source = w.s),
        |h AS (SELECT doc_id, source,
        |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(doc_id::VARCHAR) + 1),
        |        i -> CAST(ascii(substr(doc_id::VARCHAR, CAST(i AS INT), 1)) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) * 2654435761) % 1000000007 AS hb
        |  FROM documents),
        |kept AS (SELECT h.doc_id, h.source FROM h JOIN r ON h.source = r.source
        |  WHERE h.hb < CAST(floor(1000000007 * r.rate) AS BIGINT))
        |SELECT source, count(*) AS n_kept, CAST(min(doc_id) AS BIGINT) AS first_id,
        |  CAST(max(doc_id) AS BIGINT) AS last_id
        |FROM kept GROUP BY source""".stripMargin) { (s, dir) =>
      graft.operators.Sampling
        .mixDomains(Tables(s, dir, "documents"), "doc_id", "source",
          Map("src2" -> 0.20, "src3" -> 0.01, "src5" -> 0.02, "src7" -> 0.003))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_id"),
          max("doc_id").as("last_id"))
    },

    // Cluster-stratified diversity sampling (round 11; SemDeDup/D4-style
    // coverage selection): IVF-assign embeddings to the deterministic
    // codebook, keep the top-5 docs per cluster by n_chars — every
    // assignment and every survivor is replayed by the same clustering
    // CTEs as the semantic-dedup oracle, so the selected subset itself is
    // hash-verified.
    q("x_sample_diverse",
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cid, e AS cv FROM v
         |      ORDER BY ((vec_id % 104729) * (2654435761 % 104729)) % 104729, vec_id
         |      LIMIT 32),
         |sc AS (SELECT v.vec_id, c.cid, ${duckCos("v.e", "c.cv")} AS csc
         |       FROM v CROSS JOIN c),
         |asg AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csc DESC, cid) AS rn FROM sc) t
         |  WHERE rn = 1),
         |r AS (SELECT a.cid, a.vec_id AS id, CAST(d.n_chars AS BIGINT) AS q,
         |    row_number() OVER (PARTITION BY a.cid
         |      ORDER BY d.n_chars DESC, a.vec_id) AS rn
         |  FROM asg a JOIN documents d ON d.doc_id = a.vec_id)
         |SELECT cid, id, q, CAST(rn AS BIGINT) AS rnk FROM r WHERE rn <= 5""".stripMargin) {
      (s, dir) =>
        graft.operators.Sampling.diverseTopK(
          Tables(s, dir, "embeddings"), Tables(s, dir, "documents"),
          "vec_id", "embedding", "doc_id", "n_chars",
          numCentroids = 32, k = 5)
    },

    // ---- multimodal -------------------------------------------------------

    // Binary payload plumbing + stubbed decode (no codec libs in the
    // container — see Multimodal scaladoc). The stub is deterministic
    // stripe-means over the payload bytes, and the fixture text is pure
    // ASCII, so the oracle recomputes the same features from character
    // codes (byte == codepoint).
    q("x_multimodal_features",
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, text,
        |    strlen(text) AS nb, greatest(strlen(text) // 8, 1) AS st
        |  FROM documents)
        |SELECT media_id, 'image/png' AS mime, CAST(nb AS BIGINT) AS n_bytes,
        |  round(list_sum(list_transform(range(1, least(nb, st) + 1),
        |    i -> ascii(substr(text, CAST(i AS INT), 1))))::DOUBLE / least(nb, st), 4) AS f1,
        |  round(CASE WHEN 7*st >= nb THEN 0.0 ELSE
        |    list_sum(list_transform(range(7*st + 1, least(nb, 8*st) + 1),
        |      i -> ascii(substr(text, CAST(i AS INT), 1))))::DOUBLE / (least(nb, 8*st) - 7*st)
        |    END, 4) AS f8
        |FROM m""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeFeatures(s, media).toDF()
        .select(col("media_id"), col("mime"), col("n_bytes"),
          round(element_at(col("features"), 1), 4).as("f1"),
          round(element_at(col("features"), 8), 4).as("f8"))
    },

    // Aspect-preserving resize planning (metadata half of image resize).
    q("x_multimodal_resize",
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(strlen(text) % 640 + 32 AS INT) AS width, 480 AS height
        |  FROM documents),
        |s AS (SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS sc FROM m)
        |SELECT media_id, width, height, round(sc, 6) AS scale,
        |  CAST(floor(width * sc) AS INT) AS out_w,
        |  CAST(floor(height * sc) AS INT) AS out_h
        |FROM s""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.resizePlan(media, maxW = 256, maxH = 256)
    },

    // Audio-shaped windowed energy over payload bytes (ASCII fixture:
    // byte == character code, so the oracle recomputes per-window means).
    q("x_multimodal_audio",
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, text,
        |    strlen(text) AS nb FROM documents),
        |f AS (SELECT media_id, text, nb,
        |    CAST(unnest(range((nb + 255) // 256)) AS INT) AS frame_no FROM m)
        |SELECT media_id, frame_no,
        |  round(list_sum(list_transform(
        |    range(frame_no * 256 + 1, least(nb, (frame_no + 1) * 256) + 1),
        |    i -> ascii(substr(text, CAST(i AS INT), 1))))::DOUBLE
        |    / (least(nb, (frame_no + 1) * 256) - frame_no * 256), 4) AS energy
        |FROM f""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.audioFrameEnergy(s, media, frameBytes = 256).toDF()
        .select(col("media_id"), col("frame_no"), round(col("energy"), 4).as("energy"))
    },

    // Pipeline composition: quality filter -> exact-dedup survivors ->
    // per-language counts (the shape of a real corpus-cleaning job; each
    // stage is an operator verified on its own above).
    q("x_pipeline_clean_corpus",
      """WITH q AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |      / length(text) AS punct_ratio
        |  FROM documents),
        |flt AS (SELECT doc_id, text FROM q
        |  WHERE len(toks) >= 5 AND punct_ratio <= 0.2),
        |ded AS (SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text
        |  FROM (SELECT doc_id, text,
        |      md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |    FROM flt) t
        |  GROUP BY fp),
        |lng AS (SELECT d.doc_id,
        |    CASE WHEN len(list_filter(string_split_regex(trim(lower(d.text)), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) > 0
        |    THEN 'en' ELSE 'und' END AS lang
        |  FROM ded d)
        |SELECT lang, count(*) AS n_docs FROM lng GROUP BY lang""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val punct = length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") / length(col("text"))
      val filtered = docs.filter(size(toks) >= 5 && punct <= 0.2)
      val survivors = filtered
        .groupBy(graft.functions.TextFunctions.fingerprintMd5(col("text")).as("fp"))
        .agg(min("doc_id").as("doc_id"), min_by(col("text"), col("doc_id")).as("text"))
      val en = graft.functions.TextFunctions
        .langScore(graft.functions.TextFunctions.tokens(lower(col("text"))),
          graft.functions.TextFunctions.langProfiles.head._2)
      survivors
        .select(when(en > 0, "en").otherwise("und").as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    },

    q("x_multimodal_frames",
      """WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    greatest(strlen(text) // 1024, 1) AS nf
        |  FROM documents),
        |f AS (SELECT media_id, unnest(range(0, nf)) AS fx FROM m)
        |SELECT media_id, CAST(fx AS INT) AS frame_idx FROM f WHERE fx % 4 = 0""".stripMargin) {
      (s, dir) =>
        val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text")
        Multimodal.sampleFrames(media, everyK = 4)
    }
  )
}
