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

    // SimHash near-dup candidates (engine-specific signature → rows-only;
    // pinned against brute-force Hamming in DedupSpec).
    rowsOnly("x_dedup_simhash") { (s, dir) =>
      Dedup.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
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

    // Sign-LSH bucketed embedding dedup (the scale path; approximate recall
    // → rows-only, subset-of-exact asserted in SimilaritySpec).
    rowsOnly("x_dedup_embedding_lsh") { (s, dir) =>
      Dedup.embeddingDupPairsLsh(Tables(s, dir, "embeddings"), "vec_id", "embedding", tau = 0.45)
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

    // Sign-LSH ANN (approximate by construction → rows-only; recall vs the
    // exact top-k is asserted in SimilaritySpec).
    rowsOnly("x_sim_topk_lsh") { (s, dir) =>
      Similarity.lshTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
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

    // Heuristic langid — model-specific output, rows-only; determinism and
    // label domain pinned in TextAnalysisSpec.
    rowsOnly("x_text_langid") { (s, dir) =>
      TextAnalysis.languageId(Tables(s, dir, "documents"), "doc_id", "text")
    },

    q("x_text_fingerprint",
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.fingerprint(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // ---- multimodal -------------------------------------------------------

    // Binary payload plumbing + stubbed decode (no codec libs in the
    // container — see Multimodal scaladoc). Deterministic fake features.
    rowsOnly("x_multimodal_features") { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeFeatures(s, media).toDF()
        .select(col("media_id"), col("mime"), col("n_bytes"),
          round(element_at(col("features"), 1), 4).as("f1"),
          round(element_at(col("features"), 8), 4).as("f8"))
    },

    rowsOnly("x_multimodal_frames") { (s, dir) =>
      val media = Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(media, everyK = 4)
    }
  )
}
