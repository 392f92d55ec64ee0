package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Corpus-shaping pipeline operators (SURVEY §7 extension phase, round 4):
  * benchmark decontamination, repetition quality, cross-document span
  * dedup, sequence packing, TF-IDF key terms, character entropy — the jobs
  * between raw crawl and tokenizer in an LLM data pipeline.
  *
  * Oracle notes: every op is replayed exactly in DuckDB — integer counts
  * are bit-exact; doubles (ratios, ln-based scores, entropy) are computed
  * with the same operand shapes in both engines and rounded to 6 decimals
  * at the output boundary only.
  */
object Pipeline {

  /** DuckDB word tokens + distinct n-gram list (mirrors
    * [[graft.functions.HashExpressions.WordShingles]]). */
  private def duckNgrams(n: Int): String =
    s"""toks AS (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') t FROM documents),
       |ng AS (SELECT doc_id, source,
       |  list_distinct([list_aggregate(t[i:i+${n - 1}], 'string_agg', ' ')
       |                 for i in range(1, len(t) - ${n - 2})]) g
       |  FROM toks)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- decontamination --------------------------------------------------

    // Benchmark contamination: docs from source 'src0' act as the held-out
    // eval set; training docs (all other sources) sharing any distinct word
    // 5-gram with it are flagged with match counts.
    q("x_contam_ngram",
      s"""WITH ${duckNgrams(5)},
         |bench AS (SELECT DISTINCT unnest(g) AS gram FROM ng WHERE source = 'src0'),
         |train AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams, unnest(g) AS gram
         |          FROM ng WHERE source <> 'src0')
         |SELECT doc_id, count(*) AS n_contam, max(n_grams) AS n_grams,
         |  round(count(*)::DOUBLE / max(n_grams), 6) AS contam_frac
         |FROM train JOIN bench USING (gram) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      Corpus.contamination(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", n = 5)
    },

    // Bloom-prefiltered decontamination: same semantics as x_contam_ngram
    // (the exact join removes the Bloom's false positives), but the corpus
    // grams are discarded by a broadcast Bloom probe in the scan stage
    // before any join — the at-scale shape. The oracle is the EXACT
    // computation: matching it proves the prefilter changes nothing.
    q("x_contam_bloom",
      s"""WITH ${duckNgrams(5)},
         |bench AS (SELECT DISTINCT unnest(g) AS gram FROM ng WHERE source = 'src0'),
         |train AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams, unnest(g) AS gram
         |          FROM ng WHERE source <> 'src0')
         |SELECT doc_id, count(*) AS n_contam, max(n_grams) AS n_grams,
         |  round(count(*)::DOUBLE / max(n_grams), 6) AS contam_frac
         |FROM train JOIN bench USING (gram) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      Corpus.contaminationBloom(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", n = 5)
    },

    // ---- RAG chunking -----------------------------------------------------

    // Fixed-window document chunker (200 chars, 50 overlap): offsets,
    // lengths, and the mod-prime content fingerprint are all replayed by
    // the oracle — lateral unnest over the per-doc chunk count, then the
    // same codepoint fold over each substring.
    q("x_chunk_documents",
      """WITH d AS (SELECT doc_id, text, strlen(text) AS len
        |  FROM documents WHERE strlen(text) > 0),
        |n AS (SELECT doc_id, text,
        |  greatest(1, CAST(ceil((len - 50)::DOUBLE / 150) AS BIGINT)) AS nc FROM d),
        |c AS (SELECT doc_id, t.j AS chunk_id,
        |    substr(text, CAST(t.j*150 + 1 AS INT), 200) AS chunk
        |  FROM n, unnest(range(n.nc)) AS t(j))
        |SELECT doc_id, chunk_id, CAST(strlen(chunk) AS BIGINT) AS chunk_chars,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, strlen(chunk) + 1),
        |      i -> CAST(ascii(substr(chunk, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM c""".stripMargin) { (s, dir) =>
      Corpus.chunkDocuments(Tables(s, dir, "documents"), "doc_id", "text",
        size = 200, overlap = 50)
    },

    // ---- repetition / boilerplate quality ---------------------------------

    q("x_quality_repetition",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
        |bg AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
        |  unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS b
        |  FROM toks),
        |cnt AS (SELECT doc_id, n_tokens, n_unique, b, count(*) AS c
        |        FROM bg GROUP BY 1, 2, 3, 4)
        |SELECT doc_id,
        |  round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac,
        |  round(1.0 - max(n_unique)::DOUBLE / max(n_tokens), 6) AS dup_token_frac
        |FROM cnt GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.repetitionStats(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // Gopher's duplicate 5-gram signals: occurrence-level repeat fraction
    // and duplicated character mass — two-level hash agg, no joins.
    q("x_quality_dup_ngrams",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
        |g AS (SELECT doc_id,
        |  unnest([list_aggregate(t[i:i+4], 'string_agg', ' ') for i in range(1, len(t)-3)]) AS g
        |  FROM toks WHERE len(t) >= 5),
        |cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  round(1.0 - count(*)::DOUBLE / sum(c), 6) AS dup_ngram_frac,
        |  round(sum(CASE WHEN c > 1 THEN c * len(g) ELSE 0 END)::DOUBLE
        |    / sum(c * len(g)), 6) AS dup_char_frac
        |FROM cnt GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.dupNgramStats(Tables(s, dir, "documents"), "doc_id", "text", n = 5)
    },

    // ---- cross-document span dedup (C4-style) -----------------------------

    // 10-token spans; each distinct span belongs to its lowest-id document;
    // per-doc survival counts + fingerprint of the surviving text.
    q("x_dedup_spans",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
        |sp AS (SELECT doc_id, unnest([{'pos': i, 's':
        |    list_aggregate(t[i*10+1:i*10+10], 'string_agg', ' ')}
        |    for i in range(0, (len(t) + 9) // 10)]) AS u
        |  FROM toks),
        |f AS (SELECT doc_id, u.pos AS pos, u.s AS s,
        |    min(doc_id) OVER (PARTITION BY u.s) = doc_id AS keep
        |  FROM sp)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(s, ' ' ORDER BY pos) FILTER (keep), '')) AS clean_fp
        |FROM f GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.spanDedup(Tables(s, dir, "documents"), "doc_id", "text", spanTokens = 10)
    },

    // The production spelling — ownership shuffle keyed on xxhash64(span)
    // (8-byte keys instead of ~10-word strings). Output is identical up to
    // 64-bit collisions, so the SAME text-mode oracle hash-verifies it.
    q("x_dedup_spans_hashed",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
        |sp AS (SELECT doc_id, unnest([{'pos': i, 's':
        |    list_aggregate(t[i*10+1:i*10+10], 'string_agg', ' ')}
        |    for i in range(0, (len(t) + 9) // 10)]) AS u
        |  FROM toks),
        |f AS (SELECT doc_id, u.pos AS pos, u.s AS s,
        |    min(doc_id) OVER (PARTITION BY u.s) = doc_id AS keep
        |  FROM sp)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(s, ' ' ORDER BY pos) FILTER (keep), '')) AS clean_fp
        |FROM f GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.spanDedup(Tables(s, dir, "documents"), "doc_id", "text", spanTokens = 10,
        hashSpans = true)
    },

    // ---- sequence packing -------------------------------------------------

    // Pack docs into 256-token context bins per source shard by running
    // token count (stable doc_id order within the shard).
    q("x_pack_sequences",
      """WITH toks AS (SELECT source, doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
        |  FROM documents),
        |c AS (SELECT source, doc_id, nt,
        |  sum(nt) OVER (PARTITION BY source ORDER BY doc_id
        |                ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM toks)
        |SELECT source, CAST((cum - nt) // 256 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens
        |FROM c GROUP BY source, bin""".stripMargin) { (s, dir) =>
      Corpus.packSequences(Tables(s, dir, "documents"), "doc_id", "text",
        shardCol = "source", capacity = 256)
    },

    // ---- TF-IDF key terms -------------------------------------------------

    q("x_tfidf_topterms",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term, tf,
        |    tf::DOUBLE * ln(n_docs::DOUBLE / df) AS score
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        |  FROM sc)
        |SELECT doc_id, term, rk, round(score, 6) AS tfidf
        |FROM r WHERE rk <= 3""".stripMargin) { (s, dir) =>
      Corpus.tfidfTopTerms(Tables(s, dir, "documents"), "doc_id", "text", k = 3)
    },

    // ---- character entropy ------------------------------------------------

    q("x_text_entropy",
      """WITH ch AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS len,
        |  unnest([substr(text, CAST(i AS INT), 1)
        |          for i in range(1, length(text) + 1)]) AS c
        |  FROM documents),
        |cnt AS (SELECT doc_id, len, c, CAST(count(*) AS DOUBLE) AS k
        |        FROM ch GROUP BY 1, 2, 3)
        |SELECT doc_id, round(-sum((k / len) * ln(k / len)), 6) AS entropy
        |FROM cnt GROUP BY doc_id, len""".stripMargin) { (s, dir) =>
      Corpus.charEntropy(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // ---- PII signals (round 5) ---------------------------------------------

    // Pre-redaction audit: per-doc counts of email / IPv4 / phone-shaped /
    // long-digit-run patterns. RE2-safe regexes replay verbatim in DuckDB.
    q("x_text_pii",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(text, '\d{6,}')) AS BIGINT) AS n_longnum
        |FROM documents""".stripMargin) { (s, dir) =>
      Corpus.piiSignals(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // ---- corpus unigram LM scoring (round 5) -------------------------------

    // Mean token log-probability under the corpus's own unigram
    // distribution (KenLM-style quality signal); Σ tf·ln(c/total) / Σ tf
    // computed with identical operand shapes in both engines.
    q("x_quality_unigram_lp",
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |wc AS (SELECT doc_id, term, tf, sum(tf) OVER (PARTITION BY term) AS c FROM tf),
        |tot AS (SELECT sum(tf) AS tot FROM tf)
        |SELECT doc_id,
        |  round(sum(tf * ln(c / tot)) / sum(tf), 6) AS unigram_lp,
        |  CAST(sum(tf) AS BIGINT) AS n_tokens
        |FROM wc, tot GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.unigramLogProb(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // Bigram conditional-probability scoring (round 11): mean
    // ln p(w2|w1) over the doc's bigrams, with p = c2(w1,w2)/cp(w1) and
    // the prefix count derived from the bigram table itself — numerator
    // and denominator count the same events, so no zero probabilities.
    // Docs with < 2 tokens have no bigrams and drop (both engines).
    q("x_quality_bigram_lp",
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |             FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> [toks[i], toks[i+1]])) AS bg
        |  FROM tok WHERE len(toks) >= 2),
        |tf AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2, count(*) AS tf
        |  FROM b GROUP BY 1, 2, 3),
        |cc AS (SELECT doc_id, tf,
        |    sum(tf) OVER (PARTITION BY w1, w2) AS c2,
        |    sum(tf) OVER (PARTITION BY w1) AS cp
        |  FROM tf)
        |SELECT doc_id,
        |  round(sum(tf * ln(c2 / cp)) / sum(tf), 6) AS bigram_lp,
        |  CAST(sum(tf) AS BIGINT) AS n_bigrams
        |FROM cc GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.bigramLogProb(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // ---- Gopher composite filter verdict (round 9) -------------------------

    // The signals AND into one keep/drop column — the canonical first-stage
    // corpus filter. Ratios are rounded (6 dp) BEFORE the threshold
    // compares so every keep/drop decision replays bit-for-bit.
    q("x_quality_gopher_verdict",
      """WITH t AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS word_chars,
        |    CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
        |    (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(toks) AS DOUBLE) AS n_tok,
        |    round(word_chars / len(toks), 6) AS mean_len,
        |    len(list_filter(toks, x -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], lower(x)))) AS sh,
        |    round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |      / len(toks), 6) AS alpha_frac,
        |    round((hashes + ellipses) / len(toks), 6) AS symbol_ratio
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, mean_len AS mean_token_len,
        |  CAST(sh AS BIGINT) AS stop_hits, alpha_frac, symbol_ratio,
        |  (n_tok >= 30 AND n_tok <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
        |   AND sh >= 2 AND alpha_frac >= 0.8 AND symbol_ratio < 0.1) AS keep
        |FROM s""".stripMargin) { (s, dir) =>
      Corpus.gopherVerdict(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // ---- composed pretraining pipeline (round 9) ---------------------------

    // Gopher-verdict filter → exact-dedup survivors → RAG chunking →
    // per-source corpus budget (chunks, characters, surviving docs). Every
    // stage is an operator hash-verified on its own above; this pins that
    // they COMPOSE — the end-to-end shape of a pre-training data build.
    q("x_pipeline_pretrain",
      """WITH t AS (SELECT doc_id, text, source,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS word_chars,
        |    CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
        |    (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses
        |  FROM documents),
        |v AS (SELECT doc_id, text, source,
        |    CAST(len(toks) AS DOUBLE) AS n_tok,
        |    round(word_chars / len(toks), 6) AS mean_len,
        |    len(list_filter(toks, x -> list_contains(
        |      ['the','a','of','and','to','in','is','that','it','for'], lower(x)))) AS sh,
        |    round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |      / len(toks), 6) AS alpha_frac,
        |    round((hashes + ellipses) / len(toks), 6) AS symbol_ratio
        |  FROM t),
        |keep AS (SELECT doc_id, text, source FROM v
        |  WHERE n_tok >= 30 AND n_tok <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
        |    AND sh >= 2 AND alpha_frac >= 0.8 AND symbol_ratio < 0.1),
        |ded AS (SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
        |    arg_min(source, doc_id) AS source
        |  FROM (SELECT doc_id, text, source,
        |      md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |    FROM keep) x
        |  GROUP BY fp),
        |d2 AS (SELECT doc_id, source, text, strlen(text) AS len FROM ded
        |  WHERE strlen(text) > 0),
        |n AS (SELECT doc_id, source, text,
        |  greatest(1, CAST(ceil((len - 50)::DOUBLE / 150) AS BIGINT)) AS nc FROM d2),
        |c AS (SELECT doc_id, source,
        |    substr(text, CAST(t.j*150 + 1 AS INT), 200) AS chunk
        |  FROM n, unnest(range(n.nc)) AS t(j))
        |SELECT source, count(*) AS n_chunks,
        |  CAST(SUM(strlen(chunk)) AS BIGINT) AS n_chars,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM c GROUP BY source""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val kept = docs.join(
        Corpus.gopherVerdict(docs, "doc_id", "text")
          .filter(col("keep")).select("doc_id"), "doc_id")
      val survivors = kept
        .groupBy(graft.functions.TextFunctions.fingerprintMd5(col("text")).as("fp"))
        .agg(min("doc_id").as("doc_id"),
             min_by(col("text"), col("doc_id")).as("text"),
             min_by(col("source"), col("doc_id")).as("source"))
      val chunks = Corpus.chunkDocuments(survivors, "doc_id", "text",
        size = 200, overlap = 50)
      chunks.join(survivors.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
             sum("chunk_chars").as("n_chars"),
             countDistinct("doc_id").as("n_docs"))
    }
  )
}
