package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data pipeline operators: benchmark-contamination
  * detection, repetition/boilerplate quality signals, cross-document span
  * dedup (C4-style), sequence packing, TF-IDF key terms, and character
  * entropy. These are the corpus-shaping jobs a 100 TB pre-training
  * pipeline runs between raw crawl and tokenizer — all expressed as
  * declarative DataFrame plans so Catalyst keeps filters/projections at the
  * scan and aggregations map-side partial.
  *
  * Scale notes per operator are on each method; the common theme: per-doc
  * token work stays inside the scan stage (codegen'd expressions, no
  * shuffle), and cross-document state (n-gram ownership, document
  * frequency) is reached with exactly one hash shuffle on the smallest
  * possible key.
  */
object Corpus {

  /** Vocabulary rows above which a per-term aggregate no longer broadcasts.
    * "Vocabulary-bounded" is not driver-bounded: a web-scale corpus's term
    * set (typos, IDs, hashes) can reach billions of rows, and an explicit
    * `broadcast` hint bypasses `autoBroadcastJoinThreshold` entirely. At
    * ~2M rows (tens of MB serialized) the broadcast is still a clear win;
    * past it we fall back to a shuffled join on `term`, which AQE can
    * skew-split — still no single-task window partition. */
  private val MaxBroadcastTerms = 2000000L

  /** `byTerm` must be materialized (`localCheckpoint`) by the caller: the
    * guard's `count()` is then a block count, not a recompute, and the join
    * reads the same materialization. */
  private def broadcastIfVocabFits(byTerm: DataFrame): DataFrame =
    if (byTerm.count() <= MaxBroadcastTerms) broadcast(byTerm) else byTerm

  /** Word n-grams as a multiset (order preserved, duplicates kept) — the
    * counting complement of [[TextFunctions.shingles]] (which is distinct).
    * Empty array below n tokens, mirroring `range(1, len-n+2)` in SQL. */
  private def ngramMultiset(textCol: Column, n: Int): Column = {
    val t = tokens(textCol)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark-contamination detection: flag training documents sharing any
    * word `n`-gram with a held-out benchmark/eval set (the standard
    * decontamination check before pre-training). Output: one row per
    * contaminated training doc with the count of distinct shared n-grams
    * and the contaminated fraction of its n-gram set.
    *
    * 100 TB shape: eval sets are tiny (MBs) next to the corpus, so the
    * benchmark n-gram set is `broadcast` — the corpus side is scanned once,
    * n-grams computed in the scan stage (native distinct-shingle
    * expression), and the only shuffle is the per-doc match count, keyed on
    * doc id AFTER the broadcast semi-match has discarded ~everything. */
  def contamination(docs: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    val grams = docs.select(col(idCol), shingles(col(textCol), n).as("g"))
    val bench = benchmark
      .select(explode(shingles(col(textCol), n)).as("gram")).distinct()
    grams
      .select(col(idCol), size(col("g")).cast("long").as("n_grams"),
        explode(col("g")).as("gram"))
      .join(broadcast(bench), "gram")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_contam"))
      .select(col(idCol), col("n_contam"), col("n_grams"),
        round(col("n_contam").cast("double") / col("n_grams"), 6).as("contam_frac"))
  }

  /** [[contamination]] with a Bloom prefilter — the shape that matters at
    * 100 TB: even with the benchmark set broadcast, every corpus n-gram
    * must be probed against the exact hash relation inside the join. Here
    * a Bloom filter built over the benchmark grams discards ~everything in
    * the scan stage BEFORE the join; the exact broadcast join then removes
    * the Bloom's false positives, so the result is IDENTICAL to
    * [[contamination]] — which is exactly what the oracle asserts.
    * `fpp` trades filter size for surviving-row count.
    *
    * The filter is Spark's NATIVE pair (round 11; previously a Scala UDF
    * over `util.sketch.BloomFilter` — the one UDF in an otherwise UDF-free
    * hot path): `BloomFilterAggregate` builds it as one distributed
    * aggregate over `xxhash64(gram)`, and `BloomFilterMightContain` — the
    * codegen'd expression behind runtime bloom join pruning — probes it in
    * the scan stage. The built filter rides the plan as a binary Literal
    * (BloomFilterMightContain requires a constant filter side); eval sets
    * are MBs, so the literal is broadcast-sized by construction. */
  def contaminationBloom(docs: DataFrame, benchmark: DataFrame, idCol: String,
                         textCol: String, n: Int, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bench = benchmark
      .select(explode(shingles(col(textCol), n)).as("gram")).distinct()
      .localCheckpoint(true) // reused three times: count, Bloom build, exact join
    // BloomFilterAggregate validates its literals against the session's
    // runtime-bloom caps (spark.sql.optimizer.runtime.bloomFilter.
    // maxNumItems / maxNumBits, defaults 4M items / 64M bits) and throws
    // above them — clamp instead (round 12, ADVICE): a benchmark set past
    // the cap just gets a higher EFFECTIVE fpp, and the exact broadcast
    // join downstream removes every false positive, so correctness is
    // unaffected; only the pre-join survivor count grows.
    val conf = docs.sparkSession.sessionState.conf
    val maxItems = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val items = math.min(math.max(bench.count(), 1L), maxItems)
    // optimal bit count for the target fpp: -n·ln(p)/ln²2, floored at one word
    val bits = math.min(maxBits, math.max(64L,
      math.ceil(-items.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong))
    val bfBytes = bench.agg(GraftColumnBridge.column(
        new BloomFilterAggregate(
          GraftColumnBridge.expression(xxhash64(col("gram"))),
          Literal(items), Literal(bits)).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val probe = GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bfBytes, org.apache.spark.sql.types.BinaryType),
      GraftColumnBridge.expression(xxhash64(col("gram")))))
    docs.select(col(idCol), shingles(col(textCol), n).as("g"))
      .select(col(idCol), size(col("g")).cast("long").as("n_grams"),
        explode(col("g")).as("gram"))
      .filter(probe)
      .join(broadcast(bench), "gram")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_contam"))
      .select(col(idCol), col("n_contam"), col("n_grams"),
        round(col("n_contam").cast("double") / col("n_grams"), 6).as("contam_frac"))
  }

  /** RAG-style fixed-window chunker: deterministic character windows of
    * `size` advancing by `size - overlap`; the final partial window keeps
    * the tail, and a document shorter than one stride still yields its one
    * chunk. Output carries a replayable mod-prime content fingerprint
    * instead of the chunk text (embedding/indexing stages key on it).
    *
    * 100 TB shape: map-only — chunk count, offsets, substrings, and
    * fingerprints all derive per-row inside the scan stage (explode of a
    * length-computed sequence); no shuffle, no driver coordination. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val chunk = expr(s"substring(__t, CAST(chunk_id * $stride + 1 AS INT), $size)")
    docs.filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"),
        greatest(lit(1L), ceil((length(col(textCol)) - lit(overlap))
          .cast("double") / stride).cast("long")).as("__nc"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        length(chunk).cast("long").as("chunk_chars"),
        graft.functions.HashExpressions.rollingHash(chunk).as("fp"))
  }

  /** Repetition / boilerplate quality signals (Gopher-style): fraction of
    * the document covered by its most frequent bigram, and the duplicate
    * token fraction. High values mark templated or degenerate text.
    *
    * 100 TB shape: bigram counting is a two-level hash aggregate keyed on
    * (doc, bigram) then (doc) — both map-side partial; no joins. Documents
    * with fewer than 2 tokens have no bigrams and are excluded (mirrored by
    * the oracle). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val exploded = docs.select(
      col(idCol),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_unique"),
      explode(ngramMultiset(col(textCol), 2)).as("b"))
    exploded
      .groupBy(col(idCol), col("n_tokens"), col("n_unique"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n_tokens"), col("n_unique"))
      .agg(max("c").as("top_c"), sum("c").as("tot"))
      .select(col(idCol),
        round(col("top_c").cast("double") / col("tot"), 6).as("top_bigram_frac"),
        round(lit(1.0) - col("n_unique").cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"))
  }

  /** Gopher-style duplicate n-gram signals per document: the fraction of
    * n-gram OCCURRENCES that repeat an earlier occurrence
    * (`1 − distinct/total`) and the fraction of n-gram character mass
    * sitting in duplicated n-grams — the templated-text detectors one level
    * up from [[repetitionStats]]' top-bigram share (Gopher filters on
    * exactly these for n ∈ 2..10). Documents with fewer than `n` tokens
    * have no n-grams and are excluded (mirrored by the oracle).
    *
    * 100 TB shape: two-level hash aggregate keyed (doc, gram) then (doc) —
    * both map-side partial; no joins, no windows, n-gram assembly stays in
    * the scan stage. */
  def dupNgramStats(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    docs.select(col(idCol), explode(ngramMultiset(col(textCol), n)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum("c").cast("long").as("n_grams"),
        round(lit(1.0) - count(lit(1)).cast("double") / sum("c"), 6)
          .as("dup_ngram_frac"),
        round(sum(when(col("c") > 1, col("c") * length(col("g"))).otherwise(0L))
          .cast("double") / sum(col("c") * length(col("g"))), 6)
          .as("dup_char_frac"))

  /** Cross-document span dedup (the C4/RefinedWeb move): chunk each
    * document into fixed `spanTokens`-token spans, assign each distinct
    * span to its lowest-id document, and report per document how many of
    * its spans survive. A downstream rewrite would keep only surviving
    * spans; here we emit the audit counts (deterministic and cheap to
    * verify) plus the fingerprint of the surviving text.
    *
    * 100 TB shape: span ownership is `groupBy(span).agg(min(id))` joined
    * back on the span key — NOT a `min(id) over (partition by span)` window.
    * The difference is decisive for boilerplate spans (cookie banners,
    * license headers) repeated across millions of documents: a window
    * partition has no map-side combine, so every occurrence of the hottest
    * span serializes through one task, while the hash aggregate collapses
    * them locally before the shuffle, and the ownership join back is a join
    * — which AQE can skew-split; a Window never is. The span-expanded rows
    * are materialized once (`localCheckpoint`) so ownership and membership
    * read the same tokenize pass (Catalyst does not share subplans across
    * branches). `hashSpans = true` is the production spelling: ownership
    * keys on `xxhash64(span)` (8 bytes) instead of the raw span text
    * (~`spanTokens` words), shrinking the dominant shuffle key volume ~30×;
    * identical output up to 64-bit hash collisions (~n²/2⁶⁵ — negligible at
    * any real corpus size). `false` keeps the text key so the DuckDB oracle
    * replays byte-for-byte. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                spanTokens: Int, hashSpans: Boolean = false): DataFrame = {
    val t = tokens(col(textCol))
    val nChunks = floor((size(t) + (spanTokens - 1)) / spanTokens).cast("int")
    val spans = when(size(t) >= 1,
      transform(sequence(lit(0), nChunks - 1),
        i => struct(i.as("pos"), array_join(slice(t, i * spanTokens + 1, lit(spanTokens)), " ").as("s"))))
      .otherwise(array().cast("array<struct<pos:int,s:string>>"))
    val exploded = docs
      .select(col(idCol), explode(spans).as("sp"))
      .select(col(idCol), col("sp.pos").as("pos"), col("sp.s").as("s"))
      .localCheckpoint(true)
    val spanKey = if (hashSpans) xxhash64(col("s")) else col("s")
    val keyed = exploded.withColumn("__span_k", spanKey)
    // partial+final hash aggregate: hot spans collapse map-side, so the
    // ownership shuffle carries one row per (span, local partition), not one
    // per occurrence
    val owners = keyed.groupBy(col("__span_k")).agg(min(col(idCol)).as("__keeper"))
    keyed
      .join(owners, "__span_k")
      .withColumn("keep", col("__keeper") === col(idCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(array_sort(collect_list(
          when(col("keep"), struct(col("pos"), col("s"))))).getField("s"), " "))
          .as("clean_fp"))
      .select(col(idCol), col("n_spans"), col("n_kept"),
        (col("n_spans") - col("n_kept")).as("n_dropped"), col("clean_fp"))
  }

  /** Sequence packing: assign documents (in stable id order, within a
    * shard) to fixed-capacity context bins by running token count — the
    * standard pre-tokenization packing pass that turns ragged documents
    * into near-full training sequences. Emits per-bin occupancy.
    *
    * 100 TB shape: packing is per-shard (`shardCol`) exactly as a real
    * pipeline packs per input split — the running sum is a window
    * partitioned by shard, so no global sort and no single-partition
    * bottleneck; shards pack in parallel. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, capacity: Int): DataFrame = {
    val nt = size(tokens(col(textCol))).cast("long")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol), col(idCol), nt.as("nt"))
      .withColumn("cum", sum("nt").over(w))
      .select(col(shardCol), floor((col("cum") - col("nt")) / capacity).as("bin"),
        col("nt"))
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("total_tokens"))
  }

  /** TF-IDF key terms: top `k` terms per document by `tf · ln(N/df)`.
    * Deterministic tie-break on the term string.
    *
    * 100 TB shape: term frequency is a (doc, term) hash aggregate (partial
    * map-side); document frequency is a term-keyed hash aggregate over the
    * materialized tf table (map-side combine collapses stopword-grade hot
    * keys locally — no skewed single-task window partition) whose result —
    * bounded by vocabulary, not corpus, size — broadcasts back; the final
    * top-k is a per-doc window. The corpus is never self-joined. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    // materialized so the df branch re-reads the tf aggregate, not the raw
    // text (Catalyst does not share subplans across branches — without the
    // checkpoint the df aggregate would tokenize the corpus a second time)
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    // document frequency: tf has exactly one row per distinct (doc, term),
    // so count per term over tf IS the df. A groupBy — not a per-term
    // window — because the hash aggregate gets a map-side partial combine:
    // a stopword's ~n_docs rows collapse locally instead of all landing in
    // one window partition's task. The result broadcasts back onto tf (no
    // shuffle of the (doc, term) side) while the vocabulary is genuinely
    // driver-sized; past MaxBroadcastTerms it degrades to a shuffled join.
    val dfByTerm = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    val withDf = tf.join(broadcastIfVocabFits(dfByTerm), "term")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = withDf
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") * log(col("n_docs").cast("double") / col("df")))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), col("rk"),
        round(col("score"), 6).as("tfidf"))
  }

  /** PII-pattern signal counts per document (emails, IPv4 addresses,
    * phone-shaped numbers, long digit runs) — the standard pre-redaction
    * audit pass of a corpus-cleaning pipeline. The regexes are RE2-safe
    * (no backrefs/lookaround) so the oracle replays them verbatim.
    *
    * 100 TB shape: pure codegen'd regexp_extract_all in the scan stage —
    * zero shuffle, no UDFs. */
  def piiSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol),
        lit("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"), lit(0)))
        .cast("long").as("n_ipv4"),
      size(regexp_extract_all(col(textCol),
        lit("\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"), lit(0)))
        .cast("long").as("n_phone"),
      size(regexp_extract_all(col(textCol), lit("\\d{6,}"), lit(0)))
        .cast("long").as("n_longnum"))

  /** Corpus unigram language-model score per document: mean token
    * log-probability under the corpus's own unigram distribution — the
    * cheap KenLM-style quality signal (templated/degenerate text scores
    * high, rare-token gibberish scores low).
    *
    * 100 TB shape: ONE corpus scan builds the (doc, term) tf aggregate
    * (map-side partial); the global term count is a term-keyed hash
    * aggregate over the materialized tf (map-side combine — a stopword's
    * rows collapse locally, unlike a per-term window partition) whose
    * vocabulary-bounded result broadcasts back; the corpus total broadcasts
    * as a scalar. Per-doc score = Σ tf·ln(c/total) / Σ tf — algebraically
    * the mean over tokens, without re-exploding them. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    // materialized: the per-term count, the corpus total, and the scoring
    // pass all read the tf aggregate — without it each branch re-derives tf
    // from its own raw text scan (Catalyst does not share subplans across
    // branches), and at 100 TB the second text pass dwarfs the tf
    // materialization (the standard vocab-pass intermediate)
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val cByTerm = tf.groupBy(col("term")).agg(sum("tf").as("c"))
      .localCheckpoint(true)
    val withC = tf.join(broadcastIfVocabFits(cByTerm), "term")
    val tot = tf.agg(sum("tf").as("tot"))
    withC.crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(
        round(sum(col("tf") * log(col("c") / col("tot"))) / sum("tf"), 6)
          .as("unigram_lp"),
        sum("tf").cast("long").as("n_tokens"))
  }

  /** Bigram LM scoring (round 11 — the conditional-probability upgrade of
    * [[unigramLogProb]]): mean log conditional probability of the doc's
    * bigrams under the corpus's own bigram distribution,
    * p(w₂|w₁) = c₂(w₁,w₂) / cₚ(w₁), with the prefix count cₚ derived FROM
    * the bigram table (Σ_w₂ c₂) so numerator and denominator count the
    * same events and no bigram scores zero (every doc bigram exists in
    * the corpus at least its own tf). Documents with fewer than 2 tokens
    * have no bigrams and are excluded, like [[repetitionStats]].
    *
    * 100 TB shape: bigrams derive per-row inside the scan (zip_with of
    * two slices — no positional self-join); tf₂ and c₂ are two-level
    * partial hash aggregates; the vocabulary-bounded (c₂, cₚ) frame
    * broadcasts back under the same size guard as the unigram pass; the
    * per-doc score is one more partial aggregate. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bi = docs.select(col(idCol),
        explode(zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val tf2 = bi.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // vocab + scoring both read it — one text pass
    val c2 = tf2.groupBy(col("w1"), col("w2")).agg(sum("tf").as("c2"))
      .localCheckpoint(true)
    val cp = c2.groupBy(col("w1")).agg(sum("c2").as("cp"))
    val withC = tf2.join(broadcastIfVocabFits(c2.join(cp, "w1")), Seq("w1", "w2"))
    withC.groupBy(col(idCol))
      .agg(round(sum(col("tf") * log(col("c2") / col("cp"))) / sum("tf"), 6)
          .as("bigram_lp"),
        sum("tf").cast("long").as("n_bigrams"))
  }

  /** Character unigram entropy per document (nats) — the cheap gibberish /
    * binary-junk detector. Two-level hash aggregate keyed (doc, char) then
    * (doc); both partial, no joins. */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = filter(split(col(textCol), ""), c => c =!= lit(""))
    docs
      .select(col(idCol), length(col(textCol)).cast("double").as("len"),
        explode(chars).as("ch"))
      .groupBy(col(idCol), col("len"), col("ch"))
      .agg(count(lit(1)).cast("double").as("k"))
      .groupBy(col(idCol), col("len"))
      .agg(round(-sum((col("k") / col("len")) * log(col("k") / col("len"))), 6)
        .as("entropy"))
      .select(col(idCol), col("entropy"))
  }

  /** Gopher-style composite document filter (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Table A1's quality heuristics, adapted
    * to this fixture's scale): the signals AND into one keep/drop verdict —
    *  - token count in [30, 100000] (Gopher: 50-100k words);
    *  - mean token length in [3, 10];
    *  - ≥ 2 stopword hits (Gopher's "contains ≥2 of a stop list");
    *  - ≥ 80% of tokens contain an alphabetic character;
    *  - symbol-to-token ratio (`#` chars + `...` runs) < 0.1.
    * All ratios are rounded at 6 decimals BEFORE the threshold compare —
    * the keep/drop boundary replays bit-for-bit in the DuckDB oracle.
    * Map-only scan-stage expressions, zero shuffle: the verdict column is
    * the canonical first-stage corpus filter at any scale. */
  def gopherVerdict(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val wordChars = length(regexp_replace(col(textCol), "\\s", "")).cast("double")
    val meanLen = round(wordChars / nTok, 6)
    val stopHits = size(filter(toks, t => lower(t).isin(stops: _*)))
    val alphaFrac = round(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nTok, 6)
    val hashes = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))).cast("double")
    val ellipses = ((length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3).cast("double")
    val symbolRatio = round((hashes + ellipses) / nTok, 6)
    docs.select(col(idCol),
      nTok.cast("long").as("n_tokens"),
      meanLen.as("mean_token_len"),
      stopHits.cast("long").as("stop_hits"),
      alphaFrac.as("alpha_frac"),
      symbolRatio.as("symbol_ratio"),
      (nTok >= 30 && nTok <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        stopHits >= 2 &&
        alphaFrac >= 0.8 &&
        symbolRatio < 0.1).as("keep"))
  }
}
