package graft

/** Plan-shape regression tests: the properties that decide 100 TB viability
  * must hold in the compiled plan, not just in intent — filters and
  * projections reach the parquet scan, dimension joins broadcast, top-k
  * avoids a global sort. A refactor that silently loses one of these
  * wouldn't change sf0.01 results at all, so the correctness gate can't
  * catch it; these specs do. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("b_filter_pushdown: predicates and projection reach the parquet scan") {
    val p = plan("b_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_returnflag)"),
      "filters must push into the scan")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // 5 columns read (3 projected + 2 filtered), not all 16 of lineitem
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"scan must prune unused columns: $readSchema")
  }

  test("b_join_star: every dimension join broadcasts (no fact-side shuffle)") {
    val p = plan("b_join_star")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      "nation/region (broadcast-hinted) must build broadcast joins")
  }

  test("b_sort_limit: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("b_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$p")
  }

  test("b_q1_pricing: aggregation is partial+final (map-side combine before shuffle)") {
    val p = plan("b_q1_pricing")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "expected partial and final HashAggregate stages")
  }

  test("embedding-LSH candidates: bucket shuffle carries no vector payload") {
    val emb = Tables(spark, sf, "embeddings")
    val sig = graft.operators.Similarity.signature(emb, "vec_id", "embedding", 16, 64, 7L)
    val p = graft.operators.Dedup.embeddingLshCandidates(sig, 4, 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("Exchange"), s"expected a bucket-key shuffle in:\n$p")
    // `\bv#` does not match cv#/csc# (no word boundary inside cv): only the
    // vector alias v / v_a / v_b themselves are banned from the plan
    assert(!p.matches("(?s).*\\bv#\\d.*") && !p.contains("v_a#") && !p.contains("v_b#"),
      s"vector column must not ride the candidate shuffle:\n$p")
  }

  test("x_sim_topk_exact: corpus side stays shuffle-free until the rank") {
    val df = SparkEntry.queries("x_sim_topk_exact")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query rows must broadcast; the corpus scan must not shuffle for the join")
  }

  test("x_sim_topk_int8: quantization stays in the scan; corpus never shuffles to score") {
    val p = plan("x_sim_topk_int8")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query rows must broadcast; the quantized corpus scan must not shuffle")
  }

  test("x_contam_ngram: benchmark n-gram set broadcasts; corpus scans once") {
    val p = plan("x_contam_ngram")
    assert(p.contains("BroadcastHashJoin") && p.contains("BroadcastExchange"),
      s"the (tiny) benchmark side must broadcast — corpus must not shuffle for the match:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "per-doc match count must partial-aggregate map-side")
  }

  test("x_sample_diverse: assignment is the native map-side argmax; rank keys on cid") {
    val p = plan("x_sample_diverse")
    assert(p.contains("nearestcentroid") || p.contains("NearestCentroid"),
      s"cluster assignment must be the native argmax expression:\n$p")
    // exactly one Window, partitioned by the cluster id — dense-region
    // candidates funnel per-cid, never a global sort over the corpus
    assert(p.linesIterator.count(_.contains("Window")) >= 1 &&
      p.matches("(?s).*Window.*cid#\\d.*"),
      s"the only rank must partition by cid:\n$p")
    assert(!p.contains("UDF"), s"no UDF on the sampling path:\n$p")
  }

  test("x_sim_topk_pq: encode/decode are native expressions, not interpreted lambda HOFs") {
    val p = plan("x_sim_topk_pq")
    assert(p.toLowerCase.contains("pqencode"),
      s"PQ encode must be the native PqEncode expression (round 11):\n$p")
    assert(p.toLowerCase.contains("pqreconstruct"),
      s"PQ decode must be the native PqReconstruct expression:\n$p")
    assert(!p.contains("lambdafunction") && !p.contains("NamedLambdaVariable"),
      s"no interpreted lambda HOF may remain in the PQ scan stage:\n$p")
  }

  test("x_sim_topk_ivfpq: ADC scores inside probed lists via a hash join on cid") {
    val p = plan("x_sim_topk_ivfpq")
    assert(p.contains("nearestcentroid") || p.contains("NearestCentroid"),
      s"list assignment must be the native map-side argmax:\n$p")
    assert(p.toLowerCase.contains("pqencode") && p.toLowerCase.contains("pqreconstruct"),
      s"the inverted lists must hold native-encoded PQ codes:\n$p")
    // the round-11 flat-ADC gap: pqTopK crossJoined every query against the
    // WHOLE compressed corpus. Composed, the candidate join is an equi-join
    // on the probed list id — corpus rows outside the nProbe lists are
    // never scored
    assert(p.matches("(?s).*BroadcastHashJoin \\[cid#.*"),
      s"ADC candidates must come from a broadcast hash join on cid:\n$p")
  }

  test("x_contam_bloom: the prefilter is the native might_contain expression, not a UDF") {
    val p = plan("x_contam_bloom")
    assert(p.contains("might_contain"),
      s"the Bloom probe must be Spark's native BloomFilterMightContain:\n$p")
    assert(!p.contains("UDF"),
      s"no Scala UDF may remain on the contamination hot path (round 11):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the exact benchmark join must still broadcast behind the prefilter:\n$p")
  }

  test("x_tfidf_topterms: df is a broadcast-joined hash agg over tf, never a per-term window") {
    val p = plan("x_tfidf_topterms")
    // tf is materialized (localCheckpoint) so the final plan reads the tf
    // RDD, not a second tokenize pass over the raw text; documents parquet
    // appears only in the corpus-count scalar branch
    val docScans = p.linesIterator.count(l => l.contains("Scan parquet") && l.contains("documents"))
    assert(docScans <= 1,
      s"raw text must not be re-tokenized for df (got $docScans parquet scans):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary-bounded df must broadcast back onto tf:\n$p")
    // a per-term window funnels every row of a stopword into one task — the
    // only Window allowed is the per-doc top-k (partitioned by doc_id)
    assert(!p.linesIterator.exists(l => l.contains("Window") && l.matches(".*\\[term#\\d+[L]?\\].*")),
      s"no Window may partition by term:\n$p")
  }

  test("x_dedup_spans: ownership is a partial-agg groupBy joined back, never a span-key window") {
    val p = plan("x_dedup_spans")
    // a window partition has no map-side combine: a boilerplate span's every
    // occurrence would funnel into ONE task. The only legal shape is a hash
    // aggregate (partial+final) for min(id) per span plus a join back —
    // joins get AQE skew-splitting, windows never do.
    assert(!p.contains("Window"),
      s"no Window may appear on the span-ownership path:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"span ownership must partial-aggregate map-side:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"expected the ownership join back onto the span rows:\n$p")
  }

  test("x_quality_unigram_lp: term counts broadcast-join onto tf, never a per-term window") {
    val p = plan("x_quality_unigram_lp")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the corpus-total scalar must broadcast:\n$p")
    assert(p.split("Scan parquet").length - 1 <= 1,
      s"the raw text must be scanned once (tf feeds term counts, total, and score):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary-bounded per-term count must broadcast back onto tf:\n$p")
    assert(!p.contains("Window"),
      s"no window (per-term or otherwise) may appear in the plan:\n$p")
  }

  test("x_dedup_spans_hashed: the ownership shuffle keys on the 64-bit span hash") {
    val p = plan("x_dedup_spans_hashed")
    assert(p.contains("xxhash64"),
      s"hashed mode must key ownership on xxhash64(span):\n$p")
    assert(!p.contains("Window"),
      s"no Window may appear on the span-ownership path:\n$p")
  }
}
