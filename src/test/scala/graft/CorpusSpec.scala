package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Brute-force pins for the corpus pipeline operators (Corpus.scala) —
  * hand-computable synthetic inputs plus invariants on the fixture. */
class CorpusSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "a b c d e f"),      // shares the 5-gram "a b c d e" with bench
      (2L, "x y z w v u"),      // no overlap
      (3L, "q a b c d e"))      // shares "a b c d e"
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e zz yy")).toDF("doc_id", "text")
    val out = Corpus.contamination(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: 2 distinct 5-grams, 1 contaminated; doc 3: same
    assert(out == Set((1L, 1L, 2L), (3L, 1L, 2L)))
  }

  test("repetitionStats: hand-computed top-bigram and dup-token fractions") {
    val d = Seq(
      (1L, "a a a a"),     // bigrams: "a a" ×3 → top 3/3; unique 1/4
      (2L, "a b a b"),     // bigrams: "a b","b a","a b" → top 2/3; unique 2/4
      (3L, "a b c d"))     // all bigrams distinct → top 1/3; unique 4/4
      .toDF("doc_id", "text")
    val out = Corpus.repetitionStats(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((1.0, 0.75)))
    assert(out(2L) == ((2.0 / 3 * 1e6).round / 1e6, 0.5))
    assert(out(3L) == (((1.0 / 3 * 1e6).round / 1e6, 0.0)))
  }

  test("dupNgramStats: repeated 5-gram raises both fractions; distinct text scores 0") {
    val d = Seq(
      // 10 tokens → 6 5-grams; "a b c d e" occurs twice (positions 1 and 6)
      (1L, "a b c d e a b c d e"),
      // 6 tokens → 2 distinct 5-grams → both fractions 0
      (2L, "one two three four five six"),
      // 4 tokens < n → no grams → excluded
      (3L, "a b c d"))
      .toDF("doc_id", "text")
    val out = Corpus.dupNgramStats(d, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 1: 6 occurrences, 5 distinct → dup frac round(1 - 5/6) = 0.166667;
    // char mass: the duplicated gram is 9 chars ×2 = 18 of 54 total
    assert(out(1L) == ((6L, 0.166667, 0.333333)))
    assert(out(2L) == ((2L, 0.0, 0.0)))
    assert(!out.contains(3L))
  }

  test("spanDedup: duplicated span is kept only in the lowest-id doc") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),            // one span, original
      (2L, (1 to 10).map(i => s"t$i").mkString(" ")),            // exact dup → dropped
      (3L, ((1 to 10).map(i => s"t$i") ++ Seq("u1", "u2")).mkString(" ")))
      .toDF("doc_id", "text") // doc 3: span1 dup (dropped), span2 "u1 u2" kept
    val out = Corpus.spanDedup(d, "doc_id", "text", spanTokens = 10)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((1L, 1L, 0L)))
    assert(out(2L) == ((1L, 0L, 1L)))
    assert(out(3L) == ((2L, 1L, 1L)))
  }

  test("spanDedup fixture invariants: kept+dropped=spans, fp changes only for hit docs") {
    val out = Corpus.spanDedup(docs, "doc_id", "text", spanTokens = 10).cache()
    assert(out.where(col("n_kept") + col("n_dropped") =!= col("n_spans")).isEmpty)
    // every span belongs to someone: total kept == distinct spans overall
    val dropped = out.agg(sum("n_dropped")).head.getLong(0)
    assert(dropped > 0, "fixture's planted near-dups must collide on spans")
  }

  test("spanDedup hashSpans=true (64-bit shuffle key) equals the text-key output") {
    val textMode = Corpus.spanDedup(docs, "doc_id", "text", spanTokens = 10)
    val hashMode = Corpus.spanDedup(docs, "doc_id", "text", spanTokens = 10, hashSpans = true)
    assert(textMode.exceptAll(hashMode).isEmpty && hashMode.exceptAll(textMode).isEmpty,
      "hashed span keys must not change ownership, counts, or fingerprints")
  }

  test("piiSignals counts planted patterns exactly") {
    import spark.implicits._
    val d = Seq(
      (1L, "contact me at a.b@example.com or c@d.org thanks"),
      (2L, "server 192.168.0.1 and 10.0.0.255 port"),
      (3L, "call 555-123-4567 or 555.1234.4567 id 1234567890"),
      (4L, "clean text no patterns here"))
      .toDF("doc_id", "text")
    val out = Corpus.piiSignals(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((2L, 0L, 0L, 0L)))
    assert(out(2L) == ((0L, 2L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 2L, 1L)))
    assert(out(4L) == ((0L, 0L, 0L, 0L)))
  }

  test("unigramLogProb: hand-computed corpus LM scores") {
    import spark.implicits._
    // corpus: a=2, b=2, c=1, total=5
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Corpus.unigramLogProb(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    // doc1: (2·ln(2/5) + 1·ln(2/5)) / 3 = ln(0.4); doc2: (ln(0.4)+ln(0.2))/2
    assert(math.abs(out(1L)._1 - math.log(0.4)) < 1e-6)
    assert(math.abs(out(2L)._1 - (math.log(0.4) + math.log(0.2)) / 2) < 1e-6)
    assert(out(1L)._2 == 3L && out(2L)._2 == 2L)
  }

  test("packSequences: bins respect running-sum boundaries and cover all docs") {
    val d = Seq(
      ("s1", 1L, "a b c"), ("s1", 2L, "d e"), ("s1", 3L, "f g h i"),
      ("s2", 10L, "x"))
      .toDF("source", "doc_id", "text")
    // capacity 5: doc1 cum-before 0 → bin 0; doc2 cum-before 3 → bin 0;
    // doc3 cum-before 5 → bin 1; s2 doc10 → bin 0
    val out = Corpus.packSequences(d, "doc_id", "text", "source", capacity = 5)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out(("s1", 0L)) == ((2L, 5L)))
    assert(out(("s1", 1L)) == ((1L, 4L)))
    assert(out(("s2", 0L)) == ((1L, 1L)))
  }

  test("tfidfTopTerms: rare term outranks common term; k bounds output") {
    val d = Seq(
      (1L, "common rare common"),   // rare: tf=1 ln(3/1); common: tf=2 ln(3/3)=0
      (2L, "common other"),
      (3L, "common other"))
      .toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(d, "doc_id", "text", k = 2)
    val doc1 = out.where(col("doc_id") === 1 && col("rk") === 1).head
    assert(doc1.getString(1) == "rare")
    assert(math.abs(doc1.getDouble(3) - math.log(3.0)) < 1e-6)
    // ties (score 0 for 'common' everywhere) break on term asc, rank ≤ k
    assert(out.groupBy("doc_id").count().where(col("count") > 2).isEmpty)
  }

  test("charEntropy: uniform text has ln(alphabet) entropy; constant text has 0") {
    val d = Seq((1L, "aaaa"), (2L, "abab")).toDF("doc_id", "text")
    val out = Corpus.charEntropy(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - math.log(2.0)) < 1e-6)
  }

  test("bigramLogProb: hand-computed conditional probabilities; short docs drop") {
    // corpus bigrams: doc1 "x y x z" → (x,y),(y,x),(x,z); doc2 "x y" → (x,y)
    // c2(x,y)=2 c2(y,x)=1 c2(x,z)=1; prefix counts cp(x)=3 cp(y)=1
    // doc1 = (ln(2/3) + ln(1/1) + ln(1/3)) / 3; doc2 = ln(2/3)
    val d = Seq((1L, "x y x z"), (2L, "x y"), (3L, "solo")).toDF("doc_id", "text")
    val out = Corpus.bigramLogProb(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(!out.contains(3L), "a one-token doc has no bigrams and must drop")
    val exp1 = (math.log(2.0 / 3) + math.log(1.0) + math.log(1.0 / 3)) / 3
    assert(math.abs(out(1L)._1 - exp1) < 1e-6 && out(1L)._2 == 3L)
    assert(math.abs(out(2L)._1 - math.log(2.0 / 3)) < 1e-6 && out(2L)._2 == 1L)
  }
}
