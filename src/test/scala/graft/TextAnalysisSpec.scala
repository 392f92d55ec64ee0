package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents")

  test("token stats invariants: n_unique <= n_tokens, n_chars matches source") {
    val out = TextAnalysis.tokenStats(docs, "doc_id", "text")
    assert(out.filter(col("n_unique") > col("n_tokens")).count() == 0)
    assert(out.filter(col("n_tokens") <= 0).count() == 0)
    assert(out.count() == docs.count())
  }

  test("langid outputs a known label and is deterministic") {
    val a = TextAnalysis.languageId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.languageId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val labels = a.values.toSet
    assert(labels.subsetOf(Set("en", "de", "fr", "es", "zh", "und")))
  }

  test("langid picks the dominant stopword profile on clear-cut text") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist nicht in der stadt und das ist gut"),
      (3L, "le chat est dans la maison et la porte est ouverte"),
      (4L, "el perro es grande y la casa es de los padres")
    ).toDF("id", "t")
    val got = TextAnalysis.languageId(df, "id", "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es"))
  }

  test("quality score lands in [0,1] with sane ratios") {
    val out = TextAnalysis.qualityScore(docs, "doc_id", "text")
    assert(out.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    assert(out.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(out.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
  }

  test("BPE-ish token counts: splits letter runs, digit runs, punctuation") {
    import spark.implicits._
    val df = Seq((1L, "it's 42 words, ok")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenStats(df, "doc_id", "text").head
    // it | ' | s | 42 | words | , | ok → 7 bpe, 4 alpha runs, 1 number
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((7L, 4L, 1L)))
  }

  test("rolling-hash fingerprint: order-sensitive, whitespace-canonical, bounded") {
    import spark.implicits._
    val df = Seq((1L, "ab c"), (2L, "ab  c"), (3L, "ba c"), (4L, "")).toDF("doc_id", "text")
    val m = TextAnalysis.rollingFingerprint(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))     // canonicalized whitespace
    assert(m(1L) != m(3L))     // order matters
    assert(m(4L) == 0L)        // empty text
    assert(m.values.forall(v => v >= 0 && v < 1000000007L))
    // fold spelled out: ((a*31+b)*31+' ')*31+c mod p, over "ab c" — the
    // fold is over unicode CODE POINTS (== bytes here: ASCII), matching
    // DuckDB's ascii(substr(...)) oracle on any input
    val expect = "ab c".codePoints().toArray
      .foldLeft(0L)((h, cp) => (h * 31 + cp) % 1000000007L)
    assert(m(1L) == expect)
  }

  test("hash folds are code-point folds: non-ASCII text matches the oracle semantics") {
    import spark.implicits._
    // "héllo→" has 6 code points but 9 UTF-8 bytes — a byte fold would
    // diverge from DuckDB's ascii(substr(...)) over length() replay
    val s = "héllo→"
    val df = Seq((1L, s)).toDF("doc_id", "text")
    val got = TextAnalysis.rollingFingerprint(df, "doc_id", "text").head.getLong(1)
    val expect = s.codePoints().toArray
      .foldLeft(0L)((h, cp) => (h * 31 + cp) % 1000000007L)
    assert(got == expect, "RollingHash must fold code points, not UTF-8 bytes")
    // SimHashMod2 (fused dual fold) == two independent SimHashMod folds on
    // the same non-ASCII token — pins the fallback path's congruence
    import graft.functions.HashExpressions.{simhashMod, simhashMod2}
    import org.apache.spark.sql.functions.{col, shiftleft, split}
    val t = split(col("text"), " ")
    val both = Seq((1L, s + " plain")).toDF("doc_id", "text").select(
      simhashMod2(t, 28, 65537L, 65539L, 1073741789L).as("fused"),
      simhashMod(t, 28, 65537L, 1073741789L)
        .bitwiseOR(shiftleft(simhashMod(t, 28, 65539L, 1073741789L), 28)).as("two")).head
    assert(both.getLong(0) == both.getLong(1))
  }

  test("multimodal stub decode: deterministic, fixed dims, byte-derived") {
    val f1 = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
    assert(Multimodal.stubDecode(Array.emptyByteArray).forall(_ == 0.0))

    val media = Multimodal.asMedia(docs.limit(20), "doc_id", "text")
    val feats = Multimodal.decodeFeatures(spark, media).collect()
    assert(feats.length == 20)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(f => f.n_bytes > 0))
  }
}
