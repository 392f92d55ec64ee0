package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (dedup, quality, langid).
  * All pure column expressions (codegen'd, no UDFs): at 100 TB these run
  * embarrassingly parallel inside the parquet scan stage with zero shuffle.
  */
object TextFunctions {

  /** Whitespace tokenizer (fixture text is single-space separated; `\s+`
    * handles general whitespace). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Canonical form for content fingerprinting: lowercase, trim, collapse
    * whitespace. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Content fingerprint = md5 of the canonical form (stable across engines,
    * so it doubles as the exact-dedup key). */
  def fingerprintMd5(c: Column): Column = md5(normText(c))

  /** Distinct word n-gram shingles (native single-pass expression —
    * [[HashExpressions.WordShingles]]; empty array below n tokens). */
  def shingles(c: Column, n: Int): Column = HashExpressions.wordShingles(c, n)

  // ---- MinHash ------------------------------------------------------------

  /** k-permutation MinHash signature of a string-array column (the shingle
    * set): one xxhash64 per element + k splitmix64 salted mixes in a native
    * Catalyst expression ([[HashExpressions.MinHashSig]]). A higher-order-
    * function formulation was ~100× slower — Spark's `transform`/`aggregate`
    * lambdas are interpreted (CodegenFallback), catastrophic at k·|set|
    * evaluations per row. */
  def minhashSignature(setCol: Column, k: Int = 128, seed: Long = 42L): Column =
    HashExpressions.minhashSig(setCol, k, seed)

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over the token multiset: per-bit ±1 votes from each
    * token's xxhash64, sign-packed into a Long — native expression
    * ([[HashExpressions.SimHash]]) for the same interpreted-HOF reason as
    * MinHash. Near-dup docs land within a small Hamming distance. */
  def simhash64(tokensCol: Column): Column =
    HashExpressions.simhash(tokensCol, 42L)

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- Language ID + quality ---------------------------------------------

  /** Tiny stopword profiles (public-knowledge function words). A real system
    * would use char-n-gram profiles; the operator shape (score-per-language,
    * argmax) is the same. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "por"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Stopword-hit count for one language profile. */
  def langScore(tokensCol: Column, words: Seq[String]): Column =
    size(filter(tokensCol, t => t.isInCollection(words)))

  /** Heuristic language ID: argmax of profile scores, 'und' when no profile
    * matches. Deterministic tie-break = profile order. */
  def langId(textCol: Column): Column = {
    val t = tokens(lower(textCol))
    val scores = langProfiles.map { case (lang, words) => lang -> langScore(t, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc === best && best > 0, lang).otherwise(acc)
    }
    pick
  }
}
