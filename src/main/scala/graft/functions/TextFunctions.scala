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

  /** Distinct word n-gram shingles. Safe on short docs (returns empty array
    * when fewer than n tokens — `sequence` would otherwise count DOWN). */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    val grams = transform(
      sequence(lit(1), size(t) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(t, i + lit(j))): _*))
    array_distinct(when(size(t) >= n, grams).otherwise(array().cast("array<string>")))
  }

  // ---- MinHash ------------------------------------------------------------

  /** Seeded per-permutation salt constants. Deterministic across runs. */
  private def permConstants(k: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)(rnd.nextLong())
  }

  /** k-permutation MinHash signature of a string-array column (the shingle
    * set). One xxhash64 per element, then k salted re-hashes
    * (`xxhash64(h, salt_i)` — a random function family with no overflow,
    * which ANSI mode would reject for affine multiply-add). All codegen'd,
    * O(k·|set|) per row, no shuffle. */
  def minhashSignature(setCol: Column, k: Int = 128, seed: Long = 42L): Column = {
    val saltLit = typedLit(permConstants(k, seed))
    val hashes = transform(setCol, s => xxhash64(s))
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(
        hashes,
        h => xxhash64(h, element_at(saltLit, (i + 1).cast("int"))))))
  }

  // ---- SimHash ------------------------------------------------------------

  private val bitMasks: Seq[Long] = Seq.tabulate(64)(b => 1L << b)

  /** 64-bit SimHash over the token multiset: per-bit ±1 votes from each
    * token's xxhash64, sign-packed into a Long. Near-dup docs land within a
    * small Hamming distance. */
  def simhash64(tokensCol: Column): Column = {
    val masks = typedLit(bitMasks)
    val hashes = transform(tokensCol, t => xxhash64(t))
    val votes = aggregate(
      hashes,
      typedLit(Seq.fill(64)(0L)),
      (acc, h) => zip_with(acc, masks, (v, m) =>
        v + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0L, m).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

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
