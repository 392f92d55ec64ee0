package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis operators (token stats, quality scoring, language ID,
  * fingerprinting) — all pure column expressions over the scan, zero
  * shuffle, so they pipeline with dedup/filter stages at any scale. */
object TextAnalysis {

  /** Token counting: whitespace tokens, distinct tokens, chars. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_unique"))
  }

  /** Quality heuristics: punctuation density, stopword ratio, mean token
    * length — the standard cheap pre-filters for LLM training corpora. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val nChars = length(text).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val stop = langScore(t, langProfiles.head._2).cast("double")
    val wordChars = length(regexp_replace(text, "\\s", "")).cast("double")
    df.select(col(idCol),
      round(punct / nChars, 6).as("punct_ratio"),
      round(stop / nTok, 6).as("stopword_ratio"),
      round(wordChars / nTok, 6).as("avg_token_len"),
      // composite quality in [0,1]: long-enough, low punct, some stopwords
      round(least(nTok / 50.0, lit(1.0)) * (lit(1.0) - punct / nChars), 6).as("quality"))
  }

  /** Heuristic language ID per document. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), langId(col(textCol)).as("lang_pred"))

  /** Content fingerprint (md5 of canonical text). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprintMd5(col(textCol)).as("fp"))

  /** BPE-ish token counting: the classic pre-tokenizer split — letter runs,
    * digit runs, single punctuation marks — as a regex, the standard proxy
    * for subword-token budgeting when the real tokenizer isn't in the
    * pipeline. */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      size(regexp_extract_all(t, lit(bpePattern), lit(0))).cast("long").as("n_bpe"),
      size(regexp_extract_all(t, lit("[a-zA-Z]+"), lit(0))).cast("long").as("n_alpha"),
      size(regexp_extract_all(t, lit("[0-9]+"), lit(0))).cast("long").as("n_num"))
  }

  /** Rolling-hash fingerprint: order-sensitive polynomial hash of the
    * canonical text ([[graft.functions.HashExpressions.RollingHash]]) —
    * cheaper than md5 and incremental-friendly (chunk hashes combine). */
  def rollingFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.HashExpressions.rollingHash(normText(col(textCol))).as("rfp"))
}
