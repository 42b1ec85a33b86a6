package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.text

/** Text analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All map-only (no shuffle)
  * — they scale linearly with input splits. */
object TextAnalysis {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}-\\d{4}"

  /** PII scrubbing: redact emails / phone-shaped numbers in place and
    * count what was removed — the pre-training hygiene pass. Map-only;
    * regexes are codegen'd, no UDF. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_replace(regexp_replace(t, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")
        .as("redacted"),
      regexp_count(t, lit(EmailRe)).cast(LongType).as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast(LongType).as("n_phones"))
  }

  /** Whitespace + punctuation-aware token count, plus a BPE-ish subword
    * estimate (chars/4 heuristic floor-bounded by word count — the standard
    * quick estimator when no tokenizer model is loaded). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      text.tokenCount(t).as("n_tokens"),
      length(t).as("n_chars"),
      greatest(text.tokenCount(t), (length(t) / lit(4)).cast(IntegerType))
        .as("n_tokens_bpe_est"))
  }

  /** Quality signals: doc length, mean word length, stopword ratio,
    * punctuation ratio, uppercase ratio, digit ratio. */
  def qualityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTokens = text.tokenCount(t)
    val nChars = length(t)
    val nPunct = nChars - length(regexp_replace(t, "[.,!?;:]", ""))
    val nDigit = nChars - length(regexp_replace(t, "[0-9]", ""))
    val nUpper = nChars - length(regexp_replace(t, "[A-Z]", ""))
    val tokens = split(trim(t), "\\s+")
    val nStop = size(filter(tokens, tok =>
      tok.isin("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")))
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      (length(regexp_replace(t, "\\s", "")).cast(DoubleType) / nTokens)
        .as("mean_word_len"),
      (nStop.cast(DoubleType) / nTokens).as("stopword_ratio"),
      (nPunct.cast(DoubleType) / nChars).as("punct_ratio"),
      (nUpper.cast(DoubleType) / nChars).as("upper_ratio"),
      (nDigit.cast(DoubleType) / nChars).as("digit_ratio"))
  }

  /** Heuristic language ID (marker stopwords + CJK codepoint ranges). */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), text.langId(col(textCol)).as("lang_pred"))

  /** Winnowing-style rolling-hash fingerprints. */
  def fingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 32): DataFrame =
    df.select(col(idCol), text.fingerprint(col(textCol), window).as("fingerprint"))
}
