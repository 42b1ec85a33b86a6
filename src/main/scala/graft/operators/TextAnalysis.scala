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

  /** Repetition signals (the Gopher-style repetition filters): type-token
    * ratio, most-frequent-word mass, and duplicate-bigram fraction —
    * heavily repetitive documents (boilerplate, keyword stuffing, broken
    * crawls) score low diversity / high duplication and get filtered
    * before training. Map-only: every stat folds over the in-row token
    * array with codegen'd higher-order functions (array_sort + aggregate
    * computes the modal word count WITHOUT a per-word explode/shuffle —
    * at 100 TB an explode would shuffle every token in the corpus). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    // modal word count = longest run in the sorted token array
    val maxRun = expr(
      s"""aggregate(
         |  array_sort(split($textCol, ' ')),
         |  struct(CAST('' AS STRING) AS prev, 0 AS run, 0 AS maxr),
         |  (s, x) -> struct(
         |    x,
         |    CASE WHEN x = s.prev THEN s.run + 1 ELSE 1 END,
         |    greatest(s.maxr, CASE WHEN x = s.prev THEN s.run + 1 ELSE 1 END)),
         |  s -> s.maxr)""".stripMargin)
    val bigrams = zip_with(
      slice(words, lit(1), size(words) - 1),
      slice(words, lit(2), size(words) - 1),
      (a, b) => concat(a, lit(" "), b))
    df.select(
      col(idCol),
      size(words).cast(LongType).as("n_words"),
      (size(array_distinct(words)).cast(DoubleType) / size(words))
        .as("distinct_word_ratio"),
      (maxRun.cast(DoubleType) / size(words)).as("top_word_frac"),
      // 0-/1-word docs have no bigrams: define the fraction as 0.0 rather
      // than NULL (x/0) so both engines agree on degenerate inputs
      when(size(bigrams) > 0,
        lit(1.0) - size(array_distinct(bigrams)).cast(DoubleType) / size(bigrams))
        .otherwise(lit(0.0))
        .as("dup_bigram_frac"))
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
