package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** HTML → text extraction: the first step of a web-crawl pipeline
    * (WET-style text out of raw markup). Rule chain, applied in order:
    * script/style blocks and comments drop WITH their content, remaining
    * tags drop (content kept), the six ubiquitous entities decode
    * (`&amp;` LAST so `&amp;lt;` yields the literal `&lt;`), whitespace
    * runs collapse, trim. Deliberately regex-only — every pattern stays
    * in the Java-regex ∩ RE2 subset (no backreferences, inline `(?is)`
    * flags only) so the pass is reproducible on any engine, and entirely
    * codegen'd (map-only, no UDF, no shuffle). Not a DOM parser by
    * design: at 100 TB, malformed markup must degrade to extra
    * whitespace, never to a parser exception. */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val steps: Seq[(String, String)] = Seq(
      "(?is)<script[^>]*>.*?</script>" -> " ",
      "(?is)<style[^>]*>.*?</style>" -> " ",
      "(?s)<!--.*?-->" -> " ",
      "(?s)<[^>]*>" -> " ",
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&nbsp;" -> " ",
      "&amp;" -> "&",
      "\\s+" -> " ")
    val cleaned = steps.foldLeft(col(htmlCol)) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    df.select(col(idCol), trim(cleaned).as("text"))
  }

  /** BM25 relevance of every document against a fixed query term set —
    * the corpus-weighting primitive of a training-data pipeline (score
    * documents by similarity to a seed/reference query, then sample or
    * weight by the score; CCNet/DSIR-style importance selection reduces
    * to exactly this shape with a different scoring head).
    *
    * Scale design: TWO passes, no explode and no per-token shuffle —
    * (1) one tiny global aggregate (corpus size, average doc length, and
    * per-term document frequency; query terms are compile-time literals,
    * so this is ONE row collected), (2) a map-only projection where each
    * term's tf folds over the in-row token array and the idf rides as a
    * plan literal. A posting-list join would shuffle every token in the
    * corpus; this shuffles nothing.
    *
    * Scores are rounded to 6 decimals: per-doc arithmetic is a fixed
    * expression tree evaluated identically everywhere (no reduction-order
    * nondeterminism), rounding just guards cross-engine libm deltas. */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = df.select(
      col(idCol),
      filter(
        split(lower(col(textCol)), "[^a-z0-9]+"), x => length(x) > 0).as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast(DoubleType))
    val aggs =
      count(lit(1)).as("_n") +: avg(col("_dl")).as("_avgdl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("_toks"), t), 1L).otherwise(0L)).as(s"_df_$i")
        }
    val g = toks.agg(aggs.head, aggs.tail: _*).head()
    val n = g.getLong(0).toDouble
    val avgdl = g.getDouble(1)
    val score = queryTerms.zipWithIndex.map { case (t, i) =>
      val dft = g.getLong(2 + i).toDouble
      val idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
      val tf = size(filter(col("_toks"), x => x === t)).cast(DoubleType)
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / lit(avgdl)))
    }.reduce(_ + _)
    toks.select(col(idCol), round(score, 6).as("bm25"))
  }

  /** Whitespace + punctuation-aware token count, plus a BPE-ish subword
    * estimate (chars/4 heuristic floor-bounded by word count — the standard
    * quick estimator when no tokenizer model is loaded). */
  /** Corpus-wide top-k n-gram frequencies — the vocabulary/statistics
    * pass of a pipeline (stopword discovery, contamination-phrase audits,
    * boilerplate detection). One explode + hash-aggregate: the explode is
    * inherent (a GLOBAL count must shuffle n-grams once), but partial
    * map-side aggregation bounds the shuffle to distinct n-grams per
    * partition, and the final top-k plans as TakeOrderedAndProject — per
    * partition k rows, never the full vocabulary, reach the driver.
    * Ordering is total (count desc, ngram asc), so the k-boundary is
    * deterministic across engines. */
  def topNgrams(
      df: DataFrame,
      textCol: String,
      n: Int,
      k: Int): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    val w = filter(split(lower(col(textCol)), "[^a-z0-9]+"), x => length(x) > 0)
    // n-grams via n-1 zip_withs over shifted slices: the slices are
    // function ARGUMENTS (evaluated once per row) — an index-transform
    // whose lambda referenced `w` would re-tokenize PER ELEMENT (O(len²))
    val cnt = size(w) - (n - 1)
    val grams =
      if (n == 1) w
      else when(size(w) >= n,
        (0 until n).map(o => slice(w, lit(o + 1), cnt))
          .reduce((acc, p) => zip_with(acc, p, (a, b) => concat_ws(" ", a, b))))
        .otherwise(array().cast("array<string>"))
    df.select(explode(grams).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(k)
  }

  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      text.tokenCount(t).as("n_tokens"),
      length(t).as("n_chars"),
      greatest(text.tokenCount(t), (length(t) / lit(4)).cast(IntegerType))
        .as("n_tokens_bpe_est"))
  }

  /** Readability scoring (Flesch reading-ease with the standard
    * vowel-group syllable heuristic): per doc, word / sentence /
    * syllable counts and `206.835 − 1.015·(W/S) − 84.6·(Syl/W)` — the
    * quality signal educational-content classifiers start from (very
    * low scores flag legalese/boilerplate, very high ones flag
    * fragment soup). Counts are exact integers (sentence = non-empty
    * `[.!?]+` segment, syllables = `[aeiouy]+` groups per word, floor
    * 1); the score is one fixed-order double expression, so engines
    * agree bit-for-bit. Map-only, codegen'd, no shuffle. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(trim(coalesce(col(textCol), lit(""))))
    val words = filter(split(t, "\\s+"), x => length(x) > 0)
    val sentences = greatest(lit(1L),
      size(filter(split(t, "[.!?]+"), s => length(trim(s)) > 0)).cast(LongType))
    val syllables = aggregate(
      words, lit(0L),
      (acc, w) => acc + greatest(lit(1),
        size(filter(split(w, "[^aeiouy]+"), g => length(g) > 0))).cast(LongType))
    df.select(col(idCol), words.as("_w"), sentences.as("n_sentences"),
        syllables.as("n_syllables"))
      .select(
        col(idCol),
        size(col("_w")).cast(LongType).as("n_words"),
        col("n_sentences"), col("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") === 0L, lit(null).cast(DoubleType))
          .otherwise(
            lit(206.835)
              - lit(1.015) * (col("n_words").cast(DoubleType) / col("n_sentences"))
              - lit(84.6) * (col("n_syllables").cast(DoubleType) / col("n_words"))))
  }

  /** Token-length histogram in log2 buckets: docs and token mass per
    * `floor(log2(n_tokens))` band — the sequence-length profile consulted
    * before choosing a packing context size (how much mass sits past 2k?
    * how many fragments under 32?). One map-side-combined aggregate,
    * output bounded by ~40 bands; `floor(log2)` of an integer flips only
    * at exact powers of two where log2 is IEEE-exact, so bands are
    * engine-exact. Zero-token docs land in band -1. */
  def tokenLengthHistogram(df: DataFrame, textCol: String): DataFrame = {
    val n = size(filter(
      split(trim(coalesce(col(textCol), lit(""))), "\\s+"),
      x => length(x) > 0)).cast(LongType)
    df.select(
        when(n === 0L, lit(-1L))
          .otherwise(floor(log2(n.cast(DoubleType))).cast(LongType))
          .as("band"),
        n.as("_n"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_n")).as("n_tokens"))
  }

  /** Unicode SCRIPT mix per document: counts of Latin / Cyrillic / Greek /
    * Arabic / Devanagari / CJK / Hangul / Kana letters, the dominant
    * script, and a mixed flag (non-dominant letter share ≥ 0.15) — the
    * crawl gate that catches script-level junk the stopword language-ID
    * can't see (a Latin-stopword page stuffed with CJK spam, transliterated
    * boilerplate, wrong-script injection). Complements [[mojibake]]
    * (encoding damage) and `langId` (lexical vote).
    *
    * Map-only: one codegen'd regexp count per script class (BMP ranges —
    * identical semantics in Java regex and RE2, so the oracle replays
    * exactly); dominance is a fixed-priority CASE chain, deterministic
    * under ties in both engines. */
  def scriptMix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def cnt(range: String): Column =
      length(regexp_replace(t, s"[^$range]", "")).cast(LongType)
    val scripts = Seq(
      "latin" -> "A-Za-z",
      "cyrillic" -> "\\x{0400}-\\x{04FF}",
      "greek" -> "\\x{0370}-\\x{03FF}",
      "arabic" -> "\\x{0600}-\\x{06FF}",
      "devanagari" -> "\\x{0900}-\\x{097F}",
      "cjk" -> "\\x{4E00}-\\x{9FFF}",
      "hangul" -> "\\x{AC00}-\\x{D7AF}",
      "kana" -> "\\x{3040}-\\x{30FF}")
    val counted = df.select(
      col(idCol) +: scripts.map { case (n, r) => cnt(r).as(s"n_$n") }: _*)
    val names = scripts.map(_._1)
    val total = names.map(n => col(s"n_$n")).reduce(_ + _)
    val top = greatest(names.map(n => col(s"n_$n")): _*)
    // fixed-priority dominance: first script (in declaration order) whose
    // count reaches the maximum
    val dominant = names.reverse.foldLeft(lit("none"): Column) {
      case (acc, n) => when(col(s"n_$n") === top && top > 0L, lit(n)).otherwise(acc)
    }
    counted
      .withColumn("n_letters", total)
      .withColumn("dominant", dominant)
      .withColumn("mixed",
        col("n_letters") > 0L &&
          (col("n_letters") - top).cast(DoubleType) / col("n_letters") >= 0.15)
  }

  /** Vocabulary-coverage / out-of-vocabulary report: per document, how
    * many of its tokens fall outside the corpus's top-`vocabSize` word
    * vocabulary — the tokenizer-fit measurement run before committing to
    * a vocab size (a 5% OOV rate at 32k says grow the vocab or expect
    * byte-fallback blowup; per-slice OOV exposes domains the tokenizer
    * underserves). The vocabulary is derived from the corpus itself
    * (count desc, word asc — deterministic at the cut), so the report
    * needs no external artifact.
    *
    * Scale: the token stream shuffles twice with map-side combine — once
    * keyed by WORD for the vocabulary histogram (rows ∝ distinct words),
    * once keyed by DOC for the per-doc counts (rows ∝ documents); the
    * top-K cut is a bounded TakeOrdered and ships back as a BROADCAST
    * join, so scoring never shuffles the corpus by word. Zero-token
    * documents report (0, 0, 0.0) via the outer join back. */
  def vocabCoverage(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val w = filter(
      split(lower(coalesce(col(textCol), lit(""))), "[^a-z0-9]+"),
      x => length(x) > 0)
    val toks = df.select(col(idCol), explode(w).as("_w"))
    val vocab = toks.groupBy(col("_w"))
      .agg(count(lit(1)).as("_freq"))
      .orderBy(col("_freq").desc, col("_w").asc)
      .limit(vocabSize)
      .select(col("_w"), lit(1).as("_in_vocab"))
    val perDoc = toks
      .join(broadcast(vocab), Seq("_w"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("_nt"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("_noov"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("_nt"), lit(0L)).as("n_tokens"),
        coalesce(col("_noov"), lit(0L)).as("n_oov"),
        when(coalesce(col("_nt"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("_noov").cast(DoubleType) / col("_nt"))
          .as("oov_rate"))
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

  /** Encoding-artifact (mojibake) detection: counts of the signatures a
    * double-decoded or lossily-transcoded page leaves behind -- U+FFFD
    * replacement chars, the U+00C3 / U+00E2-U+20AC bigrams a UTF-8 byte
    * pair shows when re-decoded as Latin-1, and C0/C1 control chars --
    * plus a verdict. The crawl-hygiene screen run before tokenization (a
    * mojibake doc poisons n-gram stats and BPE merges). Map-only,
    * precompiled regexes, codegen'd. */
  def mojibake(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    val Seq(nRepl, nLatin, nQuote, nCtrl) = mojibakeCounts(t)
    df.select(
      col(idCol),
      nRepl.cast(LongType).as("n_replacement"),
      nLatin.cast(LongType).as("n_latin1_sigs"),
      nQuote.cast(LongType).as("n_quote_sigs"),
      nCtrl.cast(LongType).as("n_control"),
      (nRepl + nLatin + nQuote + nCtrl > 0).as("suspect"))
  }

  private def mojibakeSuspect(t: Column): Column =
    mojibakeCounts(t).reduce(_ + _) > 0

  /** the four corruption-signature counts, shared with [[webClean]] */
  private def mojibakeCounts(t: Column): Seq[Column] = {
    val nRepl = length(t) - length(regexp_replace(t, "\uFFFD", ""))
    // Latin-1 re-decode signatures: U+00C3 followed by a char in the
    // re-decoded UTF-8 continuation range, and the U+00E2 U+20AC pair
    // (curly quotes / dashes double-decoded)
    val nLatin =
      (length(t) - length(regexp_replace(t, "\u00C3[\u0080-\u00BF]", ""))) / 2
    val nQuote =
      (length(t) - length(regexp_replace(t, "\u00E2\u20AC", ""))) / 2
    // C0/C1 controls except tab / newline / carriage-return
    val nCtrl = length(t) - length(regexp_replace(t,
      "[\u0000-\u0008\u000B\u000C\u000E-\u001F\u007F-\u009F]", ""))
    Seq(nRepl, nLatin, nQuote, nCtrl)
  }

  /** Heuristic language ID (marker stopwords + CJK codepoint ranges). */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), text.langId(col(textCol)).as("lang_pred"))

  /** The published Gopher document-quality rules (Rae et al. 2021,
    * A1.1) as ONE composite filter — the standard first gate of a web
    * pipeline, run BEFORE the expensive stages so dedup/classifiers
    * never see the junk. Each rule surfaces as its own boolean (a
    * rejected doc says WHY) plus the conjunction `pass`:
    *
    *  - 50 ≤ word count ≤ 100000
    *  - 3 ≤ mean word length ≤ 10
    *  - symbol-to-word ratio ('#' and '...') ≤ 0.1
    *  - ≤ 90% of lines start with a bullet ('-', '*')
    *  - ≤ 30% of lines end with an ellipsis
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ 2 distinct members of the required-stopword set
    *    {the, be, to, of, and, that, have, with}
    *
    * Map-only over built-in expressions (split/filter/size — all
    * codegen'd); zero-word docs fail with ratios defined as 0 so both
    * engines agree on degenerate inputs. */
  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keepCols: Seq[String] = Nil): DataFrame = {
    val Seq(rWords, rMean, rSym, rBullet, rEll, rAlpha, rStops) =
      gopherChecks(col(textCol))
    df.select(
      (col(idCol) +: keepCols.map(col)) ++ Seq[Column](
      rWords.as("r_word_count"), rMean.as("r_mean_word_len"),
      rSym.as("r_symbol_ratio"), rBullet.as("r_bullet_lines"),
      rEll.as("r_ellipsis_lines"), rAlpha.as("r_alpha_words"),
      rStops.as("r_stopwords"),
      (rWords && rMean && rSym && rBullet && rEll && rAlpha && rStops)
        .as("pass")): _*)
  }

  /** the seven Gopher rule booleans, shared with [[webClean]] */
  private def gopherChecks(t: Column): Seq[Column] = {
    val words = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val nW = size(words)
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    val nL = size(lines)
    val meanLen = when(nW > 0,
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast(DoubleType) / nW)
      .otherwise(lit(0.0))
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEll = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val symRatio = when(nW > 0, (nHash + nEll).cast(DoubleType) / nW).otherwise(lit(0.0))
    val bulletFrac = when(nL > 0,
      size(filter(lines, l => l.startsWith("-") || l.startsWith("*")))
        .cast(DoubleType) / nL).otherwise(lit(0.0))
    val ellipsisFrac = when(nL > 0,
      size(filter(lines, l => l.endsWith("..."))).cast(DoubleType) / nL)
      .otherwise(lit(0.0))
    val alphaFrac = when(nW > 0,
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast(DoubleType) / nW)
      .otherwise(lit(0.0))
    val reqStops = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      typedLit(Seq("the", "be", "to", "of", "and", "that", "have", "with"))))
    Seq(
      nW >= 50 && nW <= 100000,
      meanLen >= 3.0 && meanLen <= 10.0,
      symRatio <= 0.1,
      bulletFrac <= 0.9,
      ellipsisFrac <= 0.3,
      alphaFrac >= 0.8,
      reqStops >= 2)
  }

  /** Source-level quality governance: one hash aggregate over the corpus
    * produces, per source, the integer evidence (docs, chars, tokens,
    * punctuation/digit chars, stopword hits, Gopher-pass count) plus
    * derived ratios and a keep/drop verdict (`pass_rate >= minPassRate`).
    * This is the domain-pruning decision table of a web pipeline (the
    * C4/RefinedWeb move of dropping whole low-quality hosts) — at 100 TB
    * it costs a single map-side-combined aggregate with output rows
    * bounded by the source vocabulary; every ratio is one bigint/bigint
    * division of exactly-aggregated integers, so engines agree
    * bit-for-bit. */
  def sourceQuality(
      df: DataFrame,
      srcCol: String,
      idCol: String,
      textCol: String,
      minPassRate: Double = 0.5): DataFrame = {
    val withPass = gopherRules(df, idCol, textCol, keepCols = Seq(srcCol, textCol))
    val t = col(textCol)
    val tokens = split(trim(t), "\\s+")
    val nStop = size(filter(tokens, tok =>
      tok.isin("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")))
    withPass
      .groupBy(col(srcCol).as("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(length(t).cast("long")).as("chars"),
        sum(text.tokenCount(t).cast("long")).as("tokens"),
        sum((length(t) - length(regexp_replace(t, "[.,!?;:]", "")))
          .cast("long")).as("punct_chars"),
        sum((length(t) - length(regexp_replace(t, "[0-9]", "")))
          .cast("long")).as("digit_chars"),
        sum(nStop.cast("long")).as("stopword_hits"),
        sum(col("pass").cast("long")).as("gopher_pass"))
      .withColumn("punct_ratio",
        col("punct_chars").cast(DoubleType) / col("chars"))
      .withColumn("digit_ratio",
        col("digit_chars").cast(DoubleType) / col("chars"))
      .withColumn("stops_per_token",
        col("stopword_hits").cast(DoubleType) / col("tokens"))
      .withColumn("pass_rate",
        col("gopher_pass").cast(DoubleType) / col("docs"))
      .withColumn("keep", col("pass_rate") >= minPassRate)
  }

  /** Within-document de-repetition: drop every repeat of a non-empty
    * line AFTER its first occurrence, preserving order and blank-line
    * structure — the cleaning pass for pages that loop their own nav
    * bars / disclaimers (cross-document boilerplate is [[lineDedup]]'s
    * job; this one never needs to see another document).
    *
    * Map-only over array HOFs (codegen'd, no shuffle, no UDF). The
    * first-occurrence test is an array_position over the line's prefix —
    * O(L²) in LINES per document, which is fine where winnowing's
    * char-level O(n²) was not: L is ~100× smaller than n and bounded by
    * document size; a pathological million-line doc should go through
    * the explode+window shape of [[lineDedup]] instead. */
  def derepeat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val kept = filter(lines, (l, i) =>
      length(trim(l)) === 0 || array_position(slice(lines, lit(1), i), l) === 0)
    df.select(
      col(idCol),
      array_join(kept, sep).as("cleaned_text"),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(kept)).cast("long").as("n_removed"))
  }

  /** Line-level corpus dedup (the CCNet boilerplate pass, Wenzek et al.
    * 2020): a line that occurs in at least `minDocs` DISTINCT documents is
    * boilerplate (headers, nav bars, cookie banners) and is removed from
    * every document; each doc is re-assembled from its surviving lines in
    * order. Documents that lose every line stay in the output with an
    * empty `cleaned_text` (the caller decides whether to drop them).
    *
    * Scale design: lines shuffle ONCE keyed by their md5 hash (narrow —
    * the line text never rides the frequency shuffle) with map-side
    * partial aggregation; the boilerplate set is, by construction, the
    * small head of the line-frequency distribution, so the anti-join
    * back is AQE-broadcastable; re-assembly is one shuffle keyed by doc
    * id with per-doc sorting only (no global order). Nothing here is
    * O(corpus²). */
  def lineDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val qsep = java.util.regex.Pattern.quote(sep)
    val lines = df.select(
      col(idCol).as("doc_id"),
      posexplode(split(col(textCol), qsep)).as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))
    // boilerplate = hashes seen in >= minDocs distinct docs; exact
    // count_distinct — the aggregate output is #distinct lines, and the
    // FILTERED set (what ships to the join) is boilerplate-small
    val boiler = lines.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    val kept = lines.join(boiler, Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          sep).as("cleaned_text"))
    df.select(
      col(idCol).as("doc_id"),
      (size(split(col(textCol), qsep))).cast(LongType).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Token-window chunking: one row per (doc, chunk) with the chunk text
    * and its token count — the context-window splitter every training /
    * RAG pipeline runs before packing or embedding. Map-only (the explode
    * multiplies rows but never shuffles); the tokenize-once kernel keeps
    * per-doc cost O(tokens + output chars), not O(tokens × chunks). */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      posexplode(text.chunks(col(textCol), chunkSize, overlap))
        .as(Seq("chunk_id", "chunk_text")))
      .select(
        col("doc_id"),
        col("chunk_id").cast(LongType).as("chunk_id"),
        col("chunk_text"),
        size(split(col("chunk_text"), "\\s+")).cast(LongType).as("n_tokens"))

  /** Winnowing-style rolling-hash fingerprints. */
  def fingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 32): DataFrame =
    df.select(col(idCol), text.fingerprint(col(textCol), window).as("fingerprint"))

  /** Per-document keyword extraction: top-`k` terms by tf·idf with an
    * INTEGER-quantized idf — `idf_q = max(0, B − floor(log2(df)))`, the
    * document frequency's bit-bucket — so scores are exact integers and
    * engines agree bit-for-bit (a float `ln` idf differs across libm
    * implementations at the last ulp; `floor(log2)` of an integer can
    * only flip at exact powers of two, where log2 is IEEE-exact). The
    * topic-tagging pass of a curation pipeline (cluster labeling,
    * facet search, mixture analysis).
    *
    * Scale: explode → two partial-aggregated (doc,term) shuffles + one
    * term-keyed join (df side is pre-aggregated: rows = vocabulary, not
    * corpus) + a per-doc window over that doc's own distinct terms.
    * Nothing global, no driver state. */
  def keywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      idfBits: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null text explodes to zero terms — the doc simply yields no keywords
    val terms = filter(
      split(lower(trim(coalesce(col(textCol), lit("")))), "[^a-z0-9]+"),
      x => length(x) > 0)
    val tok = df.select(col(idCol).as("doc_id"), explode(terms).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score",
        col("tf") * greatest(lit(0L),
          lit(idfBits.toLong) - floor(log2(col("df"))).cast(LongType)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        col("tf"), col("df"), col("score"))
  }

  /** The published C4 cleaning rules (Raffel et al. 2020 §2.2), the OTHER
    * canonical web filter next to [[gopherRules]] — C4 is line-level
    * where Gopher is ratio-level, so pipelines run both. Deterministic
    * subset, applied exactly as published:
    *
    *  - a LINE is retained only if it ends in terminal punctuation
    *    (`.` `!` `?` `"`), has >= 5 words, and does not contain the word
    *    "javascript" (case-insensitive);
    *  - the PAGE is dropped if it contains `{` (code), contains
    *    "lorem ipsum" (boilerplate, case-insensitive), or retains fewer
    *    than 3 sentences (sentence = terminal-punctuation occurrence in
    *    the retained lines).
    *
    * Emits per-line evidence (`n_lines`, `n_lines_kept`), the retained
    * character count, per-rule booleans and the page verdict. Map-only
    * over codegen'd builtins (split/filter/size/regexp) — no shuffle, no
    * UDF; linear in input bytes at any scale. */
  def c4Rules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text = empty doc (never null verdicts)
    val (lines, kept, keptText, nSent, rBrace, rLorem, rSent) =
      c4Checks(coalesce(col(textCol), lit("")))
    df.select(
      col(idCol),
      size(lines).cast(LongType).as("n_lines"),
      size(kept).cast(LongType).as("n_lines_kept"),
      length(keptText).cast(LongType).as("kept_chars"),
      nSent.as("n_sentences"),
      rBrace.as("r_no_brace"),
      rLorem.as("r_no_lorem"),
      rSent.as("r_min_sentences"),
      (rBrace && rLorem && rSent).as("pass"))
  }

  /** the C4 line/page machinery, shared with [[webClean]] */
  private def c4Checks(
      t: Column): (Column, Column, Column, Column, Column, Column, Column) = {
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    def lineKept(l: Column): Column = {
      val words = size(filter(split(l, "\\s+"), w => length(w) > 0))
      l.rlike("[.!?\"]$") && words >= 5 && !lower(l).contains("javascript")
    }
    val kept = filter(lines, lineKept _)
    val keptText = array_join(kept, "\n")
    // sentence count over RETAINED text only — C4 counts what survives
    val nSent = (length(keptText) -
      length(regexp_replace(keptText, "[.!?]", ""))).cast(LongType)
    val rBrace = !t.contains("{")
    val rLorem = !lower(t).contains("lorem ipsum")
    val rSent = nSent >= 3
    (lines, kept, keptText, nSent, rBrace, rLorem, rSent)
  }

  /** The crawl-hygiene FRONT DOOR as one composed, single-pass filter:
    * encoding screen ([[mojibake]]'s suspect verdict) → language gate
    * (keep `lang`) → C4 page rules → Gopher ratio rules, with each
    * gate's verdict surfaced so a rejected doc says which door stopped
    * it. Because every underlying check is a pure projection, the whole
    * composition is ONE map-only select over codegen'd builtins — no
    * join, no shuffle, one pass over the corpus bytes; at 100 TB this is
    * the difference between one read and four. */
  def webClean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en"): DataFrame = {
    val t = coalesce(col(textCol), lit("")) // null text = empty doc
    val mojiOk = !mojibakeSuspect(t)
    val langOk = text.langId(t) === lang
    val (_, _, _, _, rBrace, rLorem, rSent) = c4Checks(t)
    val c4Ok = rBrace && rLorem && rSent
    val gopherOk = gopherChecks(t).reduce(_ && _)
    df.select(
      col(idCol),
      mojiOk.as("encoding_ok"),
      langOk.as("lang_ok"),
      c4Ok.as("c4_ok"),
      gopherOk.as("gopher_ok"),
      (mojiOk && langOk && c4Ok && gopherOk).as("keep"))
  }

  /** Per-SOURCE boilerplate-line REPORT (the governance table read before
    * configuring a [[lineDedup]]-style strip): lines occurring in at
    * least `minDocs` distinct documents OF THE SAME SOURCE, with their
    * document frequency and the share of the source's docs they infect —
    * nav bars, cookie banners and subscribe footers are per-DOMAIN
    * artifacts, so global df (what lineDedup keys on) underestimates
    * their density inside the offending source.
    *
    * Scale: one (source, line) hash aggregate over exploded lines +
    * a broadcast-size per-source doc count — the narrow shuffle carries
    * (source, line-hash-sized strings), never documents. */
  def boilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      srcCol: String,
      sep: String = "\n",
      minDocs: Long = 2L): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      col(textCol).as("text"))
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("src_docs"))
    val lines = docs
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), java.util.regex.Pattern.quote(sep))).as("line"))
      .select(col("doc_id"), col("source"), trim(col("line")).as("line"))
      .filter(length(col("line")) > 0)
      .distinct() // one vote per (doc, line)
    lines.groupBy(col("source"), col("line"))
      .agg(count(lit(1)).as("line_docs"))
      .filter(col("line_docs") >= minDocs)
      .join(broadcast(perSource), "source")
      .select(col("source"), col("line"), col("line_docs"),
        round(col("line_docs").cast(DoubleType) / col("src_docs"), 6).as("doc_share"))
  }

  /** Per-document LEXICAL DIVERSITY — the repeated-token degeneracy
    * signal (the unigram complement of [[repetition]]'s n-gram view):
    * type-token ratio and the Simpson diversity index
    * `1 - Σc_i² / n²`. Chosen over Shannon entropy DELIBERATELY: both
    * rank degenerate docs the same way, but Simpson is a ratio of exact
    * INTEGER sums (no transcendentals), so every engine computes
    * bit-identical results — a log-based entropy quantization was
    * measured to flip on last-ulp log2 disagreements between engines.
    * Two (doc, word)- and (doc)-keyed hash aggregates — narrow shuffles,
    * map-side combined. */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = filter(split(lower(col(textCol)), "[^a-z0-9]+"), x => length(x) > 0)
    val counts = df
      .select(col(idCol).as("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("_c2"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        round(coalesce(col("n_types"), lit(0L)).cast(DoubleType) /
          greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L)), 6).as("ttr"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit(0.0d))
          .otherwise(round(lit(1.0d) -
            coalesce(col("_c2"), lit(0L)).cast(DoubleType) /
              (col("n_tokens") * col("n_tokens")), 6))
          .as("simpson"))
  }

  /** N-gram NOVELTY against a reference corpus slice: per new document,
    * how many of its distinct word `n`-grams never occur in the
    * reference — the dedup-adjacent freshness signal (a "new" crawl
    * whose novelty collapses is re-serving the old corpus; a fine-tune
    * batch with near-zero novelty adds nothing).
    *
    * Scale: reference n-grams deduplicate FIRST (hash aggregate keyed by
    * the gram), then one (gram)-keyed left join of the new side's
    * distinct (doc, gram) pairs — both shuffles carry grams, not
    * documents, and the reference side is its distinct-gram count no
    * matter how many copies the corpus holds. */
  def ngramNovelty(
      newDocs: DataFrame,
      refDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    def grams(df: DataFrame): DataFrame = {
      // tokens materialize ONCE per row ("_w"): an index lambda over the
      // raw split expression re-tokenizes the document PER GRAM (O(len²))
      val w = filter(split(lower(col(textCol)), "[^a-z0-9]+"), x => length(x) > 0)
      df.select(col(idCol).as("doc_id"), w.as("_w"))
        .select(col("doc_id"),
          explode(
            when(size(col("_w")) >= n,
              transform(sequence(lit(0), size(col("_w")) - n),
                i => array_join(slice(col("_w"), i + 1, lit(n)), " ")))
              .otherwise(array().cast("array<string>"))).as("gram"))
        .select(col("doc_id"), col("gram")).distinct()
    }
    val refGrams = grams(refDocs).select(col("gram")).distinct()
      .withColumn("_seen", lit(1))
    val newGrams = grams(newDocs)
    val perDoc = newGrams.join(refGrams, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    newDocs.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast(DoubleType) /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)), 6).as("novelty"))
  }
}
