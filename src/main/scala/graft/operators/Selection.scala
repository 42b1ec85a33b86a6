package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Importance-based data selection for training-data pipelines: DSIR-style
  * hashed-feature importance weights and target-mixture sampling.
  *
  * Both operators follow the same scale recipe as the rest of the
  * pipeline surface: ONE tiny global aggregate (bucket/domain counts —
  * bytes, collected to the driver and re-emitted as plan literals),
  * then a MAP-ONLY scoring/filter pass over the corpus. Nothing shuffles
  * with the data; the corpus-sized side never leaves its input splits.
  */
object Selection {


  /** Exact quantile bucketing (curriculum/quality deciles): assign every
    * document its global rank-derived bucket in (score, id) order —
    * `bucket = floor(nBuckets * (rank-1) / total)`, the exact form of
    * NTILE-style bucketing that stays deterministic across engines.
    * Same distributed scaffolding as [[budgetSelect]]: value-bucketed
    * prefix COUNT, no global window. Curriculum schedules, per-quality
    * mixing weights, and decile-capped filtering all start here. */
  /** #bounds strictly below (or above) `v`, as a when-sum rather than an
    * array-filter lambda: CollapseProject inlines a COMPUTED `v` into a
    * higher-order function's lambda, re-evaluating it once PER BOUNDARY
    * ELEMENT (measured 31× per row on calibration's tokenizing scorer);
    * a when-chain keeps every comparison a plain codegen'd expression,
    * where whole-stage subexpression elimination computes `v` once. */
  private[operators] def boundsBucket(
      bounds: Seq[Double], v: Column, above: Boolean): Column =
    bounds.map(b => when(if (above) lit(b) > v else lit(b) < v, 1).otherwise(0))
      .reduce(_ + _)

  def quantileBuckets(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      nBuckets: Int,
      numBuckets: Int = 0,
      carry: Seq[String] = Nil): DataFrame = {
    // `carry` threads extra columns through to the output so callers
    // don't need a post-hoc join back on the id (that join is a full
    // extra shuffle AND re-computes the score projection — calibration
    // measured ~30% faster without it)
    require(nBuckets >= 1, "nBuckets must be positive")
    val spark = df.sparkSession
    val nB =
      if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df.select(
      col(idCol).cast(LongType).as("doc_id") +:
      col(scoreCol).cast(DoubleType).as("score") +:
      carry.map(col): _*)
    val total = base.count()
    if (total == 0)
      return base.select(
        col("doc_id") +: lit(0L).as("bucket") +: carry.map(col): _*)
    val qs = (1 until nB).map(_.toDouble / nB).toArray
    val bounds =
      if (qs.isEmpty) Array.empty[Double]
      else base.stat.approxQuantile("score", qs, 0.01)
    val vbucket =
      if (bounds.isEmpty) lit(0)
      else boundsBucket(bounds.toSeq, col("score"), above = false)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("vb").orderBy(col("score"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // repartition by vb FIRST so the window branch and the per-bucket
    // totals branch share ONE reused exchange: a groupBy here would put
    // its partial aggregate BELOW its exchange, making the two exchange
    // subplans differ — each branch would then re-run the (possibly
    // expensive) score projection. With the shared exchange the score is
    // computed once per pass (measured 4.1 s → ~2 s on calibration's
    // tokenizing scorer at sf0.1).
    val parted = base.withColumn("vb", vbucket).repartition(nB, col("vb"))
    val local = parted.withColumn("rank_local", count(lit(1)).over(wLocal))
    val totals = parted.groupBy("vb").agg(count(lit(1)).as("n"))
    val ow = org.apache.spark.sql.expressions.Window.orderBy("vb")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum("n").over(ow), lit(0L)))
      .select("vb", "off")
    local.join(broadcast(offsets), "vb")
      .select(col("doc_id") +:
        expr(s"(${nBuckets}L * (rank_local + off - 1)) div ${total}L")
          .as("bucket") +: carry.map(col): _*)
  }

  /** Token-budget selection: keep the highest-scoring documents until a
    * global token budget fills — the final cut of importance-based data
    * selection (score with DSIR/BM25/a classifier, then take the best
    * `budget` tokens). A doc is kept iff the tokens of all
    * strictly-better docs (score desc, id asc ties) stay below the
    * budget, so the result is the exact greedy prefix.
    *
    * Scale design: the running total is a DISTRIBUTED prefix sum in score
    * order — approx-quantile score cut points bucket the data (bucketing
    * by VALUE, monotone along the order, so boundary imprecision shifts
    * bucket sizes, never the result), one windowed cumsum per bucket, a
    * broadcast of per-bucket offsets. No global single-partition window
    * at any size. */
  def budgetSelect(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      budgetTokens: Long,
      numBuckets: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = df.sparkSession
    val nB =
      if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df.select(
      col(idCol).cast(LongType).as("doc_id"),
      col(scoreCol).cast(DoubleType).as("score"),
      coalesce(col(tokensCol).cast(LongType), lit(0L)).as("n_tokens"))
    val qs = (1 until nB).map(_.toDouble / nB).toArray
    val bounds =
      if (qs.isEmpty) Array.empty[Double]
      else base.stat.approxQuantile("score", qs, 0.01)
    // descending traversal: bucket = #cut-points strictly above the score
    // (non-decreasing along score desc — ties never straddle a bucket)
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      else boundsBucket(bounds.toSeq, col("score"), above = true)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val parted = base.withColumn("bucket", bucketCol)
      .repartition(nB, col("bucket"))
    val local = parted.withColumn("cum_local", sum("n_tokens").over(wLocal))
    val totals = parted.groupBy("bucket").agg(sum("n_tokens").as("ptot"))
    val ow = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("poffset", coalesce(sum("ptot").over(ow), lit(0L)))
      .select("bucket", "poffset")
    local.join(broadcast(offsets), "bucket")
      .withColumn("cum_before", col("cum_local") + col("poffset") - col("n_tokens"))
      .filter(col("cum_before") < budgetTokens)
      .select(col("doc_id"), col("n_tokens"), col("cum_before"))
  }

  /** engine-portable feature hash: first `hexChars` hex digits of md5 —
    * the same trick Sampling uses for thresholds, here as the bucket id
    * (16^hexChars buckets; strings compare/equate identically in Spark,
    * DuckDB, Trino) */
  private def bucketIds(hexChars: Int): Seq[String] = {
    require(hexChars >= 1 && hexChars <= 2, "1 or 2 hex chars (16 or 256 buckets)")
    val digits = "0123456789abcdef"
    if (hexChars == 1) digits.map(_.toString)
    else for (a <- digits; b <- digits) yield s"$a$b"
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023): score every raw document by how much more likely
    * its hashed-unigram profile is under a TARGET distribution than under
    * the RAW distribution — `score(d) = Σ_b n_b(d) · log(p_t(b)/p_r(b))`
    * with add-one smoothing. High scorers "look like" the target corpus;
    * feed the scores to [[Sampling.hashSample]]-style selection or a
    * softmax resampler.
    *
    * Scale design: pass 1 computes per-bucket token counts for the target
    * slice and the full corpus as ONE aggregate row (2·B longs — the
    * "distribution" is driver-tiny by construction); the per-bucket
    * log-ratios come back as plan LITERALS. Pass 2 is map-only: each
    * doc's bucket counts fold over its in-row token array (array HOFs,
    * no explode) and the score is a fixed literal-weighted sum — the
    * expression tree is identical on every engine, so scores are
    * bit-reproducible (ratios rounded to 6dp to absorb libm ln deltas).
    *
    * The reference has no selection surface (it is a table-format
    * engine); this is part of the §2.14 pipeline obligations. */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      hexChars: Int = 1): DataFrame = {
    val ids = bucketIds(hexChars)
    // per-doc bucket counts computed ONCE into an array column — no
    // explode, no shuffle. round-14: the tokenize-filter + per-token md5
    // + B string-equality folds (1 + 1 + B interpreted HOF passes per
    // row) are now ONE compiled pass (TextUtil.md5BucketCounts —
    // bit-identical counts, equivalence property-tested in
    // KernelEquivalenceSpec); n_tokens below is the exact bucket-count
    // sum (every non-empty token lands in exactly one bucket).
    val based = df.select(
      col(idCol),
      graft.functions.text.md5BucketCounts(
        split(lower(col(textCol)), "[^a-z0-9]+"), hexChars).as("_bc"),
      isTarget.as("_is_t"))

    def bucketCount(i: Int): Column = col("_bc")(i)

    // pass 1: per-bucket token totals, target slice vs full corpus — one
    // aggregate row regardless of corpus size
    val aggs =
      ids.indices.map(i =>
        sum(when(col("_is_t"), bucketCount(i)).otherwise(0L)).as(s"t_$i")) ++
      ids.indices.map(i => sum(bucketCount(i)).as(s"r_$i"))
    val row = based.agg(aggs.head, aggs.tail: _*).collect()(0)
    val tCounts = ids.indices.map(i => row.getLong(i))
    val rCounts = ids.indices.map(i => row.getLong(ids.size + i))
    val (tTot, rTot) = (tCounts.sum, rCounts.sum)
    val b = ids.size.toDouble
    def smoothed(n: Long, tot: Long): Double = (n + 1.0) / (tot + b)
    val ratios: Seq[Double] = ids.indices.map { i =>
      val v = math.log(smoothed(tCounts(i), tTot) / smoothed(rCounts(i), rTot))
      math.rint(v * 1e6) / 1e6
    }

    // pass 2: map-only literal-weighted score; the sum is a FIXED
    // left-to-right chain so every engine adds in the same order
    val score = ids.indices
      .map(i => bucketCount(i).cast(DoubleType) * lit(ratios(i)))
      .reduce(_ + _)
    based.select(
      col(idCol),
      ids.indices.map(bucketCount).reduce(_ + _).as("n_tokens"),
      round(score, 6).as("dsir_score"))
  }

  /** CCNet-style language-model quality scoring: per-document negative
    * log-likelihood under a character-trigram model trained on the TARGET
    * slice (Wenzek et al. 2020 — docs that "read like" the target score
    * low, gibberish scores high; threshold or bucket on `nll` to filter).
    *
    * Scale design: the model is ONE aggregate over the target slice's
    * trigrams (char-trigram vocabularies are small — collected to the
    * driver, re-emitted as a plan-resident hash map); scoring is
    * MAP-ONLY (each doc's gram array folds against the model map
    * in-row — round-14; previously explode + broadcast join + one
    * groupBy(doc) shuffle) — nothing about the corpus shuffles.
    *
    * Determinism across engines is engineered, not hoped for: per-trigram
    * log-probs are quantized to integer MICRO-NATS and summed as longs
    * (exact in any order), so the per-doc average is identical in Spark
    * and DuckDB regardless of aggregation order; add-one smoothing over
    * (T + V + 1) covers out-of-vocabulary grams. Docs shorter than 3
    * chars carry no trigrams and are excluded (documented contract). */
  def charLmNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      minCount: Long = 2L): DataFrame = {
    // round-14: trigram construction is ONE compiled pass
    // (TextUtil.charTrigrams — code-point trigrams of the lowered text,
    // bit-identical to the previous 4x split + 2x interpreted zip_with
    // expression; equivalence property-tested incl. surrogates and
    // combining marks in KernelEquivalenceSpec) and SCORING is MAP-ONLY:
    // the driver-built micro-nat model folds over each doc's gram array
    // via sumModelMicro instead of explode -> broadcast join -> per-doc
    // shuffle. Long sums are exact in any order, so every nll is
    // bit-identical to the join form.
    val grams = graft.functions.text.charTrigrams(lower(col(textCol)))
    val kept = df.filter(length(col(textCol)) >= 3)
    // the model: one aggregate over the target slice. total/vocab fold to
    // ONE distributed row, and the minCount filter runs BELOW the collect
    // — only the kept vocabulary reaches the driver. (The singleton long
    // tail of a 100 TB multilingual slice — CJK trigram spaces run to
    // millions+ — must never land on the driver.)
    val gcounts = kept.filter(isTarget)
      .select(explode(grams).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (total, vocab, counts) =
      try {
        val trow = gcounts
          .agg(coalesce(sum(col("c")), lit(0L)).as("t"), count(lit(1)).as("v"))
          .head()
        (trow.getLong(0).toDouble, trow.getLong(1).toDouble,
          gcounts.filter(col("c") >= minCount).collect())
      } finally gcounts.unpersist()
    // round HALF AWAY FROM ZERO to match SQL round() semantics exactly
    def micro(v: Double): Long =
      (if (v >= 0) math.floor(v * 1e6 + 0.5) else math.ceil(v * 1e6 - 0.5)).toLong
    val denom = total + vocab + 1.0
    val model = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    counts.foreach { r =>
      model.put(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        java.lang.Long.valueOf(micro(math.log((r.getLong(1) + 1.0) / denom))))
    }
    val oovMicro = micro(math.log(1.0 / denom))
    kept
      .select(col(idCol), grams.as("_g"))
      .select(col(idCol),
        size(col("_g")).cast(LongType).as("n_grams"),
        graft.functions.text.sumModelMicro(col("_g"), model, oovMicro).as("_sm"))
      .select(col(idCol), col("n_grams"),
        round(-(col("_sm").cast(DoubleType) / 1e6) / col("n_grams"), 6).as("nll"))
  }

  /** Hashed-feature Naive-Bayes quality classifier (the fastText-style
    * linear filter a pipeline trains on a small labeled slice and applies
    * to the whole corpus — CCNet/GPT-3-style "looks like the curated set"
    * filtering). TRAIN: multinomial NB with add-one smoothing over hashed
    * unigram buckets, fit on the rows where `isTrain` holds, labeled by
    * `isPositive`. SCORE: every row gets the log-odds
    * `logit(d) = log(P(+)/P(-)) + Σ_b n_b(d)·log(p⁺_b/p⁻_b)` and
    * `pred = logit > 0`.
    *
    * Scale design: training is ONE aggregate row (2·B bucket totals + 2
    * doc counts — the model is driver-tiny by construction) re-emitted as
    * plan literals; scoring is MAP-ONLY (per-doc bucket counts fold over
    * the in-row token array, no explode, no shuffle). Determinism is
    * engineered: per-bucket log-ratios and the prior are quantized to
    * integer MICRO-NATS and the per-doc score is a LONG dot product —
    * exact in any evaluation order, identical across engines. */
  def nbClassify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isPositive: Column,
      isTrain: Column,
      hexChars: Int = 1): DataFrame = {
    val ids = bucketIds(hexChars)
    // round-14: bucket histogram is one compiled pass (md5BucketCounts),
    // replacing the 1 + 1 + B interpreted HOF passes — see dsirWeights
    val based = df.select(
      col(idCol),
      graft.functions.text.md5BucketCounts(
        split(lower(col(textCol)), "[^a-z0-9]+"), hexChars).as("_bc"),
      isPositive.as("_pos"), isTrain.as("_tr"))
    def bucketCount(i: Int): Column = col("_bc")(i)

    val aggs =
      ids.indices.map(i =>
        sum(when(col("_tr") && col("_pos"), bucketCount(i)).otherwise(0L))
          .as(s"p_$i")) ++
      ids.indices.map(i =>
        sum(when(col("_tr") && !col("_pos"), bucketCount(i)).otherwise(0L))
          .as(s"n_$i")) ++
      Seq(
        sum(when(col("_tr") && col("_pos"), 1L).otherwise(0L)).as("dp"),
        sum(when(col("_tr") && !col("_pos"), 1L).otherwise(0L)).as("dn"))
    val row = based.agg(aggs.head, aggs.tail: _*).collect()(0)
    val pC = ids.indices.map(i => row.getLong(i))
    val nC = ids.indices.map(i => row.getLong(ids.size + i))
    val (docsP, docsN) = (row.getLong(2 * ids.size), row.getLong(2 * ids.size + 1))
    val b = ids.size.toDouble
    // round HALF AWAY FROM ZERO to match SQL round() semantics exactly
    def micro(v: Double): Long =
      (if (v >= 0) math.floor(v * 1e6 + 0.5) else math.ceil(v * 1e6 - 0.5)).toLong
    val (pTot, nTot) = (pC.sum, nC.sum)
    val llr: Seq[Long] = ids.indices.map { i =>
      micro(math.log((pC(i) + 1.0) / (pTot + b)) -
        math.log((nC(i) + 1.0) / (nTot + b)))
    }
    val prior = micro(math.log((docsP + 1.0) / (docsN + 1.0)))

    // map-only scoring: LONG dot product of bucket counts with the
    // quantized weights — exact, order-independent
    val logitMicro = ids.indices
      .map(i => bucketCount(i) * lit(llr(i)))
      .reduce(_ + _) + lit(prior)
    based.select(
      col(idCol),
      round(logitMicro.cast(DoubleType) / 1e6, 6).as("nb_logit"),
      (logitMicro > 0L).as("nb_pred"))
  }

  /** Target-mixture sampling (the "data mix" knob of a training run):
    * given desired domain WEIGHTS (fractions of the output token budget)
    * and a global `budget` (fraction of total corpus tokens to keep),
    * compute each domain's keep-rate and hash-sample it deterministically.
    * A domain whose natural share already undershoots its target keeps
    * everything (rate caps at 1 — this operator never upsamples, matching
    * single-epoch pipeline practice; run it per epoch for repetition).
    *
    * rate_d = min(1, budget · weight_d · T / tokens_d)   (T = total tokens)
    *
    * Scale: the domain token histogram is ONE aggregate (domains are
    * few); the sample itself is [[Sampling]]'s map-only md5-threshold
    * filter with per-domain thresholds broadcast — nothing about the
    * corpus shuffles. Deterministic by key: re-runs and backfills pick
    * the same documents. */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokenCountCol: String,
      weights: Map[String, Double],
      budget: Double,
      salt: String = ""): DataFrame = {
    require(budget > 0 && budget <= 1.0, s"budget in (0,1], got $budget")
    val wSum = weights.values.sum
    require(math.abs(wSum - 1.0) < 1e-9, s"weights must sum to 1, got $wSum")
    val hist = df.groupBy(col(domainCol)).agg(
      sum(col(tokenCountCol)).cast(DoubleType).as("tok")).collect()
    val total = hist.map(_.getDouble(1)).sum
    val tokOf = hist.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rates: Map[String, Double] = weights.map { case (d, w) =>
      val tok = tokOf.getOrElse(d, 0.0)
      d -> (if (tok <= 0) 0.0 else math.min(1.0, budget * w * total / tok))
    }
    Sampling.stratifiedSample(df, idCol, domainCol, rates,
      defaultFraction = 0.0, salt = salt)
  }

  /** Domain reweighting table (the DoReMi-style "what mixture should I
    * train on" artifact): per domain, the observed token share and the
    * multiplicative sampling weight that moves the mix to a TARGET
    * distribution — uniform across domains unless explicit target shares
    * are given. `weight_d = target_share_d / observed_share_d`, so
    * feeding these weights to [[mixtureSample]] / [[epochMixture]]
    * reproduces the target mix exactly; `weight > 1` marks domains that
    * need upsampling, `< 1` downsampling.
    *
    * Scale: ONE map-side-combined aggregate (output rows bounded by the
    * domain vocabulary) plus a broadcast one-row total — nothing about
    * the corpus shuffles, no driver collect. Every share/weight is a
    * single division of exactly-aggregated integers rounded at 1e-6, so
    * engines agree bit-for-bit. */
  def domainWeights(
      df: DataFrame,
      domainCol: String,
      tokenCount: Column,
      targets: Map[String, Double] = Map.empty): DataFrame = {
    val hist = df.groupBy(col(domainCol).as("domain")).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount.cast(LongType)).as("n_tokens"))
    val tot = hist.agg(
      sum(col("n_tokens")).as("_total"),
      count(lit(1)).as("_nd"))
    val targetShare: Column =
      if (targets.isEmpty) lit(1.0) / col("_nd")
      else {
        val wSum = targets.values.sum
        require(math.abs(wSum - 1.0) < 1e-9, s"target shares must sum to 1, got $wSum")
        coalesce(
          element_at(
            typedLit(targets),
            col("domain")),
          lit(0.0))
      }
    hist.crossJoin(broadcast(tot))
      .select(
        col("domain"),
        col("n_docs"),
        col("n_tokens"),
        round(col("n_tokens").cast(DoubleType) / col("_total"), 6).as("tok_share"),
        round(targetShare, 6).as("target_share"),
        round(targetShare * col("_total") / col("n_tokens"), 6).as("weight"))
  }

  /** Temperature-scaled mixture (the "sample domains by size^(1/T)"
    * recipe): target weights are derived FROM the corpus itself,
    * w_d ∝ tokens_d^(1/T), instead of being hand-specified — T = 1
    * reproduces natural proportions, T → ∞ approaches uniform over
    * domains, T < 1 exaggerates big domains. Rates quantize through the
    * same 16-bit md5 threshold as every sampler here, so the float
    * `pow` is engine-robust. One domain histogram (bounded by #domains),
    * then map-only hash selection — nothing about the corpus shuffles. */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokenCountCol: String,
      temperature: Double,
      budget: Double,
      salt: String = ""): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    require(budget > 0 && budget <= 1.0, s"budget in (0,1], got $budget")
    val hist = df.groupBy(col(domainCol)).agg(
      sum(col(tokenCountCol)).cast(DoubleType).as("tok")).collect()
    val total = hist.map(_.getDouble(1)).sum
    val pw = hist.map(r => (r.getString(0), r.getDouble(1),
      math.pow(r.getDouble(1), 1.0 / temperature)))
    val psum = pw.map(_._3).sum
    val rates: Map[String, Double] = pw.map { case (d, tok, p) =>
      d -> (if (tok <= 0) 0.0 else math.min(1.0, budget * (p / psum) * total / tok))
    }.toMap
    Sampling.stratifiedSample(df, idCol, domainCol, rates,
      defaultFraction = 0.0, salt = salt)
  }

  /** Epoch-aware mixture sampling: like [[mixtureSample]] but domains
    * whose target share EXCEEDS their natural share UPSAMPLE by
    * repetition — the "N epochs of the small high-quality domain"
    * pattern every real mixture uses (capped at `maxEpochs`; repeating
    * data past a few epochs hurts). Each kept row carries an `epoch`
    * index: rate r yields floor(r) full copies plus one more for the
    * hash-selected frac(r) of keys — deterministic by key, so re-runs
    * and backfills produce identical copies.
    *
    * Scale: the domain histogram is ONE aggregate; the expansion is a
    * map-side broadcast join + `explode(sequence(...))` — output rows
    * are exactly the repetition budget, nothing about the corpus
    * shuffles. */
  def mixtureSampleEpochs(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokenCountCol: String,
      weights: Map[String, Double],
      budget: Double,
      maxEpochs: Int = 4,
      salt: String = ""): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.groupBy(col(domainCol)).agg(
      sum(col(tokenCountCol)).cast(DoubleType).as("tok")).collect()
    val total = hist.map(_.getDouble(1)).sum
    val tokOf = hist.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val spec = weights.toSeq.map { case (d, w) =>
      val tok = tokOf.getOrElse(d, 0.0)
      val rate =
        if (tok <= 0) 0.0 else math.min(maxEpochs.toDouble, budget * w * total / tok)
      val full = math.floor(rate).toInt
      (d, full, Sampling.hexThreshold(rate - full))
    }.toDF(domainCol, "_full", "_thr")
    df.join(broadcast(spec), Seq(domainCol))
      .withColumn("_extra",
        when(substring(md5(concat(lit(salt), col(idCol).cast(StringType))), 1, 4)
          < col("_thr"), 1).otherwise(0))
      .withColumn("_n", col("_full") + col("_extra"))
      .filter(col("_n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_n").cast(LongType) - 1L)))
      .drop("_full", "_thr", "_extra", "_n")
  }

  /** Exact ROC-AUC of a score column against boolean labels — the
    * calibration gate a quality classifier passes BEFORE it filters
    * 100 TB (ship a filter with AUC 0.55 and the corpus it keeps is
    * barely better than random). Tie-corrected Mann-Whitney form:
    *
    *   AUC = [Σ_s pos_s · (negBelow_s + neg_s/2)] / (nPos · nNeg)
    *
    * Determinism is engineered: the numerator is accumulated as the
    * INTEGER 2U = Σ pos_s·(2·negBelow_s + neg_s) — a long sum, exact in
    * any aggregation order on any engine — and divides once at the end.
    *
    * Scale design: one hash aggregate groups by exact score (output ≤
    * #distinct scores), then negBelow is a DISTRIBUTED prefix sum in
    * score order — the same value-bucketed machinery as
    * [[quantileBuckets]]/[[budgetSelect]]: approx-quantile cut points
    * bucket by VALUE, one windowed cumsum per bucket, broadcast bucket
    * offsets. No global single-partition window at any size. */
  def classifierAuc(
      df: DataFrame,
      scoreCol: String,
      isPositive: Column,
      numBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nB =
      if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val g = df.select(
      col(scoreCol).cast(DoubleType).as("s"),
      when(isPositive, 1L).otherwise(0L).as("p"))
      .groupBy("s")
      .agg(sum("p").as("pos"), (count(lit(1)) - sum("p")).as("neg"))
    val qs = (1 until nB).map(_.toDouble / nB).toArray
    val bounds =
      if (qs.isEmpty) Array.empty[Double]
      else g.stat.approxQuantile("s", qs, 0.01)
    val vbucket =
      if (bounds.isEmpty) lit(0)
      else boundsBucket(bounds.toSeq, col("s"), above = false)
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("vb").orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val parted = g.withColumn("vb", vbucket).repartition(nB, col("vb"))
    val local = parted
      .withColumn("neg_below_local", coalesce(sum("neg").over(wLocal), lit(0L)))
    val totals = parted.groupBy("vb").agg(sum("neg").as("bneg"))
    val ow = org.apache.spark.sql.expressions.Window.orderBy("vb")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum("bneg").over(ow), lit(0L)))
      .select("vb", "off")
    local.join(broadcast(offsets), "vb")
      .agg(
        sum(col("pos") * (lit(2L) * (col("neg_below_local") + col("off")) + col("neg")))
          .as("u2"),
        sum("pos").as("np"), sum("neg").as("nn"))
      .select(
        round(col("u2").cast(DoubleType) /
          (lit(2.0) * col("np") * col("nn")), 6).as("auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }
}
