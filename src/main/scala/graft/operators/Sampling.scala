package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Sampling decisions hash the ROW KEY (md5 of the key string), never a
  * random number: the same row is picked on every run, on every engine,
  * regardless of partitioning — so a sample is reproducible across
  * backfills and a pipeline can be re-run incrementally without churn.
  * The hex-prefix comparison (`substr(md5(key), 1, 4) < threshold`)
  * evaluates identically in any engine with md5 (Spark, DuckDB, Trino),
  * which is what makes these operators oracle-checkable.
  *
  * Scale: both operators are map-only filters — no shuffle, fully
  * codegen'd (`md5`/`substring`/comparison are built-ins), and they
  * combine with filter pushdown on whatever follows. The stratified
  * variant adds one BROADCAST join against the tiny strata table.
  */
object Sampling {

  /** 4-hex-digit md5-prefix threshold approximating `fraction` with
    * 1/65536 granularity ("g" sorts after every hex digit, so >= 1.0
    * keeps everything). */
  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0, s"fraction must be >= 0, got $fraction")
    val bucket = math.round(fraction * 65536).toInt
    // 65536 would format as the 5-char "10000", which compares BELOW most
    // 4-char prefixes lexicographically and silently inverts a ~1.0
    // sample into ~6% — saturate to keep-all instead
    if (fraction >= 1.0 || bucket >= 65536) "g"
    else f"$bucket%04x"
  }

  private def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast(StringType))), 1, 4)

  /** Keep ~`fraction` of rows, chosen by key hash. `salt` derives
    * independent samples from the same keys (e.g. train/eval splits). */
  def hashSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < lit(hexThreshold(fraction)))

  /** EXACT-k per-stratum sample: the k rows with the smallest
    * `(md5(salt:key), key)` per stratum — eval-set construction where
    * sizes must be exact, not expected (a rate-based sample of a small
    * stratum can land anywhere around its target). Deterministic and
    * engine-portable like every sampler here: the chosen rows are a pure
    * function of the keys.
    *
    * Scale design: a single `row_number() OVER (PARTITION BY stratum)`
    * would funnel each stratum through ONE task — a skew bottleneck when
    * one stratum holds half the corpus. Instead two bounded stages: (1)
    * per (stratum, salt-shard) local top-k — each shard's candidate set
    * is ≤ k rows; (2) top-k over the ≤ shards×k survivors per stratum.
    * Stage-2 input is k-bounded, so the per-stratum window is safe at
    * any corpus size. Result identical to the one-window form: the k
    * global smallest are each smallest within their shard. */
  def stratifiedSampleExact(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      k: Int,
      salt: String = "",
      shards: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(salt), col(keyCol).cast(StringType)))
    val keyed = df.withColumn("__graft_h", h)
      .withColumn("__graft_shard", pmod(hash(col(keyCol)), lit(shards)))
    val w1 = Window.partitionBy(col(stratumCol), col("__graft_shard"))
      .orderBy(col("__graft_h"), col(keyCol))
    val w2 = Window.partitionBy(col(stratumCol))
      .orderBy(col("__graft_h"), col(keyCol))
    keyed
      .withColumn("__graft_r1", row_number().over(w1))
      .filter(col("__graft_r1") <= k)
      .withColumn("__graft_r2", row_number().over(w2))
      .filter(col("__graft_r2") <= k)
      .drop("__graft_h", "__graft_shard", "__graft_r1", "__graft_r2")
  }

  /** Per-stratum sampling rates (the "data mix" operator: e.g. keep 10%
    * of web text but 100% of books). Strata absent from `fractions` fall
    * back to `defaultFraction`. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thr = fractions.toSeq
      .map { case (k, f) => (k, hexThreshold(f)) }
      .toDF(stratumCol, "__graft_thr")
    df.join(broadcast(thr), Seq(stratumCol), "left")
      .withColumn("__graft_thr",
        coalesce(col("__graft_thr"), lit(hexThreshold(defaultFraction))))
      .filter(hashBucket(col(keyCol), salt) < col("__graft_thr"))
      .drop("__graft_thr")
  }

  /** Weight-proportional (Poisson) sampling: row i kept with probability
    * `min(1, fraction · w_i · N / ΣW)` — inclusion proportional to its
    * weight, expected kept ≈ `fraction · N` absent clipping. The
    * "sample by quality score / token count" primitive between uniform
    * hash sampling and the per-domain mixture rates: a row twice as
    * heavy is twice as likely to survive, deterministically.
    *
    * Scale + exactness: ONE one-row aggregate (ΣW, N) broadcast back —
    * nothing about the corpus shuffles, no driver collect. Weights
    * should be integer-valued (token counts, quantized scores) so ΣW
    * aggregates exactly in any order; the per-row rate renders to a
    * 16-bit threshold compared as a 4-hex string against the md5 key
    * prefix — the same quantization every sampler here uses, so engines
    * agree bit-for-bit. Zero/negative weights never survive. */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction > 0.0, s"fraction must be > 0, got $fraction")
    val totals = df.agg(
      sum(col(weightCol)).cast(DoubleType).as("__graft_W"),
      count(lit(1)).cast(DoubleType).as("__graft_N"))
    val rate = least(
      lit(1.0),
      lit(fraction) * col(weightCol).cast(DoubleType) *
        col("__graft_N") / col("__graft_W"))
    val bucket = round(rate * 65536).cast(LongType)
    val thr = when(rate >= 1.0 || bucket >= lit(65536L), lit("g"))
      .otherwise(format_string("%04x", bucket))
    df.crossJoin(broadcast(totals))
      .filter(col(weightCol) > 0 && hashBucket(col(keyCol), salt) < thr)
      .drop("__graft_W", "__graft_N")
  }

  /** Deterministic dataset split: each row gets a split label from the
    * cumulative `fractions` intervals of its 16-bit key hash — the
    * train/val/test assignment every pipeline needs, reproducible from
    * keys alone (new rows never reshuffle old assignments, unlike
    * `randomSplit`). Map-only, no shuffle, no state. Fractions must sum
    * to ≤ 1; any remainder falls in the LAST split (so (0.8, 0.1, 0.1)
    * and (0.8, 0.1) with a tail both cover every row). */
  def splitAssign(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = ""): DataFrame =
    df.withColumn("split", cutLabel(col(keyCol), splits, salt))

  /** split label from the cumulative hash cuts of `key`; the last split
    * absorbs the tail */
  private def cutLabel(
      key: Column, splits: Seq[(String, Double)], salt: String): Column = {
    require(splits.nonEmpty, "at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val thresholds = cuts.map(hexThreshold)
    val h = hashBucket(key, salt)
    splits.init.zip(thresholds.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, ((name, _), cut)) =>
        when(h < lit(cut), lit(name)).otherwise(acc)
      }
  }

  /** Leakage-FREE dataset split: near-duplicate CLUSTERS land wholly in
    * one split. A plain hash split assigns each copy of a near-dup pair
    * independently, so ~2·p·(1−p) of duplicate mass straddles the
    * train/test boundary — the classic eval-contamination bug. Here
    * every document takes the split of its connected COMPONENT's
    * representative (min id over any near-dup pair list — LSH,
    * containment, embedding — via pointer-jumping components), so two
    * near-duplicates can never land in different splits; documents in
    * no pair key on their own id as before.
    *
    * Scale: components are O(log n) rounds of narrow (id, label)
    * shuffles; the assignment is ONE left join against the (bounded by
    * paired-doc count) component table + the map-only cut. */
  def splitAssignLeakFree(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      splits: Seq[(String, Double)],
      salt: String = ""): DataFrame =
    splitAssignByComponents(df, idCol,
      Dedup.connectedComponents(pairs, aCol, bCol), splits, salt)

  /** same leak-free cut keyed on PRECOMPUTED `(doc_id, component)` labels
    * (e.g. [[Dedup.textComponents]], whose exact-duplicate pre-collapse
    * keeps the pair stage linear on copy-heavy corpora) */
  def splitAssignByComponents(
      df: DataFrame,
      idCol: String,
      comps: DataFrame,
      splits: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    val c = comps
      .select(col("doc_id").as("__graft_cid"), col("component").as("__graft_comp"))
    df.join(c, col(idCol) === col("__graft_cid"), "left")
      .withColumn("split",
        cutLabel(coalesce(col("__graft_comp"), col(idCol)), splits, salt))
      .drop("__graft_cid", "__graft_comp")
  }

  /** DoReMi-style ITERATIVE mixture reweighting (multiplicative
    * weights over domains; Xie et al. 2023, "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining"): domains whose
    * EXCESS signal is positive get geometrically upweighted over
    * `iters` rounds, then the final mixture smooths toward uniform.
    * In DoReMi the excess signal is the proxy model's per-domain
    * excess LOSS vs a reference model; here the deterministic stand-in
    * is each domain's mean-utility DEFICIT vs the corpus mean
    * (`max(0, globalMean - domainMean)`, normalized by the global
    * mean) — the caller supplies any non-negative integral per-row
    * `utilityCol`, and a real deployment plugs per-domain eval losses
    * into the same update by swapping that aggregate.
    *
    * Everything runs in 2^20 FIXED-POINT Long arithmetic with the
    * linear multiplicative-weights form `w *= 1 + eta * excess`
    * (a standard Hedge variant) — no transcendental functions, no
    * double accumulation order — so the whole iteration is
    * bit-identical in any engine with integral division and replays
    * exactly in the DuckDB oracle. Scale: the corpus is touched ONCE
    * (one domain-keyed aggregate of `utilityCol`); every iteration
    * runs over the DOMAIN table (rows = distinct domains, e.g. 20),
    * whose totals broadcast — at 100 TB the iterations cost nothing.
    *
    * Output per domain: `n_docs`, `mean_utility` (integral),
    * `excess_fp` (2^20-scaled), `weight_fp` (2^20-scaled, sums to
    * ~2^20) and `weight` (`weight_fp / 2^20` — exact, a power-of-two
    * division). */
  def doremiWeights(
      df: DataFrame,
      domainCol: String,
      utilityCol: String,
      iters: Int = 5,
      etaFp: Long = 262144L,   // eta = 0.25 in 2^20 fixed point
      smoothFp: Long = 16384L  // 1/64 uniform smoothing mass
  ): DataFrame = {
    require(iters >= 0 && etaFp >= 0 && smoothFp >= 0 && smoothFp <= 1048576L,
      s"bad iters=$iters etaFp=$etaFp smoothFp=$smoothFp")
    val dom = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col(utilityCol)).cast(LongType).as("__su"))
    val tot = dom.agg(sum("n_docs").as("__tn"), sum("__su").as("__ts"),
      count(lit(1)).cast(LongType).as("__kk"))
    var w = dom.crossJoin(broadcast(tot))
      .selectExpr(domainCol, "n_docs", "__kk",
        "__su div n_docs AS mean_utility", "__ts div __tn AS __g")
      .selectExpr(domainCol, "n_docs", "__kk", "mean_utility",
        "greatest(__g - mean_utility, 0L) * 1048576L div greatest(__g, 1L) AS excess_fp")
      .selectExpr(domainCol, "n_docs", "__kk", "mean_utility", "excess_fp",
        "1048576L div __kk AS weight_fp")
    for (_ <- 1 until iters + 1) {
      val raw = w.selectExpr(domainCol, "n_docs", "__kk", "mean_utility",
        "excess_fp",
        s"weight_fp * (1048576L + ($etaFp" + "L * excess_fp div 1048576L)) " +
          "div 1048576L AS __raw")
      val sraw = raw.agg(sum("__raw").as("__sraw"))
      w = raw.crossJoin(broadcast(sraw))
        .selectExpr(domainCol, "n_docs", "__kk", "mean_utility", "excess_fp",
          "__raw * 1048576L div __sraw AS weight_fp")
    }
    w.selectExpr(domainCol, "n_docs", "mean_utility", "excess_fp",
        s"weight_fp * (1048576L - ${smoothFp}L) div 1048576L + " +
          s"${smoothFp}L div __kk AS weight_fp")
      .withColumn("weight", col("weight_fp").cast(DoubleType) / 1048576d)
  }
}
