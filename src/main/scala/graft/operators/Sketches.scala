package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deterministic, cross-engine-reproducible sketches for corpus
  * governance at scale. At 100 TB the questions "how many distinct
  * tokens/shingles/urls?", "what are the heavy hitters?", "what is the
  * p99 doc length?" cannot be answered by exact global operators every
  * time — they are answered by one-pass, fixed-state, MERGEABLE
  * summaries. The catch with the usual library sketches
  * (HLL++/CountMinSketch objects) is that their answers depend on the
  * engine's private hashing, so no second system can verify a reported
  * number. Everything here is built from md5 + integer arithmetic only,
  * so ANY engine (DuckDB, Trino, a Python auditor) reproduces the exact
  * same estimate bit-for-bit from the same rows — sketches with the same
  * cross-site verifiability as the `corpus_checksum` manifest.
  *
  * No floating point anywhere: register sums use shifted powers of two
  * accumulated in DECIMAL(38,0) and the HLL bias constant is carried as
  * a rational (7213*m / (10000*m + 10790)), so each estimate is a single
  * exact integer division — partitioning- and order-invariant.
  */
object Sketches {

  /** HLL register index + rank for a hashed key, as pure column
    * expressions (codegen'd; no UDF). The md5 hex splits into a
    * pHex-hex-digit register address and a 15-hex (60-bit) tail;
    * rank = leading zero BITS of the tail + 1 (all-zero tail -> 61).
    * Leading zeros come from string ops — count leading '0' hex chars
    * (4 bits each), then the first nonzero hex digit contributes its
    * own 0-3 bits via a CASE — exactly replicable in any SQL engine.
    */
  def hllParts(key: Column, pHex: Int): (Column, Column) = {
    val h = md5(key)
    val bucket = conv(substring(h, 1, pHex), 16, 10).cast(LongType)
    val tail = substring(h, pHex + 1, 15) // 60 bits
    val zHex = length(regexp_extract(tail, "^(0*)", 1))
    val d = tail.substr((zHex + 1).cast("int"), lit(1))
    val digitZeros = when(d.isin("1"), 3)
      .when(d.isin("2", "3"), 2)
      .when(d.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rank = when(zHex === 15, lit(61))
      .otherwise(zHex * 4 + digitZeros + 1)
    (bucket, rank.cast(LongType))
  }

  /** Distinct-count estimate for `key` (any Column; cast to string
    * yourself for cross-engine byte identity). `pHex` is the register
    * address width in HEX DIGITS (m = 16^pHex registers); pHex=2 ->
    * m=256 -> ~6.5% standard error in ~2 KB of state. Returns ONE row:
    * (m, n_regs, hll_ndv).
    *
    * Plan shape: one map-only hash pass + one m-row-bounded aggregate +
    * one single-row reduce — registers are the only shuffle payload, and
    * the sketch merges across any partitioning for free (max commutes).
    * Raw HLL estimator only (no linear-counting branch, which would need
    * a float log): callers size m well below the expected NDV, which is
    * the regime the sketch exists for anyway.
    */
  def hllNdv(df: DataFrame, key: Column, pHex: Int = 2): DataFrame = {
    val (bucket, rank) = hllParts(key, pHex)
    hllEstimate(
      df.select(bucket.as("bucket"), rank.as("rank"))
        .groupBy("bucket").agg(max(col("rank")).as("mr")),
      pHex)
  }

  /** S-sum term over PRESENT registers: 2^(61-mr), shifted longs summed
    * in DECIMAL(38,0) — max total m * 2^61 ~ 1.5e23 for pHex=4, in
    * range. Absent registers contribute 2^61 each (added in estExpr).
    * Coalesced to 0 so an EMPTY register table (empty input) feeds the
    * estimator a definite sum instead of a null (estExpr then
    * special-cases n_regs=0 to an NDV of 0, matching the SQL replicas). */
  private def sPresentAgg: Column =
    coalesce(
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(61 - mr AS INT))" +
        " AS DECIMAL(38,0))")),
      lit(0).cast(DecimalType(38, 0))).as("s_present")

  /** E = floor(alpha_num * m^2 * 2^61 / (alpha_den * S)) over columns
    * `n_regs`/`s_present`; the numerator is the constant 7213*m^3*2^61
    * (~2.8e29 at m=256, inside DECIMAL(38,0)). An EMPTY register table
    * (n_regs = 0, i.e. empty input) short-circuits to 0 distinct — the
    * raw estimator would report its all-registers-absent floor
    * (~alpha*m, ~182 at m=256) — and the DuckDB replicas carry the same
    * CASE, so an empty corpus agrees cross-engine instead of diverging
    * on a coalesce the SQL side lacked. */
  private def estExpr(m: Long): Column = {
    val aDen = 10000L * m + 10790L
    val num = java.math.BigInteger.valueOf(7213L * m * m * m)
      .multiply(java.math.BigInteger.valueOf(2L).pow(61))
    expr(s"CAST(CASE WHEN n_regs = 0 THEN 0 ELSE " +
      s"CAST('$num' AS DECIMAL(38,0)) div " +
      s"(CAST($aDen AS DECIMAL(38,0)) * (s_present + " +
      s"CAST(${1L << 61} AS DECIMAL(38,0)) * ($m - n_regs))) END AS BIGINT)")
  }

  /** The estimator half of [[hllNdv]], over an already-aggregated
    * (bucket, mr) register table — the entry point when registers are
    * maintained elsewhere (e.g. a streaming `groupBy(bucket).max` whose
    * state IS the sketch, or registers merged across shards/sites by
    * max). Same one-row output. */
  def hllEstimate(regs: DataFrame, pHex: Int = 2): DataFrame = {
    require(pHex >= 1 && pHex <= 4, "pHex in 1..4 (m = 16^pHex)")
    val m = math.pow(16, pHex).toLong
    regs.agg(count(lit(1)).cast(LongType).as("n_regs"), sPresentAgg)
      .select(lit(m).as("m"), col("n_regs"), estExpr(m).as("hll_ndv"))
  }

  /** Grouped estimator over an already-aggregated (grpCol, bucket, mr)
    * register table — [[hllEstimate]] per group, for registers
    * maintained or merged elsewhere. A group with no registers yields
    * NO row (grouped-aggregate semantics, identical in any engine) —
    * unlike the global estimator's single n_regs=0 row. Returns
    * (grpCol, m, n_regs, hll_ndv). */
  def hllEstimateBy(regs: DataFrame, grpCol: String,
      pHex: Int = 2): DataFrame = {
    require(pHex >= 1 && pHex <= 4, "pHex in 1..4 (m = 16^pHex)")
    val m = math.pow(16, pHex).toLong
    regs.groupBy(grpCol)
      .agg(count(lit(1)).cast(LongType).as("n_regs"), sPresentAgg)
      .select(col(grpCol), lit(m).as("m"), col("n_regs"),
        estExpr(m).as("hll_ndv"))
  }

  /** GROUPED HLL: one register table per value of `grpCol`, from a
    * single (grp, bucket)-keyed aggregate — per-domain / per-language /
    * per-shard NDV in one corpus pass, state m rows per group. Returns
    * (grp, m, n_regs, hll_ndv), one row per group. */
  def hllNdvBy(df: DataFrame, key: Column, grpCol: String,
      pHex: Int = 2): DataFrame = {
    val (bucket, rank) = hllParts(key, pHex)
    hllEstimateBy(
      df.select(col(grpCol).as("grp"), bucket.as("bucket"), rank.as("rank"))
        .groupBy("grp", "bucket").agg(max(col("rank")).as("mr")),
      "grp", pHex)
  }

  /** Count-min sketch of `key` frequencies: `depth` independent
    * md5-salted hash rows x `width` cells, returned as (salt, cell, c).
    * One explode (depth x rows) + one (salt,cell)-keyed hash aggregate
    * with map-side partials; state is depth*width cells regardless of
    * corpus size, and two sketches of the same shape merge by cell-wise
    * addition (c sums commute) — the streaming/cross-shard property.
    */
  def countMin(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 16)
    df.select(posexplode(cmCells(key, depth, width)).as(Seq("salt", "cell")))
      .groupBy(col("salt").cast(LongType).as("salt"), col("cell"))
      .agg(count(lit(1)).cast(LongType).as("c"))
  }

  private def cmCells(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { i =>
      pmod(conv(substring(md5(concat(lit(i.toString), lit("|"), key)),
        1, 15), 16, 10).cast(LongType), lit(width.toLong))
    }: _*)

  /** Point-estimate lookup: for each probe row's `key`, the count-min
    * estimate = min over the `depth` cells it hashes to (always >= the
    * true count; collisions only inflate). `sketch` must come from
    * [[countMin]] with the same depth/width. The sketch side broadcasts
    * (depth*width rows), so probing is shuffle-free beyond the probe
    * set's own partitioning.
    */
  def cmEstimate(probes: DataFrame, key: Column, sketch: DataFrame,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val keep = probes.columns
    val exploded = probes.select(
      (keep.map(col) :+
        posexplode(cmCells(key, depth, width)).as(Seq("p_salt", "p_cell"))): _*)
    exploded
      .join(broadcast(sketch),
        exploded("p_salt").cast(LongType) === sketch("salt") &&
          exploded("p_cell") === sketch("cell"))
      .groupBy(keep.map(col): _*)
      .agg(min(col("c")).as("cm_est"))
  }

  /** EXACT order statistics without a global sort. For each permille q
    * in `permilles`, the value of `valueCol` at 1-indexed ascending rank
    * floor((n-1)*q/1000)+1. Plan shape: (1) one histogram aggregate over
    * value-buckets (`bucketWidth` units each — the only corpus-wide
    * pass); (2) cumulative counts over the BOUNDED bucket table (the
    * single-partition window runs over ~value_range/bucketWidth rows,
    * never the corpus); (3) only rows in the few buckets containing
    * target ranks are re-read and row_number'd within their bucket.
    * A naive ORDER BY quantile serializes 100 TB through a global sort;
    * this touches each row once plus a ~1/nBuckets targeted re-read.
    *
    * Ranks order by (value, tiebreak) ascending; the value at a global
    * rank is tie-order-invariant, so any engine verifies with a plain
    * row_number over a full sort. Returns (permille, rank, value).
    *
    * The driver-side bucket collect is ENFORCED bounded, not
    * conventionally: if the histogram occupies more than `maxBuckets`
    * buckets (a pathological valueCol — e.g. unix micros against a
    * 64-unit width), the width auto-widens x8 (re-aggregating the
    * ALREADY-BOUNDED cached histogram, never re-reading the corpus;
    * truncating division composes, so re-bucketing bucket ids equals
    * bucketing values at the wider width) until the collect fits.
    */
  def exactPermilles(df: DataFrame, valueCol: String, tieCol: String,
      permilles: Seq[Int], bucketWidth: Long = 64L,
      maxBuckets: Long = 1L << 18): DataFrame =
    exactPermillesFromHist(df, valueCol, tieCol,
      valueHistogram(df, valueCol, bucketWidth),
      permilles, bucketWidth, maxBuckets)

  /** The (b, bc) value-bucket histogram [[exactPermillesFromHist]]
    * consumes — exposed so the histogram can be MAINTAINED as persisted
    * state (a graft table merged by addition per batch) instead of
    * recomputed corpus-wide per quantile read. */
  def valueHistogram(df: DataFrame, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1)
    df.select(col(valueCol).cast(LongType).as("value"))
      .groupBy(expr(s"value div $bucketWidth").as("b"))
      .agg(count(lit(1)).as("bc"))
  }

  /** The permille read over a PRECOMPUTED histogram (same contract as
    * [[exactPermilles]], which passes a freshly aggregated one): `hist`
    * must be the (b, bc) table of `df`'s `valueCol` at `bucketWidth` —
    * e.g. an incrementally maintained histogram table whose counts were
    * merged by addition across batches. Only the targeted re-read
    * touches `df`, with pushable raw-value range filters. */
  def exactPermillesFromHist(df: DataFrame, valueCol: String,
      tieCol: String, hist0: DataFrame, permilles: Seq[Int],
      bucketWidth: Long = 64L, maxBuckets: Long = 1L << 18): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(q => q >= 0 && q <= 1000))
    require(bucketWidth >= 1 && maxBuckets >= 1)
    val base = df.select(
      col(valueCol).cast(LongType).as("value"),
      col(tieCol).as("tie"))
    // persisted so the auto-widening probe, the cumulative windows and
    // any coarsening all reuse one materialization
    val histRaw = hist0
      .select(col("b").cast(LongType).as("b"), col("bc").cast(LongType).as("bc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var effWidth = bucketWidth
    var hist = histRaw
    var occupied = hist.count()
    while (occupied > maxBuckets && effWidth < Long.MaxValue / 8) {
      effWidth = effWidth * 8
      hist = histRaw
        .groupBy(expr(s"b div ${effWidth / bucketWidth}").as("b"))
        .agg(sum(col("bc")).cast(LongType).as("bc"))
      occupied = hist.count()
    }
    val wb = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // cum counts AND the grand total ride the same bounded bucket frame
    // — n is never a second corpus action
    val cum = hist.select(col("b"), col("bc"),
      (sum(col("bc")).over(wb) - col("bc")).as("cum_before"),
      sum(col("bc")).over(wb).as("cum"))
      .withColumn("n", sum(col("bc")).over(wn))
    // BOUNDED collect (one row per OCCUPIED value bucket, <= maxBuckets
    // rows by the enforced widening above): materializing the cumulative
    // table in ONE job keeps the corpus at exactly TWO passes (histogram
    // job + targeted re-read) and lets the re-read carry literal filters
    // — see the pushable value-range form below
    val cumRows = cum.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    histRaw.unpersist(blocking = false)
    val n = cumRows.headOption.map(_._4).getOrElse(0L)
    val targets = permilles.distinct.flatMap { q =>
      val r = (n - 1) * q / 1000 + 1
      cumRows.filter { case (_, before, c, _) => before < r && r <= c }
        .map { case (b, before, _, _) => (q.toLong, b, r, before) }
    }
    val all = {
      val spark = df.sparkSession
      import spark.implicits._
      targets.toDF("permille", "b", "r", "cum_before")
    }
    val wantedBuckets = targets.map(_._2).distinct
    // redundant RAW-VALUE range filter alongside the semantic bucket
    // filter: the bucket id is a derived column no scan can push, but
    // the equivalent value ranges (div truncates toward zero, so
    // negative buckets flip their bounds) reach the parquet reader as
    // min/max row-group pruning — the piece that makes the targeted
    // re-read cheap at 100 TB
    val ranges = wantedBuckets.map { b =>
      // truncating div: bucket 0 spans BOTH signs (-(w-1) .. w-1)
      val lo = if (b > 0) b * effWidth else b * effWidth - (effWidth - 1)
      val hi = if (b < 0) b * effWidth else b * effWidth + (effWidth - 1)
      col("value").between(lo, hi)
    }
    val rangeFilter = ranges.reduceOption(_ || _).getOrElse(lit(false))
    val inBuckets = base
      .withColumn("b", expr(s"value div $effWidth"))
      .filter(rangeFilter && col("b").isin(wantedBuckets: _*))
    val wr = Window.partitionBy(col("b")).orderBy(col("value"), col("tie"))
    inBuckets.withColumn("lr", row_number().over(wr).cast(LongType))
      .join(broadcast(all), Seq("b"))
      .filter(col("lr") === col("r") - col("cum_before"))
      .select(col("permille"), col("r").as("rank"), col("value"))
  }

  /** Join-key skew advisor: per-key row counts with each key's share
    * (ppm, exact integer) and the salt factor a shuffle at
    * `parallelism` would need to spread that key across tasks
    * (ceil(cnt * parallelism / total) — 1 means no salting needed).
    * The governance read before any large join: keys with salt > 1
    * stall a hash-partitioned shuffle at that parallelism; feed them to
    * the salted-join path (see [[SkewJoin]]) or AQE skew handling.
    * One hash aggregate; the report is key-cardinality-bounded.
    */
  def skewAdvisor(df: DataFrame, keyCol: String,
      parallelism: Int = 32): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      // persisted: both the report rows and the grand total read this
      // aggregate — without it the corpus groupBy computes twice (the
      // frame is report-sized, so the cache holds exactly the output)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // total derives from the key-bounded counts — one corpus pass only
    val tot = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(tot)).select(
      col("key"),
      col("cnt").cast(LongType).as("cnt"),
      expr("CAST(cnt * 1000000 div total AS BIGINT)").as("share_ppm"),
      expr(s"CAST((cnt * $parallelism + total - 1) div total AS BIGINT)")
        .as("salt_factor"))
  }
}
