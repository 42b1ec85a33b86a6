package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — `point.ts BETWEEN interval.start AND
  * interval.end` with optional equi-keys. Spark plans a naive BETWEEN
  * join as broadcast-nested-loop (or a cartesian without a broadcastable
  * side): quadratic at corpus scale. Here time is bucketized at a fixed
  * width: each point lands in exactly ONE bucket, each interval explodes
  * to the buckets it covers, and the join becomes a plain hash join on
  * (keys, bucket) with an exact BETWEEN post-filter. A pair can match in
  * only one bucket (the point's), so no dedup step exists.
  *
  * Scale design: the shuffle carries (keys, bucket) hash keys — never a
  * cross product. Interval explosion is bounded by
  * `maxBucketsPerInterval`; outlier intervals longer than that (rare by
  * construction when the width is chosen near the typical interval
  * length) take a broadcast fallback path instead of exploding, so one
  * year-long interval cannot fan out 10^5 bucket rows. Pick
  * `bucketSeconds` close to the typical interval duration: each interval
  * then covers ~2 buckets.
  */
object RangeJoin {

  /** The broadcast fallback must stay BOUNDED: on an adversarial
    * distribution (many always-on intervals) every span is an "outlier"
    * and the fallback becomes an unbounded broadcast + nested-loop join.
    * This guard counts the outlier side (early-exit `limit(cap+1)` scan);
    * past the cap the caller WIDENS `bucketSeconds` ×8 and retries — wide
    * buckets turn the outliers back into explodable spans (predictable
    * degradation: more candidates per bucket, exact post-filter keeps
    * correctness) — and after `widenAttempts` it fails with instructions
    * rather than OOM the driver. */
  private def tooManyLong(longSide: DataFrame, cap: Long): Boolean = {
    // limit() takes an Int — clamp so a huge caller-supplied cap cannot
    // overflow into a negative limit
    val probe = math.min(cap + 1, Int.MaxValue.toLong).toInt
    longSide.limit(probe).count() > cap
  }

  /** Outlier-broadcast cap: spans per broadcast build side. ~100k rows of
    * (keys, start, end) is well under Spark's broadcast limits. */
  val DefaultMaxBroadcastRows: Long = 100000L

  /** @param points    one row per point; `pointTs` timestamp column
    * @param intervals one row per interval; `[startCol, endCol]` closed;
    *                  INVERTED spans (start > end) are treated as empty
    *                  and dropped, never matched
    * @param keys      equi-join columns present on BOTH sides (may be
    *                  empty for a pure time join — skew warning applies);
    *                  all NON-key column names must be disjoint between
    *                  the two sides
    * @return points ⋈ intervals (keys once, then point columns, then
    *         non-key interval columns) */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketSeconds: Long,
      maxBucketsPerInterval: Int = 64,
      maxBroadcastRows: Long = DefaultMaxBroadcastRows,
      widenAttempts: Int = 3): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    require(points.columns.intersect(intervals.columns).forall(keys.contains),
      "pointInInterval: non-key column names must be disjoint between points and " +
        s"intervals (shared: ${points.columns.intersect(intervals.columns).filterNot(keys.contains).mkString(",")})")
    val w = bucketSeconds * 1000000L // micros per bucket

    val outCols: Seq[Column] =
      keys.map(col) ++
        points.columns.filterNot(keys.contains).map(col) ++
        intervals.columns.filterNot(keys.contains).map(col)
    val between = col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol)

    val p = points.withColumn("_rb", floor(unix_micros(col(pointTs)) / w))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_bs", floor(unix_micros(col(startCol)) / w))
      .withColumn("_be", floor(unix_micros(col(endCol)) / w))

    // outlier intervals broadcast instead of exploding — bounded by
    // construction when the width is near the typical span, but GUARDED
    // here: past the cap, widen the bucket ×8 and retry (every widening
    // shrinks _be-_bs for every span, so the recursion terminates)
    val longPre = iv.filter(col("_be") - col("_bs") >= maxBucketsPerInterval)
    if (tooManyLong(longPre, maxBroadcastRows)) {
      if (widenAttempts <= 0) throw new IllegalStateException(
        s"pointInInterval: more than $maxBroadcastRows intervals span >= " +
          s"$maxBucketsPerInterval buckets even after widening to " +
          s"$bucketSeconds s buckets — raise bucketSeconds or maxBucketsPerInterval")
      return pointInInterval(points, intervals, keys, pointTs, startCol, endCol,
        bucketSeconds * 8, maxBucketsPerInterval, maxBroadcastRows, widenAttempts - 1)
    }

    val short = iv
      .filter(col("_be") - col("_bs") < maxBucketsPerInterval)
      .withColumn("_rb", explode(sequence(col("_bs"), col("_be"))))
      .drop("_bs", "_be")
    val joinedShort = p
      .join(short, (keys :+ "_rb").toSeq, "inner")
      .filter(between)
      .select(outCols: _*)

    val long = longPre.drop("_bs", "_be")
    val a = p.drop("_rb").as("_rjl")
    val b = long.as("_rjr")
    val keyCond = keys
      .map(k => col(s"_rjl.$k") === col(s"_rjr.$k"))
      .foldLeft(
        col(s"_rjl.$pointTs") >= col(s"_rjr.$startCol") &&
          col(s"_rjl.$pointTs") <= col(s"_rjr.$endCol"))(_ && _)
    val joinedLong = a.join(broadcast(b), keyCond, "inner")
      .select(
        (keys.map(k => col(s"_rjl.$k")) ++
          points.columns.filterNot(keys.contains).map(c => col(s"_rjl.$c")) ++
          intervals.columns.filterNot(keys.contains).map(c => col(s"_rjr.$c"))): _*)

    joinedShort.unionByName(joinedLong)
  }

  /** Interval-OVERLAP join — pairs whose closed spans intersect
    * (`lStart <= rEnd && rStart <= lEnd`) with optional equi-keys; the
    * range×range sibling of [[pointInInterval]] (session-vs-session
    * overlap, campaign-vs-outage attribution, co-occurrence windows).
    * The naive form is again a nested-loop/cartesian.
    *
    * Same bucketization, plus a DEDUP-FREE emission rule: a matching
    * pair is emitted only in the bucket of the LATER start —
    * `max(lStart, rStart)` lies inside both spans whenever they overlap,
    * so that bucket is covered by both sides and is unique per pair (no
    * distinct stage over the join output). Long outliers on either side
    * take the broadcast fallback; long×long pairs ride the left-long
    * branch only, so nothing double-emits.
    *
    * INVERTED spans (start > end) are treated as empty intervals and
    * dropped — they never match, even though the naive closed-span
    * predicate `lStart <= rEnd && rStart <= lEnd` can nominally hold for
    * them. Non-key column names must be disjoint between the sides. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketSeconds: Long,
      maxBucketsPerInterval: Int = 64,
      maxBroadcastRows: Long = DefaultMaxBroadcastRows,
      widenAttempts: Int = 3): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    require(left.columns.intersect(right.columns).forall(keys.contains),
      "intervalOverlap: non-key column names must be disjoint between left and " +
        s"right (shared: ${left.columns.intersect(right.columns).filterNot(keys.contains).mkString(",")})")
    val w = bucketSeconds * 1000000L // micros per bucket

    val outCols: Seq[Column] =
      keys.map(col) ++
        left.columns.filterNot(keys.contains).map(col) ++
        right.columns.filterNot(keys.contains).map(col)
    val overlap = col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)

    def spans(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s) <= col(e))
      .withColumn("_bs", floor(unix_micros(col(s)) / w))
      .withColumn("_be", floor(unix_micros(col(e)) / w))
    def short(df: DataFrame): DataFrame = df
      .filter(col("_be") - col("_bs") < maxBucketsPerInterval)
      .withColumn("_rb", explode(sequence(col("_bs"), col("_be"))))
      .drop("_bs", "_be")
    def long(df: DataFrame): DataFrame = df
      .filter(col("_be") - col("_bs") >= maxBucketsPerInterval)
      .drop("_bs", "_be")

    val l = spans(left, lStart, lEnd)
    val r = spans(right, rStart, rEnd)

    // broadcast-fallback guard (see tooManyLong): both build sides must
    // stay under the cap or the buckets widen and the whole join retries
    if (tooManyLong(long(l), maxBroadcastRows) ||
        tooManyLong(long(r), maxBroadcastRows)) {
      if (widenAttempts <= 0) throw new IllegalStateException(
        s"intervalOverlap: more than $maxBroadcastRows spans cover >= " +
          s"$maxBucketsPerInterval buckets even after widening to " +
          s"$bucketSeconds s buckets — raise bucketSeconds or maxBucketsPerInterval")
      return intervalOverlap(left, right, keys, lStart, lEnd, rStart, rEnd,
        bucketSeconds * 8, maxBucketsPerInterval, maxBroadcastRows, widenAttempts - 1)
    }

    // emitted only in the later-start bucket: inside both spans on
    // overlap, and unique per pair
    val canonical = col("_rb") === greatest(
      floor(unix_micros(col(lStart)) / w),
      floor(unix_micros(col(rStart)) / w))
    val joinedShort = short(l)
      .join(short(r), (keys :+ "_rb").toSeq, "inner")
      .filter(overlap && canonical)
      .select(outCols: _*)

    def broadcastSide(
        probe: DataFrame, build: DataFrame, buildIsRight: Boolean): DataFrame = {
      val a = probe.as("_ol")
      val b = build.as("_or")
      val (ls, le, rs, re) =
        if (buildIsRight) (s"_ol.$lStart", s"_ol.$lEnd", s"_or.$rStart", s"_or.$rEnd")
        else (s"_or.$lStart", s"_or.$lEnd", s"_ol.$rStart", s"_ol.$rEnd")
      val cond = keys
        .map(k => col(s"_ol.$k") === col(s"_or.$k"))
        .foldLeft(col(ls) <= col(re) && col(rs) <= col(le))(_ && _)
      val (lAlias, rAlias) = if (buildIsRight) ("_ol", "_or") else ("_or", "_ol")
      a.join(broadcast(b), cond, "inner").select(
        (keys.map(k => col(s"$lAlias.$k")) ++
          left.columns.filterNot(keys.contains).map(c => col(s"$lAlias.$c")) ++
          right.columns.filterNot(keys.contains).map(c => col(s"$rAlias.$c"))): _*)
    }

    // long right × SHORT left only (long-left × all-right covers
    // long×long exactly once)
    val lShortRows = l.filter(col("_be") - col("_bs") < maxBucketsPerInterval)
      .drop("_bs", "_be")
    val longRight = broadcastSide(lShortRows, long(r), buildIsRight = true)
    val longLeft = broadcastSide(r.drop("_bs", "_be"), long(l), buildIsRight = false)

    joinedShort.unionByName(longLeft).unionByName(longRight)
  }
}
