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

  /** @param points    one row per point; `pointTs` timestamp column
    * @param intervals one row per interval; `[startCol, endCol]` closed
    * @param keys      equi-join columns present on BOTH sides (may be
    *                  empty for a pure time join — skew warning applies)
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
      maxBucketsPerInterval: Int = 64): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
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

    val short = iv
      .filter(col("_be") - col("_bs") < maxBucketsPerInterval)
      .withColumn("_rb", explode(sequence(col("_bs"), col("_be"))))
      .drop("_bs", "_be")
    val joinedShort = p
      .join(short, (keys :+ "_rb").toSeq, "inner")
      .filter(between)
      .select(outCols: _*)

    // outlier intervals: broadcast instead of exploding. Bounded by
    // construction — when most intervals are near the bucket width, the
    // tail past maxBuckets is a handful of rows.
    val long = iv
      .filter(col("_be") - col("_bs") >= maxBucketsPerInterval)
      .drop("_bs", "_be")
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
}
