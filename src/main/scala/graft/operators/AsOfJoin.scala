package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, attach the most recent
  * right row with the same key whose time is <= the left row's time.
  *
  * Implementation is the union + carry-forward pattern, not a range join:
  * tag both sides, sort within each key by (time, side), and carry the
  * last-seen right payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding window. One shuffle on the key, linear in rows —
  * at 100 TB this avoids the quadratic blowup of a naive
  * `right.ts <= left.ts` range join and needs no AQE skew rescue for
  * dense keys. */
object AsOfJoin {

  /** `right`'s non-key/non-time columns arrive prefixed with `rightPrefix`.
    * Right rows at exactly the left timestamp match (inclusive). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightPrefix: String = "r_"): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != time)
    val leftCols = left.columns

    val taggedLeft = left
      .withColumn("_side", lit(1))
      .withColumns(rightPayload.map(c => s"$rightPrefix$c" -> lit(null)).toMap)
    val taggedRight = right
      .select(
        Seq(col(key), col(time)) ++
          rightPayload.map(c => col(c).as(s"$rightPrefix$c")): _*)
      .withColumn("_side", lit(0))
      .withColumns(leftCols.filter(c => c != key && c != time)
        .map(c => c -> lit(null)).toMap)

    // right rows sort before left rows at equal timestamps (inclusive asof)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(taggedLeft.unionByName(taggedRight)) {
      case (df, c) =>
        df.withColumn(s"$rightPrefix$c",
          last(col(s"$rightPrefix$c"), ignoreNulls = true).over(w))
    }
    // also carry the right-side event time for inspection
    val withRightTime = carried
      .withColumn("_rtime", when(col("_side") === 0, col(time)))
      .withColumn(s"${rightPrefix}$time",
        last(col("_rtime"), ignoreNulls = true).over(w))
      .drop("_rtime")
    withRightTime
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
