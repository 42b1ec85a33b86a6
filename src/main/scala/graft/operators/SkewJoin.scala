package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware joins for the cases AQE's skew handling can't reach (e.g.
  * a single hot key joining a non-broadcastable table).
  *
  * `salted` splits every hot left-side key into `saltFactor` sub-keys and
  * replicates the matching right-side rows across all sub-keys, so one hot
  * key's rows spread over `saltFactor` tasks instead of one straggler.
  * Cost: right side is duplicated xsaltFactor — use for moderate fan-out
  * (16-64) on the smaller side of the join. At 100 TB this is the standard
  * remedy when a power-law key distribution defeats hash partitioning. */
object SkewJoin {

  def salted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    val l = left.withColumn("_salt", pmod(
      // deterministic per-row spread: hash the whole row, not rand()
      hash(left.columns.map(col): _*), lit(saltFactor)))
    val r = right.withColumn("_salt", explode(
      sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
