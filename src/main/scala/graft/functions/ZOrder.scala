package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) curve values for multi-dimensional clustering.
  *
  * Each dimension is linearly scaled into `63 / n` bits using its global
  * min/max (one metadata-cheap agg pass), then the bit planes are
  * interleaved round-robin — rows close on the curve are close in EVERY
  * dimension, so file min/max bounds stay tight on all of them and
  * file-level pruning works for predicates on any clustered column
  * (a linear sort gives that only for its leading column).
  *
  * Built entirely from codegen'd column expressions (shift/and/or) — no
  * UDF, stays inside whole-stage codegen. */
object ZOrder {

  /** numeric/date/timestamp column as a double for scaling */
  private def asDouble(c: Column, dt: DataType): Column = dt match {
    case DateType => unix_date(c).cast(DoubleType)
    case TimestampType | TimestampNTZType =>
      unix_micros(c.cast(TimestampType)).cast(DoubleType)
    case _: NumericType => c.cast(DoubleType)
    case other => sys.error(s"zorder: unsupported column type $other")
  }

  /** z-value column over `cols` given their (min,max) ranges as doubles */
  def zvalue(cols: Seq[(Column, DataType, (Double, Double))]): Column = {
    val n = cols.size
    require(n >= 2 && n <= 8, s"zorder needs 2..8 columns, got $n")
    val bits = 63 / n
    val maxVal = (1L << bits) - 1
    val scaled: Seq[Column] = cols.map { case (c, dt, (lo, hi)) =>
      val d = asDouble(c, dt)
      val range = math.max(hi - lo, Double.MinPositiveValue)
      // nulls cluster at 0
      val frac = coalesce((d - lit(lo)) / lit(range), lit(0.0))
      val clamped = least(greatest(frac, lit(0.0)), lit(1.0))
      (clamped * lit(maxVal.toDouble)).cast(LongType)
    }
    // interleave: bit b of dim i lands at position b*n + i
    val planes = for {
      b <- 0 until bits
      (s, i) <- scaled.zipWithIndex
    } yield shiftleft(shiftrightunsigned(s, b).bitwiseAND(lit(1L)), b * n + i)
    planes.reduce(_.bitwiseOR(_))
  }

  /** each column linearly scaled into a [0, 2^bits-1] long grid cell —
    * the shared front half of both space-filling curves (Morton here,
    * [[Hilbert]] for the locality-preserving variant). Ranges fold from
    * `precomputed` (metadata-only) when given, else one min/max agg
    * pass; nulls land in cell 0, out-of-range values clamp. */
  private[functions] def scaledCoords(
      df: DataFrame,
      colNames: Seq[String],
      bits: Int,
      precomputed: Option[Seq[(Double, Double)]]): Seq[Column] = {
    val types = colNames.map(n => df.schema(n).dataType)
    val ranges = precomputed.getOrElse {
      val aggs = colNames.zip(types).flatMap { case (n, dt) =>
        Seq(min(asDouble(col(n), dt)), max(asDouble(col(n), dt)))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      colNames.indices.map { i =>
        val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
        val hi = if (row.isNullAt(2 * i + 1)) 1.0 else row.getDouble(2 * i + 1)
        (lo, hi)
      }
    }
    val maxVal = (1L << bits) - 1
    colNames.zip(types).zip(ranges).map { case ((n, dt), (lo, hi)) =>
      val d = asDouble(col(n), dt)
      val range = math.max(hi - lo, Double.MinPositiveValue)
      val frac = coalesce((d - lit(lo)) / lit(range), lit(0.0))
      val clamped = least(greatest(frac, lit(0.0)), lit(1.0))
      (clamped * lit(maxVal.toDouble)).cast(LongType)
    }
  }

  /** append a `_z` column computed from `colNames`. Ranges come from
    * `precomputed` when given (metadata-only — e.g. folded from manifest
    * bounds, no data scanned) and otherwise from one min/max agg pass
    * over `df`. Out-of-range values clamp to the curve's ends, so a
    * slightly stale precomputed range only affects clustering quality,
    * never row content. */
  def withZColumn(
      df: DataFrame,
      colNames: Seq[String],
      zCol: String = "_z",
      precomputed: Option[Seq[(Double, Double)]] = None): DataFrame = {
    val n = colNames.size
    require(n >= 2 && n <= 8, s"zorder needs 2..8 columns, got $n")
    val bits = 63 / n
    val scaled = scaledCoords(df, colNames, bits, precomputed)
    val planes = for {
      b <- 0 until bits
      (s, i) <- scaled.zipWithIndex
    } yield shiftleft(shiftrightunsigned(s, b).bitwiseAND(lit(1L)), b * n + i)
    df.withColumn(zCol, planes.reduce(_.bitwiseOR(_)))
  }
}
