package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types._

import graft.tables._

/** Metadata-only aggregation: COUNT(*) / COUNT(col) / MIN(col) / MAX(col)
  * answered exactly from manifest statistics (record counts, value/null/nan
  * counts, lower/upper bounds) without opening a single data file.
  *
  * The reference tracks the same per-file statistics in its manifests
  * (icelake/src/types/in_memory.rs:1722-1848) but never exploits them for
  * query answering; at 100 TB this turns `SELECT count(*), max(ts) FROM t`
  * from a full scan into a pure driver-side manifest read.
  *
  * Exactness rules (any violation falls back to a normal scan):
  *  - no delete files in the snapshot (row-level deletes invalidate counts
  *    and may invalidate bounds);
  *  - COUNT(col) needs value+null counts on every data file;
  *  - MIN/MAX only for types whose written bounds are exact — string and
  *    binary bounds are truncated prefixes (TableWrite truncates to 16 code
  *    points), so they are never used; float/double bounds are trusted only
  *    because parquet-mr omits chunk min/max entirely when a NaN was
  *    written (verified empirically; TableWrite:124-127 additionally drops
  *    NaN bounds at harvest), so bounds-present implies NaN-free — a
  *    recorded NaN count > 0 still vetoes, and a file without bounds must
  *    be provably all-null;
  *  - a file missing a bound must be provably all-null for that column
  *    (value count == null count), otherwise the answer is unknown.
  */
object StatsAggregate {

  /** Answer `agg` from the planned files' manifest stats: result schema +
    * the single result row, or None when any aggregate cannot be answered
    * exactly. */
  def tryCompute(
      agg: Aggregation,
      planned: Seq[PlannedFile],
      schema: IceSchema): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    if (planned.exists(_.file.content != DataContent.Data)) return None
    val data = planned.map(_.file)
    val outs: Seq[Option[(StructField, Any)]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("agg_count_star", LongType, nullable = false),
          java.lang.Long.valueOf(data.map(_.recordCount).sum)))
      case c: Count if !c.isDistinct =>
        fieldOf(c.column, schema).flatMap { f =>
          val perFile = data.map { df =>
            for {
              v <- df.valueCounts.get(f.id)
              n <- df.nullValueCounts.get(f.id)
            } yield v - n
          }
          if (perFile.exists(_.isEmpty)) None
          else Some((StructField(s"agg_count_${f.name}", LongType, nullable = false),
            java.lang.Long.valueOf(perFile.flatten.sum)))
        }
      case m: Min => boundAgg(m.column, schema, data, lower = true)
      case m: Max => boundAgg(m.column, schema, data, lower = false)
      case _ => None
    }
    if (outs.exists(_.isEmpty)) None
    else {
      val resolved = outs.flatten
      Some((StructType(resolved.map(_._1)),
        new GenericInternalRow(resolved.map(_._2).toArray)))
    }
  }

  private def fieldOf(
      e: org.apache.spark.sql.connector.expressions.Expression,
      schema: IceSchema): Option[IceField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      schema.findField(nr.fieldNames.head)
    case _ => None
  }

  /** bounds of these types are exact as written (see TableWrite): fixed
    * width, no truncation */
  private def exactBoundType(t: IceType): Boolean = t match {
    case IcePrim("boolean" | "int" | "long" | "date" | "time" |
        "timestamp" | "timestamptz" | "timestamp_ns" | "timestamptz_ns" |
        "float" | "double") => true
    case IceDecimal(_, _) => true
    case _ => false
  }

  private def boundAgg(
      colE: org.apache.spark.sql.connector.expressions.Expression,
      schema: IceSchema,
      data: Seq[IceDataFile],
      lower: Boolean): Option[(StructField, Any)] = {
    fieldOf(colE, schema).filter(f => exactBoundType(f.fieldType)).flatMap { f =>
      val t = f.fieldType
      val isFloat = t == IcePrim("float") || t == IcePrim("double")
      val bounds = if (lower) (df: IceDataFile) => df.lowerBounds
      else (df: IceDataFile) => df.upperBounds
      var ok = true
      var vals = List.empty[Any]
      data.foreach { df =>
        // NaN sorts above every value in Spark's MIN/MAX but is excluded
        // from bounds; a NaN-carrying file has NO bounds (parquet-mr omits
        // them), which the missing-bound branch below rejects unless the
        // file is all-null. An explicitly recorded NaN count > 0 vetoes.
        if (isFloat && df.nanValueCounts.get(f.id).exists(_ > 0L)) ok = false
        else bounds(df).get(f.id) match {
          case Some(b) => vals ::= SingleValue.decode(t, b)
          case None =>
            // a file without the bound only drops out if it provably holds
            // no non-null value for the column
            val allNull = for {
              v <- df.valueCounts.get(f.id)
              n <- df.nullValueCounts.get(f.id)
            } yield v == n
            if (!allNull.contains(true)) ok = false
        }
      }
      if (!ok) None
      else {
        val sparkT = SchemaConvert.toSparkType(t)
        val best =
          if (vals.isEmpty) null
          else vals.reduce { (a, b) =>
            val c = cmpExact(a, b)
            if ((lower && c <= 0) || (!lower && c >= 0)) a else b
          }
        val name = s"agg_${if (lower) "min" else "max"}_${f.name}"
        Some((StructField(name, sparkT, nullable = true), toCatalyst(best, sparkT)))
      }
    }
  }

  /** exact comparison for the decoded bound values of exactBoundType */
  private def cmpExact(a: Any, b: Any): Int = (a, b) match {
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case (x: java.lang.Float, y: java.lang.Float) => java.lang.Float.compare(x, y)
    case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.compare(x, y)
    case (x: Number, y: Number) => java.lang.Long.compare(x.longValue, y.longValue)
    case _ => 0
  }

  private def toCatalyst(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (bd: java.math.BigDecimal, dt: DecimalType) =>
      Decimal(bd, dt.precision, dt.scale)
    case (other, _) => other
  }
}
