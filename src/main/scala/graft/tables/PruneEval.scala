package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._

/** File-level pruning: evaluate a pushed-down predicate against each data
  * file's partition tuple and column bounds, keeping files that MAY match.
  *
  * This generalizes the reference's exact-partition-equality filter
  * (icelake/src/io/scan.rs:120-122) with predicate→transform-predicate
  * derivation: monotone transforms (identity, truncate, year/month/day/
  * hour) admit range pruning; bucket admits equality pruning. At 100 TB
  * this is the difference between scanning one partition and all of them.
  */
object PruneEval {

  sealed trait Bound
  case class Range(lower: Option[Any], upper: Option[Any]) extends Bound

  /** derive the transform value of a literal for comparison against
    * partition values. Literal encodings: date=Int days, ts=Long micros. */
  private def applyTransform(
      transform: String,
      lit: Any,
      srcType: Option[IceType] = None): Option[Any] = {
    import graft.functions.TransformUtil
    val BucketRe = """bucket\[(\d+)\]""".r
    val TruncRe = """truncate\[(\d+)\]""".r
    transform match {
      case "identity" => Some(lit)
      case "year" | "month" | "day" | "hour" =>
        val nsSource = srcType.exists(t =>
          t == IcePrim("timestamp_ns") || t == IcePrim("timestamptz_ns"))
        val micros: Option[Long] = lit match {
          case i: Int => Some(i.toLong * 86400L * 1000000L) // date days
          // ns carriers hold nanos: exact floor to micros (1000 divides
          // every temporal unit width)
          case l: Long if nsSource => Some(Math.floorDiv(l, 1000L))
          case l: Long => Some(l) // timestamp micros
          case _ => None
        }
        micros.map { us =>
          val days = Math.floorDiv(us, 86400L * 1000000L).toInt
          transform match {
            case "day" => days
            case "hour" => Math.floorDiv(us, 3600L * 1000000L).toInt
            case "year" | "month" =>
              val d = java.time.LocalDate.ofEpochDay(days.toLong)
              if (transform == "year") d.getYear - 1970
              else (d.getYear - 1970) * 12 + d.getMonthValue - 1
          }
        }
      case TruncRe(w) => lit match {
        case i: Int => Some(TransformUtil.truncateInt(i, w.toInt))
        case l: Long => Some(TransformUtil.truncateLong(l, w.toLong))
        case s: String => Some(s.substring(0, math.min(s.length, w.toInt)))
        case d: java.math.BigDecimal =>
          // truncate acts on the unscaled value — rescale the literal to
          // the column's declared scale first
          srcType match {
            case Some(IceDecimal(_, s)) =>
              try Some(TransformUtil.truncateDecimal(
                org.apache.spark.sql.types.Decimal(d.setScale(s)), w.toInt)
                .toJavaBigDecimal)
              catch { case _: ArithmeticException => None }
            case _ => None
          }
        case _ => None
      }
      case BucketRe(n) => lit match {
        case i: Int => Some(TransformUtil.bucketInt(i, n.toInt))
        case l: Long => Some(TransformUtil.bucketLong(l, n.toInt))
        case s: String if srcType.contains(IcePrim("uuid")) =>
          try Some(TransformUtil.bucketUuid(
            org.apache.spark.unsafe.types.UTF8String.fromString(s), n.toInt))
          catch { case _: IllegalArgumentException => None }
        case s: String => Some(TransformUtil.bucketString(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), n.toInt))
        case d: java.math.BigDecimal =>
          // bucket hashes the UNSCALED value: the literal must be
          // rescaled to the column's declared scale first (1.1 vs
          // 1.1000000000 hash differently otherwise)
          srcType match {
            case Some(IceDecimal(p, s)) =>
              try Some(TransformUtil.bucketDecimal(
                org.apache.spark.sql.types.Decimal(d.setScale(s)), n.toInt))
              catch { case _: ArithmeticException => None }
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Number, y: Number) =>
      val (dx, dy) = (x.doubleValue, y.doubleValue)
      Some(java.lang.Double.compare(dx, dy))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** string timestamp literal -> epoch MICROS at full precision (a
    * millis-truncated literal would make strict '>'/'=' proofs unsound
    * for sub-millisecond timestamps, and is needlessly lossy even on the
    * conservative may-match side) */
  private def parseTimestampMicros(s: String): Any =
    try {
      val ld =
        if (s.length <= 10) java.time.LocalDate.parse(s).atStartOfDay()
        else java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      val inst = ld.toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    } catch { case _: Throwable => s }

  /** string timestamp literal -> epoch NANOS (v3 ns carriers) */
  private def parseTimestampNanos(s: String): Any =
    try {
      val ld =
        if (s.length <= 10) java.time.LocalDate.parse(s).atStartOfDay()
        else java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      val inst = ld.toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000000L + inst.getNano
    } catch { case _: Throwable => s }

  private def litValue(l: Literal): Any = l.value match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case other => other
  }

  /** column reference through resolution state and casts */
  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(u.name)
      case c: Cast => unapply(c.child)
      case _ => None
    }
  }

  /** May the file match the predicate? Conservative: unknown => true. */
  def mayMatch(
      expr: Expression,
      file: IceDataFile,
      spec: IcePartitionSpec,
      schema: IceSchema): Boolean = expr match {
    case And(l, r) => mayMatch(l, file, spec, schema) && mayMatch(r, file, spec, schema)
    case Or(l, r) => mayMatch(l, file, spec, schema) || mayMatch(r, file, spec, schema)
    case EqualTo(Attr(a), l: Literal) => mayCompare(a, litValue(l), file, spec, schema, "=")
    case EqualTo(l: Literal, Attr(a)) => mayCompare(a, litValue(l), file, spec, schema, "=")
    case LessThan(Attr(a), l: Literal) => mayCompare(a, litValue(l), file, spec, schema, "<")
    case LessThanOrEqual(Attr(a), l: Literal) => mayCompare(a, litValue(l), file, spec, schema, "<=")
    case GreaterThan(Attr(a), l: Literal) => mayCompare(a, litValue(l), file, spec, schema, ">")
    case GreaterThanOrEqual(Attr(a), l: Literal) => mayCompare(a, litValue(l), file, spec, schema, ">=")
    case LessThan(l: Literal, Attr(a)) => mayCompare(a, litValue(l), file, spec, schema, ">")
    case LessThanOrEqual(l: Literal, Attr(a)) => mayCompare(a, litValue(l), file, spec, schema, ">=")
    case GreaterThan(l: Literal, Attr(a)) => mayCompare(a, litValue(l), file, spec, schema, "<")
    case GreaterThanOrEqual(l: Literal, Attr(a)) => mayCompare(a, litValue(l), file, spec, schema, "<=")
    case In(Attr(a), lits) if lits.forall(_.isInstanceOf[Literal]) =>
      lits.exists(l => mayCompare(a, litValue(l.asInstanceOf[Literal]), file, spec, schema, "="))
    // the Column API arrives as unresolved function calls pre-analysis
    case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val name = uf.nameParts.last.toLowerCase
      val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=", "=" -> "=", "==" -> "=")
      val norm = Map("<" -> "<", "<=" -> "<=", ">" -> ">", ">=" -> ">=", "=" -> "=", "==" -> "=")
      (name, uf.arguments) match {
        case ("and", Seq(l, r)) =>
          mayMatch(l, file, spec, schema) && mayMatch(r, file, spec, schema)
        case ("or", Seq(l, r)) =>
          mayMatch(l, file, spec, schema) || mayMatch(r, file, spec, schema)
        case (op, Seq(Attr(a), l: Literal)) if norm.contains(op) =>
          mayCompare(a, litValue(l), file, spec, schema, norm(op))
        case (op, Seq(l: Literal, Attr(a))) if flip.contains(op) =>
          mayCompare(a, litValue(l), file, spec, schema, flip(op))
        case ("in", Attr(a) +: lits) if lits.forall(_.isInstanceOf[Literal]) =>
          lits.exists(l => mayCompare(a, litValue(l.asInstanceOf[Literal]), file, spec, schema, "="))
        case _ => true
      }
    case _ => true
  }

  /** range of possible transform-values for the file on the partition
    * field derived from `col`: identity partition value is exact */
  private def mayCompare(
      colName: String,
      lit0: Any,
      file: IceDataFile,
      spec: IcePartitionSpec,
      schema: IceSchema,
      op: String): Boolean = {
    val fieldId = schema.findField(colName).map(_.id)
    if (fieldId.isEmpty) return true
    val fid = fieldId.get
    // adapt string literals against temporal columns to their catalyst
    // encodings (date=epoch days Int, timestamp=epoch micros Long, UTC)
    val lit: Any = (lit0, schema.fieldById(fid).map(_.fieldType)) match {
      case (s: String, Some(IcePrim("date"))) =>
        try java.time.LocalDate.parse(s).toEpochDay.toInt catch { case _: Throwable => s }
      case (s: String, Some(IcePrim("timestamp")) | Some(IcePrim("timestamptz"))) =>
        parseTimestampMicros(s)
      case (s: String, Some(IcePrim("timestamp_ns")) | Some(IcePrim("timestamptz_ns"))) =>
        parseTimestampNanos(s)
      case _ => lit0
    }

    // 1) partition-transform pruning
    val partOk = spec.fields.zipWithIndex.forall { case (pf, idx) =>
      if (pf.sourceId != fid) true
      else {
        file.partition.lift(idx).flatten match {
          case None => true
          case Some(pv) =>
            applyTransform(pf.transform, lit, schema.fieldById(fid).map(_.fieldType)) match {
              case None => true
              case Some(tl) =>
                cmp(pv, tl) match {
                  case None => true
                  case Some(c) =>
                    val monotone = pf.transform == "identity" ||
                      pf.transform.startsWith("truncate") ||
                      Set("year", "month", "day", "hour").contains(pf.transform)
                    op match {
                      case "=" => c == 0
                      // pv is the file's single transform value; monotone
                      // transforms preserve order so e.g. col < lit requires
                      // t(col) <= t(lit)
                      case "<" | "<=" => if (monotone) c <= 0 else true
                      case ">" | ">=" => if (monotone) c >= 0 else true
                      case _ => true
                    }
                }
            }
        }
      }
    }
    if (!partOk) return false

    // 2) column-bounds pruning (min/max from the parquet footers)
    val fieldType = schema.fieldById(fid).map(_.fieldType)
    val lower = file.lowerBounds.get(fid).flatMap(b =>
      fieldType.map(t => SingleValue.decode(t, b)))
    val upper = file.upperBounds.get(fid).flatMap(b =>
      fieldType.map(t => SingleValue.decode(t, b)))
    op match {
      case "=" =>
        lower.flatMap(lo => cmp(lit, lo)).forall(_ >= 0) &&
          upper.flatMap(up => cmp(lit, up)).forall(_ <= 0)
      case "<" => lower.flatMap(lo => cmp(lo, lit)).forall(_ < 0)
      case "<=" => lower.flatMap(lo => cmp(lo, lit)).forall(_ <= 0)
      case ">" => upper.flatMap(up => cmp(up, lit)).forall(_ > 0)
      case ">=" => upper.flatMap(up => cmp(up, lit)).forall(_ >= 0)
      case _ => true
    }
  }

  /** total-order comparison for partition values (unknown pairs -> 0) */
  def compareValues(a: Any, b: Any): Int = cmp(a, b).getOrElse(0)

  /** Manifest-level pruning against the manifest list's per-partition-field
    * summaries — whole manifests are skipped before their Avro is read.
    * Interval logic over [lower, upper] per partition field; unknown
    * shapes keep the manifest. */
  def manifestMayMatch(
      expr: Expression,
      summaries: Seq[IceFieldSummary],
      spec: IcePartitionSpec,
      schema: IceSchema): Boolean = {
    if (summaries.isEmpty) return true

    def rangeCompare(colName: String, lit0: Any, op: String): Boolean = {
      val fid = schema.findField(colName).map(_.id).getOrElse(return true)
      val lit: Any = (lit0, schema.fieldById(fid).map(_.fieldType)) match {
        case (s: String, Some(IcePrim("date"))) =>
          try java.time.LocalDate.parse(s).toEpochDay.toInt catch { case _: Throwable => s }
        case (s: String, Some(IcePrim("timestamp")) | Some(IcePrim("timestamptz"))) =>
          parseTimestampMicros(s)
        case (s: String, Some(IcePrim("timestamp_ns")) | Some(IcePrim("timestamptz_ns"))) =>
          parseTimestampNanos(s)
        case _ => lit0
      }
      spec.fields.zipWithIndex.forall { case (pf, idx) =>
        if (pf.sourceId != fid) true
        else {
          val monotone = pf.transform == "identity" ||
            pf.transform.startsWith("truncate") ||
            Set("year", "month", "day", "hour").contains(pf.transform)
          val check = for {
            fsum <- summaries.lift(idx)
            loB <- fsum.lowerBound
            hiB <- fsum.upperBound
            src <- schema.fieldById(fid)
            t = SchemaConvert.transformResultType(pf.transform, src.fieldType)
            tl <- applyTransform(pf.transform, lit, Some(src.fieldType))
            lo = SingleValue.decode(t, loB)
            hi = SingleValue.decode(t, hiB)
            cLo <- cmp(lo, tl)
            cHi <- cmp(hi, tl)
          } yield op match {
            case "=" => cLo <= 0 && cHi >= 0 // lo <= t(lit) <= hi
            // for ranges, values below/above t(lit) may exist iff the
            // interval reaches that side (monotone transforms only)
            case "<" | "<=" => if (monotone) cLo <= 0 else true
            case ">" | ">=" => if (monotone) cHi >= 0 else true
            case _ => true
          }
          check.getOrElse(true)
        }
      }
    }

    def walk(e: Expression): Boolean = e match {
      case And(l, r) => walk(l) && walk(r)
      case Or(l, r) => walk(l) || walk(r)
      case EqualTo(Attr(a), l: Literal) => rangeCompare(a, litValue(l), "=")
      case EqualTo(l: Literal, Attr(a)) => rangeCompare(a, litValue(l), "=")
      case LessThan(Attr(a), l: Literal) => rangeCompare(a, litValue(l), "<")
      case LessThanOrEqual(Attr(a), l: Literal) => rangeCompare(a, litValue(l), "<=")
      case GreaterThan(Attr(a), l: Literal) => rangeCompare(a, litValue(l), ">")
      case GreaterThanOrEqual(Attr(a), l: Literal) => rangeCompare(a, litValue(l), ">=")
      case In(Attr(a), lits) if lits.forall(_.isInstanceOf[Literal]) =>
        lits.exists(l => rangeCompare(a, litValue(l.asInstanceOf[Literal]), "="))
      case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=", "=" -> "=", "==" -> "=")
        val norm = Map("<" -> "<", "<=" -> "<=", ">" -> ">", ">=" -> ">=", "=" -> "=", "==" -> "=")
        (uf.nameParts.last.toLowerCase, uf.arguments) match {
          case ("and", Seq(l, r)) => walk(l) && walk(r)
          case ("or", Seq(l, r)) => walk(l) || walk(r)
          case (op, Seq(Attr(a), l: Literal)) if norm.contains(op) =>
            rangeCompare(a, litValue(l), norm(op))
          case (op, Seq(l: Literal, Attr(a))) if flip.contains(op) =>
            rangeCompare(a, litValue(l), flip(op))
          case _ => true
        }
      case _ => true
    }
    walk(expr)
  }

  def prune(
      files: Seq[(IceDataFile, Long)],
      filter: Option[Column],
      spec: IcePartitionSpec,
      schema: IceSchema): Seq[(IceDataFile, Long)] =
    filter match {
      case None => files
      case Some(c) =>
        val expr = GraftBridge.catalystExpression(c)
        files.filter { case (f, _) => mayMatch(expr, f, spec, schema) }
    }

  /** Per-file pruning with each file's OWN partition spec (metadata can
    * hold several specs; interpreting an old-spec tuple against the
    * default spec can wrongly prune files). */
  def prunePlanned(
      files: Seq[PlannedFile],
      filter: Option[Column],
      metadata: TableMetadata,
      schema: IceSchema): Seq[PlannedFile] =
    filter match {
      case None => files
      case Some(c) =>
        val expr = GraftBridge.catalystExpression(c)
        files.filter(p => mayMatch(expr, p.file, metadata.specById(p.specId), schema))
    }

  /** Does EVERY row of the file satisfy the predicate? (The role of
    * Iceberg's StrictMetricsEvaluator.) Sound in the other direction from
    * [[mayMatch]]: unknown ⇒ FALSE. A strictly-matching file can be
    * deleted as pure metadata — no read, no delete-file write. Null
    * semantics: a row where the predicate is NULL is not a match, so
    * bounds-based proofs additionally require a recorded null count of 0
    * (an identity partition value is exempt — a non-null tuple value
    * already proves the column constant and non-null file-wide). String
    * bounds may be truncated (lower ≤ min, upper ≥ max), which only
    * weakens proofs, never falsifies them. */
  def strictMatch(
      expr: Expression,
      file: IceDataFile,
      spec: IcePartitionSpec,
      schema: IceSchema): Boolean = expr match {
    case And(l, r) =>
      strictMatch(l, file, spec, schema) && strictMatch(r, file, spec, schema)
    case Or(l, r) =>
      strictMatch(l, file, spec, schema) || strictMatch(r, file, spec, schema)
    case EqualTo(Attr(a), l: Literal) => strictCompare(a, litValue(l), file, spec, schema, "=")
    case EqualTo(l: Literal, Attr(a)) => strictCompare(a, litValue(l), file, spec, schema, "=")
    case LessThan(Attr(a), l: Literal) => strictCompare(a, litValue(l), file, spec, schema, "<")
    case LessThanOrEqual(Attr(a), l: Literal) => strictCompare(a, litValue(l), file, spec, schema, "<=")
    case GreaterThan(Attr(a), l: Literal) => strictCompare(a, litValue(l), file, spec, schema, ">")
    case GreaterThanOrEqual(Attr(a), l: Literal) => strictCompare(a, litValue(l), file, spec, schema, ">=")
    case LessThan(l: Literal, Attr(a)) => strictCompare(a, litValue(l), file, spec, schema, ">")
    case LessThanOrEqual(l: Literal, Attr(a)) => strictCompare(a, litValue(l), file, spec, schema, ">=")
    case GreaterThan(l: Literal, Attr(a)) => strictCompare(a, litValue(l), file, spec, schema, "<")
    case GreaterThanOrEqual(l: Literal, Attr(a)) => strictCompare(a, litValue(l), file, spec, schema, "<=")
    case In(Attr(a), lits) if lits.forall(_.isInstanceOf[Literal]) =>
      lits.exists(l =>
        strictCompare(a, litValue(l.asInstanceOf[Literal]), file, spec, schema, "="))
    case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val name = uf.nameParts.last.toLowerCase
      val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=", "=" -> "=", "==" -> "=")
      val norm = Map("<" -> "<", "<=" -> "<=", ">" -> ">", ">=" -> ">=", "=" -> "=", "==" -> "=")
      (name, uf.arguments) match {
        case ("and", Seq(l, r)) =>
          strictMatch(l, file, spec, schema) && strictMatch(r, file, spec, schema)
        case ("or", Seq(l, r)) =>
          strictMatch(l, file, spec, schema) || strictMatch(r, file, spec, schema)
        case (op, Seq(Attr(a), l: Literal)) if norm.contains(op) =>
          strictCompare(a, litValue(l), file, spec, schema, norm(op))
        case (op, Seq(l: Literal, Attr(a))) if flip.contains(op) =>
          strictCompare(a, litValue(l), file, spec, schema, flip(op))
        case ("in", Attr(a) +: lits) if lits.forall(_.isInstanceOf[Literal]) =>
          lits.exists(l =>
            strictCompare(a, litValue(l.asInstanceOf[Literal]), file, spec, schema, "="))
        case _ => false
      }
    case _ => false
  }

  /** exact comparison for the STRICT side: `cmp`'s double widening is
    * fine for may-match (a spurious equality only keeps a file), but a
    * strict proof must not equate longs differing past 2^53 */
  private def cmpExact(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => Some(java.lang.Long.compare(x, y))
    case (x: java.lang.Integer, y: java.lang.Long) => Some(java.lang.Long.compare(x.longValue, y))
    case (x: java.lang.Long, y: java.lang.Integer) => Some(java.lang.Long.compare(x, y.longValue))
    // decimals must compare at full unscaled precision — doubleValue
    // equates distinct decimal(38,0) ids beyond 2^53, which would let
    // strict '=' wrongly prove a full-file match and metadata-delete
    // non-matching rows
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => Some(x.compareTo(y))
    case (x: java.math.BigDecimal, y: Number) =>
      Some(x.compareTo(new java.math.BigDecimal(y.toString)))
    case (x: Number, y: java.math.BigDecimal) =>
      Some(new java.math.BigDecimal(x.toString).compareTo(y))
    case _ => cmp(a, b)
  }

  private def strictCompare(
      colName: String,
      lit0: Any,
      file: IceDataFile,
      spec: IcePartitionSpec,
      schema: IceSchema,
      op: String): Boolean = {
    val fid = schema.findField(colName).map(_.id).getOrElse(return false)
    val lit: Any = (lit0, schema.fieldById(fid).map(_.fieldType)) match {
      case (s: String, Some(IcePrim("date"))) =>
        try java.time.LocalDate.parse(s).toEpochDay.toInt catch { case _: Throwable => s }
      case (s: String, Some(IcePrim("timestamp")) | Some(IcePrim("timestamptz"))) =>
        parseTimestampMicros(s)
      case (s: String, Some(IcePrim("timestamp_ns")) | Some(IcePrim("timestamptz_ns"))) =>
        parseTimestampNanos(s)
      case _ => lit0
    }
    def decide(c: Int): Boolean = op match {
      case "=" => c == 0
      case "<" => c < 0
      case "<=" => c <= 0
      case ">" => c > 0
      case ">=" => c >= 0
      case _ => false
    }
    // identity partition value: column constant (and non-null) file-wide
    val identityPv = spec.fields.zipWithIndex.collectFirst {
      case (pf, idx) if pf.sourceId == fid && pf.transform == "identity" &&
        file.partition.lift(idx).flatten.isDefined =>
        file.partition(idx).get
    }
    identityPv.flatMap(pv => cmpExact(pv, lit)).map(decide).getOrElse {
      val fieldType = schema.fieldById(fid).map(_.fieldType)
      // bounds proof: needs a recorded zero null count, and — because
      // NaN-containing files still get NaN-excluding bounds (parquet
      // footer harvest / Avro inline stats both drop NaN per the spec)
      // — float/double additionally need a recorded ZERO NaN count;
      // missing counts are unsafe (Iceberg's StrictMetricsEvaluator
      // returns ROWS_MIGHT_NOT_MATCH there). Without this a file whose
      // NaN rows match no predicate could be strictly "proved" and
      // dropped whole — silent data loss.
      val floatLike = fieldType.exists {
        case IcePrim("float") | IcePrim("double") => true
        case _ => false
      }
      if (!file.nullValueCounts.get(fid).contains(0L)) false
      else if (floatLike && !file.nanValueCounts.get(fid).contains(0L)) false
      else {
        val lower = file.lowerBounds.get(fid).flatMap(b =>
          fieldType.map(t => SingleValue.decode(t, b)))
        val upper = file.upperBounds.get(fid).flatMap(b =>
          fieldType.map(t => SingleValue.decode(t, b)))
        op match {
          case "=" =>
            lower.flatMap(lo => cmpExact(lo, lit)).contains(0) &&
              upper.flatMap(up => cmpExact(up, lit)).contains(0)
          case "<" => upper.flatMap(up => cmpExact(up, lit)).exists(_ < 0)
          case "<=" => upper.flatMap(up => cmpExact(up, lit)).exists(_ <= 0)
          case ">" => lower.flatMap(lo => cmpExact(lo, lit)).exists(_ > 0)
          case ">=" => lower.flatMap(lo => cmpExact(lo, lit)).exists(_ >= 0)
          case _ => false
        }
      }
    }
  }

  /** files of which EVERY row matches `filter` (metadata-only deletable) */
  def strictlyMatching(
      files: Seq[PlannedFile],
      filter: Column,
      metadata: TableMetadata,
      schema: IceSchema): Seq[PlannedFile] = {
    val expr = GraftBridge.catalystExpression(filter)
    files.filter(p => strictMatch(expr, p.file, metadata.specById(p.specId), schema))
  }
}
