package graft.tables

import org.apache.spark.sql.types._

/** Iceberg schema <-> Spark StructType. Field ids ride in StructField
  * metadata under `parquet.field.id` (the same trick the reference plays
  * for Arrow, icelake/src/types/arrow/to_arrow.rs:18,37-45), so Spark's
  * parquet writer stamps them into files when
  * `spark.sql.parquet.fieldId.write.enabled` is set. */
object SchemaConvert {

  val FieldIdKey = "parquet.field.id"

  /** marks Iceberg types that have no Spark equivalent on their carrier
    * StructField (`time` -> long micros, `uuid` -> canonical string,
    * `fixed[N]` -> binary), so round-trips preserve the logical type —
    * SURVEY §1.3's hard point */
  val GraftTypeKey = "graft.type"

  private val FixedRe = """fixed\[(\d+)\]""".r

  def toSparkType(t: IceType): DataType = t match {
    case IcePrim("boolean") => BooleanType
    case IcePrim("int") => IntegerType
    case IcePrim("long") => LongType
    case IcePrim("float") => FloatType
    case IcePrim("double") => DoubleType
    case IcePrim("date") => DateType
    case IcePrim("time") => LongType // micros since midnight; no Spark type
    case IcePrim("timestamp") => TimestampNTZType
    case IcePrim("timestamptz") => TimestampType
    // Iceberg v3 nanosecond timestamps: Spark has no ns-precision
    // timestamp, so — like `time` — they ride a LongType carrier (nanos
    // since epoch, floorDiv semantics for negatives) flagged through
    // [[GraftTypeKey]]. Micros types would silently truncate; a long
    // carrier is lossless and keeps bounds/pruning exact.
    case IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") => LongType
    // v3 `unknown` — declare-now-type-later; always null, omitted from
    // data files. The Spark surface EXCLUDES these fields (toSparkSchema
    // maps visibleFields); NullType here only serves direct conversions.
    case IcePrim("unknown") => NullType
    case IcePrim("string") => StringType
    case IcePrim("uuid") => StringType
    case IcePrim("binary") => BinaryType
    // Iceberg v3 variant — semi-structured values; Spark's VariantType is
    // the same Parquet Variant encoding (metadata+value binaries), so the
    // physical layout matches the spec's unshredded representation
    case IcePrim("variant") => VariantType
    case IceDecimal(p, s) => DecimalType(p, s)
    case IceFixed(_) => BinaryType
    case IceStruct(fields) => StructType(fields.map(toSparkField))
    case IceList(_, e, req) => ArrayType(toSparkType(e), containsNull = !req)
    case IceMap(_, k, _, v, req) =>
      MapType(toSparkType(k), toSparkType(v), valueContainsNull = !req)
    case IcePrim(other) => sys.error(s"unsupported iceberg type: $other")
  }

  def toSparkField(f: IceField): StructField = {
    val mb = new MetadataBuilder().putLong(FieldIdKey, f.id.toLong)
    f.fieldType match {
      case IcePrim("time") | IcePrim("uuid") | IceFixed(_) |
          IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") =>
        mb.putString(GraftTypeKey, f.fieldType.repr)
      case _ =>
    }
    val sf = StructField(
      f.name,
      toSparkType(f.fieldType),
      nullable = !f.required,
      metadata = mb.build())
    f.doc.map(sf.withComment).getOrElse(sf)
  }

  def toSparkSchema(s: IceSchema): StructType =
    StructType(s.visibleFields.map(toSparkField))

  /** Spark -> Iceberg, assigning fresh sequential field ids (create-table
    * path). Nested ids get allocated after all top-level ids, spec-style. */
  def fromSparkSchema(schema: StructType): IceSchema = {
    var nextId = 0
    def alloc(): Int = { nextId += 1; nextId }
    def conv(dt: DataType): IceType = dt match {
      case BooleanType => IcePrim("boolean")
      case IntegerType | ShortType | ByteType => IcePrim("int")
      case LongType => IcePrim("long")
      case FloatType => IcePrim("float")
      case DoubleType => IcePrim("double")
      case DateType => IcePrim("date")
      case TimestampNTZType => IcePrim("timestamp")
      case TimestampType => IcePrim("timestamptz")
      case StringType => IcePrim("string")
      case BinaryType => IcePrim("binary")
      case VariantType => IcePrim("variant")
      case NullType => IcePrim("unknown")
      case d: DecimalType => IceDecimal(d.precision, d.scale)
      case ArrayType(e, containsNull) =>
        IceList(alloc(), conv(e), elementRequired = !containsNull)
      case MapType(k, v, valueContainsNull) =>
        IceMap(alloc(), conv(k), alloc(), conv(v), valueRequired = !valueContainsNull)
      case StructType(fields) =>
        IceStruct(fields.toList.map { f =>
          IceField(alloc(), f.name, required = !f.nullable, conv(f.dataType))
        })
      case other => sys.error(s"unsupported spark type for iceberg: $other")
    }
    // allocate top-level ids first (1..n), then nested; a graft.type
    // metadata flag overrides the carrier type (time/uuid/fixed)
    val top = schema.fields.map(f => (f, alloc()))
    val fields = top.toList.map { case (f, id) =>
      val flagged: Option[IceType] =
        if (f.metadata.contains(GraftTypeKey))
          f.metadata.getString(GraftTypeKey) match {
            case "time" => Some(IcePrim("time"))
            case "timestamp_ns" => Some(IcePrim("timestamp_ns"))
            case "timestamptz_ns" => Some(IcePrim("timestamptz_ns"))
            case "uuid" => Some(IcePrim("uuid"))
            case FixedRe(n) => Some(IceFixed(n.toInt))
            case _ => None
          }
        else None
      IceField(id, f.name, required = !f.nullable, flagged.getOrElse(conv(f.dataType)))
    }
    IceSchema(0, fields)
  }

  /** result type of a partition transform against a source field */
  def transformResultType(transform: String, source: IceType): IceType =
    transform match {
      case "identity" => source
      case "void" => source
      case t if t.startsWith("bucket") => IcePrim("int")
      case t if t.startsWith("truncate") => source
      case "year" | "month" | "day" | "hour" => IcePrim("int")
      case other => sys.error(s"unknown transform: $other")
    }
}

/** Iceberg single-value binary serialization (spec Appendix D; declared but
  * unimplemented in the reference, icelake/src/types/in_memory.rs:1794-1815)
  * — used for lower/upper bounds in manifests. */
object SingleValue {
  import java.nio.{ByteBuffer, ByteOrder}

  def encode(t: IceType, v: Any): Array[Byte] = t match {
    case IcePrim("boolean") => Array(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
    case IcePrim("int") | IcePrim("date") =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.asInstanceOf[Number].intValue).array
    case IcePrim("long") | IcePrim("time") | IcePrim("timestamp") | IcePrim("timestamptz") |
        IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v.asInstanceOf[Number].longValue).array
    case IcePrim("float") =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(v.asInstanceOf[Number].floatValue).array
    case IcePrim("double") =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v.asInstanceOf[Number].doubleValue).array
    case IcePrim("string") => v.toString.getBytes("UTF-8")
    case IcePrim("uuid") =>
      val u = java.util.UUID.fromString(v.toString)
      ByteBuffer.allocate(16) // big-endian per spec
        .putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array
    case IcePrim("binary") | IceFixed(_) => v.asInstanceOf[Array[Byte]]
    case IceDecimal(_, s) =>
      val bd = v match {
        case d: java.math.BigDecimal => d.setScale(s)
        case d: BigDecimal => d.underlying.setScale(s)
        case other => new java.math.BigDecimal(other.toString).setScale(s)
      }
      bd.unscaledValue.toByteArray
    case other => sys.error(s"single-value encode unsupported for $other")
  }

  def decode(t: IceType, bytes: Array[Byte]): Any = t match {
    case IcePrim("boolean") => bytes(0) != 0
    case IcePrim("int") | IcePrim("date") =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt
    // 4-byte tolerance on the 8-byte types: after type widening
    // (int -> long) the CURRENT schema says long, but manifests written
    // before the promotion carry 4-byte bounds — decode by buffer width
    // and promote (the same contract Iceberg's Conversions follows)
    case IcePrim("long") | IcePrim("time") | IcePrim("timestamp") | IcePrim("timestamptz") |
        IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") =>
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bytes.length == 4) bb.getInt.toLong else bb.getLong
    case IcePrim("float") => ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat
    case IcePrim("double") =>
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bytes.length == 4) bb.getFloat.toDouble else bb.getDouble
    case IcePrim("string") => new String(bytes, "UTF-8")
    case IcePrim("uuid") =>
      val bb = ByteBuffer.wrap(bytes)
      new java.util.UUID(bb.getLong, bb.getLong).toString
    case IcePrim("binary") | IceFixed(_) => bytes
    case IceDecimal(_, s) =>
      new java.math.BigDecimal(new java.math.BigInteger(bytes), s)
    case other => sys.error(s"single-value decode unsupported for $other")
  }
}
