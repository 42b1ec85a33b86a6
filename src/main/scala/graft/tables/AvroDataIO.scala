package graft.tables

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro DATA files (Iceberg spec: data files may be parquet, avro, or
  * orc — the reference reads parquet only; this closes the format gap for
  * the `write.format.default=avro` property surface).
  *
  * Follows the spec's Avro mapping (Iceberg spec, Appendix A): every
  * field carries a `field-id` property, optional fields are
  * `union[null, T]`, dates are `int/date`, timestamps `long/
  * timestamp-micros` with `adjust-to-utc`, decimals fixed-width
  * big-endian unscaled, uuid `fixed[16]/uuid`, lists carry `element-id`,
  * string-keyed maps are Avro maps with `key-id`/`value-id`.
  *
  * Readers resolve columns by FIELD ID first (rename-safe, the same
  * contract as the parquet path's `parquet.field.id` resolution) and by
  * name for foreign files without ids; int->long / float->double type
  * widening is applied in the value converters. Byte-range splits follow
  * Avro's sync-marker protocol (`DataFileReader.sync/pastSync`), so one
  * jumbo file fans out over many tasks exactly like parquet row groups.
  *
  * There is no Spark writer for this path (no spark-avro module in the
  * classpath budget), so the write side converts catalyst rows directly
  * and accumulates the per-file stats (record counts, null counts,
  * min/max bounds) INLINE during the write — Avro has no parquet-style
  * footer statistics to harvest afterwards. */
object AvroDataIO {

  val FieldIdProp = "field-id"

  // ---------------------------------------------------------------- schema

  /** minimum bytes for a decimal of precision p (spec fixed-width rule) */
  def decimalBytes(precision: Int): Int =
    math.ceil((math.log(math.pow(10, precision)) / math.log(2) + 1) / 8).toInt

  /** Avro schema for a data-file record over the given Iceberg fields.
    * All fields are written as nullable unions — file reads are always
    * nullable (the same stance the parquet factory takes). */
  def avroSchema(fields: Seq[IceField], recordName: String = "graft_data"): Schema = {
    val rec = Schema.createRecord(recordName, null, "graft", false)
    val avroFields = fields.map { f =>
      val t = avroType(f.fieldType, s"${recordName}_${f.name}")
      val union = Schema.createUnion(List(Schema.create(Schema.Type.NULL), t).asJava)
      val af = new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
      af.addProp(FieldIdProp, f.id: Integer)
      af
    }
    rec.setFields(avroFields.asJava)
    rec
  }

  private def avroType(t: IceType, name: String): Schema = t match {
    case IcePrim("boolean") => Schema.create(Schema.Type.BOOLEAN)
    case IcePrim("int") => Schema.create(Schema.Type.INT)
    case IcePrim("long") => Schema.create(Schema.Type.LONG)
    case IcePrim("float") => Schema.create(Schema.Type.FLOAT)
    case IcePrim("double") => Schema.create(Schema.Type.DOUBLE)
    case IcePrim("date") =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case IcePrim("time") =>
      LogicalTypes.timeMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case IcePrim("timestamp") =>
      val s = LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      s.addProp("adjust-to-utc", false: java.lang.Boolean)
      s
    case IcePrim("timestamptz") =>
      val s = LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      s.addProp("adjust-to-utc", true: java.lang.Boolean)
      s
    // v3 ns timestamps: the spec's Avro mapping is long + timestamp-nanos
    // with the adjust-to-utc marker distinguishing tz from local
    case IcePrim("timestamp_ns") =>
      val s = LogicalTypes.timestampNanos().addToSchema(Schema.create(Schema.Type.LONG))
      s.addProp("adjust-to-utc", false: java.lang.Boolean)
      s
    case IcePrim("timestamptz_ns") =>
      val s = LogicalTypes.timestampNanos().addToSchema(Schema.create(Schema.Type.LONG))
      s.addProp("adjust-to-utc", true: java.lang.Boolean)
      s
    case IcePrim("string") => Schema.create(Schema.Type.STRING)
    case IcePrim("uuid") =>
      LogicalTypes.uuid().addToSchema(Schema.createFixed(s"${name}_uuid", null, "graft", 16))
    case IcePrim("binary") => Schema.create(Schema.Type.BYTES)
    case IceFixed(n) => Schema.createFixed(s"${name}_fixed", null, "graft", n)
    case IceDecimal(p, s) =>
      LogicalTypes.decimal(p, s)
        .addToSchema(Schema.createFixed(s"${name}_dec", null, "graft", decimalBytes(p)))
    case IceStruct(fs) => avroSchema(fs, s"${name}_s")
    case IceList(eid, e, req) =>
      val et = avroType(e, s"${name}_e")
      val el = if (req) et
        else Schema.createUnion(List(Schema.create(Schema.Type.NULL), et).asJava)
      val arr = Schema.createArray(el)
      arr.addProp("element-id", eid: Integer)
      arr
    case IceMap(kid, IcePrim("string"), vid, v, req) =>
      val vt = avroType(v, s"${name}_v")
      val vl = if (req) vt
        else Schema.createUnion(List(Schema.create(Schema.Type.NULL), vt).asJava)
      val m = Schema.createMap(vl)
      m.addProp("key-id", kid: Integer)
      m.addProp("value-id", vid: Integer)
      m
    case IceMap(kid, k, vid, v, req) =>
      // non-string keys: array of key/value records (spec's k_v form)
      val kv = Schema.createRecord(s"${name}_kv", null, "graft", false)
      val kt = avroType(k, s"${name}_k")
      val vt0 = avroType(v, s"${name}_v")
      val vt = if (req) vt0
        else Schema.createUnion(List(Schema.create(Schema.Type.NULL), vt0).asJava)
      val kf = new Schema.Field("key", kt, null, null.asInstanceOf[Object])
      kf.addProp(FieldIdProp, kid: Integer)
      val vf = new Schema.Field("value", vt, null, null.asInstanceOf[Object])
      vf.addProp(FieldIdProp, vid: Integer)
      kv.setFields(List(kf, vf).asJava)
      val arr = Schema.createArray(kv)
      arr.addProp("logicalType", "map")
      arr
    case other => sys.error(s"avro data: unsupported iceberg type $other")
  }

  // ----------------------------------------------------------- write side

  /** catalyst value (by iceberg type) -> avro datum */
  private def toAvro(t: IceType, schema: Schema, v: Any): AnyRef = {
    if (v == null) return null
    val target = nonNull(schema)
    t match {
      case IcePrim("boolean") | IcePrim("int") | IcePrim("long") |
          IcePrim("float") | IcePrim("double") | IcePrim("date") |
          IcePrim("time") | IcePrim("timestamp") | IcePrim("timestamptz") |
          IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") =>
        v.asInstanceOf[AnyRef]
      case IcePrim("string") => v.toString
      case IcePrim("uuid") =>
        val u = java.util.UUID.fromString(v.toString)
        val bb = ByteBuffer.allocate(16)
        bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
        new GenericData.Fixed(target, bb.array)
      case IcePrim("binary") => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case IceFixed(_) => new GenericData.Fixed(target, v.asInstanceOf[Array[Byte]])
      case IceDecimal(p, s) =>
        val unscaled = v.asInstanceOf[Decimal].toJavaBigDecimal.setScale(s)
          .unscaledValue.toByteArray
        val size = decimalBytes(p)
        val out = new Array[Byte](size)
        // sign-extend into the fixed width (big-endian)
        val pad: Byte = if (unscaled.length > 0 && unscaled(0) < 0) -1 else 0
        java.util.Arrays.fill(out, pad)
        System.arraycopy(unscaled, 0, out, size - unscaled.length, unscaled.length)
        new GenericData.Fixed(target, out)
      case IceStruct(fs) =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(target)
        fs.zipWithIndex.foreach { case (f, i) =>
          val fv = if (row.isNullAt(i)) null
            else row.get(i, SchemaConvert.toSparkType(f.fieldType))
          rec.put(i, toAvro(f.fieldType, target.getFields.get(i).schema(), fv))
        }
        rec
      case IceList(_, e, _) =>
        val arr = v.asInstanceOf[ArrayData]
        val et = SchemaConvert.toSparkType(e)
        val out = new java.util.ArrayList[AnyRef](arr.numElements)
        var i = 0
        while (i < arr.numElements) {
          out.add(if (arr.isNullAt(i)) null
            else toAvro(e, target.getElementType, arr.get(i, et)))
          i += 1
        }
        out
      case IceMap(_, IcePrim("string"), _, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val vdt = SchemaConvert.toSparkType(vt)
        val out = new java.util.HashMap[String, AnyRef](m.numElements)
        var i = 0
        while (i < m.numElements) {
          val key = m.keyArray.getUTF8String(i).toString
          out.put(key, if (m.valueArray.isNullAt(i)) null
            else toAvro(vt, target.getValueType, m.valueArray.get(i, vdt)))
          i += 1
        }
        out
      case IceMap(_, kt, _, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val kdt = SchemaConvert.toSparkType(kt)
        val vdt = SchemaConvert.toSparkType(vt)
        val kvSchema = target.getElementType
        val out = new java.util.ArrayList[AnyRef](m.numElements)
        var i = 0
        while (i < m.numElements) {
          val rec = new GenericData.Record(kvSchema)
          rec.put(0, toAvro(kt, kvSchema.getFields.get(0).schema(), m.keyArray.get(i, kdt)))
          rec.put(1, if (m.valueArray.isNullAt(i)) null
            else toAvro(vt, kvSchema.getFields.get(1).schema(), m.valueArray.get(i, vdt)))
          out.add(rec)
          i += 1
        }
        out
      case other => sys.error(s"avro data write: unsupported type $other")
    }
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)

  /** One open Avro data file accepting catalyst rows; `ordinals(i)` is the
    * row ordinal feeding avro field i (lets the caller append partition
    * columns after the data columns). Tracks the manifest stats inline:
    * value/null counts for every top-level field, min/max bounds for the
    * primitive types the parquet harvest also bounds. */
  final class RowWriter(
      conf: Configuration,
      val path: String,
      fields: Seq[IceField],
      ordinals: Array[Int],
      codec: String,
      metrics: MetricsConfig = MetricsConfig.default) extends TableWrite.RowFileWriter {

    private val schema = avroSchema(fields)
    private val sparkTypes = fields.map(f => SchemaConvert.toSparkType(f.fieldType)).toArray
    private val fieldSchemas = schema.getFields.asScala.map(_.schema()).toArray
    private val out = {
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(codecOf(codec))
      w.create(schema, fs.create(p, false))
    }
    var records = 0L
    private val nulls = new Array[Long](fields.size)
    private val nans = new Array[Long](fields.size)
    private val mins = new Array[Any](fields.size)
    private val maxs = new Array[Any](fields.size)
    private val boundWanted: Array[Boolean] =
      fields.map(f => metrics.boundsTrunc(f.id).isDefined).toArray
    private val boundTrunc: Array[Option[Int]] =
      fields.map(f => metrics.boundsTrunc(f.id).flatten).toArray

    /** bound-trackable form of a value, null when the type is unbounded
      * here (same primitive set the parquet footer harvest bounds); NaN
      * must not taint float/double bounds (spec rule) */
    private def comparable(t: IceType, v: Any): Any = t match {
      case IcePrim("int") | IcePrim("date") => v
      case IcePrim("long") | IcePrim("time") | IcePrim("timestamp") | IcePrim("timestamptz") |
          IcePrim("timestamp_ns") | IcePrim("timestamptz_ns") => v
      case IcePrim("float") =>
        if (v.asInstanceOf[Float].isNaN) null else v
      case IcePrim("double") =>
        if (v.asInstanceOf[Double].isNaN) null else v
      case IcePrim("string") => v.asInstanceOf[UTF8String].toString
      case _ => null
    }

    private def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Int, y: Int) => Integer.compare(x, y)
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Float, y: Float) => java.lang.Float.compare(x, y)
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: String, y: String) => x.compareTo(y)
      case _ => 0
    }

    private def bound(i: Int, v: Any): Unit = {
      // NaN is excluded from bounds (spec rule) but MUST be counted:
      // strict metadata deletes refuse float/double bounds proofs unless
      // the file records a zero NaN count
      v match {
        case f: Float if f.isNaN => nans(i) += 1
        case d: Double if d.isNaN => nans(i) += 1
        case _ =>
      }
      if (!boundWanted(i)) return
      val c = comparable(fields(i).fieldType, v)
      if (c == null) return
      if (mins(i) == null) { mins(i) = c; maxs(i) = c }
      else {
        if (cmp(c, mins(i)) < 0) mins(i) = c
        if (cmp(c, maxs(i)) > 0) maxs(i) = c
      }
    }

    def write(row: InternalRow): Unit = {
      val rec = new GenericData.Record(schema)
      var i = 0
      while (i < ordinals.length) {
        val ord = ordinals(i)
        if (row.isNullAt(ord)) nulls(i) += 1
        else {
          val v = row.get(ord, sparkTypes(i))
          bound(i, v)
          rec.put(i, toAvro(fields(i).fieldType, fieldSchemas(i), v))
        }
        i += 1
      }
      out.append(rec)
      records += 1
    }

    /** close and return the harvested manifest stats */
    def close(): TableWrite.FileStats = {
      out.close()
      val p = new Path(path)
      val size = p.getFileSystem(conf).getFileStatus(p).getLen
      val ids = fields.map(_.id).toArray
      val lower = fields.indices.flatMap { i =>
        Option(mins(i)).flatMap(v =>
          TableWrite.encodeBoundValue(fields(i).fieldType, v, isUpper = false, boundTrunc(i))
            .map(ids(i) -> _))
      }.toMap
      val upper = fields.indices.flatMap { i =>
        Option(maxs(i)).flatMap(v =>
          TableWrite.encodeBoundValue(fields(i).fieldType, v, isUpper = true, boundTrunc(i))
            .map(ids(i) -> _))
      }.toMap
      // recorded for EVERY float/double field — an explicit zero is what
      // authorizes strict bounds proofs on these columns
      val nanCounts = fields.indices.collect {
        case i if (fields(i).fieldType == IcePrim("float") ||
          fields(i).fieldType == IcePrim("double")) &&
          metrics.keepCounts(ids(i)) => ids(i) -> nans(i)
      }.toMap
      val counted = fields.indices.filter(i => metrics.keepCounts(ids(i)))
      TableWrite.FileStats(
        GraftTable.normPathStr(path), records, size,
        columnSizes = Map.empty,
        valueCounts = counted.map(i => ids(i) -> records).toMap,
        nullCounts = counted.map(i => ids(i) -> nulls(i)).toMap,
        lowerBounds = lower, upperBounds = upper, splitOffsets = Nil,
        nanCounts = nanCounts)
    }

    def abort(): Unit = {
      try out.close() catch { case _: Throwable => }
      try {
        val p = new Path(path)
        p.getFileSystem(conf).delete(p, false)
      } catch { case _: Throwable => }
    }
  }

  def codecOf(name: String): CodecFactory = name match {
    case "uncompressed" | "none" => CodecFactory.nullCodec()
    case "deflate" | "gzip" => CodecFactory.deflateCodec(6)
    case "zstd" | "zstandard" => CodecFactory.zstandardCodec(3)
    case _ => CodecFactory.snappyCodec()
  }

  // ------------------------------------------------------------ read side

  /** avro datum -> catalyst value for the expected read field; applies
    * spec-legal widening (int->long, float->double) when the writer
    * schema is narrower than the read schema */
  private def fromAvro(dt: DataType, v: AnyRef): Any = {
    if (v == null) return null
    (dt, v) match {
      case (StringType, u: org.apache.avro.util.Utf8) => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
      case (StringType, f: GenericData.Fixed) =>
        // uuid fixed[16] -> canonical string carrier
        val bb = ByteBuffer.wrap(f.bytes)
        UTF8String.fromString(new java.util.UUID(bb.getLong, bb.getLong).toString)
      case (StringType, s) => UTF8String.fromString(s.toString)
      case (LongType, i: Integer) => i.longValue // widened int->long
      case (DoubleType, f: java.lang.Float) => f.doubleValue // widened
      case (BooleanType | IntegerType | LongType | FloatType | DoubleType |
          DateType | TimestampType | TimestampNTZType, x) => x
      case (BinaryType, bb: ByteBuffer) =>
        val arr = new Array[Byte](bb.remaining)
        bb.duplicate.get(arr)
        arr
      case (BinaryType, f: GenericData.Fixed) => f.bytes
      case (d: DecimalType, f: GenericData.Fixed) =>
        Decimal(new java.math.BigDecimal(new java.math.BigInteger(f.bytes), d.scale), d.precision, d.scale)
      case (d: DecimalType, bb: ByteBuffer) =>
        val arr = new Array[Byte](bb.remaining)
        bb.duplicate.get(arr)
        Decimal(new java.math.BigDecimal(new java.math.BigInteger(arr), d.scale), d.precision, d.scale)
      case (st: StructType, rec: GenericRecord) => recordToRow(st, rec)
      case (ArrayType(et, _), l: java.util.Collection[_]) =>
        // the spec's k_v map form arrives as an array of records too when
        // the read type is a map — handled in the MapType case
        new GenericArrayData(l.asScala.map(e => fromAvro(et, e.asInstanceOf[AnyRef])).toArray)
      case (MapType(kt, vt, _), m: java.util.Map[_, _]) =>
        val keys = new Array[Any](m.size)
        val vals = new Array[Any](m.size)
        var i = 0
        m.asScala.foreach { case (k, mv) =>
          keys(i) = fromAvro(kt, k.asInstanceOf[AnyRef])
          vals(i) = fromAvro(vt, mv.asInstanceOf[AnyRef])
          i += 1
        }
        ArrayBasedMapData(keys, vals)
      case (MapType(kt, vt, _), l: java.util.Collection[_]) =>
        val keys = new Array[Any](l.size)
        val vals = new Array[Any](l.size)
        var i = 0
        l.asScala.foreach { kv =>
          val rec = kv.asInstanceOf[GenericRecord]
          keys(i) = fromAvro(kt, rec.get(0))
          vals(i) = fromAvro(vt, rec.get(1))
          i += 1
        }
        ArrayBasedMapData(keys, vals)
      case (_, other) => other
    }
  }

  /** resolve each read field against the writer record schema: by the
    * field-id property first, by name second; unresolvable -> null */
  private def resolution(readFields: Array[(StructField, Int)], writer: Schema): Array[Int] =
    readFields.map { case (f, id) =>
      val byId =
        if (id < 0) None
        else writer.getFields.asScala.find { wf =>
          val p = wf.getObjectProp(FieldIdProp)
          p != null && p.asInstanceOf[Number].intValue == id
        }
      byId.orElse(Option(writer.getField(f.name))).map(_.pos).getOrElse(-1)
    }

  private def recordToRow(st: StructType, rec: GenericRecord): InternalRow = {
    // nested structs resolve by name (nested field-id props ride the
    // record fields too, but nested evolution resolves by name here)
    val out = new GenericInternalRow(st.fields.length)
    var i = 0
    while (i < st.fields.length) {
      val wf = rec.getSchema.getField(st.fields(i).name)
      out.update(i, if (wf == null) null else fromAvro(st.fields(i).dataType, rec.get(wf.pos)))
      i += 1
    }
    out
  }

  /** field-id of a read field (from the StructField metadata), -1 if none */
  def fieldIdOf(f: StructField): Int =
    if (f.metadata.contains(SchemaConvert.FieldIdKey))
      f.metadata.getLong(SchemaConvert.FieldIdKey).toInt
    else -1

  /** Iterator of catalyst rows over one byte range of one Avro file,
    * following the container sync protocol: start at the first block
    * after `start`, stop once past `start+length`. */
  def rows(
      conf: Configuration,
      path: String,
      readSchema: StructType,
      start: Long,
      length: Long): Iterator[InternalRow] with AutoCloseable = {
    val in = new FsInput(new Path(path), conf)
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    if (start > 0) reader.sync(start) else reader.sync(0)
    val end = start + length
    val readFields = readSchema.fields.map(f => (f, fieldIdOf(f)))
    val ords = resolution(readFields, reader.getSchema)
    new Iterator[InternalRow] with AutoCloseable {
      private var rec: GenericRecord = null
      private var closed = false
      override def hasNext: Boolean = {
        if (closed) return false
        val more = reader.hasNext && !reader.pastSync(end)
        if (!more) close() // exhaustion releases the stream (facade reads
        more                // never call close() explicitly)
      }
      override def next(): InternalRow = {
        rec = reader.next(rec)
        val out = new GenericInternalRow(readFields.length)
        var i = 0
        while (i < readFields.length) {
          out.update(i,
            if (ords(i) < 0) null
            else fromAvro(readFields(i)._1.dataType, rec.get(ords(i))))
          i += 1
        }
        out
      }
      override def close(): Unit = if (!closed) { closed = true; reader.close() }
    }
  }

  /** count of records in the blocks before `start` (position-counter seed
    * for byte-range splits in the MoR scan) */
  def rowCountBefore(conf: Configuration, path: String, start: Long): Long = {
    val in = new FsInput(new Path(path), conf)
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      reader.sync(0)
      var n = 0L
      var rec: GenericRecord = null
      while (reader.hasNext && !reader.pastSync(start)) {
        rec = reader.next(rec)
        n += 1
      }
      n
    } finally reader.close()
  }

}
