package graft.functions

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Standard MurmurHash3 x86 32-bit (public algorithm, Austin Appleby).
  *
  * Iceberg's `bucket[N]` transform hashes the Iceberg single-value binary
  * encoding of a value with murmur3_x86_32 at seed 0 (behavior mirrored from
  * the reference's vectorized kernel, icelake/src/types/transform/bucket.rs:24-70,
  * verified against the Iceberg spec Appendix B golden vectors).
  */
object Murmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hash(data: Array[Byte], seed: Int): Int = {
    val len = data.length
    val nblocks = len / 4
    var h1 = seed
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tailStart = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tailStart + 2) & 0xff) << 16
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 2 =>
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 1 =>
        k1 ^= data(tailStart) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    // finalize
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}

/** Static helpers referenced from generated code — keep signatures stable.
  * Encodings per the Iceberg spec (Appendix B):
  *  - int/long/date/time/timestamp[tz] -> 8-byte little-endian long
  *  - decimal -> minimal big-endian two's-complement of the unscaled value
  *  - string -> UTF-8 bytes; uuid/fixed/binary -> raw bytes
  */
object TransformUtil {
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>= 8; i += 1 }
    Murmur3.hash(b, 0)
  }

  def hashBytes(v: Array[Byte]): Int = Murmur3.hash(v, 0)

  def hashString(v: UTF8String): Int = Murmur3.hash(v.getBytes, 0)

  def hashDecimal(v: Decimal): Int =
    Murmur3.hash(v.toJavaBigDecimal.unscaledValue.toByteArray, 0)

  def bucketOf(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  def bucketLong(v: Long, n: Int): Int = bucketOf(hashLong(v), n)
  def bucketInt(v: Int, n: Int): Int = bucketOf(hashLong(v.toLong), n)
  def bucketBytes(v: Array[Byte], n: Int): Int = bucketOf(hashBytes(v), n)
  def bucketString(v: UTF8String, n: Int): Int = bucketOf(hashString(v), n)
  def bucketDecimal(v: Decimal, n: Int): Int = bucketOf(hashDecimal(v), n)

  /** uuid hashes as its 16 big-endian bytes (spec Appendix B), NOT as the
    * canonical string — the carrier type is string, so parse first */
  def uuidToBytes(v: UTF8String): Array[Byte] = {
    val u = java.util.UUID.fromString(v.toString)
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    b.array()
  }

  def hashUuid(v: UTF8String): Int = Murmur3.hash(uuidToBytes(v), 0)
  def bucketUuid(v: UTF8String, n: Int): Int = bucketOf(hashUuid(v), n)

  /** truncate[W] for integral types: v - (((v % w) + w) % w) (floor mod). */
  def truncateLong(v: Long, w: Long): Long = v - (((v % w) + w) % w)
  def truncateInt(v: Int, w: Int): Int = v - (((v % w) + w) % w)

  /** truncate[W] for decimal: floor-mod applied to the unscaled value
    * (spec behavior; the reference slices bytes for strings — a spec
    * divergence we do not copy). */
  def truncateDecimal(v: Decimal, w: Int): Decimal = {
    val unscaled = v.toJavaBigDecimal.unscaledValue
    val ww = BigInteger.valueOf(w)
    val m = unscaled.mod(ww) // BigInteger.mod is always non-negative
    val t = unscaled.subtract(m)
    Decimal(new java.math.BigDecimal(t, v.scale), v.precision, v.scale)
  }

  /** truncate[W] for strings: first W code points (not bytes). */
  def truncateString(v: UTF8String, w: Int): UTF8String = v.substring(0, w)

  def truncateBinary(v: Array[Byte], w: Int): Array[Byte] =
    if (v.length <= w) v else java.util.Arrays.copyOf(v, w)
}

/** Iceberg `bucket[N]` as a codegen-capable Catalyst expression.
  * Null in -> null out (transforms must preserve nulls).
  * `uuidEncoding` marks a string-carried uuid column (Iceberg `uuid` has
  * no Spark type): the value hashes as its 16 big-endian bytes. */
case class IcebergBucket(child: Expression, numBuckets: Int, uuidEncoding: Boolean = false)
    extends UnaryExpression {
  require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"iceberg_bucket"

  private val helper = "graft.functions.TransformUtil"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType => TransformUtil.bucketInt(input.asInstanceOf[Int], numBuckets)
    case DateType => TransformUtil.bucketInt(input.asInstanceOf[Int], numBuckets)
    case LongType | TimestampType | TimestampNTZType =>
      TransformUtil.bucketLong(input.asInstanceOf[Long], numBuckets)
    case StringType if uuidEncoding =>
      TransformUtil.bucketUuid(input.asInstanceOf[UTF8String], numBuckets)
    case StringType =>
      TransformUtil.bucketString(input.asInstanceOf[UTF8String], numBuckets)
    case BinaryType =>
      TransformUtil.bucketBytes(input.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType =>
      TransformUtil.bucketDecimal(input.asInstanceOf[Decimal], numBuckets)
    case t => throw new IllegalArgumentException(s"bucket: unsupported type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case IntegerType | DateType => "bucketInt"
      case LongType | TimestampType | TimestampNTZType => "bucketLong"
      case StringType if uuidEncoding => "bucketUuid"
      case StringType => "bucketString"
      case BinaryType => "bucketBytes"
      case _: DecimalType => "bucketDecimal"
      case t => throw new IllegalArgumentException(s"bucket: unsupported type $t")
    }
    defineCodeGen(ctx, ev, c => s"$helper.$fn($c, $numBuckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

/** Iceberg `truncate[W]` as a codegen-capable Catalyst expression. */
case class IcebergTruncate(child: Expression, width: Int)
    extends UnaryExpression {
  require(width > 0, s"width must be positive: $width")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "iceberg_truncate"

  private val helper = "graft.functions.TransformUtil"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType => TransformUtil.truncateInt(input.asInstanceOf[Int], width)
    case LongType => TransformUtil.truncateLong(input.asInstanceOf[Long], width.toLong)
    case StringType => TransformUtil.truncateString(input.asInstanceOf[UTF8String], width)
    case BinaryType => TransformUtil.truncateBinary(input.asInstanceOf[Array[Byte]], width)
    case _: DecimalType => TransformUtil.truncateDecimal(input.asInstanceOf[Decimal], width)
    case t => throw new IllegalArgumentException(s"truncate: unsupported type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case IntegerType => "truncateInt"
      case LongType => "truncateLong"
      case StringType => "truncateString"
      case BinaryType => "truncateBinary"
      case _: DecimalType => "truncateDecimal"
      case t => throw new IllegalArgumentException(s"truncate: unsupported type $t")
    }
    defineCodeGen(ctx, ev, c => s"$helper.$fn($c, $width)")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergTruncate =
    copy(child = newChild)
}

/** Column-level API for the Iceberg partition transforms.
  *
  * The temporal transforms compose built-in (codegen'd, prunable)
  * functions; bucket/truncate need the custom expressions above because
  * Spark's hash() uses a different seed/encoding than the Iceberg spec.
  * All operate in the session time zone, which this engine pins to UTC.
  */
object transforms {
  def bucket(n: Int, col: Column): Column = column(IcebergBucket(expression(col), n))
  def bucketUuid(n: Int, col: Column): Column =
    column(IcebergBucket(expression(col), n, uuidEncoding = true))
  def truncate(w: Int, col: Column): Column = column(IcebergTruncate(expression(col), w))

  /** years since 1970 */
  def yearsT(col: Column): Column = (year(col) - lit(1970)).cast(IntegerType)

  /** months since 1970-01 */
  def monthsT(col: Column): Column =
    ((year(col) - lit(1970)) * lit(12) + month(col) - lit(1)).cast(IntegerType)

  /** days since epoch (integer floor-div, exact pre-1970 unlike the
    * reference's float DAY_PER_SECOND trick, temporal.rs:17) */
  def daysT(col: Column): Column = datediff(col, lit("1970-01-01")).cast(IntegerType)

  /** hours since epoch for timestamps */
  def hoursT(col: Column): Column =
    floor(unix_micros(col.cast(TimestampType)) / lit(3600000000L)).cast(IntegerType)

  def voidT(col: Column): Column = lit(null)

  def identityT(col: Column): Column = col

  /** exact floor-division of a long column: (c - pmod(c,d)) is exactly
    * divisible, so decimal division + truncation equals floorDiv. A double
    * `/` is lossy past 2^53 — any post-1971 nanosecond value. The
    * subtraction happens in DECIMAL: in long arithmetic c - pmod(c,d)
    * underflows for c within pmod of Long.MinValue (ANSI mode would
    * throw; legacy mode wraps to a garbage positive day). */
  private def floorDivL(c: Column, d: Long): Column =
    ((c.cast(DecimalType(38, 0)) - pmod(c, lit(d))) / lit(d)).cast(LongType)

  /** v3 nanosecond timestamps ride a LongType carrier (nanos since epoch):
    * temporal transform values derive by exact integer floor-division —
    * the micros helpers need a timestamp column, and Spark has no
    * nanosecond timestamp to cast to. year/month go through the epoch-day
    * (calendar math on a DateType is timezone-free). */
  def daysNsT(col: Column): Column =
    floorDivL(col, 86400000000000L).cast(IntegerType)
  def hoursNsT(col: Column): Column =
    floorDivL(col, 3600000000000L).cast(IntegerType)
  def yearsNsT(col: Column): Column =
    yearsT(date_from_unix_date(daysNsT(col)))
  def monthsNsT(col: Column): Column =
    monthsT(date_from_unix_date(daysNsT(col)))
}
