package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.tables._

/** The partition transforms as catalog functions (DSv2 FunctionCatalog):
  * Spark resolves `years(ts)` / `bucket(16, k)` etc. when planning the
  * write distribution (`RequiresDistributionAndOrdering`), and users can
  * call them as `catalog.system.<fn>` in SQL. Semantics delegate to
  * [[TransformEval]], the same evaluator the fanout writer uses — the
  * shuffle clusters rows exactly as the writer routes them. */
object GraftFunctions {

  val names: Seq[String] = Seq("years", "months", "days", "hours", "bucket", "truncate")

  def unbound(name: String): UnboundFunction = new GraftUnbound(name)

  private[spark] def iceTypeOf(dt: DataType): IceType = dt match {
    case IntegerType => IcePrim("int")
    case LongType => IcePrim("long")
    case FloatType => IcePrim("float")
    case DoubleType => IcePrim("double")
    case DateType => IcePrim("date")
    case TimestampType => IcePrim("timestamptz")
    case TimestampNTZType => IcePrim("timestamp")
    case StringType => IcePrim("string")
    case BinaryType => IcePrim("binary")
    case d: DecimalType => IceDecimal(d.precision, d.scale)
    case other => sys.error(s"unsupported transform input type: $other")
  }
}

class GraftUnbound(fnName: String) extends UnboundFunction {
  override def name(): String = fnName
  override def description(): String = s"$fnName: graft partition transform"

  override def bind(inputType: StructType): BoundFunction = fnName match {
    case "years" | "months" | "days" | "hours" =>
      require(inputType.fields.length == 1, s"$fnName takes one argument")
      new GraftTemporalFn(fnName, inputType.fields(0).dataType)
    case "bucket" =>
      require(inputType.fields.length == 2, "bucket takes (numBuckets, col)")
      new GraftBucketFn(inputType.fields(1).dataType)
    case "truncate" =>
      require(inputType.fields.length == 2, "truncate takes (width, col)")
      new GraftTruncateFn(inputType.fields(1).dataType)
    case other => sys.error(s"unknown function $other")
  }
}

class GraftTemporalFn(fn: String, src: DataType) extends ScalarFunction[Integer] {
  private val transform = fn.stripSuffix("s") // years -> year
  private val iceT = GraftFunctions.iceTypeOf(src)
  override def inputTypes(): Array[DataType] = Array(src)
  override def resultType(): DataType = IntegerType
  override def name(): String = fn
  override def canonicalName(): String = s"graft.$fn"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null.asInstanceOf[Integer]
    else Int.box(TransformEval.eval(transform, iceT, input.get(0, src)).asInstanceOf[Int])
}

class GraftBucketFn(src: DataType) extends ScalarFunction[Integer] {
  private val iceT = GraftFunctions.iceTypeOf(src)
  override def inputTypes(): Array[DataType] = Array(IntegerType, src)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0) || input.isNullAt(1)) null.asInstanceOf[Integer]
    else Int.box(TransformEval.eval(
      s"bucket[${input.getInt(0)}]", iceT, input.get(1, src)).asInstanceOf[Int])
}

class GraftTruncateFn(src: DataType) extends ScalarFunction[Any] {
  private val iceT = GraftFunctions.iceTypeOf(src)
  override def inputTypes(): Array[DataType] = Array(IntegerType, src)
  override def resultType(): DataType = src
  override def name(): String = "truncate"
  override def canonicalName(): String = "graft.truncate"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Any =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else {
      val v = TransformEval.eval(s"truncate[${input.getInt(0)}]", iceT, input.get(1, src))
      v match {
        // back to catalyst carriers
        case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case d: java.math.BigDecimal => org.apache.spark.sql.types.Decimal(d)
        case other => other
      }
    }
}
