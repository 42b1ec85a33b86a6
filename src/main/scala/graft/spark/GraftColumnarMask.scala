package graft.spark

import org.apache.spark.sql.types.{DataType, Decimal}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Ordinal-remapping view over a ColumnVector: row `i` of this vector is
  * row `map(i)` of the base vector. Lets the MoR scan serve VECTORIZED
  * batches from files that carry deletes — surviving rows are exposed
  * through the indirection instead of being copied row-by-row (the same
  * design as Iceberg-Java's vectorized delete application). The base
  * vector owns the data; `close` is a no-op so the inner reader keeps
  * recycling its buffers. */
final class MaskedColumnVector(base: ColumnVector, map: Array[Int])
    extends ColumnVector(base.dataType()) {

  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls(): Int = base.numNulls()
  override def isNullAt(i: Int): Boolean = base.isNullAt(map(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(map(i))
  override def getByte(i: Int): Byte = base.getByte(map(i))
  override def getShort(i: Int): Short = base.getShort(map(i))
  override def getInt(i: Int): Int = base.getInt(map(i))
  override def getLong(i: Int): Long = base.getLong(map(i))
  override def getFloat(i: Int): Float = base.getFloat(map(i))
  override def getDouble(i: Int): Double = base.getDouble(map(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    base.getDecimal(map(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = base.getUTF8String(map(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(map(i))
  override def getArray(i: Int): ColumnarArray = base.getArray(map(i))
  override def getMap(i: Int): ColumnarMap = base.getMap(map(i))
  // the final getStruct/getInterval paths read through getChild with OUR
  // row ids, so children must remap too
  override def getChild(ordinal: Int): ColumnVector =
    new MaskedColumnVector(base.getChild(ordinal), map)
}

object GraftColumnarMask {

  /** batch of the first `n` vectors of `base`, rows filtered to `map`
    * (all of `map` when `kept` == batch size: plain projection) */
  def project(base: ColumnarBatch, n: Int): ColumnarBatch = {
    val vs = Array.tabulate[ColumnVector](n)(base.column)
    new ColumnarBatch(vs, base.numRows())
  }

  def mask(base: ColumnarBatch, n: Int, map: Array[Int], kept: Int): ColumnarBatch = {
    val vs = Array.tabulate[ColumnVector](n)(i => new MaskedColumnVector(base.column(i), map))
    new ColumnarBatch(vs, kept)
  }
}
