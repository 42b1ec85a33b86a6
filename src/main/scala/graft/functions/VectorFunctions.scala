package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static float-vector kernels called from generated code. Inputs are
  * Spark `array<float>` columns (the embeddings table layout). */
object VectorUtil {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = math.sqrt(dot(a, a))

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Random-hyperplane LSH signature: bit i = sign(dot(v, p_i)) where the
    * pseudo-random plane components are derived seed-stably per (i, dim).
    * Vectors at small angle share most bits -> band on the signature to
    * bucket near-duplicate candidates without an all-pairs shuffle. */
  def signBits(v: ArrayData, bits: Int, seed: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var i = 0
    while (i < bits) {
      var s = 0.0
      var j = 0
      while (j < n) {
        // map a 64-bit hash to (-1, 1) deterministically
        val h = TextUtil.hash64(s"plane-$seed-$i-$j")
        val r = (h.toDouble / Long.MaxValue.toDouble)
        s += r * v.getFloat(j)
        j += 1
      }
      if (s >= 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"
  override def nullSafeEval(a: Any): Any = VectorUtil.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.norm($c)")
  override protected def withNewChildInternal(c: Expression): VectorNorm = copy(c)
}

case class SignBits(child: Expression, bits: Int, seed: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"
  override def nullSafeEval(a: Any): Any =
    VectorUtil.signBits(a.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.signBits($c, $bits, $seed)")
  override protected def withNewChildInternal(c: Expression): SignBits = copy(child = c)
}

/** Column-level vector API. */
object vectors {
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def norm(a: Column): Column = column(VectorNorm(expression(a)))
  def signBits(a: Column, bits: Int = 16, seed: Int = 42): Column =
    column(SignBits(expression(a), bits, seed))
}
