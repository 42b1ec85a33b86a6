package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hilbert-curve index for multi-dimensional clustering — the
  * locality-preserving sibling of [[ZOrder]]'s Morton interleave. The
  * Hilbert curve never makes the long diagonal jumps Morton makes at
  * quadrant boundaries (every curve step is a unit step in exactly one
  * dimension), so consecutive rows land in adjacent grid cells and file
  * min/max bounds come out tighter on average for the same file count —
  * measurably better multi-dimensional pruning at the same rewrite cost.
  *
  * Coordinates use the same linear scaling as z-order (63/n bits per
  * dimension from global min/max); the axes→index transform is John
  * Skilling's transpose algorithm ("Programming the Hilbert curve", AIP
  * Conf. Proc. 707, 2004) — O(n·b) bit ops per row, no allocation beyond
  * one small long[]. The transform is iterative with data-dependent
  * exchanges, which a Catalyst expression tree cannot express compactly
  * (b·n conditional swaps would blow up Janino), so it runs as a static
  * kernel invoked from generated code — the same pattern as the text
  * kernels in [[TextUtil]]: still inside whole-stage codegen, no UDF. */
object HilbertUtil {

  /** Hilbert distance of `coords` on an n-dimensional grid with `bits`
    * bits per dimension (n·bits <= 63). Mutates a private copy. */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = java.util.Arrays.copyOf(coords, n)
    // Skilling: axes -> transposed Hilbert index, in place
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p // invert low bits of x(0)
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 } // Gray encode
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // un-transpose: bit j of x(i) lands at position j*n + (n-1-i) — MSB
    // of dimension 0 is the most significant index bit
    var h = 0L
    var j = bits - 1
    while (j >= 0) {
      i = 0
      while (i < n) {
        h = (h << 1) | ((x(i) >>> j) & 1L)
        i += 1
      }
      j -= 1
    }
    h
  }
}

/** `hilbert_index(c1..cn)` over pre-scaled long coordinates. Children are
  * produced by [[Hilbert.withHilbertColumn]]'s scaling (non-null by
  * construction; a null still degrades to cell 0, matching z-order's
  * null placement). */
case class HilbertIndex(children: Seq[Expression], bits: Int) extends Expression {
  require(children.size >= 2 && children.size <= 8,
    s"hilbert needs 2..8 columns, got ${children.size}")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits*dims must fit a long, got $bits*${children.size}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hilbert_index"
  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      coords(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    HilbertUtil.index(coords, bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val coords = evals.map(e => s"(${e.isNull} ? 0L : ${e.value})").mkString(", ")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        final long ${ev.value} =
          graft.functions.HilbertUtil.index(new long[]{$coords}, $bits);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex = copy(children = newChildren)
}

object Hilbert {

  /** append a Hilbert-index column computed from `colNames` — same
    * contract as [[ZOrder.withZColumn]]: ranges fold from `precomputed`
    * (metadata-only) when given, else one min/max agg pass; out-of-range
    * values clamp to the curve's ends. */
  def withHilbertColumn(
      df: DataFrame,
      colNames: Seq[String],
      hCol: String = "_h",
      precomputed: Option[Seq[(Double, Double)]] = None): DataFrame = {
    val n = colNames.size
    require(n >= 2 && n <= 8, s"hilbert needs 2..8 columns, got $n")
    val bits = 63 / n
    val scaled = ZOrder.scaledCoords(df, colNames, bits, precomputed)
    val h = column(HilbertIndex(scaled.map(expression), bits))
    df.withColumn(hCol, h)
  }
}
