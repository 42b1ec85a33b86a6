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

  /** Exact integer dot product over two `array<long>` columns —
    * bit-identical to `aggregate(zip_with(a, b, (x, y) => x * y), 0L,
    * (acc, x) => acc + x)` for equal-length arrays (same index order,
    * same wrapping Long arithmetic), but codegen'd: the HOF form is
    * `CodegenFallback` and pays interpreted per-element eval on every
    * row, which dominates pair-scoring stages (knn graphs, beam walks)
    * where millions of 64-dim dots run per task.
    *
    * MISMATCHED LENGTHS (round-14 doc): the kernel truncates to the
    * shorter array (partial dot) where the zip_with fold returned NULL
    * (zip_with null-pads, nulling the sum). Every declared vector family
    * is fixed-dims so the difference is unobservable there; do NOT reuse
    * this kernel on ragged input expecting null propagation. Same note
    * applies to [[l2sqLong]]. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Exact integer squared L2 distance over `array<long>` vs a literal
    * centroid — bit-identical to the `aggregate(zip_with(e, cArr,
    * (x, y) => (x - y) * (x - y)), 0L, _ + _)` fold (index order,
    * wrapping Long arithmetic). */
  def l2sqLong(a: ArrayData, cent: Array[Long]): Long = {
    val n = math.min(a.numElements(), cent.length)
    var s = 0L
    var i = 0
    while (i < n) { val t = a.getLong(i) - cent(i); s += t * t; i += 1 }
    s
  }

  /** Argmin cell over literal integer centroids: the codegen'd form of
    * `array_min(array(struct(l2sq(e, c_k), cid_k)...)).cid` — strict
    * less-than over centroids iterated in the caller's order, so with
    * ascending-cid centroid arrays ties resolve to the LOWEST cid,
    * exactly like the lexicographic struct min. */
  def nearestCentroidQ(e: ArrayData, cents: Array[Array[Long]], cids: Array[Long]): Long = {
    var best = 0
    var bd = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = l2sqLong(e, cents(c))
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    cids(best)
  }

  /** Unit-normalize a FLOAT vector then argmin squared-L2 against double
    * centroids (ascending cell order, strict less keeps the earlier =
    * lower cell) — bit-identical to the expression pipeline
    * `unitNorm(vec)` (norm accumulated as double over FLOAT x*x
    * products, divisor `greatest(norm, 1e-12)`) followed by the
    * `aggregate(centLit, struct(-1, MaxValue), keep-strictly-smaller)`
    * fold of [[graft.operators.Similarity.addToIvfIndex]].
    *
    * KNOWN DIVERGENCES on degenerate input (round-14 doc): a NaN vector
    * propagated NaN through the old `greatest(norm, 1e-12)` (every cell
    * skipped -> cell -1) while this kernel's `norm > 1e-12` test is
    * false for NaN, so it divides by 1e-12 and assigns a real cell; a
    * dims-mismatched vector gets a partial-distance assignment instead
    * of -1. Declared embeddings are finite fixed-dims floats (oracle-
    * gated), so neither case is reachable there — keep degenerate-input
    * screening UPSTREAM of this kernel if inputs stop being curated. */
  def assignCellFloat(v: ArrayData, cents: Array[Array[Double]], cells: Array[Int]): Int = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i)
      ss += (x * x).toDouble // float product, then widen — matches x * x in FloatType
      i += 1
    }
    val norm = math.sqrt(ss)
    val dn = if (norm > 1e-12) norm else 1e-12
    var best = -1
    var bd = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var d2 = 0.0
      var j = 0
      while (j < m) {
        val t = v.getFloat(j).toDouble / dn - cent(j)
        d2 += t * t
        j += 1
      }
      if (d2 < bd) { bd = d2; best = cells(c) }
      c += 1
    }
    best
  }

  /** Power-of-two integer quantization of a FLOAT vector (round-14):
    * element i = floor(v_i as double * scale) as long — bit-identical to
    * the `transform(vec, x => floor(x.cast(double) * scale).cast(long))`
    * expression (which was CodegenFallback). Like the other vector
    * kernels, assumes non-null elements (the declared embeddings'
    * contract). */
  def quantizeFloat(v: ArrayData, scale: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Centroid-cosine parts for [[graft.operators.Similarity.centroidOutliers]]
    * (round-14): quantize the FLOAT vector once, then return
    * (dot, qq) where `dot` = Σ q_i * cent_i accumulated EXACTLY as the
    * replaced `aggregate(zip_with(e, cArr, a*b), DECIMAL(38,0) 0, +)`
    * fold did — per-element products in wrapping Long (zip_with's
    * LongType multiply), the running sum exact at any magnitude (Long
    * fast path, BigInteger past Long range) — and `qq` = Σ q_i²
    * in Long (bounded by dims*scale² for unit-scale vectors regardless
    * of corpus size, like the old Long fold). A dims mismatch returns a
    * NULL dot, mirroring zip_with's null-padding nulling the sum. */
  def centroidCosParts(
      v: ArrayData, cent: Array[Long], scale: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var qq = 0L
    var acc = 0L
    var big: java.math.BigInteger = null
    val lenOk = n == cent.length
    var i = 0
    while (i < n) {
      val q = math.floor(v.getFloat(i).toDouble * scale).toLong
      qq += q * q
      if (lenOk) {
        val p = q * cent(i) // wrapping multiply, exactly like zip_with's LongType *
        if (big == null) {
          val r = acc + p
          if (((acc ^ r) & (p ^ r)) < 0) // signed-overflow test (Math.addExact)
            big = java.math.BigInteger.valueOf(acc)
              .add(java.math.BigInteger.valueOf(p))
          else acc = r
        } else big = big.add(java.math.BigInteger.valueOf(p))
      }
      i += 1
    }
    val dot: Decimal =
      if (!lenOk) null
      else if (big == null) Decimal(BigDecimal(acc), 38, 0)
      else Decimal(BigDecimal(new java.math.BigDecimal(big)), 38, 0)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dot, qq))
  }

  /** Random-hyperplane LSH signature: bit i = sign(dot(v, p_i)) where the
    * pseudo-random plane components are derived seed-stably per (i, dim).
    * Vectors at small angle share most bits -> band on the signature to
    * bucket near-duplicate candidates without an all-pairs shuffle. */
  // the (bits x dims) hyperplane matrix depends only on (seed, bits, dims)
  // — memoize per JVM (round-13): the inline form re-derived bits*dims
  // seed-string hashes per ROW (2,560 at bits=40/d=64), which dominated
  // the signature stage of every sign-LSH query. Values are identical:
  // the same hash64 -> (-1, 1) mapping, materialized once.
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), Array[Double]]()
  private def planesOf(seed: Int, bits: Int, n: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, bits, n), _ => {
      val p = new Array[Double](bits * n)
      var i = 0
      while (i < bits) {
        var j = 0
        while (j < n) {
          val h = TextUtil.hash64(s"plane-$seed-$i-$j")
          p(i * n + j) = h.toDouble / Long.MaxValue.toDouble
          j += 1
        }
        i += 1
      }
      p
    })

  def signBits(v: ArrayData, bits: Int, seed: Int): Long = {
    val n = v.numElements()
    val planes = planesOf(seed, bits, n)
    var out = 0L
    var i = 0
    while (i < bits) {
      var s = 0.0
      var j = 0
      while (j < n) {
        s += planes(i * n + j) * v.getFloat(j)
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

case class DotProductLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_long"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.dotLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductLong =
    copy(left = l, right = r)
}

case class L2SqLong(child: Expression, cent: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "l2sq_long"
  override def nullSafeEval(a: Any): Any =
    VectorUtil.l2sqLong(a.asInstanceOf[ArrayData], cent)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("cent", cent, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.l2sqLong($c, $centRef)")
  }
  override protected def withNewChildInternal(c: Expression): L2SqLong = copy(child = c)
}

/** `cents` MUST be ordered ascending by `cids` — ties then resolve to
  * the lowest cid, matching `array_min` over (dist, cid) structs. */
case class NearestCentroidQ(child: Expression, cents: Array[Array[Long]], cids: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_q"
  override def nullSafeEval(a: Any): Any =
    VectorUtil.nearestCentroidQ(a.asInstanceOf[ArrayData], cents, cids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorUtil.nearestCentroidQ($c, $centsRef, $cidsRef)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroidQ =
    copy(child = c)
}

/** `cents` MUST be ordered ascending by `cells` (strict-less argmin keeps
  * the earlier entry on ties, like the keep-strictly-smaller fold). */
case class AssignCellFloat(child: Expression, cents: Array[Array[Double]], cells: Array[Int])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "assign_cell_float"
  override def nullSafeEval(a: Any): Any =
    VectorUtil.assignCellFloat(a.asInstanceOf[ArrayData], cents, cells)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorUtil.assignCellFloat($c, $centsRef, $cellsRef)")
  }
  override protected def withNewChildInternal(c: Expression): AssignCellFloat =
    copy(child = c)
}

/** Codegen'd power-of-two float-vector quantization (round-14) — see
  * [[VectorUtil.quantizeFloat]]. */
case class QuantizeFloat(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_float"
  override def nullSafeEval(a: Any): Any =
    VectorUtil.quantizeFloat(a.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.quantizeFloat($c, $scale)")
  override protected def withNewChildInternal(c: Expression): QuantizeFloat =
    copy(child = c)
}

/** Codegen'd centroid-cosine parts (round-14) — see
  * [[VectorUtil.centroidCosParts]]. `dot` is nullable (dims mismatch,
  * mirroring zip_with's null-padding). */
case class CentroidCosParts(child: Expression, cent: Array[Long], scale: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dot", DecimalType(38, 0), nullable = true),
    StructField("qq", LongType, nullable = false)))
  override def prettyName: String = "centroid_cos_parts"
  override def nullSafeEval(a: Any): Any =
    VectorUtil.centroidCosParts(a.asInstanceOf[ArrayData], cent, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("cent", cent, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorUtil.centroidCosParts($c, $centRef, $scale)")
  }
  override protected def withNewChildInternal(c: Expression): CentroidCosParts =
    copy(child = c)
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
  def dotLong(a: Column, b: Column): Column =
    column(DotProductLong(expression(a), expression(b)))
  def l2sqLong(a: Column, cent: Array[Long]): Column =
    column(L2SqLong(expression(a), cent))
  def nearestCentroidQ(a: Column, cents: Array[Array[Long]], cids: Array[Long]): Column =
    column(NearestCentroidQ(expression(a), cents, cids))
  def assignCellFloat(a: Column, cents: Array[Array[Double]], cells: Array[Int]): Column =
    column(AssignCellFloat(expression(a), cents, cells))
  def norm(a: Column): Column = column(VectorNorm(expression(a)))
  def signBits(a: Column, bits: Int = 16, seed: Int = 42): Column =
    column(SignBits(expression(a), bits, seed))
}
