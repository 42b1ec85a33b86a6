package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic k-means clustering over an embedding column — the corpus
  * organization pass (topic bucketing, per-cluster sampling quotas,
  * cluster-balanced shard export) of a training-data pipeline.
  *
  * Exactness: floats are quantized to integers (`floor(x * scale)` with a
  * power-of-two scale, exact in binary FP), so distances are integer
  * arithmetic with NO accumulation-order sensitivity, and centroid
  * updates divide integer sums — every engine computes bit-identical
  * assignments. Ties break toward the lowest centroid id.
  *
  * Scale design: centroids are k×d literals folded into the row-level
  * assignment expression (map-only) at every k — the broadcast-table +
  * crossJoin + min(struct) alternative was measured 1.8x SLOWER at
  * k=800/d=64/200k vectors (n·k candidate-row materialization beats the
  * big expression's evaluation cost; see kmeansAssign). The update step
  * shuffles (cid, dim, partial-sum) triples — k·d rows per map partition
  * after partial aggregation, never the vectors. Iterations are
  * driver-coordinated like every distributed k-means (Lloyd's algorithm
  * is inherently synchronous).
  */
object Clustering {

  /** Assign every row to one of `k` clusters seeded from the `k`
    * smallest-id vectors, after `iters` Lloyd iterations. Output:
    * (idCol, cluster). */
  def kmeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 1,
      scale: Int = 1024): DataFrame =
    kmeansFit(df, idCol, vecCol, k, iters, scale)._2

  /** [[kmeansAssign]] plus the fitted centroids themselves — the entry
    * point when the caller must RANK cells against a query (multi-probe
    * IVF, navigable-graph entry selection) rather than only assign
    * corpus rows. Centroids are the quantized integer vectors (k·d
    * longs, driver-side by construction — Lloyd's update already
    * collects the k·d partial sums). */
  def kmeansFit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 1,
      scale: Int = 1024): (Seq[(Long, Array[Long])], DataFrame) = {
    require(k >= 1 && iters >= 0, s"bad k=$k / iters=$iters")
    // power-of-two scaling is exact for binary floats: no cross-engine
    // rounding surface in the quantization itself
    require((scale & (scale - 1)) == 0, s"scale must be a power of two: $scale")
    val q = df.select(
      col(idCol),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale)).cast(LongType)).as("e"))

    def assignExpr(cents: Seq[(Long, Array[Long])]): Column = {
      // codegen'd argmin kernel (round-13): bit-identical to the previous
      // array_min-over-(dist, cid)-structs literal fold — same wrapping
      // Long arithmetic per dim, ascending-cid iteration with strict
      // less-than = lexicographic struct min — but compiled instead of
      // the CodegenFallback HOF fold, which evaluated k x d interpreted
      // expression nodes per row
      val sorted = cents.sortBy(_._1)
      graft.functions.vectors.nearestCentroidQ(col("e"),
        sorted.map(_._2).toArray, sorted.map(_._1).toArray)
    }

    // Assignment stays a per-row argmin against driver-literal centroids
    // at EVERY k: the tempting alternative — broadcast centroid table +
    // crossJoin + per-id min(struct(dist, cid)) — was implemented and
    // MEASURED at the 100x probe (200k vectors, k=800, d=64): 245 s vs
    // the literal fold's 136 s. Materializing n*k candidate rows, each
    // duplicating two 64-long arrays, costs more than evaluating the
    // row-local argmin; brute-force assignment is compute-bound either
    // way and the kernel keeps it allocation-free. Revisit only if k*d
    // outgrows the driver-literal budget itself (~10^5 values).
    def assigned(cents: Seq[(Long, Array[Long])]): DataFrame =
      q.withColumn("cid", assignExpr(cents))

    // seeds: the k smallest ids' quantized vectors (deterministic)
    var cents: Seq[(Long, Array[Long])] = q.orderBy(col(idCol)).limit(k)
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Long](1).toArray)
      }.toSeq
    var it = 0
    while (it < iters) {
      val stats = assigned(cents)
        .select(col("cid"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = stats.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map {
        case (cid, rows) =>
          val dims = rows.map(r =>
            r.getInt(1) -> math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
            .sortBy(_._1).map(_._2)
          (cid, dims)
      }
      it += 1
    }
    (cents, assigned(cents).select(col(idCol), col("cid").as("cluster")))
  }

  /** Label-noise detection by centroid affinity: for every labeled vector,
    * the squared distance to its OWN label's centroid vs the nearest OTHER
    * label's centroid. A negative margin (`d_other < d_own`) flags a row
    * whose embedding sits closer to a different class — the cheap,
    * training-free label-noise screen run before a labeled set is trusted
    * (confident-learning's first approximation).
    *
    * Exactness: same integer-quantization scheme as [[kmeansAssign]] —
    * centroids are floor-of-integer-mean vectors, distances are integer
    * sums, the nearest-other tie breaks to the lowest label id. Every
    * engine computes bit-identical margins.
    *
    * Scale: one (label, dim) partial-sum aggregate (labels×dims rows — the
    * only collect, bounded by the label vocabulary), then a map-only
    * scoring pass with the centroids folded in as literals. Nothing joins,
    * nothing shuffles vectors.
    *
    * Output: (idCol, label, d_own, near_label, d_other, margin,
    * mislabeled). */
  def labelAffinity(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      scale: Int = 1024): DataFrame = {
    require((scale & (scale - 1)) == 0, s"scale must be a power of two: $scale")
    val q = df.select(
      col(idCol),
      col(labelCol).cast(LongType).as("lbl"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale)).cast(LongType)).as("e"))
    val stats = q
      .select(col("lbl"), posexplode(col("e")).as(Seq("dim", "v")))
      .groupBy(col("lbl"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect()
    val cents: Seq[(Long, Array[Long])] =
      stats.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (lbl, rows) =>
        val dims = rows.map(r =>
          r.getInt(1) -> math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
          .sortBy(_._1).map(_._2)
        (lbl, dims)
      }
    // (dist, label) candidate structs; array_min orders lexicographically,
    // so ties on dist resolve to the lowest label id
    // per-label distances via the codegen'd L2 kernel (bit-identical to
    // the interpreted zip_with fold it replaces; see kmeansFit)
    val cands = array(cents.map { case (lbl, c) =>
      struct(
        graft.functions.vectors.l2sqLong(col("e"), c).as("dist"),
        lit(lbl).as("clbl"))
    }: _*)
    val own = filter(cands, s => s.getField("clbl") === col("lbl"))
    val other = array_min(filter(cands, s => s.getField("clbl") =!= col("lbl")))
    q.select(
        col(idCol),
        col("lbl").as("label"),
        element_at(own, 1).getField("dist").as("d_own"),
        other.getField("clbl").as("near_label"),
        other.getField("dist").as("d_other"))
      .withColumn("margin", col("d_other") - col("d_own"))
      .withColumn("mislabeled", col("margin") < 0)
  }
}
