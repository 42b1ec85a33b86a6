package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling (the ANALYZE/data-quality pass a pipeline runs before
  * and after every transform): per-column row/null/distinct counts and
  * min/max, one result row per column.
  *
  * Scale design: ONE aggregation job over the input. count/min/max are
  * plain partial aggregates; the exact distinct counts ride Spark's
  * multi-distinct expand (one shuffle keyed by the expand id — at 100 TB
  * swap `countDistinct` for `approx_count_distinct` via `exact = false`
  * and the whole profile collapses to a map-side-partial single pass).
  * The per-column result pivot is driver-side over k rows, not data.
  */
object Profiling {

  /** Per-source corpus accounting (docs / tokens / chars / token share)
    * — the composition report every mixture decision starts from. One
    * hash aggregate over the corpus plus a one-row total broadcast. */
  def corpusStats(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val base = df.select(
      col(groupCol).as("source"),
      size(split(trim(col(textCol)), "\\s+")).cast(LongType).as("_tok"),
      length(col(textCol)).cast(LongType).as("_chars"))
    val g = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_tok")).as("n_tokens"),
      sum(col("_chars")).as("n_chars"))
    val total = math.max(1L,
      g.agg(sum(col("n_tokens"))).head().getLong(0))
    g.withColumn("token_share",
      round(col("n_tokens").cast(DoubleType) / lit(total.toDouble), 6))
  }

  /** Cross-source duplicate-leakage matrix: for every pair of sources,
    * how many DISTINCT document fingerprints appear in both — the
    * governance view run before mixing sources (high overlap means one
    * source mirrors/re-crawls another and mixture weights double-count
    * it). Shape: distinct (source, fp) hash aggregate first (corpus-
    * linear, shuffles 16-byte fps not documents), then a self-join on
    * fp — each fp joins at most #sources rows, so pair fan-out is
    * bounded by the source count, never by corpus size. */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val fp = df
      .select(col(srcCol).as("source"), md5(col(textCol)).as("fp"))
      .distinct()
    fp.as("a")
      .join(fp.as("b"), col("a.fp") === col("b.fp") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_fps"))
  }

  def profile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(col(c)).as(s"__nonnull_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    val out = cols.zipWithIndex.map { case (c, i) =>
      val b = i * 5
      org.apache.spark.sql.Row(
        c, row.getLong(b), row.getLong(b) - row.getLong(b + 1),
        row.getLong(b + 2), row.getString(b + 3), row.getString(b + 4))
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("min_value", StringType, nullable = true),
        StructField("max_value", StringType, nullable = true))))
  }

  /** Embedding distribution-drift monitor: per-dimension integer-quantized
    * mean of an incoming batch vs the reference corpus, with a drift flag
    * — the ingestion check that catches a retrained/upgraded embedder (or
    * a broken feature pipe) BEFORE a mismatched batch pollutes the ANN
    * index and dedup thresholds.
    *
    * Exactness: the same power-of-two quantization as k-means — means are
    * floor(int-sum / count), drift is an integer difference; engines
    * agree bit-for-bit. Scale: one (dim, side) partial-aggregated shuffle
    * of dims×2 rows; nothing but per-dim sums leaves the executors. */
  def embeddingDrift(
      df: DataFrame,
      vecCol: String,
      isNewCol: String,
      scale: Int = 1024,
      flagThreshold: Long = 128): DataFrame = {
    require((scale & (scale - 1)) == 0, s"scale must be a power of two: $scale")
    val q = df.select(
      col(isNewCol).cast("boolean").as("is_new"),
      posexplode(transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale)).cast(LongType)))
        .as(Seq("dim", "v")))
    q.groupBy(col("dim").cast(LongType).as("dim"))
      .agg(
        sum(when(!col("is_new"), col("v"))).as("sum_ref"),
        count(when(!col("is_new"), lit(1))).as("n_ref"),
        sum(when(col("is_new"), col("v"))).as("sum_new"),
        count(when(col("is_new"), lit(1))).as("n_new"))
      .select(
        col("dim"),
        floor(col("sum_ref").cast(DoubleType) / col("n_ref"))
          .cast(LongType).as("mean_ref"),
        floor(col("sum_new").cast(DoubleType) / col("n_new"))
          .cast(LongType).as("mean_new"))
      .withColumn("drift", abs(col("mean_new") - col("mean_ref")))
      .withColumn("flagged", col("drift") >= flagThreshold)
  }

  /** Embedding anisotropy audit: the top-k strongest OFF-DIAGONAL
    * covariance pairs of the (quantized) embedding distribution — the
    * governance table read before trusting cosine retrieval (a strongly
    * anisotropic space concentrates similarity mass in few directions, so
    * cosine scores compress and ANN recall targets need re-tuning; the
    * standard fixes — mean-centering, whitening the top pairs — start
    * from exactly this table).
    *
    * Scale design: ONE pass over the embeddings. Each vector explodes to
    * the upper-triangle product entries (i<=j) plus its first-moment
    * entries and one count marker — dims*(dims+3)/2 + 1 in-task rows that
    * partially aggregate map-side down to that many rows PER PARTITION
    * before the only shuffle; the reduced table (2,145 rows at dims=64)
    * then runs through broadcast self-joins. Nothing row-sized crosses
    * the wire.
    *
    * Exactness: components quantize to integers (floor(x*scale)) and
    * accumulate in TWO exact stages — per-partition partials in Long
    * (overflow needs ~2^43 unit-scale rows per partition; far beyond any
    * real task), grand totals across partitions in DECIMAL(38,0) — so
    * totals are exact at any corpus size; the covariance numerator
    * n*S_ij - S_i*S_j is exact integer arithmetic, and the reported
    * `cov_q2` = sign * (|num| div n^2) — covariance in quantized-unit^2,
    * scale-invariant in magnitude — uses truncating division on the
    * absolute value so engines with different negative-division
    * conventions still agree. */
  def embeddingAnisotropy(
      df: DataFrame,
      vecCol: String,
      dims: Int,
      scale: Int = 1024,
      topK: Int = 20): DataFrame = {
    require((scale & (scale - 1)) == 0, s"scale must be a power of two: $scale")
    // round-13: the dims*(dims+3)/2 + 1 per-row entries previously built
    // with nested interpreted HOF transforms + explode (CodegenFallback —
    // ~2,145 expression-tree evals per vector) now accumulate inside ONE
    // mapPartitions kernel that emits the PARTIAL SUMS directly: each
    // partition contributes exactly one (i, j, partial) row per cell, the
    // shuffle carries cells x partitions rows (identical to the previous
    // map-side partial aggregation), and the DECIMAL(38,0) grand totals
    // are bit-identical because integer addition is associative. Per-cell
    // partials stay in Long: |q| <= scale * max|x| keeps a partition's
    // partial far under 2^63 for any realistic partition row count (the
    // count/moment/product magnitudes reach 2^63 only past ~2^40 rows per
    // partition x unit-scale vectors). Null/NaN elements follow the old
    // fold exactly: a null element ANYWHERE in the array (and every
    // position past a short array's length) skips its moment and products
    // (SQL sum ignores null), NaN/Inf quantize through the same
    // floor-then-toLong. Elements are read with NUMERIC WIDENING
    // (round-14) so array<float>/array<double>/array<int> inputs all take
    // the cast-to-double path the expression form used.
    val q = df.select(col(vecCol).as("v"))
    val cells = dims * (dims + 1) / 2
    val outSchema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("v", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val dimsL = dims
    val scaleL = scale
    val entries = q.mapPartitions { it =>
      var n = 0L
      val moments = new Array[Long](dimsL)
      val prods = new Array[Long](cells)
      val qv = new Array[Long](dimsL)
      val nul = new Array[Boolean](dimsL)
      it.foreach { r =>
        val arr =
          if (r.isNullAt(0)) Seq.empty[AnyRef] else r.getSeq[AnyRef](0)
        val m = math.min(dimsL, arr.length)
        var i = 0
        while (i < m) {
          arr(i) match {
            case x: java.lang.Number =>
              qv(i) = math.floor(x.doubleValue() * scaleL).toLong
              nul(i) = false
            case _ => // null element inside the array: skip its cells
              nul(i) = true
          }
          i += 1
        }
        while (i < dimsL) { nul(i) = true; i += 1 }
        n += 1L
        i = 0
        var c = 0
        while (i < dimsL) {
          if (!nul(i)) moments(i) += qv(i)
          var j = i
          while (j < dimsL) {
            if (!nul(i) && !nul(j)) prods(c) += qv(i) * qv(j)
            j += 1; c += 1
          }
          i += 1
        }
      }
      if (n == 0L) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        out += org.apache.spark.sql.Row(-1, -1, n)
        var i = 0
        while (i < dimsL) {
          out += org.apache.spark.sql.Row(i + 1, -1, moments(i))
          i += 1
        }
        i = 0
        var c = 0
        while (i < dimsL) {
          var j = i
          while (j < dimsL) {
            out += org.apache.spark.sql.Row(i + 1, j + 1, prods(c))
            j += 1; c += 1
          }
          i += 1
        }
        out.iterator
      }
    }
    val sums = entries.groupBy("i", "j")
      .agg(sum(col("v").cast(DecimalType(38, 0))).as("s"))
    val nRow = sums.filter(col("i") === -1 && col("j") === -1)
      .select(col("s").as("n"))
    val moments = sums.filter(col("i") > 0 && col("j") === -1)
    val pairs = sums.filter(col("i") > 0 && col("j") > col("i"))
    val cov = pairs
      .join(broadcast(moments.select(col("i").as("_mi_i"), col("s").as("mi"))),
        col("i") === col("_mi_i"))
      .join(broadcast(moments.select(col("i").as("_mj_i"), col("s").as("mj"))),
        col("j") === col("_mj_i"))
      .crossJoin(broadcast(nRow))
      .select(col("i").cast(LongType).as("dim_i"),
        col("j").cast(LongType).as("dim_j"),
        (col("n") * col("s") - col("mi") * col("mj")).as("num"),
        col("n"))
      .select(col("dim_i"), col("dim_j"),
        (when(col("num") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("abs(num) div (n * n)")).as("cov_q2"))
    cov
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(abs(col("cov_q2")).desc, col("dim_i"), col("dim_j")))
        .cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("dim_i"), col("dim_j"), col("cov_q2"))
  }
}
