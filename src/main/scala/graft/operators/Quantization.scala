package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Symmetric int8 embedding quantization — the storage/bandwidth lever of
  * a 100 TB embedding corpus (float32 → int8 is 4× smaller on disk and in
  * shuffle; ANN recall loss at 8 bits is typically negligible, and exact
  * re-rank against the float source recovers it entirely).
  *
  * Per vector: scale = max|x| / 127; q_i = floor(x_i / scale + 0.5)
  * (round-half-up — both floor and the IEEE divide are deterministic in
  * every engine, unlike round-half-even library calls). Zero vectors
  * quantize to zeros with scale 0. Map-only: no shuffle at any size.
  * Dequantization is `q_i * scale`, with |dequant − x| ≤ scale/2.
  */
object Quantization {

  /** (idCol, scale, qvec): the quantized vector plus its reconstruction
    * scale. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = aggregate(
      col(vecCol), lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast(DoubleType))))
    df.select(
        col(idCol),
        col(vecCol).as("_v"),
        (maxAbs / lit(127.0d)).as("scale"))
      .select(
        col(idCol),
        col("scale"),
        when(col("scale") === 0.0d,
          transform(col("_v"), _ => lit(0).cast(IntegerType)))
          .otherwise(transform(col("_v"), x =>
            floor(x.cast(DoubleType) / col("scale") + lit(0.5d)).cast(IntegerType)))
          .as("qvec"))
  }

  /** Block-wise int4 quantization (the QLoRA/bitsandbytes storage
    * shape): the vector splits into `blockSize`-dim blocks, each with
    * its OWN absmax scale — per-block scales track local dynamic range,
    * so one outlier dimension no longer flattens every other dim to zero
    * (the failure mode of a single per-vector scale at 4 bits, where the
    * grid is only [-7, 7]). Storage: two dims per byte + one float scale
    * per block ≈ 8× smaller than float32 at blockSize 16.
    *
    * Same engine-exact arithmetic as [[quantizeInt8]]: absmax by
    * comparison folds, `floor(x / scale + 0.5)` rounding, all IEEE
    * doubles. Map-only — scales and codes are computed in SEPARATE
    * projections so each lambda references a materialized attribute
    * (inlining the scales expression into the per-element lambda would
    * recompute the block fold PER DIMENSION — O(d·blockSize)). */
  def quantizeInt4Block(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockSize: Int = 16): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val nBlocks = ceil(size(col("_v")).cast(DoubleType) / lit(blockSize.toDouble))
      .cast(IntegerType)
    df.select(col(idCol), col(vecCol).as("_v"))
      .select(
        col(idCol), col("_v"),
        // empty-vector guard: nBlocks=0 would make sequence(0, -1) COUNT
        // DOWN (Spark defaults to step -1 when start > stop), minting two
        // phantom scale entries where range(0,0) engines yield none
        when(size(col("_v")) <= 0, array().cast("array<double>"))
          .otherwise(transform(sequence(lit(0), nBlocks - 1), j =>
            aggregate(
              slice(col("_v"), j * blockSize + 1, lit(blockSize)), lit(0.0d),
              (acc, x) => greatest(acc, abs(x.cast(DoubleType)))) / lit(7.0d)))
          .as("scales"))
      .select(
        col(idCol), col("scales"),
        transform(col("_v"), (x, i) => {
          val s = element_at(col("scales"),
            floor(i / lit(blockSize)).cast(IntegerType) + 1)
          when(s === 0.0d, lit(0).cast(IntegerType))
            .otherwise(floor(x.cast(DoubleType) / s + lit(0.5d))
              .cast(IntegerType))
        }).as("qvec"))
  }

  /** Scalar oracle surface for [[quantizeInt4Block]] (sum/min/max folds
    * — order-free, so engines agree exactly). */
  def quantizeInt4Stats(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockSize: Int = 16): DataFrame =
    quantizeInt4Block(df, idCol, vecCol, blockSize).select(
      col(idCol),
      size(col("scales")).cast(LongType).as("n_blocks"),
      array_max(col("scales")).as("scale_max"),
      aggregate(col("qvec"), lit(0L), (acc, x) => acc + x.cast(LongType)).as("qsum"),
      array_min(col("qvec")).cast(LongType).as("qmin"),
      array_max(col("qvec")).cast(LongType).as("qmax"))

  /** Matryoshka truncation: keep the first `dims` dimensions and report
    * how much of the vector's mass they retain — the storage/latency
    * lever of MRL-trained embeddings (a 64->16 cut is 4x smaller and
    * 4x faster to scan; the `mass_kept` column is the evidence the cut
    * is safe for THIS corpus). Map-only; norms are sequential IEEE folds
    * over double-cast components (engine-exact, same convention as the
    * cosine kernels). The renormalized prefix is `slice / norm_trunc` —
    * not materialized here because the stats are the decision surface;
    * compose `transform(slice(...), x -> x / norm)` where the cut
    * vectors themselves ship. */
  def matryoshkaStats(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1: $dims")
    def sq(c: org.apache.spark.sql.Column) = aggregate(
      c, lit(0.0d), (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
    df.select(
        col(idCol),
        sq(col(vecCol)).as("_full"),
        sq(slice(col(vecCol), 1, dims)).as("_trunc"))
      .select(
        col(idCol),
        round(sqrt(col("_full")), 6).as("norm_full"),
        round(sqrt(col("_trunc")), 6).as("norm_trunc"),
        when(col("_full") === 0.0d, lit(0.0d))
          .otherwise(round(col("_trunc") / col("_full"), 6)).as("mass_kept"))
  }

  /** Scalar summary of a quantized corpus (the oracle surface: DuckDB
    * replays the same floor arithmetic; arrays reduce to sum/min/max so
    * the comparison stays scalar). */
  def quantizeStats(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeInt8(df, idCol, vecCol).select(
      col(idCol),
      col("scale"),
      aggregate(col("qvec"), lit(0L), (acc, x) => acc + x.cast(LongType)).as("qsum"),
      array_min(col("qvec")).cast(LongType).as("qmin"),
      array_max(col("qvec")).cast(LongType).as("qmax"))
}
