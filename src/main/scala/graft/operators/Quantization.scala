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
