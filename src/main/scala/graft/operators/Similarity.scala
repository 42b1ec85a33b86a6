package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: queries are a small batch -> broadcast them; the corpus
  * streams through map-side cosine scoring; per-query top-k via window
  * rank after a partial per-partition top-k (Catalyst's TakeOrdered handles
  * the global cut). The IVF variant prunes the corpus to the probed
  * centroid cells first, turning a full scan into a fraction-of-corpus scan.
  */
object Similarity {

  /** Brute-force cosine top-k: every (query, corpus) pair is scored but
    * pairs never shuffle — queries are broadcast and scoring is map-only;
    * the only shuffle is the final per-query top-k. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", vectors.cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF-style ANN: assign corpus vectors to deterministic LSH cells
    * (random-hyperplane sign bits), probe only the query's cell plus
    * `nprobe-1` nearest cells by signature Hamming distance. At 100 TB the
    * corpus side is partitioned by cell so a probe touches a bounded slice. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      nprobe: Int = 8): DataFrame = {
    val cell = vectors.signBits(col(vecCol), bits)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"), cell.as("cell"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"), cell.as("qcell"))
    // probe cells: all cells within the Hamming radius that keeps ~nprobe
    // cells; for small `bits` enumerate 0- and 1-bit flips deterministically
    val flips = (0 until bits).map(i => lit(1L << i))
    val probeCells = array((lit(0L) +: flips).map(f => col("qcell").bitwiseXOR(f)): _*)
    val probed = q.withColumn("cell", explode(probeCells))
    val scored = c
      .join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", vectors.cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
