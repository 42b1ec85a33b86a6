package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a dense (embedding cosine) ranking with a
  * sparse (BM25) ranking via Reciprocal Rank Fusion — the standard
  * first-stage retriever shape for RAG / hard-negative mining over a
  * training corpus.
  *
  * Scale design: both sides produce per-query TOP-K lists before
  * anything joins — the dense side broadcasts the (tiny) query set and
  * scores map-only with a partial top-k (`Similarity.bruteForceTopK`);
  * the sparse side is one global one-row aggregate per query (df/avgdl
  * as plan literals) plus a map-only score, and its top-k plans as
  * TakeOrderedAndProject (per-partition k rows, never the corpus,
  * reach the driver). The fusion join then touches only
  * `queries x (kDense + kSparse)` rows. Nothing here is super-linear
  * in corpus size, and ranks — not raw float scores — cross the
  * engine boundary, so results are engine-exact. */
object Retrieval {

  /** RRF over dense + sparse rankings.
    *
    * @param corpus        id + embedding vectors (dense side)
    * @param docs          id + text (sparse side); ids align with `corpus`
    * @param termsByQuery  query id -> BM25 terms; query vectors are the
    *                      corpus embeddings of those ids
    * @return (query_id, doc_id, fused_rank, dense_rank, sparse_rank)
    *         with absent-side ranks coalesced to 0
    */
  def hybridRrf(
      corpus: DataFrame,
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      textCol: String,
      termsByQuery: Seq[(Long, Seq[String])],
      kDense: Int,
      kSparse: Int,
      rrfK: Int = 60,
      topN: Int = 10): DataFrame = {
    require(termsByQuery.nonEmpty, "hybridRrf needs at least one query")
    val queryIds = termsByQuery.map(_._1)

    val dense = Similarity.bruteForceTopK(
        corpus, corpus.filter(col(idCol).isin(queryIds: _*)), idCol, vecCol, kDense)
      .select(col("query_id"), col("neighbor_id").as("id"), col("rank").as("dr"))

    // one bounded top-k per query; the union is queries * kSparse rows
    val sparse = termsByQuery.map { case (qid, terms) =>
      TextAnalysis.bm25(docs, idCol, textCol, terms)
        .select(lit(qid).as("query_id"), col(idCol).as("id"), col("bm25"))
        .orderBy(col("bm25").desc, col("id"))
        .limit(kSparse)
    }.reduce(_ unionAll _)
    val sw = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("id"))
    val sparseRanked = sparse
      .withColumn("sr", row_number().over(sw))
      .select(col("query_id"), col("id"), col("sr"))

    // RRF: 1/(rrfK + rank) per list the doc appears in; ranks are ints,
    // so both engines compute bit-identical doubles and the final order
    // (rrf desc, id asc) is deterministic
    val fusedScore =
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("dr")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("sr")), lit(0.0))
    val fw = Window.partitionBy(col("query_id"))
      .orderBy(col("_rrf").desc, col("id"))
    dense.join(sparseRanked, Seq("query_id", "id"), "full_outer")
      .withColumn("_rrf", fusedScore)
      .withColumn("fused_rank", row_number().over(fw))
      .filter(col("fused_rank") <= topN)
      .select(
        col("query_id"), col("id").as("doc_id"), col("fused_rank"),
        coalesce(col("dr"), lit(0)).as("dense_rank"),
        coalesce(col("sr"), lit(0)).as("sparse_rank"))
  }
}
