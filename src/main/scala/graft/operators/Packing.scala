package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: assign documents to fixed-token-budget training
  * shards in a deterministic global order (the step between "clean
  * corpus" and "tokenized shards" in an LLM data pipeline).
  *
  * A doc's shard is `floor(tokens_before_it / budget)` in doc-id order —
  * contiguous packing, the deterministic SQL-expressible form of greedy
  * shard filling. The global running sum is computed as a DISTRIBUTED
  * prefix sum: bucket by sampled id-range boundaries, one windowed
  * cumulative sum per bucket, then a broadcast of per-bucket prefix
  * totals — never a single-partition global window, which would
  * serialize 100 TB through one task.
  *
  * Bucket identity comes from the DATA (id vs sampled boundaries), not
  * from physical partition ids: `TaskContext.getPartitionId` /
  * `spark_partition_id` silently change under AQE partition coalescing
  * or a downstream `coalesce()`, which would corrupt the offsets.
  */
object Packing {

  /** `df` must carry a unique numeric id (cast to long) and a token
    * count. Returns (doc_id, n_tokens, shard_id).
    *
    * Plan shape: approx-quantile sample for `numBuckets-1` id cut points
    * -> per-bucket windowed cumulative sum (shuffle on the bucket key;
    * buckets process in parallel) -> tiny per-bucket totals agg
    * (numBuckets rows; the order-by window below runs over THAT, not the
    * data) -> broadcast join of prefix offsets. Boundary precision only
    * shifts bucket sizes, never the result — the cumsum is exact for any
    * monotone bucketing. */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budgetTokens: Long,
      numBuckets: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    // SQL `div` = exact integer division on longs (a double `/` would
    // lose precision once cumulative counts pass 2^53)
    globalOffsets(df, idCol, tokensCol, numBuckets)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"gstart div ${budgetTokens}L").as("shard_id"))
  }

  /** (doc_id, n_tokens, gstart): each doc's starting offset in the
    * doc-id-ordered global token stream, via the distributed prefix sum
    * described above. */
  private def globalOffsets(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      numBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    val nB =
      if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df.select(
      col(idCol).cast(LongType).as("doc_id"),
      coalesce(col(tokensCol).cast(LongType), lit(0L)).as("n_tokens"))
    val qs = (1 until nB).map(_.toDouble / nB).toArray
    val bounds =
      if (qs.isEmpty) Array.empty[Double]
      else base.stat.approxQuantile("doc_id", qs, 0.01)
    // monotone in doc_id: #boundaries strictly below the id
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      else Selection.boundsBucket(bounds.toSeq,
        col("doc_id").cast("double"), above = false)
    val wLocal = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // repartition by bucket FIRST: the window branch and the totals
    // branch then share ONE reused exchange (see Selection.boundsBucket)
    val parted = base.withColumn("bucket", bucketCol)
      .repartition(nB, col("bucket"))
    val local = parted.withColumn("cum_local", sum("n_tokens").over(wLocal))
    val totals = parted.groupBy("bucket").agg(sum("n_tokens").as("ptot"))
    val ow = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("poffset", coalesce(sum("ptot").over(ow), lit(0L)))
      .select("bucket", "poffset")
    local.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum_local") + col("poffset") - col("n_tokens")).as("gstart"))
  }

  /** Concat-and-split packing (the GPT pretraining shape): documents are
    * concatenated in doc-id order into ONE global token stream, the
    * stream is cut into fixed `seqLen`-token training sequences, and
    * each doc emits one row per sequence it overlaps:
    * (seq_id, doc_id, tok_begin, tok_end) — begin inclusive, end
    * exclusive, offsets WITHIN the sequence. This span map is the
    * attention-boundary/document-mask input a packed trainer needs (no
    * cross-document attention) and the inverse map for sample
    * attribution. Unlike [[packGreedy]] no token is padded or dropped:
    * every sequence except the last is exactly full.
    *
    * Scale: global offsets come from the same value-bucketed distributed
    * prefix sum (never a single-partition window); the explode emits
    * ceil(n_tokens/seqLen)+1 rows per doc — output-linear and map-only
    * after the prefix sum. Zero-token docs emit nothing. */
  def packConcat(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      seqLen: Long,
      numBuckets: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    globalOffsets(df, idCol, tokensCol, numBuckets)
      .filter(col("n_tokens") > 0)
      .withColumn("gend", col("gstart") + col("n_tokens"))
      .withColumn("seq_id", explode(sequence(
        expr(s"gstart div ${seqLen}L"), expr(s"(gend - 1) div ${seqLen}L"))))
      .select(col("seq_id"), col("doc_id"),
        (greatest(col("gstart"), col("seq_id") * seqLen)
          - col("seq_id") * seqLen).as("tok_begin"),
        (least(col("gend"), (col("seq_id") + lit(1L)) * seqLen)
          - col("seq_id") * seqLen).as("tok_end"))
  }

  /** Deterministic global shuffle + shard assignment — the EXPORT step of
    * a training-data pipeline: break source/crawl ordering (adjacent docs
    * from one domain must not land adjacent in training order) and split
    * the corpus into `numShards` balanced output shards with a stable
    * within-shard sequence. Order comes from md5(salt ‖ id): pseudo-random
    * but fully deterministic, so re-runs, backfills, and other engines
    * produce the SAME training order (no rand(), no partition-id
    * dependence — both break under retries/AQE).
    *
    * shard_id = first 4 hex digits of the hash as an int, mod numShards
    * (map-only); seq = rank within the shard by (hash, id). Scale: ONE
    * shuffle keyed by shard_id; each shard sorts independently (corpus/
    * numShards rows per task — pick numShards so a shard fits a task,
    * e.g. 100k shards at 100 TB), never a single global order-by. */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      salt: String = ""): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = md5(concat_ws(" ", lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy("shard_id").orderBy(col("h"), col("doc_id"))
    val keyed = df.select(
      col(idCol).as("doc_id"),
      h.as("h"),
      (conv(substring(h, 1, 4), 16, 10).cast(LongType) % numShards)
        .as("shard_id"))
    keyed
      .withColumn("seq", row_number().over(w).cast(LongType))
      .select(col("doc_id"), col("shard_id"), col("seq"))
  }

  /** Token-BALANCED shard assignment: documents stripe round-robin in
    * (n_tokens desc, doc_id) rank order — the distributed form of the
    * longest-processing-time heuristic. Because consecutive ranks land on
    * different shards and sizes shrink monotonically along the rank
    * order, shard token totals stay within one max-document of each
    * other — the equal-work sharding [[shuffleShards]]' hash striping
    * only achieves in expectation.
    *
    * The global rank is the same value-bucketed distributed machinery as
    * [[packGreedy]]: bucket by token-value quantiles (equal values never
    * straddle a bucket, so ranks are exact), one per-bucket window, tiny
    * bucket-count aggregate, broadcast offsets — no global window.
    * Deterministic integer arithmetic end to end. */
  def balancedShards(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      numShards: Int,
      numBuckets: Int = 0): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val spark = df.sparkSession
    val nB =
      if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df.select(
      col(idCol).cast(LongType).as("doc_id"),
      coalesce(col(tokensCol).cast(LongType), lit(0L)).as("n_tokens"))
    val qs = (1 until nB).map(_.toDouble / nB).toArray
    val bounds =
      if (qs.isEmpty) Array.empty[Double]
      else base.stat.approxQuantile("n_tokens", qs, 0.01)
    // monotone in the rank order: vb = #bounds strictly below the value,
    // so a larger vb ranks strictly earlier and ties share one bucket
    val vbucket =
      if (bounds.isEmpty) lit(0)
      else Selection.boundsBucket(bounds.toSeq,
        col("n_tokens").cast("double"), above = false)
    val wLocal = Window.partitionBy("vb")
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val parted = base.withColumn("vb", vbucket).repartition(nB, col("vb"))
    val local = parted.withColumn("rank_local", count(lit(1)).over(wLocal))
    val totals = parted.groupBy("vb").agg(count(lit(1)).as("n"))
    val ow = Window.orderBy(col("vb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum("n").over(ow), lit(0L)))
      .select("vb", "off")
    local.join(broadcast(offsets), "vb")
      .select(col("doc_id"), col("n_tokens"),
        ((col("rank_local") + col("off") - 1) % numShards).as("shard_id"))
  }
}
