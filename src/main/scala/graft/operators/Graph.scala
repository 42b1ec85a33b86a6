package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Link-graph analytics over aggregated edge tables — the crawl-frontier
  * prioritization pass of a web-scale corpus pipeline (domain authority
  * decides which hosts are worth re-crawling and which are link farms).
  *
  * Scale design: the corpus is touched ONCE to aggregate (src, dst) edge
  * multiplicities; every PageRank iteration then runs over the aggregated
  * graph only — O(E) per iteration with E = distinct edges, independent of
  * corpus size. Iterations are plain keyed joins + hash aggregates
  * (shuffle keys: src then dst), so AQE skew handling and map-side partial
  * aggregation apply as usual. No driver-side collect anywhere: ranks stay
  * a distributed table keyed by node.
  *
  * Exactness: all arithmetic is integer (Long) with truncating division
  * (`div`), so results are bit-identical across engines and partitionings
  * regardless of aggregation order. Rank mass is scaled to `totalMass`
  * (default 1e12); per-edge contributions floor via `(r * w) div ow`.
  * Overflow bound: `r * w` requires `totalMass * maxEdgeWeight <
  * Long.MaxValue` — with the default mass that allows edge multiplicities
  * up to ~9.2e6. Beyond that (a 100 TB corpus funneling into few domain
  * pairs), pre-scale weights by a constant factor before calling (rank is
  * invariant to uniform weight scaling up to rounding).
  */
object Graph {

  /** Weighted PageRank with exact integer arithmetic over an aggregated
    * edge table `(srcCol, dstCol, wCol)`. Returns one row per node
    * (union of sources and destinations) with its final scaled rank.
    *
    * Dangling nodes (no out-edges) keep receiving teleport mass but
    * redistribute nothing — mass conservation is deliberately NOT
    * enforced so every iteration stays a single join + aggregate (the
    * classic dangling-mass correction needs a global sum per iteration;
    * rankings are unaffected for governance use).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      iterations: Int = 3,
      totalMass: Long = 1000000000000L,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    val e = edges.select(
        col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"),
        col(wCol).cast(LongType).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per node — the count is bounded by the domain universe, not
    // the corpus; it also eagerly materializes both persists so the 3
    // iteration plans reuse them instead of re-aggregating the input
    val n = math.max(nodes.count(), 1L)
    val base = totalMass / n
    val teleport = base * (100 - dampingPct) / 100
    val outw = e.groupBy("src").agg(sum(col("w")).as("ow"))
    var ranks = nodes.withColumn("r", lit(base))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(outw, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(r * w) div ow")).as("c"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(coalesce(c, 0L) * $dampingPct) div 100") + lit(teleport))
            .as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }
}
