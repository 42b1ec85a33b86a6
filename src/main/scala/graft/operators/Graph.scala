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

  /** Per-node triangle participation counts over an (optionally weighted)
    * edge table — the link-farm detector of a crawl graph: organic
    * neighborhoods close triangles, spam rings and scraped link lists
    * mostly don't (or close ALL of them — both extremes flag).
    *
    * Algorithm: compact-forward with DEGREE ORIENTATION. Edges are
    * undirected-ified and deduplicated, each node gets a total order by
    * (degree, node id), and every edge orients from the smaller to the
    * larger node under that order. Wedges then enumerate only at their
    * lowest-degree corner, so the join fan-out per node is bounded by its
    * ORIENTED out-degree — at most O(sqrt(E)) even for celebrity hubs —
    * instead of the raw degree squared. A hub with a million in-links
    * generates no wedges at all; the quadratic blowup of the naive
    * id-ordered enumeration on skewed graphs cannot happen. Output is
    * orientation-invariant (a triangle is a triangle however its edges
    * point), so any engine may verify with the simple id-ordering.
    *
    * Exactness: counts are exact Longs; each triangle contributes exactly
    * 1 to each of its three corners. Self-loops are dropped. */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val raw = edges.select(
        col(srcCol).cast(LongType).as("a"), col(dstCol).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
    val und = raw.select(
        least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (degree, node) total order — one degree aggregate over the dedup'd
    // undirected edges; the rank join is node-keyed (graph-sized, not
    // corpus-sized)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges enumerate at the triangle's orientation-minimum corner only:
    // that corner has out-edges to both others (the order is total and
    // acyclic), so each triangle yields exactly one wedge. The pair is
    // canonicalized x < y by id, matching `und`'s (a < b) edge form, so
    // one equi-join on (x, y) checks the closing edge
    val w1 = oriented.select(col("u"), col("v").as("x"))
    val w2 = oriented.select(col("u"), col("v").as("y"))
    val wedges = w1.join(w2, "u").filter(col("x") < col("y"))
    val closed = wedges.join(
      und.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    // no eager unpersist: the returned plan references `und` twice (wedge
    // closure + degree base) and `oriented` twice — the caller's action
    // materializes the persists and reuses them; LRU evicts after
    closed
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast(LongType).as("triangles"))
  }

  /** Semi-supervised LABEL PROPAGATION over an aggregated weighted edge
    * table: seeded nodes keep their label; every round, each unseeded
    * node adopts the weighted-majority label among its currently-labeled
    * neighbors (ties break to the SMALLEST label; nodes with no labeled
    * neighbor stay unlabeled). The taxonomy-spreading pass of a corpus
    * pipeline: a few thousand hand-labeled domains push topic/quality
    * labels across the whole link graph in `rounds` keyed joins.
    *
    * Scale design: every round is one edge-keyed join + one (node, label)
    * hash aggregate + one argmax aggregate over the graph — O(E) per
    * round, corpus-independent, no collects. Exactness: weights sum in
    * Long and the argmax orders by (votes DESC, label ASC) — bit-stable
    * under any partitioning. Edges are treated as directed influence
    * (label flows src -> dst); pass both directions for undirected. */
  def labelPropagate(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      seeds: DataFrame, // (node, label)
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(
        col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"),
        col(wCol).cast(LongType).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeded = seeds.select(
        col("node").cast(LongType).as("node"),
        col("label").cast(LongType).as("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labeled = seeded
    for (_ <- 1 to rounds) {
      val votes = e
        .join(labeled.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum(col("w")).as("votes"))
      val adopted = votes
        .groupBy("node")
        // argmax by (votes DESC, label ASC): max over (votes, -label)
        .agg(max(struct(col("votes"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      labeled = seeded.unionByName(
        adopted.join(seeded, Seq("node"), "left_anti"))
    }
    // `e` and `seeded` are each referenced once per round in the final
    // plan — persists materialize at the caller's action and are reused
    labeled.select(col("node"), col("label"))
  }
}
