package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{text, transforms, vectors}
import graft.operators.{Bpe, Clustering, Decontamination, Dedup, Graph, Multimodal, Packing, Profiling, Quantization, Retrieval, Sampling, Selection, Similarity, Sketches, TextAnalysis}
import graft.tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is deterministic and (where SQL-expressible) paired with a
  * DuckDB oracle in [[SparkEntry.oracleSql]]. Money/quantity aggregations
  * go through DECIMAL(12,2) so sums are exact and order-independent in
  * both engines (double summation order differs between Spark's partial
  * aggregation and DuckDB's sequential scan).
  */
object SparkEntry {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as both TIMESTAMP(NANOS) (which vanilla Spark
      // only reads as long via the legacy conf) and plain TIMESTAMP(MICROS)
      // (which Spark reads as TIMESTAMP_NTZ); normalize either encoding.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normEventsTs(s.read.parquet(s"$dir/$name.parquet"))
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  /** Streaming source over `<dir>/<name>.parquet`, adapting to both
    * testdata layouts: the generated SFs ship a single FILE (matched via
    * pathGlobFilter against the dir listing), while ScaleData's 10x
    * corpora are DIRECTORIES of part files (which that filter matches
    * nothing inside — every stream read 0 rows at sf1 before this). */
  private[graft] def streamTable(
      s: SparkSession, dir: String, name: String,
      sch: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = s"$dir/$name.parquet"
    val isDir = new java.io.File(p.stripPrefix("file:")).isDirectory
    if (isDir) s.readStream.schema(sch).parquet(p)
    else s.readStream.schema(sch)
      .option("pathGlobFilter", s"$name.parquet").parquet(dir)
  }

  /** Cleanup hook for long-lived drivers running many queries: several
    * operator cores persist bounded frames that the RETURNED plan
    * references (skewAdvisor's key counts, the overlap register table,
    * graph edge sets), so the closures themselves cannot unpersist
    * before the caller's action. Verify calls this between queries and
    * Bench between in-process groups, releasing both CacheManager
    * entries (df.persist) and localCheckpoint RDD blocks so cached
    * state never accumulates across hundreds of queries in one JVM. */
  private[graft] def releaseCache(s: SparkSession): Unit = {
    try s.catalog.clearCache() catch { case _: Throwable => }
    try s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    catch { case _: Throwable => }
  }

  /** Normalize the events `ts` column to session-zone TIMESTAMP micros
    * regardless of how the parquet encoded it: nanos-as-long (integer
    * division — double division loses micro precision on ns longs) or a
    * native timestamp column. NTZ→TZ cast is value-preserving because every
    * entry point pins spark.sql.session.timeZone=UTC, matching DuckDB's
    * naive-timestamp reading of the same file. Works on streaming DFs too. */
  private[graft] def normEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** exact decimal view of a 2-decimal double column */
  private def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** One row per word TRIGRAM of `text` (column `sh`) — the shared key
    * stream of the sketch queries. Tokens are the proven cross-engine
    * split (lower + non-alnum boundaries, empties dropped); shingles
    * join 3 consecutive tokens with single spaces. Map-only, so it
    * applies unchanged to STREAMING frames. */
  // round-14: the shingle pipeline is ONE compiled pass (ngramsJoinClean
  // — skip-empty tokenize + 3-gram space-join, bit-identical to the
  // previous filter(len>0) + transform(sequence, concat) HOF chain whose
  // stages were all CodegenFallback; equivalence property-tested in
  // KernelEquivalenceSpec). Feeds every sketch/stream shingle consumer:
  // stream_hll/stream_cm drains, stats_hll*, stats_countmin,
  // stats_cm_incremental, stats_hll_incremental/sources/overlap.
  private def shinglesOf(df: DataFrame, keep: Seq[String] = Nil): DataFrame =
    df.select((keep.map(col) :+ explode(graft.functions.text.ngramsJoinClean(
        split(lower(coalesce(col("text"), lit(""))), "[^a-z0-9]+"), 3))
      .as("sh")): _*)

  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    shinglesOf(t(s, dir, "documents"))

  /** The synthesized domain link graph shared by the graph_* queries:
    * one directed edge per document from a node of its source-domain
    * block to a deterministic doc-derived target — 20 nodes per domain,
    * cross-domain links, self-loops and duplicates included (operators
    * must handle them). One broadcast join; corpus-sized, never wider. */
  private def linkEdges(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val si = d.select(col("source")).distinct()
      .withColumn("sidx",
        (row_number().over(Window.orderBy(col("source"))) - 1)
          .cast(LongType))
      .withColumn("n_src", count(lit(1)).over(
        Window.partitionBy(lit(1))).cast(LongType))
    d.join(broadcast(si), "source")
      .select(
        (col("sidx") * 20 + pmod(col("doc_id"), lit(20))).as("src"),
        (pmod(col("sidx") + col("doc_id"), col("n_src")) * 20 +
          pmod(expr("doc_id div 7"), lit(20))).as("dst"))
  }

  /** fresh Iceberg table under tmp for a query, seeded from a source df */
  private[graft] def freshTable(
      s: SparkSession,
      name: String,
      src: DataFrame,
      spec: IceSchema => IcePartitionSpec = _ => IcePartitionSpec(0, Nil),
      properties: Map[String, String] = Map.empty): GraftTable = {
    val loc = s"${System.getProperty("java.io.tmpdir")}/graft-q/$name"
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    StorageCatalog.createOrReplaceTable(
      s.sparkContext.hadoopConfiguration, loc, schema, spec(schema), properties)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by region/year across region-nation-customer-orders-lineitem
    * with broadcast dims — the plan shape we want at 100 TB: small dims
    * broadcast, one shuffle for the aggregate. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val region = t(spark, dir, "region")
    val nation = t(spark, dir, "nation")
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    val lineitem = t(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
      .agg(
        sum(money(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - money(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("order_year"))
  }

  /** Setup/drain split for the benched STREAMING queries. The outer
    * call performs ALL harness work — table rebuilds, snapshot appends,
    * static-side prep — and the returned thunk starts the streaming
    * query, drains every micro-batch and returns the result frame: the
    * maintained OPERATION those bench rows exist to measure. Bench
    * times ONLY the thunk (`Bench.timeOpPart`, median over op-split
    * runs); round-11 adjudication
    * showed the combined closures' quiet-window spread at 2-4x — table
    * commits in the setup swamping the 1.3x flag threshold and
    * producing most of the round's recurring flag noise — so the
    * sanctioned metric is now DRAIN seconds. [[queries]] entries
    * compose setup+drain unchanged, so Verify/oracle semantics and the
    * sf1 scaling rows are untouched. */
  private[graft] def streamParts
      : Map[String, (SparkSession, String) => () => DataFrame] = Map(
    "stream_dedup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val tbl = freshTable(s, "stream_dedup", ev.limit(0))
      tbl.append(s, ev)
      tbl.append(s, ev) // exact replay commit
      () => {
        val name = s"stream_dedup_${System.nanoTime()}"
        val q = s.readStream.format("graft-stream")
          .option("location", tbl.location)
          .option("max-seqs-per-trigger", "1")
          .load()
          .withWatermark("ts", "3650 days")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.outputMode("append").format("memory").queryName(name).start()
        q.processAllAvailable()
        q.stop()
        s.table(name).groupBy(col("event_type")).agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
      }
    }),
    "stream_quality_gate" -> ((s, dir) => {
      val sch = s.read.parquet(s"$dir/documents.parquet").schema
      val seed = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .limit(0)
      val tbl = freshTable(s, "stream_quality_gate", seed)
      () => {
        // the %3 slice gains a stopword sentence (as in pipeline_webclean)
        // so the required-stopwords rule has passers; the word-count rule
        // still splits the stream both ways
        val shaped = streamTable(s, dir, "documents", sch)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(col("text"), lit(" the data would be part of and that we have with it")))
              .otherwise(col("text")))
        val q = TextAnalysis.gopherRules(
            shaped, "doc_id", "text", keepCols = Seq("lang", "source", "n_chars"))
          .filter(col("pass"))
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .writeStream.format("graft-stream")
          .option("location", tbl.location)
          .option("checkpointLocation", s"${tbl.location}/_chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        StorageCatalog.loadTable(s.sparkContext.hadoopConfiguration, tbl.location)
          .scan(s)
      }
    }),
    "stream_decontaminate" -> ((s, dir) => {
      val sch = s.read.parquet(s"$dir/documents.parquet").schema
      val seed = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source")).limit(0)
      val tbl = freshTable(s, "stream_decontaminate", seed)
      val bench = t(s, dir, "documents")
        .filter(col("doc_id") % 50 === 0).select(col("text")).distinct()
      () => {
        val q = streamTable(s, dir, "documents", sch)
          .join(bench, Seq("text"), "left_anti")
          .select(col("doc_id"), col("lang"), col("source"))
          .writeStream.format("graft-stream")
          .option("location", tbl.location)
          .option("checkpointLocation", s"${tbl.location}/_chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        StorageCatalog.loadTable(s.sparkContext.hadoopConfiguration, tbl.location)
          .scan(s)
      }
    }),
    "stream_ann_index" -> ((s, dir) => {
      // setup = the even-half IVF index BUILD (an ML k-means fit — the
      // one-time cost); drain = the streamed odd half riding
      // addToIvfIndex per micro-batch + the probe across generations
      val e = t(s, dir, "embeddings")
      val loc = java.nio.file.Files
        .createTempDirectory("graft-ivf-stream").toUri.toString.stripSuffix("/")
      Similarity.buildIvfIndex(
        e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", loc)
      val sch = s.read.parquet(s"$dir/embeddings.parquet").schema
      () => {
        val q = streamTable(s, dir, "embeddings", sch)
          .filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"), col("embedding"))
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            if (!b.isEmpty)
              Similarity.addToIvfIndex(s, loc, b, "vec_id", "embedding")
          }
          .option("checkpointLocation", s"$loc/_chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val queries = e.filter(col("vec_id") < 4).select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
        Similarity.ivfIndexTopK(s, loc, queries, "vec_id", "embedding", 5)
          .filter(col("rank") === 1)
          .select(col("query_id"), col("neighbor_id"), col("rank"))
      }
    }),
    "stream_markov" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val tbl = freshTable(s, "stream_markov", ev.limit(0))
      tbl.append(s, ev.filter(col("ts") < lit("2024-01-08")))
      tbl.append(s, ev.filter(col("ts") >= lit("2024-01-08")))
      () => {
        val name = s"stream_markov_${System.nanoTime()}"
        val src = s.readStream.format("graft-stream")
          .option("location", tbl.location)
          .option("max-seqs-per-trigger", "1")
          .load()
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("event_type"))
        val q = graft.streaming.StatefulTransitions.transitions(src)
          .writeStream.outputMode("append").format("memory").queryName(name)
          .start()
        q.processAllAvailable()
        q.stop()
        // the memory sink holds one driver row PER EVENT — aggregate it
        // eagerly to the |types|^2-bounded matrix and release the sink, so
        // repeated invocations (bench runs, 100x probes) don't accumulate
        // event-sized driver tables (a production run writes transitions
        // to a table sink and never materializes them on the driver)
        val rows = s.table(name)
          .groupBy("prev_type", "next_type")
          .agg(count(lit(1)).as("n_transitions"))
          .withColumn("_t", sum(col("n_transitions")).over(
            Window.partitionBy(col("prev_type"))))
          .select(col("prev_type"), col("next_type"), col("n_transitions"),
            expr("(n_transitions * 1000000) div _t").as("ppm"))
          .collect().toSeq
        s.catalog.dropTempView(name)
        s.createDataFrame(
          s.sparkContext.parallelize(rows, 1),
          StructType(Seq(
            StructField("prev_type", StringType), StructField("next_type", StringType),
            StructField("n_transitions", LongType), StructField("ppm", LongType))))
      }
    }),
    "stream_hll" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val tbl = freshTable(s, "stream_hll", d.limit(0))
      tbl.append(s, d.filter(pmod(col("doc_id"), lit(2)) === 0))
      tbl.append(s, d.filter(pmod(col("doc_id"), lit(2)) === 1))
      () => {
        val (bucket, rank) = Sketches.hllParts(col("sh"), pHex = 2)
        val name = s"stream_hll_${System.nanoTime()}"
        val q = shinglesOf(s.readStream.format("graft-stream")
            .option("location", tbl.location)
            .option("max-seqs-per-trigger", "1").load())
          .select(bucket.as("bucket"), rank.as("rank"))
          .groupBy("bucket").agg(max(col("rank")).as("mr"))
          .writeStream.outputMode("complete").format("memory")
          .queryName(name).start()
        q.processAllAvailable()
        q.stop()
        Sketches.hllEstimate(s.table(name), pHex = 2)
      }
    }),
    "stream_cm" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val tbl = freshTable(s, "stream_cm", d.limit(0))
      tbl.append(s, d.filter(pmod(col("doc_id"), lit(2)) === 0))
      tbl.append(s, d.filter(pmod(col("doc_id"), lit(2)) === 1))
      () => {
        val name = s"stream_cm_${System.nanoTime()}"
        val cells = array((0 until 4).map { i =>
          pmod(conv(substring(md5(concat(lit(i.toString), lit("|"),
            col("sh"))), 1, 15), 16, 10).cast(LongType), lit(512L))
        }: _*)
        val q = shinglesOf(s.readStream.format("graft-stream")
            .option("location", tbl.location)
            .option("max-seqs-per-trigger", "1").load())
          .select(posexplode(cells).as(Seq("salt", "cell")))
          .groupBy(col("salt").cast(LongType).as("salt"), col("cell"))
          .agg(count(lit(1)).cast(LongType).as("c"))
          .writeStream.outputMode("complete").format("memory")
          .queryName(name).start()
        q.processAllAvailable()
        q.stop()
        s.table(name)
      }
    }),
  )

  /** Setup/op split for NON-streaming bench rows whose setup — batch-1
    * state builds staged through graft tables — would otherwise dominate
    * the timed value (the [[streamParts]] rationale; dml rows get the
    * equivalent split via Bench.dmlOps). The thunk is the maintained
    * OPERATION the sanctioned row measures; [[queries]] entries compose
    * setup+op, so Verify/oracle semantics are unchanged. */
  private[graft] def opParts
      : Map[String, (SparkSession, String) => () => DataFrame] = Map(
    "dedup_cc_incremental" -> ((s, dir) => {
      // setup = batch-1 (even docs) clustering + BOTH persisted states:
      // the label table (identity-partitioned on cbucket) and the
      // minhash index carrying components. op = everything a new batch
      // pays: odd-doc pair generation (vs index + within batch),
      // contraction, batch-sized CC, delta emission.
      val docs = t(s, dir, "documents")
      val evens = docs.filter(col("doc_id") % 2 === 0)
      val odds = docs.filter(col("doc_id") % 2 === 1)
      val l1 = Dedup.textComponents(evens, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      val ltbl = freshTable(s, "cc_labels",
        l1.withColumn("cbucket", pmod(col("component"), lit(16L))),
        spec = sch => IcePartitionSpec(0, List(IcePartitionField(
          sch.findField("cbucket").get.id, 1000, "identity", "cbucket_p"))))
      ltbl.append(s, l1.withColumn("cbucket", pmod(col("component"), lit(16L))))
      val idx = Dedup.minhashIndex(evens, "doc_id", "text",
          shingleSize = 2, bands = 16, rowsPerBand = 4)
        .join(l1, Seq("doc_id"), "left")
      val itbl = freshTable(s, "cc_index", idx)
      itbl.append(s, idx)
      () => {
        val newOld = Dedup.incrementalPairs(odds, itbl.scan(s),
            "doc_id", "text", shingleSize = 2, bands = 16, rowsPerBand = 4,
            jaccardThreshold = 0.4, keepIndexCols = Seq("component"))
          .select(col("nid").as("sa"),
            coalesce(col("component"), col("iid")).as("sb"))
        val newNew = Dedup.minhashLsh(odds, "doc_id", "text",
            shingleSize = 2, bands = 16, rowsPerBand = 4,
            jaccardThreshold = 0.4)
          .select(col("a").as("sa"), col("b").as("sb"))
        Dedup.mergeComponentLabels(ltbl.scan(s),
          newOld.unionByName(newNew), "sa", "sb",
          bucketCol = Some(("cbucket", 16)))
      }
    }),
    "dedup_cc_writeback" -> ((s, dir) => {
      // the FULL incremental-CC maintenance cycle, oracle-gated end to
      // end: setup = batch-1 clustering + both persisted state tables
      // (dedup_cc_incremental's setup, distinct table names). op =
      // batch-2 pair generation + contracted merge + the WRITE-BACK
      // (Dedup.applyComponentDelta: label upsert + index component
      // refresh + batch index append) + the final label-table read —
      // what a production crawl cycle actually commits. The oracle is
      // the full-corpus all-pairs-Jaccard CC: the chained table must
      // EQUAL the full recompute doc for doc, which only holds if both
      // write-back legs (labels AND index) landed correctly.
      val docs = t(s, dir, "documents")
      val evens = docs.filter(col("doc_id") % 2 === 0)
      val odds = docs.filter(col("doc_id") % 2 === 1)
      val l1 = Dedup.textComponents(evens, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      val withB = l1.withColumn("cbucket", pmod(col("component"), lit(16L)))
      // write.upsert.dedup=false: the write-back upserts carry UNIQUE
      // keys by construction (one label row per doc in the delta; the
      // index refresh and batch-append slices are disjoint halves of
      // the corpus), so the upsert's within-batch last-wins window — a
      // keyed shuffle of the WIDE index rows (shingle sets + band
      // keys) — is pure overhead here (round-13)
      val noDedup = Map("write.upsert.dedup" -> "false")
      val ltbl = freshTable(s, "ccw_labels", withB,
        spec = sch => IcePartitionSpec(0, List(IcePartitionField(
          sch.findField("cbucket").get.id, 1000, "identity", "cbucket_p"))),
        properties = noDedup)
      ltbl.append(s, withB)
      val idx = Dedup.minhashIndex(evens, "doc_id", "text",
          shingleSize = 2, bands = 16, rowsPerBand = 4)
        .join(l1, Seq("doc_id"), "left")
      val itbl = freshTable(s, "ccw_index", idx, properties = noDedup)
      itbl.append(s, idx)
      () => {
        val newOld = Dedup.incrementalPairs(odds, itbl.scan(s),
            "doc_id", "text", shingleSize = 2, bands = 16, rowsPerBand = 4,
            jaccardThreshold = 0.4, keepIndexCols = Seq("component"))
          .select(col("nid").as("sa"),
            coalesce(col("component"), col("iid")).as("sb"))
        val newNew = Dedup.minhashLsh(odds, "doc_id", "text",
            shingleSize = 2, bands = 16, rowsPerBand = 4,
            jaccardThreshold = 0.4)
          .select(col("a").as("sa"), col("b").as("sb"))
        val delta = Dedup.mergeComponentLabels(ltbl.scan(s),
          newOld.unionByName(newNew), "sa", "sb",
          bucketCol = Some(("cbucket", 16)))
        Dedup.applyComponentDelta(s, ltbl, itbl, delta,
          Dedup.minhashIndex(odds, "doc_id", "text",
            shingleSize = 2, bands = 16, rowsPerBand = 4),
          bucketCol = Some(("cbucket", 16)))
        ltbl.scan(s).select(col("doc_id"), col("component"))
      }
    }),
    "graph_rank_incremental" -> ((s, dir) => {
      // setup = batch-1 (even docs) edge aggregation persisted as the
      // EDGE-WEIGHT graft table (the saturated domain graph — its row
      // count is scale-invariant). op = everything a new crawl batch
      // pays: the batch's own edge aggregate (the ONLY corpus touch,
      // O(batch)), a key-merged weight upsert into the edge table
      // (equality-delete touched (src,dst) + append summed rows — the
      // delta is edge-bounded and broadcasts), and PageRank re-run over
      // the aggregated edge table alone — O(E) keyed joins independent
      // of corpus size. History documents are never re-read.
      val d = t(s, dir, "documents")
      // the source->sidx dictionary is the stable domain index (a
      // dimension table in production); both batches must share it
      val si = d.select(col("source")).distinct()
        .withColumn("sidx",
          (row_number().over(Window.orderBy(col("source"))) - 1)
            .cast(LongType))
        .withColumn("n_src", count(lit(1)).over(
          Window.partitionBy(lit(1))).cast(LongType))
      def edgesOf(docs: DataFrame): DataFrame = docs
        .join(broadcast(si), "source")
        .select(
          (col("sidx") * 20 + pmod(col("doc_id"), lit(20))).as("src"),
          (pmod(col("sidx") + col("doc_id"), col("n_src")) * 20 +
            pmod(expr("doc_id div 7"), lit(20))).as("dst"))
      val e1 = edgesOf(d.filter(col("doc_id") % 2 === 0))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val etbl = freshTable(s, "rank_edges", e1)
      etbl.append(s, e1)
      () => {
        // batch delta: O(batch) corpus touch, aggregated to edge keys
        val delta = edgesOf(d.filter(col("doc_id") % 2 === 1))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        // pin the pre-merge snapshot: merged/fresh plans must read the
        // OLD weights even though they execute after the delete below
        val snap = etbl.metadata.currentSnapshotId.get
        val old = etbl.scan(s, snapshotId = Some(snap))
        val merged = old
          .join(broadcast(delta.select(col("src"), col("dst"),
            col("w").as("dw"))), Seq("src", "dst"))
          .select(col("src"), col("dst"), (col("w") + col("dw")).as("w"))
        val fresh = delta.join(
          broadcast(old.select(col("src"), col("dst"))),
          Seq("src", "dst"), "left_anti")
        // touched keys rewrite; untouched edge rows are never rewritten
        etbl.equalityDelete(s, merged.select(col("src"), col("dst")),
          Seq("src", "dst"))
        etbl.append(s, merged.unionByName(fresh))
        val edges = etbl.scan(s)
        val outw = edges.groupBy(col("src").as("node"))
          .agg(sum(col("w")).as("out_weight"))
        Graph.pageRank(edges, "src", "dst", "w", iterations = 3)
          .join(outw, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("out_weight"), lit(0L)).as("out_weight"),
            col("rank_scaled"))
      }
    }),
    "ann_beam" -> ((s, dir) => {
      // setup = the one-time navigable-graph BUILD: deterministic
      // k-means cells + the SYMMETRIZED cell-local top-5 edge set
      // (embed_knn_graph's certified shape — its bench row prices this
      // build; at sf10 the build dominates any walk). op = the search:
      // IVF-routed entry + three beam-of-8 layers + final top-3 — the
      // per-query cost a deployed graph index actually pays.
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
      val k = math.max(4, (e.count() / 250).toInt)
      val (_, asg) = Clustering.kmeansFit(e, "vec_id", "embedding",
        k = k, iters = 1)
      val withCell = e.select(col("vec_id"),
          transform(col("embedding"), x =>
            floor(x.cast(DoubleType) * 1024).cast(LongType)).as("nv"))
        .join(asg, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // codegen'd integer dot (round-13): bit-identical to the
      // aggregate(zip_with(*)) fold (same Long math, same order), but
      // compiled — the interpreted HOF was the walk's per-row hot spot
      val dot = vectors.dotLong(col("qv"), col("nv"))
      // SYMMETRIZED top-5 edges: HNSW/NSW links are bidirectional — a
      // hub every node points AT becomes a waypoint OUT of every node,
      // which is what makes greedy descent navigable. Measured at
      // sf0.001: directed-only walks hit 5/8 exact rank-1 and 62%
      // top-3 overlap; symmetric 6/8 and 79% (EntrySpec pins the
      // floors) — approximate BY DESIGN, the recall/candidate-volume
      // trade the beam exists to make
      val knn = withCell
        .select(col("cluster"), col("vec_id").as("src"), col("nv").as("qv"))
        .join(withCell.select(col("cluster"), col("vec_id").as("dst"),
          col("nv")), Seq("cluster"))
        .filter(col("src") =!= col("dst"))
        .withColumn("dot_q", dot)
        .withColumn("r", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("dot_q").desc, col("dst"))))
        .filter(col("r") <= 5)
        .select(col("src"), col("dst"))
      val edges = knn
        .unionByName(knn.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // eager materialization: persists are lazy, and without these the
      // first WALK would pay the whole graph build inside the timed op
      withCell.count()
      edges.count()
      val reps = withCell.groupBy("cluster").agg(min(col("vec_id")).as("rep"))
      val qvecs = withCell.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("nv").as("qv"), col("cluster"))
      () => {
        // round-13 walk plan: each layer previously paid TWO keyed
        // shuffles — a (qid, node) distinct, then a row_number window
        // over qid. Both now fold into ONE groupBy(qid) aggregate:
        // collect_set dedups candidates, and the per-query top-beam is
        // an in-row sort/slice over the <= beam x (degree+1) element
        // set. Ordering is exact: struct(-dot_q, node) sorts ascending
        // = (dot desc, node asc), the window's order (negation cannot
        // overflow: |dot| <= dims x scale^2 = 2^46). Candidate pairs
        // duplicated between the frontier and an edge are rescored
        // twice and collapsed by the set — cheaper than the distinct
        // shuffle that prevented it, now that the dot is a codegen'd
        // kernel. 2 Exchange per layer -> 1; same rows out.
        var frontier = qvecs.join(reps, Seq("cluster"))
          .select(col("qid"), col("rep").as("node"))
        def rescore(f: org.apache.spark.sql.DataFrame) = f
          .join(withCell.select(col("vec_id").as("node"), col("nv")), "node")
          .join(broadcast(qvecs.select(col("qid"), col("qv"))), "qid")
          .withColumn("dot_q", dot)
        def topSet(scored: org.apache.spark.sql.DataFrame, k: Int) = scored
          .groupBy(col("qid"))
          .agg(slice(array_sort(collect_set(
            struct((-col("dot_q")).as("nd"), col("node")))), 1, k).as("top"))
        for (_ <- 1 to 3) {
          val cand = frontier.unionByName(
            frontier.join(edges, frontier("node") === edges("src"))
              .select(col("qid"), col("dst").as("node")))
          frontier = topSet(rescore(cand), 8)
            .select(col("qid"), explode(col("top.node")).as("node"))
        }
        topSet(rescore(frontier).filter(col("node") =!= col("qid")), 3)
          .select(col("qid"), posexplode(col("top")).as(Seq("p", "s")))
          .select(col("qid").as("query_id"), col("s.node").as("neighbor_id"),
            (col("p") + 1).cast(LongType).as("rank"))
      }
    }),
    "ann_beam_index" -> ((s, dir) => {
      // setup = the one-time DURABLE graph-index build: quantized
      // vectors + symmetrized cell-local top-5 edges persisted as graft
      // tables identity-partitioned by id bucket (~64 rows/bucket, the
      // ann_ivf_index layout applied to a navigable graph). op = the
      // WALK with partition-pruned point reads: each layer's adjacency
      // and rescore probes open only the frontier's buckets —
      // <= beam x (degree+1) x |queries| x bucketTarget rows of I/O per
      // layer, INDEPENDENT of corpus size — closing ann_beam's one
      // scale wrinkle (its in-session rescore streams the whole cached
      // vector table once per layer). Same integer walk, same result,
      // same oracle replica as ann_beam.
      val e = t(s, dir, "embeddings")
      val loc = java.nio.file.Files
        .createTempDirectory("graft-beam-index").toUri.toString.stripSuffix("/")
      Similarity.buildGraphIndex(e, "vec_id", "embedding", loc)
      () => Similarity.graphIndexTopK(s, loc, queryIds = 0L until 8L)
    }),
    "stats_hll_incremental" -> ((s, dir) => {
      // setup = batch-1 (even docs) per-source HLL registers persisted
      // as the SKETCH-STATE table (<=256 rows per source). op = what a
      // new crawl pays: its own register aggregate (O(batch)), a
      // max-merge upsert (only registers the batch RAISES rewrite —
      // max-merge means most rows go untouched as the sketch
      // saturates), estimates off the merged state. Cross-crawl NDV
      // tracking where history text is never re-shingled.
      val d = t(s, dir, "documents")
      def regsOf(docs: DataFrame): DataFrame = {
        val (bucket, rank) = Sketches.hllParts(col("sh"), pHex = 2)
        shinglesOf(docs, keep = Seq("source"))
          .select(col("source"), bucket.as("bucket"), rank.as("rank"))
          .groupBy("source", "bucket").agg(max(col("rank")).as("mr"))
      }
      val r1 = regsOf(d.filter(pmod(col("doc_id"), lit(2)) === 0))
      val rtbl = freshTable(s, "hll_regs", r1)
      rtbl.append(s, r1)
      () => {
        val rb = regsOf(d.filter(pmod(col("doc_id"), lit(2)) === 1))
        val snap = rtbl.metadata.currentSnapshotId.get
        val old = rtbl.scan(s, snapshotId = Some(snap))
        val raised = rb
          .join(old.select(col("source"), col("bucket"),
            col("mr").as("omr")), Seq("source", "bucket"))
          .filter(col("mr") > col("omr"))
          .select(col("source"), col("bucket"), col("mr"))
        val fresh = rb.join(old.select("source", "bucket"),
          Seq("source", "bucket"), "left_anti")
        rtbl.equalityDelete(s, raised.select("source", "bucket"),
          Seq("source", "bucket"))
        rtbl.append(s, raised.unionByName(fresh))
        Sketches.hllEstimateBy(rtbl.scan(s), "source", pHex = 2)
      }
    }),
    "stats_cm_incremental" -> ((s, dir) => {
      // setup = batch-1 count-min cells persisted as the state table
      // (<=2,048 rows at ANY corpus size). op = the batch's own sketch
      // (O(batch)) sum-merged in (counts add — the same mergeability
      // stream_cm proves under micro-batching, here as a durable
      // TABLE); the merged sketch is returned whole.
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      def cellsOf(docs: DataFrame): DataFrame =
        Sketches.countMin(shinglesOf(docs), col("sh"), depth = 4, width = 512)
      val c1 = cellsOf(d.filter(pmod(col("doc_id"), lit(2)) === 0))
      val ctbl = freshTable(s, "cm_cells", c1)
      ctbl.append(s, c1)
      () => {
        val cb = cellsOf(d.filter(pmod(col("doc_id"), lit(2)) === 1))
        val snap = ctbl.metadata.currentSnapshotId.get
        val old = ctbl.scan(s, snapshotId = Some(snap))
        val bumped = cb
          .join(old.select(col("salt"), col("cell"), col("c").as("oc")),
            Seq("salt", "cell"))
          .select(col("salt"), col("cell"), (col("c") + col("oc")).as("c"))
        val fresh = cb.join(old.select("salt", "cell"),
          Seq("salt", "cell"), "left_anti")
        ctbl.equalityDelete(s, bumped.select("salt", "cell"),
          Seq("salt", "cell"))
        ctbl.append(s, bumped.unionByName(fresh))
        ctbl.scan(s).select(col("salt"), col("cell"), col("c"))
      }
    }),
    "stats_quantiles_incremental" -> ((s, dir) => {
      // setup = batch-1 doc-length bucket histogram persisted as the
      // state table. op = the batch's own histogram (O(batch))
      // sum-merged in, then the permille read: cumulative windows over
      // the BOUNDED merged histogram + the targeted re-read of only the
      // rank-carrying buckets (pushable value-range filters) — the
      // corpus-wide histogram pass of exactPermilles becomes O(batch)
      // maintenance, and reads pay O(slice), at any history size.
      val d = t(s, dir, "documents")
      val h1 = Sketches.valueHistogram(
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "n_chars", 64L)
      val htbl = freshTable(s, "len_hist", h1)
      htbl.append(s, h1)
      () => {
        val hb = Sketches.valueHistogram(
          d.filter(pmod(col("doc_id"), lit(2)) === 1), "n_chars", 64L)
        val snap = htbl.metadata.currentSnapshotId.get
        val old = htbl.scan(s, snapshotId = Some(snap))
        val bumped = hb
          .join(old.select(col("b"), col("bc").as("obc")), Seq("b"))
          .select(col("b"), (col("bc") + col("obc")).as("bc"))
        val fresh = hb.join(old.select("b"), Seq("b"), "left_anti")
        htbl.equalityDelete(s, bumped.select("b"), Seq("b"))
        htbl.append(s, bumped.unionByName(fresh))
        Sketches.exactPermillesFromHist(d, "n_chars", "doc_id",
          htbl.scan(s).select(col("b"), col("bc")),
          permilles = Seq(500, 900, 990), bucketWidth = 64L)
      }
    }),
  )

  /** union of every setup/op-split bench row — what Bench.median and
    * TimeQ (default package, hence public) time op-only; stream rows
    * additionally carry the 1.5x flag band */
  def timedParts
      : Map[String, (SparkSession, String) => () => DataFrame] =
    streamParts ++ opParts

  /** One entry per implemented operator from SURVEY.md §2 + the pipeline
    * operator set. Keys match [[oracleSql]]; non-SQL-expressible operators
    * (bucket transform, LSH/minhash/simhash, ANN, stub decode) get a
    * rows-only check and are covered by unit tests instead. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (Spark supplies the algebra; scan is ours) ----
    "q1_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val one = lit(1).cast(DecimalType(12, 2))
      li.filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(money(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          (sum(money(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"))
    }),
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15"))
      val one = lit(1).cast(DecimalType(12, 2))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q5_local_suppliers" -> ((s, dir) => {
      val one = lit(1).cast(DecimalType(12, 2))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
        .groupBy(col("n_name"))
        .agg(sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
    }),
    "q_top_customers" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          sum(money(col("o_totalprice"))).cast(DoubleType).as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("o_custkey"))
        .limit(10)
    }),
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          money(col("o_totalprice")).cast(DoubleType).as("o_totalprice"), col("rn"))
    }),
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("running_orders"),
        sum(money(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"))
    }),
    "q_distinct_agg" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          countDistinct(col("c_mktsegment")).as("n_segments"),
          count(lit(1)).as("n_customers"),
          sum(money(col("c_acctbal"))).cast(DoubleType).as("total_acctbal"))
    }),
    "q_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
    }),
    "q_set_ops" -> ((s, dir) => {
      val custNations = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      val suppNations = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
      custNations.intersect(suppNations)
        .union(custNations.except(suppNations))
        .distinct()
    }),
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(money(col("c_acctbal"))).cast(DoubleType).as("total_acctbal"),
          count(lit(1)).as("n_customers"))
    }),
    "q6_revenue_forecast" -> ((s, dir) => {
      // pure filter + aggregate: predicate pushdown all the way down
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(sum(money(col("l_extendedprice")) * money(col("l_discount")))
          .cast(DoubleType).as("revenue"))
    }),
    "q19_disjunctive" -> ((s, dir) => {
      // OR-of-ANDs predicate across a join (Catalyst pushes the common part)
      val one = lit(1).cast(DecimalType(12, 2))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)))
        .agg(
          sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),
    "q7_nation_volume" -> ((s, dir) => {
      // bidirectional nation-pair trade volume by ship year (TPC-H Q7
      // shape): two broadcast copies of the nation dim, symmetric OR
      // filter, one shuffle for the final aggregate
      val one = lit(1).cast(DecimalType(12, 2))
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("l_year"))
        .agg(sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
    }),
    "q8_market_share" -> ((s, dir) => {
      // market-share ratio by order year (TPC-H Q8 shape): conditional
      // share of one supplier nation inside a region/part-type slice;
      // exact decimal sums, a single double division at the end
      val one = lit(1).cast(DecimalType(12, 2))
      val vol = money(col("l_extendedprice")) * (one - money(col("l_discount")))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))),
          col("c_nationkey") === col("c_nk"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("s_nk"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_2", vol)
            .otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType) /
          sum(vol).cast(DoubleType)).as("mkt_share"))
    }),
    "q9_product_profit" -> ((s, dir) => {
      // profit by supplier nation and order year over a part-name slice
      // (TPC-H Q9 shape; testdata has no partsupp, so profit = revenue
      // without the supplycost term)
      val one = lit(1).cast(DecimalType(12, 2))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_name").contains("red"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
          .cast(DoubleType).as("sum_profit"))
    }),
    "q13_order_distribution" -> ((s, dir) => {
      // customer order-count distribution (TPC-H Q13): LEFT OUTER join so
      // zero-order customers survive, two cascaded aggregates
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),
    "q15_top_supplier" -> ((s, dir) => {
      // top supplier by quarterly revenue (TPC-H Q15): aggregate-max as a
      // broadcast scalar, equality on EXACT decimals (doubles only at the
      // output boundary — decimal compare is order-independent)
      val one = lit(1).cast(DecimalType(12, 2))
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(money(col("l_extendedprice")) * (one - money(col("l_discount")))).as("total_rev"))
      rev.join(broadcast(rev.agg(max(col("total_rev")).as("max_rev"))),
          col("total_rev") === col("max_rev"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_revenue"))
    }),
    "q17_small_quantity" -> ((s, dir) => {
      // correlated-average filter (TPC-H Q17): per-part mean quantity as a
      // co-grouped aggregate, semi-joined to the brand slice FIRST so the
      // average is only computed for surviving parts (at 100 TB the
      // correlated aggregate must not scan every part)
      val brandParts = broadcast(t(s, dir, "part")
        .filter(col("p_brand") === "Brand#3").select(col("p_partkey")))
      val li = t(s, dir, "lineitem")
        .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      // quantities are integer-valued: the double avg is exact-sum/IEEE-div,
      // identical in Spark and DuckDB; 0.5* keeps the threshold exact
      val partAvg = li.groupBy(col("l_partkey").as("avg_pk"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(partAvg, col("l_partkey") === col("avg_pk"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((sum(money(col("l_extendedprice"))).cast(DoubleType) / lit(7.0)).as("avg_yearly"))
    }),
    "q18_large_orders" -> ((s, dir) => {
      // large-volume orders (TPC-H Q18): HAVING-filtered aggregate joined
      // back to the fact — the aggregate side shrinks first, then joins
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("big_ok"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("big_ok"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
          money(col("o_totalprice")).cast(DoubleType).as("o_totalprice"),
          col("total_qty").cast(DoubleType).as("total_qty"))
    }),
    "q21_blamed_supplier" -> ((s, dir) => {
      // EXISTS + NOT EXISTS chain (TPC-H Q21 shape; testdata has no
      // commit/receipt dates, so "late" = returnflag R): suppliers of one
      // nation whose R-line sits in a multi-supplier order where no OTHER
      // supplier has an R line — semi- then anti-join on the same fact
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
      val l2 = li.select(col("l_orderkey").as("e_ok"), col("l_suppkey").as("e_sk"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ne_ok"), col("l_suppkey").as("ne_sk"))
      l1.join(l2, col("l_orderkey") === col("e_ok") && col("l_suppkey") =!= col("e_sk"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("ne_ok") && col("l_suppkey") =!= col("ne_sk"),
          "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),
    "q22_idle_customers" -> ((s, dir) => {
      // global-average threshold + anti-join (TPC-H Q22 shape; no phone
      // column, so country = nation key; every customer has SOME order in
      // this data, so "idle" = no order since 2000): scalar aggregate
      // broadcast to every row, NOT EXISTS as a left-anti join
      val c = t(s, dir, "customer")
      val thresh = c.filter(col("c_acctbal") > 0)
        .agg((sum(money(col("c_acctbal"))).cast(DoubleType) / count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(thresh))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01")).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast(LongType).as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(money(col("c_acctbal"))).cast(DoubleType).as("totacctbal"))
    }),
    "q2_min_cost_supplier" -> ((s, dir) => {
      // min-cost supplier per part (TPC-H Q2 shape; testdata has no
      // partsupp, so the part-supplier offer relation is distilled from
      // lineitem): correlated MIN realized as an aggregate + join-back,
      // dims broadcast, total ORDER BY so the LIMIT is deterministic
      val slice = broadcast(t(s, dir, "part")
        .filter(col("p_size") === 15).select(col("p_partkey"), col("p_brand")))
      // semi-join the fact to the part slice BEFORE the offer aggregate:
      // only sliced parts need offers, so the groupBy shuffles a small
      // fraction of lineitem instead of all of it (the at-scale shape)
      val offers = t(s, dir, "lineitem")
        .join(broadcast(slice.select(col("p_partkey").as("sl_pk"))),
          col("l_partkey") === col("sl_pk"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(money(col("l_extendedprice")) ).as("offer_cost"))
      val sliced = offers.join(slice, col("l_partkey") === col("p_partkey"))
      val minCost = sliced.groupBy(col("l_partkey").as("mc_pk"))
        .agg(min(col("offer_cost")).as("min_cost"))
      sliced
        .join(minCost, col("l_partkey") === col("mc_pk") &&
          col("offer_cost") === col("min_cost"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(money(col("s_acctbal")).cast(DoubleType).as("s_acctbal"),
          col("s_name"), col("n_name"), col("p_partkey"), col("p_brand"),
          col("offer_cost").cast(DoubleType).as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),
    "q11_important_parts" -> ((s, dir) => {
      // value-concentration (TPC-H Q11 shape): per-part value for one
      // nation's suppliers, kept only above a fraction of the TOTAL value
      // — the threshold is a broadcast scalar aggregate; comparisons on
      // exact decimals, doubles only at the output boundary
      val natSupp = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
      val li = t(s, dir, "lineitem")
        .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(money(col("l_extendedprice"))).as("value_dec"))
      val thresh = perPart.agg(
        (sum(col("value_dec")) * lit(0.001).cast(DecimalType(12, 6))).as("min_value"))
      perPart.crossJoin(broadcast(thresh))
        .filter(col("value_dec") > col("min_value"))
        .select(col("l_partkey"), col("value_dec").cast(DoubleType).as("part_value"))
    }),
    "q16_supplier_count" -> ((s, dir) => {
      // supplier-count by part attributes (TPC-H Q16 shape): DISTINCT
      // suppliers per (brand,type,size) from the lineitem-derived offer
      // relation, minus an excluded-supplier anti-join (acctbal<0 stands
      // in for the complaints predicate)
      val parts = broadcast(t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(5, 10, 15, 20, 25, 30))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
      val excl = broadcast(t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey")))
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),
    "q20_promotion_parts" -> ((s, dir) => {
      // qualifying-supplier chain (TPC-H Q20 shape): suppliers of one
      // nation whose 1997 shipments of a name-sliced part exceed half of
      // that (part,supplier)'s all-time quantity — correlated aggregate
      // as a join of two co-keyed aggregates, then a semi-join up the
      // chain to the supplier dim (quantities are integer-valued, so the
      // double sums are exact and the 0.5* threshold is engine-portable)
      val green = broadcast(t(s, dir, "part")
        .filter(col("p_name").contains("blue")).select(col("p_partkey")))
      val li = t(s, dir, "lineitem")
        .join(green, col("l_partkey") === col("p_partkey"), "left_semi")
      val all = li.groupBy(col("l_partkey").as("a_pk"), col("l_suppkey").as("a_sk"))
        .agg(sum(col("l_quantity")).as("qty_all"))
      val y97 = li
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty_97"))
      val qual = y97.join(all,
          col("l_partkey") === col("a_pk") && col("l_suppkey") === col("a_sk"))
        .filter(col("qty_97") > lit(0.5) * col("qty_all"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),
    "q4_order_priority" -> ((s, dir) => {
      // EXISTS semi-join (with a non-equi condition) + count per priority
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1998-01-01"))
      o.join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),
    "q10_returned_items" -> ((s, dir) => {
      val one = lit(1).cast(DecimalType(12, 2))
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),
    "q12_shipmode" -> ((s, dir) => {
      // conditional (CASE WHEN) aggregation
      val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!highPrio, 1L).otherwise(0L)).as("low_line_count"))
    }),
    "q14_promo_share" -> ((s, dir) => {
      // conditional revenue ratio (exact decimal, then one double division)
      val one = lit(1).cast(DecimalType(12, 2))
      val rev = money(col("l_extendedprice")) * (one - money(col("l_discount")))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast(DoubleType) * lit(100.0) / sum(rev).cast(DoubleType)).as("promo_share"))
    }),
    "pipeline_quality_filter" -> ((s, dir) => {
      // quality-gate filter: the standard pre-training corpus cleanup shape
      val q = TextAnalysis.qualityScores(t(s, dir, "documents"), "doc_id", "text")
      q.filter(col("n_tokens") >= 50 && col("n_tokens") <= 500 &&
        col("stopword_ratio") < lit(0.5) && col("mean_word_len") < lit(12.0))
        .select(col("doc_id"))
    }),
    // ---- events: time windows, sessionization, latest-per-key ----
    "q_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(money(col("value"))).cast(DoubleType).as("total_value"))
    }),
    "q_events_sessions" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapped = t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_new", when(
          col("prev_us").isNull ||
            (unix_micros(col("ts")) - col("prev_us")) > lit(1800L * 1000000L), 1L)
          .otherwise(0L))
        .withColumn("session_idx", sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      gapped.groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
    }),
    "q_events_range" -> ((s, dir) => {
      // point-in-interval range join: clicks landing inside the 6-hour
      // window after each purchase by the same user. Bucketized at the
      // window width — a hash join on (user, bucket), never a
      // nested-loop BETWEEN join
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("interval_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("end_ts"))
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("event_id").as("click_id"), col("ts"))
      graft.operators.RangeJoin.pointInInterval(
          clicks, purchases, Seq("user_id"), "ts", "start_ts", "end_ts",
          bucketSeconds = 6 * 3600L)
        .select(col("interval_id"), col("click_id"))
    }),
    // ---- round 10 (§2.25) ----
    "text_boilerplate" -> ((s, dir) => {
      // per-source boilerplate-line report: docs are re-lined (8 tokens
      // per line, the corpus has no native newlines) and every doc of a
      // source gains that source's footer line — the report must surface
      // exactly those planted footers (plus any organically repeated
      // line) with per-source df and doc share
      // tokens materialize ONCE per row ("_tk"): an index lambda over
      // the raw split expression re-tokenizes the doc per line (O(len²))
      val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => length(x) > 0)
      val lined = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), toks.as("_tk"))
        .select(
          col("doc_id"), col("source"),
          concat(
            array_join(
              transform(
                sequence(lit(0), floor((size(col("_tk")) - 1) / 8).cast(IntegerType)),
                i => array_join(slice(col("_tk"), i * lit(8) + lit(1), lit(8)), " ")),
              "\n"),
            lit("\n"), concat(lit("subscribe to "), col("source"),
              lit(" for daily updates"))).as("text"))
      TextAnalysis.boilerplateLines(lined, "doc_id", "text", "source",
        sep = "\n", minDocs = 10L)
    }),
    "text_novelty" -> ((s, dir) => {
      // bigram novelty of the odd-id half against the even-id reference:
      // the freshness audit a "new" crawl batch gets before it is paid
      // for — novelty collapsing to zero means the batch re-serves the
      // reference corpus
      val d = t(s, dir, "documents")
      TextAnalysis.ngramNovelty(
        d.filter(col("doc_id") % 2 === 1), d.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", n = 2)
    }),
    "embed_matryoshka" -> ((s, dir) => {
      // matryoshka 64->16 truncation audit: per-vector norm of the kept
      // prefix and the squared-mass fraction it retains
      Quantization.matryoshkaStats(t(s, dir, "embeddings"),
        "vec_id", "embedding", dims = 16)
    }),
    "embed_outliers" -> ((s, dir) => {
      // centroid-cosine outlier gate over the embedding corpus
      // (integer-quantized sums — engine-exact); planted junk: vec_id<3
      // are NEGATED copies of themselves (anti-centroid direction)
      val e = t(s, dir, "embeddings")
      val shaped = e.select(col("vec_id"),
        when(col("vec_id") < 3,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      Similarity.centroidOutliers(shaped, "vec_id", "embedding",
        minCosine = -0.05)
    }),
    "ann_range" -> ((s, dir) => {
      // radius search: all corpus vectors within cosine >= 0.5 of each
      // jittered query (the planted near-dups score ~1, everything else
      // ~0 — the threshold sits in the void between the two modes)
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.rangeSearch(e, queries, "vec_id", "embedding", minCosine = 0.5)
    }),
    "stream_decontaminate" -> ((s, dir) => {
      // decontamination INSIDE Structured Streaming: the bench set (every
      // doc_id % 50 == 0 text) broadcasts as the static side of a
      // stream-static left-anti join; only clean docs commit to the
      // table. Setup/drain split lives in [[streamParts]].
      streamParts("stream_decontaminate")(s, dir)()
    }),
    "stream_ann_index" -> ((s, dir) => {
      // STREAMING index maintenance: the IVF index builds over the even
      // half of the corpus, then the odd half ARRIVES AS A STREAM
      // (AvailableNow) and every micro-batch rides addToIvfIndex —
      // drift-gated argmin assignment + identity-partitioned append,
      // exactly-once per batch. The probe afterwards must find planted
      // neighbors from BOTH the built and the streamed generations. The
      // production shape: tonight's crawl embeds, streams into the
      // index, and is searchable at dawn with no rebuild. Setup (the
      // k-means index build) / drain (stream + probe) split lives in
      // [[streamParts]].
      streamParts("stream_ann_index")(s, dir)()
    }),
    "ice_rewrite_deletes" -> ((s, dir) => {
      // rewrite_position_delete_files: two DELETE WHERE passes stack two
      // position-delete files; the rewrite compacts them into one (per
      // partition) and drops fully-deleted entries — the scan afterwards
      // must be byte-identical to the logical state
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val tbl = freshTable(s, "ice_rewrite_deletes", src)
      tbl.append(s, src)
      tbl.deleteWhere(s, col("o_orderkey") % 10 === 0)
      tbl.deleteWhere(s, col("o_orderkey") % 7 === 3)
      val after = tbl.rewritePositionDeleteFiles(s)
      val posLeft = after.planFiles(after.metadata.currentSnapshot.get)
        .count(_.file.content == 1)
      require(posLeft <= 1, s"rewrite left $posLeft pos-delete files")
      after.scan(s).select(col("o_orderkey"), col("o_orderstatus"))
    }),
    "mix_token_budget" -> ((s, dir) => {
      // token-budget planning table: per-source observed tokens vs a
      // uniform target share of a 10M-token budget — allocation and the
      // epochs over each source it implies. ONE bounded aggregate + a
      // broadcast one-row total; integer token counts keep every share
      // engine-exact
      val budget = 10000000L
      val d = t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(text.tokenCount(col("text")).cast(LongType))
          .as("tokens"))
      val nSrc = d.select(countDistinct(col("source")).as("n")).crossJoin(
        d.select(sum(col("tokens")).as("total")))
      d.crossJoin(broadcast(nSrc))
        .select(col("source"), col("tokens"),
          round(col("tokens").cast(DoubleType) / col("total"), 6).as("obs_share"),
          floor(lit(budget) / col("n")).cast(LongType).as("alloc_tokens"))
        .withColumn("epochs",
          round(col("alloc_tokens").cast(DoubleType) / col("tokens"), 6))
    }),
    "text_collocations" -> ((s, dir) => {
      // collocation mining: top-50 adjacent word pairs by LIFT
      // `P(xy) / (P(x)P(y)) = c_xy * N / (c_x * c_y)` — exact long
      // products cast to double (all < 2^53 at these counts, so the
      // ranking is engine-exact; log-PMI would rank identically but
      // compare transcendentals). Two token-keyed hash aggregates + one
      // broadcast vocab join; the corpus never shuffles as documents.
      // the token array MATERIALIZES once per row ("_w") — an index
      // lambda over the raw split expression would re-tokenize the whole
      // document PER ELEMENT (O(len²), measured 9 s vs <1 s at sf0.1)
      val w = filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0)
      val docsW = t(s, dir, "documents").select(w.as("_w"))
      val toks = docsW.select(explode(col("_w")).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      // corpus token total derived IN-PLAN from the unigram aggregate
      // (sum of its counts) instead of a second `toks.count()` action —
      // at 100 TB that action was a full extra corpus read+tokenize;
      // Catalyst's ReuseExchange shares the one unigram shuffle between
      // the x-join, the y-join and this 1-row total
      val nTotal = uni.agg(sum(col("c")).cast(LongType).as("n_total"))
      val bi = docsW
        .select(explode(
          when(size(col("_w")) >= 2,
            transform(sequence(lit(0), size(col("_w")) - 2),
              i => struct(
                element_at(col("_w"), i + 1).as("x"),
                element_at(col("_w"), i + 2).as("y"))))
            .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("p"))
        .select(col("p.x"), col("p.y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
      bi
        .join(broadcast(uni.select(col("tok").as("x"), col("c").as("c_x"))), "x")
        .join(broadcast(uni.select(col("tok").as("y"), col("c").as("c_y"))), "y")
        .crossJoin(broadcast(nTotal))
        .select(
          concat_ws(" ", col("x"), col("y")).as("bigram"),
          col("c_xy"),
          ((col("c_xy") * col("n_total")).cast(DoubleType) /
            (col("c_x") * col("c_y")).cast(DoubleType)).as("_lift"))
        .orderBy(col("_lift").desc, col("bigram"))
        .limit(50)
        .select(col("bigram"), col("c_xy"), round(col("_lift"), 6).as("lift"))
    }),
    "dedup_shingle_profile" -> ((s, dir) => {
      // shingle document-frequency profile in log2 bands — the table
      // read BEFORE choosing a dedup maxDf cap (how Zipfian is this
      // corpus? how many grams would a df gate drop?). One (gram)-keyed
      // aggregate over distinct (doc, gram) pairs + one bounded rollup.
      val w = filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0)
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), w.as("_w")) // materialized once (see above)
        .select(col("doc_id"), explode(
          when(size(col("_w")) >= 2,
            transform(sequence(lit(0), size(col("_w")) - 2),
              i => concat_ws(" ",
                element_at(col("_w"), i + 1), element_at(col("_w"), i + 2))))
            .otherwise(array().cast("array<string>"))).as("gram"))
        .distinct()
      grams.groupBy("gram").agg(count(lit(1)).as("df"))
        .groupBy(floor(log2(col("df"))).cast(LongType).as("df_band"))
        .agg(count(lit(1)).as("n_shingles"), max(col("df")).as("max_df"))
    }),
    "cluster_topics" -> ((s, dir) => {
      // cluster TOPIC LABELING: the deterministic integer k-means cells
      // joined with their most DISTINCTIVE words — per cluster, top-5 by
      // exact-integer cluster lift, the cross-multiplied comparison of
      // in-cluster token share vs corpus token share:
      //   score = c_in * total_tokens - c_total * cluster_tokens
      // (> 0 iff the word is over-represented in the cell; boilerplate
      // that saturates every cluster scores ~0 everywhere, so no df gate
      // is needed). Ties break word asc. Long products stay < 2^63 up to
      // ~1e14 corpus tokens; past that, pre-scale counts to ppm. The
      // human-readable face of cluster_kmeans: what IS bucket 3?
      //
      // 100 TB: token rows shuffle by word once (corpus totals) and by
      // (cluster, word) once; the doc->cluster and word-keyed joins
      // carry NO broadcast hints — both sides are corpus/vocab-sized at
      // scale, so they must stay shuffle joins (AQE auto-broadcasts at
      // test scale); only the 1-row token total broadcasts. The final
      // window runs over k × vocab rows, not the corpus.
      val assigned = Clustering.kmeansAssign(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 1)
      val w = filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0)
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), w.as("_w"))
        .select(col("doc_id"), explode(col("_w")).as("word"))
        .join(assigned.select(col("vec_id").as("doc_id"), col("cluster")), "doc_id")
      val wordTot = toks.groupBy("word")
        .agg(count(lit(1)).cast(LongType).as("c_total"))
      val clTot = toks.groupBy("cluster")
        .agg(count(lit(1)).cast(LongType).as("cluster_tokens"))
      val grand = wordTot.agg(sum(col("c_total")).cast(LongType).as("total_tokens"))
      val cw = toks
        .groupBy(col("cluster"), col("word"))
        .agg(count(lit(1)).cast(LongType).as("c"))
        .join(wordTot, "word")
        .join(clTot, "cluster")
        .crossJoin(broadcast(grand))
        .withColumn("score",
          col("c") * col("total_tokens") - col("c_total") * col("cluster_tokens"))
      val rw = Window.partitionBy(col("cluster"))
        .orderBy(col("score").desc, col("word"))
      cw.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 5)
        .select(col("cluster"), col("rank").cast(LongType).as("rank"),
          col("word"), col("c"), col("score"))
    }),
    "text_vocab_sweep" -> ((s, dir) => {
      // tokenizer-fit sweep: the OOV-vs-vocab-size curve from ONE
      // unigram aggregate — for each min-count cutoff m, the vocabulary
      // is every word seen >= m times; the row reports the resulting
      // vocab size, the OOV token mass and its integer ppm rate. The
      // table a tokenizer-training run reads before picking a vocab.
      //
      // 100 TB: one token-keyed shuffle builds the unigram table, then
      // ONE conditional aggregate computes every cutoff — no global
      // per-word window, no second corpus pass; the unpivot runs over
      // a single driver-free 1-row frame.
      val w = filter(split(lower(col("text")), "[^a-z0-9]+"), x => length(x) > 0)
      val uni = t(s, dir, "documents")
        .select(w.as("_w"))
        .select(explode(col("_w")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
      val cuts = Seq(2L, 4L, 8L, 16L, 32L)
      val one = uni.agg(
        sum(col("c")).cast(LongType).as("total_tokens"),
        cuts.flatMap(m => Seq(
          count(when(col("c") >= m, 1)).cast(LongType).as(s"vt_$m"),
          coalesce(sum(when(col("c") < m, col("c"))), lit(0L))
            .cast(LongType).as(s"oov_$m"))): _*)
      val stacked = cuts
        .map(m => s"${m}L, vt_$m, oov_$m")
        .mkString(s"stack(${cuts.size}, ", ", ", ") AS (min_count, vocab_types, oov_tokens)")
      one.select(col("total_tokens"), expr(stacked))
        .select(col("min_count"), col("vocab_types"), col("oov_tokens"),
          col("total_tokens"),
          floor(col("oov_tokens") * lit(1000000L) / col("total_tokens"))
            .cast(LongType).as("oov_ppm"))
    }),
    "text_domains" -> ((s, dir) => {
      // URL/domain extraction + per-domain curation gates: each doc
      // carries a deterministic synthetic url (host varies with source
      // and doc_id, some www-prefixed, some with tracking params);
      // extraction = regexp host -> registrable domain, then ONE hash
      // aggregate per domain: docs, chars, corpus share in ppm, and the
      // two gates a crawl curator applies first — trap-suspect (share
      // above 2%) and thin-content (mean chars under 300). Map-only
      // extraction; the rollup shuffles one row per doc by domain.
      val d = t(s, dir, "documents").withColumn("url",
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit("-"), pmod(col("doc_id"), lit(20)),
          lit(".example.org/p/"), col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("?utm=tracker"))
            .otherwise(lit(""))))
      val host = regexp_extract(col("url"), "^https?://([^/?#]+)", 1)
      val dom = regexp_replace(host, "^www\\.", "")
      val per = d.select(dom.as("domain"), col("n_chars"))
        .groupBy("domain")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"))
      val tot = per.agg(sum(col("n_docs")).as("corpus_docs")) // bounded
      per.crossJoin(broadcast(tot))
        .select(col("domain"), col("n_docs"), col("total_chars"),
          floor(col("n_docs") * lit(1000000L) / col("corpus_docs"))
            .cast(LongType).as("share_ppm"),
          (col("n_docs") * lit(50) > col("corpus_docs")).as("trap_suspect"),
          (col("total_chars") < col("n_docs") * lit(300)).as("thin_content"))
    }),
    "text_pii_sources" -> ((s, dir) => {
      // PII scan — the redaction-pipeline governance table: per source,
      // docs carrying any PII, hits by type (email / phone / IPv4) and
      // the char mass a redaction pass would remove. PII is planted
      // deterministically (same convention as text_watermark's canary):
      // every 11th doc an email, every 13th a phone, every 17th an IP.
      // Map-only regexp counts + one rollup; the redaction delta is
      // length(text) - length(redacted) computed IN the same pass — at
      // 100 TB this is the audit that runs before any corpus ships.
      val email = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
      val phone = "555-[0-9]{4}"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      val seeded = t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13)) === 0,
            concat(lit(" call 555-01"),
              lpad(pmod(col("doc_id"), lit(100)).cast(StringType), 2, "0")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(17)) === 0,
            concat(lit(" from 192.168."), pmod(col("doc_id"), lit(256)),
              lit("."), pmod(col("doc_id"), lit(100))))
            .otherwise(lit(""))))
      val redacted = regexp_replace(regexp_replace(regexp_replace(
        col("text"), email, "[PII]"), phone, "[PII]"), ip, "[PII]")
      seeded
        .select(col("source"),
          regexp_count(col("text"), lit(email)).as("_em"),
          regexp_count(col("text"), lit(phone)).as("_ph"),
          regexp_count(col("text"), lit(ip)).as("_ip"),
          (length(col("text")) - length(redacted)).cast(LongType).as("_delta"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast(LongType).as("docs"),
          sum(when(col("_em") + col("_ph") + col("_ip") > 0, 1L)
            .otherwise(0L)).as("pii_docs"),
          sum(col("_em")).cast(LongType).as("email_hits"),
          sum(col("_ph")).cast(LongType).as("phone_hits"),
          sum(col("_ip")).cast(LongType).as("ip_hits"),
          sum(col("_delta")).cast(LongType).as("redact_char_delta"))
    }),
    "cluster_cells" -> ((s, dir) => {
      // cell-balance governance for the clustered corpus — the table
      // read before deciding "re-center or keep appending" (the drift
      // gate's complement): per cell, size, corpus share in ppm, and an
      // imbalance flag (cell holds >2x its fair share — a skew-salting
      // or re-center trigger at scale). One count aggregate over the
      // assignment; the share join broadcasts one row.
      val assigned = Clustering.kmeansAssign(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 1)
      val per = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).cast(LongType).as("n_vectors"))
      val tot = per.agg(sum(col("n_vectors")).cast(LongType).as("total"))
      per.crossJoin(broadcast(tot))
        .select(col("cluster"), col("n_vectors"),
          floor(col("n_vectors") * lit(1000000L) / col("total"))
            .cast(LongType).as("share_ppm"),
          (col("n_vectors") * lit(4) > col("total") * lit(2)).as("imbalanced"))
    }),
    "dedup_url" -> ((s, dir) => {
      // URL-canonicalization dedup: the CHEAPEST dedup tier, applied
      // before any content hashing — strip scheme variance, www, query
      // strings and fragments, lowercase the host, and group. Output is
      // one row per canonical url with >1 copies: copy count and the
      // canonical survivor (min doc_id). Map-only normalization + one
      // url-keyed aggregate; at 100 TB this collapses re-crawls and
      // tracking-param variants for the price of a string hash.
      val d = t(s, dir, "documents").withColumn("url",
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit("-"), pmod(col("doc_id"), lit(20)),
          lit(".example.org/p/"), pmod(col("doc_id"), lit(100)),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("?utm=tracker"))
            .otherwise(lit(""))))
      val canon = regexp_replace(
        regexp_replace(lower(col("url")), "[?#].*$", ""),
        "^https?://(www\\.)?", "")
      d.select(canon.as("canonical_url"), col("doc_id"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).cast(LongType).as("n_copies"),
          min(col("doc_id")).as("canonical_doc"))
        .filter(col("n_copies") > 1)
    }),
    "graph_domain_rank" -> ((s, dir) => {
      // domain-authority ranking for crawl-frontier prioritization:
      // PageRank (3 iterations, exact integer arithmetic) over the
      // synthesized domain link graph. The corpus is touched ONCE to
      // aggregate edge multiplicities (each doc emits one deterministic
      // src->dst domain link — the same source/doc_id modular scheme as
      // text_domains, with the target source rotated by doc_id so links
      // cross sources); every iteration then runs over the aggregated
      // graph only — O(E) joins independent of corpus size.
      val edges = linkEdges(s, dir).groupBy("src", "dst")
        .agg(count(lit(1)).as("w"))
      val outw = edges.groupBy(col("src").as("node"))
        .agg(sum(col("w")).as("out_weight"))
      Graph.pageRank(edges, "src", "dst", "w", iterations = 3)
        .join(outw, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("out_weight"), lit(0L)).as("out_weight"),
          col("rank_scaled"))
    }),
    "graph_rank_incremental" -> ((s, dir) => {
      // INCREMENTAL authority maintenance: the edge-weight table
      // persists as a graft table (the saturated domain graph); a new
      // crawl batch touches the corpus ONCE for its own edge aggregate
      // (O(batch)), key-merges the weights into the table (equality
      // delete touched (src,dst) + append summed rows), and PageRank
      // re-runs over the aggregated edge table alone — history
      // documents are never re-read, and because edge weights merge by
      // addition the result is EXACTLY the full-corpus ranking (the
      // oracle runs graph_domain_rank's full recompute; EntrySpec
      // asserts row-for-row equality between the two queries). Setup
      // (batch-1 edge table) / op (batch-2 merge + rank) split lives
      // in [[opParts]]; the bench times the op only.
      opParts("graph_rank_incremental")(s, dir)()
    }),
    "pipeline_domains" -> ((s, dir) => {
      // authority-gated curation: the graph op feeding an actual corpus
      // decision. Docs map to their hosting domain node; a doc is
      // dropped if its domain is (a) a trap suspect (>2% corpus share —
      // the text_domains gate; every 13th doc routes through node 0, a
      // planted "aggregator" domain concentrated enough to trip it) or
      // (b) low-authority (its PageRank is in the bottom half of nodes
      // by (rank, node) order — an exact integer median cut over the
      // bounded rank table, never the corpus). The hosting mod uses
      // doc_id div 20 because the generator correlates source with
      // doc_id % 20 — the % 20 mapping would collapse to one domain per
      // source (5% share each: every domain a trap, nothing kept).
      // One persisted corpus pass feeds edges, shares and the gate join.
      val d = t(s, dir, "documents")
      val si = d.select(col("source")).distinct()
        .withColumn("sidx",
          (row_number().over(Window.orderBy(col("source"))) - 1)
            .cast(LongType))
        .withColumn("n_src", count(lit(1)).over(
          Window.partitionBy(lit(1))).cast(LongType))
      val docs = d.join(broadcast(si), "source")
        .select(col("source"), col("doc_id"),
          when(pmod(col("doc_id"), lit(13)) === 0, lit(0L))
            .otherwise(col("sidx") * 20 +
              pmod(expr("doc_id div 20"), lit(20))).as("src"),
          (pmod(col("sidx") + col("doc_id"), col("n_src")) * 20 +
            pmod(expr("doc_id div 7"), lit(20))).as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = docs.groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val ranks = Graph.pageRank(edges, "src", "dst", "w", iterations = 3)
      // bottom-half cut and trap share over the NODE table (bounded)
      val ranked = ranks
        .withColumn("_pos", row_number().over(
          Window.orderBy(col("rank_scaled"), col("node"))).cast(LongType))
        .withColumn("_n", count(lit(1)).over(
          Window.partitionBy(lit(1))).cast(LongType))
        .select(col("node").as("_node"),
          (col("_pos") * 2 <= col("_n")).as("low_authority"))
      val nodeDocs = docs.groupBy(col("src")).agg(count(lit(1)).as("_nd"))
        .withColumn("_tot", sum(col("_nd")).over(Window.partitionBy(lit(1))))
        .select(col("src").as("_tnode"),
          (col("_nd") * 50 > col("_tot")).as("trap_suspect"))
      docs
        .join(broadcast(ranked), col("src") === col("_node"))
        .join(broadcast(nodeDocs), col("src") === col("_tnode"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("low_authority") && !col("trap_suspect"), 1L)
            .otherwise(0L)).as("kept_docs"),
          sum(when(col("low_authority"), 1L).otherwise(0L))
            .as("dropped_low_authority"),
          sum(when(col("trap_suspect") && !col("low_authority"), 1L)
            .otherwise(0L)).as("dropped_trap"))
    }),
    "graph_triangles" -> ((s, dir) => {
      // triangle census over the domain link graph — the link-farm
      // detector (organic neighborhoods close triangles; spam rings and
      // scraped lists sit at the extremes). Same one-pass edge synthesis
      // as graph_domain_rank; the count itself is compact-forward with
      // DEGREE ORIENTATION, so wedge fan-out is bounded by oriented
      // out-degree (O(sqrt E) even at celebrity hubs) — the id-ordered
      // naive join would go quadratic on exactly the hub nodes a 100 TB
      // crawl graph has. Output is orientation-invariant, so the oracle
      // verifies with the simple id-order enumeration.
      Graph.triangleCounts(linkEdges(s, dir), "src", "dst")
    }),
    "graph_label_prop" -> ((s, dir) => {
      // semi-supervised label propagation: a seed set of hand-labeled
      // domains (every 5th node, label = node mod 3 — the topic taxonomy
      // proxy) pushes labels across the weighted link graph in 2 rounds
      // of weighted-majority voting (ties to the smallest label). Each
      // round is one edge-keyed join + two bounded aggregates over the
      // AGGREGATED graph — O(E) per round, corpus-independent. The
      // production shape: a few thousand labeled domains classify the
      // whole 100 TB crawl frontier without touching document text.
      val edges = linkEdges(s, dir)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes.filter(pmod(col("node"), lit(5)) === 0)
        .select(col("node"), pmod(col("node"), lit(3)).as("label"))
      Graph.labelPropagate(edges, "src", "dst", "w", seeds, rounds = 2)
    }),
    "text_redact" -> ((s, dir) => {
      // PII REDACTION write-path (the per-doc companion of the
      // text_pii_sources audit): emit, for every doc that carries PII,
      // the typed mask counts, the char delta, and the md5 of the
      // REDACTED text — the content hash downstream dedup and integrity
      // checks run on after the redaction pass. Map-only: three
      // regexp_replace + one regexp_count each, one corpus pass, no
      // shuffle at all (the filter keeps ~1 in 4 docs).
      val email = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
      val phone = "555-[0-9]{4}"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      val seeded = t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13)) === 0,
            concat(lit(" call 555-01"),
              lpad(pmod(col("doc_id"), lit(100)).cast(StringType), 2, "0")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(17)) === 0,
            concat(lit(" from 192.168."), pmod(col("doc_id"), lit(256)),
              lit("."), pmod(col("doc_id"), lit(100))))
            .otherwise(lit(""))))
      val redacted = regexp_replace(regexp_replace(regexp_replace(
        col("text"), email, "[EMAIL]"), phone, "[PHONE]"), ip, "[IP]")
      seeded
        .select(col("doc_id"),
          regexp_count(col("text"), lit(email)).cast(LongType).as("emails"),
          regexp_count(col("text"), lit(phone)).cast(LongType).as("phones"),
          regexp_count(col("text"), lit(ip)).cast(LongType).as("ips"),
          (length(col("text")) - length(redacted)).cast(LongType)
            .as("char_delta"),
          md5(redacted).as("redacted_md5"))
        .filter(col("emails") + col("phones") + col("ips") > 0)
    }),
    "text_label_kappa" -> ((s, dir) => {
      // label-quality audit: Cohen's kappa between two independent
      // heuristic gates (length >= 500 chars; >= 5 sentence periods) —
      // the agreement table read before trusting any single gate as a
      // training signal. Exact integer arithmetic end to end: the four
      // confusion cells sum in one hash aggregate (ONE corpus pass);
      // kappa_ppm = (n*agree - chance) * 1e6 div (n^2 - chance) computes
      // in DECIMAL(38,0), overflow-safe at any corpus size. The planted
      // gates correlate positively by construction, so the numerator is
      // non-negative and truncating vs flooring division agree.
      val d = t(s, dir, "documents")
      val cells = d.select(
          (col("n_chars") >= 500).cast(LongType).as("a"),
          (regexp_count(col("text"), lit("\\.")) >= 5).cast(LongType).as("b"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(col("a") * col("b")).cast(LongType).as("n11"),
          sum(col("a") * (lit(1L) - col("b"))).cast(LongType).as("n10"),
          sum((lit(1L) - col("a")) * col("b")).cast(LongType).as("n01"),
          sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).cast(LongType)
            .as("n00"))
      // all products ride DECIMAL(38,0); `div` is integral division (both
      // engines floor identically on the non-negative operands here).
      // Degenerate-gate guard: when either gate is CONSTANT over the
      // corpus (e.g. every doc >= 500 chars), chance = n^2 and the
      // denominator is 0 — kappa is undefined, pinned to 0 in BOTH
      // engines (the replica carries the same CASE) instead of Spark's
      // NULL-on-div-by-zero diverging from whatever DuckDB does
      val chance = "(CAST(n11+n10 AS DECIMAL(38,0)) * (n11+n01)" +
        " + CAST(n01+n00 AS DECIMAL(38,0)) * (n10+n00))"
      cells.select(col("n").as("n_docs"),
        col("n11").as("both_pass"), col("n00").as("both_fail"),
        col("n10").as("only_length"), col("n01").as("only_periods"),
        expr("(CAST(n11+n00 AS DECIMAL(38,0)) * 1000000) div n")
          .as("agree_ppm"),
        expr(s"CASE WHEN CAST(n AS DECIMAL(38,0)) * n - $chance = 0" +
          s" THEN CAST(0 AS BIGINT) ELSE" +
          s" ((CAST(n11+n00 AS DECIMAL(38,0)) * n - $chance) * 1000000)" +
          s" div (CAST(n AS DECIMAL(38,0)) * n - $chance) END")
          .as("kappa_ppm"))
    }),
    "pref_pairs" -> ((s, dir) => {
      // preference-pair construction (the RLHF/DPO data shape): within
      // each prompt group (source x doc_id mod 5 — the grouping proxy),
      // pair the best- and worst-scoring docs by an exact integer
      // quality score (chars + 10x sentence periods), emitting the
      // margin. ONE hash aggregate over the corpus: chosen = max over
      // (score, -doc_id) structs, rejected = min over (score, doc_id) —
      // deterministic tie-breaks with no per-group sort and no window,
      // so the plan is a partial-aggregated groupBy that scales to any
      // group size. Single-doc groups self-pair and are dropped.
      val scored = t(s, dir, "documents").select(
        col("source"), pmod(col("doc_id"), lit(5)).cast(LongType).as("grp"),
        col("doc_id"),
        (col("n_chars") +
          lit(10L) * regexp_count(col("text"), lit("[.!?]")))
          .cast(LongType).as("score"))
      scored.groupBy("source", "grp")
        .agg(
          max(struct(col("score"), (-col("doc_id")).as("nid"))).as("mx"),
          min(struct(col("score"), col("doc_id").as("id"))).as("mn"),
          count(lit(1)).cast(LongType).as("n_docs"))
        .select(col("source"), col("grp"),
          (-col("mx.nid")).as("chosen_doc"),
          col("mx.score").as("chosen_score"),
          col("mn.id").as("rejected_doc"),
          col("mn.score").as("rejected_score"),
          (col("mx.score") - col("mn.score")).as("margin"),
          col("n_docs"))
        .filter(col("chosen_doc") =!= col("rejected_doc"))
    }),
    "corpus_checksum" -> ((s, dir) => {
      // shard integrity manifest: per shard (doc_id mod 16), doc count,
      // char mass, and an ORDER-INDEPENDENT content checksum — the sum
      // of each row's 60-bit md5 prefix, reduced mod 2^62. Any engine
      // (and any partitioning, since addition commutes) reproduces the
      // same manifest from the same rows; a single flipped byte moves
      // the checksum. This is the cheap cross-site verification a 100 TB
      // corpus runs after every copy/compaction: one map-only hash pass
      // + one 16-row aggregate. Sums accumulate in DECIMAL(38,0) —
      // overflow-safe to ~1e18 docs per shard.
      // coalesce, not concat_ws's silent NULL-skip: a NULL text hashes
      // as the empty string in BOTH engines (the replica coalesces too)
      // instead of Spark checksumming doc_id alone while DuckDB's `||`
      // nulls the row out of the sum entirely
      val h = conv(substring(
          md5(concat(col("doc_id").cast(StringType),
            coalesce(col("text"), lit("")))),
          1, 15), 16, 10).cast(DecimalType(38, 0))
      t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(16)).cast(LongType).as("shard"),
          col("n_chars"), h.as("h"))
        .groupBy("shard")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"),
          pmod(sum(col("h")), lit(4611686018427387904L).cast(DecimalType(38, 0)))
            .cast(LongType).as("checksum"))
    }),
    "ann_mrr" -> ((s, dir) => {
      // retrieval-eval MRR@10: for each query, the reciprocal rank of
      // its TRUE nearest neighbor (brute-force rank 1) inside the
      // probe-1 IVF candidate list — the single-number quality gate that
      // decides whether the approximate index ships. Exact integers:
      // rr_scaled = 2520 div rank (2520 = lcm(1..10)), 0 on miss. The
      // truth pass runs on the 8-query sample only (broadcast queries,
      // one corpus scan); candidates ride the same partition-pruned IVF
      // probe the recall gate uses.
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      val truth = Similarity
        .bruteForceTopK(e, q, "vec_id", "embedding", 1)
        .select(col("query_id"), col("neighbor_id"))
      val cells = Clustering.kmeansAssign(e, "vec_id", "embedding",
        k = 4, iters = 1)
      val corpusC = e.join(cells, "vec_id")
      val qC = q.join(cells, "vec_id").select(
        col("vec_id").as("qid"), col("embedding").as("qv"), col("cluster"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val cand = corpusC.join(qC, Seq("cluster"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          graft.functions.vectors.cosineSim(col("qv"), col("embedding"))
            .as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
      val found = truth.join(cand, Seq("query_id", "neighbor_id"))
        .select(col("query_id"), col("rank"))
      q.select(col("vec_id").as("query_id"))
        .join(found, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("rank"), lit(0)).cast(LongType).as("rank"),
          coalesce(expr("2520 div rank"), lit(0L)).cast(LongType)
            .as("rr_scaled"))
    }),
    "stats_hll" -> ((s, dir) => {
      // cross-engine-verifiable HLL cardinality sketch over the corpus's
      // distinct word TRIGRAMS (the dedup-relevant cardinality — the
      // tiny synthetic vocabulary makes single words too few for the
      // raw estimator's regime, NDV >> 2.5m): md5-addressed registers +
      // exact integer arithmetic, so ANY engine reproduces the estimate
      // bit-for-bit (see Sketches.hllNdv). The 100 TB read: distinct-
      // shingle/url/token counts come from 2 KB of mergeable state in
      // one pass, not a corpus-wide distinct. exact_ndv is the audit
      // column — affordable at test scale, dropped in production (it IS
      // the expensive operator the sketch replaces).
      val sh = shingleRows(s, dir)
      val exact = sh.agg(countDistinct(col("sh")).as("exact_ndv"))
      Sketches.hllNdv(sh, col("sh"), pHex = 2)
        .crossJoin(broadcast(exact))
        .select(col("m"), col("n_regs"), col("hll_ndv"),
          col("exact_ndv").cast(LongType).as("exact_ndv"),
          expr("CAST(abs(hll_ndv - exact_ndv) * 1000000 div exact_ndv" +
            " AS BIGINT)").as("err_ppm"))
    }),
    "stats_countmin" -> ((s, dir) => {
      // count-min heavy-hitter audit: the 20 most frequent trigram
      // shingles' true counts vs their sketch estimates (4 salted rows x
      // 512 cells = 2,048 Longs of mergeable state; ~16k distinct keys
      // guarantee visible collision pressure). Estimates always dominate
      // truth (collisions only inflate); the gap IS the pressure read.
      // At 100 TB only the sketch pass runs per shard (cells sum across
      // shards); the truth join here is the test-scale audit.
      val sh = shingleRows(s, dir)
      val sketch = Sketches.countMin(sh, col("sh"), depth = 4, width = 512)
      val top = sh.groupBy("sh").agg(count(lit(1)).as("true_c"))
        .orderBy(col("true_c").desc, col("sh").asc).limit(20)
        .select(col("sh"), col("true_c").cast(LongType).as("true_c"))
      Sketches.cmEstimate(top, col("sh"), sketch, depth = 4, width = 512)
        .select(col("sh"), col("true_c"), col("cm_est"))
    }),
    "stats_quantiles" -> ((s, dir) => {
      // exact doc-length permilles (p50/p90/p99) WITHOUT a global sort:
      // one histogram aggregate over 64-char buckets, a cumulative pass
      // over the bounded bucket table, then row_numbers only inside the
      // few rank-carrying buckets. The naive ORDER BY form (what the
      // oracle runs) serializes the corpus through one sort at 100 TB.
      Sketches.exactPermilles(t(s, dir, "documents"), "n_chars", "doc_id",
        permilles = Seq(500, 900, 990), bucketWidth = 64L)
    }),
    "profile_skew" -> ((s, dir) => {
      // join-key skew advisor for documents.source: per-key share (ppm)
      // and the salt factor a 32-way shuffle needs (ceil arithmetic,
      // exact). With ~20 sources every key saturates its task at
      // parallelism 32 — the textbook pre-join read that routes hot
      // keys to the salted-join path instead of discovering the stall
      // in production. One hash aggregate; output is key-bounded.
      Sketches.skewAdvisor(t(s, dir, "documents"), "source",
        parallelism = 32)
        .withColumnRenamed("key", "source")
    }),
    "stats_hll_sources" -> ((s, dir) => {
      // per-domain vocabulary-diversity sketch: distinct-shingle NDV per
      // source from ONE (source, bucket)-keyed register aggregate —
      // 256 Longs of state per domain, the curation signal that
      // separates template farms (tiny NDV at high volume) from organic
      // sites, computed for a million domains in one corpus pass. Exact
      // same integer estimator per group, so any engine reproduces
      // every row bit-for-bit.
      Sketches.hllNdvBy(
          shinglesOf(t(s, dir, "documents"), keep = Seq("source")),
          col("sh"), "source", pHex = 2)
        .withColumnRenamed("grp", "source")
    }),
    "stats_hll_overlap" -> ((s, dir) => {
      // sketch-based CROSS-CRAWL overlap estimate: the even/odd doc_id
      // halves stand in for two crawls; each half's registers aggregate
      // in one pass, the UNION sketch is their register-wise max (the
      // mergeability property), and inclusion-exclusion gives the
      // shared-shingle estimate — dedup planning between two 50 TB
      // crawls from 2 x 2 KB of state, no content join. exact_overlap
      // is the audit column (the expensive distinct-intersection the
      // sketch replaces — affordable only at test scale).
      val sh = shinglesOf(
        t(s, dir, "documents").withColumn("half",
          pmod(col("doc_id"), lit(2)).cast(LongType)),
        keep = Seq("half"))
      val (bucket, rank) = Sketches.hllParts(col("sh"), pHex = 2)
      // per-half registers: BOUNDED (<= 2*256 rows), persisted because
      // both the per-half estimates and the union max-merge read them
      val regs = sh.select(col("half"), bucket.as("bucket"), rank.as("rank"))
        .groupBy("half", "bucket").agg(max(col("rank")).as("mr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // per-half estimates ride ONE half-grouped aggregate over the
      // bounded register frame (not two filtered global aggregates): an
      // absent half then yields no row in BOTH engines — the same
      // row-presence semantics as the DuckDB replica's GROUP BY half
      val perHalf = Sketches.hllEstimateBy(regs, "half", pHex = 2)
      val estEven = perHalf.filter(col("half") === 0)
        .select(col("hll_ndv").as("ndv_even"))
      val estOdd = perHalf.filter(col("half") === 1)
        .select(col("hll_ndv").as("ndv_odd"))
      val estUnion = Sketches.hllEstimate(
          regs.groupBy("bucket").agg(max(col("mr")).as("mr")), pHex = 2)
        .select(col("hll_ndv").as("ndv_union"))
      // count (not sum-of-indicator): an empty corpus yields 0, matching
      // the replica's count(*) over the empty intersection
      val exact = sh.groupBy("sh")
        .agg(countDistinct(col("half")).as("nh"))
        .agg(count(when(col("nh") === 2, 1))
          .cast(LongType).as("exact_overlap"))
      estEven.crossJoin(broadcast(estOdd))
        .crossJoin(broadcast(estUnion))
        .crossJoin(broadcast(exact))
        .select(col("ndv_even"), col("ndv_odd"), col("ndv_union"),
          (col("ndv_even") + col("ndv_odd") - col("ndv_union"))
            .as("overlap_est"),
          col("exact_overlap"))
    }),
    "stats_hll_incremental" -> ((s, dir) => {
      // SKETCH STATE AS A TABLE: per-source HLL registers persist as a
      // graft table; each crawl batch max-merges its own O(batch)
      // register aggregate in (only raised registers rewrite) and NDV
      // estimates read the merged 256-rows-per-source state — history
      // is never re-shingled, and because registers merge by max the
      // estimates are BIT-IDENTICAL to the single-pass sketch over the
      // full corpus (the oracle runs stats_hll_sources' replica
      // verbatim; EntrySpec asserts row equality between the two
      // queries). Setup/op split lives in [[opParts]].
      opParts("stats_hll_incremental")(s, dir)()
    }),
    "stats_cm_incremental" -> ((s, dir) => {
      // count-min state as a table: cells persist (<=2,048 rows at any
      // volume) and each batch sum-merges its own sketch in — the
      // mergeability stream_cm proves under micro-batching, here as
      // durable cross-crawl state. The merged table is bit-identical
      // to the batch sketch over the full corpus (stream_cm's oracle
      // verbatim). Setup/op split lives in [[opParts]].
      opParts("stats_cm_incremental")(s, dir)()
    }),
    "stats_quantiles_incremental" -> ((s, dir) => {
      // exact quantiles with MAINTAINED state: the value-bucket
      // histogram persists as a graft table, each batch sum-merges its
      // own O(batch) histogram, and the permille read runs cumulative
      // windows over the bounded merged table + the targeted re-read
      // of rank-carrying buckets only — same answers as the full-sort
      // oracle (stats_quantiles' SQL verbatim), with the corpus-wide
      // histogram pass amortized to O(batch) per crawl. Setup/op split
      // lives in [[opParts]].
      opParts("stats_quantiles_incremental")(s, dir)()
    }),
    "stats_join_size" -> ((s, dir) => {
      // join-size prediction BEFORE the shuffle: the exact cardinality
      // of lineitem self-joined on l_partkey is sum over keys of c(k)^2
      // — computable from ONE key-histogram aggregate (bounded by
      // #parts), no join executed. The optimizer-style governance read
      // at 100 TB: predict whether a planned join explodes (and by how
      // much) from per-key counts before committing to a strategy.
      // actual_rows is the audit column — the real self-join count,
      // affordable only at test scale; prediction and actual must agree
      // EXACTLY (the arithmetic is an identity, not an estimate).
      val li = t(s, dir, "lineitem").select(col("l_partkey").as("k"))
      val pred = li.groupBy("k").agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).cast(LongType).as("n_keys"),
          sum(col("c")).cast(LongType).as("probe_rows"),
          sum(col("c") * col("c")).cast(LongType).as("predicted_rows"),
          max(col("c")).cast(LongType).as("max_key_rows"))
      // the audit: the REAL self-join, counted — affordable at test
      // scale only (at 100 TB you run the prediction INSTEAD of this)
      val actual = li.join(
          t(s, dir, "lineitem").select(col("l_partkey").as("k")), Seq("k"))
        .agg(count(lit(1)).cast(LongType).as("actual_rows"))
      pred.crossJoin(broadcast(actual))
        .select(col("n_keys"), col("probe_rows"), col("predicted_rows"),
          col("actual_rows"), col("max_key_rows"))
    }),
    "stats_bloom_join" -> ((s, dir) => {
      // Bloom semi-join reduction audit: a month of orders builds an
      // md5-salted position set (k=3 hashes into m=65536 bits — the
      // 8 KB bitmap production broadcasts instead of shuffling the fact
      // table); every lineitem key passes iff all 3 positions are set.
      // Output: probe volume, rows passing the filter, true matches,
      // false positives and the empirical FPR in ppm — the read that
      // sizes m before a 100 TB shuffle is cut down. Cross-engine
      // deterministic (same md5 arithmetic both sides); the per-key
      // pass test runs on the DISTINCT-key table, never per row.
      val m = 65536L
      def positions(k: Column): Column = array((0 until 3).map { i =>
        pmod(conv(substring(md5(concat(lit(i.toString), lit("|"),
          k.cast(StringType))), 1, 15), 16, 10).cast(LongType), lit(m))
      }: _*)
      val build = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-03-01") &&
          col("o_orderdate") < lit("1997-04-01"))
        .select(col("o_orderkey").cast(LongType).as("bk")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val posSet = build.select(explode(positions(col("bk"))).as("p"))
        .distinct() // bounded by m = 65536 rows
      val keys = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").cast(LongType).as("k"))
        .agg(count(lit(1)).as("nr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val passed = keys
        .select(col("k"), col("nr"), explode(positions(col("k"))).as("p"))
        .join(broadcast(posSet), Seq("p"))
        .groupBy("k", "nr").agg(count(lit(1)).as("hits"))
        .filter(col("hits") === 3)
        .select(col("k"), col("nr"))
      val truth = keys.join(
        build.withColumnRenamed("bk", "k"), Seq("k"), "left_semi")
      val tot = keys.agg(sum(col("nr")).cast(LongType).as("probe_rows"))
      val pas = passed.agg(
        coalesce(sum(col("nr")), lit(0L)).cast(LongType).as("pass_rows"))
      val tru = truth.agg(
        coalesce(sum(col("nr")), lit(0L)).cast(LongType).as("true_rows"))
      tot.crossJoin(broadcast(pas)).crossJoin(broadcast(tru))
        .select(col("probe_rows"), col("pass_rows"), col("true_rows"),
          (col("pass_rows") - col("true_rows")).as("fp_rows"),
          expr("CAST((pass_rows - true_rows) * 1000000 div " +
            "(probe_rows - true_rows) AS BIGINT)").as("fpr_ppm"))
    }),
    "sql_scd2" -> ((s, dir) => {
      // SCD2 (type-2 slowly-changing dimension) history build from the
      // event stream: per user, each event_type CHANGE opens a new
      // version row with valid_from/valid_to and an is_current flag —
      // unchanged consecutive states collapse (the defining SCD2 rule).
      // Two user-keyed windows, no global stage: the warehouse shape
      // that turns a 100 TB CDC firehose into point-in-time-joinable
      // dimension history.
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = ev
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(w2))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    }),
    "q_scd2_asof" -> ((s, dir) => {
      // POINT-IN-TIME attribution against the SCD2 history — the
      // consumption side of sql_scd2: every purchase joins to the
      // user's then-current interaction state (valid_from <= ts <
      // valid_to) via the bucketed RangeJoin (interval-keyed, no
      // cross product), and revenue rolls up per state. The warehouse
      // pattern that makes dimension history QUERYABLE: "what was the
      // user doing when they bought?" at 100 TB, with the half-open
      // SCD2 windows mapped exactly onto the closed-interval join by
      // a one-microsecond end shift.
      val ev = t(s, dir, "events")
      val nonP = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val chg = nonP.withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cap = ev.agg(max(unix_micros(col("ts"))).as("mx"))
      val hist = chg.withColumn("vt_raw", lead(col("ts"), 1).over(w2))
        .crossJoin(broadcast(cap))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("vf"),
          timestamp_micros(coalesce(
            unix_micros(col("vt_raw")) - 1, col("mx"))).as("vt"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.RangeJoin.pointInInterval(
          purchases, hist, keys = Seq("user_id"), pointTs = "ts",
          startCol = "vf", endCol = "vt", bucketSeconds = 86400L)
        .groupBy(col("state"))
        .agg(count(lit(1)).cast(LongType).as("n_purchases"),
          sum(money(col("value"))).cast(DoubleType).as("total_value"))
    }),
    "stats_fk_orphans" -> ((s, dir) => {
      // referential-integrity audit across the star schema: per FK
      // edge, child volume, orphan count (left-anti) and the match rate
      // in ppm — the load-gate that catches a fact landing before its
      // dimension. The third edge audits a PARTIAL dimension load
      // (customers with c_custkey % 3 == 0 withheld), the
      // late-arriving-dimension shape the gate exists to catch. Each
      // edge is one anti-join count; dimensions broadcast at audit
      // cardinalities.
      import s.implicits._
      def edge(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame = {
        val orphans = child.join(
          parent.select(col(pkey).as(key)), Seq(key), "left_anti")
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(broadcast(
            orphans.agg(count(lit(1)).as("n_orphans"))))
          .select(lit(name).as("fk_edge"),
            col("n_child").cast(LongType).as("n_child"),
            col("n_orphans").cast(LongType).as("n_orphans"),
            expr("CAST((n_child - n_orphans) * 1000000 div n_child" +
              " AS BIGINT)").as("match_ppm"))
      }
      val li = t(s, dir, "lineitem").select(col("l_orderkey"))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val evu = t(s, dir, "events").select(col("user_id"))
      edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(edge("orders.o_custkey->customer",
          o.select(col("o_custkey")), "o_custkey", c, "c_custkey"))
        .unionByName(edge("events.user_id->customer_partial",
          evu, "user_id",
          c.filter(pmod(col("c_custkey"), lit(3)) =!= 0), "c_custkey"))
    }),
    "meta_prune_stats" -> ((s, dir) => {
      // partition-pruning effectiveness report, FROM MANIFEST METADATA
      // ONLY: a month-partitioned table, a half-year predicate, and the
      // plan-time file census — partitions/rows total vs kept, no data
      // file opened. The oracle reproduces every number from the raw
      // rows, so this query PROVES the pruning is exact (keeps all
      // matching months, sheds all others): the partition-design audit
      // a 100 TB table runs before trusting a layout.
      val src = t(s, dir, "lineitem")
      val tbl = freshTable(s, "meta_prune_stats", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("l_shipdate").get.id, 1000, "month", "shipmonth"))))
      tbl.append(s, src)
      val snap = tbl.metadata.currentSnapshot.get
      val flt = col("l_shipdate") >=
          lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00"))
      val all = tbl.planFiles(snap)
      val kept = tbl.planFilesPruned(s, snap, Some(flt),
        tbl.metadata.currentSchema)
      def nParts(fs: List[PlannedFile]): Long =
        fs.map(_.file.partition.headOption.flatten).distinct.size.toLong
      import s.implicits._
      Seq((nParts(all), nParts(kept),
          all.map(_.file.recordCount).sum, kept.map(_.file.recordCount).sum))
        .toDF("n_parts_total", "n_parts_kept", "rows_total", "rows_kept")
    }),
    "corpus_diff" -> ((s, dir) => {
      // crawl-to-crawl CONTENT diff via time travel: v1 is the even-doc
      // crawl; v2 deletes every 10th doc, rewrites the text of the
      // surviving %14 docs (equality-delete + re-insert), and appends
      // the odd-doc crawl. The report joins the two SNAPSHOT SCANS of
      // the same table on doc_id and classifies by content hash —
      // added / removed / changed / unchanged per source. The audit
      // that runs after every re-crawl lands; row-level deletes, time
      // travel and content hashing in one governance query.
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val tbl = freshTable(s, "corpus_diff", d)
      tbl.append(s, d.filter(pmod(col("doc_id"), lit(2)) === 0))
      val snap1 = tbl.metadata.currentSnapshotId.get
      tbl.deleteWhere(s, pmod(col("doc_id"), lit(10)) === 0)
      val chg = pmod(col("doc_id"), lit(2)) === 0 &&
        pmod(col("doc_id"), lit(10)) =!= 0 && pmod(col("doc_id"), lit(14)) === 2
      tbl.equalityDelete(s,
        d.filter(chg).select(col("doc_id")), Seq("doc_id"))
      tbl.append(s, d.filter(chg)
        .withColumn("text", concat(lit("rev2 "), col("text"))))
      tbl.append(s, d.filter(pmod(col("doc_id"), lit(2)) === 1))
      val v1 = tbl.scan(s, snapshotId = Some(snap1))
        .select(col("doc_id"), col("source"),
          md5(col("text")).as("h1"))
      val v2 = tbl.scan(s)
        .select(col("doc_id"), col("source").as("src2"),
          md5(col("text")).as("h2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(coalesce(col("source"), col("src2")).as("source"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("source", "status")
        .agg(count(lit(1)).cast(LongType).as("n_docs"))
    }),
    "stats_gap_quantiles" -> ((s, dir) => {
      // sessionization-threshold governance: exact p50/p90/p99 of
      // per-user inter-event gaps (seconds), composed from a per-user
      // lag window (user-keyed, never global) + the no-global-sort
      // exactPermilles path. THIS is how a 100 TB event log picks its
      // session timeout — the 30-minute constant every sessionizer
      // hardcodes becomes a measured quantile, with no corpus sort.
      val ev = t(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = ev
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .filter(col("prev_us").isNotNull)
        .select(col("event_id"),
          expr("(unix_micros(ts) - prev_us) div 1000000").as("gap_s"))
      Sketches.exactPermilles(gaps, "gap_s", "event_id",
        permilles = Seq(500, 900, 990), bucketWidth = 60L)
    }),
    "stream_cm" -> ((s, dir) => {
      // STREAMING count-min maintenance: cells live as streaming
      // aggregation state (groupBy(salt, cell).count — sum-merge, at
      // most 2,048 state rows at ANY volume) across two micro-batches.
      // Counts sum across batches, so the final state is BIT-IDENTICAL
      // to the batch sketch over the same rows; the oracle verifies THE
      // ENTIRE SKETCH TABLE, not a summary. The streaming counterpart
      // of stream_hll's max-merge: the two merge semantics that make
      // sketches distributable are both proven under micro-batching.
      // Setup/drain split lives in [[streamParts]].
      streamParts("stream_cm")(s, dir)()
    }),
    "stream_hll" -> ((s, dir) => {
      // STREAMING HLL maintenance: the corpus arrives in two micro-
      // batches (two table snapshots, rate-limited to one commit per
      // trigger) and the registers live as streaming aggregation state —
      // groupBy(bucket).max(rank), at most 256 state rows NO MATTER HOW
      // MUCH data streams through. Because registers merge by max, the
      // final state is BIT-IDENTICAL to the batch sketch over the same
      // rows (order/batching-invariant), so the oracle is the batch
      // replica. This is the production cardinality monitor: a crawl
      // streams in all day, the NDV estimate is always current, and the
      // state never grows. Setup/drain split lives in [[streamParts]].
      streamParts("stream_hll")(s, dir)()
    }),
    "graph_components" -> ((s, dir) => {
      // connected components of the domain link graph — the mirror-farm
      // / island detector (a crawl component disconnected from the main
      // web is usually a self-linking spam cluster). Rides the same
      // pointer-jumping min-label CC the dedup family uses: O(E) keyed
      // joins per round, rounds ~ log(diameter), labels are exact min
      // node ids so any engine verifies with reachability semantics.
      val e = linkEdges(s, dir)
      Dedup.connectedComponents(e, "src", "dst")
        .select(col("doc_id").as("node"), col("component"))
    }),
    "graph_reciprocity" -> ((s, dir) => {
      // link-reciprocity census: of the distinct directed edges, how
      // many have their reverse edge present — organic link graphs
      // reciprocate a little, link-exchange rings reciprocate almost
      // everything. One distinct-edge aggregate + one self-join on the
      // reversed key + a single-row rollup; self-loops excluded. Exact
      // integers (ppm by integral division).
      val e = linkEdges(s, dir)
        .filter(col("src") =!= col("dst")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val recip = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(recip.agg(count(lit(1)).as("n_recip"))))
        .select(col("n_edges").cast(LongType).as("n_edges"),
          col("n_recip").cast(LongType).as("n_recip"),
          expr("CAST(n_recip * 1000000 div n_edges AS BIGINT)")
            .as("recip_ppm"))
    }),
    "embed_anisotropy" -> ((s, dir) => {
      // embedding-space anisotropy audit: the top-20 strongest
      // off-diagonal covariance pairs over quantized components — the
      // table read before trusting cosine retrieval (anisotropic spaces
      // compress cosine scores; mean-centering/whitening starts here).
      // ONE embedding pass: upper-triangle products + moments + count
      // explode in-task and partially aggregate map-side, so the only
      // shuffle carries 2,145 rows per partition; DECIMAL(38,0) sums are
      // overflow-safe at any corpus size.
      Profiling.embeddingAnisotropy(
        t(s, dir, "embeddings"), "embedding", dims = 64, topK = 20)
    }),
    "dedup_cdc_incremental" -> ((s, dir) => {
      // incremental CDC dedup — the production re-crawl shape: even docs
      // are history, persisted as a CHUNK-HASH INDEX in a graft table;
      // the odd-doc batch chunks map-only and flags against the index
      // with one hash-keyed join — history is never re-chunked. The
      // mostly_known flag is the drop gate for re-crawls whose content
      // shifted (CDC boundaries re-sync) but did not change.
      val docs = t(s, dir, "documents")
      val idx = Dedup.cdcChunkIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      val tbl = freshTable(s, "dedup_cdc_incremental", idx)
      tbl.append(s, idx)
      Dedup.cdcIncrementalFlags(
        docs.filter(col("doc_id") % 2 === 1), tbl.scan(s), "doc_id", "text")
    }),
    "dedup_cc_incremental" -> ((s, dir) => {
      // INCREMENTAL connected components — closes the dedup family's
      // last full-recompute: batch 1 (even doc_ids) clusters once and
      // persists BOTH pipeline states as graft tables — the minhash
      // index CARRYING each doc's component label, and the (doc_id,
      // component) label table identity-partitioned on
      // cbucket = pmod(component, 16) so member re-labeling prunes to
      // touched partitions. Batch 2 (odd ids) generates its pairs in
      // O(batch) — odd-vs-index via the band-bucket join (which emits
      // each match's component straight off the index row), odd-vs-odd
      // via LSH over the batch alone — contracts them to SUPER-EDGES
      // (endpoint -> its component, or itself when unlabeled), runs
      // pointer-jumping CC over that batch-sized graph and emits the
      // label DELTA: docs newly labeled or re-labeled. History is never
      // re-paired, never re-clustered; min-label super-node arithmetic
      // makes the merged labels EQUAL a full recompute (asserted in
      // OperatorsSpec). Oracle: exact all-pairs-Jaccard CC over the
      // full corpus MINUS batch 1's own CC — the ground-truth delta.
      // Setup (batch-1 states) / op (batch-2 merge) split lives in
      // [[opParts]]; the bench times the op only.
      opParts("dedup_cc_incremental")(s, dir)()
    }),
    "dedup_cc_writeback" -> ((s, dir) => {
      // the COMPLETE incremental-CC maintenance cycle oracle-gated end
      // to end: dedup_cc_incremental stops at the label delta; this
      // query WRITES IT BACK (Dedup.applyComponentDelta — label upsert
      // + index component refresh + batch index append) and returns the
      // maintained label TABLE, which the oracle checks against the
      // full-corpus all-pairs-Jaccard CC doc for doc. A missed index
      // refresh or label upsert cannot hash-match. Setup/op split in
      // [[opParts]] (op = batch-2 merge + write-back + read).
      opParts("dedup_cc_writeback")(s, dir)()
    }),
    "mix_doremi" -> ((s, dir) => {
      // DoReMi-style iterative mixture reweighting over sources
      // (Sampling.doremiWeights): 5 multiplicative-weights rounds in
      // 2^20 fixed-point Long arithmetic upweight domains whose mean
      // per-doc token count trails the corpus mean (the deterministic
      // stand-in for DoReMi's proxy-model excess loss — a real run
      // plugs eval losses into the same update), then smooth 1/64
      // toward uniform. The corpus is touched ONCE (one source-keyed
      // aggregate); iterations run over the 20-row domain table with
      // broadcast totals. Integer-only update => bit-identical DuckDB
      // replay (unrolled CTE iterations).
      Sampling.doremiWeights(
        t(s, dir, "documents").selectExpr("source",
          "size(filter(split(lower(coalesce(text,'')),'[^a-z0-9]+'), " +
            "x -> length(x) > 0)) AS tk"),
        "source", "tk")
        .select(col("source"), col("n_docs"), col("mean_utility"),
          col("excess_fp"), col("weight_fp"), col("weight"))
    }),
    "text_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking dedup: boundaries re-synchronize after
      // insertions/deletions (unlike fixed-width chunks), so near-dup
      // docs share all their unchanged chunks — the report lists every
      // chunk appearing in >= 2 distinct docs (329 at sf0.01, all from
      // natural near-dups; no planting needed). Windows are per-doc
      // bounded; the rollup shuffles (hash, count) pairs only.
      Dedup.cdcChunks(t(s, dir, "documents"), "doc_id", "text")
    }),
    "embed_knn_graph" -> ((s, dir) => {
      // k-NN graph construction — the backbone of semantic-dedup and
      // graph-clustering pipelines (SemDeDup prunes within-cluster
      // neighbor pairs; HNSW builds on exactly this edge set). Candidate
      // generation is cell-bounded: vectors pair only WITHIN their
      // deterministic k-means cell, and k GROWS WITH THE CORPUS
      // (k = max(4, n div 250)) so cell sizes stay ~constant and the
      // self-join stays linear in n — at sf0.01 that is k=4, matching
      // the oracle's fixed seed set. Scoring is an exact
      // integer-quantized dot product; top-5 per node via a cell-local
      // window; ties break to the lower neighbor id. Bit-identical
      // across engines. The count below is a parquet-metadata action.
      val e = t(s, dir, "embeddings")
      val k = math.max(4, (e.count() / 250).toInt)
      val asg = Clustering.kmeansAssign(e, "vec_id", "embedding", k = k, iters = 1)
      // persist the assigned+quantized frame: both self-join sides read
      // it, so without this the k-literal assignment expression would be
      // evaluated twice over the corpus
      val q = e.select(col("vec_id"),
          transform(col("embedding"), x =>
            floor(x.cast(DoubleType) * 1024).cast(LongType)).as("q"))
        .join(asg, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = q.select(col("cluster"), col("vec_id").as("a"), col("q").as("qa"))
      val b = q.select(col("cluster"), col("vec_id").as("b"), col("q").as("qb"))
      // codegen'd integer dot (round-13): bit-identical to the
      // aggregate(zip_with(*)) fold it replaces, but compiled — the HOF
      // form is CodegenFallback and its interpreted per-element eval
      // dominated this cell-local pair scoring (n^2/k pairs x 64 dims)
      val pairs = a.join(b, Seq("cluster")).filter(col("a") =!= col("b"))
        .withColumn("dot_q", vectors.dotLong(col("qa"), col("qb")))
      pairs
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("a")).orderBy(col("dot_q").desc, col("b")))
          .cast(LongType))
        .filter(col("rank") <= 5)
        .select(col("a").as("vec_id"), col("rank"),
          col("b").as("neighbor"), col("dot_q"))
    }),
    "q_events_markov" -> ((s, dir) => {
      // event-transition matrix: per-user consecutive event-type pairs
      // (ts order, event_id tiebreak) counted across users, with each
      // row's share of its source state in exact integer ppm — the
      // Markov-chain view of user behavior (q_events_paths shows the
      // first-3 journeys; this shows the full stationary structure).
      // ONE corpus pass: per-user lag window + one hash aggregate; the
      // per-state totals are a window over the aggregate itself.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("next_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type")
        .agg(count(lit(1)).as("n_transitions"))
      // per-state totals via a window OVER THE AGGREGATE (|types|^2 rows)
      // — deriving them with a second groupBy from the source would
      // re-scan and re-window the whole corpus for a 25-row table
      trans
        .withColumn("_t", sum(col("n_transitions")).over(
          Window.partitionBy(col("prev_type"))))
        .select(col("prev_type"), col("next_type"), col("n_transitions"),
          expr("(n_transitions * 1000000) div _t").as("ppm"))
    }),
    "stream_markov" -> ((s, dir) => {
      // streaming/batch equivalence of the transition matrix: events
      // arrive as two time-partitioned commits (one micro-batch each);
      // flatMapGroupsWithState keeps ONE row of state per user (the last
      // seen event), so cross-batch transitions are emitted exactly once
      // — the oracle is the SAME SQL as q_events_markov, proving the
      // incremental operator reproduces the batch lag-window bit-for-bit.
      // At 100 TB this is the difference between re-reading history per
      // refresh and O(new events) per micro-batch. Setup/drain split
      // lives in [[streamParts]].
      streamParts("stream_markov")(s, dir)()
    }),
    "dedup_cdc_cut" -> ((s, dir) => {
      // the ACT step of CDC dedup: duplicated chunks keep only their
      // canonical first occurrence (min doc_id, then chunk index) and
      // are cut everywhere else; docs reassemble from surviving chunks
      // — the chunk-granular sibling of dedup_substrings_cut (same
      // output shape, so curation gates swap freely between them)
      Dedup.cdcChunkCut(t(s, dir, "documents"), "doc_id", "text")
    }),
    "q_events_paths" -> ((s, dir) => {
      // user-journey path analysis: each user's first three event types
      // in time order (event_id tiebreak) joined into a path, counted
      // across users — one per-user window bounded to 3 rows + one hash
      // aggregate over short strings
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("_rn"))
        .filter(col("_rn") <= 3)
        .groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("_rn"), col("event_type")))),
            e => e.getField("event_type")), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
    }),
    "ice_ref_retention" -> ((s, dir) => {
      // ref retention policies on expiry: a tag with a tiny max-ref-age
      // drops, a branch with a generous one survives, and main never
      // expires — the refs view after expireSnapshots is the proof
      val src = t(s, dir, "orders").select(col("o_orderkey")).limit(100)
      val tbl = freshTable(s, "ice_ref_retention", src)
      val t1 = tbl.append(s, src)
      val snap1 = t1.metadata.currentSnapshotId.get
      val t2 = t1
        .createTag("old-tag", snap1, maxRefAgeMs = Some(1L)) // expires at once
        .createBranch("audit", snap1, maxRefAgeMs = Some(365L * 86400000L))
        .append(s, src.limit(10))
      Thread.sleep(5)
      val t3 = t2.expireSnapshots(
        olderThanMs = System.currentTimeMillis() + 1000L, retainLast = 1)
      val refs = t3.metadata.refs.keys.toSeq.sorted
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        refs.map(org.apache.spark.sql.Row(_)).asJava,
        StructType(Seq(StructField("ref_name", StringType))))
    }),
    "sql_merge_evolution" -> ((s, dir) => {
      // MERGE WITH SCHEMA EVOLUTION: the CDC source carries a column the
      // target lacks (o_totalprice); the analyzer widens the target
      // through the id-assigning AddColumn evolution path, matches
      // update in place, non-matches insert — one merge-on-read snapshot
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mevo")
      s.sql("CREATE TABLE graft.db.mevo (o_orderkey BIGINT, o_orderstatus STRING)")
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView("mevo_base")
      s.sql("INSERT INTO graft.db.mevo SELECT * FROM mevo_base")
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("mevo_src")
      s.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO graft.db.mevo t USING mevo_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("SELECT o_orderkey, o_orderstatus, o_totalprice FROM graft.db.mevo")
    }),
    "meta_orphan_files" -> ((s, dir) => {
      // remove_orphan_files as a query surface: two planted unreferenced
      // files under data/ are reclaimed (distributed listing + anti-join
      // against the referenced set), committed data is untouched
      val src = t(s, dir, "orders")
        .filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val tbl = freshTable(s, "meta_orphan_files", src)
      tbl.append(s, src)
      // sweep write-time strays (e.g. _SUCCESS markers) first so the
      // second pass counts EXACTLY the planted orphans
      tbl.removeOrphanFilesCount(System.currentTimeMillis() + 60000L)
      Seq("orphan-a.parquet" -> 300, "orphan-b.bin" -> 477).foreach {
        case (name, size) =>
          val out = new java.io.FileOutputStream(
            s"${tbl.location.stripPrefix("file:")}/data/$name")
          try out.write(new Array[Byte](size)) finally out.close()
      }
      val removed = tbl.removeOrphanFilesCount(System.currentTimeMillis() + 60000L)
      tbl.scan(s).agg(count(lit(1)).as("table_rows"))
        .withColumn("orphans_removed", lit(removed))
    }),
    "q_events_anomaly" -> ((s, dir) => {
      // hourly spike detection: per event type, hours whose count exceeds
      // 2x that type's exact MEDIAN hourly count (medians of integers are
      // engine-exact — at most an average of two longs). One planted
      // spike: the 2024-01-05 00:00 hour is counted 4x. Two hash
      // aggregates + a broadcast per-type median join.
      val e = t(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      val spikeHour = lit("2024-01-05 00:00:00").cast(TimestampType)
      val boost = e.filter(col("hour") === spikeHour)
      val all = e.unionAll(boost).unionAll(boost).unionAll(boost)
      val hourly = all.groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n_events"))
      val med = hourly.groupBy("event_type")
        .agg(median(col("n_events")).as("med"))
      hourly.join(broadcast(med), "event_type")
        .select(col("event_type"), col("hour"), col("n_events"), col("med"),
          (col("n_events").cast(DoubleType) > lit(2.0) * col("med")).as("is_spike"))
    }),
    "text_watermark" -> ((s, dir) => {
      // canary-string contamination scan (the planted-watermark check
      // run before any corpus ships): per source, docs carrying the
      // canary GUID and total hits — map-only regexp counts + one rollup
      val canary = "canary-guid-8f4e2a"
      val seeded = t(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 62 === 0,
          concat(col("text"), lit(s" $canary repeat $canary")))
          .when(col("doc_id") % 31 === 0,
            concat(col("text"), lit(s" $canary do not train")))
          .otherwise(col("text")))
      seeded
        .select(col("source"),
          regexp_count(col("text"), lit(canary)).as("_hits"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("_hits") > 0, 1L).otherwise(0L)).as("canary_docs"),
          sum(col("_hits")).cast(LongType).as("canary_hits"))
    }),
    "sample_kfold" -> ((s, dir) => {
      // k-fold assignment audit: the same salted md5 cut as sample_split
      // over 5 equal folds; per fold — held-out size, training-side size
      // and held-out token mass (the table a CV harness reads)
      val folds = (0 until 5).map(i => s"f$i" -> 0.2)
      val d = t(s, dir, "documents")
        .withColumn("_tok", text.tokenCount(col("text")).cast(LongType))
      val assigned = Sampling.splitAssign(d, "doc_id", folds)
      // corpus doc total derived from the 5-row fold aggregate itself
      // (window over the aggregate, not a second `d.count()` action —
      // that action re-read + re-tokenized the whole corpus for one
      // scalar); the global window runs over exactly 5 rows
      val wAll = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      assigned.groupBy(col("split").as("fold"))
        .agg(count(lit(1)).as("test_docs"),
          sum(col("_tok")).as("test_tokens"))
        .select(col("fold"), col("test_docs"),
          (sum(col("test_docs")).over(wAll) - col("test_docs")).as("train_docs"),
          col("test_tokens"))
    }),
    "ann_matryoshka" -> ((s, dir) => {
      // two-stage MRL retrieval: the 16-dim PREFIX screens candidates
      // (top-20, 4x less I/O and compute), the full vector reranks the
      // survivors to top-5 — the production matryoshka read path
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      val cand = Similarity.bruteForceTopK(
          e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding")),
          q.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding")),
          "vec_id", "embedding", 20)
        .select(col("query_id"), col("neighbor_id"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand
        .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          "neighbor_id")
        .join(q.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          "query_id")
        .select(col("query_id"), col("neighbor_id"),
          vectors.cosineSim(col("qv"), col("cv")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "embed_binary_search" -> ((s, dir) => {
      // sign-bit binary quantization + Hamming radius retrieval: one
      // long per vector, xor+popcount per comparison — the 32x-cheaper
      // first stage before exact rerank. Jittered queries preserve every
      // sign, so each finds its original at Hamming 0.
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.binaryHammingSearch(e, q, "vec_id", "embedding",
        bits = 32, maxHamming = 2)
    }),
    "text_diversity" -> ((s, dir) => {
      // lexical diversity per doc: type-token ratio + Simpson index —
      // exact integer sums, no transcendentals (a log2-entropy variant
      // measurably flipped on last-ulp engine disagreements)
      TextAnalysis.lexicalDiversity(t(s, dir, "documents"), "doc_id", "text")
    }),
    "q_events_retention" -> ((s, dir) => {
      // cohort retention matrix: users grouped by FIRST-seen day, distinct
      // users active at each day offset — two per-user hash aggregates +
      // one (cohort, offset) rollup, no event-stream window
      val e = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val cohorts = e.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
      e.join(cohorts, "user_id")
        .select(col("user_id"), col("cohort_day"),
          datediff(col("d"), col("cohort_day")).cast(LongType).as("day_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        // DATE parquet reads back as python date objects the comparator
        // cannot canon — ship the cohort as a timestamp on both sides
        .withColumn("cohort_day", col("cohort_day").cast(TimestampType))
    }),
    "q_events_funnel" -> ((s, dir) => {
      // sequential funnel: users whose first view precedes a click that
      // precedes a purchase — per-stage user counts. Each stage is one
      // per-user hash aggregate joined to the (shrinking) previous stage:
      // no window over the event stream, no ordering shuffle
      val e = t(s, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("users"))
        .select(lit("1_view").as("stage"), col("users"))
        .unionByName(c.agg(count(lit(1)).as("users"))
          .select(lit("2_click").as("stage"), col("users")))
        .unionByName(p.agg(count(lit(1)).as("users"))
          .select(lit("3_purchase").as("stage"), col("users")))
    }),
    "q_events_overlap" -> ((s, dir) => {
      // interval-OVERLAP (range x range) join: purchase windows vs view
      // windows of the same user whose spans intersect. Bucketized hash
      // join emitting each pair ONLY in the later-start bucket (no
      // distinct stage); the %97 purchase slice carries 10-day windows
      // that exceed the bucket cap and take the broadcast fallback
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_start"),
        when(pmod(col("event_id"), lit(97)) === 0,
          col("ts") + expr("INTERVAL 10 DAYS"))
          .otherwise(col("ts") + expr("INTERVAL 2 HOURS")).as("p_end"))
      val views = ev.filter(col("event_type") === "view").select(
        col("user_id"), col("event_id").as("view_id"),
        col("ts").as("v_start"),
        (col("ts") + expr("INTERVAL 1 HOURS")).as("v_end"))
      graft.operators.RangeJoin.intervalOverlap(
          purchases, views, Seq("user_id"),
          "p_start", "p_end", "v_start", "v_end", bucketSeconds = 3600L)
        .select(col("purchase_id"), col("view_id"))
    }),
    "q_events_asof" -> ((s, dir) => {
      // point-in-time join: each purchase gets the user's latest click at
      // or before it (union + carry-forward, no range join)
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      // dedupe the right side to one row per (user, microsecond)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asof(purchases, clicks, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
          col("r_event_id").as("click_event_id"), col("r_ts").as("click_ts"))
    }),
    "q_events_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          money(col("value")).cast(DoubleType).as("value"))
    }),
    "q_skew_join" -> ((s, dir) => {
      // salted skew join (operators/SkewJoin.scala): a power-law key joined
      // to a per-key dim without a straggler — every left row lands in one
      // of 8 salt buckets, the dim row replicates across all 8, and the
      // result is EXACTLY the plain inner join (the oracle). At 100 TB this
      // is the remedy when one hot key defeats hash partitioning and the
      // dim side is too big to broadcast.
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val dim = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"))
      graft.operators.SkewJoin.salted(ev, dim, "user_id", saltFactor = 8)
        .groupBy(col("user_id"), col("user_events"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast(DoubleType).as("total_value"))
    }),
    // ---- Iceberg partition transforms (SURVEY §2.10) ----
    "t_temporal_transforms" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        transforms.yearsT(col("l_shipdate")).as("t_year"),
        transforms.monthsT(col("l_shipdate")).as("t_month"),
        transforms.daysT(col("l_shipdate")).as("t_day"),
        transforms.hoursT(col("l_shipdate")).as("t_hour"))
    }),
    "t_truncate_transforms" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        transforms.truncate(10, col("p_size")).as("t_size"),
        transforms.truncate(100, col("p_partkey")).as("t_key"),
        transforms.truncate(8, col("p_name")).as("t_name"))
    }),
    "t_bucket_transforms" -> ((s, dir) => {
      // Iceberg bucket = (murmur3_x86_32(spec encoding) & MaxInt) % N.
      // Inputs are the PUBLIC spec's Appendix-B golden vectors (also at
      // /root/reference/icelake/src/types/transform/bucket.rs:158-231); the
      // oracle carries the spec's published hash constants and derives the
      // bucket in DuckDB — a true independent oracle for every encoding.
      import s.implicits._
      val cases = Seq(
        ("int_34", transforms.bucket(16, lit(34)), transforms.bucket(7, lit(34))),
        ("long_34", transforms.bucket(16, lit(34L)), transforms.bucket(7, lit(34L))),
        ("decimal_14_20",
          transforms.bucket(16, lit(BigDecimal("14.20")).cast(DecimalType(9, 2))),
          transforms.bucket(7, lit(BigDecimal("14.20")).cast(DecimalType(9, 2)))),
        ("date_2017_11_16",
          transforms.bucket(16, expr("date'2017-11-16'")),
          transforms.bucket(7, expr("date'2017-11-16'"))),
        ("ts_2017_11_16_22_31_08",
          transforms.bucket(16, expr("timestamp'2017-11-16 22:31:08'")),
          transforms.bucket(7, expr("timestamp'2017-11-16 22:31:08'"))),
        ("string_iceberg",
          transforms.bucket(16, lit("iceberg")), transforms.bucket(7, lit("iceberg"))),
        ("uuid_f79c3e09",
          transforms.bucketUuid(16, lit("f79c3e09-677c-4bbd-a479-3f349cb785e7")),
          transforms.bucketUuid(7, lit("f79c3e09-677c-4bbd-a479-3f349cb785e7"))),
        ("binary_00010203",
          transforms.bucket(16, lit(Array[Byte](0, 1, 2, 3))),
          transforms.bucket(7, lit(Array[Byte](0, 1, 2, 3)))))
      cases.map { case (name, b16, b7) =>
        Seq(name).toDF("case_name")
          .select(col("case_name"), b16.cast(LongType).as("b16"), b7.cast(LongType).as("b7"))
      }.reduce(_ unionAll _)
    }),
    // ---- dedup family ----
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), Seq("text"), "doc_id")
        .select(col("doc_id"), col("n_copies"))
    }),
    "dedup_minhash_sigs" -> ((s, dir) => {
      // DuckDB cannot compute the 64-bit shingle hashes, so the oracle is
      // the MinHash union law instead: for any token split with a
      // (shingleSize-1)-token overlap, shingles(A) ∪ shingles(B) =
      // shingles(text), hence sig(text) = elementwise min(sig(A), sig(B)).
      // Any correct MinHash implementation satisfies it; wrong aggregation,
      // order-dependence, or per-row nondeterminism breaks it.
      val w = split(trim(col("text")), "\\s+")
      val L = size(w)
      // split shingle index (3-token shingles); floor — Spark's `/` on ints
      // is double division
      val m = floor((L - lit(3)) / lit(2)).cast(IntegerType)
      val textA = concat_ws(" ", slice(w, lit(1), m + lit(3)))
      val textB = concat_ws(" ", slice(w, m + lit(2), L - m - lit(1)))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(text.minhash(col("text"), 3, 64)).cast(LongType).as("n_hashes"),
        (L < 4 || text.minhash(col("text"), 3, 64) ===
          zip_with(text.minhash(textA, 3, 64), text.minhash(textB, 3, 64),
            (x, y) => least(x, y))).as("union_min_ok"))
    }),
    "dedup_simhash" -> ((s, dir) => {
      // SimHash is a bag-of-words sign aggregate → invariant under token
      // reordering, and under doubling every token's count (doubling every
      // bit tally cannot change its sign). Emitted as DuckDB-checkable
      // booleans; the raw fingerprint values are golden-tested in DedupSpec.
      val tok = split(trim(col("text")), "\\s+")
      val reversedText = concat_ws(" ", reverse(tok))
      val doubledText = concat_ws(" ", concat(tok, tok))
      t(s, dir, "documents").select(
        col("doc_id"),
        (text.simhash(col("text")) === text.simhash(reversedText)).as("order_ok"),
        (text.simhash(col("text")) === text.simhash(doubledText)).as("scale_ok"))
    }),
    "dedup_lsh_pairs" -> ((s, dir) => {
      Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
    }),
    "dedup_sweep" -> ((s, dir) => {
      // threshold governance: decile histogram of exact jaccard over the
      // verified candidate pairs + cumulative pairs at-or-above each cut
      // — the table read before committing to a dedup threshold (how
      // much would t=0.8 vs t=0.9 remove?). Candidate recall is exact
      // down to 0.4 on this corpus (dedup_lsh_pairs proves it), so the
      // histogram is exact over its domain.
      val pairs = Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      val hist = pairs
        .withColumn("bucket",
          least(floor(col("jaccard") * 10), lit(9L)).cast(LongType))
        .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      hist.withColumn("pairs_at_or_above",
        sum("n_pairs").over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
    }),
    "dedup_simhash_pairs" -> ((s, dir) => {
      // pigeonhole Hamming candidates -> exact-Jaccard verify. Every
      // near-dup in this corpus sits at Hamming <= 15 (measured at BOTH
      // sf0.01 and sf0.1 — at 10 the sf0.1 corpus loses 3 true pairs), so
      // maxHamming=15 (16 blocks x 4-bit keys) makes candidate RECALL
      // exact while buckets stay far under the cap; the verified pair set
      // equals DuckDB's exact-Jaccard >= 0.9 pairs — a hash oracle over
      // the whole pigeonhole pipeline.
      val docs = t(s, dir, "documents")
      val cand = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 15)
      Dedup.ngramJaccard(docs, "doc_id", "text", cand.select(col("a"), col("b")), n = 2)
        .filter(col("jaccard") >= 0.9)
        .select(col("a"), col("b"), col("jaccard"))
    }),
    "dedup_embedding" -> ((s, dir) => {
      // The synthetic embeddings are near-orthogonal, so plant deterministic
      // near-duplicates (ids +1000000, each component scaled by 1.001) and
      // detect them — exercises the LSH bucket join + cosine verify path.
      val e = t(s, dir, "embeddings")
      val jittered = e.filter(col("vec_id") < 10).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      // bits=40 over 4 bands -> 10-bit band keys (1024 buckets/band): at
      // 12 bits every bucket blew past maxBucket once the corpus reached
      // sf0.1 scale and recall silently dropped to zero. Positive scaling
      // preserves every sign bit, so wider signatures cost no recall on
      // the planted pairs.
      Dedup.embeddingNearDup(e.select(col("vec_id"), col("embedding")).union(jittered),
        "vec_id", "embedding", cosineThreshold = 0.95, bits = 40)
        .select(col("vec_a"), col("vec_b"))
    }),
    "dedup_components" -> ((s, dir) => {
      // collapse the verified near-dup PAIRS into clusters: every doc in a
      // component maps to its min-id canonical survivor. Exact-duplicate
      // pre-collapse (textComponents) keeps the pair count tracking
      // UNIQUE content — same labels, quadratic-to-linear on copy-heavy
      // corpora
      Dedup.textComponents(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
    }),
    "dedup_incremental" -> ((s, dir) => {
      // INCREMENTAL dedup — the production shape: the historical corpus
      // keeps a signature INDEX (here: even doc_ids, staged through a
      // graft table — the pipeline state lives in the table layer); a
      // new batch (odd ids) flags against the index in O(batch), never
      // re-scanning history
      val docs = t(s, dir, "documents")
      val idx = Dedup.minhashIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4)
      val tbl = freshTable(s, "dedup_incremental", idx)
      tbl.append(s, idx)
      Dedup.incrementalFlags(
        docs.filter(col("doc_id") % 2 === 1), tbl.scan(s), "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
    }),
    "dedup_softweight" -> ((s, dir) => {
      // SOFT dedup: near-duplicates are DOWNWEIGHTED (weight = 1/cluster
      // size) instead of dropped — the loss-weighting alternative when
      // exact-one-copy is too aggressive (repeated boilerplate still
      // contributes, proportionally); singletons keep weight 1. Same
      // banded LSH -> connected components (exact-dup pre-collapsed);
      // one broadcast-size join back.
      val docs = t(s, dir, "documents")
      val comps = Dedup.textComponents(docs, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      val sizes = comps.groupBy("component").agg(count(lit(1)).as("csize"))
      docs.select(col("doc_id"))
        .join(comps.join(sizes, "component").select(col("doc_id"), col("csize")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          round(lit(1.0) / coalesce(col("csize"), lit(1L)), 6).as("weight"))
    }),
    "dedup_incremental_embed" -> ((s, dir) => {
      // incremental SemDeDup: history = the embeddings table as a
      // sign-bit index; the new batch = jittered copies of the first 10
      // vectors (planted dups) + fresh random-ish vectors (shifted ids)
      // — flags in O(batch) against the index
      val e = t(s, dir, "embeddings")
      val index = Dedup.embeddingIndex(e, "vec_id", "embedding", bits = 40)
      val jittered = e.filter(col("vec_id") < 10).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      val reversed = e.filter(col("vec_id") >= 10 && col("vec_id") < 20).select(
        (col("vec_id") + lit(2000000L)).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
      Dedup.embeddingIncrementalFlags(
        jittered.union(reversed), index, "vec_id", "embedding",
        cosineThreshold = 0.95, bits = 40)
    }),
    "dedup_semantic" -> ((s, dir) => {
      // SemDeDup-shaped semantic dedup over EMBEDDINGS: near-dup pairs by
      // banded sign-bit LSH + cosine verify -> connected components ->
      // one canonical survivor per cluster. Same planted duplicates as
      // dedup_embedding; the output is the deduped vector corpus itself.
      val e = t(s, dir, "embeddings")
      val jittered = e.filter(col("vec_id") < 10).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      val corpus = e.select(col("vec_id"), col("embedding")).union(jittered)
      // exact-dup pre-collapse (round-11): LSH + CC run over one
      // representative per distinct vector — measured at 100x, the
      // uncollapsed path re-bucketed every identical copy (4.7x wall at
      // the 10x step vs ~1.1-1.7x for the collapsed text family)
      val comps = Dedup.embeddingComponents(
        corpus, "vec_id", "embedding", cosineThreshold = 0.95, bits = 40)
      Dedup.resolveDuplicates(corpus, "vec_id", comps).select(col("vec_id"))
    }),
    "dedup_substrings" -> ((s, dir) => {
      // exact-substring duplication coverage (Lee et al. 2021): a token
      // span is duplicated when its 8-token gram occurs more than once
      // anywhere in the corpus; per doc — duplicated-gram count, tokens
      // covered by merged spans, span count, covered fraction
      Dedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text", k = 8)
    }),
    "dedup_substrings_cut" -> ((s, dir) => {
      // the REMOVAL half: every token covered by a corpus-duplicated
      // 8-gram is cut and the doc re-assembled from survivors — the
      // as-of-window formulation (no per-position range join)
      Dedup.removeDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text", k = 8)
    }),
    "dedup_winnow" -> ((s, dir) => {
      // winnowing fingerprint overlap (MOSS): window-min of 4-gram hashes
      // guarantees a shared fingerprint for any shared run of >= 7
      // tokens; pairs sharing >= 2 distinct fingerprints are reported
      Dedup.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 4, w = 4, minShared = 2)
    }),
    "dedup_resolve" -> ((s, dir) => {
      // the full dedup pipeline ending in a deduped CORPUS: LSH pairs ->
      // connected components (exact-dup pre-collapsed) -> one canonical
      // survivor per cluster (plus all unclustered docs), one anti-join
      val docs = t(s, dir, "documents")
      val comps = Dedup.textComponents(docs, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      Dedup.resolveDuplicates(docs, "doc_id", comps)
        .select(col("doc_id"), col("lang"))
    }),
    "dedup_stats" -> ((s, dir) => {
      // per-source dedup impact accounting: the report reviewed AFTER a
      // dedup pass and BEFORE the cut ships — which sources lose how
      // much (a source bleeding 40% is a crawler bug, not a cleanup)
      val docs = t(s, dir, "documents")
      val comps = Dedup.textComponents(docs, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      val kept = Dedup.resolveDuplicates(docs, "doc_id", comps)
        .select(col("doc_id"), lit(1L).as("k"))
      docs.select(col("doc_id"), col("source"))
        .join(kept, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(coalesce(col("k"), lit(0L))).as("kept"))
        .withColumn("dropped", col("docs") - col("kept"))
        .withColumn("drop_rate",
          col("dropped").cast(DoubleType) / col("docs"))
    }),
    // ---- pipeline ops: sampling / packing / decontamination ----
    "sample_stratified" -> ((s, dir) => {
      // data-mix sampling: keep 25% of English, 50% of everything else,
      // decided by md5(doc_id) so the pick is engine-portable
      Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.25), defaultFraction = 0.5)
        .select(col("doc_id"), col("lang"))
    }),
    "pack_sequences" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val toks = d.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      Packing.packGreedy(toks, "doc_id", "n_tokens", budgetTokens = 2000L)
    }),
    "pack_efficiency" -> ((s, dir) => {
      // packing-policy governance: padding waste of one-doc-per-sequence
      // vs concat-and-split at a 512 context — the two ends of the
      // packing spectrum, quantified before choosing (the middle —
      // greedy whole-doc packing — is pack_sequences). One aggregate
      // row, integer arithmetic, two output rows.
      val d = t(s, dir, "documents")
      val toks = d.select(
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n"))
      val a = toks.agg(
        sum(col("n")).as("total"),
        sum(expr("(n + 511) div 512")).as("seq_per_doc")).head()
      val (total, perDoc) = (a.getLong(0), a.getLong(1))
      val concatSeq = (total + 511) / 512
      import s.implicits._
      Seq(
        ("per_doc", perDoc, perDoc * 512 - total,
          total.toDouble / (perDoc * 512)),
        ("concat_split", concatSeq, concatSeq * 512 - total,
          total.toDouble / (concatSeq * 512)))
        .toDF("packer", "n_sequences", "pad_tokens", "fill_rate")
    }),
    "pack_concat" -> ((s, dir) => {
      // concat-and-split packing: the doc-id-ordered token stream cut
      // into exactly-full 512-token sequences, each doc mapped to its
      // (seq_id, in-sequence span) rows — the document-mask map a
      // sequence-packed trainer consumes
      val d = t(s, dir, "documents")
      val toks = d.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      Packing.packConcat(toks, "doc_id", "n_tokens", seqLen = 512L)
    }),
    "text_bpe" -> ((s, dir) => {
      // REAL BPE tokenizer: merges trained on the doc_id%5==0 slice's
      // word histogram (one corpus pass; rounds run over the bounded
      // vocabulary), then greedy lowest-rank segmentation of every doc
      // with the ranks broadcast. Iterative merge application is not
      // SQL-expressible — the oracle is a committed fixture produced by
      // an INDEPENDENT pure-Python implementation (tools/gen_bpe_fixture
      // .py); the algorithm is also spec-verified against hand-computed
      // merges in OperatorsSpec.
      val docs = t(s, dir, "documents")
      val merges = Bpe.train(
        docs.filter(col("doc_id") % 5 === 0), "text", numMerges = 40)
      Bpe.segment(docs, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_bpe_tokens"),
          array_join(col("token_preview"), " ").as("preview"))
    }),
    "pack_shards" -> ((s, dir) => {
      // training-export shuffle: deterministic pseudo-random global order
      // (md5-salted) split into 8 balanced shards with stable within-shard
      // sequence — the re-run/backfill-reproducible form of "shuffle the
      // corpus and write N shards"
      Packing.shuffleShards(t(s, dir, "documents"), "doc_id",
        numShards = 8, salt = "epoch0")
    }),
    "pack_balanced" -> ((s, dir) => {
      // token-BALANCED sharding: size-rank round-robin (the distributed
      // LPT heuristic) — shard token totals stay within one max-doc of
      // each other instead of hash-striping's in-expectation balance
      val d = t(s, dir, "documents")
        .withColumn("n_tokens", graft.functions.text.tokenCount(col("text")))
      Packing.balancedShards(d, "doc_id", "n_tokens", numShards = 7)
    }),
    "pipeline_incremental" -> ((s, dir) => {
      // the INCREMENTAL curation loop — the production shape at 100 TB:
      // raw docs land in a graft table in batches; each new batch is read
      // INCREMENTALLY (snapshot-range scan — history is never re-read),
      // quality-gated, exact-deduped within the batch (min doc_id wins)
      // and against the curated table (anti-join on content
      // fingerprint), and survivors append to the curated table. The
      // state between runs is the curated TABLE itself — no external
      // index service. Output = the curated corpus after two rounds.
      val docs = t(s, dir, "documents").select(
        col("doc_id"), col("text"), col("n_chars"))
      def curate(d: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        d.filter(col("n_chars") >= 200)
          .withColumn("fp", md5(col("text")))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .select(col("doc_id"), col("fp"))
      }
      val raw = freshTable(s, "pipe_incr_raw", docs)
      raw.append(s, docs.filter(pmod(col("doc_id"), lit(3)) =!= 2))
      val snap1 = raw.metadata.currentSnapshotId.get
      val seed = curate(raw.scan(s))
      val curated = freshTable(s, "pipe_incr_curated", seed)
      curated.append(s, seed)
      // batch 2 lands in raw; the incremental scan sees ONLY its rows
      raw.append(s, docs.filter(pmod(col("doc_id"), lit(3)) === 2))
      val survivors = curate(raw.scanIncremental(s, fromSnapshotId = snap1))
        .join(curated.scan(s).select(col("fp")), Seq("fp"), "left_anti")
      curated.append(s, survivors.select(col("doc_id"), col("fp")))
      curated.scan(s).select(col("doc_id"), col("fp"))
    }),
    "pipeline_corpus" -> ((s, dir) => {
      // the END-TO-END training-corpus pipeline, composed from the
      // engine's own operators: quality gate → exact dedup →
      // decontamination → target-mixture sampling → sequence packing.
      // Each stage is individually oracle-gated elsewhere; this query
      // gates their COMPOSITION — the thing a user actually runs.
      val d = t(s, dir, "documents")
      val q = d.filter(col("n_chars") >= 200)
      val dd = Dedup.exact(q, Seq("text"), "doc_id").drop("n_copies")
      val bench = d.filter(pmod(col("doc_id"), lit(97)) === 0)
      val train = dd.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      val flagged = Decontamination.flagged(train, bench, "doc_id", "text", n = 4)
        .select(col("doc_id"))
      // stage boundary: the sampler's domain histogram, the packer's
      // quantile probe, and the final job are three separate ACTIONS —
      // uncached, each would re-run the gate→dedup→decontam prefix.
      // (A production pipeline checkpoints here for the same reason.)
      val clean = train.join(flagged, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mixed = Selection.mixtureSample(clean, "doc_id", "source", "n_chars",
        Map("src0" -> 0.3, "src1" -> 0.3, "src2" -> 0.4), budget = 0.6)
      val toks = mixed.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"))
      Packing.packGreedy(toks, "doc_id", "n_tokens", budgetTokens = 2000L)
    }),
    "decontaminate" -> ((s, dir) => {
      // benchmark set = every 97th doc; flag training docs sharing a word
      // 4-gram with it
      val d = t(s, dir, "documents")
      Decontamination.flagged(
        d.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(97)) === 0),
        "doc_id", "text", n = 4)
    }),
    "decontaminate_cut" -> ((s, dir) => {
      // span-level decontamination: remove just the matched 4-token
      // windows instead of dropping whole docs — the surgical form that
      // keeps the book and cuts the quiz question
      val d = t(s, dir, "documents")
      Decontamination.cutSpans(
        d.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(97)) === 0),
        "doc_id", "text", n = 4)
    }),
    "decontaminate_report" -> ((s, dir) => {
      // per-suite contamination decision table: three synthetic suites
      // (every 97th doc, labeled by doc_id%3), flagged-doc counts and
      // corpus rates per suite — zero-hit suites still report
      val d = t(s, dir, "documents")
      Decontamination.contaminationReport(
        d.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(97)) === 0)
          .withColumn("suite", concat(lit("s"), pmod(col("doc_id"), lit(3)))),
        "doc_id", "text", "suite", n = 4)
    }),
    "decontaminate_bloom" -> ((s, dir) => {
      // Bloom-prefiltered decontamination: identical answer to
      // `decontaminate` (the filter only prunes definite non-matches;
      // survivors are exactly re-verified), but the bench n-gram set
      // ships as a ~10-bit-per-element sketch instead of exact strings
      val d = t(s, dir, "documents")
      Decontamination.flaggedBloom(
        d.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(97)) === 0),
        "doc_id", "text", n = 4)
    }),
    "cluster_kmeans" -> ((s, dir) => {
      // corpus topic-bucketing: deterministic Lloyd k-means over integer-
      // quantized embeddings (power-of-two scaling is FP-exact, distances
      // are integer arithmetic, ties break to the lowest centroid id —
      // assignments are bit-identical across engines)
      Clustering.kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, iters = 1)
    }),
    "cluster_affinity" -> ((s, dir) => {
      // label-noise screen: distance to the own-label centroid vs the
      // nearest other-label centroid; a negative margin flags a row whose
      // embedding sits in another class's territory (integer-quantized —
      // margins are bit-identical across engines)
      Clustering.labelAffinity(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label")
    }),
    "embed_quantize" -> ((s, dir) => {
      // int8 embedding quantization (4x smaller storage): per-vector
      // scale + floor round-half-up, exact in both engines
      Quantization.quantizeStats(t(s, dir, "embeddings"), "vec_id", "embedding")
    }),
    "embed_quantize_int4" -> ((s, dir) => {
      // block-wise int4 (the QLoRA storage shape): per-16-dim absmax
      // scales so an outlier dim can't flatten the rest at a [-7,7]
      // grid; same floor round-half-up, scalar folds for the oracle
      Quantization.quantizeInt4Stats(
        t(s, dir, "embeddings"), "vec_id", "embedding", blockSize = 16)
    }),
    "profile_columns" -> ((s, dir) => {
      // ANALYZE-style column profile of the corpus table: one aggregation
      // pass, one output row per column
      Profiling.profile(t(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
    }),
    // ---- similarity search ----
    "ann_brute_force" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 4), "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "ann_recall" -> ((s, dir) => {
      // the ANN quality gate: recall@5 of a probe-1 IVF (cells = the
      // deterministic integer k-means) against brute-force ground truth,
      // per query — the measurement every approximate index must pass
      // before it replaces the exact scan. Runs on a query SAMPLE (the
      // production shape at 100 TB).
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      val truth = Similarity
        .bruteForceTopK(e, q, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val cells = Clustering.kmeansAssign(e, "vec_id", "embedding",
        k = 4, iters = 1)
      val corpusC = e.join(cells, "vec_id")
      val qC = q.join(cells, "vec_id").select(
        col("vec_id").as("qid"), col("embedding").as("qv"), col("cluster"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val candTop = corpusC.join(qC, Seq("cluster"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          graft.functions.vectors.cosineSim(col("qv"), col("embedding"))
            .as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = truth.join(candTop, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      q.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
        .withColumn("recall", col("hits").cast(DoubleType) / 5)
    }),
    "ann_multiprobe" -> ((s, dir) => {
      // the nprobe knob SWEPT (ann_recall fixes it at 1): per-query
      // recall@5 AND candidate volume at nprobe = 1, 2, 4 over the
      // deterministic integer-k-means cells — the recall-vs-cost curve
      // that actually sizes a production IVF (pick the smallest nprobe
      // whose recall clears the gate; n_cand is the I/O you pay for
      // it). Cells rank per query by EXACT integer centroid distance
      // (k struct literals sorted in-expression, ties to the lower
      // cell id); ONE corpus join serves every sweep point — each
      // candidate carries its cell's probe rank, so nprobe = p is a
      // filter, not a re-scan. At k = 4 the nprobe=4 row IS the
      // exhaustive scan: recall must read 1.0, pinning the sweep's
      // endpoints (spot-asserted in EntrySpec).
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      val truth = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val (cents, asg) = Clustering.kmeansFit(e, "vec_id", "embedding",
        k = 4, iters = 1)
      val qe = transform(col("embedding"),
        x => floor(x.cast(DoubleType) * 1024).cast(LongType))
      // codegen'd L2 kernel per cell (round-13): bit-identical to the
      // interpreted zip_with fold it replaces
      val cellCands = array(cents.map { case (cid, c) =>
        struct(
          vectors.l2sqLong(qe, c).as("d"),
          lit(cid).as("cid"))
      }: _*)
      val qCells = q.select(col("vec_id").as("qid"), col("embedding").as("qv"),
          posexplode(sort_array(cellCands)).as(Seq("p", "dc")))
        .select(col("qid"), col("qv"),
          (col("p") + 1).cast(LongType).as("crank"),
          col("dc.cid").as("cluster"))
      val scored = e.join(asg, "vec_id")
        .join(qCells, Seq("cluster"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
          graft.functions.vectors.cosineSim(col("qv"), col("embedding"))
            .as("cos"),
          col("crank"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sweeps = Seq(1L, 2L, 4L).map { p =>
        val cand = scored.filter(col("crank") <= p)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        val top = cand.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("neighbor_id"))
        val nc = cand.groupBy("query_id").agg(count(lit(1)).as("n_cand"))
        val hits = truth.join(top, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        q.select(col("vec_id").as("query_id"))
          .join(nc, Seq("query_id"), "left")
          .join(hits, Seq("query_id"), "left")
          .select(lit(p).as("nprobe"), col("query_id"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            coalesce(col("hits"), lit(0L)).as("hits"))
      }
      sweeps.reduce(_ unionByName _)
        .withColumn("recall", col("hits").cast(DoubleType) / 5)
    }),
    "ann_beam" -> ((s, dir) => {
      // HNSW-style BEAM SEARCH over the k-NN graph edge set (the
      // embed_knn_graph backbone put to work), with an IVF-ROUTED entry:
      // each query enters at its own cell's representative (min vec_id)
      // and three beam-of-8 expansion layers walk the cell's top-5
      // neighbor edges toward the query, greedy by the same EXACT
      // integer-quantized dot product the graph was built with — the
      // production pattern where coarse cells pick the entry and the
      // navigable graph does the fine ranking, touching only
      // beam x degree nodes per layer instead of the cell's whole
      // posting list. Everything integer: cell assignment, edge
      // ranking and beam scores are bit-identical in any engine, so
      // the DuckDB replica replays the entire walk. k grows with the
      // corpus (k = max(4, n div 250), cells ~constant); at sf0.01
      // that is k = 4, matching the oracle's fixed seed set. Setup
      // (the one-time graph BUILD — the HNSW model: build once, search
      // many; embed_knn_graph's own bench row prices the build) / op
      // (the walk) split lives in [[opParts]].
      // GUARD: the DuckDB replica hardcodes 4 seed centroids (vec_id <
      // 4); the engine's adaptive k = max(4, n div 250) matches only
      // while n < 1250, so an oracle comparison on a bigger corpus
      // must fail loudly here instead of silently hash-mismatching.
      val n = t(s, dir, "embeddings").count()
      require(math.max(4, (n / 250).toInt) == 4,
        s"ann_beam oracle replica pins k=4 seed centroids; corpus n=$n " +
          s"gives k=${math.max(4, (n / 250).toInt)} — verify this query " +
          "at sf<=0.01 or re-parameterize the replica's seed count")
      opParts("ann_beam")(s, dir)()
    }),
    "ann_beam_index" -> ((s, dir) => {
      // the DURABLE form of ann_beam: the same integer walk, but over a
      // PERSISTED graph index (vectors + symmetrized edges as graft
      // tables identity-partitioned by id bucket) whose per-layer
      // adjacency and rescore reads are partition-pruned point probes —
      // I/O bounded by the batch geometry, not the corpus. Result is
      // bit-identical to ann_beam, so the oracle replica is shared.
      // Same k==4 guard: the replica pins 4 seed centroids.
      val n = t(s, dir, "embeddings").count()
      require(math.max(4, (n / 250).toInt) == 4,
        s"ann_beam_index oracle replica pins k=4 seed centroids; corpus " +
          s"n=$n gives k=${math.max(4, (n / 250).toInt)} — verify at " +
          "sf<=0.01 or re-parameterize the replica's seed count")
      opParts("ann_beam_index")(s, dir)()
    }),
    "ann_hard_negatives" -> ((s, dir) => {
      // contrastive hard-negative mining: per anchor, the 3 most-similar
      // vectors of a DIFFERENT label — the negatives that actually move
      // a contrastive loss. Broadcast anchors, stream the corpus once,
      // partial top-k before the final window.
      val e = t(s, dir, "embeddings")
      Similarity.hardNegatives(
        e, e.filter(col("vec_id") < 4), "vec_id", "embedding", "label", 3)
    }),
    "ann_ivf" -> ((s, dir) => {
      // Planted-match oracle: queries are jittered copies (×1.001, ids
      // +1000000) of corpus vectors. Positive scaling preserves the LSH
      // sign bits, so IVF probing must land in the source vector's cell and
      // rank it first (cosine ≈ 1 vs ≤0.52 for any random pair at this SF)
      // — an end-to-end check of cell assignment, probing, and ranking.
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.ivfTopK(e, queries, "vec_id", "embedding", 5)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "ann_filtered" -> ((s, dir) => {
      // FILTERED vector search (the RAG tenant/language/date-filter
      // problem): top-k among corpus vectors passing a metadata
      // predicate, strategy switched on measured selectivity (exact
      // brute over a selective slice, filtered-IVF probe otherwise —
      // both paths exercised in OperatorsSpec). Planted-match oracle:
      // queries are jittered copies of the four smallest EVEN-labeled
      // vectors, and rank-1 must be the source among even labels only.
      val e = t(s, dir, "embeddings")
      val srcs = e.filter(pmod(col("label"), lit(2)) === 0)
        .orderBy(col("vec_id")).limit(4)
      val queries = srcs.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.filteredTopK(e, queries, "vec_id", "embedding",
          pmod(col("label"), lit(2)) === 0, k = 5)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "ann_ivf_pq" -> ((s, dir) => {
      // product quantization with exact re-rank: the same planted-match
      // oracle (jitter is normalized away, so the source vector reaches
      // the ADC shortlist and the exact re-rank must put it first)
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.pqTopK(e, queries, "vec_id", "embedding", 5)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "ann_ivf_centroids" -> ((s, dir) => {
      // trained-centroid IVF (k-means cells) with the same planted-match
      // oracle as ann_ivf: normalization makes the ×1.001 jitter a no-op
      // for cell assignment, so the source vector must rank first
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.ivfCentroidTopK(e, queries, "vec_id", "embedding", 5)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "ann_ivf_index" -> ((s, dir) => {
      // PERSISTED IVF: build the index as a graft table identity-partitioned
      // by cell, then probe it — the scan file-prunes to the probed cells.
      // Same planted-match oracle as ann_ivf (source vector must rank first).
      val e = t(s, dir, "embeddings")
      val loc = java.nio.file.Files
        .createTempDirectory("graft-ivf-index").toUri.toString.stripSuffix("/")
      Similarity.buildIvfIndex(e, "vec_id", "embedding", loc)
      val queries = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.ivfIndexTopK(s, loc, queries, "vec_id", "embedding", 5)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "ann_index_update" -> ((s, dir) => {
      // INCREMENTAL IVF maintenance: build the index over the even half
      // of the corpus (generation 1), append the odd half as a new crawl
      // batch — O(batch): argmin against the EXISTING centroids + one
      // identity-partitioned append, no re-training — then probe with
      // jittered copies of vectors from BOTH generations: the planted
      // source must rank first whichever generation carries it. The
      // batch passes the drift gate (same corpus distribution).
      val e = t(s, dir, "embeddings")
      val loc = java.nio.file.Files
        .createTempDirectory("graft-ivf-update").toUri.toString.stripSuffix("/")
      Similarity.buildIvfIndex(
        e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", loc)
      Similarity.addToIvfIndex(
        s, loc, e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
      val queries = e.filter(col("vec_id") < 4).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      Similarity.ivfIndexTopK(s, loc, queries, "vec_id", "embedding", 5)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    // ---- text analysis ----
    "text_tokens" -> ((s, dir) => {
      TextAnalysis.tokenStats(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          col("n_tokens").cast(LongType).as("n_tokens"),
          col("n_chars").cast(LongType).as("n_chars"),
          col("n_tokens_bpe_est").cast(LongType).as("n_tokens_bpe_est"))
    }),
    "text_quality" -> ((s, dir) => {
      TextAnalysis.qualityScores(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          col("n_chars").cast(LongType).as("n_chars"),
          col("n_tokens").cast(LongType).as("n_tokens"),
          col("mean_word_len"), col("stopword_ratio"))
    }),
    "text_oov" -> ((s, dir) => {
      // tokenizer-fit report: per-doc out-of-vocabulary rate against the
      // corpus's own top-1000 word vocabulary (count desc, word asc at
      // the cut — deterministic); two partial-aggregated shuffles + one
      // broadcast vocab join, the corpus never shuffles by word twice
      TextAnalysis.vocabCoverage(
        t(s, dir, "documents"), "doc_id", "text", vocabSize = 1000)
    }),
    "text_readability" -> ((s, dir) => {
      // Flesch reading-ease with the vowel-group syllable heuristic:
      // exact integer counts, one fixed-order double expression
      TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")
    }),
    "corpus_lengths" -> ((s, dir) => {
      // sequence-length profile in log2 bands: the packing/context-size
      // planning table; one bounded aggregate
      TextAnalysis.tokenLengthHistogram(t(s, dir, "documents"), "text")
    }),
    "text_scripts" -> ((s, dir) => {
      // script-mix hygiene: the %11 slice is REPLACED by CJK text
      // (dominant flips), the %9 slice gains a Cyrillic sentence (mixed
      // where the suffix clears the 15% share), the rest stay pure Latin
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(11)) === 0,
          lit("汉字文本处理流水线质量检查"))
          .when(pmod(col("doc_id"), lit(9)) === 0,
            concat(col("text"), lit(" добавленный русский текст для проверки")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.scriptMix(d, "doc_id", "text")
    }),
    "text_gopher" -> ((s, dir) => {
      // the published Gopher quality rules as one map-only composite
      // filter (per-rule booleans + conjunction) — the first gate of a
      // web pipeline, before dedup/classifiers see the junk
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text")
    }),
    "pipeline_webclean" -> ((s, dir) => {
      // the crawl-hygiene FRONT DOOR as one composed, single-pass filter:
      // encoding screen → language gate → C4 page rules → Gopher ratio
      // rules, each verdict surfaced. The word-soup corpus is shaped so
      // EVERY gate sees both outcomes: docs re-line into 8-token
      // '.'-terminated sentences (C4 passes at >=3 kept lines, short docs
      // fail), the %3 slice gains a stopword sentence (Gopher's
      // required-stopword rule has passers), the %7 slice keeps its raw
      // unpunctuated single line (C4 retains nothing), and the %13 slice
      // is corruption-planted as in text_mojibake. ONE map-only select —
      // no join, no shuffle, one pass over the corpus bytes.
      val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => length(x) > 0)
      val lines = transform(
        sequence(lit(0), floor((size(toks) - 1) / 8).cast(IntegerType)),
        i => concat(array_join(slice(toks, i * lit(8) + lit(1), lit(8)), " "),
          lit(".")))
      val base = array_join(lines, "\n")
      val withStops = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(base, lit("\nthe data have to be of use and that with scale.")))
        .otherwise(base)
      val shaped = when(pmod(col("doc_id"), lit(7)) === 0, col("text"))
        .otherwise(withStops)
      val planted = t(s, dir, "documents").select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(shaped,
            lit(" caf\u00C3\u00A9 x\u00E2\u20AC\u2122y z\uFFFDw \u0007")))
          .otherwise(shaped).as("text"))
      TextAnalysis.webClean(planted, "doc_id", "text")
    }),
    "text_keywords" -> ((s, dir) => {
      // per-doc top-3 tf-idf keywords with the integer bit-bucket idf —
      // exact integer scores, engine-parity by construction
      TextAnalysis.keywords(t(s, dir, "documents"), "doc_id", "text")
    }),
    "text_c4" -> ((s, dir) => {
      // the published C4 line/page cleaning rules — line-level where
      // Gopher is ratio-level; map-only codegen'd builtins, no shuffle
      TextAnalysis.c4Rules(t(s, dir, "documents"), "doc_id", "text")
    }),
    "text_langid" -> ((s, dir) => {
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")
    }),
    "text_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
    }),
    "text_bm25" -> ((s, dir) => {
      // corpus relevance scoring against a seed query — the weighting
      // head of importance-based data selection
      TextAnalysis.bm25(t(s, dir, "documents"), "doc_id", "text",
        Seq("data", "query", "spark"))
    }),
    "text_normalize" -> ((s, dir) => {
      // canonicalization pass run before any hashing/dedup/tokenization:
      // NFC-compose, strip control chars, collapse whitespace. The corpus
      // is ASCII, so a decomposed e+COMBINING ACUTE, control bytes and
      // messy whitespace are injected to exercise every rule. Map-only
      // codegen'd kernel — no shuffle, no UDF.
      val messy = concat(
        lit("é  "), col("text"), lit(" \txy "))
      t(s, dir, "documents")
        .select(col("doc_id"), text.normalize(messy).as("norm_text"))
        .withColumn("norm_chars", length(col("norm_text")).cast(LongType))
    }),
    "text_html_extract" -> ((s, dir) => {
      // WET-style HTML→text extraction. The corpus is plain text, so
      // each doc is wrapped in a deterministic HTML template first
      // (script/style/comment junk + entities included); the oracle
      // rebuilds the SAME template and replays the rule chain with
      // DuckDB's RE2 regexps — two independent implementations of the
      // cleaning spec must agree exactly.
      val d = t(s, dir, "documents")
      val html = d.select(col("doc_id"), concat(
        lit("<html><head><title>d</title><style>p {color: red}</style>"),
        lit("<script type=\"text/javascript\">var x = 1 && 2 < 3;</script>"),
        lit("</head><body><!-- crawl: header --><h1 class=\"t\">"),
        col("source"),
        lit("</h1>\n<p>"), col("text"),
        lit("</p><br/><div>footer &amp; legal&nbsp;&lt;fine&gt;</div></body></html>"))
        .as("html"))
      TextAnalysis.htmlExtract(html, "doc_id", "html")
    }),
    "search_hybrid" -> ((s, dir) => {
      // hybrid retrieval: dense cosine top-20 + BM25 top-20 fused by
      // Reciprocal Rank Fusion — only ranks (ints) cross the engine
      // boundary, so fusion is engine-exact
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents").withColumnRenamed("doc_id", "vec_id")
      Retrieval.hybridRrf(
        emb, docs, "vec_id", "embedding", "text",
        Seq(
          0L -> Seq("data", "query", "spark"),
          1L -> Seq("join", "hash", "merge"),
          2L -> Seq("stream", "window", "batch")),
        kDense = 20, kSparse = 20, topN = 10)
    }),
    "text_topngrams" -> ((s, dir) => {
      // corpus-wide bigram frequency top-50: the vocabulary/statistics
      // pass (stopword discovery, boilerplate and contamination audits)
      TextAnalysis.topNgrams(t(s, dir, "documents"), "text", n = 2, k = 50)
    }),
    "text_perplexity" -> ((s, dir) => {
      // char-trigram LM quality scoring (CCNet shape): per-doc negative
      // log-likelihood under a model trained on the English slice —
      // integer micro-nat quantization makes the scores exact across
      // engines regardless of aggregation order
      Selection.charLmNll(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
    }),
    "text_dsir" -> ((s, dir) => {
      // DSIR importance weights: every document scored by how much its
      // hashed-unigram profile looks like the TARGET slice (English docs)
      // vs the raw corpus — one tiny global aggregate, then a map-only
      // literal-weighted score
      Selection.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
    }),
    "text_linededup" -> ((s, dir) => {
      // CCNet boilerplate-line removal: docs are re-lined
      // deterministically (8 tokens per line — the corpus has no native
      // newlines) so the operator sees real multi-line documents; any
      // line occurring in >= 2 DISTINCT docs is boilerplate and is
      // stripped from every doc, which is re-assembled in line order
      val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => length(x) > 0)
      val lined = t(s, dir, "documents")
        .select(col("doc_id"), toks.as("_tk")) // materialized once
        .select(
          col("doc_id"),
          array_join(
            transform(
              sequence(lit(0), floor((size(col("_tk")) - 1) / 8).cast(IntegerType)),
              i => array_join(slice(col("_tk"), i * lit(8) + lit(1), lit(8)), " ")),
            "\n").as("text"))
      TextAnalysis.lineDedup(lined, "doc_id", "text", "\n", minDocs = 2)
    }),
    "text_langmix" -> ((s, dir) => {
      // mixed-language detection: language-ID each HALF of the doc —
      // halves that disagree (both confidently) expose concatenated
      // multi-language junk a whole-doc vote hides. The doc_id%19 slice
      // is PLANTED with a 1200-word French tail.
      val d = t(s, dir, "documents")
      val planted = d.withColumn("text",
        when(pmod(col("doc_id"), lit(19)) === 0,
          concat(col("text"), repeat(lit(" le la de et est une"), 200)))
          .otherwise(col("text")))
      val w = split(trim(lower(col("text"))), "\\s+")
      val n2 = (size(w) / 2).cast(IntegerType)
      val ha = array_join(slice(w, lit(1), n2), " ")
      val hb = array_join(slice(w, n2 + 1, size(w)), " ")
      planted.select(col("doc_id"),
        text.langId(ha).as("lang_a"),
        text.langId(hb).as("lang_b"))
        .withColumn("mixed",
          col("lang_a") =!= col("lang_b") &&
            col("lang_a") =!= "und" && col("lang_b") =!= "und")
    }),
    "text_mojibake" -> ((s, dir) => {
      // encoding-artifact screen: the doc_id%13 slice is PLANTED with one
      // of each corruption signature (U+FFFD, a Latin-1 re-decode pair,
      // the curly-quote triple, a BEL control) — those docs must flag
      // with exact counts, everything else scores clean
      val d = t(s, dir, "documents")
      val planted = d.withColumn("text",
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(col("text"),
            lit(" caf\u00C3\u00A9 x\u00E2\u20AC\u2122y z\uFFFDw \u0007")))
          .otherwise(col("text")))
      TextAnalysis.mojibake(planted, "doc_id", "text")
    }),
    "text_derep" -> ((s, dir) => {
      // within-doc de-repetition: docs are re-lined deterministically
      // (6 tokens per line), then each doc's own FIRST line is appended
      // again — every doc carries exactly one planted internal repeat
      // the cleaner must drop (plus any natural line repeats)
      val lines = transform(
        sequence(lit(0), floor((size(col("_tk")) - 1) / 6).cast(IntegerType)),
        i => array_join(slice(col("_tk"), i * lit(6) + lit(1), lit(6)), " "))
      val lined = t(s, dir, "documents")
        .select(col("doc_id"),
          filter(split(lower(col("text")), "[^a-z0-9]+"),
            x => length(x) > 0).as("_tk")) // materialized once
        .select(
          col("doc_id"),
          concat_ws("\n", array_join(lines, "\n"), element_at(lines, 1))
            .as("text"))
      TextAnalysis.derepeat(lined, "doc_id", "text")
    }),
    "text_chunks" -> ((s, dir) => {
      // context-window chunking: 32-token windows advancing by 24 (8-token
      // overlap) — every doc yields >= 1 chunk, 33+-token docs split
      TextAnalysis.chunk(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8)
    }),
    "text_nb_classify" -> ((s, dir) => {
      // fastText-style quality classifier: multinomial NB over hashed
      // unigram buckets, trained on the doc_id%3==0 slice labeled
      // English-vs-not, scored map-only over the whole corpus with
      // micro-nat-quantized weights (exact across engines)
      Selection.nbClassify(t(s, dir, "documents"), "doc_id", "text",
        isPositive = col("lang") === "en",
        isTrain = col("doc_id") % 3 === 0)
    }),
    "pipeline_curriculum" -> ((s, dir) => {
      // composed curriculum pipeline over this round's operators: quality
      // QUARTILE assignment (exact NTILE form) -> keep the top quartile ->
      // greedy 8k-token budget cut within it -> context-window chunking.
      // Every stage is the standalone operator; the oracle replays each
      // as a CTE.
      val d = t(s, dir, "documents")
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast(LongType))
      val top = d.join(
        Selection.quantileBuckets(d, "doc_id", "n_chars", nBuckets = 4)
          .filter(col("bucket") === 3).select("doc_id"),
        "doc_id")
      val kept = Selection
        .budgetSelect(top, "doc_id", "n_chars", "n_tokens", budgetTokens = 8000L)
        .select("doc_id")
      TextAnalysis.chunk(top.join(kept, "doc_id"), "doc_id", "text",
        chunkSize = 32, overlap = 8)
    }),
    "text_deciles" -> ((s, dir) => {
      // exact global quality-decile assignment (by n_chars): the
      // curriculum/quality-bucket pass, as a distributed prefix COUNT
      Selection.quantileBuckets(t(s, dir, "documents"), "doc_id", "n_chars",
        nBuckets = 10)
    }),
    "corpus_stats" -> ((s, dir) => {
      // per-source corpus composition: docs/tokens/chars + token share
      Profiling.corpusStats(t(s, dir, "documents"), "source", "text")
    }),
    "select_calibration" -> ((s, dir) => {
      // threshold calibration: score deciles x label counts -> per-bucket
      // positive rate and cumulative precision/recall from the TOP bucket
      // down — the table that picks the filter threshold AFTER select_auc
      // says the scorer separates. Score = English-stopword ratio, label
      // = lang'en'; deciles via the exact distributed prefix rank; the
      // cumulative window runs over the 10-row AGGREGATE, not the data.
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val toks = split(trim(col("text")), "\\s+")
      val nStop = size(filter(toks, tok =>
        tok.isin("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")))
      val scored = d.select(
        col("doc_id"),
        (nStop.cast(DoubleType) / size(toks)).as("score"),
        (col("lang") === "en").as("pos"))
      // pos rides THROUGH the bucketer (carry) — no join back on doc_id,
      // no second tokenization pass
      val buckets = Selection.quantileBuckets(scored, "doc_id", "score", 10,
        carry = Seq("pos"))
      val agg = buckets
        .groupBy("bucket")
        .agg(count(lit(1)).as("docs"),
          sum(col("pos").cast("long")).as("pos"))
      val w = Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      agg
        .withColumn("cdocs", sum("docs").over(w))
        .withColumn("cpos", sum("pos").over(w))
        .withColumn("tpos", sum("pos").over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("bucket"), col("docs"), col("pos"),
          (col("pos").cast(DoubleType) / col("docs")).as("pos_rate"),
          (col("cpos").cast(DoubleType) / col("cdocs")).as("cum_precision"),
          (col("cpos").cast(DoubleType) / col("tpos")).as("cum_recall"))
    }),
    "corpus_overlap" -> ((s, dir) => {
      // cross-source duplicate-leakage matrix. The synthesizer's exact
      // duplicates stay within one source, so a mirror source is
      // PLANTED (the doc_id%17 slice re-labeled); the matrix must
      // report exactly that leakage and nothing else.
      val d = t(s, dir, "documents")
      val planted = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(17)) === 0)
          .withColumn("source", lit("mirror")))
      Profiling.sourceOverlap(planted, "source", "text")
    }),
    "profile_drift" -> ((s, dir) => {
      // embedding drift monitor: the vec_id%5 slice is PLANTED as a
      // shifted "new batch" (+0.25 per dim — a retrained embedder); every
      // dimension must flag at the 128-quantum threshold while the means
      // stay integer-exact
      val e = t(s, dir, "embeddings")
      val ref = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
        .select(transform(col("embedding"), _.cast("double")).as("embedding"),
          lit(false).as("is_new"))
      val batch = e.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(transform(col("embedding"), x => x.cast("double") + lit(0.25))
          .as("embedding"), lit(true).as("is_new"))
      Profiling.embeddingDrift(ref.unionByName(batch), "embedding", "is_new")
    }),
    "corpus_source_quality" -> ((s, dir) => {
      // domain-pruning decision table: per-source integer quality
      // evidence + Gopher pass rate + keep/drop verdict in ONE
      // map-side-combined aggregate (rows = source vocabulary)
      TextAnalysis.sourceQuality(t(s, dir, "documents"), "source",
        "doc_id", "text")
    }),
    "select_budget" -> ((s, dir) => {
      // token-budget data selection: highest-score (here: longest) docs
      // win until 15k tokens fill — the greedy cut after importance
      // scoring. Distributed prefix sum; no global window.
      val d = t(s, dir, "documents")
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast(LongType))
      Selection.budgetSelect(d, "doc_id", "n_chars", "n_tokens", budgetTokens = 15000L)
    }),
    "sample_mixture" -> ((s, dir) => {
      // target-mixture sampling: re-weight three sources to a 20/30/50
      // token mixture at a 10% global budget, deterministically by key
      // hash (src2's rate caps at 1.0 — never upsampled)
      Selection.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
        "n_chars", Map("src0" -> 0.2, "src1" -> 0.3, "src2" -> 0.5),
        budget = 0.1)
        .select(col("doc_id"), col("source"),
          col("n_chars").cast(LongType).as("n_chars"))
    }),
    "sample_temperature" -> ((s, dir) => {
      // temperature-scaled mixture at T=0.7: domain weights derived from
      // the corpus (tokens^(1/T)), then the same deterministic 16-bit
      // hash selection as sample_mixture — the LLaMA-style "alpha
      // sampling" of source domains
      Selection.temperatureMixture(t(s, dir, "documents"), "doc_id",
          "source", "n_chars", temperature = 0.7, budget = 0.1)
        .select(col("doc_id"), col("source"),
          col("n_chars").cast(LongType).as("n_chars"))
    }),
    "sample_weighted" -> ((s, dir) => {
      // weight-proportional Poisson sampling: inclusion probability
      // ∝ n_chars (min(1, f·w·N/ΣW)), the same 16-bit md5 threshold as
      // every sampler but computed PER ROW from one broadcast one-row
      // aggregate — a doc twice as heavy is twice as likely to survive
      Sampling.weightedSample(
          t(s, dir, "documents"), "doc_id", "n_chars", fraction = 0.1)
        .select(col("doc_id"), col("source"),
          col("n_chars").cast(LongType).as("n_chars"))
    }),
    "sample_split" -> ((s, dir) => {
      // deterministic train/val/test assignment from the key hash alone
      // — reproducible across runs and engines, new rows never reshuffle
      // old assignments (unlike randomSplit)
      Sampling.splitAssign(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
    }),
    "sample_split_leakfree" -> ((s, dir) => {
      // leakage-free split: LSH near-dup components (same recall-proven
      // params as dedup_resolve, exact-dup pre-collapsed) key every doc
      // on its component REPRESENTATIVE, so a train/test near-duplicate
      // pair is impossible by construction
      val d = t(s, dir, "documents")
      val comps = Dedup.textComponents(d, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      Sampling.splitAssignByComponents(d.select(col("doc_id")), "doc_id",
          comps, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
    }),
    "mix_domain_weights" -> ((s, dir) => {
      // DoReMi-style mixture artifact: observed token share per source vs
      // a uniform target, plus the multiplicative sampling weight that
      // would equalize the mix (feedable straight into sample_mixture).
      // ONE bounded aggregate + a broadcast one-row total — the corpus
      // never shuffles
      Selection.domainWeights(t(s, dir, "documents"), "source",
        text.tokenCount(col("text")))
    }),
    "select_auc" -> ((s, dir) => {
      // exact tie-corrected ROC-AUC of a score against labels — the
      // calibration gate before a classifier filters 100 TB. Numerator
      // accumulated as the integer 2U (order-independent, engine-exact);
      // negBelow via the value-bucketed distributed prefix sum.
      val d = t(s, dir, "documents")
        .withColumn("score", length(col("text")).cast(DoubleType))
      Selection.classifierAuc(d, "score", col("lang") === "en")
    }),
    "sample_stratified_k" -> ((s, dir) => {
      // EXACT-k per-stratum sample (eval-set construction): the 5
      // smallest md5(doc_id) per language — deterministic, two bounded
      // window stages (per-shard top-k, then top-k over shards*k), no
      // whole-stratum single-task window
      Sampling.stratifiedSampleExact(
        t(s, dir, "documents"), "doc_id", "lang", k = 5)
        .select(col("doc_id"), col("lang"))
    }),
    "sample_diverse" -> ((s, dir) => {
      // diversity-balanced sampling: cluster the embedding space (the
      // deterministic integer k-means), then take an EXACT 25 per
      // cluster — topic-balanced eval/seed sets instead of frequency-
      // biased uniform draws; both stages are the standalone operators
      val assigned = Clustering.kmeansAssign(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 4, iters = 1)
      Sampling.stratifiedSampleExact(assigned, "vec_id", "cluster", k = 25)
        .select(col("vec_id"), col("cluster"))
    }),
    "sample_epochs" -> ((s, dir) => {
      // epoch-aware mixture: domains above their natural share UPSAMPLE
      // by repetition (epoch index per copy, capped at 3) — rate floor
      // gives full copies, the hash-selected fraction gets one more
      Selection.mixtureSampleEpochs(t(s, dir, "documents"), "doc_id",
        "source", "n_chars",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
        budget = 0.5, maxEpochs = 3)
        .select(col("doc_id"), col("source"), col("epoch"))
    }),
    "text_fingerprint" -> ((s, dir) => {
      // DuckDB cannot reproduce the wrapping-Long rolling hash, so the
      // oracle is the winnowing decomposition law: the w-byte windows of
      // text = windows(left) ∪ windows(right) when left/right overlap by
      // w-1 chars, hence fp(text) = min(fp(left), fp(right)). Pieces must
      // exceed w bytes (the ≤w case short-circuits to a different hash),
      // guaranteed by the n>=2w+2 guard.
      val w = 32
      val n = length(col("text"))
      val mid = (n / 2).cast(IntegerType)
      val left = substring(col("text"), lit(1), mid)
      val right = col("text").substr(mid - lit(w - 2), n)
      t(s, dir, "documents").select(
        col("doc_id"),
        (n < 2 * w + 2 ||
          text.fingerprint(col("text"), w) === least(
            text.fingerprint(left, w), text.fingerprint(right, w)))
          .as("split_min_ok"))
    }),
    "text_pii" -> ((s, dir) => {
      // PII hygiene: deterministic synthetic emails/phones seeded per doc,
      // then redacted + counted; the oracle replays the same seeding
      val seeded = t(s, dir, "documents").select(
        col("doc_id"),
        concat(col("text"), lit(" contact_"), col("doc_id"),
          lit("@example.com or 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast(StringType), 4, "0")).as("text"))
      TextAnalysis.redactPii(seeded, "doc_id", "text")
    }),
    // ---- Iceberg table layer: write/scan/delete/upsert/time travel ----
    "ice_roundtrip" -> ((s, dir) => {
      val src = t(s, dir, "customer")
      val tbl = freshTable(s, "ice_roundtrip", src)
      tbl.append(s, src)
      tbl.scan(s)
    }),
    "ice_object_storage" -> ((s, dir) => {
      // S3-prefix-spreading layout (write.object-storage.enabled): every
      // file lands under a 20-bit murmur3 hash prefix rendered as binary
      // dirs instead of one shared /data/ prefix — the store-side
      // request-rate fix at 100 TB. Scan-back must be byte-exact, and
      // every planned file must sit under a hash-dir path.
      val src = t(s, dir, "supplier")
      val tbl = freshTable(s, "ice_object_storage", src,
        properties = Map("write.object-storage.enabled" -> "true"))
      tbl.append(s, src)
      val paths = tbl.planFiles(tbl.metadata.currentSnapshot.get)
        .map(_.file.filePath)
      require(paths.nonEmpty && paths.forall(
        _.matches(""".*/data/[01]{4}/[01]{4}/[01]{4}/[01]{8}/.*""")),
        s"object-storage layout expected, got: ${paths.take(2)}")
      tbl.scan(s)
    }),
    "ice_metadata_delete" -> ((s, dir) => {
      // partition-scoped DELETE is pure metadata: the strict evaluator
      // proves every row of the partition's files matches, so files drop
      // from the snapshot unread — no delete files, no data scan
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val tbl = freshTable(s, "ice_metadata_delete", src,
        spec = sch => IcePartitionSpec(0, List(IcePartitionField(
          sch.findField("o_orderstatus").get.id, 1000, "identity", "status_p"))))
      tbl.append(s, src)
      val before = graft.tables.Metrics.get(
        graft.tables.Metrics.MetadataOnlyDeletedFiles)
      tbl.deleteWhere(s, col("o_orderstatus") === "F")
      require(graft.tables.Metrics.get(
        graft.tables.Metrics.MetadataOnlyDeletedFiles) > before,
        "partition delete did not take the metadata-only path")
      require(!tbl.planFiles(tbl.metadata.currentSnapshot.get)
        .exists(_.file.content != DataContent.Data),
        "metadata-only delete must write no delete files")
      tbl.scan(s)
    }),
    "ice_manifest_merge" -> ((s, dir) => {
      // continuous ingest with commit.manifest-merge.enabled: six appends
      // accrete manifests until min-count-to-merge collapses them; the
      // scan must read back the exact union regardless of how manifests
      // were regrouped (statuses, snapshot ids and inherited sequence
      // numbers are preserved through the merge)
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_manifest_merge", src,
        properties = Map(
          "commit.manifest-merge.enabled" -> "true",
          "commit.manifest.min-count-to-merge" -> "4"))
      var cur = tbl
      (0 until 6).foreach { i =>
        cur = cur.append(s, src.filter(pmod(col("o_orderkey"), lit(6)) === i))
      }
      val ms = ManifestIO.readManifestList(
        s.sparkContext.hadoopConfiguration,
        cur.relocate(cur.metadata.currentSnapshot.get.manifestList))
      require(ms.size < 6, s"manifest merge did not trigger (${ms.size} manifests)")
      cur.scan(s)
    }),
    "ice_metrics_mode" -> ((s, dir) => {
      // write.metadata.metrics.* modes drive what the manifests store:
      // `counts` default drops every bound, text keeps 4-code-point
      // truncated bounds (upper rounded UP so pruning stays sound),
      // doc_id keeps full bounds. The query decodes the committed
      // manifest bounds and checks them against the raw data: truncated
      // prefixes are monotonic, so min/max over per-file bounds equal
      // the transform of the global min/max.
      val src = t(s, dir, "documents")
      val tbl = freshTable(s, "ice_metrics_mode", src,
        properties = Map(
          "write.metadata.metrics.default" -> "counts",
          "write.metadata.metrics.column.text" -> "truncate(4)",
          "write.metadata.metrics.column.doc_id" -> "full"))
      val t2 = tbl.append(s, src)
      val schema = t2.metadata.currentSchema
      def idOf(n: String): Int = schema.findField(n).get.id
      val (textId, docId, langId) = (idOf("text"), idOf("doc_id"), idOf("lang"))
      val files = t2.planFiles(t2.metadata.currentSnapshot.get).map(_.file)
      require(files.nonEmpty, "metrics-mode table wrote no files")
      val perFile = files.map { f =>
        def str(m: Map[Int, Array[Byte]]) = m.get(textId).map(new String(_, "UTF-8"))
        def lng(m: Map[Int, Array[Byte]]) = m.get(docId)
          .map(b => SingleValue.decode(IcePrim("long"), b).asInstanceOf[Long])
        val langBounded =
          if (f.lowerBounds.contains(langId) || f.upperBounds.contains(langId)) 1L else 0L
        (str(f.lowerBounds).get, str(f.upperBounds).get,
          lng(f.lowerBounds).get, lng(f.upperBounds).get, langBounded, f.recordCount)
      }
      import s.implicits._
      perFile.toDF("lt", "ut", "dl", "du", "lb", "rc")
        .agg(
          min($"lt").as("lower_text"), max($"ut").as("upper_text"),
          min($"dl").as("doc_lo"), max($"du").as("doc_hi"),
          sum($"lb").as("lang_bound_files"), sum($"rc").as("rows_total"))
    }),
    // Iceberg's other two data-file formats (write.format.default):
    // write + MoR position deletes + scan, end to end per format
    "ice_orc_table" -> ((s, dir) => {
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_orc_table", src)
        .setProperties(Map("write.format.default" -> "orc"))
      tbl.append(s, src)
      val t2 = tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(4)) === 1)
      t2.scan(s)
    }),
    "ice_avro_table" -> ((s, dir) => {
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_avro_table", src)
        .setProperties(Map("write.format.default" -> "avro"))
      tbl.append(s, src)
      val t2 = tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(6)) === 2)
      t2.scan(s)
    }),
    // table statistics: one distributed NDV pass -> puffin statistics
    // file -> `statistics` table metadata; the result reads the ndv blob
    // PROPERTIES back from metadata (what planners consume, zero file IO)
    "ice_row_lineage" -> ((s, dir) => {
      // format-v3 row lineage: two sorted single-file appends take
      // disjoint [first_row_id, +records) slices, so _row_id is exactly
      // the per-append row_number in key order — oracle-checkable
      val src = t(s, dir, "orders").select(col("o_orderkey"))
      val tbl = freshTable(s, "ice_row_lineage", src,
        properties = Map("format-version" -> "3"))
      val even = src.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .repartition(1).sortWithinPartitions("o_orderkey")
      val odd = src.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .repartition(1).sortWithinPartitions("o_orderkey")
      val t2 = tbl.append(s, even).append(s, odd)
      // compaction must PRESERVE ids (materialized lineage columns) —
      // the oracle result is identical before and after the rewrite
      val t3 = t2.rewriteSmallFiles(s, smallFileThresholdBytes = 1L << 30)
      val df = t3.scan(s)
      df.select(col("o_orderkey"), df.metadataColumn("_row_id").as("row_id"))
    }),
    "stats_partitions" -> ((s, dir) => {
      // partition-statistics FILE: per-partition rollups folded from the
      // manifests (no data scan), registered in table metadata and read
      // back as one O(partitions) parquet file
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "stats_partitions", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("o_orderpriority").get.id, 1000,
          "identity", "o_orderpriority"))))
      tbl.append(s, src)
      val t2 = tbl.computePartitionStats(s)
      val pf = t2.metadata.partitionStatistics.last
      s.read.parquet(pf.statisticsPath).select(
        col("partition.o_orderpriority").as("o_orderpriority"),
        col("data_record_count"))
    }),
    "stats_ndv" -> ((s, dir) => {
      import s.implicits._
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "stats_ndv", src)
      tbl.append(s, src)
      // exact mode opted in: the oracle compares precise distinct counts
      // (approximate HLL++ is the library default for scale)
      val t2 = tbl.computeTableStats(s, approximate = false)
      val schema = t2.metadata.currentSchema
      t2.metadata.statistics.last.blobMetadata.map { b =>
        (schema.fieldById(b.fields.head).get.name, b.properties("ndv").toLong)
      }.toDF("column_name", "ndv")
    }),
    "ice_partitioned_scan" -> ((s, dir) => {
      // hidden partitioning by month(l_shipdate); the filtered scan reads
      // only the pruned files (file-level partition+bounds pruning)
      val src = t(s, dir, "lineitem")
      val tbl = freshTable(s, "ice_partitioned_scan", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("l_shipdate").get.id, 1000, "month", "shipmonth"))))
      tbl.append(s, src)
      val flt = col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00"))
      tbl.scan(s, filter = Some(flt))
    }),
    "ice_eq_delete" -> ((s, dir) => {
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_eq_delete", src)
      tbl.append(s, src)
      tbl.equalityDelete(s,
        src.filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        Seq("o_orderkey"))
      tbl.scan(s)
    }),
    "ice_eq_convert" -> ((s, dir) => {
      // equality→position delete conversion: upsert-style eq deletes land,
      // convert_equality_deletes swaps them for exact positional deletes
      // (no eq-delete file survives), and the scan content is unchanged —
      // subsequent scans skip the read-time equality join entirely
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_eq_convert", src)
      tbl.append(s, src)
      tbl.equalityDelete(s,
        src.filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        Seq("o_orderkey"))
      tbl.equalityDelete(s,
        src.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")), Seq("o_orderkey"))
      tbl.convertEqualityDeletes(s)
      val stillEq = tbl.metadata.currentSnapshot.toList
        .flatMap(sn => tbl.planFiles(sn))
        .count(_.file.content == graft.tables.DataContent.EqualityDeletes)
      require(stillEq == 0, s"conversion left $stillEq eq-delete files")
      tbl.scan(s)
    }),
    "ice_pos_delete" -> ((s, dir) => {
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_pos_delete", src)
      tbl.append(s, src)
      val pos = tbl.scan(s, keepFilePos = true)
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("_file").as("file_path"), col("_pos").as("pos"))
      tbl.positionDelete(s, pos)
      tbl.scan(s)
    }),
    "ice_dv_delete" -> ((s, dir) => {
      // deletion vectors (format-v3 semantics): two rounds of row-level
      // deletes land as puffin `deletion-vector-v1` bitmaps — ONE vector
      // per data file, merged on write — instead of parquet delete files
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_dv_delete", src)
      tbl.setProperties(Map(GraftTable.DvEnabledProp -> "true"))
      tbl.append(s, src)
      tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(10)) === 0)
      tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(7)) === 3)
      val dels = tbl.planFiles(tbl.metadata.currentSnapshot.get)
        .filter(_.file.content == DataContent.PositionDeletes)
      require(dels.nonEmpty && dels.forall(_.file.isDeletionVector),
        "expected puffin deletion vectors")
      tbl.scan(s)
    }),
    "ice_dv_rewrite" -> ((s, dir) => {
      // CDC-shaped accumulation of parquet position deletes converts to
      // deletion vectors (rewrite_position_delete_files to_vectors=true):
      // delete entries collapse to one vector per data file, data files
      // untouched, scan content byte-identical
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_dv_rewrite", src)
      tbl.append(s, src)
      (0 until 6).foreach(i =>
        tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(50)) === i))
      val dataBefore = tbl.planFiles(tbl.metadata.currentSnapshot.get)
        .filter(_.file.content == DataContent.Data).map(_.file.filePath).toSet
      tbl.rewritePositionDeleteFiles(s, toVectors = Some(true))
      val after = tbl.planFiles(tbl.metadata.currentSnapshot.get)
      val dels = after.filter(_.file.content == DataContent.PositionDeletes)
      require(dels.nonEmpty && dels.forall(_.file.isDeletionVector),
        "expected conversion to deletion vectors")
      require(dels.map(_.file.referencedDataFile.get).distinct.size == dels.size,
        "expected one vector per data file")
      require(after.filter(_.file.content == DataContent.Data)
        .map(_.file.filePath).toSet == dataBefore, "data files were rewritten")
      tbl.scan(s)
    }),
    "ice_upsert" -> ((s, dir) => {
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_upsert", src)
      tbl.append(s, src)
      val upserts = src
        .filter(pmod(col("o_orderkey"), lit(7)) === 0 && pmod(col("o_orderkey"), lit(13)) =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("_op", lit(1))
      val deletes = src.filter(pmod(col("o_orderkey"), lit(13)) === 0)
        .withColumn("_op", lit(2))
      tbl.upsert(s, upserts.unionByName(deletes), Seq("o_orderkey"), opCol = Some("_op"))
      tbl.scan(s)
    }),
    "ice_zorder" -> ((s, dir) => {
      // Morton-curve rewrite: after zordering on (o_custkey, o_orderdate)
      // file bounds stay tight on BOTH columns (multi-dim data skipping);
      // content is unchanged — the oracle is the plain table
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_zorder", src)
      tbl.append(s, src.sortWithinPartitions(col("o_orderkey")))
      tbl.rewriteZOrder(s, Seq("o_custkey", "o_orderdate"),
        targetFileSizeBytes = 256L * 1024)
      tbl.scan(s)
    }),
    "ice_sort_rewrite" -> ((s, dir) => {
      // global sort rewrite along the declared write order: one range
      // shuffle, file bounds tile o_orderdate across files (the spec
      // asserts tiling; here content preservation is the oracle)
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_sort_rewrite", src)
      tbl.setSortOrder(Seq(("o_orderdate", "asc", "nulls-first")))
      tbl.append(s, src)
      tbl.rewriteSorted(s, targetFileSizeBytes = 256L * 1024)
      tbl.scan(s)
    }),
    "ice_hilbert" -> ((s, dir) => {
      // Hilbert-curve rewrite: same contract as ice_zorder with tighter
      // locality (unit curve steps, no Morton quadrant jumps); content
      // unchanged — the oracle is the plain table
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_hilbert", src)
      tbl.append(s, src.sortWithinPartitions(col("o_orderkey")))
      tbl.rewriteHilbert(s, Seq("o_custkey", "o_orderdate"),
        targetFileSizeBytes = 256L * 1024)
      tbl.scan(s)
    }),
    "ice_wap" -> ((s, dir) => {
      // write-audit-publish: stage on a branch (main untouched), then
      // fast-forward main to publish — both metadata-only pointer moves
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_wap", src)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      tbl.appendToBranch(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 1), "audit")
      tbl.fastForward("main", "audit")
      tbl.scan(s)
    }),
    "ice_changelog" -> ((s, dir) => {
      // batch changelog: inserts + the CONTENT of deleted rows between two
      // snapshots, via _metadata.row_index joins (pos) and raw-row semi
      // joins (eq) — no driver-side row materialization
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_changelog", src)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val snap1 = tbl.metadata.currentSnapshotId.get
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 1))
      tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(10)) === 0)
      tbl.equalityDelete(s,
        src.filter(pmod(col("o_orderkey"), lit(7)) === 3).select(col("o_orderkey")),
        Seq("o_orderkey"))
      tbl.changes(s, snap1)
    }),
    "ice_changelog_net" -> ((s, dir) => {
      // net-change changelog: delete+re-insert of identical content
      // cancels, a keyed delete+insert of changed content collapses into
      // an update_preimage/update_postimage pair
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_changelog_net", src)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val snap1 = tbl.metadata.currentSnapshotId.get
      // in range: insert the odd half
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 1))
      // delete multiples of 10 (even), then re-insert multiples of 20
      // with IDENTICAL content — those must cancel in net mode
      tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(10)) === 0)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(20)) === 0))
      // update class (pre-existing keys, %14==2, not deleted above):
      // delete + re-insert with a changed price -> update pair
      val uCond = pmod(col("o_orderkey"), lit(14)) === 2 &&
        pmod(col("o_orderkey"), lit(10)) =!= 0
      tbl.equalityDelete(s, src.filter(uCond).select(col("o_orderkey")), Seq("o_orderkey"))
      tbl.append(s, src.filter(uCond).withColumn("o_totalprice", col("o_totalprice") + 5.0))
      tbl.changes(s, snap1, net = true, netKeys = Seq("o_orderkey"))
    }),
    "ice_changelog_compact" -> ((s, dir) => {
      // changelog across a mid-range compaction: the rewrite itself emits
      // NOTHING (content-preserving), earlier position deletes resolve
      // against their own snapshot's files (the compaction absorbed the
      // delete files and retired the data paths), and a post-compaction
      // equality delete resolves against the rewritten files
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_changelog_compact", src)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val snap1 = tbl.metadata.currentSnapshotId.get
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 1))
      tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(10)) === 0)
      tbl.rewriteDataFiles(s)
      tbl.equalityDelete(s,
        src.filter(pmod(col("o_orderkey"), lit(7)) === 3).select(col("o_orderkey")),
        Seq("o_orderkey"))
      tbl.changes(s, snap1)
    }),
    "ice_add_files" -> ((s, dir) => {
      // in-place import of foreign parquet (no field ids, never copied):
      // stats harvested from footers, reads resolve columns by name,
      // subsequent graft writes coexist with imported files
      val src = t(s, dir, "supplier")
      val tbl = freshTable(s, "ice_add_files", src.limit(0))
      tbl.addFiles(s, s"$dir/supplier.parquet")
      val planned = tbl.planFiles(tbl.metadata.currentSnapshot.get)
      require(planned.nonEmpty && planned.forall(
        _.file.filePath.contains("supplier.parquet")),
        "imported files must be referenced in place, not copied")
      require(planned.forall(_.file.recordCount > 0), "footer stats missing")
      tbl.scan(s)
    }),
    "ice_pos_delete_compact" -> ((s, dir) => {
      // delete-file compaction: a dozen tiny position-delete commits (the
      // CDC shape) collapse into one delete file per partition WITHOUT
      // rewriting data; scan content must be byte-identical
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_pos_delete_compact", src)
      tbl.append(s, src)
      (0 until 12).foreach(i =>
        tbl.deleteWhere(s, pmod(col("o_orderkey"), lit(97)) === i))
      val dataBefore = tbl.planFiles(tbl.metadata.currentSnapshot.get)
        .filter(_.file.content == DataContent.Data).map(_.file.filePath).toSet
      tbl.rewritePositionDeleteFiles(s)
      val after = tbl.planFiles(tbl.metadata.currentSnapshot.get)
      require(after.count(_.file.content == DataContent.PositionDeletes) <= 2,
        "position-delete files not compacted")
      require(after.filter(_.file.content == DataContent.Data)
        .map(_.file.filePath).toSet == dataBefore, "data files were rewritten")
      tbl.scan(s)
    }),
    "ice_type_widening" -> ((s, dir) => {
      // Iceberg type promotion: int -> long and float -> double mid-table;
      // pre-promotion files serve their values through the widened type
      // (field-id reads + Spark 4's widening parquet promotion)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.twide")
      s.sql("CREATE TABLE graft.db.twide (c_custkey BIGINT, c_nationkey INT, c_acctbal FLOAT)")
      t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .createOrReplaceTempView("twide_src_gq")
      s.sql("""INSERT INTO graft.db.twide
        SELECT c_custkey, c_nationkey, CAST(c_acctbal AS FLOAT)
        FROM twide_src_gq WHERE c_custkey % 2 = 0""")
      s.sql("ALTER TABLE graft.db.twide ALTER COLUMN c_nationkey TYPE BIGINT")
      s.sql("ALTER TABLE graft.db.twide ALTER COLUMN c_acctbal TYPE DOUBLE")
      s.sql("""INSERT INTO graft.db.twide
        SELECT c_custkey, CAST(c_nationkey AS BIGINT), c_acctbal
        FROM twide_src_gq WHERE c_custkey % 2 = 1""")
      s.sql("SELECT * FROM graft.db.twide")
    }),
    "ice_rollback" -> ((s, dir) => {
      // metadata-only rollback: current pointer moves back, no data rewrite
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_rollback", src)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val snap1 = tbl.metadata.currentSnapshotId.get
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) =!= 0))
      tbl.rollbackTo(snap1)
      tbl.scan(s)
    }),
    "ice_spec_evolution" -> ((s, dir) => {
      // partition spec evolution: files of BOTH specs answer one filtered
      // scan; each file's tuple is pruned against its own spec
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_spec_evolution", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("o_orderstatus").get.id, 1000, "identity", "o_orderstatus"))))
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val keyId = tbl.metadata.currentSchema.findField("o_orderkey").get.id
      tbl.updatePartitionSpec(List(
        IcePartitionField(keyId, 0, "bucket[4]", "o_orderkey_bucket")))
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) =!= 0))
      tbl.scan(s, filter = Some(col("o_orderstatus") === "F"))
        .filter(col("o_orderstatus") === "F")
    }),
    "ice_time_travel" -> ((s, dir) => {
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_time_travel", src)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val snap1 = tbl.metadata.currentSnapshotId.get
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) =!= 0))
      tbl.scan(s, snapshotId = Some(snap1))
    }),
    "ice_bucket_partitioned" -> ((s, dir) => {
      // bucket[8] hidden partitioning; key-equality scan prunes to one bucket
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_bucket_partitioned", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("o_orderkey").get.id, 1000, "bucket[8]", "okey_bucket"))))
      tbl.append(s, src)
      tbl.scan(s, filter = Some(pmod(col("o_orderkey"), lit(100)) === 0))
    }),
    "ice_identity_partitioned" -> ((s, dir) => {
      // identity partitioning on a string column (hive-style dirs)
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_identity_partitioned", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("o_orderstatus").get.id, 1000, "identity", "status"))))
      tbl.append(s, src)
      tbl.scan(s, filter = Some(col("o_orderstatus") === "O"))
    }),
    "ice_incremental" -> ((s, dir) => {
      // CDC-style incremental read between snapshots
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_incremental", src)
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      val snap1 = tbl.metadata.currentSnapshotId.get
      tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(2)) =!= 0))
      tbl.scanIncremental(s, fromSnapshotId = snap1)
    }),
    "ice_compact" -> ((s, dir) => {
      // small appends + a MoR delete, then compaction absorbs the delete
      // files and collapses small files; contents must be unchanged
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_compact", src)
      (0 until 3).foreach { i =>
        tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(3)) === i))
      }
      tbl.equalityDelete(s,
        src.filter(col("o_orderstatus") === "P").select(col("o_orderkey")),
        Seq("o_orderkey"))
      tbl.rewriteDataFiles(s)
      tbl.scan(s)
    }),
    "ice_merge_schema" -> ((s, dir) => {
      // append(mergeSchema = true): a wider input evolves the table
      // union-by-name FIRST (new optional column + int->long widening)
      // instead of silently dropping the extra column
      val src = t(s, dir, "nation")
      val tbl = freshTable(s, "ice_merge_schema",
        src.select(col("n_nationkey").cast(IntegerType).as("n_nationkey"),
          col("n_name")))
      tbl.append(s, src.select(
        col("n_nationkey").cast(IntegerType).as("n_nationkey"), col("n_name")))
      tbl.append(s,
        src.select(col("n_nationkey").cast(LongType).as("n_nationkey"),
          col("n_name"), col("n_regionkey").cast(LongType).as("n_regionkey")),
        mergeSchema = true)
      tbl.scan(s).select(
        col("n_nationkey").cast(LongType).as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast(LongType).as("n_regionkey"))
    }),
    "ice_schema_evolution" -> ((s, dir) => {
      // add a column with a fresh field id (old files surface null), then
      // a REQUIRED column with a default (old files surface the default —
      // the reference's initial_default, in_memory.rs:436-453)
      val src = t(s, dir, "nation")
      val tbl = freshTable(s, "ice_schema_evolution", src)
      tbl.append(s, src)
      tbl.addColumn("score", IcePrim("double"))
      tbl.append(s, src.withColumn("score", col("n_nationkey") * 2.0))
      tbl.addColumn("grade", IcePrim("string"), required = true, default = Some("standard"))
      tbl.append(s, src
        .withColumn("score", col("n_nationkey") * 2.0)
        .withColumn("grade", lit("rated")))
      tbl.scan(s)
    }),
    "ice_tag_scan" -> ((s, dir) => {
      val src = t(s, dir, "region")
      val tbl = freshTable(s, "ice_tag_scan", src)
      tbl.append(s, src.filter(col("r_regionkey") < 3))
      tbl.createTag("v1.0", tbl.metadata.currentSnapshotId.get)
      tbl.append(s, src.filter(col("r_regionkey") >= 3))
      tbl.scanRef(s, "v1.0")
    }),
    "ice_sorted_write" -> ((s, dir) => {
      // write.sort-order + rolling max-records-per-file; contents unchanged
      val src = t(s, dir, "orders")
      val loc = s"${System.getProperty("java.io.tmpdir")}/graft-q/ice_sorted_write"
      val tbl = StorageCatalog.createOrReplaceTable(
        s.sparkContext.hadoopConfiguration, loc,
        SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil),
        properties = Map(
          "write.sort-order" -> "o_orderkey",
          "write.max-records-per-file" -> "5000"))
      tbl.append(s, src)
      tbl.scan(s)
    }),
    "ice_time_uuid" -> ((s, dir) => {
      // Iceberg time + uuid end-to-end (SURVEY §1.3 hard point): declared
      // time/uuid schema, bucket[8] hidden partitioning on the uuid,
      // write + scan round-trip over metadata-flagged carrier types
      val h = md5(col("o_orderkey").cast(StringType))
      val src = t(s, dir, "orders").select(
        col("o_orderkey"),
        (pmod(col("o_orderkey"), lit(86400000L)) * lit(1000L)).as("event_time"),
        concat_ws("-",
          substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
          substring(h, 17, 4), substring(h, 21, 12)).as("event_uuid"))
      val schema = IceSchema(0, List(
        IceField(1, "o_orderkey", required = false, IcePrim("long")),
        IceField(2, "event_time", required = false, IcePrim("time")),
        IceField(3, "event_uuid", required = false, IcePrim("uuid"))))
      val loc = s"${System.getProperty("java.io.tmpdir")}/graft-q/ice_time_uuid"
      val tbl = StorageCatalog.createOrReplaceTable(
        s.sparkContext.hadoopConfiguration, loc, schema,
        IcePartitionSpec(0, List(IcePartitionField(3, 1000, "bucket[8]", "uuid_bucket"))))
      tbl.append(s, src)
      // round-trip must preserve the flagged types in a reloaded schema
      val reloaded = StorageCatalog.loadTable(s.sparkContext.hadoopConfiguration, loc)
      require(reloaded.metadata.currentSchema.findField("event_time")
        .exists(_.fieldType == IcePrim("time")), "time type lost in round-trip")
      require(reloaded.metadata.currentSchema.findField("event_uuid")
        .exists(_.fieldType == IcePrim("uuid")), "uuid type lost in round-trip")
      reloaded.scan(s)
    }),
    "sql_mor_delete" -> ((s, dir) => {
      // SQL read of a merge-on-read table goes through the native DSv2
      // MoR scan (one scan node, no V1 bridge) — asserted on the physical
      // plan, verified against the oracle
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mor_orders")
      s.sql(
        """CREATE TABLE graft.db.mor_orders (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_src_mor")
      s.sql("INSERT INTO graft.db.mor_orders SELECT * FROM orders_src_mor")
      val tbl = StorageCatalog.loadTable(
        s.sparkContext.hadoopConfiguration, s"$wh/db/mor_orders")
      tbl.equalityDelete(s,
        t(s, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        Seq("o_orderkey"))
      val out = s.sql("SELECT * FROM graft.db.mor_orders")
      val physical = out.queryExecution.executedPlan.toString
      require(physical.contains("GraftMorScan"), s"expected native MoR scan, got:\n$physical")
      require(!physical.contains("RowDataSourceScan"), "MoR SQL read fell back to the V1 bridge")
      out
    }),
    "sql_overwrite_partition" -> ((s, dir) => {
      // static partition overwrite must replace ONLY the matching
      // partition (the silent full-table replace would lose the rest)
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val tbl = freshTable(s, "sql_overwrite_partition", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("o_orderstatus").get.id, 1000, "identity", "status"))))
      tbl.append(s, src)
      // replace partition o_orderstatus='F' with doubled prices
      tbl.overwriteWhere(s, col("o_orderstatus") === "F",
        src.filter(col("o_orderstatus") === "F")
          .withColumn("o_totalprice", col("o_totalprice") * 2.0))
      tbl.scan(s)
    }),
    "sql_delete_where" -> ((s, dir) => {
      // SQL row-level DELETE: MoR position deletes behind SupportsDelete
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.del_orders")
      s.sql(
        """CREATE TABLE graft.db.del_orders (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_src_del")
      s.sql("INSERT INTO graft.db.del_orders SELECT * FROM orders_src_del")
      s.sql("DELETE FROM graft.db.del_orders WHERE o_orderstatus = 'F' AND o_totalprice < 100000.0")
      s.sql("SELECT * FROM graft.db.del_orders")
    }),
    "sql_spec_evolution" -> ((s, dir) => {
      // partition-spec evolution through SQL DDL (the extension parser's
      // ALTER TABLE ... ADD/DROP PARTITION FIELD): four spec generations,
      // files of every generation answer one filtered scan
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.specevo")
      s.sql(
        """CREATE TABLE graft.db.specevo (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_src_specevo")
      def ins(m: Int): Unit =
        s.sql(s"INSERT INTO graft.db.specevo SELECT * FROM orders_src_specevo WHERE o_orderkey % 4 = $m")
      ins(0) // spec 0: unpartitioned
      s.sql("ALTER TABLE graft.db.specevo ADD PARTITION FIELD o_orderstatus")
      ins(1) // spec 1: identity(status)
      s.sql("ALTER TABLE graft.db.specevo ADD PARTITION FIELD bucket(8, o_orderkey) AS okey_bucket")
      ins(2) // spec 2: status + bucket
      s.sql("ALTER TABLE graft.db.specevo DROP PARTITION FIELD okey_bucket")
      ins(3) // spec 3: status only again
      val tbl = StorageCatalog.loadTable(s.sparkContext.hadoopConfiguration, s"$wh/db/specevo")
      require(tbl.metadata.partitionSpecs.size == 4,
        s"expected 4 partition specs, got ${tbl.metadata.partitionSpecs.size}")
      require(tbl.metadata.defaultSpec.fields.map(_.name) == List("o_orderstatus"),
        s"unexpected final spec: ${tbl.metadata.defaultSpec.fields}")
      s.sql("SELECT * FROM graft.db.specevo WHERE o_orderstatus = 'F'")
    }),
    "sql_wap_branch" -> ((s, dir) => {
      // SQL-only write-audit-publish: spark.wap.branch stages INSERTs on
      // a branch (main untouched), CALL fast_forward publishes
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.wap_orders")
      s.sql(
        """CREATE TABLE graft.db.wap_orders (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_src_wap")
      s.sql("INSERT INTO graft.db.wap_orders SELECT * FROM orders_src_wap WHERE o_orderkey % 2 = 0")
      s.conf.set("spark.wap.branch", "audit")
      try s.sql("INSERT INTO graft.db.wap_orders SELECT * FROM orders_src_wap WHERE o_orderkey % 2 = 1")
      finally s.conf.unset("spark.wap.branch")
      val mainCnt = s.sql("SELECT count(*) FROM graft.db.wap_orders").head.getLong(0)
      val branchCnt = s.sql("SELECT count(*) FROM graft.db.wap_orders VERSION AS OF 'audit'")
        .head.getLong(0)
      require(branchCnt > mainCnt,
        s"staged rows leaked to main or were lost: main=$mainCnt branch=$branchCnt")
      s.sql("CALL graft.system.fast_forward('db.wap_orders', 'main', 'audit')")
      s.sql("SELECT * FROM graft.db.wap_orders")
    }),
    "sql_merge_update" -> ((s, dir) => {
      // row-level SQL DML: UPDATE + MERGE INTO over the delta operation
      // (position deletes + new data files in one MoR snapshot)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.merge_orders")
      s.sql(
        """CREATE TABLE graft.db.merge_orders (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_src_merge")
      s.sql("INSERT INTO graft.db.merge_orders SELECT * FROM orders_src_merge")
      s.sql(
        """UPDATE graft.db.merge_orders SET o_totalprice = o_totalprice * 2.0
          |WHERE o_orderstatus = 'P'""".stripMargin)
      s.sql(
        """MERGE INTO graft.db.merge_orders t
          |USING (SELECT o_orderkey, o_totalprice FROM orders_src_merge
          |       WHERE o_orderkey % 100 = 0) s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice + 1.0
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
          |  VALUES (s.o_orderkey, 'M', s.o_totalprice)""".stripMargin)
      s.sql("SELECT * FROM graft.db.merge_orders")
    }),
    "ice_variant" -> ((s, dir) => {
      // Iceberg v3 VARIANT column end-to-end: the events table's JSON
      // props parse into a semi-structured payload (string + long + int
      // fields), land in a format-version-3 table through SQL INSERT,
      // survive a MoR DELETE, and read back via typed variant_get paths.
      // The physical layout is the Parquet Variant encoding (the spec's
      // unshredded representation) written/read by Spark natively.
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.var_events")
      s.sql(
        """CREATE TABLE graft.db.var_events (event_id BIGINT, payload VARIANT)
          |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
      t(s, dir, "events").createOrReplaceTempView("events_src_var")
      s.sql(
        """INSERT INTO graft.db.var_events
          |SELECT event_id,
          |  parse_json(concat('{"t":"', event_type, '","u":', user_id,
          |                    ',"k":', get_json_object(props, '$.k'), '}'))
          |FROM events_src_var""".stripMargin)
      s.sql("DELETE FROM graft.db.var_events WHERE event_id % 7 = 0")
      s.sql(
        """SELECT event_id,
          |  variant_get(payload, '$.t', 'string') AS etype,
          |  variant_get(payload, '$.u', 'bigint') AS uid,
          |  variant_get(payload, '$.k', 'int') AS k
          |FROM graft.db.var_events""".stripMargin)
    }),
    "ice_timestamp_ns" -> ((s, dir) => {
      // Iceberg v3 nanosecond timestamps end-to-end: events' micros ts
      // lifts to the ns LongType carrier, lands day-partitioned in a
      // format-v3 table (partition tuples derive via exact long floorDiv
      // — double math corrupts any post-1971 nanos value), a
      // 3-days-past-min filter prunes whole day partitions at plan time,
      // and the scan aggregates per day. The oracle replays the nanos
      // arithmetic over raw events.
      val src0 = t(s, dir, "events").select(
        col("event_id"), col("event_type"),
        (unix_micros(col("ts").cast(TimestampType)) * lit(1000L)).as("ts_ns"))
      val ice = IceSchema(0, List(
        IceField(1, "event_id", required = false, IcePrim("long")),
        IceField(2, "event_type", required = false, IcePrim("string")),
        IceField(3, "ts_ns", required = false, IcePrim("timestamp_ns"))))
      val spec = IcePartitionSpec(0, List(IcePartitionField(3, 1000, "day", "ts_day")))
      val loc = s"${System.getProperty("java.io.tmpdir")}/graft-q/ice_ts_ns"
      val tbl = StorageCatalog.createOrReplaceTable(
        s.sparkContext.hadoopConfiguration, loc, ice, spec, formatVersion = 3)
      tbl.append(s, src0)
      val minNs = src0.agg(min(col("ts_ns"))).head.getLong(0)
      val cut = minNs + 3L * 86400000000000L
      tbl.scan(s, filter = Some(col("ts_ns") >= lit(cut)))
        .groupBy(
          transforms.daysNsT(col("ts_ns")).cast(LongType).as("ts_day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("ts_ns")).as("min_ns"),
          max(col("ts_ns")).as("max_ns"))
    }),
    "sql_dml_cow" -> ((s, dir) => {
      // copy-on-write DML modes: DELETE + UPDATE + MERGE rewrite matched
      // FILES and swap them atomically — zero delete files ever exist, so
      // every later scan stays on the vectorized no-deletes path (the
      // read-optimized half of the write-mode pair; merge-on-read above
      // is the write-optimized half)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.cow_orders")
      s.sql(
        """CREATE TABLE graft.db.cow_orders (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
          |PARTITIONED BY (o_orderstatus)
          |TBLPROPERTIES (
          |  'write.delete.mode' = 'copy-on-write',
          |  'write.update.mode' = 'copy-on-write',
          |  'write.merge.mode' = 'copy-on-write')""".stripMargin)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_src_cow")
      s.sql("INSERT INTO graft.db.cow_orders SELECT * FROM orders_src_cow")
      s.sql("DELETE FROM graft.db.cow_orders WHERE o_orderkey % 5 = 0")
      s.sql(
        """UPDATE graft.db.cow_orders SET o_totalprice = o_totalprice * 3.0
          |WHERE o_orderstatus = 'O'""".stripMargin)
      s.sql(
        """MERGE INTO graft.db.cow_orders t
          |USING (SELECT o_orderkey, o_totalprice FROM orders_src_cow
          |       WHERE o_orderkey % 4 = 0) s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice + 1.0
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
          |  VALUES (s.o_orderkey, 'M', s.o_totalprice)""".stripMargin)
      val deleteFiles = s.sql(
        "SELECT count(*) FROM graft.db.cow_orders.files WHERE content <> 0")
        .collect().head.getLong(0)
      require(deleteFiles == 0L,
        s"copy-on-write DML must never produce delete files, found $deleteFiles")
      s.sql("SELECT * FROM graft.db.cow_orders")
    }),
    "ice_agg_pushdown" -> ((s, dir) => {
      // metadata-only aggregation: COUNT/MIN/MAX answered from manifest
      // stats (StatsAggregate) — the plan is a LocalTableScan, zero data
      // files opened; at 100 TB this is a driver-side manifest read
      val src = t(s, dir, "lineitem")
      val tbl = freshTable(s, "ice_agg_pushdown", src)
      tbl.append(s, src)
      tbl.scan(s).agg(
        count(lit(1)).as("cnt"),
        count(col("l_returnflag")).cast(LongType).as("cnt_flag"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
    }),
    "ice_runtime_prune" -> ((s, dir) => {
      // join-driven runtime file pruning (DSv2 dynamic partition pruning):
      // the selective dim side prunes the identity-partitioned fact's
      // files at execution time via SupportsRuntimeV2Filtering
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_runtime_prune", src, schema =>
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("o_orderstatus").get.id, 1000, "identity", "status"))))
      tbl.append(s, src)
      val dim = src.select(col("o_orderstatus").as("status"))
        .distinct().filter(col("status") === "F")
      tbl.scan(s).join(dim, col("o_orderstatus") === col("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("cnt"),
          sum(money(col("o_totalprice"))).cast(DoubleType).as("total"))
    }),
    "ice_spj_join" -> ((s, dir) => {
      // storage-partitioned join: customer and orders both bucket[16] on
      // custkey — with v2 bucketing on, the join zips co-located buckets
      // with NO shuffle on either side (the 100 TB fact-fact join plan)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.spj_cust")
      s.sql("DROP TABLE IF EXISTS graft.db.spj_ord")
      s.sql(
        """CREATE TABLE graft.db.spj_cust (
          |  c_custkey BIGINT, c_mktsegment STRING)
          |PARTITIONED BY (bucket(16, c_custkey))""".stripMargin)
      s.sql(
        """CREATE TABLE graft.db.spj_ord (
          |  o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
          |PARTITIONED BY (bucket(16, o_custkey))""".stripMargin)
      t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        .createOrReplaceTempView("spj_cust_src")
      t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .createOrReplaceTempView("spj_ord_src")
      s.sql("INSERT INTO graft.db.spj_cust SELECT * FROM spj_cust_src")
      s.sql("INSERT INTO graft.db.spj_ord SELECT * FROM spj_ord_src")
      val saved = Seq(
        "spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.autoBroadcastJoinThreshold").map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // materialize under the SPJ confs (localCheckpoint executes now),
        // then restore the session for the queries that follow
        s.sql(
          """SELECT c.c_mktsegment AS seg, count(*) AS cnt,
            |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
            |FROM graft.db.spj_cust c JOIN graft.db.spj_ord o
            |  ON c.c_custkey = o.o_custkey
            |GROUP BY c.c_mktsegment""".stripMargin).localCheckpoint()
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),
    "ice_small_compact" -> ((s, dir) => {
      // selective compaction: only the small-file tail is rewritten; the
      // delete files stay and the contents are byte-identical
      val src = t(s, dir, "orders")
      val tbl = freshTable(s, "ice_small_compact", src)
      tbl.append(s, src)
      (0 until 3).foreach(i =>
        tbl.append(s, src.filter(pmod(col("o_orderkey"), lit(500)) === i)))
      tbl.equalityDelete(s,
        src.filter(col("o_orderstatus") === "P").select(col("o_orderkey")),
        Seq("o_orderkey"))
      tbl.rewriteSmallFiles(s, smallFileThresholdBytes = 64 * 1024)
      tbl.rewriteManifests(s)
      tbl.scan(s)
    }),
    "sql_catalog" -> ((s, dir) => {
      // full SQL path through the DSv2 catalog: DDL + INSERT + SELECT
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.customer")
      s.sql(
        """CREATE TABLE graft.db.customer (
          |  c_custkey BIGINT, c_name STRING, c_nationkey INT,
          |  c_acctbal DOUBLE, c_mktsegment STRING)""".stripMargin)
      t(s, dir, "customer").createOrReplaceTempView("customer_src_gq")
      s.sql("INSERT INTO graft.db.customer SELECT * FROM customer_src_gq")
      s.sql("SELECT * FROM graft.db.customer WHERE c_mktsegment = 'BUILDING'")
    }),
    "sql_functions" -> ((s, dir) => {
      // custom Catalyst expressions through the SQL surface
      GraftExtensions.register(s)
      t(s, dir, "part").createOrReplaceTempView("part_src_gq")
      s.sql(
        """SELECT p_partkey,
          |  iceberg_truncate(10, p_size) AS t_size,
          |  iceberg_truncate(4, p_name) AS t_name
          |FROM part_src_gq""".stripMargin)
    }),
    "rest_catalog" -> ((s, dir) => {
      // REST catalog protocol end to end: in-process server, HTTP CAS commits
      val server = new RestCatalog.Server()
      val uri = server.start()
      try {
        val client = new RestCatalog.Client(uri, s.sparkContext.hadoopConfiguration)
        val src = t(s, dir, "region")
        val schema = SchemaConvert.fromSparkSchema(src.schema)
        val loc = s"${System.getProperty("java.io.tmpdir")}/graft-q/rest_catalog"
        val p = new org.apache.hadoop.fs.Path(loc)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val meta = TableMetadata(
          formatVersion = 2, tableUuid = java.util.UUID.randomUUID().toString,
          location = loc, lastSequenceNumber = 0,
          lastUpdatedMs = System.currentTimeMillis(),
          lastColumnId = schema.maxFieldId, schemas = List(schema),
          currentSchemaId = 0, partitionSpecs = List(IcePartitionSpec(0, Nil)),
          defaultSpecId = 0, lastPartitionId = 999, properties = Map.empty,
          currentSnapshotId = None, snapshots = Nil, snapshotLog = Nil,
          metadataLog = Nil, sortOrders = List(IceSortOrder(0, Nil)),
          defaultSortOrderId = 0, refs = Map.empty)
        client.createTable("db", "region", meta).append(s, src)
        client.loadTable("db", "region").scan(s).localCheckpoint()
      } finally server.stop()
    }),
    "rest_sql_catalog" -> ((s, dir) => {
      // REST-mode SQL catalog: DDL + INSERT + MoR DELETE + SELECT all ride
      // HTTP CAS commits through spark.sql.catalog.<name>.uri
      val server = new RestCatalog.Server()
      val uri = server.start()
      // Spark's CatalogManager caches catalog INSTANCES by name per
      // session (initialize runs once) — a fresh name per invocation
      // keeps the query re-runnable within one session
      val cat = s"grq${System.nanoTime()}"
      try {
        val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/rest_sql_${System.nanoTime()}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
        s.conf.set(s"spark.sql.catalog.$cat.uri", uri)
        s.sql(s"CREATE NAMESPACE $cat.db")
        s.sql(s"CREATE TABLE $cat.db.cust (c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE)")
        t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .createOrReplaceTempView("cust_src_rest")
        s.sql(s"INSERT INTO $cat.db.cust SELECT * FROM cust_src_rest")
        s.sql(s"DELETE FROM $cat.db.cust WHERE c_custkey % 10 = 0")
        s.sql(s"SELECT * FROM $cat.db.cust").localCheckpoint()
      } finally {
        server.stop()
        Seq("", ".warehouse", ".uri").foreach(x => s.conf.unset(s"spark.sql.catalog.$cat$x"))
      }
    }),
    "sql_changelog_view" -> ((s, dir) => {
      // CALL create_changelog_view registers the batch changelog as a
      // temp view in the USER's session (re-bound out of the pinned
      // planning clone); CDC consumers then read it with plain SQL
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.cvq")
      s.sql("CREATE TABLE graft.db.cvq (o_orderkey BIGINT, o_totalprice DOUBLE)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView("cvq_src_gq")
      s.sql("INSERT INTO graft.db.cvq SELECT * FROM cvq_src_gq WHERE o_orderkey % 2 = 0")
      val snap1 = StorageCatalog.loadTable(
        s.sparkContext.hadoopConfiguration, s"$wh/db/cvq")
        .metadata.currentSnapshotId.get
      s.sql("INSERT INTO graft.db.cvq SELECT * FROM cvq_src_gq WHERE o_orderkey % 2 = 1")
      s.sql("DELETE FROM graft.db.cvq WHERE o_orderkey % 10 = 0")
      s.sql(
        s"""CALL graft.system.create_changelog_view(table => 'db.cvq',
           |  changelog_view => 'cvq_changes', start_snapshot_id => ${snap1}L)""".stripMargin)
      s.sql("SELECT _change_type, count(*) AS n FROM cvq_changes GROUP BY 1")
    }),
    "ice_incremental_sql" -> ((s, dir) => {
      // incremental append scan through DSv2 read options: rows committed
      // after start-snapshot-id only (the CDC-style batch increment)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.inc_orders")
      s.sql("CREATE TABLE graft.db.inc_orders (o_orderkey BIGINT, o_totalprice DOUBLE)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView("inc_src_gq")
      s.sql("INSERT INTO graft.db.inc_orders SELECT * FROM inc_src_gq WHERE o_orderkey % 2 = 0")
      val snap1 = StorageCatalog.loadTable(
        s.sparkContext.hadoopConfiguration, s"$wh/db/inc_orders")
        .metadata.currentSnapshotId.get
      s.sql("INSERT INTO graft.db.inc_orders SELECT * FROM inc_src_gq WHERE o_orderkey % 2 = 1")
      s.read.option("start-snapshot-id", snap1).table("graft.db.inc_orders")
    }),
    // ---- metadata ("inspection") tables: db.t.snapshots / files / ... ----
    "meta_snapshots" -> ((s, dir) => {
      // commit log as a queryable table: operations, sequence numbers and
      // deterministic summary counters across append/append/delete
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.msnap")
      s.sql("CREATE TABLE graft.db.msnap (o_orderkey BIGINT, o_orderstatus STRING)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView("msnap_src_gq")
      s.sql("INSERT INTO graft.db.msnap SELECT * FROM msnap_src_gq WHERE o_orderstatus = 'O'")
      s.sql("INSERT INTO graft.db.msnap SELECT * FROM msnap_src_gq WHERE o_orderstatus <> 'O'")
      s.sql("DELETE FROM graft.db.msnap WHERE o_orderstatus = 'F'")
      s.sql(
        """SELECT operation, sequence_number,
          |  CAST(summary['total-records'] AS BIGINT) AS total_records
          |FROM graft.db.msnap.snapshots""".stripMargin)
    }),
    "meta_files" -> ((s, dir) => {
      // live-file inventory with per-file stats, distributed one input
      // partition per manifest; rolled up per partition tuple here
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mfiles")
      s.sql(
        """CREATE TABLE graft.db.mfiles (l_orderkey BIGINT, l_returnflag STRING)
          |PARTITIONED BY (l_returnflag)""".stripMargin)
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"))
        .createOrReplaceTempView("mfiles_src_gq")
      s.sql("INSERT INTO graft.db.mfiles SELECT * FROM mfiles_src_gq")
      s.sql(
        """SELECT partition.l_returnflag AS l_returnflag, content, file_format,
          |  SUM(record_count) AS record_count
          |FROM graft.db.mfiles.files GROUP BY 1, 2, 3""".stripMargin)
    }),
    "meta_split_files" -> ((s, dir) => {
      // data_files / delete_files split views: a MoR table with an
      // equality delete shows its data rows ONLY in data_files and the
      // delete artifact ONLY in delete_files (manifest-level pruning —
      // the unwanted manifest never opens)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.msplit")
      s.sql("CREATE TABLE graft.db.msplit (o_orderkey BIGINT, o_orderstatus STRING)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView("msplit_src_gq")
      s.sql("INSERT INTO graft.db.msplit SELECT * FROM msplit_src_gq")
      s.sql("DELETE FROM graft.db.msplit WHERE o_orderkey % 10 = 0")
      s.sql(
        """SELECT 'data' AS side, SUM(record_count) AS records
          |FROM graft.db.msplit.data_files
          |UNION ALL
          |SELECT 'delete' AS side, SUM(record_count) AS records
          |FROM graft.db.msplit.delete_files""".stripMargin)
    }),
    "meta_readable_metrics" -> ((s, dir) => {
      // readable_metrics: per-file stats decoded into each column's own
      // type — global min/max/counts recomputed FROM THE FILES VIEW must
      // equal a recomputation over the source rows (the extended-stats
      // pass supplies NaN counts; parquet footers supply the rest)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mread")
      s.sql(
        """CREATE TABLE graft.db.mread (
          |  o_orderkey BIGINT, o_totalprice DOUBLE, nanv DOUBLE, o_orderstatus STRING)
          |TBLPROPERTIES ('write.stats.extended' = 'true')""".stripMargin)
      t(s, dir, "orders").createOrReplaceTempView("mread_src_gq")
      s.sql(
        """INSERT INTO graft.db.mread
          |SELECT o_orderkey, o_totalprice,
          |  CASE WHEN o_orderkey % 11 = 0 THEN CAST('NaN' AS DOUBLE)
          |       ELSE CAST(o_custkey AS DOUBLE) END,
          |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END
          |FROM mread_src_gq""".stripMargin)
      s.sql(
        """SELECT
          |  SUM(readable_metrics.o_orderkey.value_count) AS n_values,
          |  SUM(readable_metrics.o_orderstatus.null_value_count) AS null_status,
          |  SUM(readable_metrics.nanv.nan_value_count) AS nan_vals,
          |  MIN(readable_metrics.o_orderkey.lower_bound) AS min_key,
          |  MAX(readable_metrics.o_orderkey.upper_bound) AS max_key,
          |  MIN(readable_metrics.o_totalprice.lower_bound) AS min_price,
          |  MAX(readable_metrics.o_totalprice.upper_bound) AS max_price
          |FROM graft.db.mread.files""".stripMargin)
    }),
    "meta_position_deletes" -> ((s, dir) => {
      // row-level position_deletes view: parquet delete files and
      // deletion-vector blobs both surface their (file,pos) rows, one
      // task per delete artifact — counts must match the deleted keys
      val src = t(s, dir, "orders")
      def build(dv: Boolean): Long = {
        val tbl = freshTable(s, s"meta_posdel_${if (dv) "dv" else "pq"}", src,
          properties =
            if (dv) Map(graft.tables.GraftTable.DvEnabledProp -> "true")
            else Map.empty)
        tbl.append(s, src)
        val pos = tbl.scan(s, keepFilePos = true)
          .filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("_file").as("file_path"), col("_pos").as("pos"))
        tbl.positionDelete(s, pos)
        org.apache.spark.sql.GraftBridge.v2ScanDataFrame(
          s, new graft.spark.GraftMetadataTable(tbl, "position_deletes"), Map.empty)
          .count()
      }
      val (nPq, nDv) = (build(dv = false), build(dv = true))
      import s.implicits._
      Seq((nPq, nDv)).toDF("n_parquet_deletes", "n_dv_deletes")
    }),
    "meta_all_files" -> ((s, dir) => {
      // all_files = file inventory across EVERY valid snapshot (the GC /
      // audit view): an overwrite's retired files stay visible with their
      // rows until expiry, so record_count sums pre- and post-overwrite
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mall")
      s.sql("CREATE TABLE graft.db.mall (o_orderkey BIGINT, o_orderstatus STRING)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView("mall_src_gq")
      s.sql("INSERT INTO graft.db.mall SELECT * FROM mall_src_gq WHERE o_orderkey % 2 = 0")
      s.sql("INSERT OVERWRITE graft.db.mall SELECT * FROM mall_src_gq")
      s.sql(
        """SELECT content, CAST(SUM(record_count) AS BIGINT) AS record_count
          |FROM graft.db.mall.all_files GROUP BY content""".stripMargin)
    }),
    "sql_branch_ident" -> ((s, dir) => {
      // the Iceberg ref-scoped identifier surface: INSERT INTO
      // db.t.branch_x commits to the branch (main untouched), SELECT
      // FROM db.t.branch_x reads its head
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.brident")
      s.sql(
        """CREATE TABLE graft.db.brident
          |(o_orderkey BIGINT, o_totalprice DOUBLE)""".stripMargin)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView("brident_src_gq")
      s.sql("INSERT INTO graft.db.brident SELECT * FROM brident_src_gq")
      s.sql("ALTER TABLE graft.db.brident CREATE BRANCH audit")
      s.sql(
        """INSERT INTO graft.db.brident.branch_audit
          |SELECT * FROM brident_src_gq WHERE o_orderkey % 7 = 0""".stripMargin)
      val mainCnt = s.sql("SELECT count(*) FROM graft.db.brident")
        .collect()(0).getLong(0)
      val srcCnt = s.table("brident_src_gq").count()
      require(mainCnt == srcCnt, s"branch write leaked to main: $mainCnt")
      s.sql("SELECT * FROM graft.db.brident.branch_audit")
    }),
    "meta_compaction_plan" -> ((s, dir) => {
      // maintenance planning: which partitions hold small files worth a
      // rewrite — the report a 100 TB table's compaction scheduler runs
      // INSTEAD of blindly compacting everything. The rolling writer cuts
      // at exactly 4096 records, so per-partition file counts (and the
      // single short tail file) are deterministic.
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mcplan")
      s.sql(
        """CREATE TABLE graft.db.mcplan (l_orderkey BIGINT, l_returnflag STRING)
          |PARTITIONED BY (l_returnflag)
          |TBLPROPERTIES ('write.max-records-per-file'='4096')""".stripMargin)
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"))
        .createOrReplaceTempView("mcplan_src_gq")
      s.sql("INSERT INTO graft.db.mcplan SELECT * FROM mcplan_src_gq")
      s.sql(
        """SELECT partition.l_returnflag AS l_returnflag,
          |  CAST(count(*) AS BIGINT) AS n_files,
          |  CAST(sum(record_count) AS BIGINT) AS records,
          |  CAST(sum(CASE WHEN record_count < 4096 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_small,
          |  count(*) > 1 AND
          |    sum(CASE WHEN record_count < 4096 THEN 1 ELSE 0 END) >= 1
          |    AS needs_compaction
          |FROM graft.db.mcplan.files GROUP BY 1""".stripMargin)
    }),
    "meta_partitions" -> ((s, dir) => {
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mparts")
      s.sql(
        """CREATE TABLE graft.db.mparts (l_orderkey BIGINT, l_returnflag STRING)
          |PARTITIONED BY (l_returnflag)""".stripMargin)
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"))
        .createOrReplaceTempView("mparts_src_gq")
      s.sql("INSERT INTO graft.db.mparts SELECT * FROM mparts_src_gq")
      s.sql(
        """SELECT partition.l_returnflag AS l_returnflag, record_count
          |FROM graft.db.mparts.partitions""".stripMargin)
    }),
    "meta_refs" -> ((s, dir) => {
      // branches/tags (SURVEY §2.7 refs) through the SQL inspection view
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mrefs")
      s.sql("CREATE TABLE graft.db.mrefs (n_nationkey BIGINT, n_name STRING)")
      t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .createOrReplaceTempView("mrefs_src_gq")
      s.sql("INSERT INTO graft.db.mrefs SELECT * FROM mrefs_src_gq")
      val tbl = StorageCatalog.loadTable(
        s.sparkContext.hadoopConfiguration, s"$wh/db/mrefs")
      val head = tbl.metadata.currentSnapshotId.get
      tbl.createTag("v1", head).createBranch("dev", head)
      s.sql("SELECT name, type FROM graft.db.mrefs.refs")
    }),
    "sql_ctas" -> ((s, dir) => {
      // atomic CTAS + RTAS (StagingTableCatalog): one metadata commit
      // publishes the staged write; REPLACE swaps contents atomically
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mctas")
      t(s, dir, "orders").createOrReplaceTempView("mctas_src_gq")
      s.sql(
        """CREATE TABLE graft.db.mctas AS
          |SELECT o_orderkey, o_orderstatus FROM mctas_src_gq WHERE o_orderkey % 2 = 0""".stripMargin)
      s.sql(
        """REPLACE TABLE graft.db.mctas AS
          |SELECT o_orderkey, o_orderstatus FROM mctas_src_gq WHERE o_orderkey % 2 = 1""".stripMargin)
      s.sql("SELECT * FROM graft.db.mctas")
    }),
    "sql_views" -> ((s, dir) => {
      // persisted SQL views (V2 ViewCatalog + extension DDL rules): the
      // definition lives in the warehouse and re-resolves per query, so
      // it tracks base-table changes
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mview_t")
      s.sql("CREATE TABLE graft.db.mview_t (o_orderkey BIGINT, o_orderstatus STRING)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView("mview_src_gq")
      s.sql("INSERT INTO graft.db.mview_t SELECT * FROM mview_src_gq WHERE o_orderkey % 2 = 0")
      s.sql(
        """CREATE OR REPLACE VIEW graft.db.mview AS
          |SELECT o_orderstatus, COUNT(*) AS n
          |FROM graft.db.mview_t GROUP BY o_orderstatus""".stripMargin)
      // second insert AFTER view creation: the view must see it
      s.sql("INSERT INTO graft.db.mview_t SELECT * FROM mview_src_gq WHERE o_orderkey % 2 = 1")
      s.sql("SELECT * FROM graft.db.mview")
    }),
    "sql_procedures" -> ((s, dir) => {
      // full maintenance cycle driven from SQL (CALL graft.system.*):
      // small appends → compaction → snapshot expiry → orphan GC, then
      // prove the data survived it all byte-for-byte
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mproc")
      s.sql("CREATE TABLE graft.db.mproc (o_orderkey BIGINT, o_orderstatus STRING)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView("mproc_src_gq")
      s.sql("INSERT INTO graft.db.mproc SELECT * FROM mproc_src_gq WHERE o_orderkey % 3 = 0")
      s.sql("INSERT INTO graft.db.mproc SELECT * FROM mproc_src_gq WHERE o_orderkey % 3 = 1")
      s.sql("INSERT INTO graft.db.mproc SELECT * FROM mproc_src_gq WHERE o_orderkey % 3 = 2")
      s.sql("CALL graft.system.rewrite_data_files('db.mproc', 1073741824L)")
      s.sql(s"CALL graft.system.expire_snapshots('db.mproc', ${Long.MaxValue}L)")
      s.sql(s"CALL graft.system.remove_orphan_files('db.mproc', ${Long.MaxValue}L)")
      s.sql("SELECT * FROM graft.db.mproc")
    }),
    "sql_snapshot_table" -> ((s, dir) => {
      // zero-copy table fork (Iceberg's snapshot procedure): fork a MoR
      // table without copying a byte, then DELETE on the fork — carried
      // files keep their original sequence numbers (the fork inherits the
      // source's lastSequenceNumber), so the fork's delete out-sequences
      // them while the source never sees it
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.snap_src")
      s.sql("DROP TABLE IF EXISTS graft.db.snap_fork")
      s.sql("CREATE TABLE graft.db.snap_src (o_orderkey BIGINT, o_orderstatus STRING)")
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .createOrReplaceTempView("snap_src_gq")
      s.sql("INSERT INTO graft.db.snap_src SELECT * FROM snap_src_gq")
      s.sql("DELETE FROM graft.db.snap_src WHERE o_orderkey % 7 = 0")
      s.sql("CALL graft.system.snapshot('db.snap_src', 'db.snap_fork')")
      s.sql("DELETE FROM graft.db.snap_fork WHERE o_orderkey % 2 = 0")
      // both sides tagged: the fork sees the carried MoR state plus its
      // own delete; the source must NOT see the fork's delete
      s.sql(
        """SELECT 'src' AS side, o_orderkey, o_orderstatus FROM graft.db.snap_src
          |UNION ALL
          |SELECT 'fork' AS side, o_orderkey, o_orderstatus FROM graft.db.snap_fork""".stripMargin)
    }),
    "rest_register_table" -> ((s, dir) => {
      // register_table over the REST catalog: a table built in the PATH
      // warehouse is attached under a REST identifier by pointing the
      // server at its current metadata file — zero copy, MoR state intact
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.reg_src")
      s.sql("CREATE TABLE graft.db.reg_src (n_nationkey BIGINT, n_name STRING)")
      t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .createOrReplaceTempView("reg_src_gq")
      s.sql("INSERT INTO graft.db.reg_src SELECT * FROM reg_src_gq")
      s.sql("DELETE FROM graft.db.reg_src WHERE n_nationkey % 5 = 0")
      val metaDir = new java.io.File(s"$wh/db/reg_src/metadata")
      val latest = metaDir.listFiles().map(_.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
        .maxBy(n => n.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      val server = new RestCatalog.Server()
      val uri = server.start()
      val cat = s"grg${System.nanoTime()}"
      try {
        s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          s"${System.getProperty("java.io.tmpdir")}/graft-q/rest_reg_wh")
        s.conf.set(s"spark.sql.catalog.$cat.uri", uri)
        s.sql(s"CREATE NAMESPACE $cat.db")
        s.sql(s"CALL $cat.system.register_table('db.reg', '$metaDir/$latest')")
        s.sql(s"SELECT n_nationkey, n_name FROM $cat.db.reg").localCheckpoint()
      } finally server.stop()
    }),
    "meta_history" -> ((s, dir) => {
      // snapshot-log lineage (history view): a rolled-back commit stays in
      // the log but stops being a current ancestor — 2 inserts, rollback,
      // 1 more insert = 4 log entries of which 3 are ancestors of HEAD
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mhist")
      s.sql("CREATE TABLE graft.db.mhist (n_nationkey BIGINT, n_name STRING)")
      t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .createOrReplaceTempView("mhist_src_gq")
      s.sql("INSERT INTO graft.db.mhist SELECT * FROM mhist_src_gq")
      val tbl = StorageCatalog.loadTable(
        s.sparkContext.hadoopConfiguration, s"$wh/db/mhist")
      val snapA = tbl.metadata.currentSnapshotId.get
      s.sql("INSERT INTO graft.db.mhist SELECT * FROM mhist_src_gq")
      StorageCatalog.loadTable(s.sparkContext.hadoopConfiguration, s"$wh/db/mhist")
        .rollbackTo(snapA)
      s.sql("INSERT INTO graft.db.mhist SELECT * FROM mhist_src_gq")
      s.sql(
        """SELECT is_current_ancestor, COUNT(*) AS n
          |FROM graft.db.mhist.history GROUP BY is_current_ancestor""".stripMargin)
    }),
    "meta_entries" -> ((s, dir) => {
      // manifest-entry forensics: every entry with status/content, delete
      // files included; file counts vary with write parallelism so the
      // deterministic projection is summed record counts per class
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.ment")
      s.sql("CREATE TABLE graft.db.ment (n_nationkey BIGINT, n_name STRING)")
      t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .createOrReplaceTempView("ment_src_gq")
      s.sql("INSERT INTO graft.db.ment SELECT * FROM ment_src_gq")
      s.sql("DELETE FROM graft.db.ment WHERE n_nationkey = 0")
      s.sql(
        """SELECT status, content, CAST(SUM(record_count) AS BIGINT) AS n_rows
          |FROM graft.db.ment.entries GROUP BY status, content""".stripMargin)
    }),
    "meta_metadata_log" -> ((s, dir) => {
      // metadata-log inspection: 3 commits (create + 2 inserts) leave 3
      // past metadata files plus exactly one current pointer
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mlog")
      s.sql("CREATE TABLE graft.db.mlog (r_regionkey BIGINT, r_name STRING)")
      t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
        .createOrReplaceTempView("mlog_src_gq")
      s.sql("INSERT INTO graft.db.mlog SELECT * FROM mlog_src_gq")
      s.sql("INSERT INTO graft.db.mlog SELECT * FROM mlog_src_gq")
      s.sql(
        """SELECT is_current, COUNT(*) AS n
          |FROM graft.db.mlog.metadata_log_entries GROUP BY is_current""".stripMargin)
    }),
    "meta_manifests" -> ((s, dir) => {
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-q/warehouse"
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      s.sql("DROP TABLE IF EXISTS graft.db.mman")
      s.sql("CREATE TABLE graft.db.mman (r_regionkey BIGINT, r_name STRING)")
      t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
        .createOrReplaceTempView("mman_src_gq")
      s.sql("INSERT INTO graft.db.mman SELECT * FROM mman_src_gq")
      s.sql("INSERT INTO graft.db.mman SELECT * FROM mman_src_gq")
      s.sql(
        """SELECT content, CAST(SUM(added_rows_count) AS BIGINT) AS added_rows,
          |  CAST(COUNT(*) AS INT) AS manifest_count
          |FROM graft.db.mman.manifests GROUP BY content""".stripMargin)
    }),
    // ---- structured streaming ----
    "stream_events_hourly" -> ((s, dir) => {
      // real streaming query over the events parquet (memory sink, complete
      // mode); result must equal the batch hourly aggregate
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val name = s"stream_hourly_${System.nanoTime()}"
      val stream = normEventsTs(streamTable(s, dir, "events", sch))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      s.table(name)
    }),
    "stream_cdc_upsert" -> ((s, dir) => {
      // CDC micro-batches via foreachBatch into the Iceberg table:
      // per-batch dedup to latest-per-key, then keyed upsert — the
      // Spark-native shape of the reference's EqualityDeltaWriter stack
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val latestCols = Seq("user_id", "event_id", "event_type", "value", "ts")
      val seed = t(s, dir, "events").select(latestCols.map(col): _*).limit(0)
      val tbl = freshTable(s, "stream_cdc_upsert", seed)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val q = streamTable(s, dir, "events", sch)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = normEventsTs(batch)
            .select(latestCols.map(col): _*)
            .withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1)
            .drop("_rn")
          tbl.upsert(batch.sparkSession, b, Seq("user_id"))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      tbl.scan(s)
    }),
    "stream_sink_append" -> ((s, dir) => {
      // writeStream straight into the table ("graft-stream" sink): one
      // snapshot per micro-batch, batch id stamped for replay idempotence
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val cols = Seq("event_id", "user_id", "event_type", "value")
      val seed = t(s, dir, "events").select(cols.map(col): _*).limit(0)
      val tbl = freshTable(s, "stream_sink_append", seed)
      val q = streamTable(s, dir, "events", sch)
        .select(cols.map(col): _*)
        .writeStream.format("graft-stream")
        .option("location", tbl.location)
        .option("checkpointLocation", s"${tbl.location}/_chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      StorageCatalog.loadTable(s.sparkContext.hadoopConfiguration, tbl.location).scan(s)
    }),
    "stream_quality_gate" -> ((s, dir) => {
      // the pipeline's quality gate RUNS IN STRUCTURED STREAMING
      // unchanged (the Gopher rules are map-only column expressions):
      // documents stream through the gate, only passers commit to the
      // graft table, exactly-once per micro-batch. Setup/drain split
      // lives in [[streamParts]].
      streamParts("stream_quality_gate")(s, dir)()
    }),
    "stream_branch" -> ((s, dir) => {
      // streaming write-audit-publish: micro-batches stage on a branch
      // (main stays empty), then fastForward publishes — the read after
      // publish must equal the whole feed
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val cols = Seq("event_id", "user_id", "event_type", "value")
      val seed = t(s, dir, "events").select(cols.map(col): _*).limit(0)
      val tbl = freshTable(s, "stream_branch", seed)
      val q = streamTable(s, dir, "events", sch)
        .select(cols.map(col): _*)
        .writeStream.format("graft-stream")
        .option("location", tbl.location)
        .option("branch", "audit")
        .option("checkpointLocation", s"${tbl.location}/_chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val staged = StorageCatalog.loadTable(s.sparkContext.hadoopConfiguration, tbl.location)
      require(staged.scan(s).count() == 0L, "main must stay empty until publish")
      staged.fastForward("main", "audit")
      staged.scan(s)
    }),
    "stream_watermark_windows" -> ((s, dir) => {
      // event-time watermark + tumbling window in APPEND mode over the
      // graft streaming source, rate-limited to one snapshot per
      // micro-batch: only watermark-closed windows are emitted
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val split = ev
        .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")).head.getLong(0)
      val tbl = freshTable(s, "stream_wm", ev.limit(0))
      tbl.append(s, ev.filter(unix_micros(col("ts")) <= split))
      tbl.append(s, ev.filter(unix_micros(col("ts")) > split))
      val name = s"stream_wm_${System.nanoTime()}"
      val q = s.readStream.format("graft-stream")
        .option("location", tbl.location)
        .option("max-seqs-per-trigger", "1")
        .load()
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      s.table(name)
    }),
    "stream_dedup" -> ((s, dir) => {
      // streaming deduplication with dropDuplicatesWithinWatermark: the
      // same rows are committed TWICE (two snapshots = two micro-batches,
      // rate-limited to one commit each), so the second batch is an exact
      // replay; keyed dedup state drops it. The watermark delay is set
      // far past the data's time span so no dedup state expires mid-run —
      // the output is exactly the distinct event set, proved by the
      // batch aggregate over the sink (counts only: deterministic
      // regardless of which arrival survived). Setup/drain split lives
      // in [[streamParts]].
      streamParts("stream_dedup")(s, dir)()
    }),
    "stream_changelog" -> ((s, dir) => {
      // streaming CDC source (mode=changelog): each micro-batch carries
      // its snapshot range's changelog — inserts AND full-content deletes
      // — rate-limited to one commit per batch; the memory sink collects
      // the whole feed
      val src = t(s, dir, "orders")
      val even = src.filter(col("o_orderkey") % 2 === 0)
      val odd = src.filter(col("o_orderkey") % 2 === 1)
      val tbl = freshTable(s, "stream_changelog", src)
      tbl.append(s, even)
      tbl.equalityDelete(s,
        even.filter(col("o_orderstatus") === "P").select(col("o_orderkey")),
        Seq("o_orderkey"))
      tbl.append(s, odd)
      val name = s"stream_cdc_${System.nanoTime()}"
      val q = s.readStream.format("graft-stream")
        .option("location", tbl.location)
        .option("mode", "changelog")
        .option("max-seqs-per-trigger", "1")
        .load()
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      s.table(name)
    }),
    "stream_stream_join" -> ((s, dir) => {
      // stream-stream inner join with event-time range bounds: clicks
      // joined to same-user purchases within 30 minutes, both sides
      // watermarked (the range condition is what lets Spark expire join
      // state — unbounded state is the classic stream-join failure at
      // scale)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val split = ev
        .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")).head.getLong(0)
      val tbl = freshTable(s, "stream_ssj", ev.limit(0))
      tbl.append(s, ev.filter(unix_micros(col("ts")) <= split))
      tbl.append(s, ev.filter(unix_micros(col("ts")) > split))
      def src = s.readStream.format("graft-stream")
        .option("location", tbl.location)
        .option("max-seqs-per-trigger", "1")
        .load()
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("interval 30 minutes"))
        .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"))
      val name = s"stream_ssj_${System.nanoTime()}"
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      q.processAllAvailable()
      q.stop()
      s.table(name)
    }),
    "stream_sessions_state" -> ((s, dir) => {
      // custom streaming state: flatMapGroupsWithState sessionization —
      // per-user open sessions live in the state store, closed sessions
      // stream out as soon as a later event proves the gap
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = s.read.parquet(s"$dir/events.parquet").schema
      val name = s"stream_sess_${System.nanoTime()}"
      val src = normEventsTs(streamTable(s, dir, "events", sch))
        .withColumn("ts_us", unix_micros(col("ts")))
      val q = graft.streaming.StatefulSessions.sessions(src, 1800L * 1000000L)
        .select(col("user_id"), col("session_idx"), col("n_events"),
          timestamp_micros(col("session_start_us")).as("session_start"),
          timestamp_micros(col("session_end_us")).as("session_end"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      s.table(name)
    }),
    "mm_resize" -> ((s, dir) => {
      // REAL bilinear resize, then REAL re-decode of the resized bytes:
      // the decoded dims must equal the target, originals the id formula
      implicit val sp: SparkSession = s
      val resized = Multimodal.resizeImages(
        Multimodal.syntheticImages(t(s, dir, "documents"), "doc_id"), 16, 12)
      Multimodal.decodeMetadata(
          resized.select(col("asset_id"), col("payload"), col("media_type")))
        .join(resized.select(col("asset_id"),
          col("orig_width").cast(LongType).as("orig_width"),
          col("orig_height").cast(LongType).as("orig_height")), "asset_id")
        .select(col("asset_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("orig_width"), col("orig_height"))
    }),
    // ---- multimodal: REAL image encode+decode via javax.imageio ----
    "mm_metadata" -> ((s, dir) => {
      // encode one deterministic PNG per doc, then DECODE it back with the
      // real imageio reader; the oracle predicts the decoded dimensions
      // from the id formulas without ever seeing the bytes
      implicit val sp: SparkSession = s
      Multimodal.decodeMetadata(
        Multimodal.syntheticImages(t(s, dir, "documents"), "doc_id"))
        .select(col("asset_id"), col("media_type"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_frames").cast(LongType).as("n_frames"))
    }),
    "mm_audio" -> ((s, dir) => {
      // encode one deterministic PCM16 WAV per doc, decode it back with
      // the real javax.sound codec; the oracle predicts rate/channels/
      // frames/duration from the id formulas without seeing the bytes
      implicit val sp: SparkSession = s
      Multimodal.decodeAudioMeta(
        Multimodal.syntheticAudio(t(s, dir, "documents"), "doc_id"))
        .select(col("asset_id"),
          col("sample_rate").cast(LongType).as("sample_rate"),
          col("channels").cast(LongType).as("channels"),
          col("n_samples"), col("duration_ms"))
    }),
    "mm_dhash" -> ((s, dir) => {
      // perceptual image hash (dHash) over REAL decoded PNGs: 18x16
      // textured images (gray = (id*7 + 3x² + 5y² + xy) % 256)
      // area-average to 9x8 in exact 2x2 integer block means, so every
      // bit of the hash is oracle-predictable; bits emit as a '01'
      // string (no BIGINT sign traps in either engine)
      implicit val sp: SparkSession = s
      Multimodal.dHash(
        Multimodal.syntheticGradientImages(t(s, dir, "documents"), "doc_id",
          w = 18, h = 16))
        .select(col("asset_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("dhash_bits"))
    }),
    "dedup_prefix" -> ((s, dir) => {
      // truncated-re-crawl detection: the doc_id%11 slice is PLANTED as
      // half-length truncations (jaccard ~0.5 — MinHash-invisible); the
      // operator must report exactly the planted prefix pairs plus any
      // natural ones, bucket-capped like every pair generator
      val d = t(s, dir, "documents")
      val planted = d.select(col("doc_id"), col("text")).unionByName(
        d.filter(pmod(col("doc_id"), lit(11)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            expr("substring(trim(text), 1, CAST(floor(length(trim(text)) / 2) AS INT))")
              .as("text")))
      Dedup.prefixDups(planted, "doc_id", "text")
    }),
    "dedup_containment" -> ((s, dir) => {
      // embedded-document detection: the doc_id%13 slice is PLANTED as
      // middle-half excerpts (jaccard ~0.5 against the source — under
      // every near-dup threshold — but containment ~1). Candidates from
      // a df-capped shingle inverted index, exact intersect verify;
      // the oracle replays the same cap
      val d = t(s, dir, "documents")
      val planted = d.select(col("doc_id"), col("text")).unionByName(
        d.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            expr("""substring(trim(text),
                 |  CAST(floor(length(trim(text)) / 4) AS INT) + 1,
                 |  CAST(floor(length(trim(text)) / 2) AS INT))""".stripMargin)
              .as("text")))
      Dedup.containmentPairs(planted, "doc_id", "text",
        shingleSize = 2, threshold = 0.8, maxDf = 64, minShingles = 4)
    }),
    "dedup_image_pairs" -> ((s, dir) => {
      // image near-dup pipeline composed end-to-end: real PNG decode →
      // dHash → pigeonhole bit-block bucketing → exact-Hamming verify.
      // Planted duplicates: ids offset by 1000192 (a multiple of 256)
      // produce pixel-identical images, so every original pairs with its
      // re-encoded copy at distance 0 — plus the formula's own id±256k
      // coincidences, which the oracle replays identically
      implicit val sp: SparkSession = s
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val corpus = ids.union(ids.select(col("doc_id") + 1000192L))
      val hashes = Multimodal.dHash(
        Multimodal.syntheticGradientImages(corpus, "doc_id", w = 18, h = 16))
      Dedup.bitstringPairs(hashes, "asset_id", "dhash_bits",
        maxHamming = 2, maxBucket = 1000)
    }),
    "mm_audio_features" -> ((s, dir) => {
      // windowed energy features over REAL decoded PCM: per (channel,
      // 100-frame window) mean/RMS/peak — every number predictable from
      // the synthetic sample formula (id*31 + i*7) % 8192, with exact
      // long accumulation so the doubles are bit-identical cross-engine
      implicit val sp: SparkSession = s
      Multimodal.audioFeatures(
        Multimodal.syntheticAudio(t(s, dir, "documents"), "doc_id"),
        windowFrames = 100)
        .select(col("asset_id"),
          col("channel").cast(LongType).as("channel"),
          col("window_index").cast(LongType).as("window_index"),
          col("n_samples").cast(LongType).as("n_samples"),
          col("mean_amp"), col("rms"),
          col("peak").cast(LongType).as("peak"))
    }),
    "mm_keyframes" -> ((s, dir) => {
      // scene-cut detection over REAL decoded frames: the synthetic
      // per-frame colors follow id formulas, so every mean-RGB delta —
      // and thus every keyframe decision — is oracle-predictable
      implicit val sp: SparkSession = s
      Multimodal.keyframes(
        Multimodal.syntheticVideos(t(s, dir, "documents"), "doc_id"))
    }),
    "mm_frames" -> ((s, dir) => {
      // container video -> REAL per-frame decode: every 2nd frame's
      // dimensions and corner pixel, all predictable from id formulas
      implicit val sp: SparkSession = s
      Multimodal.sampleVideoFrames(
        Multimodal.syntheticVideos(t(s, dir, "documents"), "doc_id"), everyK = 2)
        .select(col("asset_id"),
          col("frame_index").cast(LongType).as("frame_index"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("red").cast(LongType).as("red"),
          col("green").cast(LongType).as("green"),
          col("blue").cast(LongType).as("blue"))
    }),
    "mm_frames_mjpeg" -> ((s, dir) => {
      // MJPEG (concatenated JFIF) -> REAL per-frame JPEG decode. JPEG is
      // lossy, so the oracle checks STRUCTURAL stats (index, dimensions)
      // — pixel-exact checks ride the lossless PNG container (mm_frames)
      implicit val sp: SparkSession = s
      Multimodal.sampleVideoFrames(
        Multimodal.syntheticMjpegVideos(t(s, dir, "documents"), "doc_id"), everyK = 2)
        .select(col("asset_id"),
          col("frame_index").cast(LongType).as("frame_index"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"))
    }),
    "mm_features" -> ((s, dir) => {
      // feature vector = [w, h, meanR, meanG, meanB] over DECODED pixels;
      // solid-color fills make every component oracle-predictable exactly
      implicit val sp: SparkSession = s
      Multimodal.extractFeatures(
        Multimodal.syntheticImages(t(s, dir, "documents"), "doc_id"))
        .select(col("asset_id"),
          element_at(col("feature"), 1).cast(DoubleType).as("f_width"),
          element_at(col("feature"), 2).cast(DoubleType).as("f_height"),
          element_at(col("feature"), 3).cast(DoubleType).as("f_mean_r"),
          element_at(col("feature"), 4).cast(DoubleType).as("f_mean_g"),
          element_at(col("feature"), 5).cast(DoubleType).as("f_mean_b"))
    }),
  )

  /** DuckDB-dialect oracles for every SQL-expressible query above.
    * Column names/aliases must match the Spark output exactly. */
  /** The beam walk's DuckDB replica — shared VERBATIM by `ann_beam`
    * (in-session graph) and `ann_beam_index` (persisted id-bucketed
    * index): both run the same exact-integer walk, so one replica
    * certifies both. */
  private val beamWalkSql: String =
    """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM qz WHERE vec_id < 4),
        |d0 AS (SELECT qz.vec_id, qz.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c0.c[i]) * (qz.e[i] - c0.c[i]))) AS dist
        |  FROM qz CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT qz.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c1.c[i]) * (qz.e[i] - c1.c[i]))) AS dist
        |  FROM qz CROSS JOIN c1),
        |wc AS (SELECT vec_id, cluster, e FROM (
        |    SELECT d1.vec_id, d1.cid AS cluster, qz.e,
        |      row_number() OVER (PARTITION BY d1.vec_id
        |        ORDER BY d1.dist, d1.cid) AS rn
        |    FROM d1 JOIN qz USING (vec_id)) WHERE rn = 1),
        |ed AS (SELECT src, dst FROM (
        |    SELECT a.vec_id AS src, b.vec_id AS dst,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY list_sum(list_transform(range(1, 65),
        |          i -> a.e[i] * b.e[i])) DESC, b.vec_id) AS r
        |    FROM wc a JOIN wc b
        |      ON a.cluster = b.cluster AND a.vec_id <> b.vec_id)
        |  WHERE r <= 5),
        |eds AS (SELECT src, dst FROM ed
        |  UNION SELECT dst AS src, src AS dst FROM ed),
        |reps AS (SELECT cluster, MIN(vec_id) AS rep FROM wc GROUP BY cluster),
        |qq AS (SELECT wc.vec_id AS qid, wc.e AS qv, r.rep
        |  FROM wc JOIN reps r USING (cluster) WHERE wc.vec_id < 8),
        |f0 AS (SELECT qid, rep AS node FROM qq),
        |x1 AS (SELECT DISTINCT qid, node FROM (
        |    SELECT qid, node FROM f0
        |    UNION ALL
        |    SELECT f0.qid, eds.dst AS node FROM f0 JOIN eds ON f0.node = eds.src)),
        |f1 AS (SELECT qid, node FROM (
        |    SELECT c.qid, c.node,
        |      row_number() OVER (PARTITION BY c.qid ORDER BY
        |        list_sum(list_transform(range(1, 65),
        |          i -> qq.qv[i] * w.e[i])) DESC, c.node) AS r
        |    FROM x1 c JOIN qq ON qq.qid = c.qid JOIN wc w ON w.vec_id = c.node)
        |  WHERE r <= 8),
        |x2 AS (SELECT DISTINCT qid, node FROM (
        |    SELECT qid, node FROM f1
        |    UNION ALL
        |    SELECT f1.qid, eds.dst AS node FROM f1 JOIN eds ON f1.node = eds.src)),
        |f2 AS (SELECT qid, node FROM (
        |    SELECT c.qid, c.node,
        |      row_number() OVER (PARTITION BY c.qid ORDER BY
        |        list_sum(list_transform(range(1, 65),
        |          i -> qq.qv[i] * w.e[i])) DESC, c.node) AS r
        |    FROM x2 c JOIN qq ON qq.qid = c.qid JOIN wc w ON w.vec_id = c.node)
        |  WHERE r <= 8),
        |x3 AS (SELECT DISTINCT qid, node FROM (
        |    SELECT qid, node FROM f2
        |    UNION ALL
        |    SELECT f2.qid, eds.dst AS node FROM f2 JOIN eds ON f2.node = eds.src)),
        |f3 AS (SELECT qid, node FROM (
        |    SELECT c.qid, c.node,
        |      row_number() OVER (PARTITION BY c.qid ORDER BY
        |        list_sum(list_transform(range(1, 65),
        |          i -> qq.qv[i] * w.e[i])) DESC, c.node) AS r
        |    FROM x3 c JOIN qq ON qq.qid = c.qid JOIN wc w ON w.vec_id = c.node)
        |  WHERE r <= 8)
        |SELECT qid AS query_id, node AS neighbor_id, CAST(r AS BIGINT) AS rank
        |FROM (
        |  SELECT c.qid, c.node,
        |    row_number() OVER (PARTITION BY c.qid ORDER BY
        |      list_sum(list_transform(range(1, 65),
        |        i -> qq.qv[i] * w.e[i])) DESC, c.node) AS r
        |  FROM f3 c JOIN qq ON qq.qid = c.qid JOIN wc w ON w.vec_id = c.node
        |  WHERE c.node <> c.qid)
        |WHERE r <= 3""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_suppliers" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_top_customers" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  COUNT(*) OVER w AS running_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_distinct_agg" ->
      """SELECT n_name,
        |  COUNT(DISTINCT c_mktsegment) AS n_segments,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q_set_ops" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |UNION
        |SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS nationkey FROM supplier)""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
        |  COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus""".stripMargin,
    "q14_promo_share" ->
      """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "pipeline_quality_filter" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |          x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
        |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS mean_word_len
        |  FROM documents)
        |WHERE n_tokens >= 50 AND n_tokens <= 500
        |  AND stopword_ratio < 0.5 AND mean_word_len < 12.0""".stripMargin,
    "ice_incremental" -> "SELECT * FROM orders WHERE o_orderkey % 2 <> 0",
    "ice_bucket_partitioned" -> "SELECT * FROM orders WHERE o_orderkey % 100 = 0",
    "ice_identity_partitioned" -> "SELECT * FROM orders WHERE o_orderstatus = 'O'",
    "q6_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |         AND l_quantity BETWEEN 10 AND 40)""".stripMargin,
    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year, l_extendedprice, l_discount
        |  FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01')
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY year(o_orderdate)""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""".stripMargin,
    "q17_small_quantity" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM orders
        |  JOIN (SELECT l_orderkey AS big_ok, SUM(l_quantity) AS total_qty
        |        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |    ON o_orderkey = big_ok
        |  JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q21_blamed_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |  JOIN supplier ON l1.l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE l1.l_returnflag = 'R' AND n_name = 'NATION_3'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,
    "q22_idle_customers" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS offer_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |sliced AS (
        |  SELECT o.*, p_partkey, p_brand FROM offers o
        |  JOIN part ON l_partkey = p_partkey WHERE p_size = 15)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS s_acctbal,
        |  s_name, n_name, p_partkey, p_brand,
        |  CAST(offer_cost AS DOUBLE) AS supply_cost
        |FROM sliced
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE offer_cost = (SELECT MIN(offer_cost) FROM sliced s2
        |                    WHERE s2.l_partkey = sliced.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q11_important_parts" ->
      """WITH per_part AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_1')
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
        |FROM per_part
        |WHERE value_dec > (SELECT SUM(value_dec) * 0.001 FROM per_part)""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25, 30)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q20_promotion_parts" ->
      """WITH blueparts AS (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'),
        |li AS (SELECT * FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM blueparts)),
        |alltime AS (
        |  SELECT l_partkey AS a_pk, l_suppkey AS a_sk, SUM(l_quantity) AS qty_all
        |  FROM li GROUP BY l_partkey, l_suppkey),
        |y97 AS (
        |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty_97
        |  FROM li
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM y97 JOIN alltime
        |      ON l_partkey = a_pk AND l_suppkey = a_sk
        |    WHERE qty_97 > 0.5 * qty_all)""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    "q_events_sessions" ->
      """WITH gapped AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM gapped)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sessions GROUP BY user_id, session_idx""".stripMargin,
    "q_events_range" ->
      """WITH p AS (
        |  SELECT event_id AS interval_id, user_id, ts AS s,
        |    ts + INTERVAL 6 HOUR AS e
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT p.interval_id, c.click_id
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.ts >= p.s AND c.ts <= p.e""".stripMargin,
    // ---- round 10 (§2.25) ----
    // same 8-token re-lining as text_linededup plus the per-source
    // planted footer; report = per-source lines in >= 10 distinct docs
    "text_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, source,
        |    array_to_string(tk[(CAST(i AS INT) * 8 + 1):(CAST(i AS INT) * 8 + 8)], ' ') AS line
        |  FROM toks, UNNEST(range(0, ((len(tk) - 1) // 8) + 1)) AS t(i)
        |  UNION ALL
        |  SELECT doc_id, source,
        |    'subscribe to ' || source || ' for daily updates' AS line
        |  FROM toks),
        |dl AS (
        |  SELECT DISTINCT doc_id, source, trim(line) AS line
        |  FROM lined WHERE length(trim(line)) > 0),
        |src AS (SELECT source, COUNT(*) AS src_docs FROM documents GROUP BY source)
        |SELECT d.source, d.line, COUNT(*) AS line_docs,
        |  round(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(src_docs), 6) AS doc_share
        |FROM dl d JOIN src USING (source)
        |GROUP BY d.source, d.line HAVING COUNT(*) >= 10""".stripMargin,
    // distinct-bigram novelty of odd ids against the even-id reference
    "text_novelty" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS w
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, UNNEST(
        |      CASE WHEN len(w) >= 2
        |        THEN list_transform(range(0, len(w) - 1),
        |          i -> w[CAST(i AS INT) + 1] || ' ' || w[CAST(i AS INT) + 2])
        |        ELSE [] END) AS gram
        |    FROM w)),
        |ref AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
        |per AS (
        |  SELECT g.doc_id, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS n_novel
        |  FROM g LEFT JOIN ref r USING (gram)
        |  WHERE g.doc_id % 2 = 1 GROUP BY g.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
        |  round(CAST(coalesce(n_novel, 0) AS DOUBLE)
        |    / greatest(coalesce(n_grams, 0), 1), 6) AS novelty
        |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |LEFT JOIN per USING (doc_id)""".stripMargin,
    // sequential double folds of squared components, prefix vs full
    "embed_matryoshka" ->
      """WITH m AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS f,
        |    list_sum(list_transform(embedding[1:16],
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS tr
        |  FROM embeddings)
        |SELECT vec_id,
        |  round(sqrt(f), 6) AS norm_full,
        |  round(sqrt(tr), 6) AS norm_trunc,
        |  CASE WHEN f = 0 THEN 0.0 ELSE round(tr / f, 6) END AS mass_kept
        |FROM m""".stripMargin,
    // integer-quantized centroid sums (cosine is 1/n-invariant); the
    // vec_id<3 rows are negated, landing in the anti-centroid direction
    "embed_outliers" ->
      """WITH shaped AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id < 3
        |      THEN list_transform(embedding, x -> CAST(-x AS FLOAT))
        |      ELSE embedding END AS v
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, list_transform(v,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS e
        |  FROM shaped),
        |c AS (
        |  SELECT i, SUM(e[CAST(i AS INT)]) AS s
        |  FROM q CROSS JOIN range(1, 65) t(i) GROUP BY i),
        |cs AS (
        |  SELECT list(s ORDER BY i) AS sv,
        |    CAST(SUM(s * s) AS DOUBLE) AS ss FROM c),
        |sc AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> e[CAST(i AS INT)] * sv[CAST(i AS INT)])) AS DOUBLE) AS dot,
        |    CAST(list_sum(list_transform(e, x -> x * x)) AS DOUBLE) AS qq,
        |    ss
        |  FROM q CROSS JOIN cs)
        |SELECT vec_id,
        |  round(CASE WHEN qq = 0 OR ss = 0 THEN 0.0
        |    ELSE dot / (sqrt(qq) * sqrt(ss)) END, 6) AS centroid_cos,
        |  (CASE WHEN qq = 0 OR ss = 0 THEN 0.0
        |    ELSE dot / (sqrt(qq) * sqrt(ss)) END) < -0.05 AS is_outlier
        |FROM sc""".stripMargin,
    // radius search: planted jittered queries score ~1, the rest ~0 —
    // the 0.5 threshold sits in the void between the modes
    "ann_range" ->
      """SELECT q.vec_id + 1000000 AS query_id, c.vec_id AS neighbor_id
        |FROM embeddings q JOIN embeddings c
        |  ON list_cosine_similarity(
        |       CAST(list_transform(q.embedding,
        |         x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS DOUBLE[]),
        |       CAST(c.embedding AS DOUBLE[])) >= 0.5
        |  AND c.vec_id <> q.vec_id + 1000000
        |WHERE q.vec_id < 4""".stripMargin,
    // stream-static anti-join against the %50 bench slice
    "stream_decontaminate" ->
      """SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents b
        |  WHERE b.doc_id % 50 = 0 AND b.text = d.text)""".stripMargin,
    // the rewrite is metadata-only for the logical state: the scan after
    // compaction equals the two stacked DELETE WHERE predicates
    "ice_rewrite_deletes" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 3""".stripMargin,
    // uniform-target token budget planning over integer token counts
    "mix_token_budget" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT COUNT(*) AS n, SUM(tokens) AS total FROM t)
        |SELECT source, tokens,
        |  round(CAST(tokens AS DOUBLE) / total, 6) AS obs_share,
        |  CAST(floor(10000000 / n) AS BIGINT) AS alloc_tokens,
        |  round(floor(10000000 / n) / tokens, 6) AS epochs
        |FROM t CROSS JOIN tot""".stripMargin,
    // exact long products rank the lift; top-50 by (lift desc, bigram)
    "text_collocations" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> length(x) > 0) AS w
        |  FROM documents),
        |toks AS (SELECT UNNEST(w) AS tok FROM w),
        |uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n FROM toks),
        |bi AS (
        |  SELECT gx AS x, gy AS y, COUNT(*) AS c_xy FROM (
        |    SELECT w[CAST(i AS INT) + 1] AS gx, w[CAST(i AS INT) + 2] AS gy
        |    FROM w, UNNEST(range(0, greatest(len(w) - 1, 0))) AS t(i))
        |  GROUP BY gx, gy HAVING COUNT(*) >= 5)
        |SELECT bigram, c_xy, round(lift, 6) AS lift FROM (
        |  SELECT b.x || ' ' || b.y AS bigram, b.c_xy,
        |    CAST(b.c_xy * n.n AS DOUBLE) / CAST(ux.c * uy.c AS DOUBLE) AS lift
        |  FROM bi b
        |  JOIN uni ux ON b.x = ux.tok
        |  JOIN uni uy ON b.y = uy.tok
        |  CROSS JOIN n)
        |ORDER BY lift DESC, bigram LIMIT 50""".stripMargin,
    // df bands of distinct (doc, gram) pairs; log2 of exact integers
    "dedup_shingle_profile" ->
      """WITH w AS (
        |  SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> length(x) > 0) AS w
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    w[CAST(i AS INT) + 1] || ' ' || w[CAST(i AS INT) + 2] AS gram
        |  FROM w, UNNEST(range(0, greatest(len(w) - 1, 0))) AS t(i)),
        |df AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
        |SELECT CAST(floor(log2(df)) AS BIGINT) AS df_band,
        |  COUNT(*) AS n_shingles, MAX(df) AS max_df
        |FROM df GROUP BY df_band""".stripMargin,
    // first-3-event paths per user, counted across users
    "q_events_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users FROM p GROUP BY path""".stripMargin,
    // the aged-out tag drops, the fresh branch and main survive
    "ice_ref_retention" ->
      """SELECT 'audit' AS ref_name UNION ALL SELECT 'main'""".stripMargin,
    // the evolved target: %3 base rows (null o_totalprice unless also
    // %2-matched), %2 source rows updated/inserted with the new column
    "sql_merge_evolution" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE o_orderkey % 3 = 0 OR o_orderkey % 2 = 0""".stripMargin,
    // planted orphans reclaimed; the committed rows are untouched
    "meta_orphan_files" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS table_rows,
        |  CAST(2 AS BIGINT) AS orphans_removed
        |FROM orders WHERE o_orderkey % 4 = 0""".stripMargin,
    // exact integer hourly counts; median = avg of two longs at worst
    "q_events_anomaly" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour FROM events),
        |allr AS (
        |  SELECT * FROM e
        |  UNION ALL SELECT * FROM e WHERE hour = TIMESTAMP '2024-01-05 00:00:00'
        |  UNION ALL SELECT * FROM e WHERE hour = TIMESTAMP '2024-01-05 00:00:00'
        |  UNION ALL SELECT * FROM e WHERE hour = TIMESTAMP '2024-01-05 00:00:00'),
        |hourly AS (
        |  SELECT event_type, hour, COUNT(*) AS n_events
        |  FROM allr GROUP BY event_type, hour),
        |med AS (
        |  SELECT event_type, median(n_events) AS med
        |  FROM hourly GROUP BY event_type)
        |SELECT h.event_type, h.hour, h.n_events, m.med,
        |  CAST(h.n_events AS DOUBLE) > 2.0 * m.med AS is_spike
        |FROM hourly h JOIN med m USING (event_type)""".stripMargin,
    // same planted canaries; regexp hit counts + one rollup
    "text_watermark" ->
      """WITH seeded AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 62 = 0
        |        THEN text || ' canary-guid-8f4e2a repeat canary-guid-8f4e2a'
        |      WHEN doc_id % 31 = 0
        |        THEN text || ' canary-guid-8f4e2a do not train'
        |      ELSE text END AS text
        |  FROM documents)
        |SELECT source, COUNT(*) AS docs,
        |  CAST(SUM(CASE WHEN len(regexp_extract_all(text, 'canary-guid-8f4e2a')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS canary_docs,
        |  CAST(SUM(len(regexp_extract_all(text, 'canary-guid-8f4e2a'))) AS BIGINT)
        |    AS canary_hits
        |FROM seeded GROUP BY source""".stripMargin,
    // the sample_split md5 cut over five equal folds
    "sample_kfold" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok,
        |    CASE
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |        printf('%04x', CAST(round(0.2 * 65536) AS BIGINT)) THEN 'f0'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |        printf('%04x', CAST(round(0.4 * 65536) AS BIGINT)) THEN 'f1'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |        printf('%04x', CAST(round(0.6 * 65536) AS BIGINT)) THEN 'f2'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |        printf('%04x', CAST(round(0.8 * 65536) AS BIGINT)) THEN 'f3'
        |      ELSE 'f4' END AS fold
        |  FROM documents),
        |tot AS (SELECT COUNT(*) AS n FROM a)
        |SELECT fold, COUNT(*) AS test_docs,
        |  CAST(n - COUNT(*) AS BIGINT) AS train_docs,
        |  CAST(SUM(tok) AS BIGINT) AS test_tokens
        |FROM a CROSS JOIN tot GROUP BY fold, n""".stripMargin,
    // prefix top-20 screen, full-vector top-5 rerank — both stages
    // replayed; ranking-only cosine use (no raw doubles cross)
    "ann_matryoshka" ->
      """WITH q AS (
        |  SELECT vec_id + 1000000 AS qid,
        |    CAST(list_transform(embedding,
        |      x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS DOUBLE[]) AS qv,
        |    CAST(list_transform(embedding[1:16],
        |      x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS DOUBLE[]) AS qp
        |  FROM embeddings WHERE vec_id < 4),
        |c AS (
        |  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv,
        |    CAST(embedding[1:16] AS DOUBLE[]) AS cp
        |  FROM embeddings),
        |cand AS (
        |  SELECT qid, nid FROM (
        |    SELECT q.qid, c.nid,
        |      ROW_NUMBER() OVER (PARTITION BY q.qid
        |        ORDER BY list_cosine_similarity(q.qp, c.cp) DESC, c.nid) AS r
        |    FROM q JOIN c ON q.qid <> c.nid) WHERE r <= 20)
        |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
        |  SELECT cand.qid, cand.nid,
        |    ROW_NUMBER() OVER (PARTITION BY cand.qid
        |      ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, cand.nid) AS rank
        |  FROM cand JOIN q USING (qid) JOIN c USING (nid)) WHERE rank <= 5""".stripMargin,
    // identical sign tests + bit arithmetic (jitter preserves signs)
    "embed_binary_search" ->
      """WITH sig AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(range(1, 33),
        |      i -> CASE WHEN embedding[CAST(i AS INT)] > 0
        |        THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)) AS s
        |  FROM embeddings),
        |q AS (SELECT vec_id + 1000000 AS query_id, s FROM sig WHERE vec_id < 4)
        |SELECT q.query_id, c.vec_id AS neighbor_id,
        |  CAST(bit_count(xor(q.s, c.s)) AS BIGINT) AS hamming
        |FROM q JOIN sig c ON q.query_id <> c.vec_id
        |WHERE bit_count(xor(q.s, c.s)) <= 2""".stripMargin,
    // same tokenization; exact integer sums, one final division
    "text_diversity" ->
      """WITH w AS (
        |  SELECT doc_id, UNNEST(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> length(x) > 0)) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
        |p AS (
        |  SELECT doc_id,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(SUM(c * c) AS BIGINT) AS c2
        |  FROM c GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_tokens, 0) AS n_tokens,
        |  coalesce(n_types, 0) AS n_types,
        |  round(CAST(coalesce(n_types, 0) AS DOUBLE)
        |    / greatest(coalesce(n_tokens, 0), 1), 6) AS ttr,
        |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
        |    ELSE round(1.0 - CAST(c2 AS DOUBLE) / (n_tokens * n_tokens), 6)
        |  END AS simpson
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN p USING (doc_id)""".stripMargin,
    // cohort = first-seen day; distinct active users per day offset
    "q_events_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id)
        |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
        |  CAST(datediff('day', cohort_day, d) AS BIGINT) AS day_offset,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY cohort_day, datediff('day', cohort_day, d)""".stripMargin,
    "q_events_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
        |UNION ALL
        |SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
        |UNION ALL
        |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p""".stripMargin,
    "q_events_overlap" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS ps,
        |    CASE WHEN event_id % 97 = 0 THEN ts + INTERVAL 10 DAY
        |         ELSE ts + INTERVAL 2 HOUR END AS pe
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id AS view_id, user_id, ts AS vs,
        |    ts + INTERVAL 1 HOUR AS ve
        |  FROM events WHERE event_type = 'view')
        |SELECT p.purchase_id, v.view_id
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND p.ps <= v.ve AND v.vs <= p.pe""".stripMargin,
    "q_events_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT user_id, ts, event_id,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') WHERE rn = 1),
        |purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  c.event_id AS click_event_id, c.ts AS click_ts
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin,
    "q_events_latest" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,
    "q_skew_join" ->
      """WITH dim AS (
        |  SELECT user_id, COUNT(*) AS user_events FROM events GROUP BY user_id)
        |SELECT e.user_id AS user_id, d.user_events AS user_events,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY 1, 2""".stripMargin,
    "t_temporal_transforms" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(year(l_shipdate) - 1970 AS INT) AS t_year,
        |  CAST((year(l_shipdate) - 1970) * 12 + month(l_shipdate) - 1 AS INT) AS t_month,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS INT) AS t_day,
        |  CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', l_shipdate) AS INT) AS t_hour
        |FROM lineitem""".stripMargin,
    "t_truncate_transforms" ->
      """SELECT p_partkey,
        |  p_size - ((p_size % 10 + 10) % 10) AS t_size,
        |  p_partkey - ((p_partkey % 100 + 100) % 100) AS t_key,
        |  SUBSTRING(p_name, 1, 8) AS t_name
        |FROM part""".stripMargin,
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  GREATEST(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT),
        |           CAST(FLOOR(length(text) / 4) AS BIGINT)) AS n_tokens_bpe_est
        |FROM documents""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / len(regexp_split_to_array(trim(text), '\s+')) AS mean_word_len,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS DOUBLE)
        |    / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio
        |FROM documents""".stripMargin,
    // exact replica of TextAnalysis.gopherRules: same splits, same
    // integer counts, same exact-double divisions — rule booleans agree
    // bit-for-bit (boundary comparisons divide exact integers)
    "text_gopher" ->
      """WITH base AS (
        |  SELECT doc_id, text AS t,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> length(x) > 0) AS words,
        |    list_filter(list_transform(string_split(text, chr(10)),
        |      l -> trim(l)), l -> length(l) > 0) AS lines
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, t, words, lines,
        |    len(words) AS nw, len(lines) AS nl,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(list_aggregate(list_transform(words, x -> length(x)), 'sum') AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS mean_len,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST((length(t) - length(regexp_replace(t, '#', '', 'g')))
        |        + (length(t) - length(regexp_replace(t, '\.\.\.', '', 'g'))) / 3
        |        AS DOUBLE) / len(words) ELSE 0.0 END AS sym_ratio,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS bullet_frac,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS ellipsis_frac,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS alpha_frac,
        |    len(list_intersect(list_distinct(list_transform(words, x -> lower(x))),
        |      ['the','be','to','of','and','that','have','with'])) AS req_stops
        |  FROM base)
        |SELECT doc_id,
        |  nw >= 50 AND nw <= 100000 AS r_word_count,
        |  mean_len >= 3.0 AND mean_len <= 10.0 AS r_mean_word_len,
        |  sym_ratio <= 0.1 AS r_symbol_ratio,
        |  bullet_frac <= 0.9 AS r_bullet_lines,
        |  ellipsis_frac <= 0.3 AS r_ellipsis_lines,
        |  alpha_frac >= 0.8 AS r_alpha_words,
        |  req_stops >= 2 AS r_stopwords,
        |  (nw >= 50 AND nw <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |    AND sym_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |    AND alpha_frac >= 0.8 AND req_stops >= 2 AS pass
        |FROM m""".stripMargin,
    // the text_gopher oracle body with the carry columns threaded
    // through and the conjunction applied as the filter — what the
    // streaming gate must produce after its micro-batches land
    "stream_quality_gate" ->
      """WITH shaped AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN text || ' the data would be part of and that we have with it'
        |      ELSE text END AS text
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, lang, source, n_chars, text AS t,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> length(x) > 0) AS words,
        |    list_filter(list_transform(string_split(text, chr(10)),
        |      l -> trim(l)), l -> length(l) > 0) AS lines
        |  FROM shaped),
        |m AS (
        |  SELECT doc_id, lang, source, n_chars, t, words, lines,
        |    len(words) AS nw, len(lines) AS nl,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(list_aggregate(list_transform(words, x -> length(x)), 'sum') AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS mean_len,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST((length(t) - length(regexp_replace(t, '#', '', 'g')))
        |        + (length(t) - length(regexp_replace(t, '\.\.\.', '', 'g'))) / 3
        |        AS DOUBLE) / len(words) ELSE 0.0 END AS sym_ratio,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS bullet_frac,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS ellipsis_frac,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS alpha_frac,
        |    len(list_intersect(list_distinct(list_transform(words, x -> lower(x))),
        |      ['the','be','to','of','and','that','have','with'])) AS req_stops
        |  FROM base)
        |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM m
        |WHERE (nw >= 50 AND nw <= 100000)
        |  AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |  AND sym_ratio <= 0.1 AND bullet_frac <= 0.9
        |  AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        |  AND req_stops >= 2""".stripMargin,
    // the four hygiene gates replayed as CTEs over the SAME planted text,
    // joined on doc_id — the composition's truth is the per-gate oracles'
    "pipeline_webclean" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, text,
        |    array_to_string(list_transform(range(0, ((len(tk) - 1) // 8) + 1),
        |      i -> array_to_string(
        |        tk[(CAST(i AS INT) * 8 + 1):(CAST(i AS INT) * 8 + 8)], ' ')
        |        || '.'), chr(10)) AS base
        |  FROM toks),
        |shaped AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text
        |    WHEN doc_id % 3 = 0 THEN base || chr(10) ||
        |      'the data have to be of use and that with scale.'
        |    ELSE base END AS s0
        |  FROM lined),
        |d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN
        |      s0 || ' caf' || chr(195) || chr(169) || ' x' || chr(226)
        |        || chr(8364) || chr(8482) || 'y z' || chr(65533) || 'w '
        |        || chr(7)
        |    ELSE s0 END AS t
        |  FROM shaped),
        |moji AS (
        |  SELECT doc_id,
        |    ((length(t) - length(regexp_replace(t, '\x{FFFD}', '', 'g')))
        |     + (length(t) - length(regexp_replace(t,
        |         '\x{00C3}[\x{0080}-\x{00BF}]', '', 'g'))) // 2
        |     + (length(t) - length(regexp_replace(t, '\x{00E2}\x{20AC}',
        |         '', 'g'))) // 2
        |     + (length(t) - length(regexp_replace(t,
        |         '[\x{0001}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]',
        |         '', 'g')))) = 0 AS encoding_ok
        |  FROM d),
        |lsc AS (
        |  SELECT doc_id,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','is','in','that','it','was','for','with','not','this'))) AS s_en,
        |    len(list_filter(w, x -> x IN ('le','la','les','de','des','et','est','une','un','dans','que','pour','pas'))) AS s_fr,
        |    len(list_filter(w, x -> x IN ('el','la','los','las','de','y','es','en','que','un','una','por','con','no'))) AS s_es,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','ist','in','von','den','mit','nicht','ein','eine','zu'))) AS s_de,
        |    len(list_filter(w, x -> x IN ('il','la','di','che','e','un','una','per','non','sono','con','del'))) AS s_it,
        |    len(list_filter(w, x -> x IN ('o','a','os','as','de','que','e','um','uma','para','com','nao'))) AS s_pt
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(t)), '\s+') AS w FROM d)),
        |lang AS (
        |  SELECT doc_id,
        |    GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) > 0
        |      AND s_en = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) AS lang_ok
        |  FROM lsc),
        |c4k AS (
        |  SELECT doc_id, t,
        |    COALESCE(array_to_string(list_filter(
        |      list_filter(list_transform(string_split(t, chr(10)),
        |        l -> trim(l)), l -> length(l) > 0),
        |      l -> regexp_matches(l, '[.!?"]$')
        |        AND len(list_filter(regexp_split_to_array(l, '\s+'),
        |              x -> length(x) > 0)) >= 5
        |        AND NOT contains(lower(l), 'javascript')), chr(10)), '') AS kt
        |  FROM d),
        |c4 AS (
        |  SELECT doc_id,
        |    NOT contains(t, '{') AND NOT contains(lower(t), 'lorem ipsum')
        |      AND (length(kt) - length(regexp_replace(kt, '[.!?]', '', 'g'))) >= 3
        |      AS c4_ok
        |  FROM c4k),
        |gb AS (
        |  SELECT doc_id, t,
        |    list_filter(regexp_split_to_array(trim(t), '\s+'),
        |      x -> length(x) > 0) AS words,
        |    list_filter(list_transform(string_split(t, chr(10)),
        |      l -> trim(l)), l -> length(l) > 0) AS lines
        |  FROM d),
        |gm AS (
        |  SELECT doc_id,
        |    len(words) AS nw,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(list_aggregate(list_transform(words, x -> length(x)), 'sum') AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS mean_len,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST((length(t) - length(regexp_replace(t, '#', '', 'g')))
        |        + (length(t) - length(regexp_replace(t, '\.\.\.', '', 'g'))) / 3
        |        AS DOUBLE) / len(words) ELSE 0.0 END AS sym_ratio,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS bullet_frac,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS ellipsis_frac,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS alpha_frac,
        |    len(list_intersect(list_distinct(list_transform(words, x -> lower(x))),
        |      ['the','be','to','of','and','that','have','with'])) AS req_stops
        |  FROM gb),
        |go AS (
        |  SELECT doc_id,
        |    (nw >= 50 AND nw <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |      AND sym_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |      AND alpha_frac >= 0.8 AND req_stops >= 2 AS gopher_ok
        |  FROM gm)
        |SELECT doc_id, encoding_ok, lang_ok, c4_ok, gopher_ok,
        |  encoding_ok AND lang_ok AND c4_ok AND gopher_ok AS keep
        |FROM moji JOIN lang USING (doc_id) JOIN c4 USING (doc_id)
        |  JOIN go USING (doc_id)""".stripMargin,
    "text_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(trim(text)),
        |      '[^a-z0-9]+'), x -> length(x) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |    t.tf * GREATEST(0, 40 - CAST(FLOOR(log2(d.df)) AS BIGINT)) AS score
        |  FROM tf t JOIN dfx d USING (term)),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
        |  FROM sc)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  CAST(score AS BIGINT) AS score
        |FROM r WHERE rank <= 3""".stripMargin,
    "text_c4" ->
      """WITH base AS (
        |  SELECT doc_id, text AS t,
        |    list_filter(list_transform(string_split(text, chr(10)),
        |      l -> trim(l)), l -> length(l) > 0) AS lines
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, t, lines,
        |    list_filter(lines, l ->
        |      regexp_matches(l, '[.!?"]$')
        |      AND len(list_filter(regexp_split_to_array(l, '\s+'),
        |            x -> length(x) > 0)) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM base),
        |m AS (
        |  SELECT doc_id, t, lines, kept,
        |    COALESCE(array_to_string(kept, chr(10)), '') AS kt
        |  FROM k),
        |s AS (
        |  SELECT doc_id, t, lines, kept, kt,
        |    CAST(length(kt) - length(regexp_replace(kt, '[.!?]', '', 'g'))
        |      AS BIGINT) AS n_sent,
        |    NOT contains(t, '{') AS r_no_brace,
        |    NOT contains(lower(t), 'lorem ipsum') AS r_no_lorem
        |  FROM m)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  CAST(length(kt) AS BIGINT) AS kept_chars,
        |  n_sent AS n_sentences,
        |  r_no_brace, r_no_lorem,
        |  n_sent >= 3 AS r_min_sentences,
        |  r_no_brace AND r_no_lorem AND n_sent >= 3 AS pass
        |FROM s""".stripMargin,
    "mix_domain_weights" ->
      """WITH hist AS (
        |  SELECT source AS domain, COUNT(*) AS n_docs,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT SUM(n_tokens) AS T, COUNT(*) AS nd FROM hist)
        |SELECT domain, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / T, 6) AS tok_share,
        |  round(CAST(1.0 AS DOUBLE) / nd, 6) AS target_share,
        |  round(CAST(1.0 AS DOUBLE) / nd * T / n_tokens, 6) AS weight
        |FROM hist, tot""".stripMargin,
    // decoded-image oracles: the PNG payloads are generated from doc_id by
    // fixed integer formulas, so DuckDB predicts what imageio must decode
    "mm_resize" ->
      """SELECT doc_id AS asset_id,
        |  CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
        |  CAST(8 + doc_id % 57 AS BIGINT) AS orig_width,
        |  CAST(8 + (doc_id // 7) % 57 AS BIGINT) AS orig_height
        |FROM documents""".stripMargin,
    "mm_metadata" ->
      """SELECT doc_id AS asset_id, 'image/png' AS media_type,
        |  8 + doc_id % 57 AS width, 8 + (doc_id // 7) % 57 AS height,
        |  CAST(1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    "mm_audio" ->
      """SELECT doc_id AS asset_id,
        |  8000 * (1 + doc_id % 3) AS sample_rate,
        |  1 + doc_id % 2 AS channels,
        |  400 + (doc_id % 100) * 4 AS n_samples,
        |  CAST((400 + (doc_id % 100) * 4) * 1000.0
        |    / (8000 * (1 + doc_id % 3)) AS DOUBLE) AS duration_ms
        |FROM documents""".stripMargin,
    // image-pair replay: hashes recomputed from the texture formula for
    // originals AND +1000192 copies, then ALL pairs within Hamming 2 via
    // DuckDB bitstrings — the all-pairs ground truth the pigeonhole
    // bucketing must recall exactly
    // same planted truncations, same 16-char bucket key + cap + prefix
    // verify
    "dedup_prefix" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substr(trim(text), 1,
        |      CAST(floor(length(trim(text)) / 2) AS INT))
        |  FROM documents WHERE doc_id % 11 = 0),
        |k1 AS (
        |  SELECT doc_id, trim(text) AS t, length(trim(text)) AS len,
        |    md5(substr(trim(text), 1, 16)) AS key
        |  FROM d WHERE length(trim(text)) >= 16),
        |cap AS (SELECT doc_id, t, len, key FROM (
        |    SELECT k1.*, row_number() OVER (PARTITION BY key ORDER BY doc_id)
        |      AS rn FROM k1) WHERE rn <= 256)
        |SELECT a.doc_id AS prefix_id, b.doc_id AS full_id
        |FROM cap a JOIN cap b ON a.key = b.key
        |  AND (a.len < b.len OR (a.len = b.len AND a.doc_id < b.doc_id))
        |WHERE starts_with(b.t, a.t)""".stripMargin,
    "dedup_image_pairs" ->
      """WITH ids AS (
        |  SELECT doc_id FROM documents
        |  UNION ALL SELECT doc_id + 1000192 FROM documents),
        |px AS (
        |  SELECT doc_id, gx.i AS gx, gy.i AS gy, dx.i AS dx, dy.i AS dy
        |  FROM ids,
        |    UNNEST(range(0, 9)) gx(i), UNNEST(range(0, 8)) gy(i),
        |    UNNEST(range(0, 2)) dx(i), UNNEST(range(0, 2)) dy(i)),
        |blocks AS (
        |  SELECT doc_id, gx, gy,
        |    SUM((doc_id * 7 + 3 * (gx * 2 + dx) * (gx * 2 + dx)
        |         + 5 * (gy * 2 + dy) * (gy * 2 + dy)
        |         + (gx * 2 + dx) * (gy * 2 + dy)) % 256) // 4 AS v
        |  FROM px GROUP BY doc_id, gx, gy),
        |bits AS (
        |  SELECT b1.doc_id, b1.gy, b1.gx,
        |    CASE WHEN b2.v > b1.v THEN '1' ELSE '0' END AS bit
        |  FROM blocks b1 JOIN blocks b2
        |    ON b1.doc_id = b2.doc_id AND b1.gy = b2.gy AND b2.gx = b1.gx + 1
        |  WHERE b1.gx < 8),
        |h AS (
        |  SELECT doc_id, CAST(string_agg(bit, '' ORDER BY gy, gx) AS BIT) AS v
        |  FROM bits GROUP BY doc_id)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(bit_count(xor(x.v, y.v)) AS BIGINT) AS hamming
        |FROM h x JOIN h y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.v, y.v)) <= 2""".stripMargin,
    // dHash replay: same texture formula, same 2x2 integer block means
    // (floor of the sum over 4 pixels), same (y,x) bit order
    "mm_dhash" ->
      """WITH px AS (
        |  SELECT doc_id, gx.i AS gx, gy.i AS gy, dx.i AS dx, dy.i AS dy
        |  FROM documents,
        |    UNNEST(range(0, 9)) gx(i), UNNEST(range(0, 8)) gy(i),
        |    UNNEST(range(0, 2)) dx(i), UNNEST(range(0, 2)) dy(i)),
        |blocks AS (
        |  SELECT doc_id, gx, gy,
        |    SUM((doc_id * 7 + 3 * (gx * 2 + dx) * (gx * 2 + dx)
        |         + 5 * (gy * 2 + dy) * (gy * 2 + dy)
        |         + (gx * 2 + dx) * (gy * 2 + dy)) % 256) // 4 AS v
        |  FROM px GROUP BY doc_id, gx, gy),
        |bits AS (
        |  SELECT b1.doc_id, b1.gy, b1.gx,
        |    CASE WHEN b2.v > b1.v THEN '1' ELSE '0' END AS bit
        |  FROM blocks b1 JOIN blocks b2
        |    ON b1.doc_id = b2.doc_id AND b1.gy = b2.gy AND b2.gx = b1.gx + 1
        |  WHERE b1.gx < 8)
        |SELECT doc_id AS asset_id, CAST(18 AS BIGINT) AS width,
        |  CAST(16 AS BIGINT) AS height,
        |  string_agg(bit, '' ORDER BY gy, gx) AS dhash_bits
        |FROM bits GROUP BY doc_id""".stripMargin,
    // replay of the synthetic PCM formula: interleaved sample i of asset
    // id is (id*31 + i*7) % 8192; channel = i % ch, frame = i // ch,
    // window = frame // 100; exact BIGINT sums before the double division
    "mm_audio_features" ->
      """WITH params AS (
        |  SELECT doc_id AS asset_id,
        |    (1 + doc_id % 2) AS ch,
        |    (400 + (doc_id % 100) * 4) AS frames
        |  FROM documents),
        |idx AS (
        |  SELECT asset_id, ch, unnest(range(0, frames * ch)) AS i FROM params),
        |s AS (
        |  SELECT asset_id, CAST(i % ch AS BIGINT) AS channel,
        |    CAST((i // ch) // 100 AS BIGINT) AS window_index,
        |    CAST((asset_id * 31 + i * 7) % 8192 AS BIGINT) AS v
        |  FROM idx)
        |SELECT asset_id, channel, window_index,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  round(CAST(SUM(v) AS DOUBLE) / count(*), 6) AS mean_amp,
        |  round(sqrt(CAST(SUM(v * v) AS DOUBLE) / count(*)), 6) AS rms,
        |  CAST(MAX(v) AS BIGINT) AS peak
        |FROM s GROUP BY asset_id, channel, window_index""".stripMargin,
    "mm_keyframes" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id,
        |    unnest(range(0, 2 + doc_id % 7)) AS frame_index
        |  FROM documents),
        |c AS (
        |  SELECT asset_id, frame_index,
        |    CAST((asset_id + frame_index) % 256 AS DOUBLE) AS r,
        |    CAST((asset_id * 3 + frame_index) % 256 AS DOUBLE) AS g,
        |    CAST((asset_id * 5 + frame_index) % 256 AS DOUBLE) AS b
        |  FROM f),
        |d AS (
        |  SELECT asset_id, frame_index, r, g, b,
        |    LAG(r) OVER w AS pr, LAG(g) OVER w AS pg, LAG(b) OVER w AS pb
        |  FROM c WINDOW w AS (PARTITION BY asset_id ORDER BY frame_index))
        |SELECT asset_id, frame_index,
        |  round(CASE WHEN pr IS NULL THEN 0.0
        |    ELSE (abs(r - pr) + abs(g - pg) + abs(b - pb)) / 3.0 END, 6)
        |    AS color_delta,
        |  (pr IS NULL OR (abs(r - pr) + abs(g - pg) + abs(b - pb)) / 3.0 > 8.0)
        |    AS is_keyframe
        |FROM d""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id AS asset_id, f AS frame_index,
        |  8 + doc_id % 16 AS width, 8 + doc_id % 8 AS height,
        |  (doc_id + f) % 256 AS red,
        |  (doc_id * 3 + f) % 256 AS green,
        |  (doc_id * 5 + f) % 256 AS blue
        |FROM documents, UNNEST(range(0, 2 + doc_id % 7, 2)) AS t(f)""".stripMargin,
    "mm_frames_mjpeg" ->
      """SELECT doc_id AS asset_id, f AS frame_index,
        |  8 + doc_id % 16 AS width, 8 + doc_id % 8 AS height
        |FROM documents, UNNEST(range(0, 2 + doc_id % 5, 2)) AS t(f)""".stripMargin,
    "mm_features" ->
      """SELECT doc_id AS asset_id,
        |  CAST(8 + doc_id % 57 AS DOUBLE) AS f_width,
        |  CAST(8 + (doc_id // 7) % 57 AS DOUBLE) AS f_height,
        |  CAST(doc_id % 256 AS DOUBLE) AS f_mean_r,
        |  CAST((doc_id * 7) % 256 AS DOUBLE) AS f_mean_g,
        |  CAST((doc_id * 13) % 256 AS DOUBLE) AS f_mean_b
        |FROM documents""".stripMargin,
    // the spec's published murmur3 hash constants (Iceberg spec Appendix B;
    // mirrored at reference icelake/src/types/transform/bucket.rs:158-231)
    // — DuckDB derives bucket = (hash & MaxInt) % N independently
    "t_bucket_transforms" ->
      """SELECT case_name, (h & 2147483647) % 16 AS b16, (h & 2147483647) % 7 AS b7
        |FROM (VALUES
        |  ('int_34', 2017239379),
        |  ('long_34', 2017239379),
        |  ('decimal_14_20', -500754589),
        |  ('date_2017_11_16', -653330422),
        |  ('ts_2017_11_16_22_31_08', -2047944441),
        |  ('string_iceberg', 1210000089),
        |  ('uuid_f79c3e09', 1488055340),
        |  ('binary_00010203', -188683207)) AS t(case_name, h)""".stripMargin,
    "ann_brute_force" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])) DESC,
        |        c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 4)
        |WHERE rank <= 5""".stripMargin,
    // brute truth + kmeans-cell probe-1 candidates + intersection count
    "ann_recall" ->
      """WITH truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                        CAST(c.embedding AS DOUBLE[])) DESC,
        |          c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id < 8)
        |  WHERE rank <= 5),
        |qz AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM qz WHERE vec_id < 4),
        |d0 AS (SELECT qz.vec_id, qz.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c0.c[i]) * (qz.e[i] - c0.c[i]))) AS dist
        |  FROM qz CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT qz.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c1.c[i]) * (qz.e[i] - c1.c[i]))) AS dist
        |  FROM qz CROSS JOIN c1),
        |cells AS (SELECT vec_id, cid AS cluster FROM (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT qc.vec_id AS query_id, cc.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY qc.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q2.embedding AS DOUBLE[]),
        |                                        CAST(c2.embedding AS DOUBLE[])) DESC,
        |          cc.vec_id) AS rank
        |    FROM cells qc
        |    JOIN cells cc ON qc.cluster = cc.cluster
        |      AND qc.vec_id <> cc.vec_id
        |    JOIN embeddings q2 ON q2.vec_id = qc.vec_id
        |    JOIN embeddings c2 ON c2.vec_id = cc.vec_id
        |    WHERE qc.vec_id < 8)
        |  WHERE rank <= 5),
        |hits AS (
        |  SELECT t.query_id, CAST(count(*) AS BIGINT) AS hits
        |  FROM truth t JOIN cand USING (query_id, neighbor_id)
        |  GROUP BY t.query_id)
        |SELECT q.vec_id AS query_id, coalesce(h.hits, 0) AS hits,
        |  coalesce(h.hits, 0)::DOUBLE / 5 AS recall
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) q
        |LEFT JOIN hits h ON h.query_id = q.vec_id""".stripMargin,
    // multiprobe replica: the ann_recall k-means CTEs, plus per-query
    // cell ranking by exact integer centroid distance and the
    // {1,2,4}-probe sweep — candidates carry their cell's probe rank
    "ann_multiprobe" ->
      """WITH truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                        CAST(c.embedding AS DOUBLE[])) DESC,
        |          c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id < 8)
        |  WHERE rank <= 5),
        |qz AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM qz WHERE vec_id < 4),
        |d0 AS (SELECT qz.vec_id, qz.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c0.c[i]) * (qz.e[i] - c0.c[i]))) AS dist
        |  FROM qz CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT qz.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c1.c[i]) * (qz.e[i] - c1.c[i]))) AS dist
        |  FROM qz CROSS JOIN c1),
        |cells AS (SELECT vec_id, cid AS cluster FROM (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1),
        |qcells AS (SELECT vec_id AS qid, cid AS cluster,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)
        |      AS crank
        |  FROM d1 WHERE vec_id < 8),
        |probes AS (SELECT unnest([1, 2, 4]) AS nprobe),
        |cand AS (
        |  SELECT p.nprobe, qc.qid AS query_id, cc.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(q2.embedding AS DOUBLE[]),
        |                           CAST(c2.embedding AS DOUBLE[])) AS cos
        |  FROM qcells qc JOIN probes p ON qc.crank <= p.nprobe
        |  JOIN cells cc ON cc.cluster = qc.cluster AND cc.vec_id <> qc.qid
        |  JOIN embeddings q2 ON q2.vec_id = qc.qid
        |  JOIN embeddings c2 ON c2.vec_id = cc.vec_id),
        |top AS (SELECT nprobe, query_id, neighbor_id FROM (
        |    SELECT nprobe, query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank
        |    FROM cand) WHERE rank <= 5),
        |nc AS (SELECT nprobe, query_id, CAST(count(*) AS BIGINT) AS n_cand
        |  FROM cand GROUP BY 1, 2),
        |hits AS (SELECT t.nprobe, t.query_id,
        |    CAST(count(*) AS BIGINT) AS hits
        |  FROM top t JOIN truth tr ON t.query_id = tr.query_id
        |    AND t.neighbor_id = tr.neighbor_id
        |  GROUP BY 1, 2)
        |SELECT CAST(p.nprobe AS BIGINT) AS nprobe, q.vec_id AS query_id,
        |  coalesce(nc.n_cand, 0) AS n_cand, coalesce(h.hits, 0) AS hits,
        |  coalesce(h.hits, 0)::DOUBLE / 5 AS recall
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) q
        |CROSS JOIN probes p
        |LEFT JOIN nc ON nc.nprobe = p.nprobe AND nc.query_id = q.vec_id
        |LEFT JOIN hits h ON h.nprobe = p.nprobe AND h.query_id = q.vec_id""".stripMargin,
    // beam replica: the same k-means cells, the embed_knn_graph edge
    // convention (cell-local top-5 by integer dot), then the ENTIRE
    // walk replayed — entry at the cell rep, three beam-of-8 layers as
    // chained CTEs, final top-3 excluding self
    "ann_beam" -> beamWalkSql,
    // the persisted-index walk is the SAME integer walk (vectors and
    // edges read back from the id-bucketed graft tables instead of a
    // cached frame), so the replica is shared verbatim
    "ann_beam_index" -> beamWalkSql,
    "ann_hard_negatives" ->
      """SELECT anchor_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS anchor_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])) DESC,
        |        c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id <> c.vec_id AND q.label <> c.label
        |  WHERE q.vec_id < 4)
        |WHERE rank <= 3""".stripMargin,
    "ann_ivf" ->
      """SELECT vec_id + 1000000 AS query_id, vec_id AS neighbor_id, 1 AS rank
        |FROM embeddings WHERE vec_id < 4""".stripMargin,
    "ann_ivf_centroids" ->
      """SELECT vec_id + 1000000 AS query_id, vec_id AS neighbor_id, 1 AS rank
        |FROM embeddings WHERE vec_id < 4""".stripMargin,
    "ann_ivf_pq" ->
      """SELECT vec_id + 1000000 AS query_id, vec_id AS neighbor_id, 1 AS rank
        |FROM embeddings WHERE vec_id < 4""".stripMargin,
    "ann_filtered" ->
      """SELECT vec_id + 1000000 AS query_id, vec_id AS neighbor_id, 1 AS rank
        |FROM (SELECT vec_id FROM embeddings WHERE label % 2 = 0
        |      ORDER BY vec_id LIMIT 4)""".stripMargin,
    "ann_ivf_index" ->
      """SELECT vec_id + 1000000 AS query_id, vec_id AS neighbor_id, 1 AS rank
        |FROM embeddings WHERE vec_id < 4""".stripMargin,
    // planted sources 0,2 live in the built generation and 1,3 in the
    // appended batch — the probe must find all four at rank 1
    "ann_index_update" ->
      """SELECT vec_id + 1000000 AS query_id, vec_id AS neighbor_id, 1 AS rank
        |FROM embeddings WHERE vec_id < 4""".stripMargin,
    // same planted-match contract with the odd half arriving via the
    // streaming micro-batch path
    "stream_ann_index" ->
      """SELECT vec_id + 1000000 AS query_id, vec_id AS neighbor_id, 1 AS rank
        |FROM embeddings WHERE vec_id < 4""".stripMargin,
    "dedup_embedding" ->
      """WITH av AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    CAST(list_transform(embedding,
        |      x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS DOUBLE[])
        |  FROM embeddings WHERE vec_id < 10)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM av a JOIN av b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.95""".stripMargin,
    "dedup_components" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |pr AS (SELECT a, b FROM p WHERE jaccard >= 0.4),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id)
        |SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id""".stripMargin,
    // exact cross-batch near-dup existence: a new (odd-id) doc is a dup
    // iff SOME indexed (even-id) doc reaches the jaccard threshold —
    // same text-bigram shingle convention as dedup_components
    "dedup_incremental" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |old AS (SELECT * FROM s WHERE doc_id % 2 = 0),
        |new_b AS (SELECT * FROM s WHERE doc_id % 2 = 1),
        |hit AS (
        |  SELECT n.doc_id FROM new_b n JOIN old o
        |    ON CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
        |      / (len(n.sh) + len(o.sh) - len(list_intersect(n.sh, o.sh))) >= 0.4
        |  GROUP BY n.doc_id)
        |SELECT n.doc_id, h.doc_id IS NOT NULL AS is_dup
        |FROM new_b n LEFT JOIN hit h ON n.doc_id = h.doc_id""".stripMargin,
    // same component CTE as dedup_components, extended with cluster
    // sizes; docs outside any pair default to weight 1
    "dedup_softweight" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |pr AS (SELECT a, b FROM p WHERE jaccard >= 0.4),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id),
        |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
        |sizes AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY component)
        |SELECT d.doc_id,
        |  round(1.0 / COALESCE(csize, 1), 6) AS weight
        |FROM documents d
        |LEFT JOIN (SELECT doc_id, csize FROM comp JOIN sizes USING (component)) c
        |  ON d.doc_id = c.doc_id""".stripMargin,
    // exact cross-batch cosine existence (same float-jitter convention
    // as dedup_semantic; reversed vectors are the planted non-dups)
    "dedup_incremental_embed" ->
      """WITH av AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |nb AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    CAST(list_transform(embedding,
        |      x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 10
        |  UNION ALL
        |  SELECT vec_id + 2000000 AS vec_id,
        |    CAST(list_reverse(embedding) AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 20),
        |hit AS (
        |  SELECT n.vec_id FROM nb n JOIN av o
        |    ON list_cosine_similarity(n.e, o.e) >= 0.95
        |  GROUP BY n.vec_id)
        |SELECT n.vec_id AS id, h.vec_id IS NOT NULL AS is_dup
        |FROM nb n LEFT JOIN hit h ON n.vec_id = h.vec_id""".stripMargin,
    "dedup_semantic" ->
      """WITH RECURSIVE av AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    CAST(list_transform(embedding,
        |      x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS DOUBLE[])
        |  FROM embeddings WHERE vec_id < 10),
        |pr AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM av a JOIN av b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.e, b.e) >= 0.95),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        |SELECT vec_id FROM av
        |WHERE vec_id NOT IN (SELECT id FROM comp WHERE component <> id)""".stripMargin,
    // exact-substring coverage replica: same md5/16 gram hashes, same
    // window identity (each duplicated start covers min(gap, k) tokens —
    // interval union without interval state)
    "dedup_substrings" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |    substr(md5(array_to_string(tk[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 6, 1))) AS t(i)),
        |dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
        |win AS (
        |  SELECT doc_id, s,
        |    s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS gap
        |  FROM grams WHERE h IN (SELECT h FROM dup)),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
        |    CAST(SUM(CASE WHEN gap IS NULL THEN 8 ELSE LEAST(gap, 8) END) AS BIGINT)
        |      AS covered_tokens,
        |    CAST(SUM(CASE WHEN gap IS NULL OR gap > 8 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_spans
        |  FROM win GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |  coalesce(n_dup_grams, 0) AS n_dup_grams,
        |  coalesce(covered_tokens, 0) AS covered_tokens,
        |  coalesce(n_spans, 0) AS n_spans,
        |  CASE WHEN len(tk) > 0
        |    THEN round(coalesce(covered_tokens, 0) / CAST(len(tk) AS DOUBLE), 6)
        |    ELSE 0.0 END AS dup_frac
        |FROM toks t LEFT JOIN agg USING (doc_id)""".stripMargin,
    // removal replica: same duplicated starts, same union-stream
    // running-max window (start events sort before the token at the
    // same position), survivors re-joined in order
    "dedup_substrings_cut" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i AS INT)] AS tok
        |  FROM toks, UNNEST(range(1, len(tk) + 1)) AS t(i)),
        |grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |    substr(md5(array_to_string(tk[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 6, 1))) AS t(i)),
        |dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
        |hits AS (SELECT doc_id, s FROM grams WHERE h IN (SELECT h FROM dup)),
        |ev AS (
        |  SELECT doc_id, s AS pos, 0 AS kind, s, NULL AS tok FROM hits
        |  UNION ALL
        |  SELECT doc_id, pos, 1 AS kind, NULL AS s, tok FROM tok),
        |m AS (
        |  SELECT doc_id, pos, kind, tok,
        |    MAX(s) OVER (PARTITION BY doc_id ORDER BY pos, kind
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_s
        |  FROM ev)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN last_s IS NULL OR pos - last_s >= 8
        |    THEN 1 ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  coalesce(string_agg(CASE WHEN last_s IS NULL OR pos - last_s >= 8
        |    THEN tok END, ' ' ORDER BY pos), '') AS cleaned_text
        |FROM m WHERE kind = 1 GROUP BY doc_id""".stripMargin,
    // winnowing replica: window-min over md5/8 gram hashes (fixed-width
    // hex compares lexicographically = numerically), same 2..200 bucket
    // cap before pair generation
    "dedup_winnow" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(len(tk) - 2, 1)), i ->
        |      substr(md5(array_to_string(tk[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')), 1, 8)) AS hs
        |  FROM toks),
        |fps AS (
        |  SELECT DISTINCT doc_id, fp FROM (
        |    SELECT doc_id,
        |      list_aggregate(hs[CAST(j AS INT):CAST(j + 3 AS INT)], 'min') AS fp
        |    FROM grams, UNNEST(range(1, greatest(len(hs) - 2, 2))) AS t(j))
        |  WHERE fp IS NOT NULL),
        |ok AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 200),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
        |  WHERE x.fp IN (SELECT fp FROM ok))
        |SELECT a, b, CAST(count(*) AS BIGINT) AS shared_fps
        |FROM pairs GROUP BY a, b HAVING count(*) >= 2""".stripMargin,
    "text_bm25" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS t
        |  FROM documents),
        |d2 AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM d),
        |g AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN list_contains(t, 'data') THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN list_contains(t, 'query') THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS df2
        |  FROM d2),
        |tf AS (
        |  SELECT doc_id, dl,
        |    CAST(len(list_filter(t, x -> x = 'data')) AS DOUBLE) AS tf0,
        |    CAST(len(list_filter(t, x -> x = 'query')) AS DOUBLE) AS tf1,
        |    CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) AS tf2
        |  FROM d2)
        |SELECT doc_id,
        |  round(
        |    ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2)
        |      / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2)
        |      / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2)
        |      / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |FROM tf, g""".stripMargin,
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(
        |    nfc_normalize('e' || chr(769) || ' ' || chr(1) || ' ' || text
        |                  || ' ' || chr(9) || 'x' || chr(7) || 'y '),
        |    '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS norm_chars
        |FROM n""".stripMargin,
    "text_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>d</title><style>p {color: red}</style>'
        |    || '<script type="text/javascript">var x = 1 && 2 < 3;</script>'
        |    || '</head><body><!-- crawl: header --><h1 class="t">' || source
        |    || '</h1>' || chr(10) || '<p>' || text
        |    || '</p><br/><div>footer &amp; legal&nbsp;&lt;fine&gt;</div></body></html>'
        |      AS html
        |  FROM documents)
        |SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      html,
        |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g'),
        |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', chr(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g')) AS text
        |FROM h""".stripMargin,
    "search_hybrid" ->
      """WITH dense AS (
        |  SELECT query_id, id, dr FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                        CAST(c.embedding AS DOUBLE[])) DESC,
        |          c.vec_id) AS dr
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id IN (0, 1, 2))
        |  WHERE dr <= 20),
        |d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS t
        |  FROM documents),
        |d2 AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM d),
        |g0 AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN list_contains(t, 'data') THEN 1 ELSE 0 END) AS dfa,
        |    sum(CASE WHEN list_contains(t, 'query') THEN 1 ELSE 0 END) AS dfb,
        |    sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS dfc
        |  FROM d2),
        |g1 AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END) AS dfa,
        |    sum(CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END) AS dfb,
        |    sum(CASE WHEN list_contains(t, 'merge') THEN 1 ELSE 0 END) AS dfc
        |  FROM d2),
        |g2 AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN list_contains(t, 'stream') THEN 1 ELSE 0 END) AS dfa,
        |    sum(CASE WHEN list_contains(t, 'window') THEN 1 ELSE 0 END) AS dfb,
        |    sum(CASE WHEN list_contains(t, 'batch') THEN 1 ELSE 0 END) AS dfc
        |  FROM d2),
        |s0 AS (
        |  SELECT CAST(0 AS BIGINT) AS query_id, doc_id AS id,
        |    round(
        |      ln((n - dfa + 0.5) / (dfa + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'data')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'data')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |      + ln((n - dfb + 0.5) / (dfb + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'query')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'query')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |      + ln((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |  FROM d2, g0 ORDER BY bm25 DESC, id LIMIT 20),
        |s1 AS (
        |  SELECT CAST(1 AS BIGINT) AS query_id, doc_id AS id,
        |    round(
        |      ln((n - dfa + 0.5) / (dfa + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |      + ln((n - dfb + 0.5) / (dfb + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'hash')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'hash')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |      + ln((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'merge')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'merge')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |  FROM d2, g1 ORDER BY bm25 DESC, id LIMIT 20),
        |s2 AS (
        |  SELECT CAST(2 AS BIGINT) AS query_id, doc_id AS id,
        |    round(
        |      ln((n - dfa + 0.5) / (dfa + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'stream')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'stream')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |      + ln((n - dfb + 0.5) / (dfb + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'window')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'window')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |      + ln((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
        |        * (CAST(len(list_filter(t, x -> x = 'batch')) AS DOUBLE) * 2.2)
        |        / (CAST(len(list_filter(t, x -> x = 'batch')) AS DOUBLE)
        |           + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |  FROM d2, g2 ORDER BY bm25 DESC, id LIMIT 20),
        |sparse AS (
        |  SELECT query_id, id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY bm25 DESC, id) AS sr
        |  FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1
        |        UNION ALL SELECT * FROM s2)),
        |fused AS (
        |  SELECT COALESCE(dense.query_id, sparse.query_id) AS query_id,
        |         COALESCE(dense.id, sparse.id) AS id, dr, sr
        |  FROM dense FULL OUTER JOIN sparse
        |    ON dense.query_id = sparse.query_id AND dense.id = sparse.id),
        |r AS (
        |  SELECT query_id, id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
        |      COALESCE(1.0 / (60 + dr), 0) + COALESCE(1.0 / (60 + sr), 0)
        |        DESC, id) AS fused_rank,
        |    COALESCE(dr, 0) AS dense_rank, COALESCE(sr, 0) AS sparse_rank
        |  FROM fused)
        |SELECT query_id, id AS doc_id, fused_rank, dense_rank, sparse_rank
        |FROM r WHERE fused_rank <= 10""".stripMargin,
    "text_topngrams" ->
      """WITH w AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> length(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT unnest(list_transform(range(1, len(t) - 0),
        |    i -> t[i] || ' ' || t[i + 1])) AS ngram
        |  FROM w WHERE len(t) >= 2)
        |SELECT ngram, COUNT(*) AS freq FROM grams
        |GROUP BY ngram ORDER BY freq DESC, ngram LIMIT 50""".stripMargin,
    // exact replica of Selection.charLmNll: add-one-smoothed char-trigram
    // log-probs quantized to integer micro-nats (order-independent long
    // sums), model kept at count >= 2, OOV = ln(1/(T+V+1))
    "text_perplexity" ->
      """WITH tg AS (
        |  SELECT doc_id, (lang = 'en') AS is_t,
        |    unnest(list_transform(range(1, length(lower(text)) - 1),
        |      i -> substr(lower(text), CAST(i AS INT), 3))) AS g
        |  FROM documents WHERE length(text) >= 3),
        |model AS (SELECT g, COUNT(*) AS c FROM tg WHERE is_t GROUP BY g),
        |stats AS (SELECT CAST(SUM(c) AS DOUBLE) AS T,
        |                 CAST(COUNT(*) AS DOUBLE) AS V FROM model),
        |kept AS (
        |  SELECT g, CAST(round(ln((c + 1.0) / (T + V + 1.0)) * 1000000) AS BIGINT) AS lm
        |  FROM model, stats WHERE c >= 2),
        |oov AS (SELECT CAST(round(ln(1.0 / (T + V + 1.0)) * 1000000) AS BIGINT) AS lm
        |        FROM stats)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  round(-(CAST(SUM(COALESCE(kept.lm, (SELECT lm FROM oov))) AS DOUBLE)
        |    / 1000000) / COUNT(*), 6) AS nll
        |FROM tg LEFT JOIN kept USING (g)
        |GROUP BY doc_id""".stripMargin,
    // BPE merges are iterative (not SQL-expressible), so the oracle is a
    // committed FIXTURE generated by an independent pure-Python
    // implementation of the same algorithm (tools/gen_bpe_fixture.py) —
    // two from-scratch implementations must agree byte-for-byte.
    // Regenerate the fixture if documents.parquet regenerates.
    "text_bpe" ->
      """SELECT doc_id, n_bpe_tokens, preview
        |FROM read_parquet('/root/repo/fixtures/text_bpe_expected.parquet')""".stripMargin,
    // exact replica of Selection.dsirWeights: md5-hex-digit buckets,
    // add-one-smoothed log-ratios rounded to 6dp, score = the same fixed
    // left-to-right literal-weighted chain (list_sum in list order)
    "text_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS is_t,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |bc AS (
        |  SELECT doc_id, is_t, len(tk) AS n,
        |    list_transform(range(0, 16), i ->
        |      CAST(len(list_filter(tk,
        |        w -> substr(md5(w), 1, 1) = substr('0123456789abcdef', CAST(i AS INT) + 1, 1)))
        |      AS BIGINT)) AS c
        |  FROM toks),
        |persum AS (
        |  SELECT i,
        |    CAST(SUM(CASE WHEN is_t THEN c[CAST(i AS INT) + 1] ELSE 0 END) AS BIGINT) AS ti,
        |    CAST(SUM(c[CAST(i AS INT) + 1]) AS BIGINT) AS ri
        |  FROM bc, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY i),
        |sums AS (SELECT list(ti ORDER BY i) AS t, list(ri ORDER BY i) AS r FROM persum),
        |ratios AS (
        |  SELECT list_transform(range(0, 16), i ->
        |    round(ln(((t[CAST(i AS INT) + 1] + 1.0) / (list_sum(t) + 16.0))
        |           / ((r[CAST(i AS INT) + 1] + 1.0) / (list_sum(r) + 16.0))), 6)) AS rr
        |  FROM sums)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  round(list_sum(list_transform(range(0, 16), i ->
        |    CAST(c[CAST(i AS INT) + 1] AS DOUBLE) * rr[CAST(i AS INT) + 1])), 6) AS dsir_score
        |FROM bc, ratios""".stripMargin,
    // CCNet line-dedup replica: same 8-token re-lining, boilerplate =
    // line in >= 2 distinct docs, docs re-assembled from surviving lines
    // in order (empty string when every line was boilerplate)
    "text_linededup" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, i,
        |    array_to_string(tk[(CAST(i AS INT) * 8 + 1):(CAST(i AS INT) * 8 + 8)], ' ') AS line
        |  FROM toks, UNNEST(range(0, ((len(tk) - 1) // 8) + 1)) AS t(i)),
        |boiler AS (
        |  SELECT line FROM lined GROUP BY line
        |  HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY i) AS cleaned_text
        |  FROM lined WHERE line NOT IN (SELECT line FROM boiler)
        |  GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(((len(tk) - 1) // 8) + 1 AS BIGINT) AS n_lines,
        |  coalesce(n_kept, 0) AS n_kept,
        |  coalesce(cleaned_text, '') AS cleaned_text
        |FROM toks t LEFT JOIN kept USING (doc_id)""".stripMargin,
    // same planted tail, same half split, the langid stopword vote
    // replayed per half
    "text_langmix" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 19 = 0 THEN
        |      text || repeat(' le la de et est une', 200)
        |    ELSE text END AS text
        |  FROM documents),
        |base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |  FROM d),
        |h AS (
        |  SELECT doc_id, 'a' AS side, w[1:(len(w) // 2)] AS hw FROM base
        |  UNION ALL
        |  SELECT doc_id, 'b', w[(len(w) // 2) + 1:len(w)] FROM base),
        |sc AS (SELECT doc_id, side,
        |    len(list_filter(hw, x -> x IN ('the','and','of','to','is','in','that','it','was','for','with','not','this'))) AS s_en,
        |    len(list_filter(hw, x -> x IN ('le','la','les','de','des','et','est','une','un','dans','que','pour','pas'))) AS s_fr,
        |    len(list_filter(hw, x -> x IN ('el','la','los','las','de','y','es','en','que','un','una','por','con','no'))) AS s_es,
        |    len(list_filter(hw, x -> x IN ('der','die','das','und','ist','in','von','den','mit','nicht','ein','eine','zu'))) AS s_de,
        |    len(list_filter(hw, x -> x IN ('il','la','di','che','e','un','una','per','non','sono','con','del'))) AS s_it,
        |    len(list_filter(hw, x -> x IN ('o','a','os','as','de','que','e','um','uma','para','com','nao'))) AS s_pt
        |  FROM h),
        |l AS (SELECT doc_id, side,
        |  CASE WHEN GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) = 0 THEN 'und'
        |       WHEN s_en = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'en'
        |       WHEN s_fr = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'fr'
        |       WHEN s_es = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'es'
        |       WHEN s_de = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'de'
        |       WHEN s_it = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'it'
        |       ELSE 'pt' END AS lang
        |  FROM sc),
        |p AS (SELECT doc_id,
        |    max(CASE WHEN side = 'a' THEN lang END) AS lang_a,
        |    max(CASE WHEN side = 'b' THEN lang END) AS lang_b
        |  FROM l GROUP BY doc_id)
        |SELECT doc_id, lang_a, lang_b,
        |  lang_a <> lang_b AND lang_a <> 'und' AND lang_b <> 'und' AS mixed
        |FROM p""".stripMargin,
    // same planted corruption suffix (chr() codepoints), same RE2-safe
    // signature patterns; // keeps the halved counts integer
    "text_mojibake" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN
        |      text || ' caf' || chr(195) || chr(169) || ' x' || chr(226)
        |        || chr(8364) || chr(8482) || 'y z' || chr(65533) || 'w '
        |        || chr(7)
        |    ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(t) - length(regexp_replace(t, '\x{FFFD}', '', 'g'))
        |    AS BIGINT) AS n_replacement,
        |  CAST((length(t) - length(regexp_replace(t,
        |    '\x{00C3}[\x{0080}-\x{00BF}]', '', 'g'))) // 2 AS BIGINT)
        |    AS n_latin1_sigs,
        |  CAST((length(t) - length(regexp_replace(t, '\x{00E2}\x{20AC}',
        |    '', 'g'))) // 2 AS BIGINT) AS n_quote_sigs,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[\x{0001}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]',
        |    '', 'g')) AS BIGINT) AS n_control,
        |  (length(t) - length(regexp_replace(t, '\x{FFFD}', '', 'g')))
        |    + (length(t) - length(regexp_replace(t,
        |        '\x{00C3}[\x{0080}-\x{00BF}]', '', 'g'))) // 2
        |    + (length(t) - length(regexp_replace(t, '\x{00E2}\x{20AC}',
        |        '', 'g'))) // 2
        |    + (length(t) - length(regexp_replace(t,
        |        '[\x{0001}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]',
        |        '', 'g'))) > 0 AS suspect
        |FROM d""".stripMargin,
    // same re-lining + planted first-line repeat, then the duplicate-line
    // filter replayed with DuckDB's 1-based lambda index
    "text_derep" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |lined AS (
        |  SELECT doc_id, list_transform(range(0, ((len(tk) - 1) // 6) + 1),
        |      i -> array_to_string(
        |        tk[(CAST(i AS INT) * 6 + 1):(CAST(i AS INT) * 6 + 6)], ' '))
        |    AS ls
        |  FROM toks),
        |sp AS (SELECT doc_id,
        |    string_split(array_to_string(ls, chr(10)) || chr(10) || ls[1],
        |      chr(10)) AS l
        |  FROM lined),
        |k AS (SELECT doc_id, l,
        |    list_filter(l, (x, i) -> length(trim(x)) = 0
        |      OR coalesce(list_position(l[1:i-1], x), 0) = 0) AS kept
        |  FROM sp)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS cleaned_text,
        |  CAST(len(l) AS BIGINT) AS n_lines,
        |  CAST(len(l) - len(kept) AS BIGINT) AS n_removed
        |FROM k""".stripMargin,
    // NB classifier replica: same md5 bucket hashing, same micro-nat
    // weight quantization (round() = half away from zero, matching the
    // Scala micro()), LONG dot product so sums are order-exact
    "text_nb_classify" ->
      """WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS pos, (doc_id % 3 = 0) AS tr,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |bc AS (
        |  SELECT doc_id, pos, tr,
        |    list_transform(range(0, 16), i ->
        |      CAST(len(list_filter(tk,
        |        w -> substr(md5(w), 1, 1) = substr('0123456789abcdef', CAST(i AS INT) + 1, 1)))
        |      AS BIGINT)) AS c
        |  FROM toks),
        |persum AS (
        |  SELECT i,
        |    CAST(SUM(CASE WHEN tr AND pos THEN c[CAST(i AS INT) + 1] ELSE 0 END) AS BIGINT) AS pi,
        |    CAST(SUM(CASE WHEN tr AND NOT pos THEN c[CAST(i AS INT) + 1] ELSE 0 END) AS BIGINT) AS ni
        |  FROM bc, (SELECT unnest(range(0, 16)) AS i)
        |  GROUP BY i),
        |dcnt AS (
        |  SELECT CAST(SUM(CASE WHEN tr AND pos THEN 1 ELSE 0 END) AS BIGINT) AS dp,
        |         CAST(SUM(CASE WHEN tr AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS dn
        |  FROM bc),
        |sums AS (SELECT list(pi ORDER BY i) AS p, list(ni ORDER BY i) AS n FROM persum),
        |wts AS (
        |  SELECT list_transform(range(0, 16), i ->
        |    CAST(round((ln((p[CAST(i AS INT) + 1] + 1.0) / (list_sum(p) + 16.0))
        |              - ln((n[CAST(i AS INT) + 1] + 1.0) / (list_sum(n) + 16.0))) * 1e6)
        |    AS BIGINT)) AS w,
        |    (SELECT CAST(round(ln((dp + 1.0) / (dn + 1.0)) * 1e6) AS BIGINT) FROM dcnt) AS prior
        |  FROM sums),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 16), i ->
        |      c[CAST(i AS INT) + 1] * w[CAST(i AS INT) + 1])) + prior AS BIGINT) AS lm
        |  FROM bc, wts)
        |SELECT doc_id, round(lm / 1e6, 6) AS nb_logit, lm > 0 AS nb_pred
        |FROM scored""".stripMargin,
    // exact replica of Selection.mixtureSample over Sampling's md5
    // threshold: per-source keep-rate min(1, budget*w*T/tok), threshold
    // printf('%04x', round(rate*65536)), same md5-prefix comparison
    "sample_mixture" ->
      """WITH hist AS (
        |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS tok
        |  FROM documents GROUP BY source),
        |w AS (SELECT * FROM (VALUES ('src0', 0.2), ('src1', 0.3), ('src2', 0.5)) AS t(source, wt)),
        |tot AS (SELECT SUM(tok) AS T FROM hist),
        |rates AS (
        |  SELECT w.source, LEAST(1.0, 0.1 * wt * T / tok) AS rate
        |  FROM w JOIN hist ON w.source = hist.source, tot),
        |thr AS (
        |  SELECT source,
        |    CASE WHEN rate >= 1.0 OR CAST(round(rate * 65536) AS BIGINT) >= 65536
        |         THEN 'g'
        |         ELSE printf('%04x', CAST(round(rate * 65536) AS BIGINT)) END AS h
        |  FROM rates)
        |SELECT doc_id, d.source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents d JOIN thr ON d.source = thr.source
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < h""".stripMargin,
    "sample_temperature" ->
      """WITH hist AS (
        |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS tok
        |  FROM documents GROUP BY source),
        |pw AS (SELECT source, tok, pow(tok, 1.0/0.7) AS pk FROM hist),
        |tot AS (SELECT SUM(tok) AS ttot, SUM(pk) AS psum FROM pw),
        |rates AS (
        |  SELECT source, LEAST(1.0, 0.1 * (pk / psum) * ttot / tok) AS rate
        |  FROM pw, tot),
        |thr AS (
        |  SELECT source,
        |    CASE WHEN rate >= 1.0 OR CAST(round(rate * 65536) AS BIGINT) >= 65536
        |         THEN 'g'
        |         ELSE printf('%04x', CAST(round(rate * 65536) AS BIGINT)) END AS h
        |  FROM rates)
        |SELECT doc_id, d.source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents d JOIN thr ON d.source = thr.source
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < h""".stripMargin,
    // exact replica of Selection.classifierAuc: tie-corrected
    // Mann-Whitney over score groups, numerator as the INTEGER 2U
    // (order-independent in both engines), one division at the end
    "select_auc" ->
      """WITH g AS (
        |  SELECT CAST(length(text) AS DOUBLE) AS s,
        |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
        |    SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
        |  FROM documents GROUP BY 1),
        |pre AS (
        |  SELECT s, pos, neg,
        |    COALESCE(SUM(neg) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |  FROM g)
        |SELECT
        |  round(CAST(SUM(pos * (2 * nb + neg)) AS DOUBLE)
        |    / (2.0 * SUM(pos) * SUM(neg)), 6) AS auc,
        |  CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(SUM(neg) AS BIGINT) AS n_neg
        |FROM pre""".stripMargin,
    // exact replica of Sampling.stratifiedSampleExact: the k smallest
    // (md5(key), key) per stratum — the salted two-stage form selects
    // the same rows as the direct window
    // kmeans oracle CTEs + exact-25 per cluster by md5 rank
    "sample_diverse" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM q WHERE vec_id < 4),
        |d0 AS (SELECT q.vec_id, q.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c0.c[i]) * (q.e[i] - c0.c[i]))) AS dist
        |  FROM q CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT q.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c1.c[i]) * (q.e[i] - c1.c[i]))) AS dist
        |  FROM q CROSS JOIN c1),
        |asg AS (SELECT vec_id, cid AS cluster FROM (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1)
        |SELECT vec_id, cluster FROM (
        |  SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |  FROM asg) WHERE rn <= 25""".stripMargin,
    "sample_stratified_k" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 5""".stripMargin,
    // exact replica of Selection.mixtureSampleEpochs: same rate formula
    // (no 1.0 cap, LEAST(maxEpochs)), floor -> full copies, md5-prefix
    // threshold on the FRACTIONAL part -> one extra, epoch = copy index
    "sample_epochs" ->
      """WITH hist AS (
        |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS tok
        |  FROM documents GROUP BY source),
        |w AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)) AS t(source, wt)),
        |tot AS (SELECT SUM(tok) AS T FROM hist),
        |rates AS (
        |  SELECT w.source, LEAST(3.0, 0.5 * wt * T / tok) AS rate
        |  FROM w JOIN hist ON w.source = hist.source, tot),
        |spec AS (
        |  SELECT source, CAST(floor(rate) AS BIGINT) AS cfull,
        |    rate - floor(rate) AS frac FROM rates),
        |thr AS (
        |  SELECT source, cfull,
        |    CASE WHEN frac >= 1.0 OR CAST(round(frac * 65536) AS BIGINT) >= 65536
        |         THEN 'g'
        |         ELSE printf('%04x', CAST(round(frac * 65536) AS BIGINT)) END AS h
        |  FROM spec),
        |base AS (
        |  SELECT d.doc_id, d.source,
        |    cfull + (CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < h
        |             THEN 1 ELSE 0 END) AS n
        |  FROM documents d JOIN thr ON d.source = thr.source)
        |SELECT doc_id, source, CAST(unnest(range(n)) AS BIGINT) AS epoch
        |FROM base WHERE n > 0""".stripMargin,
    "dedup_resolve" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |pr AS (SELECT a, b FROM p WHERE jaccard >= 0.4),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE component <> id)""".stripMargin,
    // the dedup_resolve recursive-CTE components + a per-source rollup
    "dedup_stats" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |pr AS (SELECT a, b FROM p WHERE jaccard >= 0.4),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |k AS (SELECT doc_id, source,
        |    CASE WHEN doc_id NOT IN (SELECT id FROM comp WHERE component <> id)
        |      THEN 1 ELSE 0 END AS kept
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(kept) AS BIGINT) AS kept,
        |  CAST(count(*) - sum(kept) AS BIGINT) AS dropped,
        |  (count(*) - sum(kept))::DOUBLE / count(*) AS drop_rate
        |FROM k GROUP BY source""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |      < CASE WHEN lang = 'en' THEN '4000' ELSE '8000' END""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard_id FROM c""".stripMargin,
    // same integer ceilings, one aggregate, two literal rows
    "pack_efficiency" ->
      """WITH t AS (
        |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    AS n
        |  FROM documents),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |    CAST(sum((n + 511) // 512) AS BIGINT) AS seq_per_doc
        |  FROM t)
        |SELECT 'per_doc' AS packer, seq_per_doc AS n_sequences,
        |  seq_per_doc * 512 - total AS pad_tokens,
        |  total::DOUBLE / (seq_per_doc * 512) AS fill_rate
        |FROM a
        |UNION ALL
        |SELECT 'concat_split', (total + 511) // 512,
        |  ((total + 511) // 512) * 512 - total,
        |  total::DOUBLE / (((total + 511) // 512) * 512)
        |FROM a""".stripMargin,
    "pack_concat" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |    AS BIGINT) AS gstart
        |  FROM t WHERE n_tokens > 0),
        |e AS (
        |  SELECT doc_id, gstart, gstart + n_tokens AS gend,
        |    UNNEST(generate_series(gstart // 512, (gstart + n_tokens - 1) // 512))
        |      AS seq_id
        |  FROM c)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |  CAST(GREATEST(gstart, seq_id * 512) - seq_id * 512 AS BIGINT) AS tok_begin,
        |  CAST(LEAST(gend, (seq_id + 1) * 512) - seq_id * 512 AS BIGINT) AS tok_end
        |FROM e""".stripMargin,
    // shard-export replica: same md5(salt ‖ id) order key, same 4-hex
    // shard hash (strpos folds the hex digits the way Spark's conv does)
    "pack_shards" ->
      """WITH h AS (
        |  SELECT doc_id, md5('epoch0 ' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, h,
        |    ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |     + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |     + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 8 AS shard_id
        |  FROM h)
        |SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id,
        |  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id)
        |    AS BIGINT) AS seq
        |FROM sh""".stripMargin,
    // LPT striping replayed as one window (oracle scale); the engine side
    // is the value-bucketed distributed rank
    "pack_balanced" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST((row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % 7
        |    AS BIGINT) AS shard_id
        |FROM s""".stripMargin,
    "decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 2),
        |    i -> list_aggregate(w[i:i+3], 'string_agg', ' ')))) AS ng
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0)
        |SELECT DISTINCT g.doc_id AS doc_id FROM g JOIN bench USING (ng)
        |WHERE g.doc_id % 97 <> 0""".stripMargin,
    // span surgery replayed: positional 4-grams, matched window
    // positions, nested-lambda cut, single-space rebuild
    "decontaminate_cut" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |b AS (SELECT DISTINCT unnest(list_transform(range(1, len(w) - 2),
        |    i -> list_aggregate(w[i:i+3], 'string_agg', ' '))) AS ng
        |  FROM t WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, w FROM t WHERE doc_id % 97 <> 0),
        |g AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |    list_aggregate(w[i:i+3], 'string_agg', ' ') AS ng
        |  FROM tr, UNNEST(range(1, len(w) - 2)) AS r(i)),
        |m AS (SELECT doc_id, list(pos) AS hits FROM g JOIN b USING (ng)
        |  GROUP BY doc_id),
        |k AS (SELECT tr.doc_id, tr.w, coalesce(m.hits, []) AS hits
        |  FROM tr LEFT JOIN m USING (doc_id)),
        |f AS (SELECT doc_id, w, list_filter(w, (x, j) ->
        |    len(list_filter(hits, h -> (j - 1) >= h AND (j - 1) <= h + 3))
        |      = 0) AS kept
        |  FROM k)
        |SELECT doc_id, array_to_string(kept, ' ') AS cleaned_text,
        |  CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(len(w) - len(kept) AS BIGINT) AS n_cut
        |FROM f""".stripMargin,
    // per-suite variant of the decontaminate oracle: same 4-gram
    // convention, suite = 's' || doc_id%3, zero-hit suites kept
    "decontaminate_report" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 2),
        |    i -> list_aggregate(w[i:i+3], 'string_agg', ' ')))) AS ng
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |bg AS (SELECT DISTINCT 's' || CAST(doc_id % 3 AS VARCHAR) AS suite, ng
        |       FROM g WHERE doc_id % 97 = 0),
        |hits AS (
        |  SELECT suite, COUNT(DISTINCT g.doc_id) AS c
        |  FROM g JOIN bg USING (ng) WHERE g.doc_id % 97 <> 0
        |  GROUP BY suite),
        |suites AS (SELECT DISTINCT suite FROM bg),
        |tot AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 97 <> 0)
        |SELECT s.suite,
        |  CAST(COALESCE(h.c, 0) AS BIGINT) AS flagged_docs,
        |  round(CAST(COALESCE(h.c, 0) AS DOUBLE) / n, 6) AS flagged_rate
        |FROM suites s LEFT JOIN hits h ON s.suite = h.suite, tot""".stripMargin,
    // each stage replayed as a CTE: quartile formula, desc prefix-sum
    // budget, chunking law
    "pipeline_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id, text, n_chars,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER () AS n FROM d),
        |b AS (SELECT doc_id FROM r WHERE (4 * (rk - 1)) // n = 3),
        |s AS (SELECT d.doc_id, d.text,
        |    SUM(d.n_tokens) OVER (ORDER BY d.n_chars DESC, d.doc_id)
        |      - d.n_tokens AS cb
        |  FROM d JOIN b USING (doc_id)),
        |k AS (SELECT doc_id, text FROM s WHERE cb < 8000),
        |c AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM k),
        |e AS (SELECT doc_id, w, len(w) AS n,
        |  CASE WHEN len(w) <= 32 THEN 1
        |       ELSE CAST(ceil((len(w) - 32)::DOUBLE / 24) AS BIGINT) + 1
        |  END AS nc FROM c),
        |x AS (SELECT doc_id, w, n, unnest(range(nc)) AS chunk_id FROM e)
        |SELECT doc_id, chunk_id,
        |  array_to_string(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32),
        |    ' ') AS chunk_text,
        |  least(32, n - chunk_id * 24) AS n_tokens
        |FROM x""".stripMargin,
    // exact NTILE-form bucketing: floor(k * (rank-1) / n) over the same
    // (score, id) order
    "text_deciles" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER () AS n
        |  FROM documents)
        |SELECT doc_id, CAST((10 * (rk - 1)) // n AS BIGINT) AS bucket
        |FROM r""".stripMargin,
    // same stopword score, same NTILE-form deciles, cumulative from the
    // top bucket down
    "select_calibration" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> x IN ('the','a','an','and','of','to','in','is','it','that')))
        |      AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+'))
        |      AS score,
        |    lang = 'en' AS pos
        |  FROM documents),
        |r AS (SELECT doc_id, score, pos,
        |    row_number() OVER (ORDER BY score, doc_id) AS rk,
        |    count(*) OVER () AS n
        |  FROM s),
        |b AS (SELECT CAST((10 * (rk - 1)) // n AS BIGINT) AS bucket, pos
        |  FROM r),
        |a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS docs,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM b GROUP BY bucket),
        |c AS (SELECT bucket, docs, pos,
        |    sum(docs) OVER (ORDER BY bucket DESC) AS cdocs,
        |    sum(pos) OVER (ORDER BY bucket DESC) AS cpos,
        |    sum(pos) OVER () AS tpos
        |  FROM a)
        |SELECT bucket, docs, pos,
        |  pos::DOUBLE / docs AS pos_rate,
        |  cpos::DOUBLE / cdocs AS cum_precision,
        |  cpos::DOUBLE / tpos AS cum_recall
        |FROM c""".stripMargin,
    "corpus_stats" ->
      """WITH g AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |      AS n_tokens,
        |    CAST(sum(length(text)) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens, n_chars,
        |  round(n_tokens::DOUBLE / (SELECT sum(n_tokens) FROM g), 6)
        |    AS token_share
        |FROM g""".stripMargin,
    "corpus_overlap" ->
      """WITH all_docs AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 17 = 0),
        |fp AS (SELECT DISTINCT source, md5(text) AS fp FROM all_docs)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS shared_fps
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    // same planted +0.25 shift, same floor-of-integer-mean arithmetic
    "profile_drift" ->
      """WITH u AS (
        |  SELECT list_transform(embedding, x -> x::DOUBLE) AS e,
        |    false AS is_new
        |  FROM embeddings WHERE vec_id % 5 <> 0
        |  UNION ALL
        |  SELECT list_transform(embedding, x -> x::DOUBLE + 0.25),
        |    true
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |x AS (SELECT is_new, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(floor(e[i] * 1024) AS BIGINT) AS v
        |  FROM u CROSS JOIN range(1, 65) t(i)),
        |a AS (SELECT dim,
        |    CAST(floor(sum(CASE WHEN NOT is_new THEN v END)::DOUBLE
        |      / count(CASE WHEN NOT is_new THEN 1 END)) AS BIGINT) AS mean_ref,
        |    CAST(floor(sum(CASE WHEN is_new THEN v END)::DOUBLE
        |      / count(CASE WHEN is_new THEN 1 END)) AS BIGINT) AS mean_new
        |  FROM x GROUP BY dim)
        |SELECT dim, mean_ref, mean_new,
        |  abs(mean_new - mean_ref) AS drift,
        |  abs(mean_new - mean_ref) >= 128 AS flagged
        |FROM a""".stripMargin,
    // the Gopher per-doc pass replayed (same CTEs as text_gopher) then
    // aggregated per source; ratios divide exactly-summed integers
    "corpus_source_quality" ->
      """WITH base AS (
        |  SELECT source, text AS t,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> length(x) > 0) AS words,
        |    list_filter(list_transform(string_split(text, chr(10)),
        |      l -> trim(l)), l -> length(l) > 0) AS lines
        |  FROM documents),
        |m AS (
        |  SELECT source, t,
        |    len(words) AS nw,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(list_aggregate(list_transform(words, x -> length(x)), 'sum') AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS mean_len,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST((length(t) - length(regexp_replace(t, '#', '', 'g')))
        |        + (length(t) - length(regexp_replace(t, '\.\.\.', '', 'g'))) / 3
        |        AS DOUBLE) / len(words) ELSE 0.0 END AS sym_ratio,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS bullet_frac,
        |    CASE WHEN len(lines) > 0 THEN
        |      CAST(len(list_filter(lines, l -> l LIKE '%...')) AS DOUBLE)
        |        / len(lines) ELSE 0.0 END AS ellipsis_frac,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |        / len(words) ELSE 0.0 END AS alpha_frac,
        |    len(list_intersect(list_distinct(list_transform(words, x -> lower(x))),
        |      ['the','be','to','of','and','that','have','with'])) AS req_stops
        |  FROM base),
        |p AS (
        |  SELECT source, t,
        |    (nw >= 50 AND nw <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
        |      AND sym_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |      AND alpha_frac >= 0.8 AND req_stops >= 2 AS pass
        |  FROM m),
        |a AS (
        |  SELECT source,
        |    CAST(count(*) AS BIGINT) AS docs,
        |    CAST(sum(length(t)) AS BIGINT) AS chars,
        |    CAST(sum(len(regexp_split_to_array(trim(t), '\s+'))) AS BIGINT) AS tokens,
        |    CAST(sum(length(t) - length(regexp_replace(t, '[.,!?;:]', '', 'g'))) AS BIGINT)
        |      AS punct_chars,
        |    CAST(sum(length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))) AS BIGINT)
        |      AS digit_chars,
        |    CAST(sum(len(list_filter(regexp_split_to_array(trim(t), '\s+'),
        |      x -> x IN ('the','a','an','and','of','to','in','is','it','that')))) AS BIGINT)
        |      AS stopword_hits,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS gopher_pass
        |  FROM p GROUP BY source)
        |SELECT source, docs, chars, tokens, punct_chars, digit_chars,
        |  stopword_hits, gopher_pass,
        |  punct_chars::DOUBLE / chars AS punct_ratio,
        |  digit_chars::DOUBLE / chars AS digit_ratio,
        |  stopword_hits::DOUBLE / tokens AS stops_per_token,
        |  gopher_pass::DOUBLE / docs AS pass_rate,
        |  gopher_pass::DOUBLE / docs >= 0.5 AS keep
        |FROM a""".stripMargin,
    // greedy budget cut replayed as one global window (fine at oracle
    // scale; the engine side is the distributed prefix sum)
    "select_budget" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY n_chars DESC, doc_id) - n_tokens
        |      AS cum_before
        |  FROM s)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(cum_before AS BIGINT) AS cum_before
        |FROM c WHERE cum_before < 15000""".stripMargin,
    // Lloyd k-means replayed in SQL: quantize, assign to seed centroids
    // (ids < 4), one integer-mean update, final assignment. All arithmetic
    // integer or IEEE-deterministic (floor of a double division).
    "cluster_kmeans" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM q WHERE vec_id < 4),
        |d0 AS (SELECT q.vec_id, q.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c0.c[i]) * (q.e[i] - c0.c[i]))) AS dist
        |  FROM q CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT q.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c1.c[i]) * (q.e[i] - c1.c[i]))) AS dist
        |  FROM q CROSS JOIN c1)
        |SELECT vec_id, cid AS cluster FROM (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1""".stripMargin,
    // centroid affinity replayed in SQL: per-label integer-mean centroids,
    // own vs nearest-other squared distance (tie to lowest label id)
    "cluster_affinity" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, list_transform(
        |    embedding, x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |cs AS (SELECT label AS clbl, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM q CROSS JOIN range(1, 65) t(i) GROUP BY label, i),
        |cl AS (SELECT clbl, list(v ORDER BY i) AS c FROM cs GROUP BY clbl),
        |d AS (SELECT q.vec_id, q.label, cl.clbl,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - cl.c[i]) * (q.e[i] - cl.c[i]))) AS BIGINT)
        |      AS dist
        |  FROM q CROSS JOIN cl),
        |own AS (SELECT vec_id, label, dist AS d_own FROM d
        |  WHERE label = clbl),
        |oth AS (SELECT vec_id, clbl AS near_label, dist AS d_other FROM (
        |    SELECT vec_id, clbl, dist, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist, clbl) AS rn
        |    FROM d WHERE label <> clbl) WHERE rn = 1)
        |SELECT own.vec_id, own.label, own.d_own, oth.near_label,
        |  oth.d_other, oth.d_other - own.d_own AS margin,
        |  oth.d_other - own.d_own < 0 AS mislabeled
        |FROM own JOIN oth ON own.vec_id = oth.vec_id""".stripMargin,
    // the cluster_kmeans CTE (1 Lloyd iteration, seeds vec_id<4, integer
    // quantization) extended with the df-gated per-cluster keyword rank
    "cluster_topics" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM q WHERE vec_id < 4),
        |d0 AS (SELECT q.vec_id, q.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c0.c[i]) * (q.e[i] - c0.c[i]))) AS dist
        |  FROM q CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT q.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c1.c[i]) * (q.e[i] - c1.c[i]))) AS dist
        |  FROM q CROSS JOIN c1),
        |a1 AS (SELECT vec_id, cid AS cluster FROM (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1),
        |toks AS (
        |  SELECT w.doc_id, w.word, a.cluster FROM (
        |    SELECT doc_id, word FROM (
        |      SELECT doc_id,
        |        unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
        |      FROM documents) WHERE word <> '') w
        |  JOIN a1 a ON w.doc_id = a.vec_id),
        |wt AS (SELECT word, CAST(count(*) AS BIGINT) AS c_total
        |  FROM toks GROUP BY word),
        |ct AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_tokens
        |  FROM toks GROUP BY cluster),
        |g AS (SELECT CAST(sum(c_total) AS BIGINT) AS total_tokens FROM wt),
        |cw AS (SELECT t.cluster, t.word, CAST(count(*) AS BIGINT) AS c
        |  FROM toks t GROUP BY 1, 2),
        |scored AS (SELECT cw.cluster, cw.word, cw.c,
        |    cw.c * g.total_tokens - wt.c_total * ct.cluster_tokens AS score
        |  FROM cw JOIN wt USING (word) JOIN ct USING (cluster) CROSS JOIN g)
        |SELECT cluster, rank, word, c, score FROM (
        |  SELECT cluster, word, c, score,
        |    CAST(row_number() OVER (
        |      PARTITION BY cluster ORDER BY score DESC, word) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,
    "text_pii_sources" ->
      """WITH seeded AS (
        |  SELECT source,
        |    text ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' contact user' ||
        |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' call 555-01' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 0 THEN ' from 192.168.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |      CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS text
        |  FROM documents),
        |x AS (
        |  SELECT source,
        |    len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+')) AS em,
        |    len(regexp_extract_all(text, '555-[0-9]{4}')) AS ph,
        |    len(regexp_extract_all(text,
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ip,
        |    length(text) - length(regexp_replace(regexp_replace(regexp_replace(
        |      text, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+', '[PII]', 'g'),
        |      '555-[0-9]{4}', '[PII]', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[PII]', 'g'))
        |      AS delta
        |  FROM seeded)
        |SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(CASE WHEN em + ph + ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS pii_docs,
        |  CAST(sum(em) AS BIGINT) AS email_hits,
        |  CAST(sum(ph) AS BIGINT) AS phone_hits,
        |  CAST(sum(ip) AS BIGINT) AS ip_hits,
        |  CAST(sum(delta) AS BIGINT) AS redact_char_delta
        |FROM x GROUP BY source""".stripMargin,
    // the cluster_kmeans CTE reduced to per-cell occupancy + imbalance
    "cluster_cells" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM q WHERE vec_id < 4),
        |d0 AS (SELECT q.vec_id, q.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c0.c[i]) * (q.e[i] - c0.c[i]))) AS dist
        |  FROM q CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT q.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c1.c[i]) * (q.e[i] - c1.c[i]))) AS dist
        |  FROM q CROSS JOIN c1),
        |a1 AS (SELECT vec_id, cid AS cluster FROM (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1),
        |per AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_vectors
        |  FROM a1 GROUP BY cluster),
        |tot AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS total FROM per)
        |SELECT cluster, n_vectors,
        |  CAST(floor(n_vectors * 1000000 / total) AS BIGINT) AS share_ppm,
        |  n_vectors * 4 > total * 2 AS imbalanced
        |FROM per CROSS JOIN tot""".stripMargin,
    "text_vocab_sweep" ->
      """WITH toks AS (
        |  SELECT word FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
        |    FROM documents) WHERE word <> ''),
        |uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY word),
        |cuts AS (SELECT unnest([2, 4, 8, 16, 32]) AS min_count),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM uni)
        |SELECT CAST(min_count AS BIGINT) AS min_count,
        |  CAST(count(CASE WHEN c >= min_count THEN 1 END) AS BIGINT) AS vocab_types,
        |  CAST(coalesce(sum(CASE WHEN c < min_count THEN c END), 0) AS BIGINT)
        |    AS oov_tokens,
        |  t.total_tokens,
        |  CAST(floor(coalesce(sum(CASE WHEN c < min_count THEN c END), 0)
        |    * 1000000 / t.total_tokens) AS BIGINT) AS oov_ppm
        |FROM cuts CROSS JOIN uni CROSS JOIN tot t
        |GROUP BY min_count, t.total_tokens""".stripMargin,
    "text_domains" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
        |    source || '-' || CAST(doc_id % 20 AS VARCHAR) || '.example.org/p/' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '?utm=tracker' ELSE '' END AS url
        |  FROM documents),
        |x AS (SELECT regexp_replace(regexp_extract(url, '^https?://([^/?#]+)', 1),
        |    '^www\.', '') AS domain, n_chars FROM d),
        |per AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars FROM x GROUP BY domain),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS corpus_docs FROM per)
        |SELECT domain, n_docs, total_chars,
        |  CAST(floor(n_docs * 1000000 / corpus_docs) AS BIGINT) AS share_ppm,
        |  n_docs * 50 > corpus_docs AS trap_suspect,
        |  total_chars < n_docs * 300 AS thin_content
        |FROM per CROSS JOIN tot""".stripMargin,
    "dedup_url" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
        |    source || '-' || CAST(doc_id % 20 AS VARCHAR) || '.example.org/p/' ||
        |    CAST(doc_id % 100 AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '?utm=tracker' ELSE '' END AS url
        |  FROM documents),
        |c AS (SELECT regexp_replace(regexp_replace(lower(url), '[?#].*$', ''),
        |    '^https?://(www\.)?', '') AS canonical_url, doc_id FROM d)
        |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_copies,
        |  MIN(doc_id) AS canonical_doc
        |FROM c GROUP BY canonical_url HAVING count(*) > 1""".stripMargin,
    // integer-PageRank replica: same edge synthesis, same truncating
    // division at every step ((r*w)//ow per edge, *85//100 damping,
    // teleport = (mass//n)*15//100), three unrolled iterations
    "graph_domain_rank" ->
      """WITH si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
        |e0 AS (
        |  SELECT si.sidx*20 + d.doc_id%20 AS src,
        |    ((si.sidx + d.doc_id) % ns.n_src)*20 + (d.doc_id//7)%20 AS dst
        |  FROM documents d JOIN si USING (source) CROSS JOIN ns),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |  FROM e0 GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
        |r0 AS (SELECT node, 1000000000000 // nn.n AS r
        |  FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r0 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c1 c USING (node) CROSS JOIN nn),
        |c2 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r1 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c2 c USING (node) CROSS JOIN nn),
        |c3 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r2 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c3 c USING (node) CROSS JOIN nn)
        |SELECT n.node, coalesce(o.ow, 0) AS out_weight,
        |  CAST(r3.r AS BIGINT) AS rank_scaled
        |FROM nodes n LEFT JOIN o ON n.node = o.src
        |JOIN r3 ON n.node = r3.node""".stripMargin,
    // incremental-rank ground truth: IDENTICAL to graph_domain_rank's
    // full-corpus PageRank — the incremental edge-table merge must be
    // indistinguishable from recomputing over all documents
    "graph_rank_incremental" ->
      """WITH si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
        |e0 AS (
        |  SELECT si.sidx*20 + d.doc_id%20 AS src,
        |    ((si.sidx + d.doc_id) % ns.n_src)*20 + (d.doc_id//7)%20 AS dst
        |  FROM documents d JOIN si USING (source) CROSS JOIN ns),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |  FROM e0 GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
        |r0 AS (SELECT node, 1000000000000 // nn.n AS r
        |  FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r0 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c1 c USING (node) CROSS JOIN nn),
        |c2 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r1 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c2 c USING (node) CROSS JOIN nn),
        |c3 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r2 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c3 c USING (node) CROSS JOIN nn)
        |SELECT n.node, coalesce(o.ow, 0) AS out_weight,
        |  CAST(r3.r AS BIGINT) AS rank_scaled
        |FROM nodes n LEFT JOIN o ON n.node = o.src
        |JOIN r3 ON n.node = r3.node""".stripMargin,
    // triangle replica: same edge synthesis, then the SIMPLE id-order
    // enumeration ((x,y),(y,z),(x,z) with x<y<z) — per-node counts are
    // orientation-invariant, so this verifies the engine's degree-ordered
    // compact-forward exactly
    "graph_triangles" ->
      """WITH si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
        |e0 AS (
        |  SELECT si.sidx*20 + d.doc_id%20 AS src,
        |    ((si.sidx + d.doc_id) % ns.n_src)*20 + (d.doc_id//7)%20 AS dst
        |  FROM documents d JOIN si USING (source) CROSS JOIN ns),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1 JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (SELECT unnest([x, y, z]) AS node FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |FROM corners GROUP BY node""".stripMargin,
    // label-propagation replica: two unrolled weighted-majority rounds,
    // argmax by (votes DESC, label ASC), seeds immutable
    "graph_label_prop" ->
      """WITH si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
        |e0 AS (
        |  SELECT si.sidx*20 + d.doc_id%20 AS src,
        |    ((si.sidx + d.doc_id) % ns.n_src)*20 + (d.doc_id//7)%20 AS dst
        |  FROM documents d JOIN si USING (source) CROSS JOIN ns),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |  FROM e0 GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |seeds AS (SELECT node, node % 3 AS label FROM nodes
        |  WHERE node % 5 = 0),
        |v1 AS (SELECT e.dst AS node, s.label,
        |    CAST(sum(e.w) AS BIGINT) AS votes
        |  FROM e JOIN seeds s ON e.src = s.node GROUP BY 1, 2),
        |a1 AS (SELECT node, label FROM (
        |    SELECT node, label, row_number() OVER (PARTITION BY node
        |      ORDER BY votes DESC, label) AS rn FROM v1) WHERE rn = 1),
        |l1 AS (SELECT * FROM seeds UNION ALL
        |  SELECT a.node, a.label FROM a1 a
        |  WHERE a.node NOT IN (SELECT node FROM seeds)),
        |v2 AS (SELECT e.dst AS node, l.label,
        |    CAST(sum(e.w) AS BIGINT) AS votes
        |  FROM e JOIN l1 l ON e.src = l.node GROUP BY 1, 2),
        |a2 AS (SELECT node, label FROM (
        |    SELECT node, label, row_number() OVER (PARTITION BY node
        |      ORDER BY votes DESC, label) AS rn FROM v2) WHERE rn = 1)
        |SELECT node, CAST(label AS BIGINT) AS label FROM seeds
        |UNION ALL
        |SELECT a.node, CAST(a.label AS BIGINT) AS label FROM a2 a
        |WHERE a.node NOT IN (SELECT node FROM seeds)""".stripMargin,
    "text_redact" ->
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' contact user' ||
        |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' call 555-01' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 0 THEN ' from 192.168.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |      CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, text,
        |    len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+'))
        |      AS emails,
        |    len(regexp_extract_all(text, '555-[0-9]{4}')) AS phones,
        |    len(regexp_extract_all(text,
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ips,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      text, '[a-z0-9]+@[a-z0-9.]+\.[a-z]+', '[EMAIL]', 'g'),
        |      '555-[0-9]{4}', '[PHONE]', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g')
        |      AS red
        |  FROM seeded)
        |SELECT doc_id, CAST(emails AS BIGINT) AS emails,
        |  CAST(phones AS BIGINT) AS phones, CAST(ips AS BIGINT) AS ips,
        |  CAST(length(text) - length(red) AS BIGINT) AS char_delta,
        |  md5(red) AS redacted_md5
        |FROM r WHERE emails + phones + ips > 0""".stripMargin,
    // kappa replica: HUGEINT products, // floor division (numerator
    // non-negative by construction — gates correlate positively)
    "text_label_kappa" ->
      """WITH g AS (
        |  SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(regexp_extract_all(text, '\.')) >= 5
        |      THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a*b) AS BIGINT) AS n11,
        |    CAST(sum(a*(1-b)) AS BIGINT) AS n10,
        |    CAST(sum((1-a)*b) AS BIGINT) AS n01,
        |    CAST(sum((1-a)*(1-b)) AS BIGINT) AS n00
        |  FROM g)
        |SELECT n AS n_docs, n11 AS both_pass, n00 AS both_fail,
        |  n10 AS only_length, n01 AS only_periods,
        |  CAST((n11+n00)::HUGEINT * 1000000 // n AS BIGINT) AS agree_ppm,
        |  CAST(CASE WHEN n::HUGEINT * n
        |      - ((n11+n10)::HUGEINT*(n11+n01) + (n01+n00)::HUGEINT*(n10+n00))
        |      = 0 THEN 0 ELSE
        |    (((n11+n00)::HUGEINT * n
        |      - ((n11+n10)::HUGEINT*(n11+n01) + (n01+n00)::HUGEINT*(n10+n00)))
        |      * 1000000)
        |    // (n::HUGEINT * n
        |      - ((n11+n10)::HUGEINT*(n11+n01) + (n01+n00)::HUGEINT*(n10+n00)))
        |    END AS BIGINT) AS kappa_ppm
        |FROM c""".stripMargin,
    // pref-pair replica: the engine's single argmax/argmin aggregate
    // re-expressed as two rank-1 window picks with the same tie-breaks
    "pref_pairs" ->
      """WITH s AS (
        |  SELECT source, doc_id % 5 AS grp, doc_id,
        |    CAST(n_chars + 10 * len(regexp_extract_all(text, '[.!?]'))
        |      AS BIGINT) AS score
        |  FROM documents),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY source, grp
        |      ORDER BY score DESC, doc_id) AS rc,
        |    row_number() OVER (PARTITION BY source, grp
        |      ORDER BY score ASC, doc_id) AS rr,
        |    CAST(count(*) OVER (PARTITION BY source, grp) AS BIGINT)
        |      AS n_docs
        |  FROM s)
        |SELECT c.source, CAST(c.grp AS BIGINT) AS grp,
        |  c.doc_id AS chosen_doc, c.score AS chosen_score,
        |  j.doc_id AS rejected_doc, j.score AS rejected_score,
        |  c.score - j.score AS margin, c.n_docs
        |FROM r c JOIN r j ON c.source = j.source AND c.grp = j.grp
        |WHERE c.rc = 1 AND j.rr = 1 AND c.doc_id <> j.doc_id""".stripMargin,
    // checksum replica: DuckDB hex-literal cast for the 60-bit md5
    // prefix, HUGEINT sum, identical 2^62 reduction
    "corpus_checksum" ->
      """WITH h AS (
        |  SELECT doc_id % 16 AS shard, n_chars,
        |    CAST(concat('0x',
        |      substr(md5(CAST(doc_id AS VARCHAR) || coalesce(text, '')),
        |        1, 15))
        |      AS BIGINT) AS h
        |  FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(h::HUGEINT) % 4611686018427387904 AS BIGINT) AS checksum
        |FROM h GROUP BY shard""".stripMargin,
    // MRR replica: brute-force rank-1 truth + the ann_recall IVF cell
    // CTE, candidate rank <= 10, rr_scaled = 2520 // rank (0 on miss)
    "ann_mrr" ->
      """WITH truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                        CAST(c.embedding AS DOUBLE[])) DESC,
        |          c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |    WHERE q.vec_id < 8)
        |  WHERE rank = 1),
        |qz AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM qz WHERE vec_id < 4),
        |d0 AS (SELECT qz.vec_id, qz.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c0.c[i]) * (qz.e[i] - c0.c[i]))) AS dist
        |  FROM qz CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT qz.vec_id, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (qz.e[i] - c1.c[i]) * (qz.e[i] - c1.c[i]))) AS dist
        |  FROM qz CROSS JOIN c1),
        |cells AS (SELECT vec_id, cid AS cluster FROM (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1),
        |cand AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT qc.vec_id AS query_id, cc.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY qc.vec_id
        |        ORDER BY list_cosine_similarity(CAST(q2.embedding AS DOUBLE[]),
        |                                        CAST(c2.embedding AS DOUBLE[])) DESC,
        |          cc.vec_id) AS rank
        |    FROM cells qc
        |    JOIN cells cc ON qc.cluster = cc.cluster
        |      AND qc.vec_id <> cc.vec_id
        |    JOIN embeddings q2 ON q2.vec_id = qc.vec_id
        |    JOIN embeddings c2 ON c2.vec_id = cc.vec_id
        |    WHERE qc.vec_id < 8)
        |  WHERE rank <= 10),
        |f AS (SELECT t.query_id, c.rank
        |  FROM truth t JOIN cand c USING (query_id, neighbor_id))
        |SELECT q.vec_id AS query_id,
        |  CAST(coalesce(f.rank, 0) AS BIGINT) AS rank,
        |  CAST(coalesce(2520 // f.rank, 0) AS BIGINT) AS rr_scaled
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) q
        |LEFT JOIN f ON f.query_id = q.vec_id""".stripMargin,
    // HLL replica: identical md5 register addressing, string-op leading
    // zeros, and the exact-integer estimator in HUGEINT arithmetic
    "stats_hll" ->
      """WITH ws AS (
        |  SELECT list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
        |  FROM ws),
        |parts AS (
        |  SELECT CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT)
        |      AS bucket,
        |    substr(md5(tok), 3, 15) AS tail
        |  FROM toks),
        |ranked AS (
        |  SELECT bucket,
        |    CASE WHEN length(regexp_extract(tail, '^(0*)', 1)) = 15 THEN 61
        |    ELSE length(regexp_extract(tail, '^(0*)', 1)) * 4 +
        |      CASE substr(tail,
        |          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
        |        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
        |        WHEN '7' THEN 1 ELSE 0 END + 1 END AS rank
        |  FROM parts),
        |regs AS (SELECT bucket, max(rank) AS mr FROM ranked GROUP BY bucket),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_regs,
        |    sum(CAST(1::BIGINT << (61 - mr) AS HUGEINT)) AS s_present
        |  FROM regs),
        |est AS (SELECT n_regs,
        |    CAST(CASE WHEN n_regs = 0 THEN 0 ELSE
        |      (7213::HUGEINT * 256 * 256 * 256 *
        |        CAST(1::BIGINT << 61 AS HUGEINT)) //
        |      ((10000::HUGEINT * 256 + 10790) *
        |        (s_present + CAST(1::BIGINT << 61 AS HUGEINT)
        |          * (256 - n_regs))) END AS BIGINT) AS hll_ndv
        |  FROM agg),
        |ex AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_ndv
        |  FROM toks)
        |SELECT CAST(256 AS BIGINT) AS m, n_regs, hll_ndv, exact_ndv,
        |  CAST(abs(hll_ndv - exact_ndv) * 1000000 // exact_ndv AS BIGINT)
        |    AS err_ppm
        |FROM est CROSS JOIN ex""".stripMargin,
    // count-min replica: the same 4 salted md5 cell hashes, cell-count
    // sketch, exact top-20 probes, min over the probed cells
    "stats_countmin" ->
      """WITH ws AS (
        |  SELECT list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM ws),
        |salts AS (SELECT unnest([0, 1, 2, 3]) AS salt),
        |sketch AS (
        |  SELECT salt, CAST(concat('0x',
        |      substr(md5(salt::VARCHAR || '|' || sh), 1, 15))
        |      AS BIGINT) % 512 AS cell,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM toks CROSS JOIN salts GROUP BY 1, 2),
        |top AS (
        |  SELECT sh, CAST(count(*) AS BIGINT) AS true_c FROM toks
        |  GROUP BY sh ORDER BY true_c DESC, sh ASC LIMIT 20),
        |probe AS (
        |  SELECT t.sh, t.true_c, s.salt, CAST(concat('0x',
        |      substr(md5(s.salt::VARCHAR || '|' || t.sh), 1, 15))
        |      AS BIGINT) % 512 AS cell
        |  FROM top t CROSS JOIN salts s)
        |SELECT p.sh, p.true_c, CAST(min(sk.c) AS BIGINT) AS cm_est
        |FROM probe p JOIN sketch sk ON p.salt = sk.salt AND p.cell = sk.cell
        |GROUP BY p.sh, p.true_c""".stripMargin,
    // quantile replica: the naive full-sort rank definition the engine's
    // bucketed path is proven against — value at rank (n-1)*q/1000 + 1
    "stats_quantiles" ->
      """WITH s AS (
        |  SELECT CAST(n_chars AS BIGINT) AS value,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM documents),
        |q AS (SELECT unnest([500, 900, 990]) AS permille)
        |SELECT CAST(q.permille AS BIGINT) AS permille,
        |  CAST((n.n - 1) * q.permille // 1000 + 1 AS BIGINT) AS rank,
        |  s.value
        |FROM q CROSS JOIN n
        |JOIN s ON s.rn = (n.n - 1) * q.permille // 1000 + 1""".stripMargin,
    // maintained-histogram ground truth: IDENTICAL to stats_quantiles —
    // the merged histogram's permille read must equal the full sort
    "stats_quantiles_incremental" ->
      """WITH s AS (
        |  SELECT CAST(n_chars AS BIGINT) AS value,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM documents),
        |q AS (SELECT unnest([500, 900, 990]) AS permille)
        |SELECT CAST(q.permille AS BIGINT) AS permille,
        |  CAST((n.n - 1) * q.permille // 1000 + 1 AS BIGINT) AS rank,
        |  s.value
        |FROM q CROSS JOIN n
        |JOIN s ON s.rn = (n.n - 1) * q.permille // 1000 + 1""".stripMargin,
    "profile_skew" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY source),
        |t AS (SELECT count(*) AS total FROM documents)
        |SELECT source, cnt,
        |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST((cnt * 32 + total - 1) // total AS BIGINT) AS salt_factor
        |FROM c CROSS JOIN t""".stripMargin,
    // grouped-HLL replica: identical register addressing with a
    // per-source GROUP BY at both aggregate stages
    "stats_hll_sources" ->
      """WITH ws AS (
        |  SELECT source, list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT source,
        |    unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
        |  FROM ws),
        |parts AS (
        |  SELECT source,
        |    CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT) AS bucket,
        |    substr(md5(tok), 3, 15) AS tail
        |  FROM toks),
        |ranked AS (
        |  SELECT source, bucket,
        |    CASE WHEN length(regexp_extract(tail, '^(0*)', 1)) = 15 THEN 61
        |    ELSE length(regexp_extract(tail, '^(0*)', 1)) * 4 +
        |      CASE substr(tail,
        |          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
        |        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
        |        WHEN '7' THEN 1 ELSE 0 END + 1 END AS rank
        |  FROM parts),
        |regs AS (SELECT source, bucket, max(rank) AS mr
        |  FROM ranked GROUP BY source, bucket),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_regs,
        |    sum(CAST(1::BIGINT << (61 - mr) AS HUGEINT)) AS s_present
        |  FROM regs GROUP BY source)
        |SELECT source, CAST(256 AS BIGINT) AS m, n_regs,
        |  CAST(CASE WHEN n_regs = 0 THEN 0 ELSE
        |    (7213::HUGEINT * 256 * 256 * 256 *
        |      CAST(1::BIGINT << 61 AS HUGEINT)) //
        |    ((10000::HUGEINT * 256 + 10790) *
        |      (s_present + CAST(1::BIGINT << 61 AS HUGEINT)
        |        * (256 - n_regs))) END AS BIGINT) AS hll_ndv
        |FROM agg""".stripMargin,
    // merged-register ground truth: IDENTICAL to stats_hll_sources —
    // max-merged persisted registers must be indistinguishable from the
    // single-pass sketch over the full corpus
    "stats_hll_incremental" ->
      """WITH ws AS (
        |  SELECT source, list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT source,
        |    unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
        |  FROM ws),
        |parts AS (
        |  SELECT source,
        |    CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT) AS bucket,
        |    substr(md5(tok), 3, 15) AS tail
        |  FROM toks),
        |ranked AS (
        |  SELECT source, bucket,
        |    CASE WHEN length(regexp_extract(tail, '^(0*)', 1)) = 15 THEN 61
        |    ELSE length(regexp_extract(tail, '^(0*)', 1)) * 4 +
        |      CASE substr(tail,
        |          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
        |        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
        |        WHEN '7' THEN 1 ELSE 0 END + 1 END AS rank
        |  FROM parts),
        |regs AS (SELECT source, bucket, max(rank) AS mr
        |  FROM ranked GROUP BY source, bucket),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_regs,
        |    sum(CAST(1::BIGINT << (61 - mr) AS HUGEINT)) AS s_present
        |  FROM regs GROUP BY source)
        |SELECT source, CAST(256 AS BIGINT) AS m, n_regs,
        |  CAST(CASE WHEN n_regs = 0 THEN 0 ELSE
        |    (7213::HUGEINT * 256 * 256 * 256 *
        |      CAST(1::BIGINT << 61 AS HUGEINT)) //
        |    ((10000::HUGEINT * 256 + 10790) *
        |      (s_present + CAST(1::BIGINT << 61 AS HUGEINT)
        |        * (256 - n_regs))) END AS BIGINT) AS hll_ndv
        |FROM agg""".stripMargin,
    // overlap replica: per-half registers, union = register-wise max,
    // inclusion-exclusion, exact intersection audit
    "stats_hll_overlap" ->
      """WITH ws AS (
        |  SELECT doc_id % 2 AS half, list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT half,
        |    unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
        |  FROM ws),
        |parts AS (
        |  SELECT half,
        |    CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT) AS bucket,
        |    substr(md5(tok), 3, 15) AS tail
        |  FROM toks),
        |ranked AS (
        |  SELECT half, bucket,
        |    CASE WHEN length(regexp_extract(tail, '^(0*)', 1)) = 15 THEN 61
        |    ELSE length(regexp_extract(tail, '^(0*)', 1)) * 4 +
        |      CASE substr(tail,
        |          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
        |        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
        |        WHEN '7' THEN 1 ELSE 0 END + 1 END AS rank
        |  FROM parts),
        |regs AS (SELECT half, bucket, max(rank) AS mr
        |  FROM ranked GROUP BY half, bucket),
        |est AS (
        |  SELECT half, CAST((7213::HUGEINT * 256 * 256 * 256 *
        |      CAST(1::BIGINT << 61 AS HUGEINT)) //
        |    ((10000::HUGEINT * 256 + 10790) *
        |      (sum(CAST(1::BIGINT << (61 - mr) AS HUGEINT)) +
        |        CAST(1::BIGINT << 61 AS HUGEINT) * (256 - count(*))))
        |    AS BIGINT) AS ndv
        |  FROM regs GROUP BY half),
        |uregs AS (SELECT bucket, max(mr) AS mr FROM regs GROUP BY bucket),
        |uest AS (
        |  SELECT CAST(CASE WHEN count(*) = 0 THEN 0 ELSE
        |    (7213::HUGEINT * 256 * 256 * 256 *
        |      CAST(1::BIGINT << 61 AS HUGEINT)) //
        |    ((10000::HUGEINT * 256 + 10790) *
        |      (sum(CAST(1::BIGINT << (61 - mr) AS HUGEINT)) +
        |        CAST(1::BIGINT << 61 AS HUGEINT) * (256 - count(*))))
        |    END AS BIGINT) AS ndv_union
        |  FROM uregs),
        |ex AS (
        |  SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM (
        |    SELECT tok FROM toks GROUP BY tok
        |    HAVING count(DISTINCT half) = 2)),
        |ee AS (SELECT ndv AS ndv_even FROM est WHERE half = 0),
        |eo AS (SELECT ndv AS ndv_odd FROM est WHERE half = 1)
        |SELECT ndv_even, ndv_odd, ndv_union,
        |  ndv_even + ndv_odd - ndv_union AS overlap_est, exact_overlap
        |FROM ee CROSS JOIN eo CROSS JOIN uest CROSS JOIN ex""".stripMargin,
    "stats_join_size" ->
      """WITH h AS (
        |  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS probe_rows,
        |    CAST(sum(c * c) AS BIGINT) AS predicted_rows,
        |    CAST(max(c) AS BIGINT) AS max_key_rows
        |  FROM h),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS actual_rows
        |  FROM lineitem x JOIN lineitem y ON x.l_partkey = y.l_partkey)
        |SELECT n_keys, probe_rows, predicted_rows, actual_rows,
        |  max_key_rows
        |FROM p CROSS JOIN a""".stripMargin,
    // bloom-join replica: same 3 salted md5 positions mod 65536, pass =
    // all positions present, reduction + FPR over the distinct-key table
    "stats_bloom_join" ->
      """WITH build AS (
        |  SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS bk FROM orders
        |  WHERE o_orderdate >= '1997-03-01' AND o_orderdate < '1997-04-01'),
        |salts AS (SELECT unnest([0, 1, 2]) AS salt),
        |pos AS (
        |  SELECT DISTINCT CAST(concat('0x',
        |      substr(md5(salt::VARCHAR || '|' || bk::VARCHAR), 1, 15))
        |      AS BIGINT) % 65536 AS p
        |  FROM build CROSS JOIN salts),
        |keys AS (SELECT CAST(l_orderkey AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS nr
        |  FROM lineitem GROUP BY 1),
        |kp AS (
        |  SELECT k, nr, CAST(concat('0x',
        |      substr(md5(salt::VARCHAR || '|' || k::VARCHAR), 1, 15))
        |      AS BIGINT) % 65536 AS p
        |  FROM keys CROSS JOIN salts),
        |passed AS (SELECT k, nr FROM kp JOIN pos USING (p)
        |  GROUP BY k, nr HAVING count(*) = 3),
        |t1 AS (SELECT sum(nr) AS probe_rows FROM keys),
        |t2 AS (SELECT coalesce(sum(nr), 0) AS pass_rows FROM passed),
        |t3 AS (SELECT coalesce(sum(nr), 0) AS true_rows FROM keys
        |  WHERE k IN (SELECT bk FROM build))
        |SELECT CAST(probe_rows AS BIGINT) AS probe_rows,
        |  CAST(pass_rows AS BIGINT) AS pass_rows,
        |  CAST(true_rows AS BIGINT) AS true_rows,
        |  CAST(pass_rows - true_rows AS BIGINT) AS fp_rows,
        |  CAST((pass_rows - true_rows) * 1000000
        |    // (probe_rows - true_rows) AS BIGINT) AS fpr_ppm
        |FROM t1 CROSS JOIN t2 CROSS JOIN t3""".stripMargin,
    // scd2 replica: identical change-detection and validity windows
    "sql_scd2" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER w AS prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |chg AS (
        |  SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  LEAD(ts) OVER w2 AS valid_to,
        |  LEAD(ts) OVER w2 IS NULL AS is_current
        |FROM chg
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    // scd2-asof replica: the same change-detected history, purchases
    // joined on the half-open window, revenue summed through decimal
    "q_scd2_asof" ->
      """WITH np AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER w AS prev
        |  FROM events WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |chg AS (
        |  SELECT user_id, ts, event_id, event_type FROM np
        |  WHERE prev IS NULL OR prev <> event_type),
        |hist AS (
        |  SELECT user_id, event_type AS state, ts AS vf,
        |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS vt
        |  FROM chg),
        |p AS (SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT h.state, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE)
        |    AS total_value
        |FROM p JOIN hist h ON p.user_id = h.user_id
        |  AND p.ts >= h.vf AND (h.vt IS NULL OR p.ts < h.vt)
        |GROUP BY 1""".stripMargin,
    "stats_fk_orphans" ->
      """WITH e1 AS (
        |  SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey),
        |e2 AS (
        |  SELECT 'orders.o_custkey->customer' AS fk_edge,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey),
        |e3 AS (
        |  SELECT 'events.user_id->customer_partial' AS fk_edge,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
        |    WHERE c_custkey % 3 <> 0) c
        |    ON e.user_id = c.c_custkey),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |  UNION ALL SELECT * FROM e3)
        |SELECT fk_edge, n_child, n_orphans,
        |  CAST((n_child - n_orphans) * 1000000 // n_child AS BIGINT)
        |    AS match_ppm
        |FROM u""".stripMargin,
    // prune-stats replica: every number re-derived from the RAW ROWS —
    // matching the manifest-only engine census proves pruning exactness
    "meta_prune_stats" ->
      """WITH m AS (
        |  SELECT date_trunc('month', l_shipdate) AS mo, l_shipdate
        |  FROM lineitem)
        |SELECT CAST(count(DISTINCT mo) AS BIGINT) AS n_parts_total,
        |  CAST(count(DISTINCT CASE WHEN mo >= TIMESTAMP '1997-01-01'
        |    AND mo < TIMESTAMP '1997-07-01' THEN mo END) AS BIGINT)
        |    AS n_parts_kept,
        |  CAST(count(*) AS BIGINT) AS rows_total,
        |  CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-07-01' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS rows_kept
        |FROM m""".stripMargin,
    // corpus-diff replica: v1/v2 sets rebuilt by the same deterministic
    // rules, full-outer joined on doc_id, classified by content hash
    "corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, source, md5(text) AS h FROM documents
        |  WHERE doc_id % 2 = 0),
        |v2 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 10 <> 0 AND doc_id % 14 = 2
        |      THEN md5('rev2 ' || text) ELSE md5(text) END AS h
        |  FROM documents
        |  WHERE (doc_id % 2 = 0 AND doc_id % 10 <> 0) OR doc_id % 2 = 1)
        |SELECT coalesce(v1.source, v2.source) AS source,
        |  CASE WHEN v1.h IS NULL THEN 'added'
        |       WHEN v2.h IS NULL THEN 'removed'
        |       WHEN v1.h <> v2.h THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,
    // gap-quantile replica: the naive full-sort rank definition over
    // per-user lag gaps
    "stats_gap_quantiles" ->
      """WITH g AS (
        |  SELECT event_id,
        |    (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) // 1000000 AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |gg AS (SELECT event_id, gap_s FROM g WHERE gap_s IS NOT NULL),
        |s AS (SELECT gap_s AS value,
        |    row_number() OVER (ORDER BY gap_s, event_id) AS rn
        |  FROM gg),
        |n AS (SELECT count(*) AS n FROM gg),
        |q AS (SELECT unnest([500, 900, 990]) AS permille)
        |SELECT CAST(q.permille AS BIGINT) AS permille,
        |  CAST((n.n - 1) * q.permille // 1000 + 1 AS BIGINT) AS rank,
        |  CAST(s.value AS BIGINT) AS value
        |FROM q CROSS JOIN n
        |JOIN s ON s.rn = (n.n - 1) * q.permille // 1000 + 1""".stripMargin,
    // streaming count-min replica: counts sum across batches, so the
    // final streaming state equals the batch sketch — the ENTIRE
    // 2,048-cell table is compared
    "stream_cm" ->
      """WITH ws AS (
        |  SELECT list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM ws),
        |salts AS (SELECT unnest([0, 1, 2, 3]) AS salt)
        |SELECT CAST(salt AS BIGINT) AS salt,
        |  CAST(concat('0x',
        |    substr(md5(salt::VARCHAR || '|' || sh), 1, 15))
        |    AS BIGINT) % 512 AS cell,
        |  CAST(count(*) AS BIGINT) AS c
        |FROM toks CROSS JOIN salts GROUP BY 1, 2""".stripMargin,
    // merged-cell ground truth: IDENTICAL to stream_cm's full-corpus
    // sketch — sum-merged persisted cells must match it bit-for-bit
    "stats_cm_incremental" ->
      """WITH ws AS (
        |  SELECT list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        |  FROM ws),
        |salts AS (SELECT unnest([0, 1, 2, 3]) AS salt)
        |SELECT CAST(salt AS BIGINT) AS salt,
        |  CAST(concat('0x',
        |    substr(md5(salt::VARCHAR || '|' || sh), 1, 15))
        |    AS BIGINT) % 512 AS cell,
        |  CAST(count(*) AS BIGINT) AS c
        |FROM toks CROSS JOIN salts GROUP BY 1, 2""".stripMargin,
    // streaming HLL replica: registers merge by max, so the stream's
    // final state equals the batch sketch — same SQL as stats_hll minus
    // the exact-NDV audit columns
    "stream_hll" ->
      """WITH ws AS (
        |  SELECT list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0) AS w
        |  FROM documents),
        |toks AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
        |  FROM ws),
        |parts AS (
        |  SELECT CAST(concat('0x', substr(md5(tok), 1, 2)) AS BIGINT)
        |      AS bucket,
        |    substr(md5(tok), 3, 15) AS tail
        |  FROM toks),
        |ranked AS (
        |  SELECT bucket,
        |    CASE WHEN length(regexp_extract(tail, '^(0*)', 1)) = 15 THEN 61
        |    ELSE length(regexp_extract(tail, '^(0*)', 1)) * 4 +
        |      CASE substr(tail,
        |          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
        |        WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |        WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
        |        WHEN '7' THEN 1 ELSE 0 END + 1 END AS rank
        |  FROM parts),
        |regs AS (SELECT bucket, max(rank) AS mr FROM ranked GROUP BY bucket),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_regs,
        |    sum(CAST(1::BIGINT << (61 - mr) AS HUGEINT)) AS s_present
        |  FROM regs)
        |SELECT CAST(256 AS BIGINT) AS m, n_regs,
        |  CAST(CASE WHEN n_regs = 0 THEN 0 ELSE
        |    (7213::HUGEINT * 256 * 256 * 256 *
        |      CAST(1::BIGINT << 61 AS HUGEINT)) //
        |    ((10000::HUGEINT * 256 + 10790) *
        |      (s_present + CAST(1::BIGINT << 61 AS HUGEINT)
        |        * (256 - n_regs))) END AS BIGINT) AS hll_ndv
        |FROM agg""".stripMargin,
    // components replica: undirected reachability closure, label = min
    // reachable node id (the same fixpoint the pointer-jumping CC finds)
    "graph_components" ->
      """WITH RECURSIVE si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
        |e0 AS (
        |  SELECT si.sidx*20 + d.doc_id%20 AS src,
        |    ((si.sidx + d.doc_id) % ns.n_src)*20 + (d.doc_id//7)%20 AS dst
        |  FROM documents d JOIN si USING (source) CROSS JOIN ns),
        |ue AS (SELECT DISTINCT src AS s, dst AS d FROM e0
        |  UNION SELECT DISTINCT dst, src FROM e0),
        |nodes AS (SELECT DISTINCT s AS node FROM ue),
        |reach(a, b) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT reach.a, ue.d FROM reach JOIN ue ON ue.s = reach.b)
        |SELECT a AS node, CAST(min(b) AS BIGINT) AS component
        |FROM reach GROUP BY a""".stripMargin,
    "graph_reciprocity" ->
      """WITH si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
        |e0 AS (
        |  SELECT si.sidx*20 + d.doc_id%20 AS src,
        |    ((si.sidx + d.doc_id) % ns.n_src)*20 + (d.doc_id//7)%20 AS dst
        |  FROM documents d JOIN si USING (source) CROSS JOIN ns),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |r AS (SELECT count(*) AS n_recip FROM e
        |  WHERE EXISTS (SELECT 1 FROM e e2
        |    WHERE e2.src = e.dst AND e2.dst = e.src)),
        |n AS (SELECT count(*) AS n_edges FROM e)
        |SELECT CAST(n_edges AS BIGINT) AS n_edges,
        |  CAST(n_recip AS BIGINT) AS n_recip,
        |  CAST(n_recip * 1000000 // n_edges AS BIGINT) AS recip_ppm
        |FROM n CROSS JOIN r""".stripMargin,
    // knn-graph replica: the same one-Lloyd-iteration integer kmeans CTE
    // as cluster_cells, then a within-cell self-join scored by the exact
    // quantized dot, top-5 per node (dot desc, neighbor id asc). The
    // engine's adaptive k = max(4, n div 250) resolves to 4 at the
    // oracle's sf0.01 (500 vectors), matching the fixed vec_id < 4 seeds
    "embed_knn_graph" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS e
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, e AS c FROM q WHERE vec_id < 4),
        |d0 AS (SELECT q.vec_id, q.e, c0.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c0.c[i]) * (q.e[i] - c0.c[i]))) AS dist
        |  FROM q CROSS JOIN c0),
        |a0 AS (SELECT vec_id, e, cid FROM (
        |    SELECT vec_id, e, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d0) WHERE rn = 1),
        |s1 AS (SELECT cid, i,
        |    CAST(floor(sum(e[i])::DOUBLE / count(*)) AS BIGINT) AS v
        |  FROM a0 CROSS JOIN range(1, 65) t(i) GROUP BY cid, i),
        |c1 AS (SELECT cid, list(v ORDER BY i) AS c FROM s1 GROUP BY cid),
        |d1 AS (SELECT q.vec_id, q.e, c1.cid,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (q.e[i] - c1.c[i]) * (q.e[i] - c1.c[i]))) AS dist
        |  FROM q CROSS JOIN c1),
        |a1 AS (SELECT vec_id, e, cid AS cluster FROM (
        |  SELECT vec_id, e, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |  FROM d1) WHERE rn = 1),
        |p AS (SELECT x.vec_id AS a, y.vec_id AS b,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> x.e[i] * y.e[i])) AS BIGINT) AS dot_q
        |  FROM a1 x JOIN a1 y ON x.cluster = y.cluster
        |    AND x.vec_id <> y.vec_id)
        |SELECT a AS vec_id, rank, b AS neighbor, dot_q FROM (
        |  SELECT a, b, dot_q,
        |    CAST(row_number() OVER (
        |      PARTITION BY a ORDER BY dot_q DESC, b) AS BIGINT) AS rank
        |  FROM p) WHERE rank <= 5""".stripMargin,
    // transition-matrix replica: same lag window (ts, event_id order),
    // same truncating-ppm normalization per source state
    "q_events_markov" ->
      """WITH t AS (
        |  SELECT user_id, event_type AS next_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |g AS (SELECT prev_type, next_type,
        |    CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS tt
        |  FROM g GROUP BY prev_type)
        |SELECT g.prev_type, g.next_type, g.n_transitions,
        |  (g.n_transitions * 1000000) // tot.tt AS ppm
        |FROM g JOIN tot USING (prev_type)""".stripMargin,
    // the STREAMING transition matrix must equal the batch lag-window's
    // — the oracle is deliberately the same SQL as q_events_markov
    // (streaming/batch equivalence is the claim under test)
    "stream_markov" ->
      """WITH t AS (
        |  SELECT user_id, event_type AS next_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |g AS (SELECT prev_type, next_type,
        |    CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS tt
        |  FROM g GROUP BY prev_type)
        |SELECT g.prev_type, g.next_type, g.n_transitions,
        |  (g.n_transitions * 1000000) // tot.tt AS ppm
        |FROM g JOIN tot USING (prev_type)""".stripMargin,
    // cdc-cut replica: same chunking CTEs, canonical occurrence = first
    // (doc_id, chunk) per chunk md5, docs reassembled from survivors
    "dedup_cdc_cut" ->
      """WITH toks0 AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i AS INT)] AS tok
        |  FROM toks0, UNNEST(range(1, len(tk) + 1)) AS t(i)),
        |b AS (SELECT doc_id, pos, tok,
        |    CASE WHEN substr(md5(tok), 1, 1) < '2' THEN 1 ELSE 0 END AS f
        |  FROM tok),
        |c AS (SELECT doc_id, pos, tok,
        |    coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM b),
        |ch AS (SELECT doc_id, chunk,
        |    string_agg(tok, ' ' ORDER BY pos) AS chunk_str,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM c GROUP BY 1, 2),
        |r AS (SELECT doc_id, chunk, chunk_str, n_tokens,
        |    row_number() OVER (PARTITION BY md5(chunk_str)
        |      ORDER BY doc_id, chunk) AS occ
        |  FROM ch)
        |SELECT doc_id, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CASE WHEN occ = 1 THEN n_tokens END), 0)
        |    AS BIGINT) AS kept_tokens,
        |  coalesce(string_agg(CASE WHEN occ = 1 THEN chunk_str END,
        |    ' ' ORDER BY chunk), '') AS cleaned_text
        |FROM r GROUP BY doc_id""".stripMargin,
    // authority-gated curation replica: the graph_domain_rank CTEs plus
    // the bottom-half rank cut and the 2%-share trap gate
    "pipeline_domains" ->
      """WITH si AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM si),
        |docs AS (
        |  SELECT d.source, d.doc_id,
        |    CASE WHEN d.doc_id % 13 = 0 THEN 0
        |         ELSE si.sidx*20 + (d.doc_id//20)%20 END AS src,
        |    ((si.sidx + d.doc_id) % ns.n_src)*20 + (d.doc_id//7)%20 AS dst
        |  FROM documents d JOIN si USING (source) CROSS JOIN ns),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |  FROM docs GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
        |r0 AS (SELECT node, 1000000000000 // nn.n AS r
        |  FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r0 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c1 c USING (node) CROSS JOIN nn),
        |c2 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r1 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c2 c USING (node) CROSS JOIN nn),
        |c3 AS (SELECT e.dst AS node, CAST(sum((r.r*e.w)//o.ow) AS BIGINT) AS c
        |  FROM e JOIN r2 r ON e.src = r.node JOIN o ON e.src = o.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |    (coalesce(c.c, 0)*85)//100 + ((1000000000000//nn.n)*15)//100 AS r
        |  FROM nodes n LEFT JOIN c3 c USING (node) CROSS JOIN nn),
        |ranked AS (SELECT node,
        |    CAST(row_number() OVER (ORDER BY r, node) AS BIGINT) * 2
        |      <= (SELECT n FROM nn) AS low_authority
        |  FROM r3),
        |nd AS (SELECT src, CAST(count(*) AS BIGINT) AS ndocs
        |  FROM docs GROUP BY src),
        |traps AS (SELECT src,
        |    ndocs * 50 > (SELECT CAST(sum(ndocs) AS BIGINT) FROM nd)
        |      AS trap_suspect
        |  FROM nd)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN NOT rk.low_authority AND NOT tr.trap_suspect
        |    THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        |  CAST(sum(CASE WHEN rk.low_authority THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped_low_authority,
        |  CAST(sum(CASE WHEN tr.trap_suspect AND NOT rk.low_authority
        |    THEN 1 ELSE 0 END) AS BIGINT) AS dropped_trap
        |FROM docs d JOIN ranked rk ON d.src = rk.node
        |JOIN traps tr ON d.src = tr.src
        |GROUP BY d.source""".stripMargin,
    // anisotropy replica: same floor(x*1024) quantization, hugeint sums,
    // same sign*(abs(num)//n^2) truncating normalization
    "embed_anisotropy" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 1024) AS BIGINT)) AS q
        |  FROM embeddings),
        |n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM q),
        |m AS (SELECT i, CAST(sum(q[i]) AS HUGEINT) AS m
        |  FROM q CROSS JOIN range(1, 65) t(i) GROUP BY i),
        |p AS (SELECT i, j, CAST(sum(q[i] * q[j]) AS HUGEINT) AS s
        |  FROM q CROSS JOIN range(1, 65) t(i) CROSS JOIN range(1, 65) u(j)
        |  WHERE j > i GROUP BY i, j),
        |cov AS (SELECT p.i, p.j,
        |    n.n * p.s - mi.m * mj.m AS num, n.n AS n
        |  FROM p JOIN m mi ON p.i = mi.i JOIN m mj ON p.j = mj.i
        |  CROSS JOIN n),
        |c AS (SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
        |    CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
        |      (abs(num) // (n * n)) AS BIGINT) AS cov_q2
        |  FROM cov)
        |SELECT rank, dim_i, dim_j, cov_q2 FROM (
        |  SELECT dim_i, dim_j, cov_q2,
        |    CAST(row_number() OVER (
        |      ORDER BY abs(cov_q2) DESC, dim_i, dim_j) AS BIGINT) AS rank
        |  FROM c) WHERE rank <= 20""".stripMargin,
    // incremental-CDC replica: history chunks from even docs form the
    // hash index; odd-doc batch chunks left-join it; same rollup
    // incremental-CC ground truth: the DELTA between the full corpus's
    // exact all-pairs-Jaccard components and batch 1's (even docs) own
    // components — every (doc_id, component) row the merge must create
    // or change, nothing else. Same bigram-shingle convention as
    // dedup_components; comp1 over the even-even edge subset.
    "dedup_cc_incremental" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |pr AS (SELECT a, b FROM p WHERE jaccard >= 0.4),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id),
        |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
        |edges1 AS (SELECT s, d FROM edges WHERE s % 2 = 0 AND d % 2 = 0),
        |reach1 AS (
        |  SELECT s AS id, s AS r FROM edges1
        |  UNION
        |  SELECT e.s AS id, reach1.r AS r FROM edges1 e JOIN reach1 ON e.d = reach1.id),
        |comp1 AS (SELECT id AS doc_id, MIN(r) AS component FROM reach1 GROUP BY id)
        |SELECT c.doc_id, c.component FROM comp c
        |LEFT JOIN comp1 o
        |  ON c.doc_id = o.doc_id AND c.component = o.component
        |WHERE o.doc_id IS NULL""".stripMargin,
    // the chained label TABLE after write-back must equal the
    // full-corpus all-pairs-Jaccard CC doc for doc — both write-back
    // legs (label upsert + index refresh) are load-bearing for this
    "dedup_cc_writeback" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |pr AS (SELECT a, b FROM p WHERE jaccard >= 0.4),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id)
        |SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id""".stripMargin,
    // fixed-point multiplicative weights replay exactly: 5 unrolled
    // raw/normalize CTE pairs, all-BIGINT arithmetic (explicit casts
    // where DuckDB widens sums to HUGEINT)
    "mix_doremi" ->
      """WITH perdoc AS (
        |  SELECT source,
        |    CAST(len(list_filter(regexp_split_to_array(lower(coalesce(text,'')),
        |      '[^a-z0-9]+'), x -> len(x) > 0)) AS BIGINT) AS tk
        |  FROM documents),
        |dom AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(tk) AS BIGINT) AS su FROM perdoc GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
        |    CAST(sum(su) AS BIGINT) AS ts,
        |    CAST(count(*) AS BIGINT) AS kk FROM dom),
        |b0 AS (SELECT source, n_docs, kk, su // n_docs AS mean_utility,
        |    ts // tn AS g FROM dom, tot),
        |b1 AS (SELECT source, n_docs, kk, mean_utility,
        |    greatest(g - mean_utility, 0) * 1048576 // greatest(g, 1) AS excess_fp
        |  FROM b0),
        |it0 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    CAST(1048576 // kk AS BIGINT) AS wfp FROM b1),
        |r1 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    wfp * (1048576 + (262144 * excess_fp // 1048576)) // 1048576 AS raw FROM it0),
        |it1 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    CAST(raw * 1048576 // CAST(sum(raw) OVER () AS BIGINT) AS BIGINT) AS wfp FROM r1),
        |r2 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    wfp * (1048576 + (262144 * excess_fp // 1048576)) // 1048576 AS raw FROM it1),
        |it2 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    CAST(raw * 1048576 // CAST(sum(raw) OVER () AS BIGINT) AS BIGINT) AS wfp FROM r2),
        |r3 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    wfp * (1048576 + (262144 * excess_fp // 1048576)) // 1048576 AS raw FROM it2),
        |it3 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    CAST(raw * 1048576 // CAST(sum(raw) OVER () AS BIGINT) AS BIGINT) AS wfp FROM r3),
        |r4 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    wfp * (1048576 + (262144 * excess_fp // 1048576)) // 1048576 AS raw FROM it3),
        |it4 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    CAST(raw * 1048576 // CAST(sum(raw) OVER () AS BIGINT) AS BIGINT) AS wfp FROM r4),
        |r5 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    wfp * (1048576 + (262144 * excess_fp // 1048576)) // 1048576 AS raw FROM it4),
        |it5 AS (SELECT source, n_docs, kk, mean_utility, excess_fp,
        |    CAST(raw * 1048576 // CAST(sum(raw) OVER () AS BIGINT) AS BIGINT) AS wfp FROM r5)
        |SELECT source, n_docs, mean_utility, excess_fp,
        |  CAST(wfp * (1048576 - 16384) // 1048576 + 16384 // kk AS BIGINT) AS weight_fp,
        |  CAST(CAST(wfp * (1048576 - 16384) // 1048576 + 16384 // kk AS BIGINT) AS DOUBLE)
        |    / 1048576 AS weight
        |FROM it5""".stripMargin,
    "dedup_cdc_incremental" ->
      """WITH toks0 AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i AS INT)] AS tok
        |  FROM toks0, UNNEST(range(1, len(tk) + 1)) AS t(i)),
        |b AS (SELECT doc_id, pos, tok,
        |    CASE WHEN substr(md5(tok), 1, 1) < '2' THEN 1 ELSE 0 END AS f
        |  FROM tok),
        |c AS (SELECT doc_id, pos, tok,
        |    coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM b),
        |ch AS (SELECT doc_id, chunk,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM c GROUP BY 1, 2),
        |idx AS (SELECT DISTINCT chunk_hash FROM ch WHERE doc_id % 2 = 0),
        |batch AS (SELECT * FROM ch WHERE doc_id % 2 = 1)
        |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CASE WHEN i.chunk_hash IS NOT NULL
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS known_chunks,
        |  CAST(coalesce(sum(CASE WHEN i.chunk_hash IS NOT NULL
        |    THEN b.n_tokens ELSE 0 END), 0) AS BIGINT) AS known_tokens,
        |  coalesce(sum(CASE WHEN i.chunk_hash IS NOT NULL
        |    THEN b.n_tokens ELSE 0 END), 0) * 2 >= sum(b.n_tokens)
        |    AS mostly_known
        |FROM batch b LEFT JOIN idx i USING (chunk_hash)
        |GROUP BY b.doc_id""".stripMargin,
    // CDC replica: same md5-hex boundary rule, same strictly-before
    // running boundary count, same ordered string_agg chunk hash
    "text_cdc_chunks" ->
      """WITH toks0 AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0) AS tk
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i AS INT)] AS tok
        |  FROM toks0, UNNEST(range(1, len(tk) + 1)) AS t(i)),
        |b AS (SELECT doc_id, pos, tok,
        |    CASE WHEN substr(md5(tok), 1, 1) < '2' THEN 1 ELSE 0 END AS f
        |  FROM tok),
        |c AS (SELECT doc_id, pos, tok,
        |    coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM b),
        |ch AS (SELECT doc_id, chunk,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM c GROUP BY 1, 2)
        |SELECT chunk_hash, n_tokens,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_copies
        |FROM ch GROUP BY 1, 2
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    // same floor(x/s + 0.5) arithmetic; arrays reduce to sum/min/max so
    // the compare stays scalar
    "embed_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127
        |      AS scale
        |  FROM embeddings),
        |q AS (SELECT vec_id, scale,
        |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding,
        |           x -> CAST(floor(x::DOUBLE / scale + 0.5) AS BIGINT))
        |    END AS qv
        |  FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS qsum,
        |  CAST(list_min(qv) AS BIGINT) AS qmin,
        |  CAST(list_max(qv) AS BIGINT) AS qmax
        |FROM q""".stripMargin,
    // exact replica of Quantization.quantizeInt4Block: per-16-dim-block
    // absmax scales, floor round-half-up, scalar folds
    "embed_quantize_int4" ->
      """WITH s AS (
        |  SELECT vec_id, embedding AS v,
        |    list_transform(range(0, CAST(ceil(len(embedding) / 16.0) AS INT)),
        |      j -> list_max(list_transform(
        |             list_slice(embedding, j*16 + 1, j*16 + 16),
        |             x -> abs(x::DOUBLE))) / 7.0) AS scales
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, scales,
        |    list_transform(range(1, len(v) + 1),
        |      i -> CASE WHEN scales[(i-1)//16 + 1] = 0 THEN 0
        |                ELSE CAST(floor(v[i]::DOUBLE / scales[(i-1)//16 + 1]
        |                                + 0.5) AS BIGINT) END) AS qv
        |  FROM s)
        |SELECT vec_id,
        |  CAST(len(scales) AS BIGINT) AS n_blocks,
        |  list_max(scales) AS scale_max,
        |  CAST(list_sum(qv) AS BIGINT) AS qsum,
        |  CAST(list_min(qv) AS BIGINT) AS qmin,
        |  CAST(list_max(qv) AS BIGINT) AS qmax
        |FROM q""".stripMargin,
    // exact replica of Sampling.weightedSample: per-row rate
    // min(1, 0.1·w·N/ΣW) rendered to the 16-bit hex threshold
    "sample_weighted" ->
      """WITH tot AS (
        |  SELECT CAST(SUM(n_chars) AS DOUBLE) AS W,
        |         CAST(count(*) AS DOUBLE) AS N
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |    LEAST(1.0, 0.1 * CAST(n_chars AS DOUBLE) * N / W) AS rate
        |  FROM documents, tot)
        |SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM r
        |WHERE n_chars > 0
        |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |    CASE WHEN rate >= 1.0
        |           OR CAST(round(rate * 65536) AS BIGINT) >= 65536 THEN 'g'
        |         ELSE printf('%04x', CAST(round(rate * 65536) AS BIGINT))
        |    END""".stripMargin,
    // exact replica of Sampling.splitAssign's cumulative hex cuts
    "sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |         printf('%04x', CAST(round(0.8 * 65536) AS BIGINT))
        |       THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |         printf('%04x', CAST(round((0.8 + 0.1) * 65536) AS BIGINT))
        |       THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    // the dedup_resolve recursive-CTE components + sample_split's hash
    // cuts keyed on each doc's component representative
    "sample_split_leakfree" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |pr AS (SELECT a, b FROM p WHERE jaccard >= 0.4),
        |edges AS (SELECT a AS s, b AS d FROM pr UNION SELECT b AS s, a AS d FROM pr),
        |reach AS (
        |  SELECT s AS id, s AS r FROM edges
        |  UNION
        |  SELECT e.s AS id, reach.r AS r FROM edges e JOIN reach ON e.d = reach.id),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |rep AS (
        |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS r
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
        |SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(r AS VARCHAR)), 1, 4) <
        |         printf('%04x', CAST(round(0.8 * 65536) AS BIGINT))
        |       THEN 'train'
        |       WHEN substr(md5(CAST(r AS VARCHAR)), 1, 4) <
        |         printf('%04x', CAST(round((0.8 + 0.1) * 65536) AS BIGINT))
        |       THEN 'val'
        |       ELSE 'test' END AS split
        |FROM rep""".stripMargin,
    // exact replica of TextAnalysis.readability: vowel-group syllables,
    // [.!?]+ sentences (floor 1), fixed-order Flesch expression
    "text_readability" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |      x -> len(x) > 0) AS ws,
        |    GREATEST(1, len(list_filter(
        |      regexp_split_to_array(lower(trim(text)), '[.!?]+'),
        |      s -> len(trim(s)) > 0))) AS ns
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(ns AS BIGINT) AS n_sentences,
        |    CAST(COALESCE(list_sum(list_transform(ws,
        |      x -> GREATEST(1, len(list_filter(
        |             regexp_split_to_array(x, '[^aeiouy]+'),
        |             g -> len(g) > 0))))), 0) AS BIGINT) AS n_syllables
        |  FROM w)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words = 0 THEN NULL
        |       ELSE 206.835
        |            - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |            - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
        |  END AS flesch
        |FROM c""".stripMargin,
    // exact replica of TextAnalysis.tokenLengthHistogram: log2 bands
    "corpus_lengths" ->
      """WITH n AS (
        |  SELECT CAST(len(list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0))
        |    AS BIGINT) AS n
        |  FROM documents)
        |SELECT
        |  CASE WHEN n = 0 THEN -1
        |       ELSE CAST(floor(log2(n)) AS BIGINT) END AS band,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens
        |FROM n GROUP BY 1""".stripMargin,
    // exact replica of TextAnalysis.scriptMix: per-script regexp counts,
    // fixed-priority dominance, 15% non-dominant mixed flag
    "text_scripts" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN '汉字文本处理流水线质量检查'
        |         WHEN doc_id % 9 = 0
        |           THEN text || ' добавленный русский текст для проверки'
        |         ELSE text END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
        |    CAST(length(regexp_replace(text, '[^\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |    CAST(length(regexp_replace(text, '[^\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
        |    CAST(length(regexp_replace(text, '[^\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
        |    CAST(length(regexp_replace(text, '[^\x{0900}-\x{097F}]', '', 'g')) AS BIGINT) AS n_devanagari,
        |    CAST(length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
        |    CAST(length(regexp_replace(text, '[^\x{AC00}-\x{D7AF}]', '', 'g')) AS BIGINT) AS n_hangul,
        |    CAST(length(regexp_replace(text, '[^\x{3040}-\x{30FF}]', '', 'g')) AS BIGINT) AS n_kana
        |  FROM d),
        |g AS (
        |  SELECT *,
        |    n_latin + n_cyrillic + n_greek + n_arabic + n_devanagari
        |      + n_cjk + n_hangul + n_kana AS n_letters,
        |    GREATEST(n_latin, n_cyrillic, n_greek, n_arabic, n_devanagari,
        |      n_cjk, n_hangul, n_kana) AS top
        |  FROM c)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic,
        |  n_devanagari, n_cjk, n_hangul, n_kana, n_letters,
        |  CASE WHEN top = 0 THEN 'none'
        |       WHEN n_latin = top THEN 'latin'
        |       WHEN n_cyrillic = top THEN 'cyrillic'
        |       WHEN n_greek = top THEN 'greek'
        |       WHEN n_arabic = top THEN 'arabic'
        |       WHEN n_devanagari = top THEN 'devanagari'
        |       WHEN n_cjk = top THEN 'cjk'
        |       WHEN n_hangul = top THEN 'hangul'
        |       ELSE 'kana' END AS dominant,
        |  n_letters > 0 AND
        |    CAST(n_letters - top AS DOUBLE) / n_letters >= 0.15 AS mixed
        |FROM g""".stripMargin,
    // exact replica of TextAnalysis.vocabCoverage: corpus top-1000 word
    // vocabulary (count desc, word asc), per-doc OOV counts
    "text_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> len(x) > 0)) AS w
        |  FROM documents),
        |v AS (SELECT w FROM (
        |  SELECT w, count(*) AS c FROM toks GROUP BY w
        |  ORDER BY c DESC, w ASC LIMIT 1000)),
        |pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN w IN (SELECT w FROM v) THEN 0 ELSE 1 END)
        |      AS BIGINT) AS noov
        |  FROM toks GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(nt, 0) AS n_tokens,
        |  COALESCE(noov, 0) AS n_oov,
        |  CASE WHEN COALESCE(nt, 0) = 0 THEN 0.0
        |       ELSE CAST(noov AS DOUBLE) / nt END AS oov_rate
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin,
    // exact replica of Dedup.containmentPairs incl. the df cap: planted
    // middle-half excerpts, df-capped inverted-index candidates, exact
    // intersect containment
    "dedup_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, substr(trim(text),
        |    CAST(floor(length(trim(text)) / 4) AS INT) + 1,
        |    CAST(floor(length(trim(text)) / 2) AS INT))
        |  FROM documents WHERE doc_id % 13 = 0),
        |s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM corpus)),
        |f AS (SELECT doc_id, sh FROM s WHERE len(sh) >= 4),
        |inv AS (SELECT doc_id, unnest(sh) AS h FROM f),
        |hot AS (SELECT h FROM inv GROUP BY h HAVING count(*) BETWEEN 2 AND 64),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM inv x JOIN inv y ON x.h = y.h AND x.doc_id < y.doc_id
        |  WHERE x.h IN (SELECT h FROM hot)),
        |p AS (
        |  SELECT c.a, c.b,
        |    CAST(len(sa.sh) AS BIGINT) AS size_a,
        |    CAST(len(sb.sh) AS BIGINT) AS size_b,
        |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS shared
        |  FROM cand c JOIN f sa ON sa.doc_id = c.a
        |              JOIN f sb ON sb.doc_id = c.b)
        |SELECT a, b, size_a, size_b, shared,
        |  CAST(shared AS DOUBLE) / LEAST(size_a, size_b) AS containment
        |FROM p
        |WHERE CAST(shared AS DOUBLE) / LEAST(size_a, size_b) >= 0.8""".stripMargin,
    "profile_columns" ->
      """SELECT 'doc_id' AS "column", count(*) AS n_rows,
        |  count(*) - count(doc_id) AS n_nulls,
        |  count(DISTINCT doc_id) AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_value,
        |  CAST(max(doc_id) AS VARCHAR) AS max_value FROM documents
        |UNION ALL
        |SELECT 'text', count(*), count(*) - count(text),
        |  count(DISTINCT text), min(text), max(text) FROM documents
        |UNION ALL
        |SELECT 'lang', count(*), count(*) - count(lang),
        |  count(DISTINCT lang), min(lang), max(lang) FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(*) - count(source),
        |  count(DISTINCT source), min(source), max(source) FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |  count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
        |  CAST(max(n_chars) AS VARCHAR) FROM documents""".stripMargin,
    // the Bloom prefilter provably changes nothing (survivors are exactly
    // re-verified), so the oracle is decontaminate's, verbatim
    "decontaminate_bloom" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 2),
        |    i -> list_aggregate(w[i:i+3], 'string_agg', ' ')))) AS ng
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0)
        |SELECT DISTINCT g.doc_id AS doc_id FROM g JOIN bench USING (ng)
        |WHERE g.doc_id % 97 <> 0""".stripMargin,
    // chunking law replayed in SQL: nchunks from the ceil formula, each
    // chunk a 1-based list_slice of the shared token array
    "text_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n,
        |  CASE WHEN len(w) <= 32 THEN 1
        |       ELSE CAST(ceil((len(w) - 32)::DOUBLE / 24) AS BIGINT) + 1
        |  END AS nc FROM d),
        |e AS (SELECT doc_id, w, n, unnest(range(nc)) AS chunk_id FROM c)
        |SELECT doc_id, chunk_id,
        |  array_to_string(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32),
        |    ' ') AS chunk_text,
        |  least(32, n - chunk_id * 24) AS n_tokens
        |FROM e""".stripMargin,
    // two-batch incremental curation: batch boundaries replayed by the
    // doc_id % 3 split; curated = quality gate + min-doc_id dedup within
    // batch + fingerprint anti-join against the earlier batch
    "pipeline_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE n_chars >= 200),
        |b1 AS (SELECT MIN(doc_id) AS doc_id, fp FROM d
        |       WHERE doc_id % 3 <> 2 GROUP BY fp),
        |b2 AS (SELECT MIN(doc_id) AS doc_id, fp FROM d
        |       WHERE doc_id % 3 = 2 AND fp NOT IN (SELECT fp FROM b1)
        |       GROUP BY fp)
        |SELECT doc_id, fp FROM b1 UNION ALL SELECT doc_id, fp FROM b2""".stripMargin,
    // full composed pipeline: each CTE replicates the matching stage's
    // standalone oracle (quality gate, min-doc_id exact dedup, 4-gram
    // decontamination, md5-threshold mixture sampling, prefix-sum packing)
    "pipeline_corpus" ->
      """WITH q AS (SELECT * FROM documents WHERE n_chars >= 200),
        |dd AS (SELECT * FROM q
        |       WHERE doc_id IN (SELECT MIN(doc_id) FROM q GROUP BY text)),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 2),
        |    i -> list_aggregate(w[i:i+3], 'string_agg', ' ')))) AS ng
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0),
        |flagged AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (ng)
        |            WHERE g.doc_id % 97 <> 0),
        |clean AS (SELECT * FROM dd WHERE doc_id % 97 <> 0
        |          AND doc_id NOT IN (SELECT doc_id FROM flagged)),
        |hist AS (SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS tok
        |         FROM clean GROUP BY source),
        |wts AS (SELECT * FROM (VALUES ('src0', 0.3), ('src1', 0.3), ('src2', 0.4))
        |        AS t(source, wt)),
        |tot AS (SELECT SUM(tok) AS T FROM hist),
        |rates AS (SELECT wts.source, LEAST(1.0, 0.6 * wt * T / tok) AS rate
        |          FROM wts JOIN hist ON wts.source = hist.source, tot),
        |thr AS (SELECT source,
        |    CASE WHEN rate >= 1.0 OR CAST(round(rate * 65536) AS BIGINT) >= 65536
        |         THEN 'g'
        |         ELSE printf('%04x', CAST(round(rate * 65536) AS BIGINT)) END AS h
        |  FROM rates),
        |mixed AS (SELECT c.* FROM clean c JOIN thr ON c.source = thr.source
        |          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < h),
        |toks AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM mixed),
        |c AS (SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM toks)
        |SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard_id FROM c""".stripMargin,
    "dedup_lsh_pairs" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
        |SELECT a, b, jaccard FROM p WHERE jaccard >= 0.4""".stripMargin,
    "dedup_minhash_sigs" ->
      """SELECT doc_id, CAST(64 AS BIGINT) AS n_hashes, true AS union_min_ok
        |FROM documents""".stripMargin,
    "dedup_sweep" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id),
        |h AS (
        |  SELECT LEAST(CAST(floor(jaccard * 10) AS BIGINT), 9) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM p WHERE jaccard >= 0.4 GROUP BY 1)
        |SELECT bucket, n_pairs,
        |  CAST(SUM(n_pairs) OVER (ORDER BY bucket DESC) AS BIGINT)
        |    AS pairs_at_or_above
        |FROM h""".stripMargin,
    "dedup_simhash_pairs" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
        |SELECT a, b, jaccard FROM p WHERE jaccard >= 0.9""".stripMargin,
    "dedup_simhash" ->
      "SELECT doc_id, true AS order_ok, true AS scale_ok FROM documents",
    "text_fingerprint" ->
      "SELECT doc_id, true AS split_min_ok FROM documents",
    // exact replica of the marker-stopword heuristic (TextUtil.langId):
    // per-language marker counts, strict-improvement argmax in declaration
    // order, 'und' on zero evidence (the corpus is ASCII, CJK never fires)
    "text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |counts AS (
        |  SELECT doc_id, max(n) AS max_count FROM (
        |    SELECT doc_id, word, count(*) AS n FROM (
        |      SELECT doc_id, unnest(words) AS word FROM base)
        |    GROUP BY doc_id, word)
        |  GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(words)),
        |      i -> words[i] || ' ' || words[i + 1]) AS bigrams
        |  FROM base)
        |SELECT b.doc_id,
        |  CAST(len(b.words) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(b.words)) AS DOUBLE) / len(b.words)
        |    AS distinct_word_ratio,
        |  CAST(c.max_count AS DOUBLE) / len(b.words) AS top_word_frac,
        |  CASE WHEN len(g.bigrams) > 0
        |    THEN 1.0 - CAST(len(list_distinct(g.bigrams)) AS DOUBLE) / len(g.bigrams)
        |    ELSE 0.0 END AS dup_bigram_frac
        |FROM base b JOIN counts c USING (doc_id) JOIN bg g USING (doc_id)""".stripMargin,
    "text_langid" ->
      """WITH sc AS (
        |  SELECT doc_id,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','is','in','that','it','was','for','with','not','this'))) AS s_en,
        |    len(list_filter(w, x -> x IN ('le','la','les','de','des','et','est','une','un','dans','que','pour','pas'))) AS s_fr,
        |    len(list_filter(w, x -> x IN ('el','la','los','las','de','y','es','en','que','un','una','por','con','no'))) AS s_es,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','ist','in','von','den','mit','nicht','ein','eine','zu'))) AS s_de,
        |    len(list_filter(w, x -> x IN ('il','la','di','che','e','un','una','per','non','sono','con','del'))) AS s_it,
        |    len(list_filter(w, x -> x IN ('o','a','os','as','de','que','e','um','uma','para','com','nao'))) AS s_pt
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |        FROM documents))
        |SELECT doc_id,
        |  CASE WHEN GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) = 0 THEN 'und'
        |       WHEN s_en = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'en'
        |       WHEN s_fr = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'fr'
        |       WHEN s_es = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'es'
        |       WHEN s_de = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'de'
        |       WHEN s_it = GREATEST(s_en,s_fr,s_es,s_de,s_it,s_pt) THEN 'it'
        |       ELSE 'pt' END AS lang_pred
        |FROM sc""".stripMargin,
    "ice_roundtrip" -> "SELECT * FROM customer",
    "ice_object_storage" -> "SELECT * FROM supplier",
    "ice_manifest_merge" -> "SELECT * FROM orders",
    "ice_metrics_mode" ->
      """SELECT substring(min(text),1,4) AS lower_text,
        |       substring(max(text),1,3) || chr(unicode(substring(max(text),4,1))+1) AS upper_text,
        |       min(doc_id) AS doc_lo, max(doc_id) AS doc_hi,
        |       CAST(0 AS BIGINT) AS lang_bound_files,
        |       CAST(count(*) AS BIGINT) AS rows_total
        |FROM documents""".stripMargin,
    "ice_partitioned_scan" ->
      """SELECT * FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin,
    "ice_eq_delete" -> "SELECT * FROM orders WHERE o_orderstatus <> 'F'",
    "ice_eq_convert" ->
      "SELECT * FROM orders WHERE o_orderstatus <> 'F' AND o_orderpriority <> '1-URGENT'",
    "ice_metadata_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus <> 'F'""".stripMargin,
    "ice_orc_table" -> "SELECT * FROM orders WHERE o_orderkey % 4 <> 1",
    "ice_avro_table" -> "SELECT * FROM orders WHERE o_orderkey % 6 <> 2",
    "ice_row_lineage" ->
      """SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)
        |  + row_number() OVER (ORDER BY o_orderkey) - 1
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin,
    "stats_partitions" ->
      """SELECT o_orderpriority, count(*) AS data_record_count
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "stats_ndv" ->
      """SELECT 'o_orderkey' AS column_name, count(DISTINCT o_orderkey) AS ndv FROM orders
        |UNION ALL SELECT 'o_custkey', count(DISTINCT o_custkey) FROM orders
        |UNION ALL SELECT 'o_orderstatus', count(DISTINCT o_orderstatus) FROM orders
        |UNION ALL SELECT 'o_totalprice', count(DISTINCT o_totalprice) FROM orders
        |UNION ALL SELECT 'o_orderdate', count(DISTINCT o_orderdate) FROM orders
        |UNION ALL SELECT 'o_orderpriority', count(DISTINCT o_orderpriority) FROM orders""".stripMargin,
    "ice_pos_delete" -> "SELECT * FROM orders WHERE o_orderkey % 10 <> 0",
    "ice_pos_delete_compact" -> "SELECT * FROM orders WHERE o_orderkey % 97 >= 12",
    "ice_dv_delete" ->
      "SELECT * FROM orders WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 3",
    "ice_dv_rewrite" -> "SELECT * FROM orders WHERE o_orderkey % 50 >= 6",
    "ice_add_files" -> "SELECT * FROM supplier",
    "ice_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 <> 0""".stripMargin,
    "ice_time_travel" -> "SELECT * FROM orders WHERE o_orderkey % 2 = 0",
    "ice_zorder" -> "SELECT * FROM orders",
    "ice_hilbert" -> "SELECT * FROM orders",
    "ice_sort_rewrite" -> "SELECT * FROM orders",
    "ice_wap" -> "SELECT * FROM orders",
    "ice_incremental_sql" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 1",
    "text_pii" ->
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text || ' contact_' || doc_id || '@example.com or 555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\d{3}-\d{4}', '[PHONE]', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\d{3}-\d{4}')) AS BIGINT) AS n_phones
        |FROM seeded""".stripMargin,
    "ice_rollback" -> "SELECT * FROM orders WHERE o_orderkey % 2 = 0",
    "ice_type_widening" ->
      """SELECT c_custkey,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CASE WHEN c_custkey % 2 = 0
        |       THEN CAST(CAST(c_acctbal AS REAL) AS DOUBLE)
        |       ELSE c_acctbal END AS c_acctbal
        |FROM customer""".stripMargin,
    "ice_changelog" ->
      """SELECT *, 'insert' AS _change_type FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT *, 'delete' FROM orders WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT *, 'delete' FROM orders WHERE o_orderkey % 7 = 3""".stripMargin,
    "sql_changelog_view" ->
      """SELECT 'insert' AS _change_type, CAST(count(*) AS BIGINT) AS n
        |FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT 'delete' AS _change_type, CAST(count(*) AS BIGINT) AS n
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "ice_changelog_net" ->
      """SELECT *, 'insert' AS _change_type FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT *, 'delete' FROM orders
        |WHERE o_orderkey % 10 = 0 AND o_orderkey % 20 <> 0
        |UNION ALL
        |SELECT *, 'update_preimage' FROM orders
        |WHERE o_orderkey % 14 = 2 AND o_orderkey % 10 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 5.0 AS o_totalprice, o_orderdate, o_orderpriority,
        |  'update_postimage' FROM orders
        |WHERE o_orderkey % 14 = 2 AND o_orderkey % 10 <> 0""".stripMargin,
    "ice_changelog_compact" ->
      """SELECT *, 'insert' AS _change_type FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT *, 'delete' FROM orders WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT *, 'delete' FROM orders
        |WHERE o_orderkey % 7 = 3 AND o_orderkey % 10 <> 0""".stripMargin,
    "ice_spec_evolution" -> "SELECT * FROM orders WHERE o_orderstatus = 'F'",
    "sql_spec_evolution" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F'""".stripMargin,
    "sql_wap_branch" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "ice_runtime_prune" ->
      """SELECT o_orderstatus AS status, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY 1""".stripMargin,
    "ice_spj_join" ->
      """SELECT c_mktsegment AS seg, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "ice_agg_pushdown" ->
      """SELECT count(*) AS cnt, count(l_returnflag) AS cnt_flag,
        |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,
    "ice_compact" -> "SELECT * FROM orders WHERE o_orderstatus <> 'P'",
    "ice_merge_schema" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(NULL AS BIGINT) AS n_regionkey FROM nation
        |UNION ALL
        |SELECT CAST(n_nationkey AS BIGINT), n_name,
        |  CAST(n_regionkey AS BIGINT) FROM nation""".stripMargin,
    "ice_schema_evolution" ->
      """SELECT n_nationkey, n_name, n_regionkey, CAST(NULL AS DOUBLE) AS score,
        |  'standard' AS grade FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, n_nationkey * 2.0 AS score,
        |  'standard' AS grade FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, n_nationkey * 2.0 AS score,
        |  'rated' AS grade FROM nation""".stripMargin,
    "ice_tag_scan" -> "SELECT * FROM region WHERE r_regionkey < 3",
    "ice_time_uuid" ->
      """SELECT o_orderkey,
        |  (o_orderkey % 86400000) * 1000 AS event_time,
        |  concat_ws('-',
        |    substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8),
        |    substring(md5(CAST(o_orderkey AS VARCHAR)), 9, 4),
        |    substring(md5(CAST(o_orderkey AS VARCHAR)), 13, 4),
        |    substring(md5(CAST(o_orderkey AS VARCHAR)), 17, 4),
        |    substring(md5(CAST(o_orderkey AS VARCHAR)), 21, 12)) AS event_uuid
        |FROM orders""".stripMargin,
    "sql_mor_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus <> 'F'""".stripMargin,
    "sql_delete_where" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000.0)""".stripMargin,
    "sql_merge_update" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1.0
        |       WHEN o_orderstatus = 'P' THEN o_totalprice * 2.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin,
    // variant round-trip: the typed extractions recover exactly the
    // source fields the payload was built from
    "ice_variant" ->
      """SELECT event_id, event_type AS etype, user_id AS uid,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE event_id % 7 <> 0""".stripMargin,
    "ice_timestamp_ns" ->
      """WITH ns AS (
        |  SELECT event_id, event_type, epoch_us(ts) * 1000 AS ts_ns FROM events),
        |cut AS (SELECT MIN(ts_ns) + 3 * 86400000000000 AS c FROM ns)
        |SELECT ts_ns // 86400000000000 AS ts_day, event_type,
        |  COUNT(*) AS n, MIN(ts_ns) AS min_ns, MAX(ts_ns) AS max_ns
        |FROM ns, cut WHERE ts_ns >= c
        |GROUP BY 1, 2""".stripMargin,
    "sql_dml_cow" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 1.0
        |       WHEN o_orderstatus = 'O' THEN o_totalprice * 3.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 5 <> 0
        |UNION ALL
        |SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 5 = 0""".stripMargin,
    "ice_small_compact" ->
      """SELECT * FROM orders WHERE o_orderstatus <> 'P'
        |UNION ALL
        |SELECT * FROM orders WHERE o_orderkey % 500 IN (0, 1, 2) AND o_orderstatus <> 'P'""".stripMargin,
    "sql_overwrite_partition" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin,
    "ice_sorted_write" -> "SELECT * FROM orders",
    "rest_catalog" -> "SELECT * FROM region",
    "rest_sql_catalog" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey % 10 <> 0""".stripMargin,
    "sql_catalog" -> "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'",
    "sql_functions" ->
      """SELECT p_partkey,
        |  p_size - ((p_size % 10 + 10) % 10) AS t_size,
        |  SUBSTRING(p_name, 1, 4) AS t_name
        |FROM part""".stripMargin,
    "stream_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    "stream_cdc_upsert" ->
      """SELECT user_id, event_id, event_type, value, ts
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,
    "stream_sink_append" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    // staged on a branch then published: same rows as a direct append
    "stream_branch" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    // the doubled feed dedups back to exactly the distinct event set
    "stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events GROUP BY event_type""".stripMargin,
    "stream_changelog" ->
      """SELECT *, 'insert' AS _change_type FROM orders
        |UNION ALL
        |SELECT *, 'delete' AS _change_type FROM orders
        |WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'P'""".stripMargin,
    "stream_stream_join" ->
      // micros-truncated comparisons on BOTH bounds: Spark reads the
      // nanos timestamps truncated to micros, so the oracle must compare
      // at the same precision or boundary pairs flip
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000""".stripMargin,
    "stream_watermark_windows" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n_events
        |FROM events
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <=
        |  (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "stream_sessions_state" ->
      """WITH gapped AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM gapped),
        |agg AS (
        |  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |    COUNT(*) AS n_events,
        |    MIN(ts) AS session_start, MAX(ts) AS session_end
        |  FROM sessions GROUP BY user_id, session_idx)
        |SELECT * FROM agg
        |WHERE session_idx < (SELECT MAX(session_idx) FROM agg a2
        |                     WHERE a2.user_id = agg.user_id)""".stripMargin,
    "meta_snapshots" ->
      """SELECT 'append' AS operation, CAST(1 AS BIGINT) AS sequence_number,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O') AS total_records
        |UNION ALL
        |SELECT 'append', CAST(2 AS BIGINT), (SELECT COUNT(*) FROM orders)
        |UNION ALL
        |SELECT 'delete', CAST(3 AS BIGINT), (SELECT COUNT(*) FROM orders)""".stripMargin,
    "meta_files" ->
      """SELECT l_returnflag, 0 AS content, 'parquet' AS file_format,
        |  COUNT(*) AS record_count
        |FROM lineitem GROUP BY 1""".stripMargin,
    "meta_partitions" ->
      "SELECT l_returnflag, COUNT(*) AS record_count FROM lineitem GROUP BY 1",
    "sql_branch_ident" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey % 7 = 0""".stripMargin,
    // the 4096-record rolling cut makes file counts a pure function of
    // per-partition row counts
    "meta_compaction_plan" ->
      """WITH p AS (
        |  SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  CAST(ceil(n / 4096.0) AS BIGINT) AS n_files,
        |  CAST(n AS BIGINT) AS records,
        |  CAST(CASE WHEN n % 4096 <> 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_small,
        |  ceil(n / 4096.0) > 1 AND (n % 4096) <> 0 AS needs_compaction
        |FROM p""".stripMargin,
    "meta_split_files" ->
      """SELECT 'data' AS side, CAST(count(*) AS BIGINT) AS records FROM orders
        |UNION ALL
        |SELECT 'delete' AS side, CAST(count(*) AS BIGINT) AS records
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "meta_readable_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_values,
        |  CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_status,
        |  CAST(sum(CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nan_vals,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders""".stripMargin,
    "meta_position_deletes" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_parquet_deletes,
        |  CAST(count(*) AS BIGINT) AS n_dv_deletes
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "meta_all_files" ->
      """SELECT 0 AS content,
        |  CAST(count(*) +
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS BIGINT)
        |    AS record_count
        |FROM orders""".stripMargin,
    "meta_refs" ->
      """SELECT * FROM (VALUES ('dev','BRANCH'), ('main','BRANCH'), ('v1','TAG'))
        |AS t(name, type)""".stripMargin,
    "meta_manifests" ->
      """SELECT 0 AS content,
        |  CAST(2 * (SELECT COUNT(*) FROM region) AS BIGINT) AS added_rows,
        |  CAST(2 AS INT) AS manifest_count""".stripMargin,
    "meta_history" ->
      """SELECT * FROM (VALUES (true, CAST(3 AS BIGINT)), (false, CAST(1 AS BIGINT)))
        |AS t(is_current_ancestor, n)""".stripMargin,
    "sql_procedures" -> "SELECT o_orderkey, o_orderstatus FROM orders",
    "sql_snapshot_table" ->
      """SELECT 'src' AS side, o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey % 7 <> 0
        |UNION ALL
        |SELECT 'fork' AS side, o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey % 7 <> 0 AND o_orderkey % 2 <> 0""".stripMargin,
    "rest_register_table" ->
      "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 5 <> 0",
    "sql_ctas" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 1",
    "meta_entries" ->
      """SELECT 1 AS status, 0 AS content,
        |  CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_rows
        |UNION ALL
        |SELECT 1 AS status, 1 AS content, CAST(1 AS BIGINT) AS n_rows""".stripMargin,
    "sql_views" ->
      "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
    "meta_metadata_log" ->
      """SELECT * FROM (VALUES (false, CAST(2 AS BIGINT)), (true, CAST(1 AS BIGINT)))
        |AS t(is_current, n)""".stripMargin,
  )
}
