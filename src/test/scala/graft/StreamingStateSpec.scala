package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Rate-limited streaming source + cross-batch stateful sessionization. */
class StreamingStateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("max-seqs-per-trigger drains a commit backlog in bounded batches") {
    val loc = Files.createTempDirectory("graft-rate").toFile.getAbsolutePath + "/t"
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc, schema, IcePartitionSpec(0, Nil))
    (1 to 3).foreach(i => tbl.append(spark, src.filter(col("id") === i)))

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-stream")
      .option("location", loc)
      .option("max-seqs-per-trigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += b.count() }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // 3 committed snapshots -> 3 rate-limited batches of 1 row each
    assert(batchSizes.filter(_ > 0).toSeq === Seq(1L, 1L, 1L))
  }

  test("ref option streams a branch's lineage, not main's") {
    val loc = Files.createTempDirectory("graft-refstream").toFile.getAbsolutePath + "/t"
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    var tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc, schema, IcePartitionSpec(0, Nil))
    tbl = tbl.append(spark, src.filter(col("id") === 1)) // main: id 1
    // audit branch forks from main and takes ids 2,3; main then takes 4 —
    // the interleaved MAIN commit's sequence sits inside the branch range
    tbl = tbl.appendToBranch(spark, src.filter(col("id") === 2), "audit")
    tbl = tbl.append(spark, src.filter(col("id") === 4))
    tbl = tbl.appendToBranch(spark, src.filter(col("id") === 3), "audit")

    def drain(refOpt: Option[String]): Set[Long] = {
      val seen = scala.collection.mutable.Set[Long]()
      var r = spark.readStream.format("graft-stream").option("location", loc)
      refOpt.foreach(x => r = r.option("ref", x))
      val q = r.load().writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("id").collect().map(_.getLong(0)) }
          ()
        }
        .start()
      q.awaitTermination(60000)
      q.stop()
      seen.toSet
    }
    assert(drain(Some("audit")) === Set(1L, 2L, 3L)) // fork base + branch commits
    assert(drain(None) === Set(1L, 4L))              // main lineage only
  }

  test("Trigger.AvailableNow drains the backlog and terminates on its own") {
    val loc = Files.createTempDirectory("graft-avnow").toFile.getAbsolutePath + "/t"
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc, schema, IcePartitionSpec(0, Nil))
    (1 to 4).foreach(i => tbl.append(spark, src.filter(col("id") === i)))

    var total = 0L
    val q = spark.readStream.format("graft-stream")
      .option("location", loc)
      .option("max-seqs-per-trigger", "2") // rate limit still applies per batch
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        total += b.count(); ()
      }
      .start()
    // AvailableNow must terminate WITHOUT an explicit stop once the
    // backlog present at start is drained
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(total === 4L)
  }

  test("stateful sessions carry open state across micro-batches") {
    // user 10: one session split across two commits (gap < 30 min), then a
    // second session; user 20: a single session (never emitted)
    val m = 60L * 1000000L // one minute in micros
    val rows = Seq(
      (10L, 1L, 0L * m), (10L, 2L, 10L * m), // session 1 first half
      (20L, 3L, 5L * m),
      (10L, 4L, 25L * m), // session 1 continues in commit 2 (gap 15 min)
      (10L, 5L, 90L * m), // gap 65 min -> session 2
      (20L, 6L, 20L * m))
    val df = rows.toDF("user_id", "event_id", "ts_us")
    val schema = SchemaConvert.fromSparkSchema(df.schema)
    val loc = Files.createTempDirectory("graft-sess").toFile.getAbsolutePath + "/t"
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc, schema, IcePartitionSpec(0, Nil))
    tbl.append(spark, df.filter(col("event_id") <= 3))
    tbl.append(spark, df.filter(col("event_id") > 3))

    val name = s"sess_state_${System.nanoTime()}"
    val q = graft.streaming.StatefulSessions.sessions(
        spark.readStream.format("graft-stream")
          .option("location", loc)
          .option("max-seqs-per-trigger", "1")
          .load(),
        gapUs = 1800L * 1000000L)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name)
      .select("user_id", "session_idx", "n_events", "session_start_us", "session_end_us")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // only user 10's FIRST session closed (by event 5); it spans both
    // commits: events 1,2 from batch 1 plus event 4 from batch 2
    assert(out.toSeq === Seq((10L, 1L, 3L, 0L, 25L * m)))
  }

  test("stateful transitions carry the last event across micro-batches") {
    // user 10's batch boundary falls between events 2 and 3: the (b->c)
    // transition exists ONLY if state carried event 2 into batch 2.
    // Within-batch order is scrambled on purpose (step sorts by ts, id).
    val m = 60L * 1000000L
    val rows = Seq(
      (10L, 2L, 10L * m, "b"), (10L, 1L, 0L * m, "a"), // batch 1, out of order
      (20L, 3L, 5L * m, "x"),
      (10L, 4L, 30L * m, "c"), // batch 2: cross-boundary transition b->c
      (20L, 5L, 20L * m, "y"))
    val df = rows.toDF("user_id", "event_id", "ts_us", "event_type")
    val schema = SchemaConvert.fromSparkSchema(df.schema)
    val loc = Files.createTempDirectory("graft-trans").toFile.getAbsolutePath + "/t"
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc, schema, IcePartitionSpec(0, Nil))
    tbl.append(spark, df.filter(col("event_id") <= 3))
    tbl.append(spark, df.filter(col("event_id") > 3))

    val name = s"trans_state_${System.nanoTime()}"
    val q = graft.streaming.StatefulTransitions.transitions(
        spark.readStream.format("graft-stream")
          .option("location", loc)
          .option("max-seqs-per-trigger", "1")
          .load())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name)
      .as[(Long, String, String)].collect().sorted
    assert(out.toSeq === Seq(
      (10L, "a", "b"), (10L, "b", "c"), (20L, "x", "y")))
  }

  test("sink mode=upsert with no keys upserts by the declared identifier fields") {
    val loc = Files.createTempDirectory("graft-idsink").toFile.getAbsolutePath + "/t"
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc,
      SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    tbl.setIdentifierFields(Seq("id"))
    tbl.append(spark, src)

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      1, spark, None)
    mem.addData((2L, "B"), (3L, "c"))
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-stream")
      .option("location", loc)
      .option("mode", "upsert")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-idsink-ckpt").toFile.getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = StorageCatalog.loadTable(spark.sparkContext.hadoopConfiguration, loc)
      .scan(spark).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("sink stages on a branch: main untouched until fast-forward publish") {
    val loc = Files.createTempDirectory("graft-brsink").toFile.getAbsolutePath + "/t"
    val src = Seq((1L, "a")).toDF("id", "v")
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc,
      SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    tbl.append(spark, src)

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      2, spark, None)
    mem.addData((2L, "b"), (3L, "c"))
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-stream")
      .option("location", loc)
      .option("branch", "audit")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-brsink-ckpt").toFile.getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val t2 = StorageCatalog.loadTable(spark.sparkContext.hadoopConfiguration, loc)
    // staged rows live only on the branch
    assert(t2.scan(spark).count() === 1)
    assert(t2.scanRef(spark, "audit").count() === 3)
    // publish = fast-forward main to the audit head
    t2.fastForward("main", "audit")
    assert(t2.scan(spark).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // branch + upsert is refused at sink construction
    val bad = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-stream")
      .option("location", loc)
      .option("branch", "audit")
      .option("mode", "upsert")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-brsink-ckpt2").toFile.getAbsolutePath)
    intercept[Exception] { val s = bad.start(); s.awaitTermination(); }
  }

  test("changelog stream: per-batch CDC rows, deletes carry content, rewrites emit nothing") {
    val loc = Files.createTempDirectory("graft-cdcstream").toFile.getAbsolutePath + "/t"
    val src = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc, schema, IcePartitionSpec(0, Nil))
    tbl.append(spark, src.filter(col("id") <= 10))          // seq 1
    tbl.equalityDelete(spark,                               // seq 2
      Seq(3L, 7L).toDF("id"), Seq("id"))
    tbl.rewriteDataFiles(spark)                             // seq 3 (rewrite)
    tbl.append(spark, src.filter(col("id") > 10))           // seq 4

    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, String)]]
    val q = spark.readStream.format("graft-stream")
      .option("location", loc)
      .option("mode", "changelog")
      .option("max-seqs-per-trigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
        batches.synchronized { if (rows.nonEmpty) batches += rows }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val nonEmpty = batches.toSeq
    // 3 non-empty batches: insert 1-10, delete {3,7} WITH content, insert
    // 11-20; the compaction batch contributes nothing
    assert(nonEmpty.size === 3)
    assert(nonEmpty(0).map(_._1).sorted === (1L to 10L))
    assert(nonEmpty(0).forall(_._3 == "insert"))
    assert(nonEmpty(1).toSet === Set((3L, "v3", "delete"), (7L, "v7", "delete")))
    assert(nonEmpty(2).map(_._1).sorted === (11L to 20L))
    assert(nonEmpty(2).forall(_._3 == "insert"))
  }
}
