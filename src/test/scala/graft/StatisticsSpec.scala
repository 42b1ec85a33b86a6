package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Table statistics: NDV computation -> puffin statistics file ->
  * `statistics` metadata -> planner consumption (DSv2 column stats). */
class StatisticsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def freshTable(name: String, src: org.apache.spark.sql.DataFrame): GraftTable =
    StorageCatalog.createOrReplaceTable(
      conf, tmpLocation(name), SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, Nil))

  test("exact NDV stats: puffin file + metadata registration + ndvStats") {
    val src = spark.range(0, 1000)
      .selectExpr("id AS k", "cast(id % 37 AS string) AS v", "cast(id % 5 AS int) AS b")
    val t0 = freshTable("stats-exact", src)
    t0.append(spark, src)
    val t = t0.computeTableStats(spark, approximate = false)
    val st = t.metadata.statistics.last
    assert(st.snapshotId === t.metadata.currentSnapshotId.get)
    assert(st.blobMetadata.size === 3)
    assert(st.fileSizeInBytes > 0 && st.fileFooterSizeInBytes > 0)
    // blob properties carry the ndv planners read
    val schema = t.metadata.currentSchema
    val byName = st.blobMetadata
      .map(b => schema.fieldById(b.fields.head).get.name -> b.properties("ndv").toLong)
      .toMap
    assert(byName("k") === 1000L)
    assert(byName("v") === 37L)
    assert(byName("b") === 5L)
    // the puffin file itself round-trips (footer + blob body)
    val (blobs, _) = Puffin.readFooter(conf, st.statisticsPath)
    assert(blobs.forall(_.blobType === GraftTable.NdvBlobType))
    val body = Puffin.readBlob(conf, st.statisticsPath, blobs.head.offset, blobs.head.length)
    val v = java.nio.ByteBuffer.wrap(body)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(v === blobs.head.properties("ndv").toLong)
    // plan-time map (no file IO)
    val ids = schema.fields.map(f => f.name -> f.id).toMap
    assert(t.ndvStats(ids("k")) === 1000L && t.ndvStats(ids("v")) === 37L)
  }

  test("approximate mode (HLL++, the at-scale path) is the DEFAULT") {
    val src = spark.range(0, 10000).selectExpr("id AS k", "cast(id % 123 AS string) AS v")
    val t0 = freshTable("stats-approx", src)
    t0.append(spark, src)
    // no approximate argument: the default must be the no-expand HLL++
    // path (exact count_distinct over every column is the at-scale foot-gun)
    val t = t0.computeTableStats(spark)
    val st = t.metadata.statistics.last
    assert(st.blobMetadata.forall(_.properties.get("approximate").contains("true")))
    val schema = t.metadata.currentSchema
    val kNdv = st.blobMetadata
      .find(b => b.fields.headOption.contains(schema.findField("k").get.id))
      .get.properties("ndv").toLong
    assert(math.abs(kNdv - 10000L) < 1000L)
  }

  test("DSv2 scans report distinctCount + nullCount column stats") {
    val src = spark.range(0, 500)
      .selectExpr("id AS k", "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('v', id % 25) END AS v")
    val t0 = freshTable("stats-cbo", src)
    t0.append(spark, src)
    val t = t0.computeTableStats(spark, approximate = false)
    val v2 = new graft.spark.GraftV2Table(t, None, None)
    val scan = v2.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of())).build()
    val est = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(est.numRows().getAsLong === 500L)
    val cs = est.columnStats()
    assert(!cs.isEmpty)
    val vRef = cs.keySet().stream()
      .filter(_.fieldNames().sameElements(Array("v"))).findFirst().get()
    val vStats = cs.get(vRef)
    assert(vStats.distinctCount().getAsLong === 25L)
    assert(vStats.nullCount().getAsLong === 50L)
  }

  test("latest stats at-or-below current snapshot serve after more appends") {
    val src = spark.range(0, 100).selectExpr("id AS k")
    val t0 = freshTable("stats-stale", src)
    t0.append(spark, src)
    val t1 = t0.computeTableStats(spark, approximate = false)
    val kId = t1.metadata.currentSchema.findField("k").get.id
    assert(t1.ndvStats(kId) === 100L)
    // a later append keeps serving the (now slightly stale) stats
    val t2 = t1.append(spark, spark.range(100, 150).selectExpr("id AS k"))
    assert(t2.ndvStats(kId) === 100L)
    // recompute refreshes
    val t3 = t2.computeTableStats(spark, approximate = false)
    assert(t3.ndvStats(kId) === 150L)
    assert(t3.metadata.statistics.size === 2) // one entry per analyzed snapshot
  }

  test("NDV column stats reach Spark's optimizer plan statistics (CBO)") {
    val src = spark.range(0, 2000)
      .selectExpr("id AS k", "cast(id % 50 AS string) AS v")
    val t0 = freshTable("stats-cbo-plan", src)
    t0.append(spark, src)
    val t = t0.computeTableStats(spark, approximate = false)
    val wh = t.location
    spark.conf.set("spark.sql.catalog.cbocat", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cbocat.warehouse",
      new java.io.File(wh).getParent)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // the facade scan rides the same DSv2 planning; read the
      // optimized-plan statistics of the bare scan (a filter on top
      // would correctly RE-estimate ndv downward via FilterEstimation)
      val df = t.scan(spark)
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong === 2000L))
      // per-attribute stats present: distinctCount flowed from the
      // registered statistics file through estimateStatistics
      val attr = stats.attributeStats.find(_._1.name == "v").map(_._2)
      assert(attr.exists(_.distinctCount.exists(_.toLong === 50L)))
      // and the estimator actually uses it: filtering v = '7' collapses
      // the column's ndv estimate to 1
      val fstats = t.scan(spark).filter(col("v") === "7")
        .queryExecution.optimizedPlan.stats
      val fattr = fstats.attributeStats.find(_._1.name == "v").map(_._2)
      assert(fattr.exists(_.distinctCount.exists(_.toLong === 1L)))
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.catalog.cbocat")
      spark.conf.unset("spark.sql.catalog.cbocat.warehouse")
    }
  }

  test("partition statistics file: manifest rollups, registration, delete tallies") {
    val src = spark.range(0, 300)
      .selectExpr("id AS k", "cast(id % 3 AS int) AS b3", "concat('v', id) AS v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val t0 = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("pstats"), schema,
      IcePartitionSpec(0, List(IcePartitionField(
        schema.findField("b3").get.id, 1000, "identity", "b3"))))
    t0.append(spark, src)
    val t1 = t0.deleteWhere(spark, col("k") < 30) // pos-delete files land per partition
    val t = t1.computePartitionStats(spark)
    val entry = t.metadata.partitionStatistics.last
    assert(entry.snapshotId === t.metadata.currentSnapshotId.get)
    assert(entry.fileSizeInBytes > 0)
    val rows = spark.read.parquet(entry.statisticsPath)
      .selectExpr("partition.b3", "data_record_count",
        "position_delete_record_count", "position_delete_file_count")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2))
    assert(rows.map(_._2).toSeq === Seq(100L, 100L, 100L))
    assert(rows.map(_._3).sum === 30L) // deleted positions tallied per partition
    assert(rows.forall(_._4 >= 1L))
    // reload from disk round-trips the registration
    val re = StorageCatalog.loadTable(conf, t.location)
    assert(re.metadata.partitionStatistics.map(_.statisticsPath) ===
      List(entry.statisticsPath))
  }

  test("CALL compute_table_stats procedure") {
    val wh = tmpLocation("stats-proc-wh")
    spark.conf.set("spark.sql.catalog.statcat", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.statcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS statcat.db")
      spark.sql("CREATE TABLE statcat.db.t (k BIGINT, v STRING)")
      spark.sql("INSERT INTO statcat.db.t SELECT id, concat('v', id % 7) FROM range(0, 200)")
      val res = spark.sql(
        "CALL statcat.system.compute_table_stats(table => 'db.t', columns => 'v')")
        .collect()
      assert(res.length === 1 && res.head.getLong(1) === 1L)
      val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
      val st = t.metadata.statistics.last
      // procedure default is the approximate path; HLL++ is exact at this
      // tiny cardinality so the value assertion stays precise
      assert(st.blobMetadata.head.properties.get("approximate").contains("true"))
      assert(st.blobMetadata.head.properties("ndv").toLong === 7L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS statcat.db.t")
      spark.conf.unset("spark.sql.catalog.statcat")
      spark.conf.unset("spark.sql.catalog.statcat.warehouse")
    }
  }

  test("snapshot expiry drops expired snapshots' statistics entries and files") {
    import spark.implicits._
    val src = spark.range(0, 500).selectExpr("id AS k", "cast(id % 7 AS string) AS v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val vId = schema.findField("v").get.id
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("stats-expire"), schema,
      IcePartitionSpec(0, List(IcePartitionField(vId, 1000, "identity", "v"))))
    t.append(spark, src)
    t.computeTableStats(spark).computePartitionStats(spark)
    val oldStats = t.metadata.statistics.last
    val oldPart = t.metadata.partitionStatistics.last
    val s1 = t.metadata.currentSnapshotId.get
    // a second snapshot with its own stats generation
    t.append(spark, Seq((10001L, "x")).toDF("k", "v"))
    t.computeTableStats(spark).computePartitionStats(spark)
    val s2 = t.metadata.currentSnapshotId.get
    assert(t.metadata.statistics.map(_.snapshotId).toSet === Set(s1, s2))
    // expire everything but the current snapshot
    t.expireSnapshots(System.currentTimeMillis() + 1000L, retainLast = 1)
    val after = t.metadata
    assert(after.snapshots.map(_.snapshotId) === List(s2))
    assert(after.statistics.map(_.snapshotId) === List(s2))
    assert(after.partitionStatistics.map(_.snapshotId) === List(s2))
    // expired generations' files are reclaimed; kept ones remain
    def exists(p: String) = new java.io.File(new java.net.URI(
      if (p.startsWith("file:")) p else s"file://$p").getPath).exists()
    assert(!exists(oldStats.statisticsPath), "expired puffin file not reclaimed")
    assert(!exists(oldPart.statisticsPath), "expired partition-stats file not reclaimed")
    assert(exists(after.statistics.last.statisticsPath))
    assert(exists(after.partitionStatistics.last.statisticsPath))
  }
}
