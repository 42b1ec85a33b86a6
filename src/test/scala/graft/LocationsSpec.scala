package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** LocationProvider coverage: `write.data.path` (data outside
  * {location}/data) and `write.object-storage.enabled` (hash-prefixed
  * paths that spread S3-style request load across store partitions). */
class LocationsSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s
  }

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val sfDir = "/root/testdata/sf0.001"
  private val hashDirRe = """.*/[01]{4}/[01]{4}/[01]{4}/[01]{8}/.*"""

  test("hashDirs: deterministic 4/4/4/8 binary layout") {
    val d = Locations.hashDirs("abc/file.parquet")
    assert(d.matches("""[01]{4}/[01]{4}/[01]{4}/[01]{8}"""))
    assert(d === Locations.hashDirs("abc/file.parquet"))
    assert(d !== Locations.hashDirs("abc/file2.parquet"))
  }

  test("write.data.path: files land outside {location}/data, reads stay id-resolved") {
    val src = spark.read.parquet(s"$sfDir/supplier.parquet")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val dataDir = tmpLocation("ext-data")
    val t = StorageCatalog
      .createOrReplaceTable(conf, tmpLocation("dp-tbl"), schema,
        IcePartitionSpec(0, Nil))
      .setProperties(Map("write.data.path" -> dataDir))
      .append(spark, src)
    val paths = t.planFiles(t.metadata.currentSnapshot.get).map(_.file.filePath)
    assert(paths.nonEmpty && paths.forall(_.startsWith(dataDir)))
    assert(t.scan(spark).count() === src.count())
    // id resolution survives a rename because the external-data-path file
    // still counts as table-internal
    val t2 = t.renameColumn("s_name", "supplier_name")
    val got = t2.scan(spark).select("supplier_name").na.drop().count()
    assert(got === src.count())
  }

  test("object storage layout: per-batch hash prefixes, exact scan-back, orphan sweep") {
    val src = spark.read.parquet(s"$sfDir/supplier.parquet")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val loc = tmpLocation("obj-tbl")
    var t = StorageCatalog
      .createOrReplaceTable(conf, loc, schema, IcePartitionSpec(0, Nil))
      .setProperties(Map("write.object-storage.enabled" -> "true"))
    t = t.append(spark, src).append(spark, src)
    val paths = t.planFiles(t.metadata.currentSnapshot.get).map(_.file.filePath)
    assert(paths.nonEmpty && paths.forall(_.matches(hashDirRe)), paths.take(2))
    // two write batches spread across (almost surely) distinct prefixes
    assert(paths.map(_.replaceAll("/[^/]*$", "")).distinct.size >= 2)
    assert(t.scan(spark).count() === 2 * src.count())
    // recursive orphan sweep walks the hash dirs: plant an orphan inside
    // one and reclaim it while every live file survives
    val livePrefix = paths.head.replaceAll("/[^/]*$", "")
    val orphan = new org.apache.hadoop.fs.Path(s"$livePrefix/orphan.parquet")
    val fs = orphan.getFileSystem(conf)
    val out = fs.create(orphan); out.write(1); out.close()
    fs.setTimes(orphan, 1000L, -1)
    val removed = t.removeOrphanFiles(System.currentTimeMillis() + 100000)
    // the planted orphan goes (plus the stock writer's _SUCCESS markers);
    // every live data file survives
    assert(removed.exists(_.endsWith("orphan.parquet")))
    assert(removed.forall(p => p.endsWith("orphan.parquet") || p.endsWith("_SUCCESS")))
    assert(!fs.exists(orphan))
    assert(t.scan(spark).count() === 2 * src.count())
  }

  test("object storage via SQL insert: per-FILE hash prefixes on the DSv2 path") {
    val src = spark.read.parquet(s"$sfDir/supplier.parquet")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.loc_obj")
    spark.sql(
      """CREATE TABLE graft.db.loc_obj (s_suppkey BIGINT, s_name STRING)
        |TBLPROPERTIES ('write.object-storage.enabled'='true')""".stripMargin)
    src.select("s_suppkey", "s_name").repartition(3)
      .createOrReplaceTempView("loc_src")
    spark.sql("INSERT INTO graft.db.loc_obj SELECT * FROM loc_src")
    val files = spark.sql("SELECT file_path FROM graft.db.loc_obj.files")
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.matches(hashDirRe)), files.take(2))
    // one insert, several tasks: sibling files get DIFFERENT prefixes
    // (per-file minting, not per-batch)
    if (files.size >= 2)
      assert(files.map(_.replaceAll("/[^/]*$", "")).distinct.size >= 2, files.toSeq)
    val n = spark.sql("SELECT count(*) FROM graft.db.loc_obj").collect()(0).getLong(0)
    assert(n === src.count())
    spark.sql("DROP TABLE graft.db.loc_obj")
  }

  test("DROP TABLE purges an external write.data.path prefix too") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val ext = tmpLocation("drop-ext")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.loc_drop")
    spark.sql(
      s"""CREATE TABLE graft.db.loc_drop (r_regionkey BIGINT, r_name STRING)
         |TBLPROPERTIES ('write.data.path'='$ext')""".stripMargin)
    src.select("r_regionkey", "r_name").createOrReplaceTempView("loc_drop_src")
    spark.sql("INSERT INTO graft.db.loc_drop SELECT * FROM loc_drop_src")
    val p = new org.apache.hadoop.fs.Path(ext)
    val fs = p.getFileSystem(conf)
    assert(fs.exists(p) && fs.listStatus(p).nonEmpty)
    spark.sql("DROP TABLE graft.db.loc_drop")
    assert(!fs.exists(p), "external data prefix must purge with the table")
  }
}
