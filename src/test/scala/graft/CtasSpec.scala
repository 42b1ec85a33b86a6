package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Atomic CTAS / RTAS through StagingTableCatalog. */
class CtasSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-ctas-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gctas", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gctas.warehouse", wh)
    s
  }
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def wh = spark.conf.get("spark.sql.catalog.gctas.warehouse")

  test("CREATE TABLE AS SELECT lands data atomically") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gctas.db")
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("ctas_src")
    spark.sql("DROP TABLE IF EXISTS gctas.db.ctas1")
    spark.sql(
      "CREATE TABLE gctas.db.ctas1 AS SELECT o_orderkey, o_orderstatus FROM ctas_src")
    val got = spark.table("gctas.db.ctas1").orderBy("o_orderkey").collect()
    val exp = spark.sql("SELECT o_orderkey, o_orderstatus FROM ctas_src")
      .orderBy("o_orderkey").collect()
    assert(got.toSeq === exp.toSeq)
    // exactly one committed metadata version: the publish commit
    assert(StorageCatalog.currentVersion(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/ctas1") === 1)
  }

  test("CTAS with PARTITIONED BY plants a real partition spec") {
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("ctas_src")
    spark.sql("DROP TABLE IF EXISTS gctas.db.ctas2")
    spark.sql(
      """CREATE TABLE gctas.db.ctas2 PARTITIONED BY (o_orderstatus)
        |AS SELECT o_orderkey, o_orderstatus FROM ctas_src""".stripMargin)
    val t = StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/ctas2")
    assert(t.metadata.defaultSpec.fields.map(_.name) === List("o_orderstatus"))
    // partition pruning works on the CTAS output
    val expF = spark.sql("SELECT count(*) FROM ctas_src WHERE o_orderstatus = 'F'")
      .collect().head.getLong(0)
    assert(spark.sql("SELECT count(*) FROM gctas.db.ctas2 WHERE o_orderstatus = 'F'")
      .collect().head.getLong(0) === expF)
  }

  test("REPLACE TABLE AS SELECT is atomic; old table survives a failed one") {
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("ctas_src")
    spark.sql("DROP TABLE IF EXISTS gctas.db.rtas")
    spark.sql("CREATE TABLE gctas.db.rtas AS SELECT o_orderkey FROM ctas_src WHERE o_orderkey % 2 = 0")
    val before = spark.table("gctas.db.rtas").count()
    // failed RTAS: the SELECT throws mid-write -> old contents intact
    intercept[Exception] {
      spark.sql(
        """REPLACE TABLE gctas.db.rtas AS
          |SELECT CAST(raise_error('boom') AS BIGINT) AS o_orderkey FROM ctas_src""".stripMargin)
    }
    assert(spark.table("gctas.db.rtas").count() === before)
    assert(spark.table("gctas.db.rtas").filter($"o_orderkey" % 2 === 1).count() === 0)
    // successful RTAS swaps contents in one commit
    spark.sql("REPLACE TABLE gctas.db.rtas AS SELECT o_orderkey FROM ctas_src WHERE o_orderkey % 2 = 1")
    assert(spark.table("gctas.db.rtas").filter($"o_orderkey" % 2 === 0).count() === 0)
    assert(spark.table("gctas.db.rtas").count() > 0)
  }

  test("CREATE OR REPLACE TABLE AS SELECT works whether or not the table exists") {
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("ctas_region")
    spark.sql("DROP TABLE IF EXISTS gctas.db.corts")
    spark.sql("CREATE OR REPLACE TABLE gctas.db.corts AS SELECT * FROM ctas_region")
    assert(spark.table("gctas.db.corts").count() === 5)
    spark.sql("CREATE OR REPLACE TABLE gctas.db.corts AS SELECT * FROM ctas_region WHERE r_regionkey < 2")
    assert(spark.table("gctas.db.corts").count() === 2)
  }

  test("TRUNCATE TABLE is a metadata-only delete snapshot; table stays writable") {
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("ctas_region")
    spark.sql("DROP TABLE IF EXISTS gctas.db.trunc")
    spark.sql("CREATE TABLE gctas.db.trunc AS SELECT * FROM ctas_region")
    assert(spark.table("gctas.db.trunc").count() === 5)
    spark.sql("TRUNCATE TABLE gctas.db.trunc")
    assert(spark.table("gctas.db.trunc").count() === 0)
    // no data rewritten: the truncate snapshot is operation=delete with 0 adds
    val ops = spark.sql(
      "SELECT operation FROM gctas.db.trunc.snapshots ORDER BY committed_at")
      .collect().map(_.getString(0))
    assert(ops.last === "delete")
    spark.sql("INSERT INTO gctas.db.trunc SELECT * FROM ctas_region WHERE r_regionkey = 0")
    assert(spark.table("gctas.db.trunc").count() === 1)
  }

  test("plain CREATE TABLE AS SELECT on an existing table fails") {
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("ctas_region")
    spark.sql("DROP TABLE IF EXISTS gctas.db.dup")
    spark.sql("CREATE TABLE gctas.db.dup AS SELECT * FROM ctas_region")
    intercept[Exception] {
      spark.sql("CREATE TABLE gctas.db.dup AS SELECT * FROM ctas_region")
    }
    assert(spark.table("gctas.db.dup").count() === 5)
  }
}
