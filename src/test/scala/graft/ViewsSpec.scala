package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Persisted SQL views through the V2 ViewCatalog. */
class ViewsSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-view-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gview", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gview.warehouse", wh)
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gview.db")
    spark.sql("DROP TABLE IF EXISTS gview.db.vt")
    spark.sql("CREATE TABLE gview.db.vt (r_regionkey INT, r_name STRING)")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("vsrc")
    spark.sql("INSERT INTO gview.db.vt SELECT * FROM vsrc")
  }

  test("CREATE VIEW / SELECT / SHOW VIEWS / DROP VIEW round-trip") {
    setup()
    spark.sql("DROP VIEW IF EXISTS gview.db.v1")
    spark.sql("CREATE VIEW gview.db.v1 AS SELECT r_name FROM gview.db.vt WHERE r_regionkey < 2")
    assert(spark.table("gview.db.v1").count() === 2)
    // view survives a fresh resolution (definition is re-parsed from disk)
    assert(spark.sql("SELECT * FROM gview.db.v1 ORDER BY r_name").collect()
      .map(_.getString(0)).toSeq === Seq("AFRICA", "AMERICA"))
    val views = spark.sql("SHOW VIEWS IN gview.db").collect().map(_.getString(1))
    assert(views.contains("v1"))
    spark.sql("DROP VIEW gview.db.v1")
    intercept[Exception] { spark.table("gview.db.v1").count() }
  }

  test("view tracks base-table changes (definition, not snapshot)") {
    setup()
    spark.sql("DROP VIEW IF EXISTS gview.db.v2")
    spark.sql("CREATE VIEW gview.db.v2 AS SELECT count(*) AS n FROM gview.db.vt")
    assert(spark.table("gview.db.v2").collect().head.getLong(0) === 5)
    spark.sql("INSERT INTO gview.db.vt SELECT * FROM vsrc")
    assert(spark.table("gview.db.v2").collect().head.getLong(0) === 10)
  }

  test("CREATE OR REPLACE VIEW swaps the definition") {
    setup()
    spark.sql("CREATE OR REPLACE VIEW gview.db.v3 AS SELECT r_name FROM gview.db.vt")
    assert(spark.table("gview.db.v3").count() === 5)
    spark.sql("CREATE OR REPLACE VIEW gview.db.v3 AS SELECT r_name FROM gview.db.vt WHERE r_regionkey = 0")
    assert(spark.table("gview.db.v3").count() === 1)
  }
}
