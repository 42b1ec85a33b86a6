package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only aggregate pushdown: COUNT/MIN/MAX answered from manifest
  * stats as a LocalTableScan — and every fallback path stays correct. */
class StatsAggSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-statsagg-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gsa", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gsa.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsa.db")
    s
  }

  private def isMetadataOnly(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("GraftNativeBatchScan") &&
      !plan.contains("GraftMorScan")
  }

  private def setup(): Unit = {
    spark.sql("DROP TABLE IF EXISTS gsa.db.orders")
    spark.sql(
      """CREATE TABLE gsa.db.orders (
        |  o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        |  o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ)""".stripMargin)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .createOrReplaceTempView("sa_orders_src")
    spark.sql("INSERT INTO gsa.db.orders SELECT * FROM sa_orders_src")
  }

  test("count/min/max answered from manifest stats as LocalTableScan") {
    setup()
    val agg = spark.sql(
      """SELECT count(*) AS cnt, count(o_custkey) AS cnt_ck,
        |  min(o_orderkey) AS min_k, max(o_orderkey) AS max_k,
        |  min(o_totalprice) AS min_p, max(o_totalprice) AS max_p,
        |  min(o_orderdate) AS min_d, max(o_orderdate) AS max_d
        |FROM gsa.db.orders""".stripMargin)
    assert(isMetadataOnly(agg), agg.queryExecution.executedPlan.toString)
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val exp = src.selectExpr(
      "count(*)", "count(o_custkey)", "min(o_orderkey)", "max(o_orderkey)",
      "min(o_totalprice)", "max(o_totalprice)", "min(o_orderdate)", "max(o_orderdate)")
      .head()
    assert(agg.head() === exp)
  }

  test("multiple appends aggregate across all snapshots' files") {
    spark.sql("DROP TABLE IF EXISTS gsa.db.multi")
    spark.sql("CREATE TABLE gsa.db.multi (k INT, v DOUBLE)")
    spark.sql("INSERT INTO gsa.db.multi VALUES (5, 1.5), (7, 2.5)")
    spark.sql("INSERT INTO gsa.db.multi VALUES (1, -3.0), (9, 0.5)")
    val agg = spark.sql(
      "SELECT count(*) AS c, min(k) AS mn, max(k) AS mx, min(v) AS vmn, max(v) AS vmx FROM gsa.db.multi")
    assert(isMetadataOnly(agg))
    assert(agg.head().toSeq === Seq(4L, 1, 9, -3.0, 2.5))
  }

  test("nulls: count(col) subtracts null counts; all-null file skips bounds") {
    spark.sql("DROP TABLE IF EXISTS gsa.db.nulls")
    spark.sql("CREATE TABLE gsa.db.nulls (k INT, v INT)")
    spark.sql("INSERT INTO gsa.db.nulls VALUES (1, NULL), (2, 4), (3, NULL)")
    spark.sql("INSERT INTO gsa.db.nulls VALUES (4, NULL), (5, NULL)") // all-null file
    val agg = spark.sql(
      "SELECT count(*) AS c, count(v) AS cv, min(v) AS mn, max(v) AS mx FROM gsa.db.nulls")
    assert(isMetadataOnly(agg))
    assert(agg.head().toSeq === Seq(5L, 1L, 4, 4))
  }

  test("NaN in a double column vetoes MIN/MAX pushdown (answers stay NaN-correct)") {
    spark.sql("DROP TABLE IF EXISTS gsa.db.nan")
    spark.sql("CREATE TABLE gsa.db.nan (k INT, v DOUBLE)")
    spark.sql("INSERT INTO gsa.db.nan VALUES (1, 1.0), (2, cast('NaN' AS DOUBLE)), (3, 5.0)")
    val agg = spark.sql("SELECT max(v) AS mx, count(*) AS c FROM gsa.db.nan")
    assert(!isMetadataOnly(agg), agg.queryExecution.executedPlan.toString)
    val row = agg.head()
    assert(row.getDouble(0).isNaN && row.getLong(1) === 3L)
  }

  test("empty table answers count 0 / null bounds") {
    spark.sql("DROP TABLE IF EXISTS gsa.db.empty")
    spark.sql("CREATE TABLE gsa.db.empty (k INT)")
    val agg = spark.sql("SELECT count(*) AS c, min(k) AS mn FROM gsa.db.empty")
    assert(isMetadataOnly(agg))
    val row = agg.head()
    assert(row.getLong(0) === 0L && row.isNullAt(1))
  }

  test("deletes disable the metadata path; answers stay correct") {
    setup()
    spark.sql("DELETE FROM gsa.db.orders WHERE o_orderkey % 10 = 0")
    val agg = spark.sql(
      "SELECT count(*) AS cnt, max(o_orderkey) AS mx FROM gsa.db.orders")
    assert(!isMetadataOnly(agg), agg.queryExecution.executedPlan.toString)
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter("o_orderkey % 10 != 0")
    assert(agg.head().toSeq === Seq(src.count(), src.selectExpr("max(o_orderkey)").head().getLong(0)))
  }

  test("residual WHERE and string bounds both fall back to a real scan") {
    setup()
    val filtered = spark.sql(
      "SELECT count(*) AS c FROM gsa.db.orders WHERE o_orderstatus = 'F'")
    assert(!isMetadataOnly(filtered))
    val expF = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter("o_orderstatus = 'F'").count()
    assert(filtered.head().getLong(0) === expF)

    // string bounds are truncated prefixes -> never answered from stats
    val strAgg = spark.sql("SELECT max(o_orderstatus) AS mx FROM gsa.db.orders")
    assert(!isMetadataOnly(strAgg))
    val expS = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("max(o_orderstatus)").head().getString(0)
    assert(strAgg.head().getString(0) === expS)
  }

  test("unsupported aggregate (sum/avg/distinct) falls back entirely") {
    setup()
    val agg = spark.sql(
      "SELECT count(*) AS c, sum(o_totalprice) AS s, count(DISTINCT o_custkey) AS d FROM gsa.db.orders")
    assert(!isMetadataOnly(agg))
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val exp = src.selectExpr("count(*)", "sum(o_totalprice)", "count(DISTINCT o_custkey)").head()
    assert(agg.head() === exp)
  }

  test("time travel aggregates the snapshot's own files") {
    spark.sql("DROP TABLE IF EXISTS gsa.db.tt")
    spark.sql("CREATE TABLE gsa.db.tt (k INT)")
    spark.sql("INSERT INTO gsa.db.tt VALUES (1), (2)")
    val wh = spark.conf.get("spark.sql.catalog.gsa.warehouse")
    val tbl = graft.tables.StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/tt")
    val snap1 = tbl.metadata.currentSnapshotId.get
    spark.sql("INSERT INTO gsa.db.tt VALUES (10)")
    val agg = spark.sql(
      s"SELECT count(*) AS c, max(k) AS mx FROM gsa.db.tt VERSION AS OF $snap1")
    assert(isMetadataOnly(agg))
    assert(agg.head().toSeq === Seq(2L, 2))
  }
}
