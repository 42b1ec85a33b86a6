package graft

import java.nio.file.Files

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Scale-join machinery: runtime (join-driven) file pruning and
  * storage-partitioned joins (no-shuffle co-partitioned joins). */
class ScaleJoinSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-sj-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gsj", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gsj.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsj.db")
    s
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def identityTable(name: String): GraftTable = {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val loc = s"${System.getProperty("java.io.tmpdir")}/graft-sj/$name"
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, loc, schema,
      IcePartitionSpec(0, List(IcePartitionField(
        schema.findField("o_orderstatus").get.id, 1000, "identity", "status"))))
    tbl.append(spark, src)
    tbl
  }

  test("runtime filter() prunes identity-partitioned files before planning") {
    val tbl = identityTable("rtf")
    val v2 = new graft.spark.GraftV2Table(tbl, None, None)
    def freshScan() = v2.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .asInstanceOf[graft.spark.GraftNativeBatchScan]

    val before = freshScan().toBatch.planInputPartitions().length
    assert(before > 1) // three statuses -> at least three files

    val scan = freshScan()
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("o_orderstatus"),
      org.apache.spark.sql.GraftBridge.v2Literal(UTF8String.fromString("P"), StringType)))))
    val after = scan.toBatch.planInputPartitions().length
    assert(after < before && after > 0)
  }

  test("join-driven dynamic pruning fires end-to-end and stays correct") {
    val tbl = identityTable("dpp")
    import spark.implicits._
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true") {
      val dim = Seq(("P", 1), ("X", 2)).toDF("status", "weight")
        .filter($"weight" === 1) // selective dim filter -> DPP candidate
      val joined = tbl.scan(spark)
        .join(dim, $"o_orderstatus" === $"status")
        .groupBy($"status").count()
      val exp = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter($"o_orderstatus" === "P").count()
      assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("P", exp)))
    }
  }

  test("storage-partitioned join on identity partitions runs with no shuffle") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      spark.sql("DROP TABLE IF EXISTS gsj.db.fact_a")
      spark.sql("DROP TABLE IF EXISTS gsj.db.fact_b")
      spark.sql(
        """CREATE TABLE gsj.db.fact_a (k BIGINT, s STRING, v DOUBLE)
          |PARTITIONED BY (s)""".stripMargin)
      spark.sql(
        """CREATE TABLE gsj.db.fact_b (k BIGINT, s STRING, w DOUBLE)
          |PARTITIONED BY (s)""".stripMargin)
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .selectExpr("o_orderkey AS k", "o_orderstatus AS s", "o_totalprice AS v")
        .createOrReplaceTempView("sj_src")
      spark.sql("INSERT INTO gsj.db.fact_a SELECT * FROM sj_src")
      spark.sql("INSERT INTO gsj.db.fact_b SELECT k, s, v * 2 FROM sj_src")
      val joined = spark.sql(
        """SELECT a.s AS s, count(*) AS cnt
          |FROM gsj.db.fact_a a JOIN gsj.db.fact_b b ON a.s = b.s
          |GROUP BY a.s""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      val exp = spark.sql(
        """SELECT s, count(*) AS cnt FROM
          |(SELECT a.s FROM sj_src a JOIN sj_src b ON a.s = b.s) GROUP BY s""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got === exp)
    }
  }

  test("storage-partitioned join on bucket partitions runs with no shuffle") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      spark.sql("DROP TABLE IF EXISTS gsj.db.bk_a")
      spark.sql("DROP TABLE IF EXISTS gsj.db.bk_b")
      spark.sql(
        """CREATE TABLE gsj.db.bk_a (k BIGINT, v DOUBLE)
          |PARTITIONED BY (bucket(8, k))""".stripMargin)
      spark.sql(
        """CREATE TABLE gsj.db.bk_b (k BIGINT, w DOUBLE)
          |PARTITIONED BY (bucket(8, k))""".stripMargin)
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .selectExpr("o_orderkey AS k", "o_totalprice AS v")
        .createOrReplaceTempView("sj_bk_src")
      spark.sql("INSERT INTO gsj.db.bk_a SELECT * FROM sj_bk_src")
      spark.sql("INSERT INTO gsj.db.bk_b SELECT k, v + 1 FROM sj_bk_src WHERE k % 3 = 0")
      val joined = spark.sql(
        """SELECT a.k AS k, a.v AS v, b.w AS w
          |FROM gsj.db.bk_a a JOIN gsj.db.bk_b b ON a.k = b.k""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      val cnt = joined.count()
      val exp = spark.sql("SELECT count(*) FROM sj_bk_src WHERE k % 3 = 0").head().getLong(0)
      assert(cnt === exp)
    }
  }
}
