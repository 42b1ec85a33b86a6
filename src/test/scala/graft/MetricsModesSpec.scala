package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** `write.metadata.metrics.*` — per-column manifest metrics modes.
  * Modes bound manifest size at scale: `none` keeps only column sizes,
  * `counts` drops bounds, `truncate(N)` cuts string bounds at N code
  * points (upper rounded up), `full` disables truncation. Covered across
  * the parquet footer harvest, the ORC tail harvest and the Avro inline
  * accumulation. */
class MetricsModesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def freshTable(
      name: String,
      src: org.apache.spark.sql.DataFrame,
      props: Map[String, String]): GraftTable = {
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    StorageCatalog.createOrReplaceTable(
      conf, tmpLocation(name), schema, IcePartitionSpec(0, Nil), props)
  }

  // k long, v string (long values so truncation engages), w double
  private def src = spark.range(0, 100).coalesce(1).selectExpr(
    "id AS k",
    "concat('prefix-', lpad(cast(id as string), 30, '0')) AS v",
    "cast(id as double) AS w")

  private def onlyFile(t: GraftTable): IceDataFile = {
    val files = t.planFiles(t.metadata.currentSnapshot.get).map(_.file)
    assert(files.size === 1)
    files.head
  }

  private def fieldId(t: GraftTable, name: String): Int =
    t.metadata.currentSchema.findField(name).get.id

  test("mode parsing") {
    assert(MetricsMode.parse("none") === MetricsMode.NoMetrics)
    assert(MetricsMode.parse("Counts") === MetricsMode.Counts)
    assert(MetricsMode.parse("truncate(8)") === MetricsMode.Truncate(8))
    assert(MetricsMode.parse("full") === MetricsMode.Full)
    intercept[RuntimeException](MetricsMode.parse("truncate(0)"))
    intercept[RuntimeException](MetricsMode.parse("bogus"))
  }

  test("counts default: value/null counts kept, no bounds (parquet)") {
    val t = freshTable("mm-counts", src,
      Map("write.metadata.metrics.default" -> "counts")).append(spark, src)
    val f = onlyFile(t)
    assert(f.valueCounts.nonEmpty && f.nullValueCounts.nonEmpty)
    assert(f.lowerBounds.isEmpty && f.upperBounds.isEmpty)
  }

  test("none on one column: no counts for it, others keep defaults") {
    val t = freshTable("mm-none", src,
      Map("write.metadata.metrics.column.v" -> "none")).append(spark, src)
    val f = onlyFile(t)
    val vId = fieldId(t, "v")
    val kId = fieldId(t, "k")
    assert(!f.valueCounts.contains(vId) && !f.nullValueCounts.contains(vId))
    assert(!f.lowerBounds.contains(vId) && !f.upperBounds.contains(vId))
    // sizes survive every mode; k keeps the full default metrics
    assert(f.columnSizes.contains(vId))
    assert(f.valueCounts.contains(kId) && f.lowerBounds.contains(kId))
  }

  test("truncate(4): prefix lower bound, bumped upper bound") {
    val t = freshTable("mm-trunc", src,
      Map("write.metadata.metrics.column.v" -> "truncate(4)")).append(spark, src)
    val f = onlyFile(t)
    val vId = fieldId(t, "v")
    assert(new String(f.lowerBounds(vId), "UTF-8") === "pref")
    assert(new String(f.upperBounds(vId), "UTF-8") === "preg") // rounded UP
  }

  test("full: the 37-char string bound is stored untruncated") {
    val t = freshTable("mm-full", src,
      Map("write.metadata.metrics.default" -> "full")).append(spark, src)
    val f = onlyFile(t)
    val vId = fieldId(t, "v")
    val lo = new String(f.lowerBounds(vId), "UTF-8")
    val hi = new String(f.upperBounds(vId), "UTF-8")
    assert(lo === "prefix-000000000000000000000000000000")
    assert(hi === "prefix-000000000000000000000000000099")
  }

  test("max-inferred-column-defaults caps inferred metrics") {
    val t = freshTable("mm-cap", src,
      Map("write.metadata.metrics.max-inferred-column-defaults" -> "1"))
      .append(spark, src)
    val f = onlyFile(t)
    val kId = fieldId(t, "k") // first field: inferred default truncate(16)
    val vId = fieldId(t, "v") // past the cap: no metrics
    assert(f.valueCounts.contains(kId) && f.lowerBounds.contains(kId))
    assert(!f.valueCounts.contains(vId) && !f.lowerBounds.contains(vId))
  }

  test("avro inline stats honor counts mode; NaN counts follow it") {
    val t = freshTable("mm-avro", src, Map(
      "write.format.default" -> "avro",
      "write.metadata.metrics.default" -> "counts",
      "write.metadata.metrics.column.w" -> "none")).append(spark, src)
    val f = onlyFile(t)
    val (kId, wId) = (fieldId(t, "k"), fieldId(t, "w"))
    assert(f.valueCounts.contains(kId) && f.lowerBounds.isEmpty)
    assert(!f.valueCounts.contains(wId) && !f.nanValueCounts.contains(wId))
  }

  test("avro truncate(4) bumps the upper bound inline") {
    val t = freshTable("mm-avro-t", src, Map(
      "write.format.default" -> "avro",
      "write.metadata.metrics.column.v" -> "truncate(4)")).append(spark, src)
    val f = onlyFile(t)
    val vId = fieldId(t, "v")
    assert(new String(f.lowerBounds(vId), "UTF-8") === "pref")
    assert(new String(f.upperBounds(vId), "UTF-8") === "preg")
  }

  test("orc harvest honors modes") {
    val t = freshTable("mm-orc", src, Map(
      "write.format.default" -> "orc",
      "write.metadata.metrics.default" -> "truncate(4)",
      "write.metadata.metrics.column.k" -> "counts")).append(spark, src)
    val f = onlyFile(t)
    val (kId, vId) = (fieldId(t, "k"), fieldId(t, "v"))
    assert(f.valueCounts.contains(kId) && !f.lowerBounds.contains(kId))
    assert(new String(f.lowerBounds(vId), "UTF-8") === "pref")
    assert(new String(f.upperBounds(vId), "UTF-8") === "preg")
  }

  test("missing bounds stay conservative: no false pruning under counts mode") {
    val t = freshTable("mm-prune", src,
      Map("write.metadata.metrics.default" -> "counts")).append(spark, src)
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
    val kept = PruneEval.prunePlanned(
      planned, Some(col("k") === 7L), t.metadata, t.metadata.currentSchema)
    assert(kept.size === planned.size) // nothing provable -> nothing dropped
    assert(t.scan(spark).filter(col("k") === 7L).count() === 1L)
  }

  test("dsv2 SQL insert honors table metrics properties") {
    val wh = Files.createTempDirectory("graft-mm-wh").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.mmcat", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mmcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS mmcat.db")
      spark.sql(
        """CREATE TABLE mmcat.db.mm (k BIGINT, v STRING, w DOUBLE)
          |TBLPROPERTIES (
          |  'write.metadata.metrics.default' = 'counts',
          |  'write.metadata.metrics.column.v' = 'truncate(4)')""".stripMargin)
      src.createOrReplaceTempView("mm_src")
      spark.sql("INSERT INTO mmcat.db.mm SELECT * FROM mm_src")
      val re = StorageCatalog.loadTable(conf, s"$wh/db/mm")
      val f = onlyFile(re)
      val (kId, vId) = (fieldId(re, "k"), fieldId(re, "v"))
      assert(f.valueCounts.contains(kId) && !f.lowerBounds.contains(kId))
      assert(new String(f.lowerBounds(vId), "UTF-8") === "pref")
      assert(new String(f.upperBounds(vId), "UTF-8") === "preg")
    } finally {
      spark.conf.unset("spark.sql.catalog.mmcat")
      spark.conf.unset("spark.sql.catalog.mmcat.warehouse")
    }
  }
}
