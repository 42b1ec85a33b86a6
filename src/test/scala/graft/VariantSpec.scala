package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{IcePartitionSpec, IcePrim, SchemaConvert, StorageCatalog}

/** Iceberg v3 `variant` type: schema mapping, format-version gating, and
  * end-to-end write/scan/MoR-delete through both the facade and the SQL
  * catalog. The physical layout is the Parquet Variant encoding Spark
  * writes natively (metadata+value binaries), which is the spec's
  * unshredded representation. */
class VariantSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-test/variant/$name-${System.nanoTime()}"

  test("schema mapping round-trips variant and gates it on v3") {
    val df = spark.sql("SELECT 1L AS id, parse_json('{\"a\":1}') AS v")
    val ice = SchemaConvert.fromSparkSchema(df.schema)
    assert(ice.fields.find(_.name == "v").get.fieldType === IcePrim("variant"))
    assert(ice.usesVariant)
    val back = SchemaConvert.toSparkSchema(ice)
    assert(back("v").dataType === org.apache.spark.sql.types.VariantType)
    // v2 table refuses a variant column
    val e = intercept[IllegalArgumentException] {
      StorageCatalog.createOrReplaceTable(
        spark.sparkContext.hadoopConfiguration, tmp("v2refuse"),
        ice, IcePartitionSpec(0, Nil), formatVersion = 2)
    }
    assert(e.getMessage.contains("format-version 3"))
  }

  test("variant column: append, scan, equality+position deletes (facade)") {
    val src = spark.range(0, 100).select(
      col("id"),
      parse_json(concat(lit("{\"t\":\"k"), col("id") % 5,
        lit("\",\"n\":"), col("id") * 3, lit(",\"arr\":[1,"), col("id"),
        lit("]}"))).as("payload"))
    val ice = SchemaConvert.fromSparkSchema(src.schema)
    val tbl = StorageCatalog.createOrReplaceTable(
      spark.sparkContext.hadoopConfiguration, tmp("facade"),
      ice, IcePartitionSpec(0, Nil), formatVersion = 3)
    tbl.append(spark, src)
    // equality delete on the id key, position delete via predicate
    tbl.equalityDelete(spark, Seq(5L, 6L).toDF("id"), Seq("id"))
    tbl.deleteWhere(spark, col("id") === 7L)
    val out = tbl.scan(spark)
      .select(col("id"),
        expr("variant_get(payload, '$.t', 'string')").as("t"),
        expr("variant_get(payload, '$.n', 'long')").as("n"),
        expr("variant_get(payload, '$.arr[1]', 'long')").as("a1"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.size === 97)
    assert(!out.contains(5L) && !out.contains(6L) && !out.contains(7L))
    assert(out(13L) === (("k3", 39L, 13L)))
  }

  test("variant through SQL DDL/DML: CREATE + INSERT + DELETE + scan") {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft-test/variant/wh"
    spark.conf.set("spark.sql.catalog.graftv", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftv.db")
    spark.sql("DROP TABLE IF EXISTS graftv.db.var_t")
    spark.sql(
      """CREATE TABLE graftv.db.var_t (id BIGINT, payload VARIANT)
        |TBLPROPERTIES ('format-version' = '3')""".stripMargin)
    spark.sql(
      """INSERT INTO graftv.db.var_t
        |SELECT id, parse_json(concat('{"m":', id % 3, ',"s":"x', id, '"}'))
        |FROM range(0, 50)""".stripMargin)
    spark.sql("DELETE FROM graftv.db.var_t WHERE id % 10 = 0")
    val rows = spark.sql(
      """SELECT id, variant_get(payload, '$.m', 'int') AS m,
        |  variant_get(payload, '$.s', 'string') AS s
        |FROM graftv.db.var_t""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(rows.size === 45)
    assert(!rows.contains(20L))
    assert(rows(14L) === ((2, "x14")))
    // DESCRIBE surfaces the variant type
    val desc = spark.sql("DESCRIBE TABLE graftv.db.var_t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("payload") === "variant")
    // identifier fields refuse a variant column
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE graftv.db.var_t SET IDENTIFIER FIELDS payload")
    }
    assert(err.getMessage.contains("primitive"))
    spark.sql("DROP TABLE graftv.db.var_t")
  }
}
