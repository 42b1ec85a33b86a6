package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Edge-case combinations: partitioned MoR, stacked delete types, empty
  * inputs, repeated operations. */
class EdgeCasesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("upsert on a partitioned table") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val spec = IcePartitionSpec(0, List(IcePartitionField(
      schema.findField("o_orderdate").get.id, 1000, "year", "order_year")))
    val loc = tmpLocation("part-upsert")
    val t = StorageCatalog.createOrReplaceTable(conf, loc, schema, spec)
    t.append(spark, src)
    val changed = src.filter(pmod($"o_orderkey", lit(5)) === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 10.0)
    t.upsert(spark, changed, Seq("o_orderkey"))
    val back = t.scan(spark)
    val exp = src.withColumn("o_totalprice",
      when(pmod($"o_orderkey", lit(5)) === 0, $"o_totalprice" + 10.0)
        .otherwise($"o_totalprice"))
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
    // pruned scan still correct under MoR
    val flt = $"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val got = t.scan(spark, filter = Some(flt))
    assert(got.exceptAll(exp.filter(flt)).isEmpty)
  }

  test("position and equality deletes stack on the same table") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("stacked")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    // equality-delete status F, then position-delete keys %10==0 of the rest
    t.equalityDelete(spark,
      src.filter($"o_orderstatus" === "F").select($"o_orderkey"), Seq("o_orderkey"))
    val pos = t.scan(spark, keepFilePos = true)
      .filter(pmod($"o_orderkey", lit(10)) === 0)
      .select($"_file".as("file_path"), $"_pos".as("pos"))
    t.positionDelete(spark, pos)
    val back = t.scan(spark)
    val exp = src.filter($"o_orderstatus" =!= "F" && pmod($"o_orderkey", lit(10)) =!= 0)
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
  }

  test("empty append and empty upsert are harmless") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("empty")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.append(spark, src.limit(0))
    t.upsert(spark, src.limit(0), Seq("r_regionkey"))
    assert(t.scan(spark).count() === src.count())
    // scanning a never-written table yields empty with the right schema
    val loc2 = tmpLocation("never")
    val t2 = StorageCatalog.createOrReplaceTable(
      conf, loc2, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    val empty = t2.scan(spark)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === src.columns.toSeq)
  }

  test("repeated upserts converge to the last write") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("repeat")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    (1 to 3).foreach { i =>
      t.upsert(spark,
        src.withColumn("r_name", concat($"r_name", lit(s"_v$i"))),
        Seq("r_regionkey"))
    }
    val names = t.scan(spark).select("r_name").as[String].collect()
    assert(names.length === src.count())
    assert(names.forall(_.endsWith("_v3")))
  }

  test("delete of keys that do not exist changes nothing") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("noop-del")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.equalityDelete(spark, Seq(99999).toDF("r_regionkey"), Seq("r_regionkey"))
    assert(t.scan(spark).count() === src.count())
  }
}
