package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Iceberg v3 `unknown` type — declare-now-type-later: the column exists
  * in the schema (and survives metadata round-trips) but holds no data
  * (the spec omits it from data files; every value is null), so the Spark
  * surface EXCLUDES it until a type promotion makes it concrete. After
  * `unknown -> X` promotion the column appears and every pre-promotion
  * row reads null through the absent-column path — the same machinery
  * add-column relies on. */
class UnknownTypeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-test/unknown/$name-${System.nanoTime()}"

  private def schemaWithUnknown = IceSchema(0, List(
    IceField(1, "id", required = true, IcePrim("long")),
    IceField(2, "mystery", required = false, IcePrim("unknown"))))

  test("gating and validation: v3 only, optional only, top-level only") {
    val e1 = intercept[IllegalArgumentException] {
      StorageCatalog.createOrReplaceTable(
        conf, tmp("v2"), schemaWithUnknown, IcePartitionSpec(0, Nil), formatVersion = 2)
    }
    assert(e1.getMessage.contains("format-version 3"))

    val required = IceSchema(0, List(
      IceField(1, "m", required = true, IcePrim("unknown"))))
    val e2 = intercept[Exception] {
      StorageCatalog.createOrReplaceTable(
        conf, tmp("req"), required, IcePartitionSpec(0, Nil), formatVersion = 3)
    }
    assert(e2.getMessage.contains("must be optional"))

    val nested = IceSchema(0, List(
      IceField(1, "s", required = false,
        IceStruct(List(IceField(2, "inner", required = false, IcePrim("unknown")))))))
    val e3 = intercept[Exception] {
      StorageCatalog.createOrReplaceTable(
        conf, tmp("nested"), nested, IcePartitionSpec(0, Nil), formatVersion = 3)
    }
    assert(e3.getMessage.contains("nested unknown"))
  }

  test("declare-now-type-later lifecycle: hidden, promoted, then real") {
    val loc = tmp("life")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, schemaWithUnknown, IcePartitionSpec(0, Nil), formatVersion = 3)
    t.append(spark, spark.range(0, 10).select(col("id")))

    // the Spark surface hides the unknown column; metadata keeps it
    assert(t.scan(spark).columns.toSeq === Seq("id"))
    val re = StorageCatalog.loadTable(conf, loc)
    assert(re.metadata.currentSchema.findField("mystery").get.fieldType ===
      IcePrim("unknown"))

    // promotion makes it concrete with its ORIGINAL field id; the 10
    // pre-promotion rows read null (no data file ever held the column)
    re.updateColumnType("mystery", IcePrim("string"))
    assert(re.metadata.currentSchema.findField("mystery").get.id === 2)
    re.append(spark, spark.range(10, 15)
      .select(col("id"), concat(lit("v"), col("id")).as("mystery")))
    val out = re.scan(spark).select("id", "mystery").as[(Long, Option[String])]
      .collect().toMap
    assert(out.size === 15)
    assert((0L until 10L).forall(out(_).isEmpty))
    assert(out(12L) === Some("v12"))

    // nothing demotes BACK to unknown
    val e = intercept[IllegalArgumentException] {
      re.updateColumnType("id", IcePrim("unknown"))
    }
    assert(e.getMessage.contains("illegal type promotion"))
  }

  test("unknown is rejected as identifier field and partition source") {
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmp("reject"), schemaWithUnknown, IcePartitionSpec(0, Nil), formatVersion = 3)
    val e1 = intercept[Exception] { t.setIdentifierFields(Seq("mystery")) }
    assert(e1.getMessage.contains("must be a primitive column"))
    val e2 = intercept[Exception] {
      t.updatePartitionSpec(List(IcePartitionField(2, 1000, "identity", "m")))
    }
    assert(e2.getMessage.contains("cannot partition by unknown"))
    // and at CREATE time, through the shared metadata constructor
    val e3 = intercept[Exception] {
      StorageCatalog.createOrReplaceTable(
        conf, tmp("createpart"), schemaWithUnknown,
        IcePartitionSpec(0, List(IcePartitionField(2, 1000, "identity", "m"))),
        formatVersion = 3)
    }
    assert(e3.getMessage.contains("cannot partition by unknown"))
    val idSchema = IceSchema(0, schemaWithUnknown.fields, identifierFieldIds = List(2))
    val e4 = intercept[Exception] {
      StorageCatalog.createOrReplaceTable(
        conf, tmp("createid"), idSchema, IcePartitionSpec(0, Nil), formatVersion = 3)
    }
    assert(e4.getMessage.contains("must not be unknown-typed"))
  }
}
