package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Format-v3 row lineage: next-row-id assignment on commit, per-file
  * first_row_id slices, `_row_id`/`_last_updated_sequence_number`
  * metadata columns, and the rewrite semantics (unmaterialized rewrites
  * null their ids out rather than minting fresh ones). */
class RowLineageSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def v3Table(name: String, src: org.apache.spark.sql.DataFrame): GraftTable =
    StorageCatalog.createOrReplaceTable(
      conf, tmpLocation(name), SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, Nil), properties = Map("format-version" -> "3"))

  test("appends assign disjoint first_row_id slices; metadata round-trips") {
    val a = spark.range(0, 100).selectExpr("id AS k").repartition(1)
    val t0 = v3Table("lineage-assign", a)
    assert(t0.metadata.formatVersion === 3)
    val t1 = t0.append(spark, a)
    assert(t1.metadata.nextRowId === 100L)
    val s1 = t1.metadata.currentSnapshot.get
    assert(s1.firstRowId === Some(0L))
    val f1 = t1.planFiles(s1).head.file
    assert(f1.firstRowId === Some(0L))
    val t2 = t1.append(spark, spark.range(100, 150).selectExpr("id AS k").repartition(1))
    assert(t2.metadata.nextRowId === 150L)
    assert(t2.metadata.currentSnapshot.get.firstRowId === Some(100L))
    // reload from disk: next-row-id + first-row-id + manifest field survive
    val re = StorageCatalog.loadTable(conf, t2.location)
    assert(re.metadata.nextRowId === 150L)
    val files = re.planFiles(re.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
    assert(files.flatMap(_.file.firstRowId).sorted === List(0L, 100L))
  }

  test("_row_id and _last_updated_sequence_number metadata columns") {
    val a = spark.range(0, 100).selectExpr("id AS k")
      .repartition(1).sortWithinPartitions("k")
    val t1 = v3Table("lineage-cols", a).append(spark, a)
    val df = t1.scan(spark)
    val out = df.select(
      col("k"), df.metadataColumn("_row_id").as("_row_id"),
      df.metadataColumn("_last_updated_sequence_number").as("_seq"))
    val rows = out.orderBy("k").collect()
    // single sorted file: _row_id follows the sort order exactly
    assert(rows.map(_.getLong(1)).toSeq === (0L until 100L))
    assert(rows.forall(_.getLong(2) === 1L))
  }

  test("row ids stay stable under MoR deletes") {
    val a = spark.range(0, 100).selectExpr("id AS k")
      .repartition(1).sortWithinPartitions("k")
    val t1 = v3Table("lineage-del", a).append(spark, a)
    val t2 = t1.deleteWhere(spark, col("k") < 10)
    val df = t2.scan(spark)
    val rows = df.select(col("k"), df.metadataColumn("_row_id"))
      .orderBy("k").collect()
    assert(rows.length === 90)
    // survivor k keeps its original id (position within the file)
    assert(rows.forall(r => r.getLong(1) === r.getLong(0)))
  }

  test("rewrite preserves row ids by materializing the lineage columns") {
    val a = spark.range(0, 50).selectExpr("id AS k").repartition(1)
    val b = spark.range(50, 100).selectExpr("id AS k").repartition(1)
    val t0 = v3Table("lineage-rw", a)
    val t1 = t0.append(spark, a).append(spark, b)
    assert(t1.metadata.nextRowId === 100L)
    def idMap(t: GraftTable): Map[Long, Long] = {
      val df = t.scan(spark)
      df.select(col("k"), df.metadataColumn("_row_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val before = idMap(t1)
    assert(before.values.toSeq.sorted === (0L until 100L))
    val t2 = t1.rewriteSmallFiles(spark, smallFileThresholdBytes = 10L * 1024 * 1024)
    // the rewrite consumed no new ids, files carry no first_row_id slice
    // (ids ride IN the files as materialized columns) ...
    assert(t2.metadata.nextRowId === 100L)
    val files = t2.planFiles(t2.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
    assert(files.forall(_.file.firstRowId.isEmpty))
    // ... and every row keeps its exact pre-rewrite identity
    assert(idMap(t2) === before)
    // a fresh append AFTER the rewrite resumes the id sequence
    val t3 = t2.append(spark, spark.range(100, 110).selectExpr("id AS k").repartition(1))
    assert(t3.metadata.currentSnapshot.get.firstRowId === Some(100L))
    assert(t3.metadata.nextRowId === 110L)
    val after = idMap(t3)
    assert(after.filter(_._1 < 100) === before)
    assert(after.filterKeys(_ >= 100).values.toSeq.sorted === (100L until 110L))
  }

  test("_spec_id and _partition metadata columns") {
    val src = spark.range(0, 90)
      .selectExpr("id AS k", "cast(id % 3 AS int) AS b3")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("meta-part"), schema,
      IcePartitionSpec(0, List(IcePartitionField(
        schema.findField("b3").get.id, 1000, "identity", "b3"))))
      .append(spark, src)
    val df = t.scan(spark)
    val rows = df.select(
      col("b3"),
      df.metadataColumn("_spec_id").as("sid"),
      df.metadataColumn("_partition").getField("b3").as("pb3"))
      .collect()
    assert(rows.length === 90)
    assert(rows.forall(_.getInt(1) === 0))
    assert(rows.forall(r => r.getInt(0) === r.getInt(2)))
  }

  test("_deleted metadata column serves deleted rows flagged, not filtered") {
    val a = spark.range(0, 100).selectExpr("id AS k").repartition(1)
    val t1 = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("meta-deleted"), SchemaConvert.fromSparkSchema(a.schema),
      IcePartitionSpec(0, Nil)).append(spark, a)
    val t = t1.deleteWhere(spark, col("k") < 20)
    // plain scan filters; selecting _deleted flags instead
    assert(t.scan(spark).count() === 80)
    val df = t.scan(spark)
    val flagged = df.select(col("k"), df.metadataColumn("_deleted").as("d"))
    // note: flag semantics hold while the column survives pruning —
    // count() prunes every column away and reverts to filtered rows
    // (the same projection-dependence Spark applies to any metadata col)
    val rows = flagged.collect()
    assert(rows.length === 100)
    assert(rows.count(_.getBoolean(1)) === 20)
    assert(flagged.filter(col("d")).agg(max(col("k"))).head.getLong(0) === 19L)
  }

  test("v2 tables serve null _row_id (no lineage)") {
    val a = spark.range(0, 20).selectExpr("id AS k").repartition(1)
    val t1 = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("lineage-v2"), SchemaConvert.fromSparkSchema(a.schema),
      IcePartitionSpec(0, Nil)).append(spark, a)
    assert(t1.metadata.nextRowId === 0L)
    val df = t1.scan(spark)
    assert(df.select(df.metadataColumn("_row_id")).collect().forall(_.isNullAt(0)))
  }
}
