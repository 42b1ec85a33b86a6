package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Distributed scan planning ([[GraftTable.planFilesPruned]]): above the
  * manifest threshold, manifests are read and file-pruned in a Spark job
  * and only surviving descriptors reach the driver. Equivalence with the
  * driver path is the contract. */
class PlanningSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def key(p: PlannedFile): (String, Long, Int) =
    (p.file.filePath, p.seq, p.specId)

  /** six appends -> six manifests with disjoint k ranges */
  private def build(name: String): GraftTable = {
    val src = spark.range(0, 60).selectExpr("id AS k", "cast(id as string) AS v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    var t = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation(name), schema, IcePartitionSpec(0, Nil))
    (0 until 6).foreach { i =>
      t = t.append(spark, src.filter(col("k") >= i * 10 && col("k") < (i + 1) * 10).coalesce(1))
    }
    t
  }

  test("distributed planning matches the driver path (no filter)") {
    val t = build("dp-eq")
    val snap = t.metadata.currentSnapshot.get
    val driver = t.planFiles(snap, None).map(key).toSet
    val before = Metrics.get(Metrics.DistributedPlans)
    val dist = t.planFilesPruned(spark, snap, None,
      t.metadata.currentSchema, distributedThreshold = 1).map(key).toSet
    assert(Metrics.get(Metrics.DistributedPlans) > before,
      "threshold=1 must take the distributed path")
    assert(dist === driver)
    assert(dist.size === 6)
  }

  test("distributed planning prunes executor-side, equal to driver pruning") {
    val t = build("dp-prune")
    val snap = t.metadata.currentSnapshot.get
    val filter = Some(col("k") === 7L)
    val driver = PruneEval.prunePlanned(
      t.planFiles(snap, filter), filter, t.metadata, t.metadata.currentSchema)
      .map(key).toSet
    val dist = t.planFilesPruned(spark, snap, filter,
      t.metadata.currentSchema, distributedThreshold = 1).map(key).toSet
    assert(dist === driver)
    assert(dist.size === 1) // only the [0,10) file survives
  }

  test("below the threshold the driver path answers, pre-pruned") {
    val t = build("dp-driver")
    val snap = t.metadata.currentSnapshot.get
    val filter = Some(col("k") >= 40L)
    val before = Metrics.get(Metrics.DistributedPlans)
    val got = t.planFilesPruned(spark, snap, filter, t.metadata.currentSchema)
    assert(Metrics.get(Metrics.DistributedPlans) === before)
    assert(got.size === 2) // [40,50) + [50,60)
  }

  test("partitioned table: partition tuples prune in the distributed job") {
    val src = spark.range(0, 40)
      .selectExpr("id AS k", "cast(id % 4 as int) AS bucket_col")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    var t = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("dp-part"), schema,
      IcePartitionSpec(0, List(IcePartitionField(
        schema.findField("bucket_col").get.id, 1000, "identity", "b"))))
    (0 until 2).foreach(_ => t = t.append(spark, src))
    val snap = t.metadata.currentSnapshot.get
    val filter = Some(col("bucket_col") === 2)
    val driver = PruneEval.prunePlanned(
      t.planFiles(snap, filter), filter, t.metadata, t.metadata.currentSchema)
      .map(key).toSet
    val dist = t.planFilesPruned(spark, snap, filter,
      t.metadata.currentSchema, distributedThreshold = 1).map(key).toSet
    assert(dist === driver)
    assert(dist.nonEmpty)
    assert(dist.size < t.planFiles(snap, None).size)
  }
}
