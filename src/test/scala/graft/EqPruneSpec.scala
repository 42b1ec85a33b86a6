package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Descriptor-level equality-delete file pruning: a scan must not load
  * eq-delete files whose key bounds cannot overlap any live data file
  * (or that no data file predates). Null-key delete files and missing
  * bounds stay conservative. */
class EqPruneSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def freshTable(name: String): GraftTable = {
    val src = spark.range(0, 100).selectExpr("id AS k", "cast(id as string) AS v")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    StorageCatalog.createOrReplaceTable(
        conf, tmpLocation(name), schema, IcePartitionSpec(0, Nil))
      .append(spark, src.coalesce(1))
  }

  test("disjoint-key eq-delete file is skipped; overlapping one applies") {
    var t = freshTable("eqprune")
    // keys far outside the data's [0,99] bounds: prunable
    t = t.equalityDelete(spark, Seq(5000L, 5001L).toDF("k"), Seq("k"))
    // overlapping keys: must apply
    t = t.equalityDelete(spark, Seq(7L, 8L).toDF("k"), Seq("k"))
    val before = Metrics.get(Metrics.EqDeleteFilesSkipped)
    val got = t.scan(spark).agg(count(lit(1)), sum(col("k"))).head()
    assert(got.getLong(0) === 98)
    assert(got.getLong(1) === (0L until 100L).sum - 15L)
    assert(Metrics.get(Metrics.EqDeleteFilesSkipped) >= before + 1)
  }

  test("null-key eq-delete file is never pruned by bounds") {
    var t = freshTable("eqprune-null")
    t = t.append(spark,
      spark.sql("SELECT CAST(NULL AS BIGINT) AS k, 'nullrow' AS v"))
    // delete file holds only a NULL key: bounds say nothing about it
    t = t.equalityDelete(spark,
      spark.sql("SELECT CAST(NULL AS BIGINT) AS k"), Seq("k"))
    val before = Metrics.get(Metrics.EqDeleteFilesSkipped)
    assert(t.scan(spark).filter(col("v") === "nullrow").count() === 0)
    assert(t.scan(spark).count() === 100)
    assert(Metrics.get(Metrics.EqDeleteFilesSkipped) === before)
  }

  test("eq-delete predating every data file is dead and skipped") {
    // delete commits first (seq 2 over seq-1 data), then the data is
    // fully compacted (replace at seq 3): no remaining file predates it
    var t = freshTable("eqprune-dead")
    t = t.equalityDelete(spark, Seq(7L).toDF("k"), Seq("k"))
    t = t.rewriteDataFiles(spark)
    val live = t.planFiles(t.metadata.currentSnapshot.get)
    if (live.exists(_.file.content == DataContent.EqualityDeletes)) {
      // only meaningful if compaction carried the delete file forward
      val before = Metrics.get(Metrics.EqDeleteFilesSkipped)
      assert(t.scan(spark).count() === 99)
      assert(Metrics.get(Metrics.EqDeleteFilesSkipped) > before)
    } else {
      // compaction absorbed the delete: nothing left to prune
      assert(t.scan(spark).count() === 99)
    }
  }
}
