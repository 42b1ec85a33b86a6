package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Automatic manifest merging on commit (`commit.manifest-merge.enabled`,
  * `commit.manifest.min-count-to-merge`): continuous ingest must not
  * accrete one manifest per commit forever. Merging rewrites small
  * manifests into one while preserving entry snapshot ids, statuses
  * (Added becomes Existing) and inherited sequence numbers; older
  * snapshots keep their own manifest lists. */
class ManifestMergeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def src = spark.range(0, 60).selectExpr("id AS k", "cast(id as string) AS v")

  private def build(name: String, props: Map[String, String]): GraftTable = {
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    var t = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation(name), schema, IcePartitionSpec(0, Nil), props)
    (0 until 6).foreach { i =>
      t = t.append(spark, src.filter(col("k") >= i * 10 && col("k") < (i + 1) * 10).coalesce(1))
    }
    t
  }

  private def manifests(t: GraftTable): List[IceManifestListEntry] =
    ManifestIO.readManifestList(
      conf, t.relocate(t.metadata.currentSnapshot.get.manifestList))

  test("below min-count-to-merge (default 100): one manifest per commit") {
    val t = build("nomerge-default", Map.empty)
    assert(manifests(t).size === 6)
  }

  test("explicitly disabled: no merging even past the count") {
    val t = build("nomerge-off", Map(
      "commit.manifest-merge.enabled" -> "false",
      "commit.manifest.min-count-to-merge" -> "3"))
    assert(manifests(t).size === 6)
  }

  test("enabled: manifests collapse at min-count-to-merge, data intact") {
    val t = build("merge", Map(
      "commit.manifest-merge.enabled" -> "true",
      "commit.manifest.min-count-to-merge" -> "4"))
    // commit 5 sees 4 accreted manifests -> merges them; commit 6 adds one
    val ms = manifests(t)
    assert(ms.size === 3, s"expected merged list, got ${ms.size}")
    // every row of every append survives with exact content
    val back = t.scan(spark)
    assert(back.count() === 60)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("merged entries keep their original data sequence numbers") {
    val t = build("merge-seq", Map(
      "commit.manifest-merge.enabled" -> "true",
      "commit.manifest.min-count-to-merge" -> "3"))
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
    assert(planned.size === 6)
    // each append's file keeps the sequence of ITS commit (1..6), not the
    // merging commit's: recover the append index from the file's k-range
    val kId = t.metadata.currentSchema.findField("k").get.id
    val seqByIdx = planned.map { p =>
      val lo = SingleValue.decode(IcePrim("long"), p.file.lowerBounds(kId))
        .asInstanceOf[Long]
      (lo / 10, p.seq)
    }.toMap
    assert(seqByIdx === (0 until 6).map(i => i.toLong -> (i + 1).toLong).toMap)
  }

  test("time travel to a pre-merge snapshot is untouched") {
    val t = build("merge-tt", Map(
      "commit.manifest-merge.enabled" -> "true",
      "commit.manifest.min-count-to-merge" -> "4"))
    val snaps = t.metadata.snapshots.sortBy(_.sequenceNumber)
    val third = snaps(2)
    assert(ManifestIO.readManifestList(conf, t.relocate(third.manifestList)).size === 3)
    assert(t.scan(spark, snapshotId = Some(third.snapshotId)).count() === 30)
  }

  test("mega-commit rolls manifests at the target size") {
    val big = spark.range(0, 3000).selectExpr("id AS k", "cast(id as string) AS v")
    val schema = SchemaConvert.fromSparkSchema(big.schema)
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("split"), schema, IcePartitionSpec(0, Nil),
      Map(
        "write.max-records-per-file" -> "100", // ~30 files in one commit
        "commit.manifest.target-size-bytes" -> "4096"))
      .append(spark, big.coalesce(1))
    val ms = manifests(t)
    assert(ms.size > 1, "one giant manifest — split did not roll")
    assert(ms.map(_.addedFilesCount).sum === 30)
    val back = t.scan(spark)
    assert(back.count() === 3000)
    assert(back.exceptAll(big).isEmpty)
  }

  test("MoR deletes survive merging with their applicability") {
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    var t = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("merge-mor"), schema, IcePartitionSpec(0, Nil),
      Map(
        "commit.manifest-merge.enabled" -> "true",
        "commit.manifest.min-count-to-merge" -> "3"))
    t = t.append(spark, src.filter(col("k") < 30).coalesce(1))
    t = t.deleteWhere(spark, col("k") === 7L) // position-delete commit
    (0 until 4).foreach { i =>
      t = t.append(spark,
        src.filter(col("k") >= 30 + i * 5 && col("k") < 35 + i * 5).coalesce(1))
    }
    val back = t.scan(spark)
    assert(back.count() === 49) // 50 appended minus the one deleted row
    assert(back.filter(col("k") === 7L).count() === 0)
    // the delete file's sequence still postdates the data it applies to
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
    val del = planned.filter(_.file.content != DataContent.Data)
    assert(del.nonEmpty && del.forall(_.seq === 2L))
  }
}
