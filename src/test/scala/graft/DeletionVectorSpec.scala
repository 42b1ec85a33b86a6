package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.roaringbitmap.longlong.Roaring64NavigableMap
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Deletion vectors: position deletes as puffin `deletion-vector-v1`
  * blobs (one bitmap per data file, format-v3 semantics behind the
  * `write.delete.vector-enabled` property). */
class DeletionVectorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private def freshDir(name: String): String =
    Files.createTempDirectory(s"graft-dv-$name").toFile.getAbsolutePath + "/t"

  private def sampleDf(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"row$i", i % 7)).toDF("id", "name", "grp")
  }

  private def makeTable(name: String, n: Int = 100, dv: Boolean = true,
      files: Int = 2): GraftTable = {
    val df = sampleDf(n)
    val schema = SchemaConvert.fromSparkSchema(df.schema)
    val props =
      if (dv) Map(GraftTable.DvEnabledProp -> "true") else Map.empty[String, String]
    val t = StorageCatalog.createOrReplaceTable(
      conf, freshDir(name), schema, IcePartitionSpec(0, Nil), props)
    t.append(spark, df.repartition(files))
    t
  }

  private def ids(t: GraftTable): Seq[Long] =
    t.scan(spark).select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def deleteEntries(t: GraftTable): List[PlannedFile] =
    t.metadata.currentSnapshot.toList.flatMap(t.planFiles(_))
      .filter(_.file.content == DataContent.PositionDeletes)

  test("puffin round-trip: magic framing, footer JSON, blob bytes, DV codec") {
    val bm = new Roaring64NavigableMap()
    Seq(0L, 1L, 5L, 1000L, (1L << 33) + 7).foreach(bm.addLong)
    val body = Puffin.dvEncode(bm)
    val path = freshDir("puffin") + "/x.puffin"
    val (size, metas) = Puffin.write(conf, path,
      Seq(Puffin.BlobInput(Puffin.DeletionVectorV1, Nil,
        Map("referenced-data-file" -> "/d/f.parquet", "cardinality" -> "5"), body)))
    val bytes = ManifestIO.readBytes(conf, path)
    assert(size === bytes.length)
    assert(bytes.slice(0, 4).toSeq === Puffin.Magic.toSeq, "leading magic")
    assert(bytes.slice(bytes.length - 4, bytes.length).toSeq === Puffin.Magic.toSeq,
      "trailing magic")
    val (blobs, _) = Puffin.readFooter(conf, path)
    assert(blobs.length === 1)
    assert(blobs.head.blobType === Puffin.DeletionVectorV1)
    assert(blobs.head.properties("referenced-data-file") === "/d/f.parquet")
    assert(blobs.head === metas.head)
    val back = Puffin.dvDecode(Puffin.readBlob(conf, path, blobs.head.offset, blobs.head.length))
    assert(back.getLongCardinality === 5L)
    assert(back.contains((1L << 33) + 7))
    assert(Puffin.dvPositions(body).toSeq === Seq(0L, 1L, 5L, 1000L, (1L << 33) + 7))
    // flipped bit in the vector -> CRC must catch it
    val corrupt = body.clone(); corrupt(10) = (corrupt(10) ^ 0x1).toByte
    assertThrows[IllegalArgumentException](Puffin.dvDecode(corrupt))
  }

  test("DV delete writes one vector per referenced data file; scan applies it") {
    val t = makeTable("basic")
    t.deleteWhere(spark, col("id") % 10 === 0)
    val dels = deleteEntries(t)
    assert(dels.nonEmpty && dels.forall(_.file.isDeletionVector))
    // one vector per data file containing matches, all inside ONE puffin file
    assert(dels.map(_.file.referencedDataFile.get).distinct.size === dels.size)
    assert(dels.map(_.file.filePath).distinct.size === 1)
    assert(dels.forall(d => d.file.contentOffset.isDefined &&
      d.file.contentSizeInBytes.isDefined))
    assert(ids(t) === (0L until 100L).filterNot(_ % 10 == 0))
  }

  test("merge-on-write: the newest vector per file carries the full delete set") {
    val t = makeTable("merge")
    t.deleteWhere(spark, col("id") % 10 === 0)
    t.deleteWhere(spark, col("id") % 10 === 1)
    assert(ids(t) === (0L until 100L).filterNot(i => i % 10 == 0 || i % 10 == 1))
    val latest = deleteEntries(t)
      .groupBy(_.file.referencedDataFile.get).map(_._2.maxBy(_.seq))
    // each latest vector holds BOTH rounds of deletes for its file
    assert(latest.map(_.file.recordCount).sum === 20L)
  }

  test("migration: prior parquet position deletes fold into the first vector") {
    val t = makeTable("migrate", dv = false)
    val pos = t.scan(spark, keepFilePos = true).filter(col("id") % 10 === 0)
      .select(col("_file").as("file_path"), col("_pos").as("pos"))
    t.positionDelete(spark, pos)
    assert(deleteEntries(t).forall(_.file.fileFormat == "parquet"))
    t.setProperties(Map(GraftTable.DvEnabledProp -> "true"))
    t.deleteWhere(spark, col("id") % 10 === 1)
    assert(ids(t) === (0L until 100L).filterNot(i => i % 10 == 0 || i % 10 == 1))
    // vectors subsume the parquet rows for their files
    val latest = deleteEntries(t).filter(_.file.isDeletionVector)
      .groupBy(_.file.referencedDataFile.get).map(_._2.maxBy(_.seq))
    assert(latest.map(_.file.recordCount).sum === 20L)
  }

  test("mixed mode: parquet deletes NEWER than the vector still apply") {
    val t = makeTable("mixed")
    t.deleteWhere(spark, col("id") % 10 === 0)
    t.setProperties(Map(GraftTable.DvEnabledProp -> "false"))
    t.deleteWhere(spark, col("id") % 10 === 1)
    val dels = deleteEntries(t)
    assert(dels.exists(_.file.isDeletionVector) &&
      dels.exists(_.file.fileFormat == "parquet"))
    assert(ids(t) === (0L until 100L).filterNot(i => i % 10 == 0 || i % 10 == 1))
  }

  test("executor-side tier: forced per-task blob fetch stays correct") {
    val t = makeTable("exec")
    t.deleteWhere(spark, col("id") % 3 === 0)
    spark.conf.set("spark.graft.delete-broadcast-max-bytes", "0")
    try assert(ids(t) === (0L until 100L).filterNot(_ % 3 == 0))
    finally spark.conf.unset("spark.graft.delete-broadcast-max-bytes")
  }

  test("changelog: each vector commit emits only its own delta") {
    val t = makeTable("changelog")
    val s0 = t.metadata.currentSnapshot.get.snapshotId
    t.deleteWhere(spark, col("id") < 10)
    t.deleteWhere(spark, col("id") < 20) // re-deletes 0-9 via fold; delta is 10-19
    val ch = t.changes(spark, s0)
      .filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ch === (0L until 20L), s"expected one delete per row, got $ch")
  }

  test("rewrite_position_delete_files(toVectors) converts and compacts") {
    val t = makeTable("convert", dv = false)
    // several small parquet delete commits
    Seq(0, 1, 2).foreach { r =>
      t.deleteWhere(spark, col("id") % 10 === r)
    }
    assert(deleteEntries(t).size >= 3)
    val dataBefore = t.metadata.currentSnapshot.toList.flatMap(t.planFiles(_))
      .filter(_.file.content == DataContent.Data).map(_.file.filePath).toSet
    t.rewritePositionDeleteFiles(spark, toVectors = Some(true))
    val after = deleteEntries(t)
    assert(after.nonEmpty && after.forall(_.file.isDeletionVector))
    // exactly one vector per data file with deletes, data files untouched
    assert(after.map(_.file.referencedDataFile.get).distinct.size === after.size)
    val dataAfter = t.metadata.currentSnapshot.toList.flatMap(t.planFiles(_))
      .filter(_.file.content == DataContent.Data).map(_.file.filePath).toSet
    assert(dataAfter === dataBefore)
    assert(ids(t) === (0L until 100L).filterNot(i => i % 10 <= 2))
    // superseded-vector cleanup: another delete + rewrite collapses the stack
    t.setProperties(Map(GraftTable.DvEnabledProp -> "true"))
    t.deleteWhere(spark, col("id") % 10 === 3)
    assert(deleteEntries(t).size > after.size)
    t.rewritePositionDeleteFiles(spark)
    val compacted = deleteEntries(t)
    assert(compacted.map(_.file.referencedDataFile.get).distinct.size === compacted.size)
    assert(ids(t) === (0L until 100L).filterNot(i => i % 10 <= 3))
  }

  test("SQL DELETE on a vector-enabled catalog table stages through vectors") {
    val wh = Files.createTempDirectory("graft-dv-wh").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.gdv", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdv.db")
    spark.sql("CREATE TABLE gdv.db.t (id BIGINT, v STRING) TBLPROPERTIES " +
      s"('${GraftTable.DvEnabledProp}' = 'true')")
    spark.sql("INSERT INTO gdv.db.t SELECT id, CAST(id AS STRING) FROM range(100)")
    spark.sql("DELETE FROM gdv.db.t WHERE id % 4 = 0")
    val fmts = spark.sql("SELECT file_path FROM gdv.db.t.files WHERE content = 1")
      .collect().map(_.getString(0))
    assert(fmts.nonEmpty && fmts.forall(_.endsWith(".puffin")),
      s"expected puffin delete files, got ${fmts.toSeq}")
    assert(spark.table("gdv.db.t").count() === 75L)
    assert(spark.sql("SELECT sum(id) FROM gdv.db.t").collect().head.getLong(0) ===
      (0L until 100L).filter(_ % 4 != 0).sum)
  }

  test("partitioned table: vectors carry their data file's partition tuple") {
    val df = sampleDf(90)
    val schema = SchemaConvert.fromSparkSchema(df.schema)
    val spec = IcePartitionSpec(0, List(IcePartitionField(
      schema.findField("grp").get.id, 1000, "identity", "grp")))
    val t = StorageCatalog.createOrReplaceTable(
      conf, freshDir("part"), schema, spec,
      Map(GraftTable.DvEnabledProp -> "true"))
    t.append(spark, df)
    t.deleteWhere(spark, col("id") % 5 === 0)
    val dels = deleteEntries(t)
    assert(dels.forall(_.file.isDeletionVector))
    assert(dels.forall(_.file.partition.exists(_.isDefined)),
      "vector entries should be partition-scoped")
    assert(ids(t) === (0L until 90L).filterNot(_ % 5 == 0))
  }
}
