package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Maintenance + evolution + REST catalog tests. */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("compaction collapses files and absorbs deletes; contents unchanged") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("compact")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    // several small appends + a delete
    (0 until 4).foreach { i =>
      t.append(spark, src.filter(pmod($"o_orderkey", lit(4)) === i))
    }
    t.equalityDelete(spark,
      src.filter($"o_orderstatus" === "P").select($"o_orderkey"), Seq("o_orderkey"))
    val before = t.planFiles(t.metadata.currentSnapshot.get)
    assert(before.count(_.file.content == DataContent.Data) >= 4)
    assert(before.exists(_.file.content == DataContent.EqualityDeletes))

    val exp = src.filter($"o_orderstatus" =!= "P")
    t.rewriteDataFiles(spark)
    val after = t.planFiles(t.metadata.currentSnapshot.get)
    assert(after.count(_.file.content == DataContent.Data) < before.size)
    assert(!after.exists(_.file.content == DataContent.EqualityDeletes))
    val back = t.scan(spark)
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
  }

  test("selective compaction rewrites only the small-file tail") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("smallcompact")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src) // one big file
    (0 until 4).foreach(i => t.append(spark, src.limit(5))) // small-file tail
    t.equalityDelete(spark,
      src.filter($"o_orderstatus" === "P").select($"o_orderkey"), Seq("o_orderkey"))
    val before = t.planFiles(t.metadata.currentSnapshot.get)
    val bigPaths = before
      .filter(p => p.file.content == DataContent.Data && p.file.fileSizeInBytes >= 20000)
      .map(_.file.filePath).toSet
    assert(bigPaths.nonEmpty)
    val expected = t.scan(spark) // full contents before compaction
    val expectedRows = expected.collect().toSeq

    t.rewriteSmallFiles(spark, smallFileThresholdBytes = 20000)
    val after = t.planFiles(t.metadata.currentSnapshot.get)
    // big files carried forward untouched, small ones replaced
    assert(bigPaths.subsetOf(
      after.filter(_.file.content == DataContent.Data).map(_.file.filePath).toSet))
    assert(after.count(_.file.content == DataContent.Data) < before.count(_.file.content == DataContent.Data))
    // delete files stay (they still guard the surviving big file)
    assert(after.exists(_.file.content == DataContent.EqualityDeletes))
    val back = t.scan(spark).collect().toSeq
    assert(back.map(_.toString).sorted === expectedRows.map(_.toString).sorted)
  }

  test("manifest compaction collapses the manifest list; contents unchanged") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("manifests")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    (1 to 6).foreach(_ => t.append(spark, src))
    val listBefore = ManifestIO.readManifestList(
      conf, t.metadata.currentSnapshot.get.manifestList)
    assert(listBefore.size === 6)
    t.rewriteManifests(spark)
    val listAfter = ManifestIO.readManifestList(
      conf, t.metadata.currentSnapshot.get.manifestList)
    assert(listAfter.size === 1)
    assert(t.scan(spark).count() === src.count() * 6)
  }

  test("rewrite_position_delete_files: tiny delete files merge, absorbed refs drop, data untouched") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("posdelcompact")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src) // one big file
    (0 until 3).foreach(i => t.append(spark, src.limit(5))) // small-file tail
    // a dozen tiny position-delete commits spanning big + small files
    (0 until 12).foreach { i =>
      t.deleteWhere(spark, pmod($"o_orderkey", lit(50)) === i)
    }
    // absorb the small tail's deletes via a selective data rewrite: the
    // delete files survive (they still guard the big file) but their
    // positions into retired paths are now dead weight
    t.rewriteSmallFiles(spark, smallFileThresholdBytes = 20000)
    val before = t.planFiles(t.metadata.currentSnapshot.get)
    val beforeDeletes = before.filter(_.file.content == DataContent.PositionDeletes)
    assert(beforeDeletes.size >= 12)
    val dataBefore = before.filter(_.file.content == DataContent.Data)
      .map(_.file.filePath).toSet
    val expected = t.scan(spark).collect().map(_.toString).sorted

    t.rewritePositionDeleteFiles(spark)
    val after = t.planFiles(t.metadata.currentSnapshot.get)
    val afterDeletes = after.filter(_.file.content == DataContent.PositionDeletes)
    // merged down, data files byte-identical
    assert(afterDeletes.size < beforeDeletes.size && afterDeletes.size <= 2)
    assert(after.filter(_.file.content == DataContent.Data)
      .map(_.file.filePath).toSet === dataBefore)
    // dead positions (into rewritten-away small files) were dropped
    assert(afterDeletes.map(_.file.recordCount).sum <
      beforeDeletes.map(_.file.recordCount).sum)
    // the rewrite is content-preserving and changelog-invisible
    assert(t.scan(spark).collect().map(_.toString).sorted === expected)
    assert(t.metadata.currentSnapshot.get.summary.get("operation") === Some("replace"))
  }

  test("orphan file cleanup deletes only unreferenced data files") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("orphans")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    // plant an orphan (e.g. from a crashed write attempt)
    val orphan = new org.apache.hadoop.fs.Path(s"$loc/data/orphan-junk.parquet")
    val fs = orphan.getFileSystem(conf)
    val out = fs.create(orphan)
    out.write(Array[Byte](1, 2, 3)); out.close()
    val deleted = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
    assert(deleted.exists(_.endsWith("orphan-junk.parquet")))
    assert(!fs.exists(orphan))
    // live data untouched, table still answers
    assert(t.scan(spark).count() === src.count())
  }

  test("maintenance deletion work runs in executor tasks, not the driver") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("distgc")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    // plant a pile of orphans (crashed write attempts)
    val fs = new org.apache.hadoop.fs.Path(loc).getFileSystem(conf)
    (0 until 20).foreach { i =>
      val p = new org.apache.hadoop.fs.Path(s"$loc/data/orphan-$i.parquet")
      val out = fs.create(p); out.write(Array[Byte](1, 2, 3)); out.close()
    }
    val execBefore = Metrics.get(Metrics.MaintenanceExecutorDeletes)
    val n = t.removeOrphanFilesCount(olderThanMs = System.currentTimeMillis() + 1000)
    assert(n >= 20) // the 20 planted orphans (+ any unreferenced write markers)
    (0 until 20).foreach { i =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$loc/data/orphan-$i.parquet")))
    }
    // the executor-side counter only increments inside a TaskContext —
    // this is the proof the deletes did NOT run as a driver loop
    assert(Metrics.get(Metrics.MaintenanceExecutorDeletes) - execBefore === n)
    assert(t.scan(spark).count() === src.count())

    // fused expiry's reclaim tail goes through the same executor path
    t.overwrite(spark, src)
    val execBefore2 = Metrics.get(Metrics.MaintenanceExecutorDeletes)
    t.expireSnapshots(
      olderThanMs = System.currentTimeMillis() + 1000, deleteDataFiles = true)
    assert(Metrics.get(Metrics.MaintenanceExecutorDeletes) - execBefore2 >= 1)
    assert(t.scan(spark).count() === src.count())
  }

  test("remove_orphan_files deletes only old unreferenced files") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("orphans")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.append(spark, src.limit(2))
    // plant orphans: a stale leftover under data/ and one under metadata/
    val staleData = new java.io.File(s"$loc/data/aborted-write/leftover.parquet")
    staleData.getParentFile.mkdirs()
    Files.write(staleData.toPath, Array[Byte](1, 2, 3))
    val staleMeta = new java.io.File(s"$loc/metadata/stale.avro")
    Files.write(staleMeta.toPath, Array[Byte](4, 5))
    staleData.setLastModified(System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
    staleMeta.setLastModified(System.currentTimeMillis() - 10L * 24 * 3600 * 1000)
    // a FRESH unreferenced file must survive (in-flight writer guard)
    val freshData = new java.io.File(s"$loc/data/in-flight/fresh.parquet")
    freshData.getParentFile.mkdirs()
    Files.write(freshData.toPath, Array[Byte](9))

    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    // dry run reports, deletes nothing
    val dry = t.removeOrphanFiles(cutoff, dryRun = true)
    assert(dry.map(new java.io.File(_).getName).toSet === Set("leftover.parquet", "stale.avro"))
    assert(staleData.exists() && staleMeta.exists())
    // real run deletes exactly those
    val removed = t.removeOrphanFiles(cutoff)
    assert(removed.size === 2)
    assert(!staleData.exists() && !staleMeta.exists())
    assert(freshData.exists(), "fresh unreferenced file must survive")
    // nothing referenced was touched: table reads intact, every metadata
    // version still present
    assert(t.scan(spark).count() === src.count() + 2)
    val t2 = StorageCatalog.loadTable(conf, loc)
    assert(t2.metadata.snapshots.size === 2)
    // the procedure surface
    val wh = new java.io.File(loc).getParent
    spark.conf.set("spark.sql.catalog.orphcat", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.orphcat.warehouse", wh)
    try {
      val res = spark.sql(
        s"""CALL orphcat.system.remove_orphan_files(
           |  table => '${new java.io.File(loc).getName}',
           |  older_than_ms => $cutoff, dry_run => true)""".stripMargin)
        .collect()
      assert(res.head.getLong(0) === 0L) // nothing old+unreferenced remains
    } finally {
      spark.conf.unset("spark.sql.catalog.orphcat")
      spark.conf.unset("spark.sql.catalog.orphcat.warehouse")
    }
  }

  test("expire snapshots drops old history but keeps current") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("expire")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"r_regionkey" < 2))
    t.append(spark, src.filter($"r_regionkey" >= 2))
    assert(t.metadata.snapshots.size === 2)
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(t.metadata.snapshots.size === 1)
    assert(t.scan(spark).count() === src.count())
  }

  test("expire_snapshots retain_last keeps recent ancestors past the cutoff") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("retainlast")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    (0 until 4).foreach(i => t.append(spark, src.filter($"r_regionkey" === i)))
    assert(t.metadata.snapshots.size === 4)
    // everything is older than the cutoff, but retain_last=3 keeps the
    // three newest ancestors of current
    t.expireSnapshots(
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 3)
    assert(t.metadata.snapshots.size === 3)
    assert(t.scan(spark).count() === 4)
    intercept[IllegalArgumentException] {
      t.expireSnapshots(olderThanMs = 0L, retainLast = 0)
    }
  }

  test("fused expiry reclaims files unreachable from surviving snapshots") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("expiregc")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    // snapshot 1: files shared with snapshot 2 (append chain)
    t.append(spark, src.filter($"r_regionkey" < 2))
    val sharedFiles = t.planFiles(t.metadata.currentSnapshot.get)
      .map(_.file.filePath)
    // snapshot 2 carries snapshot 1's files forward
    t.append(spark, src.filter($"r_regionkey" >= 2))
    // snapshot 3: overwrite — snapshots 1-2's files become expired-only
    t.overwrite(spark, src)
    val beforeFiles = (t.planFiles(t.metadata.snapshots.head).map(_.file.filePath) ++
      sharedFiles).distinct
    val liveFiles = t.planFiles(t.metadata.currentSnapshot.get).map(_.file.filePath)
    val fs = new org.apache.hadoop.fs.Path(loc).getFileSystem(conf)
    assert(sharedFiles.forall(p => fs.exists(new org.apache.hadoop.fs.Path(p))))
    t.expireSnapshots(
      olderThanMs = System.currentTimeMillis() + 1000, deleteDataFiles = true)
    assert(t.metadata.snapshots.size === 1)
    // expired-only files are GONE, live ones untouched, table still answers
    sharedFiles.foreach(p =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(p)), s"expired file survived: $p"))
    liveFiles.foreach(p =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(p)), s"live file deleted: $p"))
    assert(t.scan(spark).count() === src.count())
    assert(beforeFiles.nonEmpty)
  }

  test("fused expiry never deletes files still reachable from a kept snapshot") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("expiregcshared")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"r_regionkey" < 2))
    val shared = t.planFiles(t.metadata.currentSnapshot.get).map(_.file.filePath)
    t.append(spark, src.filter($"r_regionkey" >= 2))
    // expire snapshot 1 only; snapshot 2 still references snapshot 1's files
    t.expireSnapshots(
      olderThanMs = System.currentTimeMillis() + 1000, deleteDataFiles = true)
    assert(t.metadata.snapshots.size === 1)
    val fs = new org.apache.hadoop.fs.Path(loc).getFileSystem(conf)
    shared.foreach(p =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(p)), s"shared file deleted: $p"))
    assert(t.scan(spark).count() === src.count())
  }

  test("expire_snapshots procedure takes the delete_data_files flag") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val wh = tmpLocation("procgcwh")
    spark.conf.set("spark.sql.catalog.gexp", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gexp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gexp.db")
    spark.sql("CREATE TABLE gexp.db.t (r_regionkey INT, r_name STRING)")
    src.createOrReplaceTempView("gexp_src")
    spark.sql("INSERT INTO gexp.db.t SELECT * FROM gexp_src")
    val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
    val old = t.planFiles(t.metadata.currentSnapshot.get).map(_.file.filePath)
    spark.sql("INSERT OVERWRITE gexp.db.t SELECT * FROM gexp_src")
    val row = spark.sql(
      s"CALL gexp.system.expire_snapshots('db.t', ${System.currentTimeMillis() + 1000}, true)")
      .collect().head
    assert(row.getLong(0) >= 1L)
    val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(conf)
    old.foreach(p =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(p)), s"expired file survived: $p"))
    assert(spark.sql("SELECT count(*) FROM gexp.db.t").collect().head.getLong(0) === src.count())
  }

  test("expire keeps snapshots reachable from live refs; ref ages out by maxRefAgeMs") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("refsafe")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"r_regionkey" < 2))
    val tagged = t.metadata.currentSnapshotId.get
    t.createTag("keeper", tagged)
    t.append(spark, src.filter($"r_regionkey" >= 2))
    // expire everything older than now: the tagged snapshot must survive
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(t.metadata.snapshotById(tagged).isDefined)
    assert(t.scanRef(spark, "keeper").count() === 2)
    // a ref past its max age retires, then its snapshot can expire
    val t2 = StorageCatalog.loadTable(conf, loc)
    val aged = t2.metadata.refs("keeper").copy(maxRefAgeMs = Some(0L))
    t2.metadata = t2.metadata.copy(refs = t2.metadata.refs + ("keeper" -> aged))
    t2.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(!t2.metadata.refs.contains("keeper"))
    assert(t2.metadata.snapshotById(tagged).isEmpty)
  }

  test("partition-scoped position deletes prune away with their partition") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("posscope")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, List(IcePartitionField(
        SchemaConvert.fromSparkSchema(src.schema).findField("o_orderstatus").get.id,
        1000, "identity", "status"))))
    t.append(spark, src)
    val pos = t.scan(spark, keepFilePos = true)
      .filter($"o_orderstatus" === "F" && pmod($"o_orderkey", lit(10)) === 0)
      .select($"_file".as("file_path"), $"_pos".as("pos"))
    t.positionDelete(spark, pos)
    // delete files carry the partition tuple of the rows they delete
    val deletes = t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.PositionDeletes)
    assert(deletes.nonEmpty && deletes.forall(_.file.partition == Seq(Some("F"))))
    // a scan of another partition joins NO delete files
    assert(t.deleteFilesForScan(Some($"o_orderstatus" === "O")).isEmpty)
    assert(t.deleteFilesForScan(Some($"o_orderstatus" === "F")).nonEmpty)
    // contents: F loses its multiples of 10, O untouched
    val back = t.scan(spark)
    val exp = src.filter(!($"o_orderstatus" === "F" && pmod($"o_orderkey", lit(10)) === 0))
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
  }

  test("schema evolution: add column (old files read null), drop, rename") {
    val src = spark.read.parquet(s"$sfDir/nation.parquet")
    val loc = tmpLocation("evolve")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.addColumn("score", IcePrim("double"))
    val withScore = src.withColumn("score", $"n_nationkey" * 2.0)
    t.append(spark, withScore)
    val back = t.scan(spark)
    assert(back.columns.contains("score"))
    assert(back.count() === src.count() * 2)
    assert(back.filter($"score".isNull).count() === src.count())
    assert(back.filter($"score" === $"n_nationkey" * 2.0).count() === src.count())
    // old snapshot still reads the old schema
    val firstSnap = t.metadata.snapshots.head.snapshotId
    assert(!t.scan(spark, snapshotId = Some(firstSnap)).columns.contains("score"))
    // drop
    t.dropColumn("score")
    assert(!t.scan(spark).columns.contains("score"))
    // rename keeps the id
    val idBefore = t.metadata.currentSchema.findField("n_name").get.id
    t.renameColumn("n_name", "nation_name")
    assert(t.metadata.currentSchema.findField("nation_name").get.id === idBefore)
  }

  test("required column with default: old files serve the default, SQL round-trips it") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("defaults")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    // required without default on a non-empty table must be rejected
    intercept[IllegalArgumentException] {
      t.addColumn("tier", IcePrim("string"), required = true)
    }
    t.addColumn("tier", IcePrim("string"), required = true, default = Some("basic"))
    // a write omitting the column gets the write-default
    t.append(spark, src.limit(1))
    t.append(spark, src.limit(1).withColumn("tier", lit("pro")))
    val back = t.scan(spark)
    assert(back.filter($"tier" === "basic").count() === src.count() + 1)
    assert(back.filter($"tier" === "pro").count() === 1)
    assert(back.filter($"tier".isNull).count() === 0)
    // defaults survive the metadata JSON round-trip
    val reloaded = StorageCatalog.loadTable(conf, loc)
    val f = reloaded.metadata.currentSchema.findField("tier").get
    assert(f.required && f.initialDefault === Some("basic") && f.writeDefault === Some("basic"))
    assert(reloaded.scan(spark).filter($"tier" === "basic").count() === src.count() + 1)
  }

  test("branches and tags") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("refs")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"r_regionkey" < 2))
    val v1 = t.metadata.currentSnapshotId.get
    t.createTag("v1.0", v1)
    t.append(spark, src.filter($"r_regionkey" >= 2))
    assert(t.scanRef(spark, "v1.0").count() === 2)
    assert(t.scanRef(spark, "main").count() === src.count())
    val reloaded = StorageCatalog.loadTable(conf, loc)
    assert(reloaded.metadata.refs.contains("v1.0"))
  }

  test("format-version-1 tables: manifests written in v1 schema, read back fine") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("v1fmt")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil),
      formatVersion = 1)
    t.append(spark, src)
    t.append(spark, src.limit(2))
    val back = t.scan(spark)
    assert(back.count() === src.count() + 2)
    // v1 rejects delete files (MoR is a v2 feature)
    intercept[IllegalArgumentException] {
      t.equalityDelete(spark, src.limit(1).select($"r_regionkey"), Seq("r_regionkey"))
    }
    // fresh load parses the v1 manifests + list
    val reloaded = StorageCatalog.loadTable(conf, loc)
    assert(reloaded.metadata.formatVersion === 1)
    assert(reloaded.planFiles(reloaded.metadata.currentSnapshot.get).size ===
      t.planFiles(t.metadata.currentSnapshot.get).size)
  }

  test("declared sort order: files sorted desc and stamped with the order id") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("sortord")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.setSortOrder(Seq(("o_totalprice", "desc", "nulls-last")))
    t.append(spark, src)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    val orderId = t.metadata.defaultSortOrderId
    assert(orderId > 0)
    assert(files.forall(_.file.sortOrderId === Some(orderId)))
    // within each file, o_totalprice is non-increasing
    files.foreach { p =>
      val prices = spark.read.parquet(p.file.filePath)
        .select($"o_totalprice").collect().map(_.getDouble(0))
      assert(prices.zip(prices.drop(1)).forall { case (a, b) => a >= b })
    }
    // survives metadata round-trip
    val reloaded = StorageCatalog.loadTable(conf, loc)
    assert(reloaded.metadata.sortOrders.exists(o =>
      o.orderId == orderId && o.fields.head.direction == "desc"))
  }

  test("partition spec evolution: old files keep their spec, new writes use the new one") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("specevo")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"o_orderkey" % 2 === 0))
    val statusId = t.metadata.currentSchema.findField("o_orderstatus").get.id
    t.updatePartitionSpec(List(IcePartitionField(statusId, 0, "identity", "status")))
    t.append(spark, src.filter($"o_orderkey" % 2 =!= 0))
    assert(t.metadata.partitionSpecs.size === 2)
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
    assert(planned.exists(_.specId === 0) && planned.exists(_.specId === 1))
    // filtered scan: new-spec files prune by partition, old-spec files
    // (unpartitioned tuple) are conservatively kept — results exact
    val got = t.scan(spark, filter = Some($"o_orderstatus" === "F"))
    val exp = src.filter($"o_orderstatus" === "F")
    assert(got.count() === exp.count())
    assert(got.exceptAll(exp).isEmpty)
    // pruning dropped at least the new-spec files of other partitions
    val newSpecFiles = planned.filter(_.specId === 1).size
    val scanned = t.filesForScan(Some($"o_orderstatus" === "F")).size
    assert(scanned < planned.size)
    assert(newSpecFiles > 1)
    // dynamic overwrite is ill-defined while old-spec files remain (their
    // tuples are not comparable): must refuse, not silently lose data
    intercept[IllegalArgumentException] {
      t.overwriteDynamic(spark, src.filter($"o_orderstatus" === "F").limit(10))
    }
    // after compaction (all files rewritten under the default spec) it works
    t.rewriteDataFiles(spark)
    t.overwriteDynamic(spark,
      src.filter($"o_orderstatus" === "F").limit(10)
        .withColumn("o_totalprice", lit(0.0)))
    val after = t.scan(spark)
    assert(after.filter($"o_orderstatus" === "F").count() === 10)
    assert(after.filter($"o_orderstatus" =!= "F").count() ===
      src.filter($"o_orderstatus" =!= "F").count())
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD: transforms, aliases, errors") {
    val wh = tmpLocation("specddl")
    spark.conf.set("spark.sql.catalog.gsd", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsd.db")
    spark.sql("CREATE TABLE gsd.db.t (id BIGINT, cat STRING, ts TIMESTAMP)")
    spark.sql("ALTER TABLE gsd.db.t ADD PARTITION FIELD cat")
    spark.sql("ALTER TABLE gsd.db.t ADD PARTITION FIELD bucket(16, id) AS idb")
    spark.sql("ALTER TABLE gsd.db.t ADD PARTITION FIELD days(ts)")
    val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
    assert(t.metadata.defaultSpec.fields.map(f => (f.name, f.transform)) ===
      List(("cat", "identity"), ("idb", "bucket[16]"), ("ts_day", "day")))
    // drop by transform expression (not only by name)
    spark.sql("ALTER TABLE gsd.db.t DROP PARTITION FIELD bucket(16, id)")
    t.refresh()
    assert(t.metadata.defaultSpec.fields.map(_.name) === List("cat", "ts_day"))
    // unknown field/transform fails loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE gsd.db.t DROP PARTITION FIELD bucket(99, id)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gsd.db.t ADD PARTITION FIELD no_such_col")
    }
    // REPLACE swaps old for new in ONE spec commit
    val verBefore = { t.refresh(); t.metadata.defaultSpecId }
    spark.sql("ALTER TABLE gsd.db.t REPLACE PARTITION FIELD ts_day WITH hours(ts)")
    t.refresh()
    assert(t.metadata.defaultSpec.fields.map(f => (f.name, f.transform)) ===
      List(("cat", "identity"), ("ts_hour", "hour")))
    assert(t.metadata.defaultSpecId === verBefore + 1) // one commit, not two
    spark.sql("ALTER TABLE gsd.db.t REPLACE PARTITION FIELD cat WITH bucket(4, cat) AS catb")
    t.refresh()
    assert(t.metadata.defaultSpec.fields.map(_.name) === List("ts_hour", "catb"))
    intercept[Exception] {
      spark.sql("ALTER TABLE gsd.db.t REPLACE PARTITION FIELD nope WITH cat")
    }
    // everything else still parses through the delegate
    assert(spark.sql("SELECT 1 + 1 AS two").head.getInt(0) === 2)
  }

  test("SQL branch/tag DDL and WRITE ORDERED BY") {
    val wh = tmpLocation("refddl")
    spark.conf.set("spark.sql.catalog.grd", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grd.db")
    spark.sql("CREATE TABLE grd.db.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO grd.db.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("ALTER TABLE grd.db.t CREATE TAG v1")
    spark.sql("INSERT INTO grd.db.t VALUES (3, 3.0)")
    spark.sql("ALTER TABLE grd.db.t CREATE BRANCH dev")
    assert(spark.sql("SELECT count(*) FROM grd.db.t VERSION AS OF 'v1'")
      .head.getLong(0) === 2)
    assert(spark.sql("SELECT count(*) FROM grd.db.t VERSION AS OF 'dev'")
      .head.getLong(0) === 3)
    spark.sql("ALTER TABLE grd.db.t DROP TAG v1")
    val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
    assert(!t.metadata.refs.contains("v1") && t.metadata.refs.contains("dev"))
    // kind mismatch and main are refused
    intercept[Exception] { spark.sql("ALTER TABLE grd.db.t DROP TAG dev") }
    intercept[Exception] { spark.sql("ALTER TABLE grd.db.t DROP BRANCH main") }
    // declared write order: subsequent files sort desc + stamp the order
    spark.sql("ALTER TABLE grd.db.t WRITE ORDERED BY v DESC")
    spark.sql("INSERT INTO grd.db.t VALUES (4, 1.5), (5, 9.0), (6, 0.5)")
    t.refresh()
    val orderId = t.metadata.defaultSortOrderId
    assert(orderId > 0)
    val newest = t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.seq == t.metadata.currentSnapshot.get.sequenceNumber)
    assert(newest.nonEmpty && newest.forall(_.file.sortOrderId === Some(orderId)))

    // AS OF VERSION + retention clauses
    val firstSnap = t.metadata.snapshots.minBy(_.sequenceNumber).snapshotId
    spark.sql(s"ALTER TABLE grd.db.t CREATE TAG old AS OF VERSION $firstSnap RETAIN 2 DAYS")
    spark.sql(
      s"""ALTER TABLE grd.db.t CREATE BRANCH hist AS OF VERSION $firstSnap
         |RETAIN 30 DAYS WITH SNAPSHOT RETENTION 3 SNAPSHOTS 7 DAYS""".stripMargin)
    t.refresh()
    val tag = t.metadata.refs("old")
    assert(tag.snapshotId === firstSnap && tag.maxRefAgeMs === Some(2L * 86400000))
    val br = t.metadata.refs("hist")
    assert(br.snapshotId === firstSnap &&
      br.maxRefAgeMs === Some(30L * 86400000) &&
      br.minSnapshotsToKeep === Some(3) &&
      br.maxSnapshotAgeMs === Some(7L * 86400000))
    assert(spark.sql("SELECT count(*) FROM grd.db.t VERSION AS OF 'hist'")
      .head.getLong(0) === 2)
    intercept[Exception] {
      spark.sql("ALTER TABLE grd.db.t CREATE TAG bad AS OF VERSION 999999")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE grd.db.t CREATE TAG bad2 WITH SNAPSHOT RETENTION 3 SNAPSHOTS")
    }
  }

  test("REST catalog namespaces + rename") {
    val server = new RestCatalog.Server()
    val uri = server.start()
    try {
      val client = new RestCatalog.Client(uri, conf)
      client.createNamespace("prod")
      client.createNamespace("dev")
      assert(client.listNamespaces().toSet === Set("prod", "dev"))
      assert(client.namespaceExists("prod") && !client.namespaceExists("qa"))

      val src = spark.read.parquet(s"$sfDir/region.parquet")
      val schema = SchemaConvert.fromSparkSchema(src.schema)
      val loc = tmpLocation("restns")
      val meta = TableMetadata(
        formatVersion = 2, tableUuid = java.util.UUID.randomUUID().toString,
        location = loc, lastSequenceNumber = 0,
        lastUpdatedMs = System.currentTimeMillis(),
        lastColumnId = schema.maxFieldId, schemas = List(schema),
        currentSchemaId = 0, partitionSpecs = List(IcePartitionSpec(0, Nil)),
        defaultSpecId = 0, lastPartitionId = 999, properties = Map.empty,
        currentSnapshotId = None, snapshots = Nil, snapshotLog = Nil,
        metadataLog = Nil, sortOrders = List(IceSortOrder(0, Nil)),
        defaultSortOrderId = 0, refs = Map.empty)
      client.createTable("prod", "region", meta).append(spark, src)
      // non-empty namespace refuses to drop
      client.dropNamespace("prod")
      assert(client.namespaceExists("prod"))
      // rename moves the catalog pointer; data reads back identically
      client.renameTable("prod", "region", "dev", "region_renamed")
      assert(client.listTables("prod").isEmpty)
      assert(client.listTables("dev") === Seq("region_renamed"))
      assert(client.loadTable("dev", "region_renamed").scan(spark).count() === src.count())
      // empty namespace drops
      client.dropNamespace("prod")
      assert(!client.namespaceExists("prod"))
    } finally server.stop()
  }

  test("write.sort-order and max-records-per-file properties") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("sorted")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil),
      properties = Map(
        "write.sort-order" -> "o_orderkey",
        "write.max-records-per-file" -> "200"))
    t.append(spark, src)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.forall(_.file.recordCount <= 200))
    assert(files.size >= (src.count() / 200).toInt)
    assert(t.scan(spark).count() === src.count())
  }

  test("REST catalog: create, load, append via HTTP commits, CAS conflict") {
    val server = new RestCatalog.Server()
    val uri = server.start()
    try {
      val client = new RestCatalog.Client(uri, conf)
      assert(client.config() !== null)

      val src = spark.read.parquet(s"$sfDir/region.parquet")
      val loc = tmpLocation("rest")
      val schema = SchemaConvert.fromSparkSchema(src.schema)
      val meta = TableMetadata(
        formatVersion = 2, tableUuid = java.util.UUID.randomUUID().toString,
        location = loc, lastSequenceNumber = 0, lastUpdatedMs = System.currentTimeMillis(),
        lastColumnId = schema.maxFieldId, schemas = List(schema), currentSchemaId = 0,
        partitionSpecs = List(IcePartitionSpec(0, Nil)), defaultSpecId = 0,
        lastPartitionId = 999, properties = Map.empty, currentSnapshotId = None,
        snapshots = Nil, snapshotLog = Nil, metadataLog = Nil,
        sortOrders = List(IceSortOrder(0, Nil)), defaultSortOrderId = 0, refs = Map.empty)
      val t = client.createTable("db", "regions", meta)
      t.append(spark, src)
      assert(t.version === 2)

      val t2 = client.loadTable("db", "regions")
      assert(t2.metadata.currentSnapshotId.isDefined)
      assert(t2.scan(spark).count() === src.count())
      assert(client.listTables("db") === Seq("regions"))

      // stale writer must hit the CAS and retry through refresh
      val stale = client.loadTable("db", "regions")
      t2.append(spark, src.limit(1)) // moves version to 3
      stale.append(spark, src.limit(2)) // conflicts, retries, succeeds
      val finalT = client.loadTable("db", "regions")
      assert(finalT.scan(spark).count() === src.count() + 3)
    } finally server.stop()
  }

  test("REST conformance: uuid requirement, contention retries, rename/drop races") {
    val server = new RestCatalog.Server()
    val uri = server.start()
    try {
      val client = new RestCatalog.Client(uri, conf)
      val src = spark.read.parquet(s"$sfDir/region.parquet")
      val schema = SchemaConvert.fromSparkSchema(src.schema)
      def freshMeta(loc: String) = TableMetadata(
        formatVersion = 2, tableUuid = java.util.UUID.randomUUID().toString,
        location = loc, lastSequenceNumber = 0, lastUpdatedMs = System.currentTimeMillis(),
        lastColumnId = schema.maxFieldId, schemas = List(schema), currentSchemaId = 0,
        partitionSpecs = List(IcePartitionSpec(0, Nil)), defaultSpecId = 0,
        lastPartitionId = 999, properties = Map.empty, currentSnapshotId = None,
        snapshots = Nil, snapshotLog = Nil, metadataLog = Nil,
        sortOrders = List(IceSortOrder(0, Nil)), defaultSortOrderId = 0, refs = Map.empty)

      client.createNamespace("cf")
      val t = client.createTable("cf", "t", freshMeta(tmpLocation("restcf")))
      t.append(spark, src)

      // requirement-failed: a writer whose table was dropped and RECREATED
      // underneath (same identifier, new uuid) must get 409, NOT silently
      // commit onto the impostor — the uuid assertion is what catches it
      val staleWriter = client.loadTable("cf", "t")
      client.dropTable("cf", "t")
      val recreated = client.createTable("cf", "t", freshMeta(tmpLocation("restcf2")))
      recreated.append(spark, src.limit(1))
      intercept[CommitConflictException] {
        // direct commit (no retry loop): version matches (2) but uuid differs
        client.commitTable("cf", "t", 2, staleWriter.metadata)
      }
      // the RETRY path must not sneak around it either: append -> 409 ->
      // refresh sees a different uuid and refuses to adopt the impostor
      intercept[IllegalStateException] {
        staleWriter.append(spark, src.limit(1))
      }

      // contention: 4 writers x 3 appends race on one table; every commit
      // conflict must reload + retry until it lands (409 -> refresh path)
      client.createNamespace("race")
      client.createTable("race", "hot", freshMeta(tmpLocation("restrace")))
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          val mine = client.loadTable("race", "hot")
          (0 until 3).foreach(_ => mine.append(spark, src.limit(1)))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val hot = client.loadTable("race", "hot")
      assert(hot.scan(spark).count() === 12)
      assert(hot.version === 13) // 1 create + 12 commits, none lost

      // rename races: source disappears after the first rename wins -> 404;
      // renaming onto an existing destination -> 409 (both surface as
      // errors, never silent overwrites)
      client.createNamespace("mv")
      client.createTable("mv", "a", freshMeta(tmpLocation("restmva")))
      client.createTable("mv", "b", freshMeta(tmpLocation("restmvb")))
      client.renameTable("mv", "a", "mv", "c")
      intercept[IllegalArgumentException] { client.renameTable("mv", "a", "mv", "d") }
      intercept[IllegalArgumentException] { client.renameTable("mv", "c", "mv", "b") }
      assert(client.listTables("mv").toSet === Set("b", "c"))

      // commit to a dropped table: 404 is terminal (fail fast, no retry)
      val gone = client.loadTable("mv", "b")
      client.dropTable("mv", "b")
      intercept[IllegalArgumentException] {
        client.commitTable("mv", "b", gone.version, gone.metadata)
      }
    } finally server.stop()
  }

  test("REST conformance: paged listings and spec-shaped error bodies") {
    val server = new RestCatalog.Server(pageSize = 2)
    val uri = server.start()
    try {
      val client = new RestCatalog.Client(uri, conf)
      val schema = SchemaConvert.fromSparkSchema(
        spark.read.parquet(s"$sfDir/region.parquet").schema)
      def freshMeta(loc: String) = TableMetadata(
        formatVersion = 2, tableUuid = java.util.UUID.randomUUID().toString,
        location = loc, lastSequenceNumber = 0, lastUpdatedMs = System.currentTimeMillis(),
        lastColumnId = schema.maxFieldId, schemas = List(schema), currentSchemaId = 0,
        partitionSpecs = List(IcePartitionSpec(0, Nil)), defaultSpecId = 0,
        lastPartitionId = 999, properties = Map.empty, currentSnapshotId = None,
        snapshots = Nil, snapshotLog = Nil, metadataLog = Nil,
        sortOrders = List(IceSortOrder(0, Nil)), defaultSortOrderId = 0, refs = Map.empty)
      (1 to 5).foreach(i => client.createNamespace(s"pg$i"))
      (1 to 5).foreach(i =>
        client.createTable("pg1", s"t$i", freshMeta(tmpLocation(s"restpg$i"))))

      // the client walks next-page-token to exhaustion (5 items, pages of 2)
      assert(client.listTables("pg1") === (1 to 5).map(i => s"t$i"))
      assert(client.listNamespaces().toSet === (1 to 5).map(i => s"pg$i").toSet)

      // raw HTTP: one page is bounded and carries the continuation token
      val http = java.net.http.HttpClient.newHttpClient()
      def getRaw(path: String): String = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$uri$path")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val page1 = org.json4s.jackson.JsonMethods.parse(getRaw("/v1/namespaces/pg1/tables"))
      assert((page1 \ "identifiers").children.size === 2)
      val org.json4s.JString(tok) = (page1 \ "next-page-token"): @unchecked
      val page2 = org.json4s.jackson.JsonMethods.parse(
        getRaw(s"/v1/namespaces/pg1/tables?pageToken=$tok"))
      assert((page2 \ "identifiers").children.size === 2)
      // an explicit pageSize overrides the server default
      val big = org.json4s.jackson.JsonMethods.parse(
        getRaw("/v1/namespaces/pg1/tables?pageSize=10"))
      assert((big \ "identifiers").children.size === 5)
      assert((big \ "next-page-token") === org.json4s.JNothing)

      // spec-shaped ErrorResponse: {"error": {"message", "type", "code"}}
      val errJ = org.json4s.jackson.JsonMethods.parse(
        getRaw("/v1/namespaces/pg1/tables/nope")) \ "error"
      assert((errJ \ "type") === org.json4s.JString("NoSuchTableException"))
      assert((errJ \ "code") === org.json4s.JInt(404))
      assert((errJ \ "message") === org.json4s.JString("no such table"))
      // and the client surfaces type+message in its failures
      val e = intercept[Exception] { client.loadTable("pg9", "nope") }
      assert(e.isInstanceOf[NoSuchElementException])
    } finally server.stop()
  }

  test("streaming source over snapshot history (resumable offsets)") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("streamsrc")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"r_regionkey" < 2))
    val name = s"stream_src_${System.nanoTime()}"
    val q = spark.readStream.format("graft-stream").option("location", loc).load()
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table(name).count() === 2)
    t.append(spark, src.filter($"r_regionkey" >= 2))
    q.processAllAvailable()
    assert(spark.table(name).count() === src.count())
    q.stop()
  }

  test("streaming sink: upsert mode per micro-batch; replayed batch ids are skipped") {
    val seed = Seq((0L, "seed", 0.0)).toDF("user_id", "event_type", "value").limit(0)
    val loc = tmpLocation("streamsink")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(seed.schema), IcePartitionSpec(0, Nil))
    // drive the sink directly with deterministic micro-batches
    val sink = new graft.streaming.GraftStreamSink(loc, Some(Seq("user_id")), None, "t1")
    sink.addBatch(0, Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("user_id", "event_type", "value"))
    sink.addBatch(1, Seq((2L, "b2", 2.5), (3L, "c", 3.0)).toDF("user_id", "event_type", "value"))
    // replay of batch 1 (checkpoint restart) must be a no-op
    sink.addBatch(1, Seq((9L, "dup", 9.9)).toDF("user_id", "event_type", "value"))
    val rows = StorageCatalog.loadTable(conf, loc).scan(spark)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // a SECOND query into the same table has its own batch-id key: its
    // batch 0 must not be mistaken for a replay of the first query's
    val sink2 = new graft.streaming.GraftStreamSink(loc, Some(Seq("user_id")), None, "t2")
    sink2.addBatch(0, Seq((7L, "other", 7.0)).toDF("user_id", "event_type", "value"))
    assert(StorageCatalog.loadTable(conf, loc).scan(spark).count() === 4)
  }

  test("metrics counters track writes, commits, scans, pruning") {
    Metrics.reset()
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("metrics")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    assert(Metrics.get(Metrics.CommitsTotal) === 1)
    assert(Metrics.get(Metrics.RecordsWritten) === src.count())
    assert(Metrics.get(Metrics.DataFilesWritten) >= 1)
    // a bare count() is answered from manifest stats (metadata-only
    // aggregate pushdown): the scan plans but NO file is opened
    t.scan(spark).count()
    assert(Metrics.get(Metrics.ScansPlanned) >= 1)
    assert(Metrics.get(Metrics.FilesScanned) === 0)
    // a filtered count defeats the stats path and really scans files
    t.scan(spark).filter($"r_regionkey" >= 0).count()
    assert(Metrics.get(Metrics.ScansPlanned) >= 2)
    assert(Metrics.get(Metrics.FilesScanned) >= 1)
  }

  test("rename keeps reading old files via field-id resolution") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("rename-read")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.renameColumn("r_name", "region_name")
    val back = t.scan(spark)
    assert(back.columns.toSeq === Seq("r_regionkey", "region_name"))
    // pre-rename files must surface their values under the new name
    assert(back.filter($"region_name".isNull).count() === 0)
    assert(back.select("region_name").as[String].collect().toSet ===
      src.select("r_name").as[String].collect().toSet)
    // conf hygiene: field-id resolution rides a pinned clone session —
    // the user's own session conf must stay at its default (false), so a
    // concurrent non-graft parquet read keeps name-based resolution
    assert(spark.conf.get("spark.sql.parquet.fieldId.read.enabled") === "false")
  }

  test("zorder rewrite prunes on BOTH clustered columns; contents unchanged") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val loc = tmpLocation("zorder")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    // linear layout first: sorted by custkey only
    t.append(spark, src.orderBy("o_custkey").coalesce(1))
    t.rewriteZOrder(spark, Seq("o_custkey", "o_totalprice"),
      targetFileSizeBytes = 2 * 1024)
    val snap = t.metadata.currentSnapshot.get
    val all = t.planFiles(snap)
    assert(all.size >= 8, s"want >=8 z-files to make pruning measurable, got ${all.size}")

    def prunedCount(c: org.apache.spark.sql.Column): Int =
      all.size - PruneEval.prunePlanned(
        all, Some(c), t.metadata, t.metadata.currentSchema).size

    val ckLo = src.agg(expr("percentile(o_custkey, 0.1)")).head.getDouble(0)
    val tpLo = src.agg(expr("percentile(o_totalprice, 0.1)")).head.getDouble(0)
    // a narrow predicate on EITHER dimension must skip files — the point
    // of the curve vs a linear sort (which serves only its lead column)
    assert(prunedCount(col("o_custkey") <= ckLo.toLong) > 0, "no pruning on o_custkey")
    assert(prunedCount(col("o_totalprice") <= tpLo) > 0, "no pruning on o_totalprice")
    // content identical after the rewrite
    assert(t.scan(spark).count() === src.count())
    assert(t.scan(spark).agg(sum("o_orderkey")).head.getLong(0) ===
      src.agg(sum("o_orderkey")).head.getLong(0))
  }

  test("WAP: branch writes stay invisible on main until fastForward") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("wap")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter(col("r_regionkey") < 3))
    t.appendToBranch(spark, src.filter(col("r_regionkey") >= 3), "audit")
    // staged rows: visible on the branch, invisible on main
    assert(t.scan(spark).count() === 3)
    assert(t.scanRef(spark, "audit").count() === 5)
    // a second branch write stacks on the branch head
    t.appendToBranch(spark, src.filter(col("r_regionkey") === 0), "audit")
    assert(t.scanRef(spark, "audit").count() === 6)
    assert(t.scan(spark).count() === 3)
    // publish
    t.fastForward("main", "audit")
    assert(t.scan(spark).count() === 6)
    // reload from disk sees the same state
    val re = StorageCatalog.loadTable(conf, loc)
    assert(re.scan(spark).count() === 6)
    assert(re.metadata.refs("audit").snapshotId === re.metadata.currentSnapshotId.get)
  }

  test("add_files imports foreign parquet in place; SQL reads it; duplicates refuse") {
    val wh = tmpLocation("addfiles")
    spark.conf.set("spark.sql.catalog.gaf", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gaf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gaf.db")
    spark.sql("CREATE TABLE gaf.db.t (r_regionkey INT, r_name STRING)")
    // foreign parquet: written by a plain Spark session, no field ids
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val ext = tmpLocation("extparquet")
    src.write.parquet(ext)
    val row = spark.sql(s"CALL gaf.system.add_files('db.t', '$ext')").collect().head
    assert(row.getLong(1) === src.count())
    // files referenced in place (never copied under the warehouse)
    val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
    assert(t.planFiles(t.metadata.currentSnapshot.get)
      .forall(p => GraftTable.normPathStr(p.file.filePath).startsWith(ext)))
    // the native DSv2 SQL read resolves id-less columns by name (the
    // filter defeats the stats-only count path — files really open)
    assert(spark.sql("SELECT count(*) FROM gaf.db.t WHERE r_regionkey >= 0")
      .head.getLong(0) === src.count())
    // graft's own id-carrying writes coexist with imported files
    spark.sql("INSERT INTO gaf.db.t VALUES (99, 'new')")
    assert(spark.sql("SELECT count(*) FROM gaf.db.t").head.getLong(0) === src.count() + 1)
    // re-import would double rows: refuse
    intercept[Exception] { spark.sql(s"CALL gaf.system.add_files('db.t', '$ext')") }
  }

  test("name mapping keeps imported columns alive across renames") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val ext = tmpLocation("nmext")
    src.write.parquet(ext)
    val loc = tmpLocation("nmtable")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.addFiles(spark, ext)
    // import pinned a default name mapping (field id -> import-time name)
    val mapping = t.metadata.properties(NameMapping.PropertyKey)
    assert(mapping.contains("\"names\":[\"r_name\"]"))
    // rename AFTER import: without the mapping, by-name resolution would
    // silently null the imported files' column under its new name
    t.renameColumn("r_name", "region_title")
    val rows = t.scan(spark).select("r_regionkey", "region_title").collect()
    assert(rows.length === src.count())
    assert(rows.forall(r => r.getString(1) != null && r.getString(1).nonEmpty))
    val expected = src.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows.map(r => r.getInt(0) -> r.getString(1)).toMap === expected)
    // graft-written (id-carrying) files still resolve by id alongside
    t.append(spark, t.scan(spark).limit(1))
    assert(t.scan(spark).where(org.apache.spark.sql.functions.col("region_title").isNotNull)
      .count() === src.count() + 1)
    // a pre-existing mapping is never overwritten by a second import
    val ext2 = tmpLocation("nmext2")
    src.withColumnRenamed("r_name", "region_title").write.parquet(ext2)
    t.addFiles(spark, ext2)
    assert(t.metadata.properties(NameMapping.PropertyKey) === mapping)
    // rename-then-READD: the new 'r_name' column's id has no mapping
    // entry, so for the imported files it is ABSENT (reads null) — it
    // must NOT resolve by current name, which would put 'r_name' in the
    // read schema twice (the mapped old id also reads under 'r_name')
    // and make the parquet read ambiguous
    val t2 = t.addColumn("r_name", IcePrim("string"))
    val rows2 = t2.scan(spark)
      .select("r_regionkey", "region_title", "r_name").collect()
    assert(rows2.length === 2 * src.count() + 1)
    assert(rows2.forall(_.getString(2) == null), "new column reads null from imports")
    // first-import + graft-written rows still resolve region_title (the
    // ext2 files carry the post-rename name, outside the pinned mapping)
    assert(rows2.count(r => r.getString(1) != null && r.getString(1).nonEmpty)
      >= src.count() + 1)
  }

  test("cherry-pick publishes ONE staged append; non-appends refuse") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("cherry")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"r_regionkey" < 2)) // main: 2 rows
    t.appendToBranch(spark, src.filter($"r_regionkey" === 2), "audit") // staged 1
    val picked = t.metadata.refs("audit").snapshotId
    t.appendToBranch(spark, src.filter($"r_regionkey" > 2), "audit") // staged 2
    // pick only the FIRST staged append: main gains its rows, the second
    // stays branch-only
    t.cherryPick(spark, picked)
    assert(t.scan(spark).count() === 3)
    assert(t.scanRef(spark, "audit").count() === 5)
    assert(t.metadata.currentSnapshot.get.summary
      .get("graft.cherry-picked-snapshot-id") === Some(picked.toString))
    // a replace-style snapshot refuses (its meaning depends on its base)
    t.overwrite(spark, src)
    val ow = t.metadata.currentSnapshotId.get
    intercept[IllegalArgumentException] { t.cherryPick(spark, ow) }
    // and so does a row-delta carrying delete files
    t.equalityDelete(spark, src.limit(1).select($"r_regionkey"), Seq("r_regionkey"))
    val del = t.metadata.currentSnapshotId.get
    intercept[IllegalArgumentException] { t.cherryPick(spark, del) }
  }

  test("all_files / all_manifests / all_entries span every snapshot") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val wh = tmpLocation("allmeta")
    spark.conf.set("spark.sql.catalog.gall", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gall.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gall.db")
    spark.sql("CREATE TABLE gall.db.t (r_regionkey INT, r_name STRING)")
    src.createOrReplaceTempView("gall_src")
    spark.sql("INSERT INTO gall.db.t SELECT * FROM gall_src WHERE r_regionkey < 2")
    spark.sql("INSERT OVERWRITE gall.db.t SELECT * FROM gall_src")
    // current view: 5 rows; all_files keeps the overwritten 2 visible too
    assert(spark.sql("SELECT CAST(SUM(record_count) AS BIGINT) FROM gall.db.t.files")
      .head.getLong(0) === 5L)
    assert(spark.sql("SELECT CAST(SUM(record_count) AS BIGINT) FROM gall.db.t.all_files")
      .head.getLong(0) === 7L)
    assert(spark.sql("SELECT CAST(SUM(record_count) AS BIGINT) FROM gall.db.t.all_entries")
      .head.getLong(0) === 7L)
    // all_manifests tags rows with their referencing snapshot
    val am = spark.sql(
      "SELECT DISTINCT reference_snapshot_id FROM gall.db.t.all_manifests").count()
    assert(am === 2)
    assert(spark.sql("SELECT * FROM gall.db.t.manifests").count() === 1)
    // cherrypick_snapshot procedure: re-publish the first append's files
    // onto the current head (2 extra rows)
    val firstSnap = spark.sql(
      "SELECT snapshot_id FROM gall.db.t.snapshots ORDER BY sequence_number")
      .head.getLong(0)
    spark.sql(s"CALL gall.system.cherrypick_snapshot('db.t', ${firstSnap}L)")
    assert(spark.sql("SELECT count(*) FROM gall.db.t").head.getLong(0) === 7L)
  }

  test("VERSION AS OF accepts branch and tag names in SQL") {
    val wh = java.nio.file.Files.createTempDirectory("graft-refsql").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.grefs", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grefs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grefs.db")
    spark.sql("CREATE TABLE grefs.db.t (id BIGINT)")
    spark.sql("INSERT INTO grefs.db.t VALUES (1), (2)")
    val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
    t.createTag("v1", t.metadata.currentSnapshotId.get)
    spark.sql("INSERT INTO grefs.db.t VALUES (3)")
    t.refresh()
    t.appendToBranch(spark, Seq(4L).toDF("id"), "dev")
    assert(spark.sql("SELECT count(*) FROM grefs.db.t VERSION AS OF 'v1'")
      .head.getLong(0) === 2)
    assert(spark.sql("SELECT count(*) FROM grefs.db.t VERSION AS OF 'dev'")
      .head.getLong(0) === 4)
    assert(spark.sql("SELECT count(*) FROM grefs.db.t").head.getLong(0) === 3)
  }

  test("zorder on a DATE column works (unix_date scaling)") {
    val src = spark.range(100).toDF("id")
      .withColumn("d", expr("date_add(DATE'2024-01-01', CAST(id AS INT))"))
    val loc = tmpLocation("zdate")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.rewriteZOrder(spark, Seq("id", "d"), targetFileSizeBytes = 1024)
    assert(t.scan(spark).count() === 100)
  }

  test("write.distribution-mode: hash clusters, none fans out, range orders") {
    val src = spark.range(0, 3000)
      .selectExpr("id AS k", "cast(id % 3 AS int) AS b3")
      .repartition(8) // many input tasks, so `none` visibly fans out
    def build(mode: String): GraftTable = {
      val schema = SchemaConvert.fromSparkSchema(src.schema)
      val t = StorageCatalog.createOrReplaceTable(
        conf, tmpLocation(s"dist-$mode"), schema,
        IcePartitionSpec(0, List(IcePartitionField(
          schema.findField("b3").get.id, 1000, "identity", "b3"))),
        properties = Map("write.distribution-mode" -> mode))
      t.append(spark, src)
      t
    }
    def dataFiles(t: GraftTable) =
      t.planFiles(t.metadata.currentSnapshot.get).filter(_.file.content == DataContent.Data)
    // hash: one shuffle clusters each partition value -> one file each
    val hashFiles = dataFiles(build("hash"))
    assert(hashFiles.size === 3)
    // none: zero shuffle -> each of the 8 input tasks fans out locally
    val noneT = build("none")
    val noneFiles = dataFiles(noneT)
    assert(noneFiles.size > 3)
    assert(noneT.scan(spark).count() === 3000)
    // range: clustered too (3 values -> 3 range buckets minimum), rows intact
    val rangeT = build("range")
    assert(rangeT.scan(spark).count() === 3000)
    assert(dataFiles(rangeT).map(_.file.partition).distinct.size === 3)
    // the DSv2 write path honors the mode too: range asks Spark for an
    // ORDERED distribution and the insert still lands every row
    val wh = tmpLocation("dist-sql-wh")
    spark.conf.set("spark.sql.catalog.distcat", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.distcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS distcat.db")
      spark.sql(
        """CREATE TABLE distcat.db.t (k BIGINT, b3 INT) PARTITIONED BY (b3)
          |TBLPROPERTIES ('write.distribution-mode' = 'range')""".stripMargin)
      spark.sql("INSERT INTO distcat.db.t SELECT id, cast(id % 3 AS int) FROM range(0, 3000)")
      assert(spark.sql("SELECT count(*) FROM distcat.db.t").head.getLong(0) === 3000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS distcat.db.t")
      spark.conf.unset("spark.sql.catalog.distcat")
      spark.conf.unset("spark.sql.catalog.distcat.warehouse")
    }
    // bad mode refuses (the mode is consulted on partitioned writes)
    val badSchema = SchemaConvert.fromSparkSchema(src.schema)
    val bad = StorageCatalog.createOrReplaceTable(
      conf, tmpLocation("dist-bad"), badSchema,
      IcePartitionSpec(0, List(IcePartitionField(
        badSchema.findField("b3").get.id, 1000, "identity", "b3"))),
      properties = Map("write.distribution-mode" -> "zigzag"))
    intercept[RuntimeException] { bad.append(spark, src) }
  }

  test("manifest parse cache: repeated planning hits memory, not the FS") {
    val src = spark.range(0, 500).toDF("id")
    val loc = tmpLocation("mcache")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    ManifestIO.invalidateCache()
    val snap = t.metadata.currentSnapshot.get
    val first = t.planFiles(snap)
    val missesAfterFirst = Metrics.get(Metrics.ManifestCacheMisses)
    val hitsBefore = Metrics.get(Metrics.ManifestCacheHits)
    val second = t.planFiles(snap)
    // identical plan, zero new parses — manifests are immutable
    assert(second.map(_.file.filePath) === first.map(_.file.filePath))
    assert(Metrics.get(Metrics.ManifestCacheMisses) === missesAfterFirst)
    assert(Metrics.get(Metrics.ManifestCacheHits) > hitsBefore)
  }

  test("convert_equality_deletes: eq files become positional, scan unchanged, later appends unaffected") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("eqconvert")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src.filter($"o_orderkey" % 2 === 0))
    t.append(spark, src.filter($"o_orderkey" % 2 === 1))
    t.equalityDelete(spark,
      src.filter($"o_orderstatus" === "P").select($"o_orderkey"), Seq("o_orderkey"))
    t.equalityDelete(spark,
      src.filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey"),
      Seq("o_orderkey"))
    val exp = t.scan(spark).collect().toSet
    def files(content: Int) = t.metadata.currentSnapshot.toList
      .flatMap(t.planFiles(_)).filter(_.file.content == content)
    assert(files(DataContent.EqualityDeletes).size === 2)

    t.convertEqualityDeletes(spark)
    assert(files(DataContent.EqualityDeletes).isEmpty)
    assert(files(DataContent.PositionDeletes).nonEmpty)
    assert(t.scan(spark).collect().toSet === exp)

    // rows appended AFTER conversion with previously-deleted keys stay
    // visible: positional deletes pin exact (file,pos), never keys
    val resurrect = src.filter($"o_orderstatus" === "P").limit(5)
    t.append(spark, resurrect)
    assert(t.scan(spark).filter($"o_orderstatus" === "P").count() === 5)

    // DV-mode table converts into vectors through the SQL procedure
    val wh = tmpLocation("eqconvert-wh")
    val loc2 = s"$wh/db/t"
    val t2 = StorageCatalog.createTable(
      conf, loc2, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil),
      properties = Map(GraftTable.DvEnabledProp -> "true"))
    t2.append(spark, src)
    t2.equalityDelete(spark,
      src.filter($"o_orderstatus" === "P").select($"o_orderkey"), Seq("o_orderkey"))
    val exp2 = t2.scan(spark).count()
    spark.conf.set("spark.sql.catalog.eqcv", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.eqcv.warehouse", wh)
    try {
      val res = spark.sql(
        "CALL eqcv.system.convert_equality_deletes(table => 'db.t')").collect()(0)
      assert(res.getLong(0) === 1) // one eq file existed
      val t2b = StorageCatalog.loadTable(conf, loc2)
      val after = t2b.metadata.currentSnapshot.toList.flatMap(t2b.planFiles(_))
      assert(!after.exists(_.file.content == DataContent.EqualityDeletes))
      assert(after.filter(_.file.content == DataContent.PositionDeletes)
        .forall(_.file.isDeletionVector))
      assert(t2b.scan(spark).count() === exp2)
    } finally {
      spark.conf.unset("spark.sql.catalog.eqcv")
      spark.conf.unset("spark.sql.catalog.eqcv.warehouse")
    }
  }

  test("convert_equality_deletes on a partitioned table: deletes stay partition-scoped") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("eqconvert-part")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, schema,
      IcePartitionSpec(0, List(IcePartitionField(
        schema.findField("o_orderstatus").get.id, 1000, "identity", "o_orderstatus"))))
    t.append(spark, src)
    t.equalityDelete(spark,
      src.filter($"o_orderkey" % 7 === 0).select($"o_orderkey"), Seq("o_orderkey"))
    val exp = t.scan(spark).collect().toSet
    t.convertEqualityDeletes(spark)
    val after = t.metadata.currentSnapshot.toList.flatMap(t.planFiles(_))
    assert(!after.exists(_.file.content == DataContent.EqualityDeletes))
    assert(t.scan(spark).collect().toSet === exp)
    // positional deletes landed partition-scoped: a filter on one
    // partition joins only that partition's delete files
    val oneStatus = t.deleteFilesForScan(Some($"o_orderstatus" === "F"))
    val allDeletes = after.filter(_.file.content == DataContent.PositionDeletes)
    assert(allDeletes.size > 1, "expected per-partition delete files")
    assert(oneStatus.size < allDeletes.size,
      s"partition filter joined all ${allDeletes.size} delete files")
  }

  test("nested schema evolution: add/rename/widen/drop inside a struct, old files serve null") {
    val wh = tmpLocation("nested-wh")
    spark.conf.set("spark.sql.catalog.nst", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nst.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS nst.db")
      spark.sql(
        "CREATE TABLE nst.db.t (id BIGINT, addr STRUCT<city: STRING, n: INT>)")
      spark.sql("INSERT INTO nst.db.t VALUES (1, named_struct('city', 'oslo', 'n', 7))")
      // nested ADD: old rows read null for the new field, new rows carry it
      spark.sql("ALTER TABLE nst.db.t ADD COLUMNS (addr.zip STRING)")
      spark.sql(
        "INSERT INTO nst.db.t VALUES (2, named_struct('city', 'bergen', 'n', 9, 'zip', '5003'))")
      val afterAdd = spark.sql("SELECT id, addr.zip FROM nst.db.t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(afterAdd === Seq((1L, null), (2L, "5003")))
      // nested RENAME keeps the field id: old files serve under the new name
      spark.sql("ALTER TABLE nst.db.t RENAME COLUMN addr.city TO town")
      val towns = spark.sql("SELECT addr.town FROM nst.db.t ORDER BY id")
        .collect().map(_.getString(0)).toSeq
      assert(towns === Seq("oslo", "bergen"))
      // nested type WIDENING int -> bigint; old values still served
      spark.sql("ALTER TABLE nst.db.t ALTER COLUMN addr.n TYPE BIGINT")
      val ns = spark.sql("SELECT addr.n FROM nst.db.t ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(ns === Seq(7L, 9L))
      // nested DROP removes just the field
      spark.sql("ALTER TABLE nst.db.t DROP COLUMN addr.zip")
      val cols = spark.sql("SELECT addr.* FROM nst.db.t").schema.fieldNames.toSeq
      assert(cols === Seq("town", "n"))
      // ids stayed collision-free: a fresh struct-typed top-level add
      // allocates past every live id (the latent id-collision case)
      spark.sql("ALTER TABLE nst.db.t ADD COLUMNS (meta STRUCT<a: INT, b: STRING>)")
      val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
      def allIds(fs: List[IceField]): List[Int] = fs.flatMap { f =>
        f.id :: (f.fieldType match {
          case IceStruct(inner) => allIds(inner)
          case _ => Nil
        })
      }
      val ids = allIds(t.metadata.currentSchema.fields)
      assert(ids.distinct.size === ids.size, s"duplicate field ids: $ids")
      spark.sql(
        "INSERT INTO nst.db.t VALUES (3, named_struct('town', 'tromso', 'n', CAST(1 AS BIGINT)), named_struct('a', 5, 'b', 'x'))")
      assert(spark.sql("SELECT meta.a FROM nst.db.t WHERE id = 3")
        .collect().head.getInt(0) === 5)
    } finally {
      spark.conf.unset("spark.sql.catalog.nst")
      spark.conf.unset("spark.sql.catalog.nst.warehouse")
    }
  }

  test("ALTER TABLE CLUSTER BY declares the write sort order") {
    val wh = tmpLocation("clby-wh")
    spark.conf.set("spark.sql.catalog.clb", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.clb.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS clb.db")
      spark.sql("CREATE TABLE clb.db.t (a BIGINT, b STRING)")
      spark.sql("ALTER TABLE clb.db.t CLUSTER BY (a)")
      val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
      val order = t.metadata.sortOrders.find(_.orderId == t.metadata.defaultSortOrderId).get
      assert(order.fields.map(f => (f.sourceId, f.direction)) ===
        List((t.metadata.currentSchema.findField("a").get.id, "asc")))
      // writes sort by it and stamp the order id
      t.append(spark, spark.range(100).select(
        (lit(100) - $"id").as("a"), lit("x").as("b")))
      val files = t.metadata.currentSnapshot.toList.flatMap(t.planFiles(_))
      assert(files.forall(_.file.sortOrderId.contains(order.orderId)))
    } finally {
      spark.conf.unset("spark.sql.catalog.clb")
      spark.conf.unset("spark.sql.catalog.clb.warehouse")
    }
  }

  test("ALTER COLUMN position, comment, and write-default via SQL") {
    val wh = tmpLocation("altcol-wh")
    spark.conf.set("spark.sql.catalog.alt", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.alt.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS alt.db")
      spark.sql("CREATE TABLE alt.db.t (a INT, b STRING, c DOUBLE)")
      spark.sql("INSERT INTO alt.db.t VALUES (1, 'x', 0.5)")
      // reorder: c FIRST, then a AFTER b — SELECT * follows the new order
      spark.sql("ALTER TABLE alt.db.t ALTER COLUMN c FIRST")
      spark.sql("ALTER TABLE alt.db.t ALTER COLUMN a AFTER b")
      assert(spark.table("alt.db.t").schema.fieldNames.toSeq === Seq("c", "b", "a"))
      assert(spark.sql("SELECT * FROM alt.db.t").collect().head.toSeq
        === Seq(0.5, "x", 1))
      // comment round-trips through metadata JSON
      spark.sql("ALTER TABLE alt.db.t ALTER COLUMN b COMMENT 'the label'")
      val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
      assert(t.metadata.currentSchema.findField("b").get.doc === Some("the label"))
      // SET DEFAULT fills writes that omit the column via the API path
      spark.sql("ALTER TABLE alt.db.t ALTER COLUMN b SET DEFAULT 'filler'")
      val t2 = StorageCatalog.loadTable(conf, s"$wh/db/t")
      assert(t2.metadata.currentSchema.findField("b").get.writeDefault === Some("filler"))
      t2.append(spark, Seq((9.9, 2)).toDF("c", "a"))
      assert(spark.sql("SELECT b FROM alt.db.t WHERE a = 2")
        .collect().head.getString(0) === "filler")
      // DROP DEFAULT clears it
      spark.sql("ALTER TABLE alt.db.t ALTER COLUMN b DROP DEFAULT")
      val t3 = StorageCatalog.loadTable(conf, s"$wh/db/t")
      assert(t3.metadata.currentSchema.findField("b").get.writeDefault === None)
    } finally {
      spark.conf.unset("spark.sql.catalog.alt")
      spark.conf.unset("spark.sql.catalog.alt.warehouse")
    }
  }

  test("identifier fields: SQL DDL, JSON round-trip, keyless upsert, drop guard") {
    val wh = tmpLocation("idf-wh")
    spark.conf.set("spark.sql.catalog.idf", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.idf.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS idf.db")
      spark.sql("CREATE TABLE idf.db.t (k BIGINT, v STRING, score DOUBLE)")
      spark.sql("INSERT INTO idf.db.t VALUES (1, 'a', 0.5), (2, 'b', 0.7)")
      spark.sql("ALTER TABLE idf.db.t SET IDENTIFIER FIELDS k")
      // persisted + reloaded through the JSON round-trip
      val t = StorageCatalog.loadTable(conf, s"$wh/db/t")
      assert(t.metadata.currentSchema.identifierFieldNames === List("k"))
      // keyless upsert defaults to the identifier fields
      t.upsert(spark, Seq((2L, "B", 0.9), (3L, "c", 0.1)).toDF("k", "v", "score"))
      val rows = spark.sql("SELECT k, v FROM idf.db.t ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows === Seq((1L, "a"), (2L, "B"), (3L, "c")))
      // schema evolution carries the declaration; dropping the key refuses
      t.renameColumn("v", "val")
      assert(t.metadata.currentSchema.identifierFieldNames === List("k"))
      intercept[RuntimeException] { t.dropColumn("k") }
      // float keys refuse (NaN breaks equality); DROP clears
      intercept[RuntimeException] { t.setIdentifierFields(Seq("score")) }
      spark.sql("ALTER TABLE idf.db.t DROP IDENTIFIER FIELDS")
      val t2 = StorageCatalog.loadTable(conf, s"$wh/db/t")
      assert(t2.metadata.currentSchema.identifierFieldIds.isEmpty)
      intercept[IllegalArgumentException] {
        t2.upsert(spark, Seq((4L, "d", 0.2)).toDF("k", "val", "score"))
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.idf")
      spark.conf.unset("spark.sql.catalog.idf.warehouse")
    }
  }

  test("metadata-log trimming: previous-versions-max caps the log, delete-after-commit reclaims files") {
    val src = spark.range(0, 10).toDF("id")
    val loc = tmpLocation("mdlog")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil),
      properties = Map(GraftTable.PreviousVersionsMaxProp -> "3"))
    (0 until 8).foreach(_ => t.append(spark, src))
    // log capped at 3, newest entries survive (the immediately-previous version is last)
    assert(t.metadata.metadataLog.size === 3)
    assert(t.metadata.metadataLog.last.ref.endsWith(s"v${t.version - 1}.metadata.json"))
    // without delete-after-commit the trimmed FILES remain on disk
    val mdir = new java.io.File(s"$loc/metadata")
    def mdFiles() = mdir.listFiles().map(_.getName).filter(_.endsWith(".metadata.json")).toSet
    assert(mdFiles().size > 4)

    // opt into file deletion: subsequent commits reclaim what THEY trim
    // (entries dropped before the opt-in stay on disk as orphans)
    t.setProperties(Map(GraftTable.DeleteAfterCommitProp -> "true"))
    val beforeEnabled = mdFiles()
    val logAtEnable = t.metadata.metadataLog.map(_.ref.split('/').last).toSet
    (0 until 4).foreach(_ => t.append(spark, src))
    assert(t.metadata.metadataLog.size === 3)
    val names = mdFiles()
    // every file named by the surviving log entries is still there...
    t.metadata.metadataLog.foreach { e =>
      assert(names.contains(e.ref.split('/').last), s"trimmed a live log entry: ${e.ref}")
    }
    // ...and the entries the enabled commits trimmed (in the log at enable
    // time, not in it now) had their files deleted
    val reclaimed = logAtEnable -- t.metadata.metadataLog.map(_.ref.split('/').last).toSet
    assert(reclaimed.nonEmpty)
    reclaimed.foreach(f => assert(!names.contains(f), s"trimmed file $f not deleted"))
    assert(beforeEnabled.exists(f => !names.contains(f)))
    // table still loads and reads fine after trimming
    val re = StorageCatalog.loadTable(conf, loc)
    assert(re.scan(spark).count() === 120)
  }
}
