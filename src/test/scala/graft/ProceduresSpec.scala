package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** SQL stored procedures: CALL gproc.system.<name>(...) end-to-end. */
class ProceduresSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-proc-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gproc", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gproc.warehouse", wh)
    s
  }
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def freshSqlTable(name: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.db")
    spark.sql(s"DROP TABLE IF EXISTS gproc.db.$name")
    spark.sql(s"CREATE TABLE gproc.db.$name (o_orderkey BIGINT, o_orderstatus STRING)")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus")
      .createOrReplaceTempView(s"${name}_src")
  }

  test("rollback_to_timestamp picks the latest snapshot at or before ts") {
    freshSqlTable("procs_rbts")
    spark.sql("INSERT INTO gproc.db.procs_rbts SELECT * FROM procs_rbts_src WHERE o_orderkey % 2 = 0")
    val first = spark.sql(
      "SELECT snapshot_id, committed_at FROM gproc.db.procs_rbts.snapshots ORDER BY committed_at")
      .collect().head
    val (snap1, ts1) = (first.getLong(0), first.getTimestamp(1).getTime)
    Thread.sleep(5)
    spark.sql("INSERT INTO gproc.db.procs_rbts SELECT * FROM procs_rbts_src WHERE o_orderkey % 2 = 1")
    val res = spark.sql(
      s"CALL gproc.system.rollback_to_timestamp(table => 'db.procs_rbts', timestamp_ms => ${ts1}L)")
      .collect().head
    assert(res.getLong(1) === snap1)
    val evens = spark.table("gproc.db.procs_rbts").count()
    assert(evens ===
      spark.sql("SELECT count(*) FROM procs_rbts_src WHERE o_orderkey % 2 = 0").head.getLong(0))
    // before every snapshot -> refuses
    val err = intercept[Exception] {
      spark.sql("CALL gproc.system.rollback_to_timestamp(table => 'db.procs_rbts', timestamp_ms => 1L)")
    }
    assert(err.getMessage.contains("no snapshot"))
  }

  test("rollback_to_snapshot moves HEAD; previous id reported") {
    freshSqlTable("procs_rb")
    spark.sql("INSERT INTO gproc.db.procs_rb SELECT * FROM procs_rb_src WHERE o_orderkey % 2 = 0")
    val snap1 = spark.sql(
      "SELECT snapshot_id FROM gproc.db.procs_rb.snapshots ORDER BY committed_at")
      .collect().head.getLong(0)
    spark.sql("INSERT INTO gproc.db.procs_rb SELECT * FROM procs_rb_src WHERE o_orderkey % 2 = 1")
    val afterBoth = spark.table("gproc.db.procs_rb").count()
    val res = spark.sql(
      s"CALL gproc.system.rollback_to_snapshot(table => 'db.procs_rb', snapshot_id => ${snap1}L)")
      .collect().head
    assert(res.getLong(1) === snap1)
    val evens = spark.table("gproc.db.procs_rb").count()
    assert(evens < afterBoth && evens > 0)
    assert(spark.table("gproc.db.procs_rb")
      .filter($"o_orderkey" % 2 === 1).count() === 0)
  }

  test("rewrite_data_files compacts; content unchanged") {
    freshSqlTable("procs_cmp")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO gproc.db.procs_cmp SELECT * FROM procs_cmp_src WHERE o_orderkey % 3 = $i")
    }
    val res = spark.sql(
      "CALL gproc.system.rewrite_data_files('db.procs_cmp', 1073741824L)").collect().head
    assert(res.getLong(0) >= 3 && res.getLong(1) < res.getLong(0))
    val got = spark.table("gproc.db.procs_cmp").orderBy("o_orderkey").collect()
    val exp = spark.table("procs_cmp_src").orderBy("o_orderkey").collect()
    assert(got.toSeq === exp.toSeq)
  }

  test("rewrite_zorder re-clusters; content unchanged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.db")
    spark.sql("DROP TABLE IF EXISTS gproc.db.procs_zo")
    spark.sql("CREATE TABLE gproc.db.procs_zo (o_orderkey BIGINT, o_custkey BIGINT)")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey").createOrReplaceTempView("procs_zo_src")
    spark.sql("INSERT INTO gproc.db.procs_zo SELECT * FROM procs_zo_src")
    spark.sql(
      "CALL gproc.system.rewrite_zorder('db.procs_zo', 'o_orderkey,o_custkey', 1048576L)")
    val got = spark.table("gproc.db.procs_zo").orderBy("o_orderkey").collect()
    val exp = spark.table("procs_zo_src").orderBy("o_orderkey").collect()
    assert(got.toSeq === exp.toSeq)
  }

  test("rewrite_hilbert re-clusters; content unchanged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.db")
    spark.sql("DROP TABLE IF EXISTS gproc.db.procs_hi")
    spark.sql("CREATE TABLE gproc.db.procs_hi (o_orderkey BIGINT, o_custkey BIGINT)")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey").createOrReplaceTempView("procs_hi_src")
    spark.sql("INSERT INTO gproc.db.procs_hi SELECT * FROM procs_hi_src")
    spark.sql(
      "CALL gproc.system.rewrite_hilbert('db.procs_hi', 'o_orderkey,o_custkey', 1048576L)")
    val got = spark.table("gproc.db.procs_hi").orderBy("o_orderkey").collect()
    val exp = spark.table("procs_hi_src").orderBy("o_orderkey").collect()
    assert(got.toSeq === exp.toSeq)
  }

  test("auto_maintain: one call compacts, expires and reclaims; rows intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.db")
    spark.sql("DROP TABLE IF EXISTS gproc.db.procs_am")
    spark.sql(
      "CREATE TABLE gproc.db.procs_am (o_orderkey BIGINT, o_totalprice DOUBLE)")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
      .createOrReplaceTempView("procs_am_src")
    // messy history: 3 small-file appends + a MoR delete
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO gproc.db.procs_am SELECT * FROM procs_am_src WHERE o_orderkey % 3 = $i"))
    spark.sql("DELETE FROM gproc.db.procs_am WHERE o_orderkey % 10 = 0")
    val expected = spark.sql(
      "SELECT * FROM procs_am_src WHERE o_orderkey % 10 <> 0")
      .orderBy("o_orderkey").collect()
    val r = spark.sql(
      s"""CALL gproc.system.auto_maintain('db.procs_am',
         |${64L * 1024 * 1024}L, ${System.currentTimeMillis() + 60000}L, 1L)"""
        .stripMargin).collect().head
    assert(r.getLong(1) < r.getLong(0),
      s"small files must bin-pack (${r.getLong(0)} -> ${r.getLong(1)})")
    assert(r.getLong(3) === 0L, "compaction absorbs the position deletes")
    assert(r.getLong(7) <= 2L, "history expires down to the retained tail")
    assert(r.getLong(8) >= 1L, "expired snapshots' files reclaim as orphans")
    val got = spark.table("gproc.db.procs_am").orderBy("o_orderkey").collect()
    assert(got.toSeq === expected.toSeq, "maintenance must not change rows")
  }

  test("expire_snapshots + remove_orphan_files reclaim history") {
    freshSqlTable("procs_gc")
    spark.sql("INSERT INTO gproc.db.procs_gc SELECT * FROM procs_gc_src WHERE o_orderkey % 2 = 0")
    spark.sql("INSERT INTO gproc.db.procs_gc SELECT * FROM procs_gc_src WHERE o_orderkey % 2 = 1")
    spark.sql("CALL gproc.system.rewrite_data_files('db.procs_gc', 1073741824L)")
    val expired = spark.sql(
      s"CALL gproc.system.expire_snapshots('db.procs_gc', ${Long.MaxValue}L)").collect().head
    assert(expired.getLong(0) >= 2)
    assert(expired.getLong(1) >= 1)
    val removed = spark.sql(
      s"CALL gproc.system.remove_orphan_files('db.procs_gc', ${Long.MaxValue}L)").collect().head
    assert(removed.getLong(0) >= 2) // the two pre-compaction data files
    val exp = spark.table("procs_gc_src").orderBy("o_orderkey").collect()
    assert(spark.table("gproc.db.procs_gc").orderBy("o_orderkey").collect().toSeq === exp.toSeq)
  }

  test("create_branch + fast_forward via CALL; refs view reflects both") {
    freshSqlTable("procs_ff")
    spark.sql("INSERT INTO gproc.db.procs_ff SELECT * FROM procs_ff_src WHERE o_orderkey % 2 = 0")
    val head = spark.sql(
      "SELECT snapshot_id FROM gproc.db.procs_ff.snapshots ORDER BY committed_at DESC")
      .collect().head.getLong(0)
    spark.sql(s"CALL gproc.system.create_branch('db.procs_ff', 'audit', ${head}L)")
    // write onto the audit branch via the table API (WAP), then fast-forward main
    val wh = spark.conf.get("spark.sql.catalog.gproc.warehouse")
    val tbl = StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/procs_ff")
    tbl.appendToBranch(spark,
      spark.table("procs_ff_src").filter($"o_orderkey" % 2 === 1), "audit")
    val res = spark.sql(
      "CALL gproc.system.fast_forward('db.procs_ff', 'main', 'audit')").collect().head
    assert(res.getString(0) === "main")
    val exp = spark.table("procs_ff_src").orderBy("o_orderkey").collect()
    assert(spark.table("gproc.db.procs_ff").orderBy("o_orderkey").collect().toSeq === exp.toSeq)
    val refs = spark.sql("SELECT name FROM gproc.db.procs_ff.refs").collect().map(_.getString(0))
    assert(refs.contains("audit") && refs.contains("main"))
  }

  test("procedures are listed and bad names fail clearly") {
    val err = intercept[Exception] {
      spark.sql("CALL gproc.system.no_such_proc('db.x')").collect()
    }
    assert(err.getMessage.contains("no such procedure") ||
      Option(err.getCause).exists(_.getMessage.contains("no such procedure")))
  }

  test("snapshot forks a zero-copy table; fork and source evolve independently") {
    freshSqlTable("procs_snap")
    spark.sql("INSERT INTO gproc.db.procs_snap SELECT * FROM procs_snap_src WHERE o_orderkey % 2 = 0")
    // MoR state on the source: carried position deletes must stay visible
    spark.sql("DELETE FROM gproc.db.procs_snap WHERE o_orderkey % 10 = 0")
    spark.sql("INSERT INTO gproc.db.procs_snap SELECT * FROM procs_snap_src WHERE o_orderkey % 2 = 1")
    val srcRows = spark.table("gproc.db.procs_snap").orderBy("o_orderkey").collect().toSeq
    spark.sql("DROP TABLE IF EXISTS gproc.db.procs_snap_fork")
    val res = spark.sql(
      "CALL gproc.system.snapshot('db.procs_snap', 'db.procs_snap_fork')").collect().head
    assert(res.getLong(1) > 0, "no data files carried")
    assert(spark.table("gproc.db.procs_snap_fork").orderBy("o_orderkey")
      .collect().toSeq === srcRows)
    // zero-copy: the fork's directory holds metadata only, no parquet
    val wh = spark.conf.get("spark.sql.catalog.gproc.warehouse")
    def parquetCount(dir: String): Long = {
      val p = new java.io.File(dir)
      if (!p.exists()) 0L
      else java.nio.file.Files.walk(p.toPath)
        .filter(f => f.toString.endsWith(".parquet")).count()
    }
    assert(parquetCount(s"$wh/db/procs_snap_fork") === 0L)
    // a DELETE on the fork must out-sequence the CARRIED files (the fork
    // keeps the source's lastSequenceNumber) and must not touch the source
    spark.sql("DELETE FROM gproc.db.procs_snap_fork WHERE o_orderkey % 2 = 1")
    assert(spark.table("gproc.db.procs_snap_fork")
      .filter($"o_orderkey" % 2 === 1).count() === 0)
    assert(spark.table("gproc.db.procs_snap").orderBy("o_orderkey")
      .collect().toSeq === srcRows)
    // and writes to the source stay invisible to the fork
    spark.sql("INSERT INTO gproc.db.procs_snap SELECT * FROM procs_snap_src LIMIT 7")
    assert(spark.table("gproc.db.procs_snap_fork")
      .filter($"o_orderkey" % 2 === 1).count() === 0)
  }

  test("register_table: REST mode attaches an existing metadata file; path mode refuses") {
    // source table lives in the PATH catalog's warehouse
    freshSqlTable("procs_reg")
    spark.sql("INSERT INTO gproc.db.procs_reg SELECT * FROM procs_reg_src WHERE o_orderkey % 3 = 0")
    spark.sql("DELETE FROM gproc.db.procs_reg WHERE o_orderkey % 9 = 0")
    val exp = spark.table("gproc.db.procs_reg").orderBy("o_orderkey").collect().toSeq
    val wh = spark.conf.get("spark.sql.catalog.gproc.warehouse")
    val metaDir = new java.io.File(s"$wh/db/procs_reg/metadata")
    val latest = metaDir.listFiles().map(_.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
      .maxBy(n => n.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    // path mode has nowhere to register INTO — clear refusal
    val err = intercept[Exception] {
      spark.sql(
        s"CALL gproc.system.register_table('db.procs_reg2', '$metaDir/$latest')").collect()
    }
    assert((err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse(""))
      .contains("REST"))
    // REST mode: register serves the file as v1, reads see the MoR state,
    // and later commits CAS through the catalog
    val server = new tables.RestCatalog.Server()
    val uri = server.start()
    spark.conf.set("spark.sql.catalog.greg", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.greg.warehouse",
      java.nio.file.Files.createTempDirectory("graft-reg-wh").toString)
    spark.conf.set("spark.sql.catalog.greg.uri", uri)
    try {
      spark.sql("CREATE NAMESPACE greg.db")
      val res = spark.sql(
        s"CALL greg.system.register_table('db.reg', '$metaDir/$latest')").collect().head
      assert(res.getLong(0) > 0)
      assert(spark.table("greg.db.reg").orderBy("o_orderkey").collect().toSeq === exp)
      spark.sql("INSERT INTO greg.db.reg SELECT * FROM procs_reg_src WHERE o_orderkey % 3 = 1")
      assert(spark.table("greg.db.reg").count() ===
        exp.size + spark.table("procs_reg_src").filter($"o_orderkey" % 3 === 1).count())
      // double-register is a clean conflict, not a corruption
      val dup = intercept[Exception] {
        spark.sql(s"CALL greg.system.register_table('db.reg', '$metaDir/$latest')").collect()
      }
      assert((dup.getMessage + Option(dup.getCause).map(_.getMessage).getOrElse(""))
        .toLowerCase.contains("exists"))
    } finally {
      server.stop()
      Seq("", ".warehouse", ".uri").foreach(sfx =>
        spark.conf.unset(s"spark.sql.catalog.greg$sfx"))
    }
  }

  test("set_current_snapshot jumps HEAD anywhere; create_changelog_view registers the diff") {
    freshSqlTable("procs_cv")
    spark.sql("INSERT INTO gproc.db.procs_cv SELECT * FROM procs_cv_src WHERE o_orderkey % 2 = 0")
    val snap1 = spark.sql("SELECT snapshot_id FROM gproc.db.procs_cv.snapshots " +
      "ORDER BY committed_at").collect().head.getLong(0)
    spark.sql("INSERT INTO gproc.db.procs_cv SELECT * FROM procs_cv_src WHERE o_orderkey % 2 = 1")
    spark.sql("DELETE FROM gproc.db.procs_cv WHERE o_orderkey % 10 = 0")

    // default view name <table>_changes; default range = after the oldest snapshot
    val v = spark.sql("CALL gproc.system.create_changelog_view(table => 'db.procs_cv')")
      .collect().head.getString(0)
    assert(v === "procs_cv_changes")
    val byType = spark.sql(s"SELECT _change_type, count(*) FROM $v GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val odd = spark.sql("SELECT count(*) FROM procs_cv_src WHERE o_orderkey % 2 = 1")
      .collect().head.getLong(0)
    val del = spark.sql("SELECT count(*) FROM procs_cv_src WHERE o_orderkey % 10 = 0")
      .collect().head.getLong(0)
    assert(byType("insert") === odd)
    // deletes in range: %10==0 rows live in BOTH snapshots' files, but only
    // the baseline file set existed before the range — emitted deletes are
    // the even-keyed ones plus the odd inserts already counted? No: deletes
    // resolve per their own snapshot, so all %10 rows emit as deletes
    assert(byType("delete") === del)

    // explicit start: only the delete commit
    spark.sql(
      """CALL gproc.system.create_changelog_view(table => 'db.procs_cv',
        |  changelog_view => 'cv2',
        |  start_snapshot_id => __SNAP2__L)""".stripMargin.replace(
        "__SNAP2__", spark.sql(
          "SELECT snapshot_id FROM gproc.db.procs_cv.snapshots ORDER BY committed_at")
          .collect()(1).getLong(0).toString))
    assert(spark.sql("SELECT DISTINCT _change_type FROM cv2").collect()
      .map(_.getString(0)).toSeq === Seq("delete"))

    // set_current_snapshot: jump back, then forward again (non-ancestor ok)
    val head = spark.sql("SELECT count(*) FROM gproc.db.procs_cv").collect().head.getLong(0)
    val r = spark.sql(
      s"CALL gproc.system.set_current_snapshot(table => 'db.procs_cv', snapshot_id => ${snap1}L)")
      .collect().head
    assert(r.getLong(1) === snap1)
    val atSnap1 = spark.sql("SELECT count(*) FROM gproc.db.procs_cv").collect().head.getLong(0)
    assert(atSnap1 < head && atSnap1 > 0)
    spark.sql(
      s"CALL gproc.system.set_current_snapshot(table => 'db.procs_cv', snapshot_id => ${r.getLong(0)}L)")
    assert(spark.sql("SELECT count(*) FROM gproc.db.procs_cv")
      .collect().head.getLong(0) === head)
  }

  test("ancestors_of walks the lineage newest-first, from head or a given snapshot") {
    freshSqlTable("procs_anc")
    spark.sql("INSERT INTO gproc.db.procs_anc SELECT * FROM procs_anc_src WHERE o_orderkey % 2 = 0")
    spark.sql("INSERT INTO gproc.db.procs_anc SELECT * FROM procs_anc_src WHERE o_orderkey % 2 = 1")
    spark.sql("INSERT INTO gproc.db.procs_anc SELECT * FROM procs_anc_src LIMIT 1")
    val rows = spark.sql("CALL gproc.system.ancestors_of(table => 'db.procs_anc')").collect()
    assert(rows.length === 3)
    // newest first, sequence numbers strictly descending
    val seqs = rows.map(_.getLong(2)).toSeq
    assert(seqs === seqs.sorted.reverse && seqs.distinct === seqs)
    assert(rows.forall(_.getString(3) == "append"))
    // explicit snapshot_id starts the walk mid-chain
    val mid = rows(1).getLong(0)
    val fromMid = spark.sql(
      s"CALL gproc.system.ancestors_of(table => 'db.procs_anc', snapshot_id => ${mid}L)")
      .collect()
    assert(fromMid.length === 2 && fromMid.head.getLong(0) === mid)
  }
}
