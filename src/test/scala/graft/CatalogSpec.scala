package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end SQL through the DSv2 catalog: DDL, DML, time travel,
  * MoR visibility, schema evolution. */
class CatalogSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s
  }
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("CREATE / INSERT / SELECT round-trip via SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.regions")
    spark.sql("CREATE TABLE graft.db.regions (r_regionkey INT, r_name STRING)")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("region_src")
    spark.sql("INSERT INTO graft.db.regions SELECT * FROM region_src")
    val got = spark.sql("SELECT * FROM graft.db.regions ORDER BY r_regionkey")
    val exp = spark.read.parquet(s"$sfDir/region.parquet").orderBy("r_regionkey")
    assert(got.collect().toSeq === exp.collect().toSeq)
    assert(spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("regions"))
  }

  test("partitioned CREATE + filtered SELECT prunes and answers correctly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.lines")
    spark.sql(
      """CREATE TABLE graft.db.lines (
        |  l_orderkey BIGINT, l_quantity DOUBLE, l_shipdate TIMESTAMP)
        |PARTITIONED BY (months(l_shipdate))""".stripMargin)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_shipdate")
      .createOrReplaceTempView("line_src")
    spark.sql("INSERT INTO graft.db.lines SELECT * FROM line_src")
    val got = spark.sql(
      """SELECT COUNT(*) FROM graft.db.lines
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'"""
        .stripMargin).head().getLong(0)
    val exp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1997-04-01").count()
    assert(got === exp)
  }

  test("INSERT OVERWRITE replaces contents") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.ow")
    spark.sql("CREATE TABLE graft.db.ow (k INT, v STRING)")
    spark.sql("INSERT INTO graft.db.ow VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE graft.db.ow VALUES (3, 'c')")
    val rows = spark.sql("SELECT * FROM graft.db.ow").collect()
    assert(rows.length === 1 && rows.head.getInt(0) === 3)
  }

  test("static partition INSERT OVERWRITE replaces only that partition") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.sow")
    spark.sql("CREATE TABLE graft.db.sow (v STRING, p INT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.db.sow VALUES ('a', 1), ('b', 2), ('c', 2)")
    spark.sql("INSERT OVERWRITE graft.db.sow PARTITION (p = 2) SELECT 'z'")
    val rows = spark.sql("SELECT v, p FROM graft.db.sow ORDER BY v").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    // partition 1 untouched, partition 2 replaced by the single new row
    assert(rows === Seq(("a", 1), ("z", 2)))
  }

  test("dynamic partition overwrite replaces only partitions present in the data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.dow")
    spark.sql("CREATE TABLE graft.db.dow (v STRING, p INT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.db.dow VALUES ('a', 1), ('b', 2), ('c', 3)")
    // via SQL (native BatchWrite + OVERWRITE_DYNAMIC capability)
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("INSERT OVERWRITE graft.db.dow VALUES ('x', 2), ('y', 2)")
    finally before match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val rows = spark.sql("SELECT v, p FROM graft.db.dow ORDER BY v").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows === Seq(("a", 1), ("c", 3), ("x", 2), ("y", 2)).sortBy(_._1))
    // and via the table API
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/dow")
    t.overwriteDynamic(spark, Seq(("z", 3)).toDF("v", "p"))
    assert(spark.sql("SELECT v FROM graft.db.dow ORDER BY v").collect()
      .map(_.getString(0)).toSeq === Seq("a", "x", "y", "z"))
  }

  test("VERSION AS OF time travel via SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.tt")
    spark.sql("CREATE TABLE graft.db.tt (k INT)")
    spark.sql("INSERT INTO graft.db.tt VALUES (1), (2)")
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val snap1 = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/tt")
      .metadata.currentSnapshotId.get
    spark.sql("INSERT INTO graft.db.tt VALUES (3)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.tt").head().getLong(0) === 3)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.db.tt VERSION AS OF $snap1")
      .head().getLong(0) === 2)
  }

  test("SQL sees MoR deletes made through the table API") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mor")
    spark.sql("CREATE TABLE graft.db.mor (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.mor SELECT id AS k, CAST(id AS STRING) AS v FROM RANGE(100)")
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/mor")
    t.equalityDelete(spark, Seq(1L, 2L, 3L).toDF("k"), Seq("k"))
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.mor").head().getLong(0) === 97)
  }

  test("native MoR SQL scan: pos+eq deletes, filters, plan shape; jumbo deletes stay native") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mor2")
    spark.sql("CREATE TABLE graft.db.mor2 (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft.db.mor2 SELECT id AS k, CAST(id AS STRING) AS v FROM RANGE(1000)")
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/mor2")
    t.equalityDelete(spark, Seq(10L, 20L).toDF("k"), Seq("k"))
    val pos = t.scan(spark, keepFilePos = true).filter($"k" < 5)
      .select($"_file".as("file_path"), $"_pos".as("pos"))
    t.positionDelete(spark, pos)
    // 1000 - 5 (pos) - 2 (eq) = 993; filter also pushes through
    val q = spark.sql("SELECT * FROM graft.db.mor2 WHERE k < 100")
    assert(q.queryExecution.executedPlan.toString.contains("GraftMorScan"))
    assert(q.count() === 100 - 5 - 2)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.mor2").head().getLong(0) === 993)

    // force the jumbo-delete path (threshold 0): SAME native MoR scan,
    // delete state now loaded executor-side, identical answer
    spark.conf.set("spark.graft.delete-broadcast-max-bytes", "0")
    try {
      val q2 = spark.sql("SELECT * FROM graft.db.mor2 WHERE k < 100")
      assert(q2.queryExecution.executedPlan.toString.contains("GraftMorScan"))
      assert(q2.count() === 93)
      assert(spark.sql("SELECT COUNT(*) FROM graft.db.mor2").head().getLong(0) === 993)
      // full-row equality with the plan-time path
      spark.conf.unset("spark.graft.delete-broadcast-max-bytes")
      val planTime = spark.sql("SELECT * FROM graft.db.mor2").collect().map(_.toString).sorted
      spark.conf.set("spark.graft.delete-broadcast-max-bytes", "0")
      val execSide = spark.sql("SELECT * FROM graft.db.mor2").collect().map(_.toString).sorted
      assert(execSide === planTime)
      // _file/_pos metadata columns keep working executor-side
      // (k<10 is 10 rows minus the 5 position-deleted ones)
      assert(spark.sql("SELECT _file, _pos FROM graft.db.mor2 WHERE k < 10").count() === 5)
    } finally spark.conf.unset("spark.graft.delete-broadcast-max-bytes")
  }

  test("jumbo eq deletes beyond the executor byte cap probe the disk store") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mor3")
    spark.sql("CREATE TABLE graft.db.mor3 (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft.db.mor3 SELECT id AS k, CAST(id AS STRING) AS v FROM RANGE(2000)")
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/mor3")
    // two delete files in the same (k) group — exercises the run merge
    t.equalityDelete(spark, (0L until 300L).map(_ * 3).toDF("k"), Seq("k"))
    t.equalityDelete(spark, (0L until 200L).map(_ * 5).toDF("k"), Seq("k"))
    // deleted: multiples of 3 below 900 and multiples of 5 below 1000
    val expected = (0L until 2000L).count(k =>
      !(k % 3 == 0 && k < 900) && !(k % 5 == 0 && k < 1000))
    // baseline: plan-time maps
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.mor3").head().getLong(0) === expected)
    // threshold 0 on BOTH knobs: executor-side loading AND the disk-backed
    // sorted store (every group exceeds 0 bytes); same single-scan plan,
    // identical rows
    spark.conf.set("spark.graft.delete-broadcast-max-bytes", "0")
    spark.conf.set("spark.graft.eq-delete-executor-max-bytes", "0")
    try {
      val q = spark.sql("SELECT * FROM graft.db.mor3")
      assert(q.queryExecution.executedPlan.toString.contains("GraftMorScan"))
      val rows = q.collect()
      assert(rows.length === expected)
      assert(!rows.exists(r => (r.getLong(0) % 3 == 0 && r.getLong(0) < 900) ||
        (r.getLong(0) % 5 == 0 && r.getLong(0) < 1000)))
      // overlapping keys (multiples of 15) resolved to max seq once
      assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    } finally {
      spark.conf.unset("spark.graft.delete-broadcast-max-bytes")
      spark.conf.unset("spark.graft.eq-delete-executor-max-bytes")
    }
  }

  test("SQL DELETE FROM: filter-expressible predicates become position deletes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.sdel")
    spark.sql("CREATE TABLE graft.db.sdel (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft.db.sdel SELECT id AS k, CAST(id % 3 AS STRING) AS v FROM RANGE(300)")
    spark.sql("DELETE FROM graft.db.sdel WHERE v = '1' AND k < 150")
    // deleted: k % 3 == 1 && k < 150 -> 50 rows
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.sdel").head().getLong(0) === 250)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.sdel WHERE v = '1'").head().getLong(0) === 50)
    // the delete wrote MoR position deletes, not a rewrite
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/sdel")
    assert(t.planFiles(t.metadata.currentSnapshot.get)
      .exists(_.file.content === graft.tables.DataContent.PositionDeletes))
  }

  test("SQL UPDATE and MERGE INTO via delta row-level operations") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rl")
    spark.sql("CREATE TABLE graft.db.rl (k BIGINT, v STRING, amt DOUBLE)")
    spark.sql(
      """INSERT INTO graft.db.rl
        |SELECT id AS k, CAST(id % 2 AS STRING) AS v, CAST(id AS DOUBLE) AS amt
        |FROM RANGE(100)""".stripMargin)

    // UPDATE: matched rows get position-deleted and rewritten
    spark.sql("UPDATE graft.db.rl SET amt = amt * 10 WHERE v = '1' AND k < 20")
    assert(spark.sql(
      "SELECT SUM(amt) FROM graft.db.rl WHERE k < 20 AND v = '1'").head().getDouble(0)
      === (1 to 19 by 2).map(_ * 10.0).sum)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rl").head().getLong(0) === 100)

    // MERGE INTO: update matches, insert the rest
    Seq((1L, "x", 0.0), (200L, "new", 5.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("rl_updates")
    spark.sql(
      """MERGE INTO graft.db.rl t USING rl_updates s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.amt = s.amt
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rl").head().getLong(0) === 101)
    val r1 = spark.sql("SELECT v, amt FROM graft.db.rl WHERE k = 1").head()
    assert(r1.getString(0) === "x" && r1.getDouble(1) === 0.0)
    assert(spark.sql("SELECT v FROM graft.db.rl WHERE k = 200").head().getString(0) === "new")

    // MERGE delete branch
    spark.sql(
      """MERGE INTO graft.db.rl t USING rl_updates s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rl").head().getLong(0) === 99)

    // DELETE with a subquery (not filter-expressible -> row-level path)
    spark.sql(
      "DELETE FROM graft.db.rl WHERE k IN (SELECT k + 2 FROM rl_updates)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rl").head().getLong(0) === 98)
  }

  test("MERGE INTO ... WITH SCHEMA EVOLUTION adds the source's new columns") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mse")
    spark.sql("CREATE TABLE graft.db.mse (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.mse VALUES (1, 'a'), (2, 'b')")
    // the source carries an extra column the target lacks
    Seq((2L, "b2", 7.5), (3L, "c", 9.0)).toDF("k", "v", "score")
      .createOrReplaceTempView("mse_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.db.mse t USING mse_src s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql("SELECT k, v, score FROM graft.db.mse ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a", null), (2L, "b2", 7.5), (3L, "c", 9.0)))
    // the evolved column is REAL schema evolution: it has a field id and
    // survives a reload through the table metadata
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/mse")
    val f = t.metadata.currentSchema.findField("score")
    assert(f.isDefined && f.get.fieldType === graft.tables.IcePrim("double"))
  }

  test("DELETE/UPDATE on an empty table are no-ops, not analysis errors") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.emptyt")
    spark.sql("CREATE TABLE graft.db.emptyt (k BIGINT, v STRING)")
    spark.sql("DELETE FROM graft.db.emptyt WHERE k = 5")
    spark.sql("UPDATE graft.db.emptyt SET v = 'x' WHERE k = 5")
    assert(spark.sql("SELECT _file, _pos FROM graft.db.emptyt").count() === 0)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.emptyt").head().getLong(0) === 0)
  }

  test("row-level commit refuses when referenced files were rewritten concurrently") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.conflict")
    spark.sql("CREATE TABLE graft.db.conflict (k BIGINT)")
    spark.sql("INSERT INTO graft.db.conflict SELECT id AS k FROM RANGE(100)")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/db/conflict")
    // a commit referencing a data file the current snapshot no longer has
    // (as after a concurrent compaction) must fail loudly, not corrupt
    val err = intercept[RuntimeException] {
      t.commitRowDelta("delete", Nil, Nil,
        referencedDataFiles = Set("/no/such/rewritten-file.parquet"))
    }
    assert(err.getMessage.contains("concurrent rewrite"))
  }

  test("_file/_pos metadata columns are SQL-selectable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.meta")
    spark.sql("CREATE TABLE graft.db.meta (k BIGINT)")
    spark.sql("INSERT INTO graft.db.meta SELECT id AS k FROM RANGE(10)")
    spark.sql("INSERT INTO graft.db.meta SELECT id + 10 AS k FROM RANGE(10)")
    val rows = spark.sql("SELECT k, _file, _pos FROM graft.db.meta").collect()
    assert(rows.length === 20)
    assert(rows.map(_.getString(1)).toSet.size >= 2) // two commits -> >= two files
    // positions are per-file ordinals starting at 0
    val perFile = rows.groupBy(_.getString(1)).values
    perFile.foreach { fr =>
      assert(fr.map(_.getLong(2)).sorted.toSeq === (0L until fr.length).toSeq)
    }
  }

  test("_pos stays exact under pushed filters across many row groups") {
    // tiny row groups make row-group skipping observable: a filtered scan
    // requesting _pos must report the same positions as the full scan
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.rg")
    spark.sql(
      """CREATE TABLE graft.db.rg (k BIGINT, pad STRING)
        |TBLPROPERTIES ('write.parquet.row-group-size-bytes' = '4096')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.db.rg
        |SELECT id AS k, repeat(CAST(id AS STRING), 50) AS pad FROM RANGE(20000)""".stripMargin)
    val full = spark.sql("SELECT k, _pos FROM graft.db.rg").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val filtered = spark.sql("SELECT k, _pos FROM graft.db.rg WHERE k >= 19000").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(filtered.nonEmpty)
    filtered.foreach { case (k, pos) => assert(full(k) === pos, s"k=$k") }
    // and a row-level DELETE with the same shape removes the right rows
    spark.sql("DELETE FROM graft.db.rg WHERE k IN (SELECT id + 19500 FROM RANGE(100))")
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rg").head().getLong(0) === 19900)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.rg WHERE k >= 19500 AND k < 19600")
      .head().getLong(0) === 0)
  }

  test("byte-range split MoR partitions: positions stay exact across splits") {
    // graft.db.rg (written above): one data file, many 4 KB row groups,
    // 100 position-deleted rows. A small maxPartitionBytes must fan the
    // file into many byte-range partitions with identical results.
    val baseline = spark.sql("SELECT k, _pos FROM graft.db.rg").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      val q = spark.sql("SELECT k, _pos FROM graft.db.rg")
      assert(q.rdd.getNumPartitions > 4, "file did not split into ranges")
      val split = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(split === baseline)
      assert(spark.sql("SELECT COUNT(*) FROM graft.db.rg").head().getLong(0) === 19900)
      // executor-side delete loading composes with splits
      spark.conf.set("spark.graft.delete-broadcast-max-bytes", "0")
      val split2 = spark.sql("SELECT k, _pos FROM graft.db.rg").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(split2 === baseline)
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.graft.delete-broadcast-max-bytes")
    }
  }

  test("columnar fast path: files newer than every delete read vectorized") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.colf")
    spark.sql("CREATE TABLE graft.db.colf (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.colf SELECT id, CAST(id AS STRING) FROM RANGE(500)")
    spark.sql(
      "INSERT INTO graft.db.colf SELECT id + 500, CAST(id AS STRING) FROM RANGE(500)")
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/colf")
    t.equalityDelete(spark, Seq(1L, 2L).toDF("k"), Seq("k"))
    // compaction rewrites every data file PAST the delete's sequence: the
    // eq-delete file stays live in the snapshot, but no remaining data
    // file can be touched by it -> the MoR scan serves columnar batches
    t.rewriteSmallFiles(spark, smallFileThresholdBytes = 1L << 30)
    val q = spark.sql("SELECT k, v FROM graft.db.colf WHERE k < 100")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftMorScan"), s"expected MoR scan:\n$plan")
    assert(plan.contains("ColumnarToRow"), s"expected columnar scan:\n$plan")
    assert(q.count() === 98)
    assert(spark.sql("SELECT COUNT(*) FROM graft.db.colf").head().getLong(0) === 998)
  }

  test("vectorized MoR: files WITH deletes still read columnar, masked per batch") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.colm")
    spark.sql("CREATE TABLE graft.db.colm (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.colm SELECT id, CAST(id AS STRING) FROM RANGE(5000)")
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/colm")
    // eq deletes AND pos deletes against the live files — the former
    // all-or-nothing gate would force every row through the row reader
    t.equalityDelete(spark, (0L until 100L).map(_ * 7).toDF("k"), Seq("k"))
    val pos = t.scan(spark, keepFilePos = true).filter($"k" >= 4990)
      .select($"_file".as("file_path"), $"_pos".as("pos"))
    t.positionDelete(spark, pos)
    val q = spark.sql("SELECT * FROM graft.db.colm")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftMorScan"), s"expected MoR scan:\n$plan")
    assert(plan.contains("ColumnarToRow"), s"expected columnar scan:\n$plan")
    val rows = q.collect()
    // deleted: eq = multiples of 7 below 700, pos = rows with k >= 4990
    val expected = (0L until 5000L).filterNot(k => (k % 7 == 0 && k < 700) || k >= 4990)
    assert(rows.map(_.getLong(0)).sorted === expected.toArray)
    // filters still push into the columnar read for eq-only scans
    val f = spark.sql("SELECT k FROM graft.db.colm WHERE k BETWEEN 100 AND 200")
    assert(f.collect().map(_.getLong(0)).sorted ===
      (100L to 200L).filterNot(k => k % 7 == 0).toArray)
  }

  test("REST-mode SQL catalog: DDL/DML ride HTTP CAS commits") {
    val server = new tables.RestCatalog.Server()
    val uri = server.start()
    val wh = java.nio.file.Files.createTempDirectory("graft-restcat").toString
    spark.conf.set("spark.sql.catalog.gr", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gr.warehouse", wh)
    spark.conf.set("spark.sql.catalog.gr.uri", uri)
    try {
      spark.sql("CREATE NAMESPACE gr.db")
      spark.sql("CREATE TABLE gr.db.t (k BIGINT, v STRING)")
      spark.sql("INSERT INTO gr.db.t SELECT id, CAST(id AS STRING) FROM RANGE(100)")
      assert(spark.sql("SELECT COUNT(*) FROM gr.db.t").head().getLong(0) === 100)
      // MoR delete through SQL — the commit is an HTTP CAS, the read a
      // native MoR scan over the REST-loaded metadata
      spark.sql("DELETE FROM gr.db.t WHERE k < 10")
      assert(spark.sql("SELECT COUNT(*) FROM gr.db.t").head().getLong(0) === 90)
      assert(spark.sql("SHOW TABLES IN gr.db").collect().map(_.getString(1)).toSeq === Seq("t"))
      // rename moves only the catalog pointer; data still reads
      spark.sql("ALTER TABLE gr.db.t RENAME TO db.t2")
      assert(spark.sql("SELECT COUNT(*) FROM gr.db.t2").head().getLong(0) === 90)
      intercept[Exception] { spark.sql("SELECT * FROM gr.db.t").collect() }
      spark.sql("DROP TABLE gr.db.t2")
      assert(spark.sql("SHOW TABLES IN gr.db").collect().isEmpty)
      assert(spark.sql("SHOW NAMESPACES IN gr").collect().map(_.getString(0)).contains("db"))
      spark.sql("DROP NAMESPACE gr.db")
      assert(!spark.sql("SHOW NAMESPACES IN gr").collect().map(_.getString(0)).contains("db"))
    } finally {
      server.stop()
      Seq("", ".warehouse", ".uri").foreach(sfx =>
        spark.conf.unset(s"spark.sql.catalog.gr$sfx"))
    }
  }

  test("namespace properties: create/set/unset/describe on both catalog backends") {
    import org.apache.spark.sql.connector.catalog.NamespaceChange
    // ---- storage backend: properties persist in the namespace dotfile
    spark.sql(
      "CREATE NAMESPACE graft.nsp WITH PROPERTIES ('team'='data', 'tier'='gold')")
    val desc0 = spark.sql("DESCRIBE NAMESPACE EXTENDED graft.nsp")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc0("Properties").contains("team") && desc0("Properties").contains("gold"))
    spark.sql("ALTER NAMESPACE graft.nsp SET PROPERTIES ('tier'='silver', 'new'='x')")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.spark.GraftCatalog]
    val ns = Array("nsp")
    def props() = cat.loadNamespaceMetadata(ns)
    assert(props().get("team") === "data")
    assert(props().get("tier") === "silver")
    assert(props().get("new") === "x")
    assert(Option(props().get("location")).exists(_.nonEmpty))
    // removal via the DSv2 change API (the SQL UNSET path drives the same)
    cat.alterNamespace(ns, NamespaceChange.removeProperty("new"))
    assert(!props().containsKey("new") && props().get("tier") === "silver")
    // tables list clean despite the dotfile; non-cascade drop still works
    assert(cat.listTables(ns).isEmpty)
    spark.sql("DROP NAMESPACE graft.nsp")
    assert(!cat.namespaceExists(ns))

    // ---- REST backend: properties live server-side via the spec's
    // POST /v1/namespaces/{ns}/properties
    val server = new tables.RestCatalog.Server()
    val uri = server.start()
    val wh = Files.createTempDirectory("graft-restnsp").toString
    spark.conf.set("spark.sql.catalog.grp", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grp.warehouse", wh)
    spark.conf.set("spark.sql.catalog.grp.uri", uri)
    try {
      spark.sql("CREATE NAMESPACE grp.db WITH PROPERTIES ('owner_team'='ml')")
      val rcat = spark.sessionState.catalogManager.catalog("grp")
        .asInstanceOf[graft.spark.GraftCatalog]
      assert(rcat.loadNamespaceMetadata(Array("db")).get("owner_team") === "ml")
      spark.sql("ALTER NAMESPACE grp.db SET PROPERTIES ('owner_team'='infra', 'sla'='tight')")
      val m = rcat.loadNamespaceMetadata(Array("db"))
      assert(m.get("owner_team") === "infra" && m.get("sla") === "tight")
      rcat.alterNamespace(Array("db"), NamespaceChange.removeProperty("sla"))
      assert(!rcat.loadNamespaceMetadata(Array("db")).containsKey("sla"))
      // removing a missing key is tolerated (spec reports it as missing)
      rcat.alterNamespace(Array("db"), NamespaceChange.removeProperty("ghost"))
      spark.sql("DROP NAMESPACE grp.db")
    } finally {
      server.stop()
      Seq("", ".warehouse", ".uri").foreach(sfx =>
        spark.conf.unset(s"spark.sql.catalog.grp$sfx"))
    }
  }

  test("nested namespaces: create/list/use on both catalog backends") {
    // ---- storage backend
    spark.sql("CREATE NAMESPACE graft.lv1")
    spark.sql("CREATE NAMESPACE graft.lv1.lv2")
    spark.sql("CREATE TABLE graft.lv1.lv2.t (k BIGINT)")
    spark.sql("INSERT INTO graft.lv1.lv2.t VALUES (1), (2)")
    assert(spark.sql("SELECT count(*) FROM graft.lv1.lv2.t").head().getLong(0) === 2L)
    // SHOW NAMESPACES IN <parent> lists direct children, full path form
    val kids = spark.sql("SHOW NAMESPACES IN graft.lv1")
      .collect().map(_.getString(0)).toSeq
    assert(kids === Seq("lv1.lv2"))
    // a TABLE directory is not a namespace and never lists as one
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.spark.GraftCatalog]
    assert(!cat.namespaceExists(Array("lv1", "lv2", "t")))
    assert(cat.listNamespaces(Array("lv1", "lv2")).isEmpty)
    assert(spark.sql("SHOW TABLES IN graft.lv1.lv2")
      .collect().map(_.getString(1)).toSeq === Seq("t"))
    spark.sql("DROP TABLE graft.lv1.lv2.t")
    spark.sql("DROP NAMESPACE graft.lv1.lv2")
    spark.sql("DROP NAMESPACE graft.lv1")

    // ---- REST backend: multipart namespaces ride %1F-joined paths
    val server = new tables.RestCatalog.Server()
    val uri = server.start()
    val wh = Files.createTempDirectory("graft-restnest").toString
    spark.conf.set("spark.sql.catalog.grn", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grn.warehouse", wh)
    spark.conf.set("spark.sql.catalog.grn.uri", uri)
    try {
      spark.sql("CREATE NAMESPACE grn.a")
      spark.sql("CREATE NAMESPACE grn.a.b WITH PROPERTIES ('depth'='2')")
      spark.sql("CREATE TABLE grn.a.b.t (k BIGINT)")
      spark.sql("INSERT INTO grn.a.b.t VALUES (7)")
      assert(spark.sql("SELECT k FROM grn.a.b.t").head().getLong(0) === 7L)
      val rkids = spark.sql("SHOW NAMESPACES IN grn.a")
        .collect().map(_.getString(0)).toSeq
      assert(rkids === Seq("a.b"))
      val rcat = spark.sessionState.catalogManager.catalog("grn")
        .asInstanceOf[graft.spark.GraftCatalog]
      assert(rcat.loadNamespaceMetadata(Array("a", "b")).get("depth") === "2")
      assert(spark.sql("SHOW TABLES IN grn.a.b")
        .collect().map(_.getString(1)).toSeq === Seq("t"))
      spark.sql("DROP TABLE grn.a.b.t")
      spark.sql("DROP NAMESPACE grn.a.b")
    } finally {
      server.stop()
      Seq("", ".warehouse", ".uri").foreach(sfx =>
        spark.conf.unset(s"spark.sql.catalog.grn$sfx"))
    }
  }

  test("ALTER TABLE ADD/RENAME column via SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.alt")
    spark.sql("CREATE TABLE graft.db.alt (k INT)")
    spark.sql("INSERT INTO graft.db.alt VALUES (1)")
    spark.sql("ALTER TABLE graft.db.alt ADD COLUMN extra DOUBLE")
    assert(spark.sql("SELECT * FROM graft.db.alt").columns.toSeq === Seq("k", "extra"))
    assert(spark.sql("SELECT extra FROM graft.db.alt").head().isNullAt(0))
  }

  test("native DSv2 batch scan is used for delete-free tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.native")
    spark.sql("CREATE TABLE graft.db.native (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.db.native SELECT id, id * 1.5 FROM RANGE(1000)")
    val df = spark.sql("SELECT SUM(v) AS s FROM graft.db.native WHERE k < 500")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftNativeBatchScan"), s"native scan not engaged:\n$plan")
    assert(df.head().getDouble(0) === (0 until 500).map(_ * 1.5).sum)
    // MoR table falls back to the bridge
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/native")
    t.equalityDelete(spark, Seq(1L).toDF("k"), Seq("k"))
    val df2 = spark.sql("SELECT COUNT(*) FROM graft.db.native")
    assert(!df2.queryExecution.executedPlan.toString.contains("GraftNativeBatchScan"))
    assert(df2.head().getLong(0) === 999)
  }

  test("scan statistics: small graft dimension auto-broadcasts in a join") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.dim")
    spark.sql("CREATE TABLE graft.db.dim (k BIGINT, name STRING)")
    spark.sql("INSERT INTO graft.db.dim SELECT id, concat('n', id) FROM RANGE(100)")
    spark.range(100000).toDF("k").createOrReplaceTempView("facts_bb")
    // no broadcast() hint anywhere: the planner must see the scan's own
    // size estimate (SupportsReportStatistics) and pick a broadcast join
    val df = spark.sql(
      "SELECT f.k, d.name FROM facts_bb f JOIN graft.db.dim d ON f.k % 100 = d.k")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
    assert(df.count() === 100000)
    // MoR scan path reports stats too
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/dim")
    t.equalityDelete(spark, Seq(0L).toDF("k"), Seq("k"))
    val df2 = spark.sql(
      "SELECT f.k, d.name FROM facts_bb f JOIN graft.db.dim d ON f.k % 100 = d.k")
    assert(df2.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(df2.count() === 99000)
  }

  test("MERGE with NOT MATCHED BY SOURCE deletes through the delta plan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.mbs")
    spark.sql("CREATE TABLE graft.db.mbs (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.mbs VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    spark.sql(
      """MERGE INTO graft.db.mbs t
        |USING (SELECT * FROM VALUES (2,'B'),(5,'E') AS s(k,v)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN DELETE""".stripMargin)
    val out = spark.sql("SELECT k, v FROM graft.db.mbs ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "a"), (2L, "B"), (3L, "c"), (5L, "E")))
  }

  test("changelog emits both halves of SQL UPDATE / MERGE row-deltas") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.cdcup")
    spark.sql("CREATE TABLE graft.db.cdcup (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.cdcup VALUES (1,'a'),(2,'b'),(3,'c')")
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val snap1 = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/cdcup")
      .metadata.currentSnapshotId.get
    // row-delta commits label themselves 'overwrite' but replace nothing:
    // the changelog must emit the OLD row version as a delete and the new
    // one as an insert (a CDC consumer reading only inserts would
    // silently miss the retraction)
    spark.sql("UPDATE graft.db.cdcup SET v = 'B' WHERE k = 2")
    val t = graft.tables.StorageCatalog.loadTable(conf, s"$wh/db/cdcup")
    val out = t.changes(spark, snap1)
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(out.toSeq === Seq((2L, "B", "insert"), (2L, "b", "delete")))
  }

  test("type widening: legal promotions apply, illegal ones are refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.widen")
    spark.sql("CREATE TABLE graft.db.widen (k INT, v FLOAT, s STRING)")
    spark.sql("INSERT INTO graft.db.widen VALUES (1, CAST(1.5 AS FLOAT), 'a')")
    spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN v TYPE DOUBLE")
    spark.sql("INSERT INTO graft.db.widen VALUES (CAST(2 AS BIGINT), 2.5, 'b')")
    val rows = spark.sql("SELECT k, v FROM graft.db.widen ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.5, 2.5))
    // FILTERED scans decode pre-promotion 4-byte manifest bounds through
    // the widened type (bound pruning, min/max pushdown)
    assert(spark.sql("SELECT count(*) FROM graft.db.widen WHERE k > 1")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT min(k) AS mn, max(v) AS mx FROM graft.db.widen")
      .collect().head.toSeq === Seq(1L, 2.5))
    // narrowing and cross-family promotions are refused loudly
    // (Spark's analyzer refuses narrowing before the catalog sees it;
    // the catalog-side guard below protects direct API callers)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN k TYPE INT")
    }
    assert(e1.getMessage.contains("promotion") ||
      e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN s TYPE BIGINT")
    }
    assert(e2.getMessage.contains("promotion") ||
      e2.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e2.getMessage)
    val conf = spark.sparkContext.hadoopConfiguration
    val whDir = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val api = graft.tables.StorageCatalog.loadTable(conf, s"$whDir/db/widen")
    val e3 = intercept[Exception] {
      api.updateColumnType("s", graft.tables.IcePrim("long"))
    }
    assert(e3.getMessage.contains("promotion"), e3.getMessage)
    // nullability: loosening is fine; tightening on non-empty is refused
    spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN s DROP NOT NULL")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.widen ALTER COLUMN s SET NOT NULL")
    }
    // property removal round-trips
    spark.sql("ALTER TABLE graft.db.widen SET TBLPROPERTIES ('x' = '1')")
    spark.sql("ALTER TABLE graft.db.widen UNSET TBLPROPERTIES ('x')")
    val props = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "widen"))
      .properties()
    assert(!props.containsKey("x"))
  }

  test("LIMIT pushdown truncates the planned file list; filters/deletes disable it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.lim")
    spark.sql("CREATE TABLE graft.db.lim (id BIGINT, v STRING)")
    // 12 separate single-file commits
    (0 until 12).foreach { i =>
      spark.sql(s"INSERT INTO graft.db.lim VALUES ($i, 'x$i'), (${i + 100}, 'y$i')")
    }
    def filesScannedDelta(q: String, expectRows: Long): Long = {
      val before = graft.tables.Metrics.get(graft.tables.Metrics.FilesScanned)
      // collect, not count: COUNT(*) would answer from manifest stats
      // without opening (or planning) any file at all
      assert(spark.sql(q).collect().length.toLong === expectRows)
      graft.tables.Metrics.get(graft.tables.Metrics.FilesScanned) - before
    }
    // unlimited scan plans every file (each 2-row INSERT may fan out)
    val base = filesScannedDelta("SELECT * FROM graft.db.lim", 24)
    assert(base >= 12)
    // LIMIT 3 plans only the file prefix covering 3 rows
    val lim = filesScannedDelta("SELECT * FROM graft.db.lim LIMIT 3", 3)
    assert(lim <= 3 && lim < base, s"limit pushdown planned $lim of $base files")
    // a filter disables truncation (recordCount no longer bounds matching
    // rows) — use a predicate no file's bounds can prune, so any file-count
    // drop could only have come from (unsafe) limit truncation
    assert(filesScannedDelta(
      "SELECT * FROM graft.db.lim WHERE id >= 0 LIMIT 30", 24) === base)
    // deletes route through the MoR scan: truncation off, results exact
    spark.sql("DELETE FROM graft.db.lim WHERE id = 0")
    assert(spark.sql("SELECT * FROM graft.db.lim LIMIT 30").collect().length === 23)
  }

  test("sorted tables report output ordering; redundant local sorts vanish") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.sorted")
    spark.sql("CREATE TABLE graft.db.sorted (id BIGINT, v DOUBLE)")
    spark.sql("ALTER TABLE graft.db.sorted WRITE ORDERED BY id")
    spark.sql(
      """INSERT INTO graft.db.sorted
        |SELECT CAST(id AS BIGINT), CAST(id % 7 AS DOUBLE) FROM range(1000)""".stripMargin)
    def plan(df: org.apache.spark.sql.DataFrame) = df.queryExecution.executedPlan
    def scanOrdering(df: org.apache.spark.sql.DataFrame) = plan(df).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.outputOrdering
    }.flatten
    def hasSort(df: org.apache.spark.sql.DataFrame) = plan(df).collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.nonEmpty
    val sorted = spark.table("graft.db.sorted").sortWithinPartitions("id")
    assert(scanOrdering(sorted).nonEmpty, "scan must report the declared order")
    assert(!hasSort(sorted), "partition-local sort on the sort key is redundant")
    assert(sorted.collect().length === 1000)
    // the contract behind the report: every partition's rows ARE sorted
    val partsSorted = spark.table("graft.db.sorted").select("id").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect()
      .forall(s => s === s.sorted)
    assert(partsSorted)
    // pruning away the sort column drops the report (the ordering would
    // not resolve against the scan output)
    assert(scanOrdering(spark.table("graft.db.sorted").select("v")).isEmpty)
    // a table whose files were not written under a declared order stays
    // unordered and keeps its local sort
    spark.sql("DROP TABLE IF EXISTS graft.db.unsorted")
    spark.sql("CREATE TABLE graft.db.unsorted (id BIGINT)")
    spark.sql("INSERT INTO graft.db.unsorted SELECT CAST(id AS BIGINT) FROM range(100)")
    val un = spark.table("graft.db.unsorted").sortWithinPartitions("id")
    assert(scanOrdering(un).isEmpty)
    assert(hasSort(un))
  }

  test("branch_/tag_ identifiers: ref-scoped reads, branch writes, tag immutability") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("DROP TABLE IF EXISTS graft.db.refid")
    spark.sql("CREATE TABLE graft.db.refid (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.refid VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.db.refid CREATE BRANCH audit")
    spark.sql("ALTER TABLE graft.db.refid CREATE TAG v1")

    // a write through the branch identifier stays off main
    spark.sql("INSERT INTO graft.db.refid.branch_audit VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM graft.db.refid").collect()(0).getLong(0) === 2)
    assert(spark.sql("SELECT count(*) FROM graft.db.refid.branch_audit")
      .collect()(0).getLong(0) === 3)
    assert(spark.sql("SELECT count(*) FROM graft.db.refid.tag_v1")
      .collect()(0).getLong(0) === 2)
    // equivalent to the VERSION AS OF form
    assert(spark.sql("SELECT count(*) FROM graft.db.refid VERSION AS OF 'audit'")
      .collect()(0).getLong(0) === 3)

    // publish and confirm main catches up
    spark.sql("CALL graft.system.fast_forward('db.refid', 'main', 'audit')")
    assert(spark.sql("SELECT count(*) FROM graft.db.refid").collect()(0).getLong(0) === 3)

    // a tag refuses writes; row-level ops refuse the ref form
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.refid.tag_v1 VALUES (9, 'x')")
    }
    assert(e1.getMessage.contains("immutable"))
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM graft.db.refid.branch_audit WHERE k = 1")
    }
    assert(e2.getMessage != null)
    // an unknown ref surfaces as no-such-table, not a silent main read
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.refid.branch_nope").collect()
    }
    assert(e3.getMessage.toLowerCase.contains("table"))
  }
}
