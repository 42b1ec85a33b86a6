package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Replays the reference's OWN end-to-end test scenarios
  * (the .toml files under `/root/reference/testdata/toml` — the table DDL, data, and
  * queries its docker harness runs against Spark+Iceberg;
  * icelake/tests/integration) natively against the graft catalog: every
  * partition-transform family over the full 11-type column set, insert
  * through SQL, scan back exactly, and partition bookkeeping consistent
  * with the files' manifest tuples. */
class ReferenceScenarioSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-refsc").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gref", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gref.warehouse", wh)
    s
  }

  // the reference runs every TOML case against BOTH catalog backends
  // (insert_tests_v2.rs:275-300 — storage and REST); the REST catalog
  // here is a real socket server backed by its own warehouse
  private var restStarted = false
  private lazy val restEnv: (String, String) = {
    val uri = restServer.start()
    val cat = "grefrest"
    val wh = Files.createTempDirectory("graft-refsc-rest").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", uri)
    restStarted = true
    (cat, uri)
  }
  private lazy val restServer = new RestCatalog.Server()

  override def afterAll(): Unit = {
    if (restStarted) restServer.stop()
    super.afterAll()
  }

  private val tomlDir = "/root/reference/testdata/toml"

  /** minimal extraction for the scenario files' fixed shape */
  private def block(text: String, key: String): String = {
    val re = (java.util.regex.Pattern.quote(key) +
      """\s*=\s*'''([\s\S]*?)'''""").r
    re.findFirstMatchIn(text).map(_.group(1)).getOrElse(
      sys.error(s"no $key block"))
  }

  private def queries(text: String): Seq[String] = {
    val re = """query\s*=\s*\[([\s\S]*?)\]""".r
    val body = re.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
    """'([^']+)'""".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  test("reference scan_test: truncate-partitioned table matches the csv fixtures") {
    // icelake/tests/scan_test.rs: 9 rows into truncate(1, v_varchar) ->
    // three partitions, each expected to equal one committed csv fixture
    import org.apache.spark.sql.types._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gref.scan")
    spark.sql("DROP TABLE IF EXISTS gref.scan.t1")
    spark.sql(
      """CREATE TABLE gref.scan.t1 (
        |  id BIGINT, v_int INT, v_long BIGINT, v_float FLOAT, v_double DOUBLE,
        |  v_varchar STRING, v_bool BOOLEAN, v_date DATE, v_decimal DECIMAL(36,10))
        |PARTITIONED BY (truncate(1, v_varchar))
        |TBLPROPERTIES ('format-version'='2')""".stripMargin)
    spark.sql(
      """INSERT INTO gref.scan.t1 VALUES
        |(1, 1, 1, 1.1, 1.1, '1abc', true, date '2020-01-01', 1.1),
        |(2, 2, 2, 2.2, 2.2, '2abc', true, date '2020-02-02', 2.2),
        |(3, 3, 3, 3.3, 3.3, '3abc', true, date '2020-03-03', 3.3),
        |(4, 4, 4, 4.4, 4.4, '1abc', true, date '2020-04-04', 4.4),
        |(5, 5, 5, 5.5, 5.5, '2abc', true, date '2020-05-05', 5.5),
        |(6, 6, 6, 6.6, 6.6, '3abc', true, date '2020-06-06', 6.6),
        |(7, 7, 7, 7.7, 7.7, '1abc', true, date '2020-07-07', 7.7),
        |(8, 8, 8, 8.8, 8.8, '2abc', true, date '2020-08-08', 8.8),
        |(9, 9, 9, 9.9, 9.9, '3abc', true, date '2020-09-09', 9.9)""".stripMargin)
    val csvSchema = StructType(Seq(
      StructField("id", LongType), StructField("v_int", IntegerType),
      StructField("v_long", LongType), StructField("v_float", FloatType),
      StructField("v_double", DoubleType), StructField("v_varchar", StringType),
      StructField("v_bool", BooleanType), StructField("v_date", DateType),
      StructField("v_decimal", DecimalType(36, 10))))
    def csv(n: Int) = spark.read.schema(csvSchema)
      .csv(s"/root/reference/testdata/csv/$n.csv")
    // scan-all equals the union of the reference's three expected fixtures
    val all = spark.sql("SELECT * FROM gref.scan.t1")
    val expected = csv(1).union(csv(2)).union(csv(3))
    assert(all.count() === 9)
    assert(all.exceptAll(expected).isEmpty && expected.exceptAll(all).isEmpty)
    // partition-filtered scan equals exactly 1.csv, via REAL file pruning
    // on the truncate transform
    import org.apache.spark.sql.functions.col
    val t = StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration,
      s"${spark.conf.get("spark.sql.catalog.gref.warehouse")}/scan/t1")
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.map(_.file.partition).distinct.size === 3)
    val pruned = PruneEval.prunePlanned(files, Some(col("v_varchar") === "1abc"),
      t.metadata, t.metadata.currentSchema)
    assert(pruned.map(_.file.partition).distinct === List(List(Some("1"))))
    val part1 = spark.sql("SELECT * FROM gref.scan.t1 WHERE v_varchar LIKE '1%'")
    assert(part1.exceptAll(csv(1)).isEmpty && csv(1).exceptAll(part1).isEmpty)
  }

  test("reference delta_test_v2: equality-delta writes against a MoR table") {
    // icelake/tests/delta_test_v2.rs:354-395 — the EqualityDeltaWriter
    // scenario: table (id, key, value) partitioned by identity(id),
    // format-version 2, write.delete.mode=merge-on-read, equality ids
    // (id, key). Two cases, replayed natively through GraftTable.upsert
    // (the same CDC op surface: 1=insert/upsert, 2=delete).
    val wh = spark.conf.get("spark.sql.catalog.gref.warehouse")
    def freshT1(name: String): GraftTable = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gref.delta")
      spark.sql(s"DROP TABLE IF EXISTS gref.delta.$name")
      spark.sql(
        s"""CREATE TABLE gref.delta.$name (id BIGINT, key BIGINT, value BIGINT)
           |PARTITIONED BY (id)
           |TBLPROPERTIES ('format-version'='2',
           |  'write.delete.mode'='merge-on-read')""".stripMargin)
      StorageCatalog.loadTable(
        spark.sparkContext.hadoopConfiguration, s"$wh/delta/$name")
    }
    import spark.implicits._
    def rows(t: String) = spark.sql(s"SELECT * FROM gref.delta.$t")
      .as[(Long, Long, Long)].collect().toSet

    // equality_delta_write_test: two delta writes, one commit; later
    // same-key rows replace earlier ones WITHIN the writer
    val t1 = freshT1("t1w")
    val batch1 = Seq( // (id, key, value) with op=1 throughout
      (1L, 1L, 1L, 1), (1L, 2L, 4L, 1), (1L, 3L, 5L, 1),
      (1L, 2L, 2L, 1), (1L, 3L, 3L, 1), (1L, 4L, 4L, 1)
    ).toDF("id", "key", "value", "_op")
    t1.upsert(spark, batch1, Seq("id", "key"), opCol = Some("_op"))
    assert(rows("t1w") === Set((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (1L, 4L, 4L)),
      "reference check: select * from s1.t1 == s1.t2 after the write test")

    // equality_delta_delete_test: commit 1 writes (1,1,1),(1,2,2),(1,4,4);
    // commit 2 inserts (1,3,3),(1,5,5) then deletes keys (1,5) [in-writer]
    // and (1,4) [prior commit]
    val t2 = freshT1("t1d")
    t2.upsert(spark,
      Seq((1L, 1L, 1L, 1), (1L, 2L, 2L, 1), (1L, 4L, 4L, 1))
        .toDF("id", "key", "value", "_op"),
      Seq("id", "key"), opCol = Some("_op"))
    val t2b = StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/delta/t1d")
    t2b.upsert(spark,
      Seq((1L, 3L, 3L, 1), (1L, 5L, 5L, 1), (1L, 5L, 5L, 2), (1L, 4L, 4L, 2))
        .toDF("id", "key", "value", "_op"),
      Seq("id", "key"), opCol = Some("_op"))
    assert(rows("t1d") === Set((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L)),
      "reference check: select * from s1.t1 == s1.t2 after the delete test")
    // the MoR property held: the delete landed as delete files, not a rewrite
    val reloaded = StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/delta/t1d")
    val snap = reloaded.metadata.currentSnapshot.get
    assert(snap.summary.get("total-delete-files").exists(_.toLong > 0),
      "delete files present (merge-on-read, not copy-on-write)")
    assert(reloaded.planFiles(snap)
      .exists(_.file.content == DataContent.EqualityDeletes),
      "the prior-commit delete landed as an EQUALITY delete file")
  }

  test("reference precompute_partition_test: partition tuples computed upstream") {
    // icelake/tests/precompute_partition_test.rs: the engine computes
    // partition values UPSTREAM of the file writer (its
    // `precompute_partition_writer_builder`); graft's equivalent is the
    // Catalyst transform columns + clustering shuffle that feed the
    // fanout writers. Both scenario cases write (1,1,1),(1,2,2),(1,3,3),
    // (1,4,4) into identity(id) partition 1 — scan-back exact AND the
    // manifest tuples must carry the precomputed value.
    val wh = spark.conf.get("spark.sql.catalog.gref.warehouse")
    import spark.implicits._
    def fresh(name: String): GraftTable = {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gref.pre")
      spark.sql(s"DROP TABLE IF EXISTS gref.pre.$name")
      spark.sql(
        s"""CREATE TABLE gref.pre.$name (id BIGINT, key BIGINT, value BIGINT)
           |PARTITIONED BY (id)
           |TBLPROPERTIES ('format-version'='2',
           |  'write.delete.mode'='merge-on-read')""".stripMargin)
      StorageCatalog.loadTable(
        spark.sparkContext.hadoopConfiguration, s"$wh/pre/$name")
    }
    val expected = Set((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (1L, 4L, 4L))
    val rows = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (1L, 4L, 4L))

    // append_only_test
    val ta = fresh("t1a")
    ta.append(spark, rows.toDF("id", "key", "value"))
    assert(spark.sql("SELECT * FROM gref.pre.t1a")
      .as[(Long, Long, Long)].collect().toSet === expected)
    val files = ta.planFiles(ta.metadata.currentSnapshot.get)
    assert(files.nonEmpty &&
      files.forall(_.file.partition === Seq(Some(1L))),
      "manifest tuples carry the precomputed identity partition value")

    // delta_test (all ops = insert through the equality-delta surface)
    val td = fresh("t1d")
    td.upsert(spark,
      rows.map { case (a, b, c) => (a, b, c, 1) }.toDF("id", "key", "value", "_op"),
      Seq("id", "key"), opCol = Some("_op"))
    assert(spark.sql("SELECT * FROM gref.pre.t1d")
      .as[(Long, Long, Long)].collect().toSet === expected)
    // DATA files carry the precomputed tuple; the equality-delete file
    // is global-scope (partition-less) by design
    val dFiles = td.planFiles(td.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
    assert(dFiles.nonEmpty && dFiles.forall(_.file.partition === Seq(Some(1L))))
  }

  private val colNames = Seq("id", "v_int", "v_long", "v_float", "v_double",
    "v_varchar", "v_bool", "v_date", "v_timestamp", "v_decimal", "v_ts_ntz")
  private val castTypes = Seq("BIGINT", "INT", "BIGINT", "FLOAT", "DOUBLE",
    "STRING", "BOOLEAN", "DATE", "TIMESTAMP", "DECIMAL(36,10)", "TIMESTAMP_NTZ")

  private def scenarios = new java.io.File(tomlDir).listFiles()
    .filter(_.getName.endsWith(".toml")).map(_.getName).sorted

  for (backend <- Seq("storage", "rest"); name <- scenarios)
      test(s"reference scenario $name replays natively ($backend)") {
    val cat = backend match {
      case "storage" => "gref"
      case "rest" => restEnv._1
    }
    val text = new String(Files.readAllBytes(Paths.get(s"$tomlDir/$name")), "UTF-8")
    val ns = name.stripSuffix(".toml").replace('-', '_')
    val tbl = s"$cat.$ns.t1"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // the scenario's own DDL, retargeted at the graft catalog
    val ddl = block(text, "create_table_sql")
      .replace("s1.t1", tbl)
      .replace("USING iceberg", "")
    spark.sql(ddl)

    // the scenario's CSV rows, cast to the declared column types
    val rows = block(text, "data").split('\n').map(_.trim).filter(_.nonEmpty)
    import spark.implicits._
    val raw = rows.map(_.split(',').toSeq).map {
      case s if s.length == colNames.length => s
      case s => sys.error(s"bad row arity: $s")
    }.toSeq
      .map(s => (s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7), s(8), s(9), s(10)))
      .toDF(colNames.map("raw_" + _): _*)
    val typed = raw.select(colNames.zip(castTypes).map { case (c, t) =>
      expr(s"CAST(raw_$c AS $t)").as(c)
    }: _*)
    typed.createOrReplaceTempView(s"src_${backend}_$ns")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM src_${backend}_$ns")

    // scenario query 1: full scan — must round-trip the rows exactly
    val sel = queries(text).head.replace("s1.t1", tbl).stripSuffix(";")
    val got = spark.sql(sel).collect()
    assert(got.length === rows.length)
    val expected = typed.orderBy(col("id").desc).collect()
    assert(got.toSeq === expected.toSeq, s"$name: scan mismatch")

    // partition bookkeeping: the partitions metadata view agrees with the
    // distinct manifest partition tuples of the files actually written;
    // the REST backend loads through the catalog PROTOCOL, not the disk
    // layout — the same access path a foreign engine would use
    val t = backend match {
      case "rest" =>
        new RestCatalog.Client(
          restEnv._2, spark.sparkContext.hadoopConfiguration)
          .loadTable(ns, "t1")
      case _ => StorageCatalog.loadTable(
        spark.sparkContext.hadoopConfiguration,
        s"${spark.conf.get("spark.sql.catalog.gref.warehouse")}/$ns/t1")
    }
    val tuples = t.planFiles(t.metadata.currentSnapshot.get)
      .map(_.file.partition).distinct
    if (queries(text).exists(_.contains(".partitions"))) {
      val pq = queries(text).find(_.contains(".partitions")).get
        .replace("s1.t1", tbl).stripSuffix(";")
      assert(spark.sql(pq).collect().length === tuples.size,
        s"$name: partitions view disagrees with manifest tuples")
    }
    // the scenario data spans 5 distinct days in ONE month — day/hour/
    // identity/hash specs fan out, month/year legitimately collapse to 1
    if (t.metadata.defaultSpec.fields.nonEmpty) {
      assert(tuples.nonEmpty, s"$name: expected partition tuples")
      if (name.contains("day") || name.contains("hour") ||
        name.contains("identity") || name.contains("hash"))
        assert(tuples.size > 1, s"$name: expected multiple partitions")
    }
  }

  test("reference rest_catalog_tests: SQL-created tables list and load via REST") {
    // icelake/tests/rest_catalog_tests.rs — test_list_tables (s1.t1, s1.t2,
    // s2.t1 created through Spark SQL, then list_tables per namespace) and
    // test_load_table (format v2 + schema round-trip through the catalog)
    val server = new RestCatalog.Server()
    val uri = server.start()
    val cat = s"grref${System.nanoTime()}"
    try {
      val wh = Files.createTempDirectory("graft-refrest").toFile.getAbsolutePath
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.conf.set(s"spark.sql.catalog.$cat.uri", uri)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.s1")
      spark.sql(s"CREATE TABLE $cat.s1.t1 (id BIGINT)")
      spark.sql(s"CREATE TABLE $cat.s1.t2 (id BIGINT)")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.s2")
      spark.sql(s"CREATE TABLE $cat.s2.t1 (id BIGINT)")
      val client = new RestCatalog.Client(
        uri, spark.sparkContext.hadoopConfiguration)
      assert(client.listTables("s1").sorted === Seq("t1", "t2"))
      assert(client.listTables("s2") === Seq("t1"))
      val loaded = client.loadTable("s1", "t1").metadata
      assert(loaded.formatVersion === 2)
      assert(loaded.currentSchema.fields.map(f => (f.name, f.fieldType)) ===
        List(("id", IcePrim("long"))))
    } finally server.stop()
  }

  test("reference insert_compact_test: 100 task writes per commit, then compaction") {
    // icelake/tests/insert_compact_test.rs — TIMES(=100) append-only task
    // writers each close into their own data files, ONE Transaction
    // commits them all (`tx.append_data_file(results.flatten)`,
    // insert_compact_test.rs:190-195), then Spark's
    // `rewrite_data_files(target-file-size-bytes)` compacts and the count
    // is re-checked at 5*TIMES; the whole cycle runs twice (run(),
    // insert_compact_test.rs:214-220). Table = partition_month_test.toml.
    val Times = 100
    val text = new String(Files.readAllBytes(
      Paths.get(s"$tomlDir/partition_month_test.toml")), "UTF-8")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gref.cmp")
    spark.sql("DROP TABLE IF EXISTS gref.cmp.t1")
    spark.sql(block(text, "create_table_sql")
      .replace("s1.t1", "gref.cmp.t1").replace("USING iceberg", ""))

    import spark.implicits._
    val rows = block(text, "data").split('\n').map(_.trim).filter(_.nonEmpty)
    val typed = rows.map(_.split(',').toSeq).toSeq
      .map(s => (s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7), s(8), s(9), s(10)))
      .toDF(colNames.map("raw_" + _): _*)
      .select(colNames.zip(castTypes).map { case (c, t) =>
        expr(s"CAST(raw_$c AS $t)").as(c)
      }: _*)
      // one in-memory batch, replayed Times over — the write path is
      // what's under test, not the source scan
      .cache()

    val wh = spark.conf.get("spark.sql.catalog.gref.warehouse")
    def load() = StorageCatalog.loadTable(
      spark.sparkContext.hadoopConfiguration, s"$wh/cmp/t1")
    def liveDataFiles() = {
      val t = load()
      t.planFiles(t.metadata.currentSnapshot.get)
        .count(_.file.content == DataContent.Data)
    }
    def count() = spark.sql("SELECT count(*) FROM gref.cmp.t1").head.getLong(0)

    // one write round: Times independent task-writer closes, one commit
    def writeRound(): Unit = {
      val t = load()
      val files = (1 to Times).toList
        .flatMap(_ => TableWrite.writeDataFiles(t, spark, typed))
      assert(files.length >= Times, "each task writer closes its own file(s)")
      t.commit(spark, "append",
        addedData = files, addedDeletes = Nil, replace = false)
    }

    writeRound()
    assert(count() === 5L * Times)
    val before1 = liveDataFiles()
    assert(before1 >= Times, "many small files in one commit pre-compaction")
    spark.sql(
      s"CALL gref.system.rewrite_data_files('cmp.t1', ${100L * 1024 * 1024})")
    assert(count() === 5L * Times, "compaction preserves rows")
    val after1 = liveDataFiles()
    assert(after1 < before1 / 10,
      s"compaction shrinks the file count ($before1 -> $after1)")

    writeRound()
    assert(count() === 5L * Times * 2)
    spark.sql(
      s"CALL gref.system.rewrite_data_files('cmp.t1', ${100L * 1024 * 1024})")
    assert(count() === 5L * Times * 2, "second cycle preserves rows")
    assert(liveDataFiles() < before1 / 10)
    typed.unpersist()
  }
}
