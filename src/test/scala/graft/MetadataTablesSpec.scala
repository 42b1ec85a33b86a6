package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL metadata views: `SELECT * FROM graft.db.t.snapshots|history|refs|
  * manifests|files|partitions`. */
class MetadataTablesSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-meta-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gmeta", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gmeta.warehouse", wh)
    s
  }

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.db")
    spark.sql("DROP TABLE IF EXISTS gmeta.db.mt")
    spark.sql(
      "CREATE TABLE gmeta.db.mt (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO gmeta.db.mt VALUES (1,'a'),(2,'a'),(3,'b')")
    spark.sql("INSERT INTO gmeta.db.mt VALUES (4,'b'),(5,'c')")
    spark.sql("DELETE FROM gmeta.db.mt WHERE id = 2")
  }

  test("snapshots / history / refs / manifests views") {
    setup()
    val snaps = spark.sql(
      "SELECT operation, sequence_number, CAST(summary['total-records'] AS BIGINT) tr " +
        "FROM gmeta.db.mt.snapshots ORDER BY sequence_number").collect()
    assert(snaps.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("append", 1L, 3L), ("append", 2L, 5L), ("delete", 3L, 5L)))

    val hist = spark.sql("SELECT is_current_ancestor FROM gmeta.db.mt.history").collect()
    assert(hist.length === 3 && hist.forall(_.getBoolean(0)))

    val refs = spark.sql("SELECT name, type FROM gmeta.db.mt.refs").collect()
    assert(refs.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("main", "BRANCH")))

    val mans = spark.sql(
      "SELECT content, added_rows_count FROM gmeta.db.mt.manifests").collect()
    // 2 data manifests (3+2 rows) and 1 delete manifest (1 pos-delete row)
    assert(mans.count(_.getInt(0) == 0) === 2)
    assert(mans.filter(_.getInt(0) == 0).map(_.getLong(1)).sum === 5L)
    assert(mans.count(_.getInt(0) == 1) === 1)
  }

  test("files and partitions views") {
    setup()
    val byPart = spark.sql(
      "SELECT partition.cat, sum(record_count) rc FROM gmeta.db.mt.files " +
        "WHERE content = 0 GROUP BY 1 ORDER BY 1").collect()
    assert(byPart.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 2L), ("b", 2L), ("c", 1L)))
    // the pos-delete file appears with content=1
    val del = spark.sql(
      "SELECT sum(record_count) FROM gmeta.db.mt.files WHERE content = 1").collect()
    assert(del.head.getLong(0) === 1L)

    val parts = spark.sql(
      "SELECT partition.cat, record_count, file_count FROM gmeta.db.mt.partitions " +
        "ORDER BY 1").collect()
    assert(parts.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 2L), ("b", 2L), ("c", 1L)))
    assert(parts.forall(_.getLong(2) >= 1L))

    // files schema exposes real per-column stats maps
    val stats = spark.sql(
      "SELECT file_path, value_counts, lower_bounds FROM gmeta.db.mt.files LIMIT 1").collect()
    assert(stats.head.getAs[Map[Int, Long]](1).nonEmpty)
  }

  test("data_files/delete_files split the files view by content") {
    setup()
    val data = spark.sql(
      "SELECT content, record_count FROM gmeta.db.mt.data_files").collect()
    assert(data.nonEmpty && data.forall(_.getInt(0) === 0))
    assert(data.map(_.getLong(1)).sum === 5L)
    val dels = spark.sql(
      "SELECT content, record_count FROM gmeta.db.mt.delete_files").collect()
    assert(dels.nonEmpty && dels.forall(_.getInt(0) !== 0))
    assert(dels.map(_.getLong(1)).sum === 1L)
    // the split views partition `files` exactly
    val all = spark.sql("SELECT count(*) FROM gmeta.db.mt.files").head.getLong(0)
    assert(data.length + dels.length === all)
    // all_-prefixed variants union every snapshot's manifests
    val allData = spark.sql(
      "SELECT content FROM gmeta.db.mt.all_data_files").collect()
    assert(allData.length >= data.length && allData.forall(_.getInt(0) === 0))
  }

  test("entries view shows every manifest entry with status bookkeeping") {
    setup()
    val entries = spark.sql(
      "SELECT status, content, record_count FROM gmeta.db.mt.entries").collect()
    // all files of the current snapshot appear; statuses are valid
    assert(entries.nonEmpty)
    assert(entries.forall(r => Set(0, 1, 2).contains(r.getInt(0))))
    // the pos-delete file is an entry too (content != 0)
    assert(entries.exists(_.getInt(1) != 0))
    // live data entries match the files view exactly
    val liveData = spark.sql(
      "SELECT count(*) FROM gmeta.db.mt.entries WHERE status <> 2 AND content = 0")
      .collect().head.getLong(0)
    val files = spark.sql(
      "SELECT count(*) FROM gmeta.db.mt.files WHERE content = 0").collect().head.getLong(0)
    assert(liveData === files)
    // partition tuple rides along
    val cats = spark.sql(
      "SELECT DISTINCT partition.cat FROM gmeta.db.mt.entries WHERE content = 0")
      .collect().map(_.getString(0)).toSet
    assert(cats === Set("a", "b", "c"))
  }

  test("metadata_log_entries tracks past metadata files plus the current one") {
    setup()
    // is_current tie-breaks same-millisecond commits deterministically
    val rows = spark.sql(
      "SELECT file, is_current FROM gmeta.db.mt.metadata_log_entries " +
        "ORDER BY timestamp, is_current").collect()
    // 3 commits: create(v1) -> insert(v2) -> insert(v3) -> delete(v4);
    // the log holds the past files, the final row is the current one
    assert(rows.length >= 2)
    assert(rows.count(_.getBoolean(1)) === 1)
    assert(rows.last.getBoolean(1))
    assert(rows.last.getString(0).endsWith(".metadata.json"))
    // every listed past file actually exists on disk
    val conf = spark.sparkContext.hadoopConfiguration
    rows.foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r.getString(0))
      assert(p.getFileSystem(conf).exists(p), s"missing ${r.getString(0)}")
    }
  }

  test("multi-field partition tuples survive the files/partitions views") {
    // regression: a List fed to the Catalyst struct converter takes the
    // Product path (:: has productArity 2) and corrupts field 2
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.db")
    spark.sql("DROP TABLE IF EXISTS gmeta.db.mt2")
    spark.sql(
      "CREATE TABLE gmeta.db.mt2 (id BIGINT, cat STRING, n INT) PARTITIONED BY (cat, n)")
    spark.sql("INSERT INTO gmeta.db.mt2 VALUES (1,'a',10),(2,'a',20),(3,'b',10)")
    val parts = spark.sql(
      "SELECT partition.cat, partition.n, record_count FROM gmeta.db.mt2.partitions " +
        "ORDER BY 1, 2").collect()
    assert(parts.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq(("a", 10, 1L), ("a", 20, 1L), ("b", 10, 1L)))
    val files = spark.sql(
      "SELECT partition.cat, partition.n, sum(record_count) rc " +
        "FROM gmeta.db.mt2.files GROUP BY 1, 2 ORDER BY 1, 2").collect()
    assert(files.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq(("a", 10, 1L), ("a", 20, 1L), ("b", 10, 1L)))
  }

  test("partitions view: distributed rollup equals the driver fold") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.db")
    spark.sql("DROP TABLE IF EXISTS gmeta.db.mt4")
    spark.sql(
      "CREATE TABLE gmeta.db.mt4 (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    // several commits -> several manifests; a delete so liveness matters
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gmeta.db.mt4 VALUES ($i,'a'),(${i + 10},'b')")
    }
    spark.sql("DELETE FROM gmeta.db.mt4 WHERE id = 1")
    def rows() = spark.sql(
      "SELECT partition.cat, record_count, file_count FROM gmeta.db.mt4.partitions " +
        "ORDER BY 1").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val driver = rows()
    spark.conf.set("spark.graft.partitions-rollup-distributed-min", "0")
    try {
      val dist = rows()
      assert(dist === driver)
      assert(driver.map(x => (x._1, x._2)) === Seq(("a", 3L), ("b", 4L)))
    } finally spark.conf.unset("spark.graft.partitions-rollup-distributed-min")
  }

  test("readable_metrics decodes per-file bounds into column types") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.db")
    spark.sql("DROP TABLE IF EXISTS gmeta.db.mt3")
    spark.sql(
      """CREATE TABLE gmeta.db.mt3 (
        |  id BIGINT, price DECIMAL(10,2), d DATE, ts TIMESTAMP, s STRING)""".stripMargin)
    spark.sql(
      """INSERT INTO gmeta.db.mt3 VALUES
        |  (5, 12.50, DATE'2024-03-01', TIMESTAMP'2024-03-01 10:00:00', 'beta'),
        |  (1, 99.99, DATE'2023-01-15', TIMESTAMP'2023-01-15 01:30:00', 'alpha'),
        |  (9, 7.25, DATE'2025-06-30', TIMESTAMP'2025-06-30 23:59:59', NULL)""".stripMargin)
    val r = spark.sql(
      """SELECT MIN(readable_metrics.id.lower_bound),
        |  MAX(readable_metrics.id.upper_bound),
        |  MIN(readable_metrics.price.lower_bound),
        |  MAX(readable_metrics.price.upper_bound),
        |  MIN(readable_metrics.d.lower_bound), MAX(readable_metrics.d.upper_bound),
        |  MIN(readable_metrics.ts.lower_bound),
        |  SUM(readable_metrics.s.null_value_count),
        |  SUM(readable_metrics.s.value_count),
        |  SUM(readable_metrics.id.column_size)
        |FROM gmeta.db.mt3.files""".stripMargin).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === 1L && row.getLong(1) === 9L)
    assert(row.getDecimal(2) === new java.math.BigDecimal("7.25"))
    assert(row.getDecimal(3) === new java.math.BigDecimal("99.99"))
    assert(row.getDate(4).toString === "2023-01-15")
    assert(row.getDate(5).toString === "2025-06-30")
    // compare as epoch millis — Timestamp.toString renders in JVM-default tz
    assert(row.getTimestamp(6).getTime === 1673746200000L)
    assert(row.getLong(7) === 1L && row.getLong(8) === 3L)
    assert(row.getLong(9) > 0L) // column_size harvested from the footer
  }
}
