package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write row-level DML (`write.delete.mode` etc. =
  * `copy-on-write`): matched files are rewritten and swapped instead of
  * accumulating delete files — group granularity, no delete files, and
  * changelog semantics of a data-changing overwrite. */
class CowRowLevelSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-cow-wh").toFile.getAbsolutePath
    s.conf.set("spark.sql.catalog.gcow", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gcow.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcow.db")
    s
  }
  import spark.implicits._

  private def files(t: String) =
    spark.sql(s"SELECT content, file_path FROM gcow.db.$t.files").collect()
      .map(r => (r.getInt(0), r.getString(1)))

  private def freshCow(t: String, modes: String*): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS gcow.db.$t")
    val props = modes.map(m => s"'write.$m.mode' = 'copy-on-write'").mkString(", ")
    spark.sql(
      s"CREATE TABLE gcow.db.$t (id BIGINT, grp STRING, v DOUBLE) TBLPROPERTIES ($props)")
  }

  test("COW DELETE rewrites only matched files, writes no delete files") {
    freshCow("d1", "delete")
    // two single-task inserts -> two data files with disjoint id ranges
    spark.sql("INSERT INTO gcow.db.d1 SELECT /*+ REPARTITION(1) */ * FROM VALUES (1L, 'a', 1.0), (2L, 'a', 2.0), (3L, 'a', 3.0) AS v(id, grp, v)")
    spark.sql("INSERT INTO gcow.db.d1 SELECT /*+ REPARTITION(1) */ * FROM VALUES (11L, 'b', 1.0), (12L, 'b', 2.0) AS v(id, grp, v)")
    val before = files("d1")
    assert(before.length === 2 && before.forall(_._1 === 0))
    val untouched = before.map(_._2).toSet

    spark.sql("DELETE FROM gcow.db.d1 WHERE id % 2 = 1 AND id < 10")
    assert(spark.table("gcow.db.d1").orderBy("id").select("id").as[Long].collect()
      .toSeq === Seq(2L, 11L, 12L))

    val after = files("d1")
    // still zero delete files — the matched file was REWRITTEN
    assert(after.forall(_._1 === 0), s"delete files appeared: ${after.toSeq}")
    // group granularity: exactly one of the two original files (the one
    // with no matching rows) kept its exact path; the other was swapped
    assert(after.length === 2)
    assert(untouched.intersect(after.map(_._2).toSet).size === 1,
      "expected exactly the unmatched file to survive by path")
  }

  test("COW UPDATE and MERGE produce correct rows with zero delete files") {
    freshCow("u1", "update", "merge")
    spark.sql("INSERT INTO gcow.db.u1 VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0)")
    spark.sql("UPDATE gcow.db.u1 SET v = v * 10 WHERE grp = 'a'")
    assert(spark.table("gcow.db.u1").orderBy("id").select("v").as[Double].collect()
      .toSeq === Seq(10.0, 2.0, 30.0))

    Seq((2L, 222.0), (4L, 4.0)).toDF("id", "v").createOrReplaceTempView("u1_src")
    spark.sql(
      """MERGE INTO gcow.db.u1 t USING u1_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, grp, v) VALUES (s.id, 'm', s.v)""".stripMargin)
    assert(spark.table("gcow.db.u1").orderBy("id").select("id", "v").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 10.0), (2L, 222.0), (3L, 30.0), (4L, 4.0)))
    assert(files("u1").forall(_._1 === 0), "COW update/merge wrote delete files")
  }

  test("COW DELETE over existing MoR state applies carried deletes in the rewrite") {
    // table starts merge-on-read, accumulates a position delete, then
    // flips to copy-on-write: the rewrite must honor the existing delete
    spark.sql("DROP TABLE IF EXISTS gcow.db.m1")
    spark.sql("CREATE TABLE gcow.db.m1 (id BIGINT, grp STRING, v DOUBLE)")
    spark.sql("INSERT INTO gcow.db.m1 SELECT /*+ REPARTITION(1) */ * FROM VALUES (1L, 'a', 1.0), (2L, 'a', 2.0), (3L, 'a', 3.0), (4L, 'a', 4.0) AS v(id, grp, v)")
    spark.sql("DELETE FROM gcow.db.m1 WHERE id % 4 = 0") // MoR: writes a delete file
    assert(files("m1").exists(_._1 === 1), "expected a position delete file")
    spark.sql("ALTER TABLE gcow.db.m1 SET TBLPROPERTIES ('write.delete.mode' = 'copy-on-write')")
    spark.sql("DELETE FROM gcow.db.m1 WHERE id % 2 = 1")
    assert(spark.table("gcow.db.m1").select("id").as[Long].collect().toSeq === Seq(2L))
    // the rewrite swapped the data file; the old delete file may linger
    // but no NEW delete content was added and the dangling one is inert
    assert(files("m1").count(_._1 === 0) === 1)
  }

  test("changelog over a COW DELETE emits the removed rows as net deletes") {
    freshCow("c1", "delete")
    spark.sql("INSERT INTO gcow.db.c1 VALUES (1, 'a', 1.0), (2, 'a', 2.0), (3, 'b', 3.0)")
    val wh = spark.conf.get("spark.sql.catalog.gcow.warehouse")
    val tbl = tables.StorageCatalog.loadTable(
      spark.sessionState.newHadoopConf(), s"$wh/db/c1")
    val from = tbl.metadata.currentSnapshotId.get
    spark.sql("DELETE FROM gcow.db.c1 WHERE id % 2 = 1")
    val net = tbl.refresh().changes(spark, from, net = true)
      .select("id", "_change_type").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(net.toSet === Set((1L, "delete"), (3L, "delete")))
  }

  test("unconditional COW UPDATE rewrites the whole table") {
    freshCow("f1", "update")
    spark.sql("INSERT INTO gcow.db.f1 VALUES (1, 'a', 1.0)")
    spark.sql("INSERT INTO gcow.db.f1 VALUES (2, 'b', 2.0)")
    val before = files("f1").map(_._2).toSet
    spark.sql("UPDATE gcow.db.f1 SET v = 0.0")
    assert(spark.table("gcow.db.f1").select("v").as[Double].collect().toSeq.forall(_ == 0.0))
    assert(files("f1").map(_._2).toSet.intersect(before).isEmpty,
      "full-table update must replace every file")
  }

  test("unknown write mode fails loudly") {
    spark.sql("DROP TABLE IF EXISTS gcow.db.bad")
    spark.sql(
      "CREATE TABLE gcow.db.bad (id BIGINT) TBLPROPERTIES ('write.delete.mode' = 'lazy')")
    spark.sql("INSERT INTO gcow.db.bad VALUES (1)")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gcow.db.bad WHERE id % 2 = 1").collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("write modes"))
  }
}
