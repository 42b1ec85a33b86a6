package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** A filesystem scheme registered ONLY in the session conf (spark.conf,
  * not the SparkContext hadoop conf) — resolvable exactly when a code
  * path goes through GraftBridge.sessionHadoopConf. */
class SessionOnlyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftsess"
  override def getUri: java.net.URI = java.net.URI.create("graftsess:///")
}

/** Per-session hadoop conf (fs.* credentials set via spark.conf) must
  * reach EVERY metadata I/O path: catalog loads/commits and streaming
  * source planning, not just scans and writes. */
class SessionConfSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    // session-scoped only: sparkContext.hadoopConfiguration never sees it
    s.conf.set("fs.graftsess.impl", classOf[SessionOnlyFs].getName)
    s
  }
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("session conf options surface in sessionHadoopConf, not the context conf") {
    spark.conf.set("graft.test.token", "tok-123")
    val sess = org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)
    assert(sess.get("graft.test.token") === "tok-123")
    assert(spark.sparkContext.hadoopConfiguration.get("fs.graftsess.impl") === null,
      "scheme leaked into the context conf; the test would prove nothing")
  }

  test("catalog metadata I/O resolves a session-registered filesystem") {
    val wh = tmp("sesswh")
    spark.conf.set("spark.sql.catalog.gsess", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsess.warehouse", s"graftsess:$wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsess.db")
    spark.sql("CREATE TABLE gsess.db.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gsess.db.t VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT * FROM gsess.db.t").count() === 2)
    // and the files really landed under the scheme-addressed warehouse
    assert(new java.io.File(s"$wh/db/t/metadata").exists())
  }

  test("streaming source planning resolves a session-registered filesystem") {
    val loc = tmp("sessstream")
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // the table itself lives on a plain path (hadoop's RawLocalFileSystem
    // can't stat foreign-scheme URIs); only the STREAM addresses it through
    // the session-registered scheme — metadata loads in sourceSchema/
    // createSource/getBatch are the paths under test
    val t = StorageCatalog.createOrReplaceTable(
      org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark),
      loc, SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, Nil))
    t.append(spark, src)
    val out = tmp("sessout")
    val q = spark.readStream.format("graft-stream")
      .option("location", s"graftsess:$loc").load()
      .writeStream.format("memory").queryName("sess_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/ckpt").start()
    q.awaitTermination(60000)
    assert(spark.table("sess_stream").count() === 2)
  }
}
