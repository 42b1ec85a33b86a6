package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

class ZOrderSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** straightforward reference: scale each dim to `bits`, interleave
    * bit b of dim i at position b*n+i */
  private def refZ(vals: Seq[Double], ranges: Seq[(Double, Double)]): Long = {
    val n = vals.size
    val bits = 63 / n
    val maxVal = (1L << bits) - 1
    val scaled = vals.zip(ranges).map { case (v, (lo, hi)) =>
      val f = math.min(1.0, math.max(0.0, (v - lo) / math.max(hi - lo, Double.MinPositiveValue)))
      (f * maxVal).toLong
    }
    var z = 0L
    for (b <- 0 until bits; i <- 0 until n)
      z |= ((scaled(i) >>> b) & 1L) << (b * n + i)
    z
  }

  test("column z-values match the reference interleave (2 and 3 dims)") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)((rng.nextInt(1000).toDouble, rng.nextDouble() * 50 - 25,
      rng.nextInt(100000).toDouble))
    val df = rows.toDF("a", "b", "c")
    val r2 = Seq((0.0, 999.0), (-25.0, 25.0))
    val z2 = df.withColumn("z", ZOrder.zvalue(Seq(
        (col("a"), DoubleType, r2(0)), (col("b"), DoubleType, r2(1)))))
      .select("a", "b", "z").as[(Double, Double, Long)].collect()
    z2.foreach { case (a, b, z) =>
      assert(z === refZ(Seq(a, b), r2), s"2-dim mismatch at ($a,$b)")
    }
    val r3 = Seq((0.0, 999.0), (-25.0, 25.0), (0.0, 99999.0))
    val z3 = df.withColumn("z", ZOrder.zvalue(Seq(
        (col("a"), DoubleType, r3(0)), (col("b"), DoubleType, r3(1)),
        (col("c"), DoubleType, r3(2)))))
      .select("a", "b", "c", "z").as[(Double, Double, Double, Long)].collect()
    z3.foreach { case (a, b, c, z) =>
      assert(z === refZ(Seq(a, b, c), r3), s"3-dim mismatch at ($a,$b,$c)")
    }
  }

  test("locality: nearby points share high-order z bits, far points do not") {
    val r = Seq((0.0, 1023.0), (0.0, 1023.0))
    def z(x: Double, y: Double): Long = {
      Seq((x, y)).toDF("x", "y")
        .select(ZOrder.zvalue(Seq(
          (col("x"), DoubleType, r(0)), (col("y"), DoubleType, r(1)))).as("z"))
        .head.getLong(0)
    }
    val close = java.lang.Long.numberOfLeadingZeros(z(100, 200) ^ z(101, 201))
    val far = java.lang.Long.numberOfLeadingZeros(z(100, 200) ^ z(900, 800))
    assert(close > far, s"close=$close far=$far")
  }

  test("rewrite ranges fold from manifest bounds — no min/max pre-scan") {
    import graft.tables._
    val conf = spark.sparkContext.hadoopConfiguration
    val d = java.nio.file.Files.createTempDirectory("graft-zmeta").toFile
    d.delete()
    val src = (1L to 2000L).map(i => (i, (i * 7 % 500).toInt, s"r$i"))
      .toDF("k", "c", "v")
    val t = StorageCatalog.createOrReplaceTable(
      conf, d.getAbsolutePath, SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, Nil))
    // two appends -> multiple files, each with footer bounds
    t.append(spark, src.filter(col("k") <= 1000))
    t.append(spark, src.filter(col("k") > 1000))
    val planned = t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
    assert(t.zRangesFromManifests(planned, Seq("k", "c")) ===
      Some(Seq((1.0, 2000.0), (0.0, 499.0))))
    // a column with no numeric curve mapping forces the fallback
    assert(t.zRangesFromManifests(planned, Seq("k", "v")) === None)
    Metrics.reset()
    t.rewriteZOrder(spark, Seq("k", "c"), targetFileSizeBytes = 16L * 1024)
    assert(Metrics.get(Metrics.ZOrderRangeScans) === 0L,
      "z-order rewrite ran a min/max pre-scan despite complete manifest bounds")
    // content identical after the metadata-ranged rewrite
    val back = t.scan(spark)
    assert(back.count() === 2000)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("z-order wins over the declared write order and clears the stamp") {
    import graft.tables._
    val conf = spark.sparkContext.hadoopConfiguration
    val d = java.nio.file.Files.createTempDirectory("graft-zvsorder").toFile
    d.delete()
    // b is a's mirror: declared-order-sorted (by a) is exactly b-descending.
    // c duplicates b so the 2-column z-curve stays monotone in b.
    val n = 1000L
    val src = (1L to n).map(i => (i, n - i, n - i)).toDF("a", "b", "c")
    val t = StorageCatalog.createOrReplaceTable(
      conf, d.getAbsolutePath, SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, Nil))
    t.setSortOrder(Seq(("a", "asc", "nulls-first")))
    t.append(spark, src)
    val orderId = t.metadata.defaultSortOrderId
    assert(t.planFiles(t.metadata.currentSnapshot.get)
      .forall(_.file.sortOrderId === Some(orderId)))
    t.rewriteZOrder(spark, Seq("b", "c"), targetFileSizeBytes = 1L << 20)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
    // rewritten files carry NO declared-order stamp (their layout is the
    // z-curve, and sorted-scan reporting must not claim otherwise)
    assert(files.forall(_.file.sortOrderId.isEmpty))
    // and the rows INSIDE a file follow the z-key (b asc), not the
    // declared order (a asc == b desc) — the regression would show rows
    // re-sorted by a
    val one = spark.read.parquet(files.head.file.filePath).select("b").collect()
      .map(_.getLong(0)).toSeq
    assert(one === one.sorted,
      "z-order rewrite output was re-sorted by the declared write order")
  }
}
