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

  test("sort rewrite: file bounds tile the declared order across files") {
    import graft.tables._
    val conf = spark.sparkContext.hadoopConfiguration
    val d = java.nio.file.Files.createTempDirectory("graft-sortrw").toFile
    d.delete()
    val n = 4000L
    // id-scrambled order: every append's files span most of the k range,
    // so pre-rewrite bounds overlap heavily across files
    val src = (1L to n).map(i => ((i * 2654435761L) % n, s"r$i"))
      .toDF("k", "v")
    val t = StorageCatalog.createOrReplaceTable(
      conf, d.getAbsolutePath, SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, Nil))
    intercept[RuntimeException] { t.rewriteSorted(spark) }
    t.setSortOrder(Seq(("k", "asc", "nulls-first")))
    t.append(spark, src.filter(col("v").endsWith("1") || col("v").endsWith("2")))
    t.append(spark, src.filter(!(col("v").endsWith("1") || col("v").endsWith("2"))))
    val kField = t.metadata.currentSchema.findField("k").get
    def ranges(): Seq[(Double, Double)] = t
      .planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
      .flatMap { p =>
        for {
          lo <- p.file.lowerBounds.get(kField.id)
          hi <- p.file.upperBounds.get(kField.id)
        } yield (
          SingleValue.decode(IcePrim("long"), lo).asInstanceOf[Long].toDouble,
          SingleValue.decode(IcePrim("long"), hi).asInstanceOf[Long].toDouble)
      }.sortBy(_._1)
    val before = ranges()
    assert(before.size >= 2 &&
      before.sliding(2).exists { case Seq(a, b) => b._1 <= a._2 },
      "setup should produce overlapping file ranges")
    t.rewriteSorted(spark, targetFileSizeBytes = 16L * 1024)
    val back = t.scan(spark)
    assert(back.count() === n)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    val after = ranges()
    assert(after.size >= 3, s"expected a multi-file rewrite, got ${after.size}")
    after.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._1, s"file ranges must tile, got $a then $b")
    }
    // the declared order id is stamped — sorted-scan reporting holds
    val orderId = t.metadata.defaultSortOrderId
    assert(t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
      .forall(_.file.sortOrderId === Some(orderId)))
  }

  test("hilbert: bijective on the grid and every curve step is a unit step") {
    import graft.functions.HilbertUtil
    // 2 dims x 3 bits and 3 dims x 2 bits: every cell visited exactly
    // once and consecutive indices are Manhattan-distance-1 neighbors —
    // the defining Hilbert properties (Morton fails the second at every
    // quadrant boundary)
    for ((dims, bits) <- Seq((2, 3), (3, 2))) {
      val side = 1 << bits
      val cells = Seq.fill(dims)(0 until side).foldLeft(Seq(Seq.empty[Int])) {
        (acc, r) => acc.flatMap(p => r.map(p :+ _))
      }
      val byIndex = cells.map { c =>
        HilbertUtil.index(c.map(_.toLong).toArray, bits) -> c
      }.sortBy(_._1)
      assert(byIndex.map(_._1) === (0L until (1L << (dims * bits))),
        s"$dims-dim curve must visit every cell exactly once")
      byIndex.sliding(2).foreach { case Seq((_, a), (_, b)) =>
        val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(dist === 1, s"non-unit step $a -> $b")
      }
    }
  }

  test("hilbert expression: codegen path matches the driver kernel") {
    import graft.functions.{HilbertIndex, HilbertUtil}
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(300)((rng.nextLong() & ((1L << 31) - 1),
      rng.nextLong() & ((1L << 31) - 1)))
    val got = rows.toDF("x", "y")
      .withColumn("h", column(HilbertIndex(
        Seq(expression(col("x")), expression(col("y"))), 31)))
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h === HilbertUtil.index(Array(x, y), 31), s"mismatch at ($x,$y)")
    }
  }

  test("hilbert rewrite clusters both columns and preserves content") {
    import graft.tables._
    val conf = spark.sparkContext.hadoopConfiguration
    val d = java.nio.file.Files.createTempDirectory("graft-hilb").toFile
    d.delete()
    // k and c are independent dimensions; row order is k-sequential, so
    // pre-rewrite file bounds on c span the whole range
    val n = 4000L
    val src = (1L to n).map(i => (i, (i * 2654435761L) % 1024, s"r$i"))
      .toDF("k", "c", "v")
    val t = StorageCatalog.createOrReplaceTable(
      conf, d.getAbsolutePath, SchemaConvert.fromSparkSchema(src.schema),
      IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.rewriteHilbert(spark, Seq("k", "c"), targetFileSizeBytes = 16L * 1024)
    val back = t.scan(spark)
    assert(back.count() === n)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
      .filter(_.file.content == DataContent.Data)
    assert(files.size >= 4, s"expected a multi-file rewrite, got ${files.size}")
    // clustering evidence: the summed bounding-box area of the output
    // files is a small fraction of (#files x full area) — each file holds
    // a compact curve segment, tight in BOTH dimensions
    val kField = t.metadata.currentSchema.findField("k").get
    val cField = t.metadata.currentSchema.findField("c").get
    def widthOf(f: IceDataFile, fid: Int, full: Double): Double = {
      def dec(b: Option[Array[Byte]]) = b.map(bb =>
        SingleValue.decode(IcePrim("long"), bb).asInstanceOf[Long].toDouble)
      (for {
        lo <- dec(f.lowerBounds.get(fid))
        hi <- dec(f.upperBounds.get(fid))
      } yield (hi - lo) / full).getOrElse(1.0)
    }
    val frac = files.map(p =>
      widthOf(p.file, kField.id, n.toDouble) *
        widthOf(p.file, cField.id, 1024.0)).sum / files.size
    assert(frac < 0.45,
      s"hilbert files should be tight in both dims, mean box fraction $frac")
  }
}
