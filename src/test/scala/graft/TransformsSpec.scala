package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{transforms, Murmur3, TransformUtil}

/** Golden vectors from the Iceberg spec Appendix B (the same vectors the
  * reference asserts in icelake/src/types/transform/bucket.rs:152-231 and
  * truncate.rs:94-156). */
class TransformsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("murmur3 x86_32 spec vectors: hash of encoded values") {
    // int/long 34 -> 2017239379 (8-byte little-endian encoding)
    assert(TransformUtil.hashLong(34L) === 2017239379)
    // string "iceberg" -> 1210000089
    assert(Murmur3.hash("iceberg".getBytes("UTF-8"), 0) === 1210000089)
    // date 2017-11-16 = 17486 days -> -653330422
    assert(TransformUtil.hashLong(17486L) === -653330422)
    // time 22:31:08 = 81068000000 micros -> -662762989
    assert(TransformUtil.hashLong(81068000000L) === -662762989)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros -> -2047944441
    assert(TransformUtil.hashLong(1510871468000000L) === -2047944441)
    // decimal 14.20 (unscaled 1420, minimal two's complement) -> -500754589
    assert(
      TransformUtil.hashDecimal(Decimal(new java.math.BigDecimal("14.20"))) === -500754589)
    // fixed/binary 0x000102030405060708 -> truncated vector from spec:
    // bytes [0,1,2,3] -> -188683207
    assert(TransformUtil.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
    // uuid f79c3e09-677c-4bbd-a479-3f349cb785e7 hashes as its 16
    // big-endian bytes -> 1488055340 (spec Appendix B)
    assert(TransformUtil.hashUuid(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "f79c3e09-677c-4bbd-a479-3f349cb785e7")) === 1488055340)
  }

  test("uuid bucket column expression uses byte encoding, not string bytes") {
    val df = Seq("f79c3e09-677c-4bbd-a479-3f349cb785e7").toDF("u")
    val row = df.select(
      transforms.bucketUuid(16, $"u"),
      transforms.bucket(16, $"u")).head()
    assert(row.getInt(0) === (1488055340 & Int.MaxValue) % 16)
    // canonical-string hashing is a DIFFERENT (wrong for uuid) value
    assert(row.getInt(1) !== row.getInt(0))
  }

  test("bucket transform on columns matches spec semantics") {
    val df = Seq((34, 34L, "iceberg")).toDF("i", "l", "s")
    val row = df
      .select(
        transforms.bucket(16, col("i")).as("bi"),
        transforms.bucket(16, col("l")).as("bl"),
        transforms.bucket(16, col("s")).as("bs"))
      .head()
    assert(row.getInt(0) === (2017239379 & Int.MaxValue) % 16)
    assert(row.getInt(1) === (2017239379 & Int.MaxValue) % 16)
    assert(row.getInt(2) === (1210000089 & Int.MaxValue) % 16)
  }

  test("bucket preserves nulls") {
    val df = Seq[Option[Int]](Some(1), None).toDF("i")
    val got = df.select(transforms.bucket(8, col("i"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getInt(0))
    assert(got(1) === null)
  }

  test("truncate spec vectors") {
    // W=10: 1 -> 0, -1 -> -10
    assert(TransformUtil.truncateInt(1, 10) === 0)
    assert(TransformUtil.truncateInt(-1, 10) === -10)
    assert(TransformUtil.truncateLong(1L, 10L) === 0L)
    assert(TransformUtil.truncateLong(-1L, 10L) === -10L)
    // decimal W=50: 10.65 -> 10.50
    val d = TransformUtil.truncateDecimal(
      Decimal(new java.math.BigDecimal("10.65")), 50)
    assert(d.toJavaBigDecimal === new java.math.BigDecimal("10.50"))
    // string W=3: "iceberg" -> "ice" (code points, not bytes)
    assert(
      TransformUtil
        .truncateString(org.apache.spark.unsafe.types.UTF8String.fromString("iceberg"), 3)
        .toString === "ice")
  }

  test("truncate on columns") {
    val df = Seq((1, -1L, "iceberg")).toDF("i", "l", "s")
    val row = df
      .select(
        transforms.truncate(10, col("i")),
        transforms.truncate(10, col("l")),
        transforms.truncate(3, col("s")))
      .head()
    assert(row.getInt(0) === 0)
    assert(row.getLong(1) === -10L)
    assert(row.getString(2) === "ice")
  }

  test("temporal transforms: years/months/days/hours since epoch") {
    val df = Seq("2017-11-16 22:31:08").toDF("t")
      .select(col("t").cast(TimestampType).as("ts"))
    val row = df
      .select(
        transforms.yearsT(col("ts")),
        transforms.monthsT(col("ts")),
        transforms.daysT(col("ts")),
        transforms.hoursT(col("ts")))
      .head()
    assert(row.getInt(0) === 47) // 2017 - 1970
    assert(row.getInt(1) === 47 * 12 + 10) // months since 1970-01
    assert(row.getInt(2) === 17486) // days since epoch
    assert(row.getInt(3) === 17486 * 24 + 22)
  }

  test("void transform: always null, end to end through a partition spec") {
    // void is how spec evolution retires a partition field in v1 metadata:
    // rows route to the null partition, scans stay correct
    assert(Seq(1).toDF("x").select(transforms.voidT(col("x"))).head().isNullAt(0))
    val conf = spark.sparkContext.hadoopConfiguration
    val d = java.nio.file.Files.createTempDirectory("graft-void").toFile
    d.delete()
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val schema = tables.SchemaConvert.fromSparkSchema(src.schema)
    val t = tables.StorageCatalog.createOrReplaceTable(
      conf, d.getAbsolutePath, schema,
      tables.IcePartitionSpec(0, List(tables.IcePartitionField(
        schema.findField("id").get.id, 1000, "void", "id_void"))))
    t.append(spark, src)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.nonEmpty && files.forall(_.file.partition == List(None)))
    assert(t.scan(spark).count() === 2)
  }
}
