package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.transforms
import graft.tables._

/** Iceberg v3 nanosecond timestamps (`timestamp_ns` / `timestamptz_ns`):
  * Spark has no ns-precision timestamp, so they ride a LongType carrier
  * (nanos since epoch) flagged through SchemaConvert.GraftTypeKey — the
  * same treatment `time` gets. Covers schema round-trip, the v3 gate,
  * day-transform partition routing (incl. pre-1970 floor semantics),
  * metadata pruning on partition values and on file bounds, and the
  * exactness of the long-floorDiv transform columns past 2^53 (where a
  * double division would corrupt the value). */
class TimestampNsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-test/tsns/$name-${System.nanoTime()}"

  private val Day = 86400000000000L // ns

  private def nsSchema = IceSchema(0, List(
    IceField(1, "id", required = true, IcePrim("long")),
    IceField(2, "ts_ns", required = false, IcePrim("timestamp_ns")),
    IceField(3, "tstz_ns", required = false, IcePrim("timestamptz_ns"))))

  test("schema mapping round-trips ns timestamps and gates them on v3") {
    val sp = SchemaConvert.toSparkSchema(nsSchema)
    assert(sp("ts_ns").dataType === LongType)
    assert(sp("tstz_ns").dataType === LongType)
    val back = SchemaConvert.fromSparkSchema(sp)
    assert(back.findField("ts_ns").get.fieldType === IcePrim("timestamp_ns"))
    assert(back.findField("tstz_ns").get.fieldType === IcePrim("timestamptz_ns"))
    assert(nsSchema.usesV3Types && !nsSchema.usesVariant)

    val e = intercept[IllegalArgumentException] {
      StorageCatalog.createOrReplaceTable(
        conf, tmp("v2refuse"), nsSchema, IcePartitionSpec(0, Nil), formatVersion = 2)
    }
    assert(e.getMessage.contains("format-version 3"))
  }

  test("ns transform columns are exact past 2^53 and floor pre-1970") {
    // 4102444800000000000 ns = 2100-01-01, far beyond double's 2^53;
    // -1 ns must floor to day -1 / hour -1 / year -1 (1969-12-31)
    // Long.MinValue + 999 probes the decimal-domain subtraction: long
    // `c - pmod(c,d)` would underflow there and route to a garbage day
    val vals = Seq(-1L, 0L, Day - 1, Day, -2 * Day + 1, 4102444800000000000L,
      Long.MinValue + 999L, Long.MaxValue)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ns", LongType))))
    val got = df.select(
        col("ns"),
        transforms.daysNsT(col("ns")).as("d"),
        transforms.hoursNsT(col("ns")).as("h"),
        transforms.yearsNsT(col("ns")).as("y"),
        transforms.monthsNsT(col("ns")).as("m"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    for (v <- vals) {
      val us = Math.floorDiv(v, 1000L)
      val d = Math.floorDiv(us, 86400000000L)
      val date = java.time.LocalDate.ofEpochDay(d)
      val expect = (d.toInt, Math.floorDiv(us, 3600000000L).toInt,
        date.getYear - 1970, (date.getYear - 1970) * 12 + date.getMonthValue - 1)
      assert(got(v) === expect, s"transforms of $v")
    }
  }

  test("day-partitioned ns table: routing, scan-back, partition pruning") {
    import spark.implicits._
    // days -2..7, sub-second jitter inside each day (positive offset keeps
    // negative-day values inside their day under floor semantics)
    val src = spark.range(0, 1000).select(
      col("id"),
      ((col("id") % 10 - 2) * Day + col("id") * 1234567L).as("ts_ns"),
      (col("id") * 1000000L).as("tstz_ns"))
    val spec = IcePartitionSpec(0, List(IcePartitionField(2, 1000, "day", "ts_day")))
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmp("daypart"), nsSchema, spec, formatVersion = 3)
    t.append(spark, src)

    val files = t.planFiles(t.metadata.currentSnapshot.get)
    val days = files.flatMap(_.file.partition.head).toSet
    assert(days === (-2 to 7).map(d => d: Any).toSet)

    val back = t.scan(spark).select("id", "ts_ns", "tstz_ns")
    assert(back.count() === 1000)
    assert(back.exceptAll(src).isEmpty)

    // metadata pruning on the partition transform: >= day 3 (long literal)
    def prunedBy(flt: org.apache.spark.sql.Column) = PruneEval.prunePlanned(
      t.planFiles(t.metadata.currentSnapshot.get), Some(flt),
      t.metadata, t.metadata.currentSchema)
    val flt = col("ts_ns") >= lit(3L * Day)
    val pruned = prunedBy(flt)
    assert(pruned.nonEmpty && pruned.size < files.size,
      s"pruning ineffective: ${pruned.size} of ${files.size}")
    assert(pruned.flatMap(_.file.partition.head).forall(_.asInstanceOf[Int] >= 3))
    val got = t.scan(spark, filter = Some(flt))
    assert(got.count() === src.filter(col("ts_ns") >= lit(3L * Day)).count())

    // string timestamp literal adapts to nanos for partition pruning
    val sPruned = prunedBy(col("ts_ns") >= lit("1970-01-04"))
    assert(sPruned.flatMap(_.file.partition.head).forall(_.asInstanceOf[Int] >= 3))
    assert(sPruned.map(_.file.filePath).toSet === pruned.map(_.file.filePath).toSet)
  }

  test("unpartitioned ns table prunes by file bounds; avro format carries ns") {
    import spark.implicits._
    val src = spark.range(0, 400).select(
      col("id"), (col("id") * lit(Day / 4)).as("ts_ns"), col("id").as("tstz_ns"))
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmp("bounds"), nsSchema, IcePartitionSpec(0, Nil),
      properties = Map("write.max-records-per-file" -> "50"),
      formatVersion = 3)
    t.append(spark, src.repartition(1).sortWithinPartitions("ts_ns"))

    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.size > 1)
    // long bounds recorded and decodable
    val tsId = 2
    assert(files.forall(f => f.file.lowerBounds.contains(tsId)))
    val cut = 350L * (Day / 4)
    val flt = col("ts_ns") > lit(cut)
    val pruned = PruneEval.prunePlanned(files, Some(flt), t.metadata,
      t.metadata.currentSchema)
    assert(pruned.size < files.size,
      s"bounds pruning ineffective: ${pruned.size} of ${files.size}")
    assert(t.scan(spark, filter = Some(flt)).count() ===
      src.filter(col("ts_ns") > lit(cut)).count())

    // avro data files: schema maps to long + timestamp-nanos logical type
    val ta = StorageCatalog.createOrReplaceTable(
      conf, tmp("avro"), nsSchema, IcePartitionSpec(0, Nil),
      properties = Map("write.format.default" -> "avro"),
      formatVersion = 3)
    val srcA = src.filter(col("id") < 100)
    ta.append(spark, srcA)
    val backA = ta.scan(spark).select("id", "ts_ns", "tstz_ns")
    assert(backA.count() === 100)
    assert(backA.exceptAll(srcA).isEmpty)
  }

  test("ns column works as an upsert key and in MoR deletes") {
    import spark.implicits._
    val src = spark.range(0, 200).select(
      col("id"), (col("id") * lit(Day / 24)).as("ts_ns"), col("id").as("tstz_ns"))
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmp("mor"), nsSchema, IcePartitionSpec(0, Nil), formatVersion = 3)
    t.append(spark, src)
    // equality delete keyed on the ns carrier (plain long equality)
    t.equalityDelete(spark, Seq(5L * (Day / 24), 7L * (Day / 24)).toDF("ts_ns"), Seq("ts_ns"))
    // upsert: same key column — replaces id 10's row, adds id 1000
    t.upsert(spark, Seq(
      (10L, 10L * (Day / 24), 999L),
      (1000L, 1000L * (Day / 24), 1L)).toDF("id", "ts_ns", "tstz_ns"), Seq("ts_ns"))
    val out = t.scan(spark).select("id", "ts_ns", "tstz_ns").as[(Long, Long, Long)]
      .collect().map(r => r._2 -> ((r._1, r._3))).toMap
    assert(out.size === 199) // 200 - 2 deleted + 1 inserted
    assert(!out.contains(5L * (Day / 24)) && !out.contains(7L * (Day / 24)))
    assert(out(10L * (Day / 24)) === ((10L, 999L)))
    assert(out(1000L * (Day / 24)) === ((1000L, 1L)))
  }

  test("manifest-level pruning adapts ns string literals") {
    // one manifest whose ts_day summary spans days 0..4: a predicate past
    // day 9 (as a STRING timestamp literal) must skip the whole manifest
    val spec = IcePartitionSpec(0, List(IcePartitionField(2, 1000, "day", "ts_day")))
    val summaries = Seq(IceFieldSummary(
      containsNull = false,
      lowerBound = Some(SingleValue.encode(IcePrim("int"), 0)),
      upperBound = Some(SingleValue.encode(IcePrim("int"), 4))))
    def expr(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.catalystExpression(c)
    assert(!PruneEval.manifestMayMatch(
      expr(col("ts_ns") >= lit("1970-01-10")), summaries, spec, nsSchema))
    assert(PruneEval.manifestMayMatch(
      expr(col("ts_ns") >= lit("1970-01-03")), summaries, spec, nsSchema))
  }

  test("metadata json round-trips ns types on reload") {
    val loc = tmp("reload")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, nsSchema, IcePartitionSpec(0, Nil), formatVersion = 3)
    import spark.implicits._
    t.append(spark, Seq((1L, 10L, 20L)).toDF("id", "ts_ns", "tstz_ns"))
    val re = StorageCatalog.loadTable(conf, loc)
    assert(re.metadata.currentSchema.findField("ts_ns").get.fieldType ===
      IcePrim("timestamp_ns"))
    assert(re.scan(spark).select("ts_ns").as[Long].collect().toSeq === Seq(10L))
  }

  test("parquet footers carry TIMESTAMP(NANOS) annotations for cross-engine readers") {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import spark.implicits._
    val src = spark.range(0, 100).select(
      col("id"), (col("id") * 1000L + Long.MaxValue / 2).as("ts_ns"),
      (col("id") * 7L).as("tstz_ns"))
    val t = StorageCatalog.createOrReplaceTable(
      conf, tmp("footer"), nsSchema, IcePartitionSpec(0, Nil), formatVersion = 3)
    t.append(spark, src)
    val files = t.planFiles(t.metadata.currentSnapshot.get)
    assert(files.nonEmpty)
    files.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.file.filePath), conf))
      val schema = try reader.getFooter.getFileMetaData.getSchema finally reader.close()
      def ann(name: String) = schema.getFields.get(schema.getFieldIndex(name)).asPrimitiveType()
        .getLogicalTypeAnnotation.asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
      assert(ann("ts_ns").getUnit === LogicalTypeAnnotation.TimeUnit.NANOS)
      assert(!ann("ts_ns").isAdjustedToUTC)
      assert(ann("tstz_ns").getUnit === LogicalTypeAnnotation.TimeUnit.NANOS)
      assert(ann("tstz_ns").isAdjustedToUTC)
      // field ids survive the restamp (id resolution must keep working)
      assert(schema.getFields.get(schema.getFieldIndex("ts_ns")).getId.intValue() === 2)
    }
    // the stamped files read back exactly (values past 2^53 intact)
    val back = t.scan(spark).select("id", "ts_ns", "tstz_ns")
    assert(back.count() === 100)
    assert(back.exceptAll(src).isEmpty)
    // and MoR delete state still applies above stamped files
    t.deleteWhere(spark, col("id") < 10L)
    assert(t.scan(spark).count() === 90)
  }
}
