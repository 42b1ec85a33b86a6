package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** File-pruning unit tests: transform-predicate derivation and
  * column-bounds evaluation. */
class PruneEvalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val schema = IceSchema(0, List(
    IceField(1, "id", required = true, IcePrim("long")),
    IceField(2, "name", required = false, IcePrim("string")),
    IceField(3, "ts", required = false, IcePrim("timestamptz"))))

  private def file(
      partition: Seq[Option[Any]],
      lower: Map[Int, Array[Byte]] = Map.empty,
      upper: Map[Int, Array[Byte]] = Map.empty) =
    IceDataFile(0, "/f.parquet", "parquet", partition, 10L, 100L,
      lowerBounds = lower, upperBounds = upper)

  test("bucket partition: equality prunes, ranges keep") {
    val spec = IcePartitionSpec(0, List(IcePartitionField(1, 1000, "bucket[16]", "id_bucket")))
    val b = graft.functions.TransformUtil.bucketLong(42L, 16)
    val hit = file(Seq(Some(b)))
    val miss = file(Seq(Some((b + 1) % 16)))
    def prune(f: IceDataFile, c: org.apache.spark.sql.Column) =
      PruneEval.prune(Seq((f, 1L)), Some(c), spec, schema).nonEmpty
    assert(prune(hit, col("id") === 42L))
    assert(!prune(miss, col("id") === 42L))
    // bucket is not monotone: range predicates must keep every file
    assert(prune(miss, col("id") > 42L))
  }

  test("month partition: range predicates prune by transform value") {
    val spec = IcePartitionSpec(0, List(IcePartitionField(3, 1000, "month", "ts_month")))
    val jan97 = file(Seq(Some(27 * 12 + 0))) // 1997-01 = 324 months since epoch
    val dec99 = file(Seq(Some(29 * 12 + 11)))
    val flt = col("ts") >= lit(java.sql.Timestamp.valueOf("1997-01-15 00:00:00")) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("1997-03-01 00:00:00"))
    val kept = PruneEval.prune(Seq((jan97, 1L), (dec99, 1L)), Some(flt), spec, schema)
    assert(kept.map(_._1) === Seq(jan97))
  }

  test("column bounds prune without any partition spec") {
    val spec = IcePartitionSpec(0, Nil)
    val lowIds = file(Nil,
      lower = Map(1 -> SingleValue.encode(IcePrim("long"), 0L)),
      upper = Map(1 -> SingleValue.encode(IcePrim("long"), 99L)))
    val highIds = file(Nil,
      lower = Map(1 -> SingleValue.encode(IcePrim("long"), 1000L)),
      upper = Map(1 -> SingleValue.encode(IcePrim("long"), 1999L)))
    val kept = PruneEval.prune(
      Seq((lowIds, 1L), (highIds, 1L)), Some(col("id") < 50L), spec, schema)
    assert(kept.map(_._1) === Seq(lowIds))
    val eq = PruneEval.prune(
      Seq((lowIds, 1L), (highIds, 1L)), Some(col("id") === 1500L), spec, schema)
    assert(eq.map(_._1) === Seq(highIds))
  }

  test("string bounds prune equality and ranges") {
    val spec = IcePartitionSpec(0, Nil)
    val ab = file(Nil,
      lower = Map(2 -> SingleValue.encode(IcePrim("string"), "aaa")),
      upper = Map(2 -> SingleValue.encode(IcePrim("string"), "bzz")))
    val xy = file(Nil,
      lower = Map(2 -> SingleValue.encode(IcePrim("string"), "x")),
      upper = Map(2 -> SingleValue.encode(IcePrim("string"), "z")))
    val kept = PruneEval.prune(
      Seq((ab, 1L), (xy, 1L)), Some(col("name") === "apple"), spec, schema)
    assert(kept.map(_._1) === Seq(ab))
  }

  test("decimal partitions prune: identity, truncate, bucket") {
    val decSchema = IceSchema(0, List(
      IceField(1, "d", required = false, IceDecimal(36, 10))))
    def bd(s: String) = new java.math.BigDecimal(s).setScale(10)
    def prune(spec: IcePartitionSpec, pv: java.math.BigDecimal,
        c: org.apache.spark.sql.Column) =
      PruneEval.prune(Seq((file(Seq(Some(pv))), 1L)), Some(c), spec, decSchema).nonEmpty
    // identity: exact value comparison (scale-insensitive via numeric cmp)
    val idSpec = IcePartitionSpec(0, List(IcePartitionField(1, 1000, "identity", "d_p")))
    assert(prune(idSpec, bd("389.1111"), col("d") === new java.math.BigDecimal("389.1111")))
    assert(!prune(idSpec, bd("389.2222"), col("d") === new java.math.BigDecimal("389.1111")))
    assert(prune(idSpec, bd("389.2222"), col("d") > new java.math.BigDecimal("389.1111")))
    assert(!prune(idSpec, bd("1.0"), col("d") > new java.math.BigDecimal("389.1111")))
    // truncate[40]: the literal rescales to the column scale before the
    // unscaled floor-mod, so equality on any member of the bucket hits
    val trSpec = IcePartitionSpec(0, List(IcePartitionField(1, 1000, "truncate[40]", "d_t")))
    val pv = graft.functions.TransformUtil
      .truncateDecimal(org.apache.spark.sql.types.Decimal(bd("389.1111")), 40)
      .toJavaBigDecimal
    assert(prune(trSpec, pv, col("d") === new java.math.BigDecimal("389.1111")))
    assert(!prune(trSpec, pv, col("d") === new java.math.BigDecimal("123.4567")))
    // bucket[16]: equality prunes to the hashed cell, ranges keep
    val buSpec = IcePartitionSpec(0, List(IcePartitionField(1, 1000, "bucket[16]", "d_b")))
    val cell = graft.functions.TransformUtil
      .bucketDecimal(org.apache.spark.sql.types.Decimal(bd("389.1111")), 16)
    def pruneCell(c: Int, lit: String) =
      PruneEval.prune(Seq((file(Seq(Some(c))), 1L)),
        Some(col("d") === new java.math.BigDecimal(lit)), buSpec, decSchema).nonEmpty
    assert(pruneCell(cell, "389.1111"))
    assert(!pruneCell((cell + 1) % 16, "389.1111"))
  }

  test("strict float/double proofs require a recorded ZERO NaN count") {
    // NaN rows are excluded from bounds but match no predicate: a bounds
    // "proof" over a NaN-containing file would metadata-delete rows that
    // do not satisfy the predicate. Missing counts are equally unsafe.
    val fSchema = IceSchema(0, List(IceField(1, "x", required = false, IcePrim("double"))))
    val spec = IcePartitionSpec(0, Nil)
    def f(nan: Option[Long]) = IceDataFile(0, "/f.parquet", "parquet", Nil, 10L, 100L,
      nullValueCounts = Map(1 -> 0L),
      nanValueCounts = nan.map(1 -> _).toMap,
      lowerBounds = Map(1 -> SingleValue.encode(IcePrim("double"), 1.0)),
      upperBounds = Map(1 -> SingleValue.encode(IcePrim("double"), 5.0)))
    val expr = org.apache.spark.sql.GraftBridge.catalystExpression(col("x") < 10.0)
    assert(!PruneEval.strictMatch(expr, f(None), spec, fSchema), "missing NaN count is unsafe")
    assert(!PruneEval.strictMatch(expr, f(Some(2L)), spec, fSchema), "NaN rows present")
    assert(PruneEval.strictMatch(expr, f(Some(0L)), spec, fSchema))
    // the may-match side stays conservative and keeps the file
    assert(PruneEval.mayMatch(expr, f(None), spec, fSchema))
  }

  test("timestamp string literals keep sub-millisecond precision") {
    val spec = IcePartitionSpec(0, Nil)
    // all rows between 500µs and 900µs after epoch
    val f = file(Nil,
      lower = Map(3 -> SingleValue.encode(IcePrim("timestamptz"), 500L)),
      upper = Map(3 -> SingleValue.encode(IcePrim("timestamptz"), 900L)))
      .copy(nullValueCounts = Map(3 -> 0L))
    // strict: ts > 00:00:00.000999 must NOT be proved (a millis-truncated
    // literal of 0µs would "prove" it and delete non-matching rows)
    val gt = org.apache.spark.sql.GraftBridge.catalystExpression(
      col("ts") > lit("1970-01-01 00:00:00.000999"))
    assert(!PruneEval.strictMatch(gt, f, spec, schema))
    // may: equality at 00:00:00.000500 must keep the file (truncation to
    // 0µs would prune it even though rows at 500µs match)
    val eq = org.apache.spark.sql.GraftBridge.catalystExpression(
      col("ts") === lit("1970-01-01 00:00:00.000500"))
    assert(PruneEval.mayMatch(eq, f, spec, schema))
    // and a provable strict case still proves
    val gt0 = org.apache.spark.sql.GraftBridge.catalystExpression(
      col("ts") > lit("1970-01-01 00:00:00.000000"))
    assert(PruneEval.strictMatch(gt0, f, spec, schema))
  }

  test("strict decimal equality compares beyond double precision") {
    val decSchema = IceSchema(0, List(
      IceField(1, "d", required = true, IceDecimal(38, 0))))
    val spec = IcePartitionSpec(0, List(IcePartitionField(1, 1000, "identity", "d_p")))
    val pv = new java.math.BigDecimal("99999999999999999999")
    val f = file(Seq(Some(pv)))
    def eq(s: String) = org.apache.spark.sql.GraftBridge.catalystExpression(
      col("d") === lit(new java.math.BigDecimal(s)))
    // differs only in the last digit — doubleValue collapses both to the
    // same IEEE double; an exact compare must distinguish them
    assert(!PruneEval.strictMatch(eq("99999999999999999998"), f, spec, decSchema))
    assert(PruneEval.strictMatch(eq("99999999999999999999"), f, spec, decSchema))
  }

  test("unknown predicates keep all files (conservative)") {
    val spec = IcePartitionSpec(0, Nil)
    val f = file(Nil)
    assert(PruneEval.prune(
      Seq((f, 1L)), Some(length(col("name")) > 3), spec, schema).nonEmpty)
    assert(PruneEval.prune(
      Seq((f, 1L)), Some(col("name").isNull), spec, schema).nonEmpty)
  }
}
