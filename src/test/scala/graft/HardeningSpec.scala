package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 correctness hardening: the anisotropy kernel's widened
  * element reads (null-inside-array, non-float numeric arrays) and the
  * CC write-back's debug-gated upsert-key uniqueness assertion. */
class HardeningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.{Dedup, Profiling}

  test("anisotropy: array<double> input and in-array nulls follow the expression fold") {
    // dims=3; vector 2 carries a null in dim 1 (must skip that dim's
    // moment and every product touching it); vector 3 is SHORT (len 2 —
    // dim 3 skipped); doubles exercise the numeric-widening path that
    // previously ClassCastException'd on non-float arrays
    val rows: Seq[(Long, Seq[java.lang.Double])] = Seq(
      (1L, Seq[java.lang.Double](0.5, -0.25, 0.75)),
      (2L, Seq[java.lang.Double](1.0, null, 0.25)),
      (3L, Seq[java.lang.Double](-0.5, 0.125)))
    val df = rows.toDF("id", "v").repartition(1)
    val got = Profiling.embeddingAnisotropy(df, "v", dims = 3, topK = 100)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    // BigInt reference with SQL-sum null-skip semantics per CELL: a cell
    // (i,j) sums q_i*q_j over rows where BOTH are present; moments and n
    // likewise (n counts all rows)
    val q: Seq[Array[Option[Long]]] = rows.map { case (_, v) =>
      Array.tabulate(3)(i =>
        if (i < v.length && v(i) != null)
          Some(math.floor(v(i).doubleValue * 1024.0).toLong)
        else None)
    }
    val n = BigInt(q.size)
    val expect = (for { i <- 0 until 3; j <- i + 1 until 3 } yield {
      val s = q.flatMap(v => for (a <- v(i); b <- v(j)) yield BigInt(a) * BigInt(b)).sum
      val mi = q.flatMap(v => v(i).map(BigInt(_))).sum
      val mj = q.flatMap(v => v(j).map(BigInt(_))).sum
      val num = n * s - mi * mj
      ((i + 1).toLong, (j + 1).toLong) -> (num.signum * (num.abs / (n * n))).toLong
    }).toMap
    assert(got == expect)
  }

  test("anisotropy: array<int> input widens like the old cast-to-double expression") {
    val df = Seq(
      (1L, Seq(512, -256, 128)),
      (2L, Seq(-64, 32, 1024))).toDF("id", "v")
    val got = Profiling.embeddingAnisotropy(df, "v", dims = 3, topK = 100)
      .collect()
    assert(got.length == 3) // all 3 upper-triangle pairs reported
  }

  test("applyComponentDelta: debug flag fails loudly on a non-unique delta") {
    val labels = Seq((1L, 1L)).toDF("doc_id", "component")
    val ltbl = SparkEntry.freshTable(spark, "hardening_labels", labels)
    ltbl.append(spark, labels)
    val idx = Dedup.minhashIndex(
      Seq((1L, "some indexed document text")).toDF("doc_id", "text"),
      "doc_id", "text").join(labels, Seq("doc_id"), "left")
    val itbl = SparkEntry.freshTable(spark, "hardening_index", idx)
    itbl.append(spark, idx)
    val dupDelta = Seq((1L, 1L), (1L, 2L)).toDF("doc_id", "component")
    val emptyBatch = Dedup.minhashIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    spark.conf.set("spark.graft.debug.assert-upsert-unique", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.applyComponentDelta(spark, ltbl, itbl, dupDelta, emptyBatch)
      }
      assert(e.getMessage.contains("uniqueness"))
    } finally spark.conf.unset("spark.graft.debug.assert-upsert-unique")
  }
}
