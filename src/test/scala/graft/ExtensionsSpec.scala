package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class ExtensionsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SQL functions: iceberg_bucket/truncate/simhash/lang_id via spark.sql") {
    GraftExtensions.register(spark)
    Seq((34, 34L, "iceberg")).toDF("i", "l", "s").createOrReplaceTempView("v")
    val row = spark.sql(
      """SELECT iceberg_bucket(16, i) AS bi, iceberg_bucket(16, l) AS bl,
        |  iceberg_truncate(10, i) AS ti, iceberg_truncate(3, s) AS ts,
        |  simhash64(s) AS sh, lang_id('the cat is on the mat and it is happy') AS lid
        |FROM v""".stripMargin).head()
    assert(row.getInt(0) === (2017239379 & Int.MaxValue) % 16)
    assert(row.getInt(1) === row.getInt(0))
    assert(row.getInt(2) === 30)
    assert(row.getString(3) === "ice")
    assert(row.getString(5) === "en")
  }

  test("SQL vector functions") {
    GraftExtensions.register(spark)
    Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b").createOrReplaceTempView("vv")
    val row = spark.sql(
      "SELECT cosine_similarity(a, b) AS c, dot_product(a, a) AS d, vector_norm(a) AS n FROM vv")
      .head()
    assert(math.abs(row.getDouble(0)) < 1e-12)
    assert(row.getDouble(1) === 1.0)
    assert(row.getDouble(2) === 1.0)
  }

  test("salted join matches plain join results") {
    val left = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
    val salted = SkewJoin.salted(left, right, "k", saltFactor = 8)
      .select("k", "lv", "rv")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
