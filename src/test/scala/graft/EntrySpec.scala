package graft
import org.scalatest.funsuite.AnyFunSuite
class EntrySpec extends AnyFunSuite {
  test("driver smoke: entry answers with rows on sf0.001") {
    val df = SparkEntry.entry(TestSpark.spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(df.columns.toSeq === Seq("r_name", "order_year", "revenue", "n_lines"))
    // every query key has a function; every oracle key is a query key
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
