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

  test("bench group membership: disjoint, known queries, <=12 per group") {
    val all = Bench.pipelineGroups.flatMap(_._2)
    assert(all.distinct.size === all.size, "a query appears in two bench groups")
    val unknown = all.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"bench groups reference unknown queries: $unknown")
    Bench.pipelineGroups.foreach { case (g, qs) =>
      assert(qs.size <= 12, s"bench group $g exceeds the 12-query JVM-rot bound (${qs.size})")
    }
    // the legacy/tpch curves must stay frozen (sanctioned baselines)
    assert(Bench.headline.size === 20)
    assert(Bench.tpchHeadline.size === 10)
  }
}
