/** One-off per-query timer (default package): 3 runs per arg; report the
  * warm run3. Op-split rows (SparkEntry.timedParts) time the op only. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args; i <- 1 to 3) {
      // setup/op-split rows (streams, incremental maintenance): time the
      // OP only, mirroring Bench — setup re-runs untimed per iteration
      if (graft.SparkEntry.timedParts.contains(name)) {
        val thunk = graft.SparkEntry.timedParts(name)(spark, dir)
        val t0 = System.nanoTime()
        val n = thunk().count()
        println(s"run$i $name(op-only) rows=$n time=${(System.nanoTime()-t0)/1e9}")
      } else {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(s"run$i $name rows=$n time=${(System.nanoTime()-t0)/1e9}")
      }
    }
    spark.stop()
  }
}
