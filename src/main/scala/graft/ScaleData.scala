package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata dir by
  * replicating each table N times with key-domain offsets, preserving
  * join integrity within every copy (each copy's orders reference that
  * copy's customers, etc.). Dimension tables that TPC-H holds constant
  * across scale factors (region, nation) are copied once.
  *
  * Used for the sf1 scaling diagnostic: `BENCH` at 10x data built from
  * sf0.1, catching constant factors and super-linear plans that hide at
  * the stock scale. Usage:
  *
  *   runMain graft.ScaleData /root/testdata/sf0.1 /tmp/sf1 10
  */
object ScaleData {

  /** key columns to shift per copy, per table */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Nil,
    "region" -> Nil)

  /** stride between copies' key domains — far above any generated key */
  private val Step = 1L << 32

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcDir> <outDir> <copies>")
    val Array(src, out, copiesStr) = args
    val copies = copiesStr.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts is TIMESTAMP(NANOS): read nanos as long and write the
    // long back — SparkEntry's loader divides to micros either way
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    keyCols.foreach { case (tbl, keys) =>
      val df = spark.read.parquet(s"$src/$tbl.parquet")
      // the 2^32 copy stride needs 64-bit keys; a narrower key column
      // would silently widen to BIGINT (schema divergence from the stock
      // dir) or overflow — refuse loudly instead
      keys.foreach(k => require(
        df.schema(k).dataType == org.apache.spark.sql.types.LongType,
        s"$tbl.$k must be BIGINT for key-domain shifting, got ${df.schema(k).dataType}"))
      val scaled =
        if (keys.isEmpty) df
        else (0 until copies).map { i =>
          keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Step)))
        }.reduce(_.unionByName(_))
      scaled.write.mode("overwrite").parquet(s"$out/$tbl.parquet")
      System.err.println(s"[scale] $tbl: ${scaled.count()} rows")
    }
    spark.stop()
  }
}
