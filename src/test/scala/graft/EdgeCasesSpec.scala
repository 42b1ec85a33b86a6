package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Edge-case combinations: partitioned MoR, stacked delete types, empty
  * inputs, repeated operations. */
class EdgeCasesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLocation(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("upsert on a partitioned table") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SchemaConvert.fromSparkSchema(src.schema)
    val spec = IcePartitionSpec(0, List(IcePartitionField(
      schema.findField("o_orderdate").get.id, 1000, "year", "order_year")))
    val loc = tmpLocation("part-upsert")
    val t = StorageCatalog.createOrReplaceTable(conf, loc, schema, spec)
    t.append(spark, src)
    val changed = src.filter(pmod($"o_orderkey", lit(5)) === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 10.0)
    t.upsert(spark, changed, Seq("o_orderkey"))
    val back = t.scan(spark)
    val exp = src.withColumn("o_totalprice",
      when(pmod($"o_orderkey", lit(5)) === 0, $"o_totalprice" + 10.0)
        .otherwise($"o_totalprice"))
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
    // pruned scan still correct under MoR
    val flt = $"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val got = t.scan(spark, filter = Some(flt))
    assert(got.exceptAll(exp.filter(flt)).isEmpty)
  }

  test("position and equality deletes stack on the same table") {
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val loc = tmpLocation("stacked")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    // equality-delete status F, then position-delete keys %10==0 of the rest
    t.equalityDelete(spark,
      src.filter($"o_orderstatus" === "F").select($"o_orderkey"), Seq("o_orderkey"))
    val pos = t.scan(spark, keepFilePos = true)
      .filter(pmod($"o_orderkey", lit(10)) === 0)
      .select($"_file".as("file_path"), $"_pos".as("pos"))
    t.positionDelete(spark, pos)
    val back = t.scan(spark)
    val exp = src.filter($"o_orderstatus" =!= "F" && pmod($"o_orderkey", lit(10)) =!= 0)
    assert(back.count() === exp.count())
    assert(back.exceptAll(exp).isEmpty)
  }

  test("empty append and empty upsert are harmless") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("empty")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.append(spark, src.limit(0))
    t.upsert(spark, src.limit(0), Seq("r_regionkey"))
    assert(t.scan(spark).count() === src.count())
    // scanning a never-written table yields empty with the right schema
    val loc2 = tmpLocation("never")
    val t2 = StorageCatalog.createOrReplaceTable(
      conf, loc2, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    val empty = t2.scan(spark)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === src.columns.toSeq)
  }

  test("repeated upserts converge to the last write") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("repeat")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    (1 to 3).foreach { i =>
      t.upsert(spark,
        src.withColumn("r_name", concat($"r_name", lit(s"_v$i"))),
        Seq("r_regionkey"))
    }
    val names = t.scan(spark).select("r_name").as[String].collect()
    assert(names.length === src.count())
    assert(names.forall(_.endsWith("_v3")))
  }

  test("delete of keys that do not exist changes nothing") {
    val src = spark.read.parquet(s"$sfDir/region.parquet")
    val loc = tmpLocation("noop-del")
    val t = StorageCatalog.createOrReplaceTable(
      conf, loc, SchemaConvert.fromSparkSchema(src.schema), IcePartitionSpec(0, Nil))
    t.append(spark, src)
    t.equalityDelete(spark, Seq(99999).toDF("r_regionkey"), Seq("r_regionkey"))
    assert(t.scan(spark).count() === src.count())
  }

  test("round-11 operators: degenerate inputs neither crash nor fabricate rows") {
    import graft.operators.{Dedup, Graph, Profiling, Similarity}

    // pagerank: single self-loop node keeps all mass; singleton edge
    // list with a dangling target still emits both nodes
    val selfLoop = Graph.pageRank(
      Seq((7L, 7L, 3L)).toDF("s", "d", "w"), "s", "d", "w", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(selfLoop.keySet === Set(7L))
    // full mass cycles through the self-loop: 1e12*85/100 + teleport
    assert(selfLoop(7L) === 1000000000000L * 85 / 100 + 1000000000000L * 15 / 100)

    // cdc chunks/cut: empty and whitespace-only docs vanish (no tokens),
    // a single doc can still self-duplicate in the cut but never reports
    val weird = Seq((1L, ""), (2L, "   \t "), (3L, "x x x x x x x x")).toDF("doc_id", "text")
    assert(Dedup.cdcChunks(weird, "doc_id", "text")
      .collect().forall(_.getLong(2) >= 2)) // n_docs >= 2 only (likely empty)
    val cut = Dedup.cdcChunkCut(weird, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!cut.contains(1L) && !cut.contains(2L)) // token-less docs emit nothing
    assert(cut(3L)._1 === 8L) // total tokens preserved

    // anisotropy: a single vector has zero covariance everywhere; empty
    // input emits nothing
    val one = Profiling.embeddingAnisotropy(
      Seq((1L, Seq(0.5f, -0.25f, 1.0f))).toDF("id", "v"), "v", dims = 3, topK = 10)
      .collect()
    assert(one.length === 3 && one.forall(_.getLong(3) === 0L))
    assert(Profiling.embeddingAnisotropy(
      Seq.empty[(Long, Seq[Float])].toDF("id", "v"), "v", dims = 3).collect().isEmpty)

    // filtered ann: a predicate matching nothing returns no neighbors
    // (and must not error on the empty brute slice)
    val e = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((9L, Seq(1.0f, 0.1f))).toDF("vec_id", "embedding")
    assert(Similarity.filteredTopK(e, q, "vec_id", "embedding",
      col("label") === 42, k = 3).collect().isEmpty)
  }

  test("sketch operators: degenerate inputs neither crash nor fabricate rows") {
    import graft.operators.Sketches
    val empty = Seq.empty[String].toDF("k")

    // HLL on an empty input: zero registers -> NDV pinned to 0 (the
    // estimator special-cases n_regs=0; the raw formula would report
    // its all-registers-absent floor ~alpha*m), matching the DuckDB
    // replicas' CASE so an empty corpus agrees cross-engine
    val h = Sketches.hllNdv(empty, col("k")).collect().head
    assert(h.getLong(1) === 0L && !h.isNullAt(2) && h.getLong(2) === 0L)

    // a single key: one register, rank >= 1, a small positive estimate
    val one = Sketches.hllNdv(Seq("x").toDF("k"), col("k")).collect().head
    assert(one.getLong(1) === 1L && one.getLong(2) >= 1L)

    // count-min: empty input -> empty sketch; probing it finds nothing
    val sk = Sketches.countMin(empty, col("k"))
    assert(sk.collect().isEmpty)
    assert(Sketches.cmEstimate(Seq(("x", 1L)).toDF("k", "t"), col("k"), sk)
      .collect().isEmpty)

    // permilles: empty input -> empty result (there is no quantile)
    assert(Sketches.exactPermilles(
      Seq.empty[(Long, Long)].toDF("v", "tie"), "v", "tie", Seq(500))
      .collect().isEmpty)
    // single row: every permille maps to rank 1, that row's value
    val sp = Sketches.exactPermilles(
      Seq((42L, 1L)).toDF("v", "tie"), "v", "tie", Seq(0, 500, 1000))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sp === Map(0L -> ((1L, 42L)), 500L -> ((1L, 42L)),
      1000L -> ((1L, 42L))))

    // skew advisor: empty input -> empty report
    assert(Sketches.skewAdvisor(Seq.empty[String].toDF("k"), "k")
      .collect().isEmpty)
  }
}
