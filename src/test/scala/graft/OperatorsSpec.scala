package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{text, vectors, TextUtil}
import graft.operators.{Decontamination, Dedup, Multimodal, Packing, Sampling, Selection, Similarity, TextAnalysis}

class OperatorsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and distributed joins"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "yet another unrelated document mentioning parquet manifests and snapshots"),
  ).toDF("doc_id", "text")

  test("token chunking: windows, overlap, short/empty docs, last-chunk rule") {
    // 10 tokens, size 4, overlap 1 -> stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    val d = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "short doc"), // <= size: one chunk, itself
      (3L, "   "),       // whitespace-only: one empty chunk of 1 "token"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(d, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    assert(out((1L, 0L)) === ("t1 t2 t3 t4", 4L))
    assert(out((1L, 1L)) === ("t4 t5 t6 t7", 4L)) // overlap carries t4
    assert(out((1L, 2L)) === ("t7 t8 t9 t10", 4L))
    assert(out((2L, 0L)) === ("short doc", 2L))
    assert(out((3L, 0L)) === ("", 1L))
    assert(out.size === 5)
    // ragged tail: 6 tokens size 4 stride 3 -> chunks at 0 and 3, last is short
    val tail = TextAnalysis.chunk(
      Seq((9L, "a b c d e f")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(tail === Map(0L -> "a b c d", 1L -> "d e f"))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunk(d, "doc_id", "text", chunkSize = 4, overlap = 4).collect()
    }
  }

  test("bloom decontamination equals the exact path") {
    val train = docs.filter($"doc_id" =!= 2L)
    val bench = docs.filter($"doc_id" === 2L)
    val exact = Decontamination.flagged(train, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).sorted
    val bloom = Decontamination.flaggedBloom(train, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).sorted
    assert(bloom === exact)
    assert(exact.nonEmpty) // docs 1/4 share 4-grams with the near-dup bench doc
  }

  test("kmeans assignment: seeds, one Lloyd step, deterministic ties") {
    // two tight groups on a line; seeds are ids 0 and 1 (one per group)
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 0.0f)),
      (2L, Array(0.1f, 0.0f)), (3L, Array(9.9f, 0.0f)),
      (4L, Array(0.2f, 0.0f)), (5L, Array(10.2f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Clustering
      .kmeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 2L, 4L).forall(out(_) === 0L))
    assert(Seq(1L, 3L, 5L).forall(out(_) === 1L))
    // a point equidistant to both centroids ties to the LOWER centroid id
    val tie = Seq((0L, Array(0.0f)), (1L, Array(4.0f)), (2L, Array(2.0f)))
      .toDF("vec_id", "embedding")
    val t2 = graft.operators.Clustering
      .kmeansAssign(tie, "vec_id", "embedding", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t2(2L) === 0L)
  }

  test("label affinity flags the planted mislabel, exact margins") {
    // label 0 clusters near x=0, label 1 near x=10; vec 4 carries label 0
    // but sits in label 1's territory — the planted label-noise row
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f), 0), (1L, Array(0.2f, 0.0f), 0),
      (2L, Array(10.0f, 0.0f), 1), (3L, Array(9.8f, 0.0f), 1),
      (4L, Array(9.9f, 0.1f), 0),
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Clustering
      .labelAffinity(vecs, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(5), r.getBoolean(6)))).toMap
    // only the planted row is mislabeled, and its nearest other is label 1
    assert(out(4L)._4 && out(4L)._2 === 1L && out(4L)._3 < 0)
    assert(Seq(0L, 1L, 2L, 3L).forall(i => !out(i)._4))
    // exact margin for vec 0: own centroid is the label-0 mean (includes
    // the outlier), other is label-1's mean — recompute by hand at x1024
    val c0 = Seq(0, 204, 10137).map(_.toLong) // floor(1024*{0,.2,9.9})
    val c1 = Seq(10240, 10035).map(_.toLong)
    val m0 = math.floor(c0.sum.toDouble / 3).toLong
    val m1 = math.floor(c1.sum.toDouble / 2).toLong
    val y0 = math.floor(Seq(0L, 0L, 102L).sum.toDouble / 3).toLong
    val dOwn = m0 * m0 + y0 * y0
    assert(m1 > m0) // sanity on the hand-built centroids
    val row0 = graft.operators.Clustering
      .labelAffinity(vecs, "vec_id", "embedding", "label")
      .filter(col("vec_id") === 0L).collect().head
    assert(row0.getLong(2) === dOwn)
  }

  test("column profile counts rows, nulls, distincts, min/max in one pass") {
    val d = Seq(
      (1L, Some("b"), 10L), (2L, Some("a"), 10L),
      (3L, None, 30L), (4L, Some("a"), 40L),
    ).toDF("id", "s", "v")
    val out = graft.operators.Profiling.profile(d, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("id") === ((4L, 0L, 4L, "1", "4")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b"))) // nulls excluded from ndv/min/max
    assert(out("v") === ((4L, 0L, 3L, "10", "40")))
  }

  test("int8 quantization: bounds, zero vectors, reconstruction error") {
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 2.54f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (3L, Array(-1.0f, 1.0f, -1.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Quantization
      .quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    val (s1, q1) = out(1L)
    assert(math.abs(s1 - 2.54 / 127) < 1e-9)
    assert(q1.max === 127 && q1.min >= -127) // extremes hit the int8 range
    // reconstruction error bounded by scale/2 (float source read as double)
    val src = Array(1.0f, -2.0f, 0.5f, 2.54f)
    q1.zip(src).foreach { case (q, x) =>
      assert(math.abs(q * s1 - x.toDouble) <= s1 / 2 + 1e-9)
    }
    assert(out(2L) === ((0.0, Seq(0, 0, 0, 0))))
    assert(out(3L)._2 === Seq(-127, 127, -127, 127))
  }

  test("exact dedup keeps one row per text, smallest id") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id", "n_copies").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) === 2L) // 1 and 4 collapse, min id 1 survives
    assert(!out.contains(4L))
    assert(out(2L) === 1L)
    assert(out.size === 4)
  }

  test("minhash LSH finds the near-duplicate pair and not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L))) // near/exact dups found
    assert(pairs.contains((1L, 4L))) // exact dup must be found
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated not paired
  }

  test("simhash pairs: exact dup at distance 0, near-dup close, unrelated far") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 4L)) === 0)
    assert(pairs.get((1L, 2L)).forall(_ <= 12))
    assert(!pairs.contains((3L, 5L)))
  }

  test("ngram jaccard: exact dup 1.0, unrelated low") {
    val pairs = Seq((1L, 4L), (1L, 3L)).toDF("a", "b")
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", pairs, n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 4L)) === 1.0)
    assert(out((1L, 3L)) < 0.1)
  }

  test("line dedup strips cross-doc boilerplate, keeps within-doc repeats") {
    val lined = Seq(
      (1L, "boiler\nunique one\nfooter"),
      (2L, "boiler\nunique two\nfooter"),
      (3L, "solo line"),
      (4L, "boiler"),          // loses every line
      (5L, "rep\nrep"),        // repeated in ONE doc only -> not boilerplate
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lineDedup(lined, "doc_id", "text", "\n", minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((3L, 1L, "unique one")))
    assert(out(2L) === ((3L, 1L, "unique two")))
    assert(out(3L) === ((1L, 1L, "solo line")))
    assert(out(4L) === ((1L, 0L, "")))
    assert(out(5L) === ((2L, 2L, "rep\nrep")))
  }

  test("duplicated spans: shared 8-gram covered, overlapping grams merge") {
    val d = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"),
      (2L, "z1 w1 w2 w3 w4 w5 w6 w7 w8 z2"),  // same 8-gram, offset 2
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u0"),  // unrelated
      (4L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),     // 2 grams, both duplicated
      (5L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),     //   by this exact dup
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(d, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L) === ((10L, 1L, 8L, 1L, 0.8)))
    assert(out(2L) === ((10L, 1L, 8L, 1L, 0.8)))
    assert(out(3L) === ((10L, 0L, 0L, 0L, 0.0)))
    // overlapping duplicated grams at starts 1,2 merge: 8 + min(1,8) = 9
    assert(out(4L) === ((9L, 2L, 9L, 1L, 1.0)))
    assert(out(5L) === out(4L))
  }

  test("substring removal cuts exactly the covered tokens, in order") {
    val d = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"),
      (2L, "z1 w1 w2 w3 w4 w5 w6 w7 w8 z2"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u0"),
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(d, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) === ((10L, 2L, "x1 x2")))
    assert(out(2L) === ((10L, 2L, "z1 z2")))
    assert(out(3L) === ((10L, 10L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u0")))
  }

  test("winnowing pairs: shared long runs pair, unrelated docs do not") {
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", k = 4, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 4L))) // exact dup: every fingerprint shared
    assert(pairs.contains((1L, 2L))) // 13-token shared prefix >= w+k-1=7
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs((1L, 4L)) >= pairs((1L, 2L)))
  }

  test("NB classifier separates the planted vocabularies") {
    val d = Seq(
      (1L, "alpha beta alpha beta", true, true),
      (2L, "beta alpha beta alpha", true, true),
      (3L, "gamma delta gamma delta", false, true),
      (4L, "delta gamma delta gamma", false, true),
      (5L, "alpha beta beta", false, false),   // score-only rows: label unused
      (6L, "gamma delta delta", true, false),
    ).toDF("doc_id", "text", "pos", "tr")
    val out = Selection.nbClassify(d, "doc_id", "text", col("pos"), col("tr"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out(5L)._2 === true)   // looks positive despite its label column
    assert(out(6L)._2 === false)
    assert(out(1L)._1 > 0 && out(3L)._1 < 0)
    assert(out(5L)._1 > out(6L)._1)
  }

  test("brute-force ANN returns the planted nearest neighbor first") {
    val base = Array.tabulate(16)(i => (i + 1).toFloat)
    val nearly = base.map(_ * 1.01f)
    val ortho = Array.tabulate(16)(i => if (i % 2 == 0) 1f else -1f)
    val vecs = Seq((1L, base), (2L, nearly), (3L, ortho)).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].collect()
    assert(top.toSeq === Seq(2L))
  }

  test("brute-force ANN partial top-k matches the exact result across partitions") {
    // 200 corpus vectors spread over many partitions; the per-partition
    // heap pre-cut must not change the exact top-k
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 200L).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding").repartition(16)
    val queries = corpus.filter($"vec_id" <= 3)
    val got = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // naive exact reference via a full window (small data, correctness only)
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = corpus.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy(desc("cosine"), $"neighbor_id")
    val want = c.join(q, $"query_id" =!= $"neighbor_id")
      .withColumn("cosine", vectors.cosineSim($"qv", $"cv"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("embedding near-dup finds planted duplicates; degenerate corpus stays bounded") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val near = base.map(x => x * 1.002f + 0.0005f)
    val distinctVecs = (3L to 40L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = (Seq((1L, base), (2L, near)) ++ distinctVecs).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(df, "vec_id", "embedding", cosineThreshold = 0.98)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))

    // 1000 identical vectors: uncapped LSH would make one bucket with
    // ~500k pairs; the bucket cap keeps the candidate set bounded (here:
    // zero — every bucket degenerates past maxBucket)
    val same = (1L to 1000L).map(i => (i, base)).toDF("vec_id", "embedding")
    val capped = Dedup.embeddingNearDup(
      same, "vec_id", "embedding", cosineThreshold = 0.5, maxBucket = 100)
    assert(capped.count() === 0)
  }

  test("embeddingComponents equals the uncollapsed LSH+CC path on a copy-heavy corpus") {
    val rnd = new scala.util.Random(17)
    val uniques = (1L to 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    // every unique gets 5 EXACT copies (ids 100i+j) plus one jittered
    // near-dup (id 10000+i) — the copy-heavy shape the collapse targets
    val rows = uniques.flatMap { case (i, v) =>
      (0 until 5).map(j => (100L * i + j, v)) :+
        (10000L + i, v.map(x => x * 1.001f))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(8)
    val collapsed = Dedup.embeddingComponents(
      df, "vec_id", "embedding", cosineThreshold = 0.95, bits = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = Dedup.embeddingNearDup(
      df, "vec_id", "embedding", cosineThreshold = 0.95, bits = 40)
      .select($"vec_a".as("a"), $"vec_b".as("b"))
    val uncollapsed = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collapsed === uncollapsed)
    // zero vectors never cluster, even when exact-duplicated
    val zeros = Seq((1L, Array.fill(16)(0.0f)), (2L, Array.fill(16)(0.0f)))
      .toDF("vec_id", "embedding")
    assert(Dedup.embeddingComponents(
      zeros, "vec_id", "embedding", 0.95, bits = 40).count() === 0)
  }

  test("centroid IVF finds planted duplicates through its probed cells") {
    val rnd = new scala.util.Random(3)
    val corpus = (1L to 300L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding").repartition(8)
    // queries = scaled copies of vectors 1..3: same unit-normalized form,
    // so they assign to the source's cell and rank it first (cosine ~1)
    val queries = corpus.filter($"vec_id" <= 3).select(
      ($"vec_id" + 1000L).as("vec_id"),
      transform($"embedding", x => x * lit(1.001f)).as("embedding"))
    val top1 = Similarity.ivfCentroidTopK(corpus, queries, "vec_id", "embedding", 3)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1 === Map(1001L -> 1L, 1002L -> 2L, 1003L -> 3L))
  }

  test("persisted IVF index: probe finds planted duplicates through pruned cells") {
    val rnd = new scala.util.Random(5)
    val corpus = (1L to 300L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding").repartition(8)
    val loc = java.nio.file.Files
      .createTempDirectory("graft-ivf-spec").toUri.toString.stripSuffix("/")
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", loc, numCells = 8)
    val queries = corpus.filter($"vec_id" <= 3).select(
      ($"vec_id" + 1000L).as("vec_id"),
      transform($"embedding", x => x * lit(1.001f)).as("embedding"))
    val top1 = Similarity.ivfIndexTopK(spark, loc, queries, "vec_id", "embedding", 3)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1 === Map(1001L -> 1L, 1002L -> 2L, 1003L -> 3L))

    // the index layout actually prunes: a single-cell filter plans
    // strictly fewer data files than the whole assignments table
    val conf = spark.sparkContext.hadoopConfiguration
    val tbl = graft.tables.StorageCatalog.loadTable(conf, s"$loc/assignments")
    val snap = tbl.metadata.currentSnapshot.get
    val all = tbl.planFiles(snap)
    val pruned = graft.tables.PruneEval.prunePlanned(
      all, Some(col("cell") === 0), tbl.metadata, tbl.metadata.currentSchema)
    assert(pruned.nonEmpty && pruned.size < all.size)

    // centroid table holds exactly one row per cell
    val cents = graft.tables.StorageCatalog
      .loadTable(conf, s"$loc/centroids").scan(spark)
    assert(cents.count() === 8)
  }

  test("incremental IVF: append finds both generations; drift gate refuses a shifted batch") {
    val rnd = new scala.util.Random(11)
    val gen1 = (1L to 200L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding").repartition(8)
    val gen2 = (201L to 400L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding").repartition(8)
    val loc = java.nio.file.Files
      .createTempDirectory("graft-ivf-incr").toUri.toString.stripSuffix("/")
    Similarity.buildIvfIndex(gen1, "vec_id", "embedding", loc, numCells = 8)
    Similarity.addToIvfIndex(spark, loc, gen2, "vec_id", "embedding")

    // probes planted from BOTH generations rank their source first
    val both = gen1.filter($"vec_id" <= 2)
      .unionByName(gen2.filter($"vec_id".isin(201L, 202L)))
    val queries = both.select(($"vec_id" + 1000L).as("vec_id"),
      transform($"embedding", x => x * lit(1.001f)).as("embedding"))
    val top1 = Similarity.ivfIndexTopK(spark, loc, queries, "vec_id", "embedding", 3)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1 === Map(1001L -> 1L, 1002L -> 2L, 1201L -> 201L, 1202L -> 202L))

    // the append landed in the existing identity partitions — still
    // file-prunable, and the assignments row count covers both batches
    val conf = spark.sparkContext.hadoopConfiguration
    val tbl = graft.tables.StorageCatalog.loadTable(conf, s"$loc/assignments")
    assert(tbl.scan(spark).count() === 400L)

    // a distribution-shifted batch (all-positive offset moves every
    // unit-norm dimension) must REFUSE, not append into stale cells
    val shifted = (401L to 500L)
      .map(i => (i, Array.fill(16)(rnd.nextFloat() * 0.05f + 1.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      Similarity.addToIvfIndex(spark, loc, shifted, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("drift"))
    val reloaded = graft.tables.StorageCatalog.loadTable(conf, s"$loc/assignments")
    assert(reloaded.scan(spark).count() === 400L, "refused batch left no rows")
  }

  test("langid identifies real multilingual samples") {
    val samples = Seq(
      (1L, "the cat is on the mat and it is not happy about that"),
      (2L, "le chat est dans la maison et il est content de la vie"),
      (3L, "el gato es un animal que vive en la casa con una familia"),
      (4L, "die katze ist ein tier und das haus ist nicht sehr gross"),
      (5L, "这是一段中文文本用来测试语言识别功能"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(samples, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "fr")
    assert(out(3L) === "es")
    assert(out(4L) === "de")
    assert(out(5L) === "zh")
  }

  test("repetition stats: hand-computed diversity and duplication") {
    val samples = Seq(
      // "a b a b a": 5 words, 2 distinct, 'a' x3; bigrams (a b, b a, a b, b a)
      // -> 2 distinct of 4 -> dup 0.5
      (1L, "a b a b a"),
      // all distinct: ratio 1.0, top 1/4, no dup bigrams
      (2L, "w x y z"),
      // fully repetitive: 1 distinct of 4, top 1.0, 1 distinct bigram of 3
      (3L, "spam spam spam spam"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(samples, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) === ((5L, 0.4, 0.6, 0.5)))
    assert(out(2L) === ((4L, 1.0, 0.25, 0.0)))
    assert(out(3L) === ((4L, 0.25, 1.0, 1.0 - 1.0 / 3.0)))
  }

  test("token stats and fingerprint are deterministic") {
    val s1 = TextAnalysis.tokenStats(docs, "doc_id", "text").collect().toSeq
    val s2 = TextAnalysis.tokenStats(docs, "doc_id", "text").collect().toSeq
    assert(s1.map(_.toString).sorted === s2.map(_.toString).sorted)
    val f1 = TextAnalysis.fingerprints(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // exact dup docs share a fingerprint
    assert(f1(1L) === f1(4L))
    assert(f1(1L) !== f1(3L))
  }

  test("multimodal stub pipeline: metadata + features + frames") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val assets = Multimodal.asAssets(docs, "doc_id", "text")
    val meta = Multimodal.decodeMetadata(assets)
    assert(meta.count() === 5)
    val m = meta.filter($"asset_id" === 1).head()
    assert(m.getAs[Int]("n_bytes") ===
      "the quick brown fox jumps over the lazy dog near the river bank today".getBytes("UTF-8").length)
    val feats = Multimodal.extractFeatures(assets)
    assert(feats.select(size($"feature")).as[Int].head() === 16)
    // deterministic across runs
    val f1 = feats.orderBy("asset_id").collect().map(_.toString).toSeq
    val f2 = Multimodal.extractFeatures(assets).orderBy("asset_id").collect().map(_.toString).toSeq
    assert(f1 === f2)
    assert(Multimodal.sampleFrames(assets).count() > 0)
  }

  test("multimodal real decode: imageio roundtrip of encoded PNGs") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val imgs = Multimodal.syntheticImages(docs, "doc_id")
    val meta = Multimodal.decodeMetadata(imgs).filter($"asset_id" === 3).head()
    // id=3: w = 8 + 3 % 57 = 11, h = 8 + (3/7) % 57 = 8, decoded not derived
    assert(meta.getAs[Int]("width") === 11)
    assert(meta.getAs[Int]("height") === 8)
    assert(meta.getAs[Int]("n_frames") === 1)
    val fr = Multimodal.extractFeatures(imgs).filter($"asset_id" === 3).head()
    val f = fr.getSeq[Float](fr.fieldIndex("feature"))
    // solid color r=3, g=21, b=39
    assert(f === Seq(11f, 8f, 3f, 21f, 39f))
    // a non-solid image proves means accumulate over the real raster:
    // 2x1 PNG with pixels (0,0,0) and (10,20,30) -> means (5,10,15)
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(1, 0, (10 << 16) | (20 << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val one = Seq((7L, bos.toByteArray, "image/png")).toDF("asset_id", "payload", "media_type")
    val fr2 = Multimodal.extractFeatures(one).head()
    val ff = fr2.getSeq[Float](fr2.fieldIndex("feature"))
    assert(ff === Seq(2f, 1f, 5f, 10f, 15f))
  }

  test("multimodal MJPEG: split survives entropy-coded frames, frames decode") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // gradient frames exercise real entropy coding (FF byte stuffing):
    // the split must not break inside compressed data
    val rng = new scala.util.Random(11)
    val frames = (0 until 5).map { _ =>
      val img = new java.awt.image.BufferedImage(
        32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32)
        img.setRGB(x, y, rng.nextInt(0xffffff))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val stream = Multimodal.encodeMjpeg(frames)
    val split = Multimodal.splitMjpeg(stream).get
    assert(split.length === 5)
    assert(split.map(_.length) === frames.map(_.length))
    split.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // end-to-end: synthetic MJPEG assets -> per-frame structural stats
    val vids = Multimodal.syntheticMjpegVideos(docs, "doc_id")
    val fr = Multimodal.sampleVideoFrames(vids, everyK = 1)
      .filter($"asset_id" === 3).orderBy("frame_index").collect()
    // id=3: 2 + 3%5 = 5 frames of 11x11? w = 8+3%16 = 11, h = 8+3%8 = 11
    assert(fr.length === 5)
    assert(fr.forall(r => r.getInt(2) === 11 && r.getInt(3) === 11))
    // a foreign-codec payload (no SOI, no GFRM) stays with the stub
    assert(Multimodal.splitMjpeg("not a video".getBytes).isEmpty)
    // an FF D9 inside an APP1 payload (EXIF thumbnails end with a real
    // EOI byte pair) must NOT split the frame: the walker skips marker
    // segments by their length fields instead of raw byte scanning
    def withExif(f: Array[Byte]): Array[Byte] = {
      val payload = Array[Byte](0x45, 0x78, 0x69, 0x66, 0x00, 0x00, // "Exif\0\0"
        0xff.toByte, 0xd8.toByte, 0x01, 0x02,
        0xff.toByte, 0xd9.toByte, 0x03, 0x04) // embedded thumbnail EOI
      val len = payload.length + 2
      f.take(2) ++ Array(0xff.toByte, 0xe1.toByte,
        (len >> 8).toByte, (len & 0xff).toByte) ++ payload ++ f.drop(2)
    }
    val exifStream = Multimodal.encodeMjpeg(Seq(withExif(frames(0)), withExif(frames(1))))
    val exifSplit = Multimodal.splitMjpeg(exifStream).get
    assert(exifSplit.length === 2)
    assert(exifSplit.map(_.length) === Seq(frames(0).length + 18, frames(1).length + 18))
  }

  test("multimodal real audio decode: javax.sound WAV roundtrip") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val meta = Multimodal.decodeAudioMeta(Multimodal.syntheticAudio(docs, "doc_id"))
      .filter($"asset_id" === 4).head()
    // id=4: rate = 8000*(1+4%3) = 16000, channels = 1, frames = 400+16 = 416
    assert(meta.getAs[Int]("sample_rate") === 16000)
    assert(meta.getAs[Int]("channels") === 1)
    assert(meta.getAs[Long]("n_samples") === 416L)
    assert(math.abs(meta.getAs[Double]("duration_ms") - 416 * 1000.0 / 16000) < 1e-9)
    // non-audio payloads are rejected, not mis-decoded
    assert(Multimodal.decodeAudioMeta(
      Multimodal.asAssets(docs, "doc_id", "text")).count() === 0)
  }

  test("multimodal real video frames: container parse + per-frame decode") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val frames = Multimodal.sampleVideoFrames(
      Multimodal.syntheticVideos(docs, "doc_id"), everyK = 2)
    // id=5: 2 + 5%7 = 7 frames -> sampled indices 0,2,4,6
    val f5 = frames.filter($"asset_id" === 5).orderBy("frame_index").collect()
    assert(f5.map(_.getInt(1)).toSeq === Seq(0, 2, 4, 6))
    // frame 2 of id=5: w=8+5%16=13, h=8+5%8=13, r=(5+2)%256=7,
    // g=(15+2)%256=17, b=(25+2)%256=27 — all from DECODED pixels
    val r = f5(1)
    assert((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)) ===
      ((13, 13, 7, 17, 27)))
    // non-container payloads produce no frames (stub path is separate)
    assert(Multimodal.sampleVideoFrames(
      Multimodal.asAssets(docs, "doc_id", "text")).count() === 0)
  }

  test("BPE: learns the textbook merges and segments unseen words") {
    import graft.operators.Bpe
    // classic Sennrich corpus: low x5, lower x2, newest x6, widest x3
    val corpus = Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim),
    ).toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", numMerges = 5)
    // hand-computed: ties break (count desc, pair lexicographic)
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.Eow), ("l", "o"), ("lo", "w")))
    val out = Bpe.segment(
      Seq((9L, "lowest lowest newest")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2))).head
    // lowest -> [low, est</w>] (2), newest -> [n, e, w, est</w>] (4)
    assert(out._2 === 8L)
    assert(out._3.take(4) === Seq("low", s"est${Bpe.Eow}", "low", s"est${Bpe.Eow}"))
    // zero merges degrades to characters + the end-of-word marker
    val chars = Bpe.segment(
      Seq((1L, "ab")).toDF("doc_id", "text"), "doc_id", "text", Nil)
      .collect().head.getLong(1)
    assert(chars === 3L)
  }

  test("BPE: word-histogram collect is capped by a distributed top-K") {
    import graft.operators.Bpe
    // a huge singleton tail (the web-scale shape: URLs, hashes, typos)
    // must never reach the driver whole — only the top-K by (count desc,
    // word asc) comes back
    val tail = (0 until 500).map(i => (i.toLong, s"uniq$i")).toDF("doc_id", "text")
    val corpus = tail.union(Seq((9999L, ("low " * 50).trim)).toDF("doc_id", "text"))
    val hist = Bpe.wordHistogram(corpus, "text", maxVocab = 10)
    assert(hist.length === 10)
    assert(hist.head === ("low" -> 50L), "highest-count word survives the cap")
    // capped training still learns the dominant word's merges
    val merges = Bpe.train(corpus, "text", numMerges = 2, maxVocab = 10)
    assert(merges.take(2) === Seq(("l", "o"), ("lo", "w")))
  }

  test("charLmNll: only >=minCount trigrams reach the driver; totals unchanged") {
    // the model collect must exclude the singleton tail BELOW the collect
    // while total/vocab still count it (smoothing denominator identical
    // to the unfiltered formulation)
    val target = Seq(
      (1L, "aaaaaaaa", true), // trigram 'aaa' x6
      (2L, "zqxjkvbw", true)  // 6 singleton trigrams
    ).toDF("doc_id", "text", "is_target")
    val out = Selection.charLmNll(target, "doc_id", "text", col("is_target"))
      .orderBy("doc_id").collect()
    // hand-computed: T=12 grams total, V=7 distinct, denom=20
    // doc 1: all 'aaa' (count 6 >= 2, in model): -log(7/20)
    val exp1 = -math.log(7.0 / 20.0)
    assert(math.abs(out(0).getDouble(2) - exp1) < 1e-5)
    // doc 2: singletons are OOV after the minCount filter: -log(1/20)
    val exp2 = -math.log(1.0 / 20.0)
    assert(math.abs(out(1).getDouble(2) - exp2) < 1e-5)
  }

  test("Gopher rules: each rule trips on its own pathology") {
    import graft.operators.TextAnalysis
    // 75 words, mean length 4.5, five required stopwords — passes all
    val good =
      ("the quick brown foxes jumped over those lazy dogs and that have with great energy " * 5).trim
    val docs = Seq(
      (1L, good),
      (2L, "the be short"), // < 50 words
      (3L, ("a " * 60).trim + " the be"), // mean word length < 3
      (4L, (("the be of and that have with " + "#### " * 3) * 8).trim), // symbols
      (5L, (0 until 20).map(i => s"- the be of and that have with item$i x1 x2")
        .mkString("\n")), // 100% bullet lines
      (6L, (0 until 20).map(i => s"the be of and that have with line$i x1 x2...")
        .mkString("\n")), // 100% ellipsis endings
      (7L, ("1 2 3 4 5 6 7 8 " * 8).trim + " the be"), // < 80% alphabetic words
      (8L, ("apple banana cherry dog egg fox grape hat ice jug " * 6).trim) // no req stopwords
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(8), "clean doc passes")
    assert(!r(2L).getBoolean(1) && !r(2L).getBoolean(8), "word count")
    assert(!r(3L).getBoolean(2), "mean word length")
    assert(!r(4L).getBoolean(3), "symbol ratio")
    assert(!r(5L).getBoolean(4), "bullet lines")
    assert(!r(6L).getBoolean(5), "ellipsis lines")
    assert(!r(7L).getBoolean(6), "alpha words")
    assert(!r(8L).getBoolean(7) && !r(8L).getBoolean(8), "required stopwords")
  }

  test("c4 rules: line retention, sentence floor, brace and lorem page drops") {
    val goodLine = "This line has more than five words and ends properly."
    val docs = Seq(
      (1L, Seq(goodLine, goodLine, goodLine).mkString("\n")), // 3 sentences: pass
      (2L, Seq(goodLine, "short line.", goodLine).mkString("\n")), // <5 words line drops -> 2 sentences
      (3L, Seq(goodLine, "no terminal punctuation here at all", goodLine).mkString("\n")),
      (4L, Seq(goodLine, "Enable javascript to view this page now.", goodLine,
        goodLine).mkString("\n")), // javascript line drops, still 3 kept
      (5L, Seq(goodLine, goodLine, goodLine).mkString("\n") + " {"), // brace page-drop
      (6L, "Lorem Ipsum dolor sit amet consectetur adipiscing elit.\n" +
        goodLine + "\n" + goodLine + "\n" + goodLine) // lorem page-drop
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4Rules(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(8), "3 clean sentences pass")
    assert(r(1L).getLong(2) === 3L && r(1L).getLong(4) === 3L)
    assert(r(2L).getLong(2) === 2L && !r(2L).getBoolean(8),
      "short line drops, sentence floor fails the page")
    assert(r(3L).getLong(2) === 2L && !r(3L).getBoolean(8),
      "unterminated line drops")
    assert(r(4L).getLong(1) === 4L && r(4L).getLong(2) === 3L &&
      r(4L).getBoolean(8), "javascript line drops but the page survives")
    assert(!r(5L).getBoolean(5) && !r(5L).getBoolean(8), "brace drops the page")
    assert(!r(6L).getBoolean(6) && !r(6L).getBoolean(8),
      "lorem ipsum drops the page (case-insensitive)")
  }

  test("keywords: integer bit-bucket tf-idf, deterministic tie order, top-k cut") {
    val docs = Seq(
      (1L, "apple apple banana common common common"),
      (2L, "banana banana cherry common"),
      (3L, "cherry date common common")
    ).toDF("doc_id", "text")
    // df: apple 1, banana 2, cherry 2, date 1, common 3
    // idf_q: df=1 -> 40, df=2 -> 39, df=3 -> 39
    val r = TextAnalysis.keywords(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getString(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r((1L, 1L)) === (("common", 3L, 3L, 117L)))
    assert(r((1L, 2L)) === (("apple", 2L, 1L, 80L)))
    assert(r((1L, 3L)) === (("banana", 1L, 2L, 39L)))
    assert(r((2L, 1L)) === (("banana", 2L, 2L, 78L)))
    // 39-point tie: term asc puts cherry before common
    assert(r((2L, 2L))._1 === "cherry" && r((2L, 3L))._1 === "common")
    assert(r((3L, 1L)) === (("common", 2L, 3L, 78L)))
    assert(r((3L, 2L)) === (("date", 1L, 1L, 40L)))
    // top-k truncation
    val k2 = TextAnalysis.keywords(docs, "doc_id", "text", k = 2)
    assert(k2.count() === 6 && k2.agg(max("rank")).head.getLong(0) === 2L)
  }

  test("webClean: each hygiene gate trips independently in the one-pass composition") {
    val goodLine = "the data have to be of use and that with scale today."
    val page = Seq.fill(6)(goodLine).mkString("\n")
    val docs = Seq(
      (1L, page),                                         // all gates pass
      (2L, page + " z�w"),                           // replacement char
      (3L, Seq.fill(6)(
        "le chat est dans la maison pour une vie bonne aussi.").mkString("\n")),
      (4L, ("word " * 60).trim),                          // no structure at all
      (5L, page + "\n{")                                  // code brace
    ).toDF("doc_id", "text")
    val r = TextAnalysis.webClean(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4),
          x.getBoolean(5)))).toMap
    assert(r(1L) === ((true, true, true, true, true)))
    assert(!r(2L)._1 && !r(2L)._5, "corruption trips the encoding gate")
    assert(r(3L)._1 && !r(3L)._2, "french trips the language gate")
    assert(!r(4L)._3 && !r(4L)._4, "unpunctuated soup fails C4 and Gopher")
    assert(r(5L)._1 && r(5L)._2 && !r(5L)._3, "a brace fails only the C4 gate")
  }

  test("c4/webClean/keywords: null and empty text degrade, never crash or null out") {
    val docs = Seq[(Long, String)]((1L, null), (2L, ""), (3L, "   \n  \n"))
      .toDF("doc_id", "text")
    val c4 = TextAnalysis.c4Rules(docs, "doc_id", "text").collect()
    assert(c4.length === 3)
    c4.foreach { r =>
      assert(r.getLong(1) === 0L && !r.getBoolean(8),
        "degenerate docs have zero lines and fail the page verdict")
      assert(!r.isNullAt(5) && !r.isNullAt(8), "verdicts are never null")
    }
    val wc = TextAnalysis.webClean(docs, "doc_id", "text").collect()
    assert(wc.length === 3)
    wc.foreach(r => assert(!r.isNullAt(5) && !r.getBoolean(5),
      "keep is false, not null, on degenerate docs"))
    assert(TextAnalysis.keywords(docs, "doc_id", "text").count() === 0,
      "no terms -> no keyword rows")
  }

  test("mojibake counts each corruption signature, clean text passes") {
    val docs = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "caf\u00C3\u00A9 and caf\u00C3\u00A9 again"), // two latin-1 pairs
      (3L, "it\u00E2\u20AC\u2122s \uFFFDbad \u0007\u0007")  // quote+repl+2 ctrl
    ).toDF("doc_id", "text")
    val r = TextAnalysis.mojibake(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getBoolean(5)))).toMap
    assert(r(1L) === ((0L, 0L, 0L, 0L, false)))
    assert(r(2L) === ((0L, 2L, 0L, 0L, true)))
    assert(r(3L) === ((1L, 0L, 1L, 2L, true)))
  }

  test("cutSpans removes matched n-gram windows, keeps the rest") {
    val train = Seq(
      (1L, "keep one two three four keep2"), // middle 4-gram contaminated
      (2L, "nothing matches here at all"),
      (3L, "one two three four"),            // doc IS the contaminated gram
    ).toDF("doc_id", "text")
    val bench = Seq((9L, "xx one two three four yy")).toDF("doc_id", "text")
    val r = Decontamination.cutSpans(train, bench, "doc_id", "text", n = 4)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === (("keep keep2", 6L, 4L)))
    assert(r(2L) === (("nothing matches here at all", 5L, 0L)))
    assert(r(3L) === (("", 4L, 4L)))
    // overlapping windows union their spans (doc 1 with two hits)
    val t2 = Seq((7L, "a one two three four five b")).toDF("doc_id", "text")
    val b2 = Seq((9L, "p one two three four q"), (10L, "p two three four five q"))
      .toDF("doc_id", "text")
    val r2 = Decontamination.cutSpans(t2, b2, "doc_id", "text", n = 4)
      .collect().head
    assert(r2.getString(1) === "a b" && r2.getLong(3) === 5L)
  }

  test("prefix dups: truncations pair with their source, floor + cap hold") {
    val base = "alpha beta gamma delta epsilon zeta eta theta" // 45 chars
    val docs = Seq(
      (1L, base),
      (2L, base.substring(0, 22)),     // strict prefix of 1
      (3L, "alpha beta gamma XYZ an entirely different tail"), // same 16-char key, not a prefix
      (4L, base),                      // exact dup of 1: equal-len pair
      (5L, "short doc")                // < 16 chars: below the floor
    ).toDF("doc_id", "text")
    val got = Dedup.prefixDups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 1L), (2L, 4L), (1L, 4L)))
  }

  test("embedding drift: planted shift flags, identical batch does not") {
    import graft.operators.Profiling
    val ref = Seq(
      (Array(0.0, 1.0), false), (Array(0.5, 1.0), false),
    ).toDF("embedding", "is_new")
    // identical distribution: zero drift, nothing flagged
    val same = ref.unionByName(
      Seq((Array(0.0, 1.0), true), (Array(0.5, 1.0), true))
        .toDF("embedding", "is_new"))
    val r0 = Profiling.embeddingDrift(same, "embedding", "is_new")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(r0.values.forall { case (d, f) => d === 0L && !f })
    // dim-0 shifted by +0.5 (512 quanta): flagged; dim-1 unchanged
    val shifted = ref.unionByName(
      Seq((Array(0.5, 1.0), true), (Array(1.0, 1.0), true))
        .toDF("embedding", "is_new"))
    val r1 = Profiling.embeddingDrift(shifted, "embedding", "is_new")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(r1(0L) === ((512L, true)))
    assert(r1(1L) === ((0L, false)))
  }

  test("balanced shards: LPT striping, exact ranks, near-equal totals") {
    // sizes 100,90,...,10 into 3 shards: rank order is size desc, so
    // shard = (rank-1) % 3 and totals differ by at most one mid doc
    val docs = (1 to 10).map(i => (i.toLong, (11 - i) * 10L))
      .toDF("doc_id", "n_tokens")
    val r = Packing.balancedShards(docs, "doc_id", "n_tokens", numShards = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // doc 1 has 100 tokens -> rank 1 -> shard 0; doc 2 90 -> shard 1; ...
    (1 to 10).foreach(i => assert(r(i.toLong)._2 === (i - 1) % 3, s"doc $i"))
    val totals = r.values.groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
    assert(totals.values.max - totals.values.min <= 100L)
    // ties break by doc_id: equal sizes stripe deterministically
    val tie = Seq((5L, 7L), (1L, 7L), (9L, 7L)).toDF("doc_id", "n_tokens")
    val t2 = Packing.balancedShards(tie, "doc_id", "n_tokens", numShards = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(t2 === Map(1L -> 0L, 5L -> 1L, 9L -> 0L))
  }

  test("derepeat drops later repeats of non-empty lines, keeps blanks") {
    val docs = Seq(
      (1L, "a\nb\na\n\n\nb\nc"), // repeats of a and b; two blanks survive
      (2L, "x\ny\nz"),           // nothing repeated
      (3L, "s\ns\ns\ns")         // three repeats removed
    ).toDF("doc_id", "text")
    val r = TextAnalysis.derepeat(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === (("a\nb\n\n\nc", 7L, 2L)))
    assert(r(2L) === (("x\ny\nz", 3L, 0L)))
    assert(r(3L) === (("s", 4L, 3L)))
  }

  test("source quality: per-source integer evidence + keep verdict") {
    // clean source: every doc passes gopher; junk source: digit soup fails
    val clean = "the be to of and that have with " +
      ("alpha beta gamma delta " * 15).trim // 68 words, all alphabetic
    val junk = ("1 2 3 4 5 6 7 8 9 0 " * 8).trim // all-digit words
    val docs = Seq(
      (1L, "good", clean), (2L, "good", clean),
      (3L, "bad", junk), (4L, "bad", junk), (5L, "bad", clean)
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.sourceQuality(docs, "source", "doc_id", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    val good = r("good"); val bad = r("bad")
    assert(good.getLong(1) === 2L && bad.getLong(1) === 3L) // docs
    assert(good.getLong(7) === 2L, "both clean docs pass gopher")
    assert(bad.getLong(7) === 1L, "only the planted clean doc passes")
    assert(good.getBoolean(12) && !bad.getBoolean(12), "keep verdict")
    // integer evidence: chars sum exactly
    assert(good.getLong(2) === 2L * clean.length)
    // digit_ratio of the junk source is dominated by digit chars
    assert(bad.getDouble(9) > 0.1 && good.getDouble(9) === 0.0)
  }

  test("source overlap counts distinct shared fingerprints per source pair") {
    import graft.operators.Profiling
    val docs = Seq(
      ("s1", "alpha"), ("s1", "beta"), ("s1", "beta"), // within-source dup: once
      ("s2", "alpha"), ("s2", "beta"), ("s2", "gamma"),
      ("s3", "gamma"), ("s3", "delta")
    ).toDF("source", "text")
    val got = Profiling.sourceOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("s1", "s2") -> 2L, ("s2", "s3") -> 1L))
  }

  test("html extraction: tags drop, script/style content drops, entities decode") {
    val docs = Seq(
      (1L, "<html><body><h1>Title</h1><p>hello <b>world</b></p></body></html>"),
      // script/STYLE content must vanish entirely, case-insensitive,
      // even when it contains < and quotes
      (2L, "a<SCRIPT>var x = '<p>' + 1 < 2;</SCRIPT>b<Style>h1 {x:\"<\"} </Style>c"),
      (3L, "pre<!-- a <b> comment\nspanning lines -->post"),
      // entity order: &amp;lt; must yield the literal string "&lt;"
      (4L, "&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp;lt;"),
      // malformed markup degrades to whitespace, never throws
      (5L, "unclosed <div attr=\"x\" and >then<  spaced"),
      (6L, "")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.htmlExtract(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "Title hello world")
    assert(r(2L) === "a b c")
    assert(r(3L) === "pre post")
    assert(r(4L) === "& <tag> \"q\" 's' a b &lt;")
    assert(r(5L) === "unclosed then< spaced")
    assert(r(6L) === "")
  }

  test("incremental dedup flags new docs against a signature index") {
    import graft.operators.Dedup
    val base = Seq(
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely different content about distributed query engines")
    ).toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(base, "doc_id", "text", shingleSize = 2)
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 2
      (3L, "unrelated text with zero overlap whatsoever in any shingle here")
    ).toDF("doc_id", "text")
    val flags = Dedup.incrementalFlags(fresh, idx, "doc_id", "text",
      shingleSize = 2, jaccardThreshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> true, 3L -> false))
    // a hot index bucket above maxBucket is skipped (recall trade): with
    // maxBucket=0 nothing can match
    val none = Dedup.incrementalFlags(fresh, idx, "doc_id", "text",
      shingleSize = 2, jaccardThreshold = 0.5, maxBucket = 0)
      .collect().map(r => r.getBoolean(1))
    assert(none.forall(_ == false))
  }

  test("epoch mixture: upsampling repeats deterministically, capped") {
    // tiny domain with half the target share of a big one: rate > 1 for
    // the small one (full copies + fractional extra), rate < 1 downsamples
    // the big one; epochs are contiguous 0..n-1 per kept doc
    val docs = ((0 until 10).map(i => (i.toLong, "small", 10L)) ++
      (100 until 200).map(i => (i.toLong, "big", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val out = Selection.mixtureSampleEpochs(
      docs, "doc_id", "source", "n_tok",
      Map("small" -> 0.5, "big" -> 0.5), budget = 1.0, maxEpochs = 3)
      .select("doc_id", "source", "epoch").collect()
    val bySrc = out.groupBy(_.getString(1))
    // small: rate = min(3, 1.0*0.5*1100/100) = 3.0 -> every doc x3
    assert(bySrc("small").length === 30)
    assert(bySrc("small").groupBy(_.getLong(0)).values.forall(
      g => g.map(_.getLong(2)).sorted.sameElements(Seq(0L, 1L, 2L))))
    // big: rate = 0.5*1100/1000 = 0.55 -> hash-sampled subset, epoch 0 only
    assert(bySrc("big").forall(_.getLong(2) === 0L))
    assert(bySrc("big").length > 30 && bySrc("big").length < 80)
    // deterministic: second run identical
    val again = Selection.mixtureSampleEpochs(
      docs, "doc_id", "source", "n_tok",
      Map("small" -> 0.5, "big" -> 0.5), budget = 1.0, maxEpochs = 3)
      .select("doc_id", "source", "epoch").collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("classifier AUC: exact tie-corrected rank sum") {
    // scores [1,1,2,3] labels [F,T,F,T]: pairs (1,1)=0.5 (1,2)=0
    // (3,1)=1 (3,2)=1 -> AUC = 2.5/4 = 0.625
    val d = Seq((1.0, false), (1.0, true), (2.0, false), (3.0, true))
      .toDF("score", "lab")
    val r = Selection.classifierAuc(d, "score", col("lab")).collect().head
    assert(r.getDouble(0) === 0.625)
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    // perfect separation and inverse separation
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true)).toDF("score", "lab")
    assert(Selection.classifierAuc(sep, "score", col("lab")).collect().head.getDouble(0) === 1.0)
    assert(Selection.classifierAuc(sep, "score", !col("lab")).collect().head.getDouble(0) === 0.0)
  }

  test("stratified exact-k equals the direct window; small strata keep all") {
    val d = (0 until 200).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("id", "grp")
      .union(Seq((9001L, "tiny"), (9002L, "tiny")).toDF("id", "grp"))
    val got = Sampling.stratifiedSampleExact(d, "id", "grp", k = 7, shards = 4)
      .select("id", "grp").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // direct one-window reference
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp")
      .orderBy(md5(col("id").cast(org.apache.spark.sql.types.StringType)), col("id"))
    val ref = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select("id", "grp").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === ref)
    assert(got.count(_._2 == "g0") === 7)
    assert(got.count(_._2 == "tiny") === 2, "stratum smaller than k keeps all rows")
  }

  test("audio features: windowed mean/rms/peak over real decoded stereo PCM") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // stereo, 3 frames: L = [100, -200, 300], R = [7, 7, 7], window of 2
    val samples = Array[Short](100, 7, -200, 7, 300, 7)
    val wav = Multimodal.encodeWav(8000, 2, samples)
    val df = Seq((42L, wav, "audio/wav")).toDF("asset_id", "payload", "media_type")
    val out = Multimodal.audioFeatures(df, windowFrames = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2)) ->
        ((r.getInt(3), r.getDouble(4), r.getDouble(5), r.getInt(6)))).toMap
    assert(out((0, 0)) === ((2, -50.0, math.floor(math.sqrt((100.0 * 100 + 200 * 200) / 2) * 1e6 + 0.5) / 1e6, 100)))
    assert(out((0, 1)) === ((1, 300.0, 300.0, 300)))
    assert(out((1, 0)) === ((2, 7.0, 7.0, 7)))
    assert(out((1, 1)) === ((1, 7.0, 7.0, 7)))
  }

  test("bitstring pairs: pigeonhole recall within the distance, none beyond") {
    val rows = Seq(
      (1L, "0000000011111111"),
      (2L, "0000000011111110"), // d=1 from 1
      (3L, "0000100011111110"), // d=1 from 2, d=2 from 1
      (4L, "1111111100000000"), // far from everything
      (5L, "0000000011111111"), // exact dup of 1
    ).toDF("doc_id", "bits")
    val pairs = Dedup.bitstringPairs(rows, "doc_id", "bits", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs === Map(
      (1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 2L,
      (1L, 5L) -> 0L, (2L, 5L) -> 1L, (3L, 5L) -> 2L))
  }

  test("dHash: equal images hash equal, perturbed images stay near") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val ids = Seq(1L, 1L, 2L).zipWithIndex
      .map { case (seed, i) => (i.toLong, seed) }.toDF("row_id", "doc_id")
    // two assets from seed 1 (identical pixels), one from seed 2
    val assets = Multimodal.syntheticGradientImages(
      ids.select(col("doc_id")), "doc_id", w = 18, h = 16)
    val hashes = Multimodal.dHash(assets)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    val bySeed = hashes.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(bySeed(1L).length === 1) // identical input -> identical hash
    assert(hashes.head._2.length === 64)
    assert(hashes.head._2.forall(c => c == '0' || c == '1'))
    // non-multiple dimensions still hash deterministically
    val odd = Multimodal.dHash(Multimodal.syntheticGradientImages(
      Seq(7L).toDF("doc_id"), "doc_id", w = 19, h = 13))
      .collect()
    assert(odd.head.getString(3).length === 64)
  }

  test("as-of join attaches the latest prior right row per key") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 8L, "c1"), (1L, 15L, "c2"), (2L, 9L, "c3"))
      .toDF("k", "t", "rv")
    val out = graft.operators.AsOfJoin.asof(left, right, "k", "t")
      .select("k", "t", "lv", "r_rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(out === Set(
      (1L, 10L, "p1", "c1"),  // c1@8 is latest <= 10
      (1L, 20L, "p2", "c2"),  // c2@15 is latest <= 20
      (2L, 5L, "p3", null)))  // c3@9 is after 5 -> no match
  }

  test("cosine similarity expression basics") {
    val a = Seq((Array(1f, 0f), Array(0f, 1f), Array(2f, 0f)))
      .toDF("x", "y", "z")
    val r = a.select(
      vectors.cosineSim($"x", $"y"),
      vectors.cosineSim($"x", $"z"),
      vectors.dot($"x", $"z"),
      vectors.norm($"z")).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) === 2.0)
    assert(r.getDouble(3) === 2.0)
  }

  test("jaccard column function on shingle arrays") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w")).toDF("t1", "t2")
    val out = df.select(text.jaccard(text.shingles($"t1", 2), text.shingles($"t2", 2)))
      .as[Double].collect()
    assert(out(0) === 1.0)
    assert(out(1) === 0.0)
  }

  test("hash64 and simhash are stable (regression pin)") {
    // pin values so accidental kernel changes fail loudly
    assert(TextUtil.hash64("iceberg") === TextUtil.hash64("iceberg"))
    val h1 = TextUtil.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString("a b c"))
    val h2 = TextUtil.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString("a b c"))
    assert(h1 === h2)
  }

  test("connected components collapse dup pairs into min-id clusters") {
    // two chained clusters + one isolated pair; a 40-node PATH exercises
    // pointer jumping (plain propagation would need 40 rounds; the
    // default maxRounds=25 only suffices because jumping is O(log n))
    val path = (100L until 139L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (7L, 9L)) ++ path).toDF("a", "b")
    val comp = Dedup.connectedComponents(pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp(1L) === 1L && comp(2L) === 1L && comp(3L) === 1L)
    assert(comp(7L) === 7L && comp(9L) === 7L)
    assert((100L to 139L).forall(comp(_) === 100L))
    assert(comp.size === 45)
  }

  test("textComponents: exact-dup pre-collapse matches uncollapsed LSH+CC labels") {
    // exact copies (same shingle set), near-dups, a short doc below the
    // shingle floor whose exact copies must NOT link, and singletons
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact of 1
      (9L, "the quick brown fox jumps over the lazy dog tonight"), // exact of 1
      (3L, "the quick brown fox jumps over the lazy dog today ok"), // near-dup of 1
      (4L, "completely different text about something else entirely here now"),
      (5L, "word"),                                                 // empty shingle set
      (6L, "word"),                                                 // exact of 5: still no link
      (7L, "an exact pair with no fuzzy neighbors at all right"),
      (8L, "an exact pair with no fuzzy neighbors at all right"),   // exact of 7
    ).toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val collapsed = asMap(Dedup.textComponents(docs, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4))
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      .select(col("a"), col("b"))
    val plain = asMap(Dedup.connectedComponents(pairs, "a", "b"))
    assert(collapsed === plain)
    assert(collapsed(2L) === 1L && collapsed(9L) === 1L && collapsed(3L) === 1L)
    assert(collapsed(8L) === 7L && collapsed.get(7L).contains(7L))
    assert(!collapsed.contains(5L) && !collapsed.contains(6L)) // sub-shingle docs never pair
    assert(!collapsed.contains(4L)) // singleton emits no row
  }

  test("incremental CC merge equals the full recompute across every merge path") {
    // batch 1 (evens): clusters {2,4} and {6,8}, singleton 10, and 12
    // unclustered; batch 2 (odds) exercises every delta path at once:
    // 1 relabels an existing cluster (new min), 7 joins one without
    // relabeling it, 3 gives never-clustered 12 its first label, {5,9}
    // form a purely-new cluster, 11 stays unpaired
    val all = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (6L, "colorless green ideas sleep furiously while the sun sets behind distant snowy hills"),
      (8L, "colorless green ideas sleep furiously while the sun sets behind distant snowy peaks"),
      (7L, "colorless green ideas sleep furiously while the sun sets behind distant snowy ridges"),
      (12L, "parquet manifests snapshot metadata tables spark catalyst optimizer rules engine today"),
      (3L, "parquet manifests snapshot metadata tables spark catalyst optimizer rules engine tonight"),
      (5L, "streaming watermark state store microbatch trigger offsets checkpoint recovery logic first"),
      (9L, "streaming watermark state store microbatch trigger offsets checkpoint recovery logic second"),
      (10L, "entirely standalone content speaking about absolutely nothing shared with any other words"),
      (11L, "another fully isolated piece mentioning unrelated vocabulary choices throughout several phrases"),
    ).toDF("doc_id", "text")
    val evens = all.filter(col("doc_id") % 2 === 0)
    val odds = all.filter(col("doc_id") % 2 === 1)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val l1 = Dedup.textComponents(evens, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
    val l1Map = asMap(l1)
    assert(l1Map === Map(2L -> 2L, 4L -> 2L, 6L -> 6L, 8L -> 6L))
    // the index carries each doc's component; pair generation maps
    // matches straight to super-nodes
    val idx = Dedup.minhashIndex(evens, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4)
      .join(l1, Seq("doc_id"), "left")
    val newOld = Dedup.incrementalPairs(odds, idx, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4,
        jaccardThreshold = 0.4, keepIndexCols = Seq("component"))
      .select(col("nid").as("sa"),
        coalesce(col("component"), col("iid")).as("sb"))
    val newNew = Dedup.minhashLsh(odds, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
      .select(col("a").as("sa"), col("b").as("sb"))
    val superPairs = newOld.unionByName(newNew)
    val delta = asMap(Dedup.mergeComponentLabels(l1, superPairs, "sa", "sb"))
    assert(delta === Map(
      1L -> 1L, 2L -> 1L, 4L -> 1L, // relabel: 1 is the new cluster min
      7L -> 6L,                     // join without relabeling history
      3L -> 3L, 12L -> 3L,          // first labels for 3 and unclustered 12
      5L -> 5L, 9L -> 5L))          // purely-new cluster
    // delta over history == the full recompute, doc for doc
    val merged = l1Map ++ delta
    val full = asMap(Dedup.textComponents(all, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4))
    assert(merged === full)
    // the bucket-scoped variant (partition-prunable member lookup over a
    // pmod(component, n) column) must produce the identical delta
    val l1b = l1.withColumn("cbucket", pmod(col("component"), lit(16L)))
    val deltaB = asMap(Dedup.mergeComponentLabels(l1b, superPairs, "sa", "sb",
      bucketCol = Some(("cbucket", 16))))
    assert(deltaB === delta)
    // a batch whose pairs all land INSIDE existing components contracts
    // to self-edges (both endpoints map to the same component) — a no-op
    val noop = Dedup.mergeComponentLabels(
      l1, Seq((2L, 2L), (6L, 6L)).toDF("sa", "sb"), "sa", "sb")
    assert(noop.collect().isEmpty)
  }

  test("boilerplate lines: per-source df, share, threshold floor") {
    val docs = Seq(
      (1L, "s1", "alpha beta\nsubscribe now\nunique one"),
      (2L, "s1", "gamma delta\nsubscribe now"),
      (3L, "s1", "subscribe now\nsubscribe now"), // duplicate line in one doc: one vote
      (4L, "s2", "subscribe now\nother text"),    // different source: separate count
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.TextAnalysis
      .boilerplateLines(docs, "doc_id", "text", "source", "\n", minDocs = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === Map(("s1", "subscribe now") -> ((3L, 1.0))))
  }

  test("ngram novelty: reference grams seen, sub-shingle docs, zero-gram rows") {
    val ref = Seq((2L, "the quick brown fox")).toDF("doc_id", "text")
    val nw = Seq(
      (1L, "the quick red fox"), // grams: the quick(seen), quick red, red fox
      (3L, "word"),              // no bigrams -> 0/0
      (5L, "the quick brown fox")) // all seen
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.ngramNovelty(nw, ref, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 2L, 0.666667)))
    assert(got(3L) === ((0L, 0L, 0.0)))
    assert(got(5L) === ((3L, 0L, 0.0)))
  }

  test("matryoshka stats: mass fraction, zero vector, prefix shorter than dims") {
    import graft.operators.Quantization
    val d = Seq(
      (1L, Seq(3.0f, 4.0f, 0.0f, 0.0f)), // trunc@2 keeps all mass
      (2L, Seq(0.0f, 0.0f, 3.0f, 4.0f)), // trunc@2 keeps none
      (3L, Seq.empty[Float]),
    ).toDF("id", "v")
    val got = Quantization.matryoshkaStats(d, "id", "v", dims = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(1L) === ((5.0, 5.0, 1.0)))
    assert(got(2L) === ((5.0, 0.0, 0.0)))
    assert(got(3L) === ((0.0, 0.0, 0.0)))
  }

  test("centroid outliers: anti-centroid vector flags; range search radius") {
    import graft.operators.Similarity
    // 3 aligned vectors + 1 negated: centroid points along (1,0), the
    // negated vector's cosine is negative
    val vecs = Seq(
      (1L, Seq(1.0f, 0.1f)), (2L, Seq(1.0f, -0.1f)), (3L, Seq(1.0f, 0.0f)),
      (9L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(vecs, "vec_id", "embedding", minCosine = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> false, 9L -> true))

    val q = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val near = Similarity.rangeSearch(vecs, q, "vec_id", "embedding", minCosine = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near === Set((100L, 1L), (100L, 2L), (100L, 3L)))
  }

  test("sign-bit signature + Hamming search; lexical diversity exactness") {
    import graft.operators.{Similarity, TextAnalysis}
    val vecs = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f, -0.5f)),  // bits 0,2 -> 0b0101 = 5
      (2L, Seq(1.0f, 1.0f, 0.5f, -0.5f)),   // bits 0,1,2 -> 0b0111 = 7 (hamming 1 from 5)
      (3L, Seq(-1.0f, 1.0f, -0.5f, 0.5f)),  // 0b1010 = 10 (hamming 4 from 5)
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),    // zero vector -> signature 0
    ).toDF("vec_id", "embedding")
    val sig = vecs.select(col("vec_id"),
        graft.operators.Similarity.signBitSignature(col("embedding"), 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig === Map(1L -> 5L, 2L -> 7L, 3L -> 10L, 4L -> 0L))
    val q = Seq((100L, Seq(1.0f, -1.0f, 0.5f, -0.5f))).toDF("vec_id", "embedding")
    val got = Similarity.binaryHammingSearch(vecs, q, "vec_id", "embedding",
        bits = 4, maxHamming = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L), (2L, 1L))) // exact match + one-bit neighbor

    val docs = Seq(
      (1L, "a a a a"),           // 1 type / 4 tokens; simpson = 1 - 16/16 = 0
      (2L, "a b c d"),           // 4 types; simpson = 1 - 4/16 = 0.75
      (3L, ""),                  // empty
    ).toDF("doc_id", "text")
    val div = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(div(1L) === ((4L, 1L, 0.25, 0.0)))
    assert(div(2L) === ((4L, 4L, 1.0, 0.75)))
    assert(div(3L) === ((0L, 0L, 0.0, 0.0)))
  }

  test("hash sampling is deterministic, salted, and fraction-accurate") {
    val ids = (1L to 2000L).toDF("id")
    val s1 = Sampling.hashSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(s1 === s2) // re-run picks the same rows
    assert(math.abs(s1.size - 500) < 60) // ~25% of 2000
    // a larger fraction strictly extends the sample (prefix property)
    val s3 = Sampling.hashSample(ids, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
    // different salt -> a different (but same-law) sample
    val salted = Sampling.hashSample(ids, "id", 0.25, salt = "v2")
      .collect().map(_.getLong(0)).toSet
    assert(salted !== s1)
    assert(Sampling.hashSample(ids, "id", 1.0).count() === 2000)
    assert(Sampling.hashSample(ids, "id", 0.0).count() === 0)
  }

  test("stratified sampling applies per-stratum fractions") {
    val rows = (1L to 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(
      rows, "id", "lang", Map("en" -> 1.0), defaultFraction = 0.0)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("en"))
    assert(out.count() === 500)
  }

  test("sequence packing matches a sequential prefix sum, at any bucket count") {
    val rnd = new scala.util.Random(17)
    val rows = (1L to 997L).map(i => (i, rnd.nextInt(100).toLong + 1))
    val expected = {
      var acc = 0L
      rows.map { case (id, tok) => val start = acc; acc += tok; (id, start / 250L) }.toMap
    }
    val df = rows.toDF("doc_id", "n_tokens")
    for (buckets <- Seq(1, 7, 32)) {
      val got = Packing.packGreedy(df, "doc_id", "n_tokens", 250L, numBuckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got === expected, s"buckets=$buckets")
    }
    // survives a downstream coalesce(1) (physical-partition-id schemes break here)
    val coalesced = Packing.packGreedy(df, "doc_id", "n_tokens", 250L, numBuckets = 7)
      .coalesce(1).collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(coalesced === expected)
  }

  test("concat-and-split packing tiles the token stream exactly") {
    val rnd = new scala.util.Random(41)
    // zero-token docs (id % 13) must vanish; spans must tile the stream
    val rows = (1L to 403L).map(i =>
      (i, if (i % 13 == 0) 0L else rnd.nextInt(180).toLong + 1))
    val total = rows.map(_._2).sum
    val df = rows.toDF("doc_id", "n_tokens")
    val L = 64L
    for (buckets <- Seq(1, 7)) {
      val got = Packing.packConcat(df, "doc_id", "n_tokens", L, numBuckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.forall { case (_, doc, b, e) => doc % 13 != 0 && b >= 0 && b < e && e <= L })
      // spans cover every token exactly once
      assert(got.map { case (_, _, b, e) => e - b }.sum === total)
      // every sequence except the last is exactly full
      val bySeq = got.groupBy(_._1).view.mapValues(_.map(x => x._4 - x._3).sum)
      val lastSeq = bySeq.keys.max
      assert(bySeq.forall { case (s, n) => if (s == lastSeq) n > 0 else n === L })
      assert(bySeq.keys.toSeq.sorted === (0L to lastSeq).toSeq)
      // a doc's spans are contiguous across consecutive sequences
      got.groupBy(_._2).foreach { case (_, spans) =>
        val s = spans.sortBy(_._1)
        assert(s.map(_._1).toSeq === (s.head._1 to s.last._1).toSeq)
        s.init.foreach(x => assert(x._4 === L))
        s.tail.foreach(x => assert(x._3 === 0L))
      }
    }
  }

  test("shard shuffle: deterministic, balanced-ish, salt changes the order") {
    val ids = spark.range(0, 1000).select(col("id").as("doc_id"))
    val a = Packing.shuffleShards(ids, "doc_id", numShards = 8, salt = "e0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Packing.shuffleShards(ids, "doc_id", numShards = 8, salt = "e0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq) // bit-deterministic across runs
    assert(a.forall(x => x._2 >= 0 && x._2 < 8))
    val sizes = a.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size === 8 && sizes.values.forall(n => n > 60 && n < 190))
    // per-shard seq is dense 1..n
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).map(_.toLong))
    }
    // a different salt reshuffles (some doc changes shard)
    val c = Packing.shuffleShards(ids, "doc_id", numShards = 8, salt = "e1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.exists(x => c(x._1) != x._2))
    // the shuffle decorrelates id order: consecutive ids rarely stay
    // consecutive in (shard, seq) order
    val pos = a.map(x => x._1 -> (x._2, x._3)).toMap
    val adjacentKept = (0L until 999L).count { i =>
      val (s1, q1) = pos(i); val (s2, q2) = pos(i + 1)
      s1 == s2 && q2 == q1 + 1
    }
    assert(adjacentKept < 30)
  }

  test("decontamination flags only docs sharing a benchmark n-gram") {
    val bench = Seq((900L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words then alpha beta gamma delta and more"), // shares 4-gram
      (2L, "alpha beta gamma X delta epsilon"),                  // no shared 4-gram
      (3L, "beta gamma delta"),                                  // shorter than n
    ).toDF("doc_id", "text")
    val out = Decontamination.flagged(train, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L))
  }

  test("top n-grams: exact counts, deterministic tie order, top-k plan") {
    val rows = Seq(
      (1L, "a b c a b"),   // bigrams: "a b" x2, "b c", "c a"
      (2L, "a b"),         // "a b"
      (3L, "x"),           // shorter than n -> contributes nothing
      (4L, "")             // empty
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topNgrams(rows, "text", n = 2, k = 3)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a b", 3L), ("b c", 1L), ("c a", 1L)))
    // global top-k must plan as TakeOrdered (per-partition k), never a
    // full sort of the vocabulary
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("pq top-k with exact re-rank recovers brute-force top-1 on clustered vectors") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    // 8 well-separated cluster centers in 16-d; 25 jittered members each
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian().toFloat * 5f))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.1f).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = rows.filter($"vec_id" < 6).select(
      ($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val pq = Similarity.pqTopK(rows, queries, "vec_id", "embedding", 3,
      m = 4, numCodes = 8, refine = 4)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bf = Similarity.bruteForceTopK(rows, queries, "vec_id", "embedding", 3)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pq === bf) // exact re-rank: the planted source vector wins
  }

  test("char-LM nll: gibberish scores higher than target-like text; deterministic") {
    import org.apache.spark.sql.functions.col
    val english = "the quick brown fox jumps over the lazy dog and then rests in the shade"
    val rows = (
      (1L to 15L).map(i => (i, s"$english part $i", true)) ++
      Seq((98L, "the lazy brown dog jumps over the quick fox", false),
          (99L, "zxq vvkj qqpw zzzx mmvv kkqq xxzz wwqq ppzz", false))
    ).toDF("doc_id", "text", "is_target")
    val nll = Selection.charLmNll(rows, "doc_id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(98L) < nll(99L), s"target-like ${nll(98L)} should beat gibberish ${nll(99L)}")
    val again = Selection.charLmNll(rows, "doc_id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === nll)
    // short docs carry no trigrams and are excluded by contract
    val withShort = rows.union(Seq((100L, "ab", false)).toDF("doc_id", "text", "is_target"))
    assert(!Selection.charLmNll(withShort, "doc_id", "text", col("is_target"))
      .collect().map(_.getLong(0)).contains(100L))
  }

  test("dsir weights rank target-looking docs above off-target docs") {
    import org.apache.spark.sql.functions.col
    // target = "science" vocabulary; raw corpus mixes it with a disjoint
    // "cooking" vocabulary. A held-out science doc must outscore a
    // held-out cooking doc.
    val sci = "quantum relativity neutrino boson entropy tensor"
    val cook = "butter flour saute simmer whisk garlic"
    val rows = (
      (1L to 20L).map(i => (i, s"$sci token$i", true)) ++
      (21L to 40L).map(i => (i, s"$cook token$i", false)) ++
      Seq((98L, s"$sci extra", false), (99L, s"$cook extra", false))
    ).toDF("doc_id", "text", "is_target")
    val scores = Selection.dsirWeights(rows, "doc_id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(98L) > scores(99L))
    // determinism: identical literals -> identical scores on re-run
    val again = Selection.dsirWeights(rows, "doc_id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === scores)
  }

  test("budget selection keeps the exact greedy score-order prefix") {
    // scores force order 5,4,3,2,1; tokens 10 each; budget 25 -> top 2
    // whole docs plus the straddling third (its cum_before=20 < 25)
    val rows = (1L to 5L).map(i => (i, i.toDouble, 10L))
      .toDF("doc_id", "score", "n_tokens")
    val out = Selection.budgetSelect(rows, "doc_id", "score", "n_tokens", 25L,
      numBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(5L -> 0L, 4L -> 10L, 3L -> 20L))
    // ties: equal scores break by doc_id ascending
    val tied = Seq((1L, 1.0, 10L), (2L, 1.0, 10L), (3L, 1.0, 10L))
      .toDF("doc_id", "score", "n_tokens")
    val t2 = Selection.budgetSelect(tied, "doc_id", "score", "n_tokens", 15L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(t2 === Seq(1L, 2L))
  }

  test("quantile buckets equal the exact NTILE-form assignment") {
    // 20 docs, scores shuffled; 4 buckets of 5 by (score, id) rank
    val rows = (1L to 20L).map(i => (i, ((i * 7) % 20).toDouble))
      .toDF("doc_id", "score")
    val out = Selection.quantileBuckets(rows, "doc_id", "score", nBuckets = 4,
      numBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: rank in (score, id) order
    val ref = rows.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (s, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (4L * i / 20) }.toMap
    assert(out === ref)
    assert(out.values.groupBy(identity).values.map(_.size).toSet === Set(5))
  }

  test("corpus stats: per-source counts and token shares") {
    val rows = Seq(
      (1L, "web", "a b c"), (2L, "web", "d e"),
      (3L, "wiki", "f g h i j"),
    ).toDF("doc_id", "source", "text")
    val out = graft.operators.Profiling.corpusStats(rows, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("web") === ((2L, 5L, 8L, 0.5)))
    assert(out("wiki") === ((1L, 5L, 9L, 0.5)))
  }

  test("mixture sampling hits per-domain keep-rates and never upsamples") {
    // three domains with 60/30/10 token shares; target mixture 20/30/50
    // at a 0.5 budget -> rates 1/6, 1/2, 1 (capped)
    val rows = (
      (1L to 600L).map(i => (i, "web", 10L)) ++
      (601L to 900L).map(i => (i, "forum", 10L)) ++
      (901L to 1000L).map(i => (i, "wiki", 10L)) ++
      (1001L to 1100L).map(i => (i, "junk", 10L))
    ).toDF("doc_id", "source", "n_tokens")
    val weighted = rows.filter($"source" =!= "junk")
    val out = Selection.mixtureSample(weighted, "doc_id", "source", "n_tokens",
      Map("web" -> 0.2, "forum" -> 0.3, "wiki" -> 0.5), budget = 0.5)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("wiki") === 100) // rate capped at 1.0: keep everything
    assert(math.abs(bySrc("web") - 100.0) < 40)   // ~600/6
    assert(math.abs(bySrc("forum") - 150.0) < 45) // ~300/2
    // unweighted domains drop; weights must sum to 1
    val withJunk = Selection.mixtureSample(rows, "doc_id", "source", "n_tokens",
      Map("web" -> 0.2, "forum" -> 0.3, "wiki" -> 0.5), budget = 0.5)
    assert(!withJunk.select("source").distinct().collect()
      .map(_.getString(0)).contains("junk"))
    intercept[IllegalArgumentException] {
      Selection.mixtureSample(rows, "doc_id", "source", "n_tokens",
        Map("web" -> 0.5), budget = 0.5)
    }
  }

  test("temperature mixture: T=1 is the natural mix, high T flattens domains") {
    val rows = (0 until 400).map { i =>
      val d = if (i < 360) "big" else "small" // 90/10 natural split
      (i.toLong, d, 100L)
    }.toDF("doc_id", "source", "n_tokens")
    // T=1: every domain's rate equals the budget — identical to a plain
    // hash sample at that budget
    val t1 = Selection.temperatureMixture(rows, "doc_id", "source", "n_tokens",
      temperature = 1.0, budget = 0.5)
    val plain = Sampling.hashSample(rows, "doc_id", 0.5)
    assert(t1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // high T: the small domain upweights — its keep-rate must exceed the
    // big domain's
    val t5 = Selection.temperatureMixture(rows, "doc_id", "source", "n_tokens",
      temperature = 5.0, budget = 0.3)
    val kept = t5.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rateSmall = kept.getOrElse("small", 0L).toDouble / 40
    val rateBig = kept.getOrElse("big", 0L).toDouble / 360
    assert(rateSmall > rateBig,
      s"high temperature must favor the small domain ($rateSmall vs $rateBig)")
    intercept[IllegalArgumentException] {
      Selection.temperatureMixture(rows, "doc_id", "source", "n_tokens", 0.0, 0.5)
    }
  }

  test("domain weights: uniform target inverts the observed token share") {
    val rows = Seq(
      (1L, "web", "a b c d e f"), (2L, "web", "g h"),     // 8 tokens
      (3L, "wiki", "i j"),                                 // 2 tokens
      (4L, "code", "k l m n o p q r s t")                  // 10 tokens
    ).toDF("doc_id", "source", "text")
    val out = Selection.domainWeights(rows, "source",
      graft.functions.text.tokenCount($"text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out("web") === ((2L, 8L, 0.4, 0.333333, 0.833333)))
    assert(out("wiki") === ((1L, 2L, 0.1, 0.333333, 3.333333)))
    assert(out("code") === ((1L, 10L, 0.5, 0.333333, 0.666667)))
    // explicit target shares override uniform; weight>1 flags upsampling
    val tgt = Selection.domainWeights(rows, "source",
      graft.functions.text.tokenCount($"text"),
      targets = Map("web" -> 0.5, "wiki" -> 0.25, "code" -> 0.25))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(tgt("web") === 1.25 && tgt("wiki") === 2.5 && tgt("code") === 0.5)
    intercept[IllegalArgumentException] {
      Selection.domainWeights(rows, "source",
        graft.functions.text.tokenCount($"text"),
        targets = Map("web" -> 0.9)).collect()
    }
  }

  test("range join: bucketed hash path, boundary inclusivity, long-interval fallback") {
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val points = Seq(
      (1L, 101L, ts(0)),   // == interval A start (inclusive)
      (1L, 102L, ts(10)),  // inside A
      (1L, 103L, ts(20)),  // == A end (inclusive)
      (1L, 104L, ts(21)),  // just past A
      (2L, 105L, ts(10)),  // other key: no interval
      (1L, 106L, ts(500)), // inside the LONG interval only
    ).toDF("user_id", "click_id", "ts")
    val intervals = Seq(
      (1L, 900L, ts(0), ts(20)),    // A: spans 20 min
      (1L, 901L, ts(400), ts(4000)) // long: 3600 min -> broadcast path
    ).toDF("user_id", "interval_id", "start_ts", "end_ts")
    // bucket = 10 min; maxBuckets = 8 -> A explodes (3 buckets), the
    // 360-bucket interval takes the broadcast fallback
    val got = graft.operators.RangeJoin.pointInInterval(
        points, intervals, Seq("user_id"), "ts", "start_ts", "end_ts",
        bucketSeconds = 600L, maxBucketsPerInterval = 8)
      .select("interval_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === Set((900L, 101L), (900L, 102L), (900L, 103L), (901L, 106L)))
    // no keys: pure time join still answers (single bucket column join)
    val nk = graft.operators.RangeJoin.pointInInterval(
        points.drop("user_id"), intervals.drop("user_id"),
        Nil, "ts", "start_ts", "end_ts", bucketSeconds = 600L,
        maxBucketsPerInterval = 8)
      .select("interval_id", "click_id").as[(Long, Long)].collect().toSet
    assert(nk === Set((900L, 101L), (900L, 102L), (900L, 103L), (900L, 105L), (901L, 106L)))
  }

  test("interval overlap join: boundary touch, no dedup, long-side fallbacks") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val l = Seq(
      (1L, 10L, ts(0), ts(60)),     // A: [0, 60]
      (1L, 11L, ts(100), ts(160)),  // B: [100, 160]
      (1L, 12L, ts(0), ts(100000)), // C: long -> broadcast branch (left)
      (2L, 13L, ts(0), ts(60)),     // other key
    ).toDF("user_id", "l_id", "l_start", "l_end")
    val r = Seq(
      (1L, 20L, ts(60), ts(90)),    // touches A at minute 60 (closed), overlaps C
      (1L, 21L, ts(61), ts(99)),    // gap between A and B, inside C
      (1L, 22L, ts(150), ts(250)),  // overlaps B (and C) across many buckets
      (1L, 23L, ts(0), ts(90000)),  // long right -> broadcast branch
      (3L, 24L, ts(0), ts(60)),     // key with no left rows
    ).toDF("user_id", "r_id", "r_start", "r_end")
    val got = graft.operators.RangeJoin.intervalOverlap(
        l, r, Seq("user_id"), "l_start", "l_end", "r_start", "r_end",
        bucketSeconds = 600L, maxBucketsPerInterval = 8)
      .select("l_id", "r_id").as[(Long, Long)].collect().toList
    // exactly once per overlapping pair, no duplicates from shared buckets
    assert(got.size === got.distinct.size)
    val expected = for {
      (k1, li, ls, le) <- Seq(
        (1L, 10L, 0L, 60L), (1L, 11L, 100L, 160L), (1L, 12L, 0L, 100000L),
        (2L, 13L, 0L, 60L))
      (k2, ri, rs, re) <- Seq(
        (1L, 20L, 60L, 90L), (1L, 21L, 61L, 99L), (1L, 22L, 150L, 250L),
        (1L, 23L, 0L, 90000L), (3L, 24L, 0L, 60L))
      if k1 == k2 && ls <= re && rs <= le
    } yield (li, ri)
    assert(got.toSet === expected.toSet)
    assert(got.toSet.contains((10L, 20L)), "closed-boundary touch must match")
    assert(!got.toSet.contains((10L, 21L)), "gap must not match")
  }

  test("range-join broadcast guard: 1e5 always-on spans widen instead of broadcasting") {
    import org.apache.spark.sql.functions.{col, lit, timestamp_seconds}
    // 100k intervals ALL spanning ~3600 s: at bucketSeconds=1 every span
    // covers >8 buckets, so without the guard the whole table is one
    // unbounded broadcast build. The guard widens 1->8->64->512 s; at
    // 512 s the spans cover <=7 buckets and explode as plain hash rows.
    val intervals = spark.range(100000L).select(
      col("id").as("interval_id"),
      timestamp_seconds(col("id") % 100).as("start_ts"),
      timestamp_seconds(lit(3600) + col("id") % 50).as("end_ts"))
    val points = Seq((1L, new java.sql.Timestamp(1800L * 1000))).toDF("click_id", "ts")
    val n = graft.operators.RangeJoin.pointInInterval(
      points, intervals, Nil, "ts", "start_ts", "end_ts",
      bucketSeconds = 1L, maxBucketsPerInterval = 8, maxBroadcastRows = 100).count()
    assert(n === 100000L)
    // with widening disabled the operator fails fast instead of OOMing
    intercept[IllegalStateException] {
      graft.operators.RangeJoin.pointInInterval(
        points, intervals, Nil, "ts", "start_ts", "end_ts",
        bucketSeconds = 1L, maxBucketsPerInterval = 8, maxBroadcastRows = 100,
        widenAttempts = 0)
    }
    // non-key output columns must be disjoint (documented contract)
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.intervalOverlap(
        intervals, intervals, Nil, "start_ts", "end_ts", "start_ts", "end_ts", 60L)
    }
  }

  test("containment pairs: embedded excerpt, minShingles floor, df cap") {
    val d = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // 9 bigrams
      (2L, "w3 w4 w5 w6 w7"),                 // 4 bigrams, all inside doc 1
      (3L, "x1 x2 x3 x4 x5"),                 // unrelated
      (4L, "w1 w2 w3"),                       // contained but only 2 bigrams
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text",
        shingleSize = 2, threshold = 0.8, maxDf = 64, minShingles = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // jaccard of (1,2) is 4/9 ≈ 0.44 — invisible to a 0.8 jaccard gate;
    // containment is 4/min(9,4) = 1.0
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) === ((9L, 4L, 4L, 1.0)))
    // df cap 1 empties the inverted index -> no candidates at all
    assert(Dedup.containmentPairs(d, "doc_id", "text",
      shingleSize = 2, threshold = 0.8, maxDf = 1, minShingles = 4).count() === 0L)
  }

  test("weighted sample: rate formula, zero weights, clipping, determinism") {
    val d = Seq((1L, 10L), (2L, 30L), (3L, 0L), (4L, 10L), (5L, 50L))
      .toDF("k", "w")
    def md5hex4(s: String): String = {
      val dg = java.security.MessageDigest.getInstance("MD5")
      dg.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
    }
    // replicate the operator arithmetic exactly: rows with w=0 never
    // survive; everyone else keeps iff md5 prefix < per-row threshold
    val W = 100.0; val n = 5.0; val f = 0.4
    val expected = Seq((1L, 10L), (2L, 30L), (4L, 10L), (5L, 50L)).filter {
      case (k, w) =>
        val rate = math.min(1.0, f * w * n / W)
        val bucket = math.round(rate * 65536)
        val thr = if (rate >= 1.0 || bucket >= 65536) "g" else f"$bucket%04x"
        md5hex4(k.toString) < thr
    }.map(_._1).toSet
    val got = Sampling.weightedSample(d, "k", "w", fraction = f)
      .select("k").as[Long].collect().toSet
    assert(got === expected)
    assert(!got.contains(3L))
    // clipping: one row heavy enough that its rate saturates at 1.0
    val clip = Seq((1L, 1L), (2L, 1000000L)).toDF("k", "w")
    val kept = Sampling.weightedSample(clip, "k", "w", fraction = 0.5)
      .select("k").as[Long].collect().toSet
    assert(kept.contains(2L)) // rate 1.0 -> always kept
    // determinism
    val again = Sampling.weightedSample(d, "k", "w", fraction = f)
      .select("k").as[Long].collect().toSet
    assert(again === got)
  }

  test("split assign: total coverage, cumulative cuts, determinism") {
    val d = (1L to 200L).toDF("k")
    val out = Sampling.splitAssign(d, "k",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() === 200L)
    val byLabel = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel.values.sum === 200L)
    assert(byLabel("train") > byLabel("val") + byLabel("test"))
    // manual replay of the cuts for a few keys
    def md5hex4(s: String): String = {
      val dg = java.security.MessageDigest.getInstance("MD5")
      dg.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
    }
    val t08 = f"${math.round(0.8 * 65536)}%04x"
    val t09 = f"${math.round((0.8 + 0.1) * 65536)}%04x"
    val assigned = out.as[(Long, String)].collect().toMap
    for (k <- 1L to 20L) {
      val h = md5hex4(k.toString)
      val want = if (h < t08) "train" else if (h < t09) "val" else "test"
      assert(assigned(k) === want, s"key $k hash $h")
    }
    // a single split takes everything
    val one = Sampling.splitAssign(d, "k", Seq("all" -> 1.0))
      .select("split").distinct().as[String].collect().toSeq
    assert(one === Seq("all"))
  }

  test("leak-free split: components share one split, singletons keep their own key") {
    val d = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val splits = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2)
    val got = Sampling.splitAssignLeakFree(d, "doc_id", pairs, "a", "b", splits)
      .as[(Long, String)].collect().toMap
    assert(got.size === 10)
    // cluster {1,2,3} and cluster {7,8} are each wholly in ONE split
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(7L) === got(8L))
    // the cluster split is the plain split of its representative (min id)
    val plain = Sampling.splitAssign(d, "doc_id", splits)
      .as[(Long, String)].collect().toMap
    assert(got(3L) === plain(1L))
    assert(got(8L) === plain(7L))
    // docs in no pair are untouched
    for (k <- Seq(4L, 5L, 6L, 9L, 10L)) assert(got(k) === plain(k))
  }

  test("readability: syllable heuristic, sentence floor, flesch formula, empty doc") {
    val d = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sentences, 6 syllables
      (2L, "strength"),                    // 1 word, 1 syllable group ("e")
      (3L, "xyz"),                         // no vowel group -> floor 1 syllable
      (4L, ""),                            // empty: 0 words, flesch null
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(1L)._1 === 6L && got(1L)._2 === 2L && got(1L)._3 === 6L)
    val expected1 = 206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)
    assert(got(1L)._4.get === expected1)
    assert(got(2L) === ((1L, 1L, 1L,
      Some(206.835 - 1.015 * (1.0 / 1) - 84.6 * (1.0 / 1)))))
    assert(got(3L)._3 === 1L) // vowel-less word floors at one syllable
    assert(got(4L) === ((0L, 1L, 0L, None)))
  }

  test("token length histogram: log2 bands, zero-token band, mass totals") {
    val d = Seq(
      (1L, "a"),                 // 1 token  -> band 0
      (2L, "a b"),               // 2 tokens -> band 1
      (3L, "a b c"),             // 3 tokens -> band 1
      (4L, "a b c d"),           // 4 tokens -> band 2
      (5L, "   "),               // 0 tokens -> band -1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenLengthHistogram(d, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(-1L) === ((1L, 0L)))
    assert(got(0L) === ((1L, 1L)))
    assert(got(1L) === ((2L, 5L)))
    assert(got(2L) === ((1L, 4L)))
  }

  test("script mix: counts, dominance priority, mixed flag, empty doc") {
    val d = Seq(
      (1L, "hello world"),   // pure latin
      (2L, "汉字文本"),        // cjk dominant, no latin
      (3L, "abc привет"),    // cyrillic 6 > latin 3 -> cyrillic, mixed
      (4L, ""),              // none
      (5L, "abcdef л"),      // 1/7 non-dominant = 0.143 < 0.15 -> not mixed
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptMix(d, "doc_id", "text")
      .select("doc_id", "n_latin", "n_cjk", "n_cyrillic", "dominant", "mixed")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getBoolean(5))).toMap
    assert(got(1L) === ((10L, 0L, 0L, "latin", false)))
    assert(got(2L) === ((0L, 4L, 0L, "cjk", false)))
    assert(got(3L) === ((3L, 0L, 6L, "cyrillic", true)))
    assert(got(4L) === ((0L, 0L, 0L, "none", false)))
    assert(got(5L) === ((6L, 0L, 1L, "latin", false)))
  }

  test("vocab coverage: top-k cut, tie order, zero-token docs") {
    val d = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "   "),
    ).toDF("doc_id", "text")
    // freq: a=3, b=1, c=1; vocabSize 2 cuts at (count desc, word asc)
    // -> {a, b}; c is OOV
    val got = TextAnalysis.vocabCoverage(d, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) === ((3L, 0L, 0.0)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((0L, 0L, 0.0)))
  }

  test("int4 block quantization: per-block scales, outlier isolation, ragged tail") {
    import graft.operators.Quantization
    val d = Seq((1L, Seq(1.0f, 2.0f, 100.0f, 0.5f, 3.0f))).toDF("id", "v")
    val row = Quantization.quantizeInt4Block(d, "id", "v", blockSize = 2)
      .select("scales", "qvec").head()
    val scales = row.getSeq[Double](0)
    val q = row.getSeq[Int](1)
    // blocks: [1,2] scale 2/7, [100,0.5] scale 100/7, ragged [3] scale 3/7
    val s0 = 2.0 / 7.0; val s1 = 100.0 / 7.0; val s2 = 3.0 / 7.0
    assert(scales === Seq(s0, s1, s2))
    assert(q === Seq(
      math.floor(1.0 / s0 + 0.5).toInt, // 4 — survives the outlier
      math.floor(2.0 / s0 + 0.5).toInt, // 7
      math.floor(100.0 / s1 + 0.5).toInt, // 7
      math.floor(0.5 / s1 + 0.5).toInt, // 0
      math.floor(3.0 / s2 + 0.5).toInt)) // 7
    // contrast: one per-VECTOR int8 scale collapses dim 4 to zero but a
    // per-vector int4 grid would also flatten dims 1/2 — the block scales
    // keep them at 4/7 resolution (asserted above via q(0) = 4)
    assert(q(0) === 4 && q(1) === 7)
    // zero block quantizes to zeros with scale 0
    val z = Quantization.quantizeInt4Block(
        Seq((1L, Seq(0.0f, 0.0f, 1.0f))).toDF("id", "v"), "id", "v", blockSize = 2)
      .select("scales", "qvec").head()
    assert(z.getSeq[Double](0).head === 0.0)
    assert(z.getSeq[Int](1).take(2) === Seq(0, 0))
    // EMPTY vector: zero blocks, zero scales (sequence(0,-1) would count
    // DOWN and mint two phantom scales without the size guard)
    val e = Quantization.quantizeInt4Stats(
        Seq((1L, Seq.empty[Float])).toDF("id", "v"), "id", "v", blockSize = 2)
      .select("n_blocks", "qsum").head()
    assert(e.getLong(0) === 0L)
  }

  test("integer pagerank: matches a driver-side reference simulation exactly") {
    import graft.operators.Graph
    // 4 is a dangling node (appears only as a destination)
    val edges = Seq(
      (1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (2L, 4L, 2L),
    ).toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, "src", "dst", "w", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: same integer arithmetic over Scala maps
    val es = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (2L, 4L, 2L))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val ow = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val base = 1000000000000L / nodes.size
    val teleport = base * 15 / 100
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val contrib = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map(e => r(e._1) * e._3 / ow(e._1)).sum
      }
      r = nodes.map(v => v -> (contrib.getOrElse(v, 0L) * 85 / 100 + teleport)).toMap
    }
    assert(got === r)
    // the dangling node holds exactly its inbound share (it redistributes
    // nothing, by contract), and total mass never exceeds the scale
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.sum <= 1000000000000L)
  }

  test("triangle counts: degree-oriented enumeration matches brute force") {
    import graft.operators.Graph
    // messy input: duplicates, both directions, self-loop, a hub (node 1
    // touches everything — the degree orientation must not enumerate
    // wedges at it). Triangles: {1,2,3}, {1,3,4}, {1,2,5} and {2,3,5}
    // would need (2,5),(3,5),(2,3): present -> {2,3,5} too.
    val raw = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L),
      (3L, 4L), (2L, 5L), (3L, 5L), (2L, 3L), (6L, 6L), (6L, 7L),
    )
    val got = Graph.triangleCounts(raw.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force reference over the cleaned undirected edge set
    val und = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      x <- nodes; y <- nodes if x < y; z <- nodes if y < z
      if und((x, y)) && und((y, z)) && und((x, z))
    } yield (x, y, z)
    val ref = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
    assert(got === ref)
    assert(!got.contains(6L) && !got.contains(7L)) // self-loop/leaf emit none
  }

  test("label propagation: two weighted-majority rounds match a simulation") {
    import graft.operators.Graph
    val es = Seq(
      // node 10/20 seeded; 30 hears 10 (w=3) and 20 (w=1) -> adopts 10's
      // label; 40 hears only 30 (labeled after round 1) -> adopts in
      // round 2; 50 hears equal votes from both seeds -> smallest label
      (10L, 30L, 3L), (20L, 30L, 1L), (30L, 40L, 5L),
      (10L, 50L, 2L), (20L, 50L, 2L), (60L, 40L, 1L),
    )
    val seeds = Seq((10L, 7L), (20L, 2L)).toDF("node", "label")
    val got = Graph.labelPropagate(
        es.toDF("src", "dst", "w"), "src", "dst", "w", seeds, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: 30 -> 7 (votes 3 vs 1), 50 -> 2 (tie 2=2, smallest label),
    // 40: only unlabeled voters (30, 60) -> stays unlabeled
    // round 2: 30, 50 recompute identically; 40 hears 30 (label 7, w=5)
    assert(got === Map(10L -> 7L, 20L -> 2L, 30L -> 7L, 50L -> 2L, 40L -> 7L))
    // seeds never flip even when outvoted: re-run with an edge hammering
    // seed 20 with label 7 mass
    val es2 = es ++ Seq((10L, 20L, 100L))
    val got2 = Graph.labelPropagate(
        es2.toDF("src", "dst", "w"), "src", "dst", "w", seeds, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(20L) === 2L)
  }

  test("cdc chunks: boundary re-sync after an insertion; reference replica agrees") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val b = "INSERTED " + a // one-token insertion at the front
    val d = Seq((1L, a), (2L, b), (3L, "unrelated filler words entirely")).toDF("doc_id", "text")
    val got = Dedup.cdcChunks(d, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // reference replica: same tokenize/boundary/assemble rules in plain Scala
    def chunksOf(text: String): Seq[String] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      toks.foreach { t =>
        cur = cur :+ t
        // a boundary token CLOSES its chunk (the cut falls after it)
        if (md5hex(t).head < '2') { out += cur; cur = Vector.empty }
      }
      if (cur.nonEmpty) out += cur
      out.map(_.mkString(" ")).toSeq
    }
    val all = Seq(1L -> a, 2L -> b, 3L -> "unrelated filler words entirely")
      .flatMap { case (id, t) => chunksOf(t).map(c => (id, c)) }
    val expected = all.groupBy(_._2).collect {
      case (c, occ) if occ.map(_._1).distinct.size >= 2 =>
        (md5hex(c), c.split(" ").length.toLong,
          occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }.toSet
    assert(got === expected)
    // CDC's point: the docs share at least one re-synchronized chunk even
    // though the insertion shifted every fixed-width boundary
    assert(got.nonEmpty)
  }

  test("cdc chunk cut: canonical first occurrence survives, copies cut, reassembly ordered") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val b = "INSERTED " + a
    val d = Seq((1L, a), (2L, b), (3L, "unrelated filler words entirely")).toDF("doc_id", "text")
    val got = Dedup.cdcChunkCut(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // reference replica
    def chunksOf(text: String): Seq[String] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      toks.foreach { t =>
        cur = cur :+ t
        if (md5hex(t).head < '2') { out += cur; cur = Vector.empty }
      }
      if (cur.nonEmpty) out += cur
      out.map(_.mkString(" ")).toSeq
    }
    val docs = Seq(1L -> a, 2L -> b, 3L -> "unrelated filler words entirely")
    val occs = docs.flatMap { case (id, t) =>
      chunksOf(t).zipWithIndex.map { case (c, i) => (id, i.toLong, c) }
    }
    val canonical = occs.groupBy(_._3).map { case (c, os) =>
      c -> os.minBy(o => (o._1, o._2))
    }
    val expected = docs.map { case (id, t) =>
      val cs = chunksOf(t).zipWithIndex
      val kept = cs.filter { case (c, i) => canonical(c) == ((id, i.toLong, c)) }
      id -> (
        cs.map(_._1.split(" ").length.toLong).sum,
        kept.map(_._1.split(" ").length.toLong).sum,
        kept.map(_._1).mkString(" "))
    }.toMap
    assert(got === expected)
    // doc 1 (lower id) keeps everything; doc 2 loses its re-synchronized
    // shared chunks to doc 1's canonical copies
    assert(got(1L)._1 === got(1L)._2)
    assert(got(2L)._2 < got(2L)._1)
  }

  test("cdc incremental: shifted re-crawl flags mostly_known, fresh content does not") {
    // history = doc 1; batch doc 2 is doc 1 with a front insertion (CDC
    // boundaries re-sync, so its downstream chunks are already indexed),
    // batch doc 5 is fresh
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val hist = Seq((1L, a)).toDF("doc_id", "text")
    val idx = Dedup.cdcChunkIndex(hist, "doc_id", "text")
    val batch = Seq(
      (2L, "INSERTED " + a),
      (5L, "entirely different words about nothing shared at all")).toDF("doc_id", "text")
    val got = Dedup.cdcIncrementalFlags(batch, idx, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // doc 2: most token mass is known (only the head chunk changed)
    assert(got(2L)._5 === true)
    assert(got(2L)._4 > 0 && got(2L)._4 < got(2L)._2)
    // doc 5: nothing known
    assert(got(5L)._3 === 0L && got(5L)._4 === 0L && got(5L)._5 === false)
    // the index row shape: one row per distinct chunk with its copy count
    val ix = idx.collect()
    assert(ix.map(_.getString(0)).distinct.length === ix.length)
    assert(ix.forall(_.getLong(3) >= 1L))
  }

  test("filtered ann: both strategy paths honor the predicate and find the planted match") {
    import graft.operators.Similarity
    // 40 near-orthogonal-ish deterministic vectors, half labeled even;
    // query = jittered copy of an even vector whose nearest OVERALL
    // neighbor is an odd-labeled exact-direction twin — the filter must
    // exclude it on BOTH paths
    val base = (0 until 40).map { i =>
      val v = Array.tabulate(8)(d => if (d == i % 8) 1.0f else 0.01f * ((i + d) % 5))
      (i.toLong, v.toSeq, i % 2)
    }
    // vec 1 (odd) duplicates vec 0's direction exactly: unfiltered rank-1
    // for the query would be whichever of {0, 1} wins the tiebreak
    val rows = base.map { case (id, v, l) =>
      if (id == 1L) (id, base(0)._2, l) else (id, v, l)
    }
    val d = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val q = spark.createDataFrame(Seq(
      (1000000L, rows(0)._2.map(x => x * 1.001f)))).toDF("vec_id", "embedding")
    for (bruteMax <- Seq(100000L, 0L)) {
      val got = Similarity.filteredTopK(d, q, "vec_id", "embedding",
          pmod(col("label"), lit(2)) === 0, k = 3, bruteMax = bruteMax)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.nonEmpty, s"bruteMax=$bruteMax")
      // every neighbor is even-labeled (1, the odd twin, excluded)
      assert(got.forall(_._2 % 2 == 0), s"bruteMax=$bruteMax: $got")
      assert(got.find(_._3 == 1).map(_._2) === Some(0L), s"bruteMax=$bruteMax")
    }
  }

  test("kmeans assignment: large-k literal fold equals driver brute force") {
    import graft.operators.Clustering
    // 80 deterministic 4-dim vectors at k=32 and k=33 — the literal
    // fold must stay exact as the expression grows (the broadcast-join
    // alternative was measured slower and removed; this pins the
    // surviving path against a brute force of the same integer math)
    val vecs = (0 until 80).map { i =>
      (i.toLong, Seq(
        ((i * 37) % 17 - 8) / 8.0f, ((i * 53) % 13 - 6) / 8.0f,
        ((i * 71) % 19 - 9) / 8.0f, ((i * 29) % 11 - 5) / 8.0f))
    }
    val d = spark.createDataFrame(vecs).toDF("id", "v")
    def brute(k: Int): Map[Long, Long] = {
      val q = vecs.map { case (id, v) => id -> v.map(x => math.floor(x * 1024.0).toLong) }
      var cents: Seq[(Long, Seq[Long])] = q.take(k).map { case (id, e) => (id, e) }
      // one Lloyd iteration, floor-of-mean centroids, lowest-cid ties
      def assign(cs: Seq[(Long, Seq[Long])]): Map[Long, Long] =
        q.map { case (id, e) =>
          id -> cs.map { case (cid, c) =>
            (e.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
          }.min._2
        }.toMap
      val a0 = assign(cents)
      cents = a0.groupBy(_._2).toSeq.sortBy(_._1).map { case (cid, members) =>
        val es = members.keys.toSeq.map(id => q.find(_._1 == id).get._2)
        (cid, (0 until 4).map(dim =>
          math.floor(es.map(_(dim)).sum.toDouble / es.size).toLong))
      }
      assign(cents)
    }
    for (k <- Seq(32, 33)) {
      val got = Clustering.kmeansAssign(d, "id", "v", k = k, iters = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(k), s"k=$k")
    }
  }

  test("embedding anisotropy: exact integer covariance numerators, top-k order") {
    import graft.operators.Profiling
    // dims=3; values chosen so quantization floor(x*1024) is exact
    val d = Seq(
      (1L, Seq(1.0f, 0.5f, -0.25f)),
      (2L, Seq(0.5f, 1.0f, 0.25f)),
      (3L, Seq(-0.5f, -1.0f, 0.5f)),
    ).toDF("id", "v")
    val got = Profiling.embeddingAnisotropy(d, "v", dims = 3, topK = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val q = Seq(
      Seq(1024L, 512L, -256L), Seq(512L, 1024L, 256L), Seq(-512L, -1024L, 512L))
    def cov(i: Int, j: Int): Long = {
      val n = BigInt(q.size)
      val s = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val mi = q.map(v => BigInt(v(i))).sum
      val mj = q.map(v => BigInt(v(j))).sum
      val num = n * s - mi * mj
      (num.signum * (num.abs / (n * n))).toLong
    }
    assert(got === Map((1L, 2L) -> cov(0, 1), (1L, 3L) -> cov(0, 2), (2L, 3L) -> cov(1, 2)))
  }

  test("hll sketch: accuracy envelope, duplicate-invariance, merge-by-max") {
    import graft.operators.Sketches
    val n = 20000L
    val d = spark.range(n).select(col("id").cast("string").as("k"))
    val row = Sketches.hllNdv(d, col("k")).collect().head
    val est = row.getLong(2)
    // m=256 -> sigma ~6.5%; 20% is a 3-sigma envelope on a FIXED hash
    // (deterministic, so this can never flake)
    assert(math.abs(est - n) <= n / 5, s"est=$est")
    // duplicates must not move the estimate (registers are maxes)
    val dup = d.union(d).union(d.limit(500)).repartition(7)
    assert(Sketches.hllNdv(dup, col("k")).collect().head.getLong(2) === est)
    // mergeability: max-combining two halves' registers = whole-set sketch
    val h1 = d.filter(col("k").cast("long") < n / 2)
    val h2 = d.filter(col("k").cast("long") >= n / 2)
    val merged = Sketches.hllNdv(h1.union(h2), col("k")).collect().head
    assert(merged.getLong(2) === est)
  }

  test("count-min sketch: estimates dominate true counts; shards merge by sum") {
    import graft.operators.Sketches
    // known multiset: key i appears i times, i in 1..50
    val d = spark.range(1, 51).select(col("id"),
        explode(sequence(lit(1), col("id"))).as("rep"))
      .select(concat(lit("k"), col("id")).as("k"))
    val sk = Sketches.countMin(d, col("k"), depth = 4, width = 512)
    val probes = spark.range(1, 51)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("true_c"))
    val got = Sketches.cmEstimate(probes, col("k"), sk, 4, 512)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === 50)
    got.foreach { case (k, (t, e)) =>
      assert(e >= t, s"$k: cm $e < true $t")
      assert(e <= 1275L, s"$k: cm $e above total mass") // sum 1..50
    }
    // shard merge: cell-wise sums of two half-sketches = whole sketch
    val (a, b) = (d.limit(600), d.exceptAll(d.limit(600)))
    val mergedCells = Sketches.countMin(a, col("k"), 4, 512)
      .unionByName(Sketches.countMin(b, col("k"), 4, 512))
      .groupBy("salt", "cell").agg(sum("c").as("c"))
    val whole = sk.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = mergedCells.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("grouped hll: per-group registers equal per-slice sketches") {
    import graft.operators.Sketches
    val d = spark.range(30000).select(
      (col("id") % 3).as("g"), col("id").cast("string").as("k"))
    val grouped = Sketches.hllNdvBy(d, col("k"), "g")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(grouped.keySet === Set(0L, 1L, 2L))
    for (g <- 0L to 2L) {
      val solo = Sketches.hllNdv(d.filter(col("g") === g), col("k"))
        .collect().head
      assert(grouped(g) === ((solo.getLong(1), solo.getLong(2))), s"g=$g")
      // each slice holds 10k distinct keys; 20% = 3-sigma at m=256
      assert(math.abs(grouped(g)._2 - 10000L) <= 2000L)
    }
  }

  test("exact permilles: bucketed rank path matches a full sort") {
    import graft.operators.Sketches
    // deterministic ragged values with heavy ties
    val d = spark.range(1, 5001).select(col("id").as("tie"),
      (pmod(col("id") * 2654435761L, lit(9973L)) +
        when(pmod(col("id"), lit(10)) < 3, 0L).otherwise(lit(0L))).as("v"))
    val got = Sketches.exactPermilles(d, "v", "tie", Seq(0, 500, 900, 990, 1000))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sorted = d.orderBy(col("v"), col("tie")).collect().map(_.getLong(1))
    val nn = sorted.length
    for (q <- Seq(0, 500, 900, 990, 1000)) {
      val r = (nn - 1) * q / 1000 + 1
      assert(got(q.toLong) === ((r.toLong, sorted(r - 1))), s"q=$q")
    }
  }

  test("skew advisor: shares and salt factors are exact ceil arithmetic") {
    import graft.operators.Sketches
    // 100 rows: key "hot" x 40, "warm" x 35, "cold" x 25
    val d = spark.range(100).select(
      when(col("id") < 40, "hot").when(col("id") < 75, "warm")
        .otherwise("cold").as("k"))
    val got = Sketches.skewAdvisor(d, "k", parallelism = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      "hot" -> ((40L, 400000L, 4L)),   // ceil(40*8/100) = 4
      "warm" -> ((35L, 350000L, 3L)),  // ceil(280/100) = 3
      "cold" -> ((25L, 250000L, 2L)))) // ceil(200/100) = 2
  }

  test("doremi weights: fixed-point multiplicative updates match a scalar replay exactly") {
    import graft.operators.Sampling
    // a: 2 docs mean 10 (trails corpus mean 22 -> positive excess);
    // b: mean 40, c: mean 30 (no excess — equal weights throughout)
    val rows = Seq(("a", 10L), ("a", 10L), ("b", 40L), ("c", 30L)).toDF("source", "tk")
    val got = Sampling.doremiWeights(rows, "source", "tk")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // scalar replay of the SAME integer arithmetic
    val g = 90L / 4L
    def excess(m: Long) = math.max(g - m, 0L) * 1048576L / math.max(g, 1L)
    val e = Map("a" -> excess(10L), "b" -> excess(40L), "c" -> excess(30L))
    var w = Map("a" -> 1048576L / 3, "b" -> 1048576L / 3, "c" -> 1048576L / 3)
    for (_ <- 1 to 5) {
      val raw = w.map { case (k, v) =>
        k -> v * (1048576L + (262144L * e(k) / 1048576L)) / 1048576L }
      val s = raw.values.sum
      w = raw.map { case (k, v) => k -> v * 1048576L / s }
    }
    val fin = w.map { case (k, v) => k -> (v * (1048576L - 16384L) / 1048576L + 16384L / 3) }
    assert(got("a") === ((2L, 10L, e("a"), fin("a"), fin("a").toDouble / 1048576)))
    assert(got("b") === ((1L, 40L, 0L, fin("b"), fin("b").toDouble / 1048576)))
    assert(got("c") === ((1L, 30L, 0L, fin("c"), fin("c").toDouble / 1048576)))
    // MW semantics: the deficit domain is upweighted past uniform, the
    // others split the remainder equally; total mass ~2^20 (div slack)
    assert(fin("a") > 1048576L / 3 && fin("b") === fin("c"))
    assert(math.abs(fin.values.sum - 1048576L) <= 8)
    // zero iterations degenerate to smoothed uniform
    val flat = Sampling.doremiWeights(rows, "source", "tk", iters = 0)
      .select(col("weight_fp")).collect().map(_.getLong(0)).distinct
    assert(flat.length === 1)
  }

  test("incremental CC write-back: a three-batch chain over REAL tables equals the full recompute") {
    import graft.tables.{IcePartitionField, IcePartitionSpec}
    // batches by doc_id % 3. The chain only closes if applyComponentDelta
    // really updates BOTH tables between batches:
    //  - Y: {9,12} cluster in b1 (comp 9); b2's 1 relabels it to comp 1;
    //    b3's 14 pairs against the REFRESHED index rows — a stale
    //    component 9 there would contract 14's super-edge onto a label
    //    that no longer exists in the label table;
    //  - Z: 4 (b2) & 2 (b3) — 2 pairs only with an index row APPENDED by
    //    b2's write-back;
    //  - W: 10 (b2, unclustered — appended with null component) & 8 (b3)
    //    — first labels for an indexed-but-never-clustered doc;
    //  - V: {3,6} b1-only cluster that must never rewrite;
    //  - 7 (b2), 5/11 (b3): singletons, no rows anywhere.
    val yBase = "parquet manifests snapshot metadata tables spark catalyst optimizer rules engine"
    val zBase = "streaming watermark state store microbatch trigger offsets checkpoint recovery logic"
    val wBase = "entirely standalone content speaking about nothing shared with any other documents"
    val vBase = "colorless green ideas sleep furiously while the sun sets behind distant hills"
    val all = Seq(
      (9L, s"$yBase alpha"), (12L, s"$yBase beta"),   // b1
      (3L, s"$vBase one"), (6L, s"$vBase two"),       // b1
      (1L, s"$yBase gamma"),                          // b2: relabels Y
      (4L, s"$zBase first"),                          // b2
      (10L, s"$wBase uno"),                           // b2: unclustered
      (7L, "isolated vocabulary entirely untouched by anything else written here today"), // b2
      (13L, "another lonely text with words that match no sibling in this corpus"), // b2
      (14L, s"$yBase delta"),                         // b3: joins Y
      (2L, s"$zBase second"),                         // b3: pairs with 4
      (8L, s"$wBase dos"),                            // b3: pairs with 10
      (5L, "final solitary passage concerning matters shared with absolutely no neighbor"), // b3
      (11L, "closing standalone remark whose tokens overlap nothing previously enumerated at all"), // b3
    ).toDF("doc_id", "text")
    val b1 = all.filter(col("doc_id") % 3 === 0)
    val l1 = Dedup.textComponents(b1, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
    val withB = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("cbucket", pmod(col("component"), lit(16L)))
    val ltbl = SparkEntry.freshTable(spark, "cc_chain_labels", withB(l1),
      spec = sch => IcePartitionSpec(0, List(IcePartitionField(
        sch.findField("cbucket").get.id, 1000, "identity", "cbucket_p"))))
    ltbl.append(spark, withB(l1))
    val idx1 = Dedup.minhashIndex(b1, "doc_id", "text",
        shingleSize = 2, bands = 16, rowsPerBand = 4)
      .join(l1, Seq("doc_id"), "left")
    val itbl = SparkEntry.freshTable(spark, "cc_chain_index", idx1)
    itbl.append(spark, idx1)
    for (m <- Seq(1, 2)) {
      val batch = all.filter(col("doc_id") % 3 === m)
      val newOld = Dedup.incrementalPairs(batch, itbl.scan(spark),
          "doc_id", "text", shingleSize = 2, bands = 16, rowsPerBand = 4,
          jaccardThreshold = 0.4, keepIndexCols = Seq("component"))
        .select(col("nid").as("sa"), coalesce(col("component"), col("iid")).as("sb"))
      val newNew = Dedup.minhashLsh(batch, "doc_id", "text",
          shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4)
        .select(col("a").as("sa"), col("b").as("sb"))
      val delta = Dedup.mergeComponentLabels(ltbl.scan(spark),
        newOld.unionByName(newNew), "sa", "sb", bucketCol = Some(("cbucket", 16)))
      Dedup.applyComponentDelta(spark, ltbl, itbl, delta,
        Dedup.minhashIndex(batch, "doc_id", "text",
          shingleSize = 2, bands = 16, rowsPerBand = 4),
        bucketCol = Some(("cbucket", 16)))
    }
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val chained = asMap(ltbl.scan(spark).select(col("doc_id"), col("component")))
    val full = asMap(Dedup.textComponents(all, "doc_id", "text",
      shingleSize = 2, bands = 16, rowsPerBand = 4, jaccardThreshold = 0.4))
    assert(chained === full)
    assert(chained(14L) === 1L && chained(12L) === 1L) // Y relabeled through the chain
    assert(chained(2L) === 2L && chained(8L) === 8L && chained(3L) === 3L)
    assert(!chained.contains(7L) && !chained.contains(5L))
    // the INDEX's component column converged to the label table too —
    // that is what batch 3's pair generation contracted against
    val idxComp = itbl.scan(spark).select(col("doc_id"), col("component"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(idxComp(9L) === Some(1L) && idxComp(12L) === Some(1L))
    assert(idxComp(10L) === Some(8L)) // unclustered-then-labeled refreshed
    assert(idxComp(7L) === None)      // still unclustered, still indexed
    assert(idxComp.size === all.count().toInt) // every doc findable by the next batch
  }

  test("persisted graph index: walk equals the in-session ann_beam walk; probes prune partitions") {
    // synthetic 64-dim embeddings, 96 vectors -> k=4 cells (max(4, 96/250)),
    // buckets = max(16, ceil(96/8)) = 16 at bucketTarget=8
    val dim = 64
    val vecs = (0L until 96L).map { i =>
      val arr = Array.tabulate(dim)(d =>
        (math.sin(i * 0.37 + d * 0.11) * 0.5 + (if (d % 4 == (i % 4).toInt) 0.45f else 0.0)).toFloat)
      (i, arr.toSeq)
    }.toDF("vec_id", "embedding")
    val loc = java.nio.file.Files
      .createTempDirectory("graft-beamidx-spec").toUri.toString.stripSuffix("/")
    Similarity.buildGraphIndex(vecs, "vec_id", "embedding", loc, bucketTarget = 8)
    val got = Similarity.graphIndexTopK(spark, loc, queryIds = 0L until 8L)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    // replay the SAME walk in-session (the ann_beam shape): quantized
    // vectors, kmeansFit cells, symmetrized cell-local top-5, rep entry,
    // three beam-of-8 layers, final top-3 — results must be identical
    import org.apache.spark.sql.expressions.Window
    val (_, asg) = graft.operators.Clustering.kmeansFit(vecs, "vec_id", "embedding", k = 4, iters = 1)
    val withCell = vecs.select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * 1024).cast("long")).as("nv"))
      .join(asg, "vec_id")
    val dot = aggregate(zip_with(col("qv"), col("nv"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val knn = withCell.select(col("cluster"), col("vec_id").as("src"), col("nv").as("qv"))
      .join(withCell.select(col("cluster"), col("vec_id").as("dst"), col("nv")), Seq("cluster"))
      .filter(col("src") =!= col("dst"))
      .withColumn("dot_q", dot)
      .withColumn("r", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("dot_q").desc, col("dst"))))
      .filter(col("r") <= 5).select(col("src"), col("dst"))
    val edges = knn.unionByName(knn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val reps = withCell.groupBy("cluster").agg(min(col("vec_id")).as("rep"))
    val qvecs = withCell.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("nv").as("qv"), col("cluster"))
    var frontier = qvecs.join(reps, Seq("cluster")).select(col("qid"), col("rep").as("node"))
    def rescore(f: org.apache.spark.sql.DataFrame) = f
      .join(withCell.select(col("vec_id").as("node"), col("nv")), "node")
      .join(qvecs.select(col("qid"), col("qv")), "qid")
      .withColumn("dot_q", dot)
    for (_ <- 1 to 3) {
      val cand = frontier.unionByName(
          frontier.join(edges, frontier("node") === edges("src"))
            .select(col("qid"), col("dst").as("node")))
        .distinct()
      frontier = rescore(cand)
        .withColumn("br", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dot_q").desc, col("node"))))
        .filter(col("br") <= 8).select(col("qid"), col("node"))
    }
    val want = rescore(frontier).filter(col("node") =!= col("qid"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dot_q").desc, col("node"))))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("node"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong) -> r.getLong(1)).toMap
    assert(got === want)
    // the scale claim itself: a frontier's point probe PRUNES FILES —
    // the engine's planFilesPruned keeps only the probed buckets'
    // partitions of the 16-bucket vectors table
    val hconf = spark.sparkContext.hadoopConfiguration
    val vTbl = graft.tables.StorageCatalog.loadTable(hconf, s"$loc/vectors")
    val snap = vTbl.metadata.currentSnapshot.get
    val allFiles = vTbl.planFiles(snap).size
    val pruned = vTbl.planFilesPruned(spark, snap,
      Some(col("vbucket").isin(3L, 7L)), vTbl.metadata.currentSchema).size
    assert(allFiles >= 16)
    assert(pruned <= allFiles / 4,
      s"expected <= ${allFiles / 4} files for 2 of 16 buckets, got $pruned of $allFiles")
    // edges table prunes the same way on sbucket
    val eTbl = graft.tables.StorageCatalog.loadTable(hconf, s"$loc/edges")
    val esnap = eTbl.metadata.currentSnapshot.get
    val eAll = eTbl.planFiles(esnap).size
    val ePruned = eTbl.planFilesPruned(spark, esnap,
      Some(col("sbucket").isin(0L)), eTbl.metadata.currentSchema).size
    assert(ePruned < eAll)
    // EXTERNAL-vector search: an exact copy of member m's vector (under
    // a fresh label id) drives the IDENTICAL walk — same quantization,
    // same centroid routing, same scores — so its result is member m's
    // result, except self-exclusion doesn't apply: if m itself sits in
    // the final frontier it takes rank 1 and shifts the rest down
    val qvecs8 = vecs.filter(col("vec_id") < 8)
      .collect().map(r => (9000L + r.getLong(0),
        r.getSeq[Float](1).toArray)).toSeq
    val ext = Similarity.graphIndexSearch(spark, loc, qvecs8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
    val mem = got.toSeq.groupBy(_._1._1)
      .map { case (q, rs) => q -> rs.sortBy(_._1._2).map(_._2).toSeq }
    for (q <- 0L until 8L) {
      val e = ext(9000L + q)
      val m = mem(q)
      // q inserts at its score's rank position (often 1 — self-dot) and
      // pushes the tail out, or doesn't appear at all
      assert(e === m || (e.contains(q) && e.filterNot(_ == q) === m.take(2)),
        s"external search for copy of $q: got $e, member walk gave $m")
    }
    // at least one copy must rediscover its source (the member is
    // reachable from its own cell's rep for SOME query)
    assert((0L until 8L).exists(q => ext(9000L + q).contains(q)))
  }
}
