package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TransformUtil
import graft.operators.Dedup
import graft.tables._

/** Property-based invariants (SURVEY §5): the transform kernels and the
  * serialization layers must hold these for ALL inputs, not just the
  * spec's golden vectors. */
class PropertySpec extends AnyFunSuite {

  private val N = 512

  /** run a scalacheck property under scalatest (no scalatestplus bridge
    * in the offline cache) */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("bucket is always in [0, n) and deterministic for every long/int/string") {
    check(forAll(Gen.long, Gen.choose(1, 1 << 16)) { (v, n) =>
      val b = TransformUtil.bucketLong(v, n)
      b >= 0 && b < n && b == TransformUtil.bucketLong(v, n)
    })
    check(forAll(Gen.alphaNumStr, Gen.choose(1, 1024)) { (s, n) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val b = TransformUtil.bucketString(u, n)
      b >= 0 && b < n
    })
  }

  test("truncate[W] is idempotent, <= input, and width-aligned (ints/longs)") {
    // bounds keep v - floorMod(v, w) away from the wrap-around edge
    // (truncate at MIN_VALUE wraps in the reference implementations too);
    // NoShrink because scalacheck shrinking escapes generator ranges
    check(Prop.forAllNoShrink(
      Gen.choose(Long.MinValue + 2000000L, Long.MaxValue), Gen.choose(1L, 1000000L)) { (v, w) =>
      val t = TransformUtil.truncateLong(v, w)
      t <= v && (v - t) < w && TransformUtil.truncateLong(t, w) == t &&
        Math.floorMod(t, w) == 0
    })
    check(Prop.forAllNoShrink(
      Gen.choose(Int.MinValue + 200000, Int.MaxValue), Gen.choose(1, 100000)) { (v, w) =>
      val t = TransformUtil.truncateInt(v, w)
      t <= v && (v - t) < w && TransformUtil.truncateInt(t, w) == t
    })
  }

  test("strict evaluation is SOUND: a strict match implies every row matches") {
    // the metadata-delete fast path drops files UNREAD on strictMatch —
    // a single unsound proof silently loses rows. Property: for random
    // row sets (with nulls) and random range/equality predicates over
    // real harvested bounds, strictMatch => rows.forall(pred is TRUE),
    // and !mayMatch => rows.forall(pred is not TRUE).
    import org.apache.spark.sql.functions.{col, lit}
    import org.scalacheck.Prop.propBoolean
    val schema = IceSchema(0, List(IceField(1, "v", required = false, IcePrim("long"))))
    val spec = IcePartitionSpec(0, Nil)
    val meta = StorageCatalog.newTableMetadata("/tmp/unused-strict", schema, spec)
    val rowsGen = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.const(Option.empty[Long]), Gen.choose(-100L, 100L).map(Some(_))))
    val opGen = Gen.oneOf("=", "<", "<=", ">", ">=")
    val cmpOf: Map[String, (Long, Long) => Boolean] = Map(
      "=" -> (_ == _), "<" -> (_ < _), "<=" -> (_ <= _),
      ">" -> (_ > _), ">=" -> (_ >= _))
    check(Prop.forAllNoShrink(rowsGen, opGen, Gen.choose(-120L, 120L)) { (rows, op, k) =>
      val present = rows.flatten
      val file = IceDataFile(
        content = 0, filePath = "f", fileFormat = "parquet",
        partition = Nil, recordCount = rows.size.toLong, fileSizeInBytes = 1L,
        nullValueCounts = Map(1 -> rows.count(_.isEmpty).toLong),
        lowerBounds =
          if (present.isEmpty) Map.empty
          else Map(1 -> SingleValue.encode(IcePrim("long"), present.min)),
        upperBounds =
          if (present.isEmpty) Map.empty
          else Map(1 -> SingleValue.encode(IcePrim("long"), present.max)))
      val cond = op match {
        case "=" => col("v") === lit(k)
        case "<" => col("v") < lit(k)
        case "<=" => col("v") <= lit(k)
        case ">" => col("v") > lit(k)
        case ">=" => col("v") >= lit(k)
      }
      val expr = org.apache.spark.sql.GraftBridge.catalystExpression(cond)
      val strict = PruneEval.strictMatch(expr, file, spec, schema)
      val may = PruneEval.mayMatch(expr, file, spec, schema)
      // SQL three-valued: null rows are never TRUE matches
      val allTrue = rows.forall(_.exists(v => cmpOf(op)(v, k)))
      val anyTrue = rows.exists(_.exists(v => cmpOf(op)(v, k)))
      (!strict || allTrue) :| s"UNSOUND strict: rows=$rows $op $k" &&
        (may || !anyTrue) :| s"UNSOUND prune: rows=$rows $op $k" &&
        (!strict || may) :| "strict must imply may"
    })
  }

  test("string truncate keeps a prefix of at most W code points") {
    check(forAll(Gen.asciiPrintableStr, Gen.choose(1, 32)) { (s, w) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val t = TransformUtil.truncateString(u, w).toString
      s.startsWith(t) && t.codePointCount(0, t.length) <= w
    })
  }

  test("single-value encoding round-trips every primitive") {
    def rt(t: IceType, v: Any): Boolean =
      SingleValue.decode(t, SingleValue.encode(t, v)) == v
    check(forAll(Gen.long)(v => rt(IcePrim("long"), v)))
    check(forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue))(v => rt(IcePrim("int"), v)))
    check(forAll(Gen.double.suchThat(d => !d.isNaN))(v => rt(IcePrim("double"), v)))
    check(forAll(Gen.alphaNumStr)(v => rt(IcePrim("string"), v)))
    check(forAll(Gen.oneOf(true, false))(v => rt(IcePrim("boolean"), v)))
    check(forAll(Gen.uuid)(u => rt(IcePrim("uuid"), u.toString)))
    check(forAll(Gen.long, Gen.choose(0, 9)) { (unscaled, scale) =>
      val bd = new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
      rt(IceDecimal(38, scale), bd)
    })
  }

  test("table metadata JSON serialization round-trips") {
    val genField: Gen[IceField] = for {
      id <- Gen.choose(1, 1000)
      name <- Gen.identifier.suchThat(_.nonEmpty)
      req <- Gen.oneOf(true, false)
      t <- Gen.oneOf[IceType](
        IcePrim("int"), IcePrim("long"), IcePrim("string"), IcePrim("double"),
        IcePrim("date"), IcePrim("timestamp"), IcePrim("uuid"), IcePrim("time"),
        IceDecimal(12, 2))
      dflt <- Gen.option(Gen.oneOf[Any](1L, "x", 2.5, true))
    } yield IceField(id, name, req, t, None, dflt, dflt)
    val genMeta: Gen[TableMetadata] = for {
      fields <- Gen.nonEmptyListOf(genField)
      distinct = fields.groupBy(_.name).map(_._2.head).toList.sortBy(_.id)
      props <- Gen.mapOf(Gen.zip(Gen.identifier, Gen.alphaNumStr))
      seq <- Gen.choose(0L, 1L << 40)
      refs <- Gen.mapOf(Gen.zip(Gen.identifier, for {
        sid <- Gen.choose(1L, Long.MaxValue - 1)
        tpe <- Gen.oneOf("tag", "branch")
        keep <- Gen.option(Gen.choose(1, 10))
        age <- Gen.option(Gen.choose(1L, 1L << 40))
      } yield IceSnapshotRef(sid, tpe, keep, age, age)))
    } yield TableMetadata(
      formatVersion = 2, tableUuid = "u", location = "/tmp/x",
      lastSequenceNumber = seq, lastUpdatedMs = 1L,
      lastColumnId = distinct.map(_.id).max,
      schemas = List(IceSchema(0, distinct)), currentSchemaId = 0,
      partitionSpecs = List(IcePartitionSpec(0, Nil)), defaultSpecId = 0,
      lastPartitionId = 999, properties = props, currentSnapshotId = None,
      snapshots = Nil, snapshotLog = Nil, metadataLog = Nil,
      sortOrders = List(IceSortOrder(0, Nil)), defaultSortOrderId = 0,
      refs = refs)
    check(Prop.forAllNoShrink(genMeta) { m =>
      MetadataJson.parse(MetadataJson.serialize(m)) == m
    })
  }

  test("stratified exact-k equals the direct window on random data") {
    // the salted two-stage top-k must select EXACTLY the k smallest
    // (md5(key), key) per stratum for any data shape / k / shard count
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5, row_number}
    val gen = for {
      n <- Gen.choose(1, 120)
      ids <- Gen.listOfN(n, Gen.choose(0L, 500L))
      k <- Gen.choose(1, 9)
      shards <- Gen.oneOf(1, 3, 8)
    } yield (ids.distinct.map(i => (i, s"g${i % 4}")), k, shards)
    check(Prop.forAllNoShrink(gen) { case (rows, k, shards) =>
      // n >= 1 and distinct of a nonempty list is nonempty
      val d = rows.toDF("id", "grp")
      val got = graft.operators.Sampling
        .stratifiedSampleExact(d, "id", "grp", k, shards = shards)
        .select("id").as[Long].collect().toSet
      val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
        .orderBy(md5(col("id").cast(org.apache.spark.sql.types.StringType)), col("id"))
      val ref = d.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("id").as[Long].collect().toSet
      got == ref
    })
  }

  test("classifier AUC equals brute-force pair counting on random data") {
    // AUC is DEFINED as P(score_pos > score_neg) + 0.5*P(=) over all
    // (pos, neg) pairs; the distributed rank-sum must match the O(n^2)
    // definition exactly (2U is integer arithmetic — no tolerance)
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(2, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(-5, 5), Gen.oneOf(true, false)))
      if rows.exists(_._2) && rows.exists(!_._2) // both classes present
    } yield rows.map { case (s, l) => (s.toDouble, l) }
    check(Prop.forAllNoShrink(gen) { rows =>
      val got = graft.operators.Selection
        .classifierAuc(rows.toDF("score", "lab"), "score", col("lab"), numBuckets = 3)
        .collect().head.getDouble(0)
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val u = (for { p <- pos; q <- neg } yield
        if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
      val expect = BigDecimal(u / (pos.size.toDouble * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      got == expect
    })
  }

  test("partition-transform row evaluator agrees with the Catalyst expressions") {
    // TransformEval (native writer) and transforms.* (facade writer) must
    // compute identical partition values — shuffles and manifests both
    // depend on it
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vals = (-N to N).map(_.toLong * 977L)
    val df = vals.toDF("v")
    val expr = df.select(
      graft.functions.transforms.bucket(16, col("v")),
      graft.functions.transforms.truncate(100, col("v"))).collect()
    vals.zip(expr).foreach { case (v, row) =>
      assert(graft.spark.TransformEval.eval("bucket[16]", IcePrim("long"), v) === row.getInt(0))
      assert(graft.spark.TransformEval.eval("truncate[100]", IcePrim("long"), v) === row.getLong(1))
    }
  }

  /** 15 cases for the Spark-job-per-case properties below: each case
    * runs a multi-join distributed query, so the default 200 would tax
    * the suite without adding coverage over the unit tests' fixed cases */
  private def check15(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("integer pagerank equals the driver simulation on random weighted graphs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      ne <- Gen.choose(1, 20)
      edges <- Gen.listOfN(ne, for {
        s <- Gen.choose(0L, 11L); d <- Gen.choose(0L, 11L)
        w <- Gen.choose(1L, 50L)
      } yield (s, d, w))
      iters <- Gen.choose(1, 3)
    } yield (edges, iters)
    check15(Prop.forAllNoShrink(gen) { case (edges, iters) =>
      val got = graft.operators.Graph
        .pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // independent integer simulation (duplicate edges NOT merged —
      // the operator must be multiset-correct too)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val ow = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
      val base = 1000000000000L / nodes.size
      var r = nodes.map(_ -> base).toMap
      for (_ <- 1 to iters) {
        val contrib = edges.groupBy(_._2).map { case (d, g) =>
          d -> g.map(e => r(e._1) * e._3 / ow(e._1)).sum
        }
        r = nodes.map(v =>
          v -> (contrib.getOrElse(v, 0L) * 85 / 100 + base * 15 / 100)).toMap
      }
      got == r
    })
  }

  test("cdc chunk report + cut conserve token mass on random docs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "mu")
    val gen = for {
      nd <- Gen.choose(1, 6)
      docs <- Gen.listOfN(nd, Gen.choose(1, 30)
        .flatMap(len => Gen.listOfN(len, Gen.oneOf(words))))
    } yield docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    check15(Prop.forAllNoShrink(gen) { docs =>
      val d = docs.toDF("doc_id", "text")
      val cut = graft.operators.Dedup.cdcChunkCut(d, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val rep = graft.operators.Dedup.cdcChunks(d, "doc_id", "text")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val totalTokens = docs.map(_._2.split(" ").length.toLong).sum
      // replica of the chunking to get ALL duplicate groups: the cut
      // removes every non-canonical copy INCLUDING within-doc repeats,
      // which the cross-doc report (n_docs >= 2) deliberately omits
      def chunksOf(text: String): Seq[String] = {
        def md5hex(s: String): String =
          java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val out = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
        var cur = Vector.empty[String]
        text.split(" ").filter(_.nonEmpty).foreach { t =>
          cur = cur :+ t
          if (md5hex(t).head < '2') { out += cur; cur = Vector.empty }
        }
        if (cur.nonEmpty) out += cur
        out.map(_.mkString(" ")).toSeq
      }
      val allOccs = docs.flatMap { case (id, t) => chunksOf(t).map(c => (id, c)) }
      val expectCutMass = allOccs.groupBy(_._2).map { case (c, os) =>
        (os.size - 1).toLong * c.split(" ").length
      }.sum
      val expectReportMass = allOccs.groupBy(_._2).collect {
        case (c, os) if os.map(_._1).distinct.size >= 2 =>
          (os.size - 1).toLong * c.split(" ").length
      }.sum
      // per-doc totals reconstruct the corpus; cut mass equals the
      // all-duplicates expectation and dominates the cross-doc report's;
      // cleaned text token count equals kept_tokens
      cut.map(_._2).sum == totalTokens &&
        cut.map(x => x._2 - x._3).sum == expectCutMass &&
        rep.map { case (nt, _, nc) => (nc - 1) * nt }.sum == expectReportMass &&
        expectCutMass >= expectReportMass &&
        cut.forall(x => x._4.split(" ").count(_.nonEmpty).toLong == x._3)
    })
  }

  test("embedding anisotropy equals BigInt brute force on random vectors") {
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 12)
      dims <- Gen.choose(2, 5)
      vecs <- Gen.listOfN(n, Gen.listOfN(dims,
        Gen.choose(-8, 8).map(x => x / 8.0f)))
    } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, dims)
    check15(Prop.forAllNoShrink(gen) { case (rows, dims) =>
      val got = graft.operators.Profiling
        .embeddingAnisotropy(rows.toDF("id", "v"), "v", dims, topK = 1000)
        .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      val q = rows.map(_._2.map(x => math.floor(x * 1024.0).toLong))
      val n = BigInt(q.size)
      val expect = (for { i <- 0 until dims; j <- i + 1 until dims } yield {
        val s = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
        val mi = q.map(v => BigInt(v(i))).sum
        val mj = q.map(v => BigInt(v(j))).sum
        val num = n * s - mi * mj
        ((i + 1).toLong, (j + 1).toLong) -> (num.signum * (num.abs / (n * n))).toLong
      }).toMap
      got == expect
    })
  }

  test("hll bucket/rank string-op expressions equal 64-bit bit math for any key") {
    // the register address and rank come from hex-string surgery
    // (regexp leading zeros + first-digit CASE) so that ANY SQL engine
    // can replicate them; they must agree with the straightforward
    // Long.numberOfLeadingZeros reference on arbitrary utf-8 keys
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keyGen = Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOfN(8, Gen.choose(0x20.toChar, 0x2fff.toChar)).map(_.mkString))
    check15(Prop.forAllNoShrink(Gen.listOfN(200, keyGen)) { keys =>
      val ks = keys.filter(_.nonEmpty).distinct
      ks.isEmpty || {
        val (b, r) = graft.operators.Sketches.hllParts(col("k"), 2)
        val got = ks.toDF("k").select(col("k"), b.as("b"), r.as("r"))
          .collect()
          .map(row => row.getString(0) -> ((row.getLong(1), row.getLong(2))))
          .toMap
        val expect = ks.map { k =>
          val hex = md5hex(k)
          val bucket = java.lang.Long.parseLong(hex.substring(0, 2), 16)
          val tail = java.lang.Long.parseLong(hex.substring(2, 17), 16)
          // tail occupies the low 60 bits: nlz64 - 4 zeros within the
          // tail, rank = zeros + 1
          val rank =
            if (tail == 0L) 61L
            else java.lang.Long.numberOfLeadingZeros(tail).toLong - 3L
          k -> ((bucket, rank))
        }.toMap
        got == expect
      }
    })
  }

  test("exact permilles equal a full sort for any multiset, width, sign mix") {
    // negative values stress the truncating-div bucket ranges (bucket 0
    // spans both signs); ties stress the (value, tie) rank order
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 150)
      vals <- Gen.listOfN(n, Gen.choose(-3000L, 3000L))
      w <- Gen.oneOf(1L, 7L, 64L, 1000L)
      qs <- Gen.nonEmptyListOf(Gen.choose(0, 1000))
    } yield (vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }, w, qs)
    check15(Prop.forAllNoShrink(gen) { case (rows, w, qs) =>
      val got = graft.operators.Sketches
        .exactPermilles(rows.toDF("v", "tie"), "v", "tie", qs, w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val sorted = rows.map(_._1).sorted
      val expect = qs.distinct.map { q =>
        val r = (sorted.length - 1) * q / 1000 + 1
        q.toLong -> ((r.toLong, sorted(r - 1)))
      }.toMap
      got == expect
    })
  }

  test("incremental CC merge equals the full recompute for any random two-batch pair split") {
    // the min-label super-node argument, checked mechanically: for ANY
    // edge set split into history/batch, contracting the batch's edges
    // through history's labels and merging must reproduce the full CC
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 40)                  // node universe
      m1 <- Gen.choose(0, 30)
      m2 <- Gen.choose(1, 30)
      p1 <- Gen.listOfN(m1, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
      p2 <- Gen.listOfN(m2, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield (p1.filter(e => e._1 != e._2), p2.filter(e => e._1 != e._2))
    check15(Prop.forAllNoShrink(gen) { case (hist, batch) =>
      if (hist.isEmpty && batch.isEmpty) true
      else {
        val labels1 = Dedup.connectedComponents(
          (if (hist.isEmpty) Seq((-1L, -2L)) else hist).toDF("a", "b"), "a", "b")
          .filter(org.apache.spark.sql.functions.col("doc_id") >= 0)
        val l1 = labels1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // contract the batch through history's labels (the query does
        // this via the component-carrying index; here driver-side)
        val superPairs = batch.map { case (a, b) =>
          (l1.getOrElse(a, a), l1.getOrElse(b, b))
        }
        val delta =
          if (superPairs.isEmpty) Map.empty[Long, Long]
          else Dedup.mergeComponentLabels(
              labels1, superPairs.toDF("sa", "sb"), "sa", "sb")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val merged = l1 ++ delta
        val all = hist ++ batch
        val full =
          if (all.isEmpty) Map.empty[Long, Long]
          else Dedup.connectedComponents(all.toDF("a", "b"), "a", "b")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        merged == full
      }
    })
  }

  test("exact permilles: pathological wide-range valueCol auto-widens under the enforced bucket bound and stays exact") {
    // unix-micros-scale values against a tiny width would make the
    // driver-side bucket collect corpus-sized; the enforced maxBuckets
    // bound must auto-widen (x8 per step, composed truncating division)
    // rather than collect unbounded — and the answer must stay the full
    // sort's, including negative values straddling bucket 0
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 120)
      vals <- Gen.listOfN(n, Gen.choose(-3_000_000_000_000L, 3_000_000_000_000L))
      maxB <- Gen.oneOf(1L, 3L, 17L)
      qs <- Gen.nonEmptyListOf(Gen.choose(0, 1000))
    } yield (vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }, maxB, qs)
    check15(Prop.forAllNoShrink(gen) { case (rows, maxB, qs) =>
      val got = graft.operators.Sketches
        .exactPermilles(rows.toDF("v", "tie"), "v", "tie", qs,
          bucketWidth = 64L, maxBuckets = maxB)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val sorted = rows.map(_._1).sorted
      val expect = qs.distinct.map { q =>
        val r = (sorted.length - 1) * q / 1000 + 1
        q.toLong -> ((r.toLong, sorted(r - 1)))
      }.toMap
      got == expect
    })
  }
}
