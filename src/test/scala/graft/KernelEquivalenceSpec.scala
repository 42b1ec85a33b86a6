package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 kernel-vs-expression equivalence properties: every compiled
  * kernel that replaced an interpreted HOF pipeline this round must
  * reproduce the replaced expression BIT-IDENTICALLY on adversarial
  * inputs (the oracle gate only sees the declared corpus; these
  * properties cover the Unicode/edge space the corpus does not). */
class KernelEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Adversarial text corpus: ASCII, accents, combining marks, surrogate
    * pairs (non-BMP emoji / CJK-extension), Turkish dotted/dotless i
    * (lower() expands U+0130 to TWO code points), U+FFFD, controls,
    * whitespace runs, empties, and deterministic pseudo-random mixtures
    * that embed supplementary-plane code points mid-string. */
  private val nasty: Seq[String] = {
    val seeds = Seq(
      "", "a", "ab", "abc", "ABC def GHI", "  leading and trailing  ",
      "aéb", "ÉÈÊ", // accents
      "ééé", // combining acute (each mark its own cp)
      "😀😁😂", // emoji surrogate pairs
      "a😀b😁c", "İIıiİİ",
      "x�y zw", "tab\tand\nnewline", "123 456 789",
      "你好世界", // CJK BMP
      "𤭢𤭣ok", // CJK extension B (non-BMP)
      "ALL CAPS WITH ÜÖÄ UMLAUTS")
    val rnd = new scala.util.Random(421)
    val alphabet: Array[String] = Array(
      "a", "b", "Z", "0", "9", " ", "é", "́", "İ",
      "😀", "𤭢", "你", ".", ",", "-")
    val random = (1 to 60).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    seeds ++ random
  }

  private def nastyDf = nasty.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    .toDF("id", "s")

  test("charTrigrams == zip_with(slice...) over split(lower, '') on adversarial text") {
    val chars = split(lower(col("s")), "")
    val cnt = size(chars) - 2
    val exprGrams = when(length(col("s")) >= 3,
      zip_with(
        zip_with(slice(chars, lit(1), cnt), slice(chars, lit(2), cnt),
          (a, b) => concat(a, b)),
        slice(chars, lit(3), cnt),
        (ab, c) => concat(ab, c)))
    // the kernel's own contract is n>=3 CODE POINTS of the LOWERED text;
    // charLmNll guards with length(original) >= 3, so compare under the
    // same guard the call site uses
    val rows = nastyDf.filter(length(col("s")) >= 3)
      .select(col("id"), col("s"),
        exprGrams.as("e"),
        graft.functions.text.charTrigrams(lower(col("s"))).as("k"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"charTrigrams mismatch on [${r.getString(1)}]")
    }
  }

  test("charTrigrams pinned values") {
    val out = Seq("abcd").toDF("s")
      .select(graft.functions.text.charTrigrams(lower(col("s"))))
      .head().getSeq[String](0)
    assert(out == Seq("abc", "bcd"))
    // U+0130 lowers to i + combining dot (2 cps): "İab" -> i,̇,a,b
    val tr = Seq("İab").toDF("s")
      .select(graft.functions.text.charTrigrams(lower(col("s"))))
      .head().getSeq[String](0)
    assert(tr == Seq("i̇a", "̇ab"))
    // surrogate pairs stay whole code points
    val em = Seq("a😀b😁").toDF("s")
      .select(graft.functions.text.charTrigrams(lower(col("s"))))
      .head().getSeq[String](0)
    assert(em == Seq("a😀b", "😀b😁"))
  }

  test("md5BucketCounts == filter+transform+size-filter pipeline (hex 1 and 2)") {
    for (hexChars <- Seq(1, 2)) {
      val digits = "0123456789abcdef"
      val ids: Seq[String] =
        if (hexChars == 1) digits.map(_.toString)
        else for (a <- digits; b <- digits) yield s"$a$b"
      val tk = filter(split(lower(col("s")), "[^a-z0-9]+"), x => length(x) > 0)
      val tb = transform(tk, w => substring(md5(w), 1, hexChars))
      val bc = array(ids.map(b =>
        size(filter(tb, x => x === b)).cast(LongType)): _*)
      val rows = nastyDf.select(col("s"), bc.as("e"),
        graft.functions.text.md5BucketCounts(
          split(lower(col("s")), "[^a-z0-9]+"), hexChars).as("k"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"md5BucketCounts($hexChars) mismatch on [${r.getString(0)}]")
      }
    }
  }

  test("ngramsJoinClean == filter(len>0) + transform(sequence, concat) shingles") {
    val w = filter(split(lower(coalesce(col("s"), lit(""))), "[^a-z0-9]+"),
      x => length(x) > 0)
    val exprSh = when(size(w) < 3, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ",
          element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
    val rows = nastyDf.select(col("s"), exprSh.as("e"),
      graft.functions.text.ngramsJoinClean(
        split(lower(coalesce(col("s"), lit(""))), "[^a-z0-9]+"), 3).as("k"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"ngramsJoinClean mismatch on [${r.getString(0)}]")
    }
  }

  test("sumModelMicro == explode + left join + sum(coalesce) fold") {
    import org.apache.spark.unsafe.types.UTF8String
    // grams from the kernel, model over a subset of observed grams
    val grams = nastyDf.filter(length(col("s")) >= 3)
      .select(col("id"),
        graft.functions.text.charTrigrams(lower(col("s"))).as("g"))
    val vocab = grams.select(explode(col("g")).as("g"))
      .groupBy("g").count().filter(col("count") >= 2)
      .select("g").collect().map(_.getString(0))
    val model = new java.util.HashMap[UTF8String, java.lang.Long]()
    vocab.zipWithIndex.foreach { case (g, i) =>
      model.put(UTF8String.fromString(g), java.lang.Long.valueOf(-1000L - i))
    }
    val oov = -999999L
    val modelDf = vocab.zipWithIndex
      .map { case (g, i) => (g, -1000L - i) }.toSeq.toDF("g", "lm")
    val viaJoin = grams.select(col("id"), explode(col("g")).as("g"))
      .join(broadcast(modelDf), Seq("g"), "left")
      .groupBy("id").agg(sum(coalesce(col("lm"), lit(oov))).as("s"))
    val viaKernel = grams.select(col("id"),
      graft.functions.text.sumModelMicro(col("g"), model, oov).as("s"))
    val j = viaJoin.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = viaKernel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(j == k)
  }
}
