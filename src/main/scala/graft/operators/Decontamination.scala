package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.text

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set (the standard 13-gram
  * overlap check LLM pipelines run before training).
  *
  * Scale design: the benchmark side is small (eval suites are MBs, not
  * TBs) — its distinct n-gram set BROADCASTS; the training side is a
  * map-only n-gram explode into a broadcast LEFT SEMI join, so the 100 TB
  * side never shuffles text. Only flagged (doc_id) rows shuffle, for the
  * final distinct. For benchmark sets too big to broadcast exactly, wrap
  * the n-gram set in a Bloom filter first and re-verify the survivors —
  * the join shape stays the same.
  */
/** Codegen'd Bloom-filter membership probe: `true` iff the (non-null)
  * string child MIGHT be in the sketch. The sketch is a plan-constant
  * reference object (shipped once per task via the codegen reference
  * table), so the probe stays inside whole-stage codegen — a Scala udf
  * here would fence the surrounding operators out of codegen and
  * serialize rows through the box/unbox boundary on the 100 TB side. */
case class BloomMightContain(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && bloom.mightContainString(v.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} && $ref.mightContainString(${c.value}.toString());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): BloomMightContain =
    copy(child = c)
}

object Decontamination {

  /** Distinct word `n`-grams of `textC` (map-only; empty array when the
    * doc has fewer than `n` words). */
  /** n-gram array via n-1 zip_withs over SHIFTED SLICES of the token
    * array. The slices are function ARGUMENTS (evaluated once per row);
    * the earlier sequence+transform form referenced the tokenization
    * inside the lambda body, and higher-order lambdas re-evaluate outer
    * expressions PER ELEMENT — an O(len²) re-split per document that
    * project-collapsing can re-introduce even if staged as a column. */
  private[graft] def wordNgrams(textC: Column, n: Int): Column = {
    // round-13: the (n-1)-fold zip_with/concat_ws reduce is now the
    // codegen'd ngramsJoin kernel (bit-identical output; HOFs are
    // CodegenFallback and at n=13 the reduce paid 12 interpreted passes
    // over the token array per document). Tokenization and the
    // short/null-text guard are unchanged.
    val w = split(trim(textC), "\\s+")
    when(size(w) >= n, text.ngramsJoin(w, n, distinct = true))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Bloom-filter decontamination — the scale path when the benchmark
    * n-gram set is too big to broadcast exactly (a full eval-suite union
    * can run to billions of 13-grams; exact strings broadcast at ~50+
    * bytes each, a Bloom filter at ~10 BITS per element for 1% fpp).
    *
    * Two stages, same answer as [[flagged]]:
    *  1. map-only prefilter: the bench n-gram set folds into ONE Bloom
    *     filter (tiny driver-side sketch), broadcast to every task; the
    *     100 TB training side drops every n-gram the filter rejects —
    *     definitely-absent is exact, so nothing true is lost.
    *  2. exact confirm: only the surviving (doc_id, ngram) candidates —
    *     true matches plus the fpp sliver — join the real bench set.
    *     With the big side pre-shrunk, AQE picks a broadcast or small
    *     shuffle join; false positives die here, so the result is
    *     EXACTLY [[flagged]]'s, bit for bit.
    */
  def flaggedBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      fpp: Double = 0.01): DataFrame = {
    val bg = bench
      .select(explode(wordNgrams(col(textCol), n)).as("ng")).distinct()
    val expected = math.max(bg.count(), 1L)
    val bloom = bg.stat.bloomFilter("ng", expected, fpp)
    // codegen'd probe expression (not a Scala udf): the filter stays
    // inside whole-stage codegen, the sketch ships as a task reference
    val mightContain = org.apache.spark.sql.GraftBridge.column(
      BloomMightContain(org.apache.spark.sql.GraftBridge.expression(col("ng")), bloom))
    train
      .select(col(idCol).as("doc_id"), explode(wordNgrams(col(textCol), n)).as("ng"))
      .filter(mightContain)
      .join(bg, Seq("ng"), "leftsemi")
      .select(col("doc_id")).distinct()
  }

  /** POSITIONAL n-grams (one entry per window, index-aligned with the
    * token array) — [[wordNgrams]] minus the distinct, for span math. */
  private[graft] def wordNgramsPositional(textC: Column, n: Int): Column = {
    val w = split(trim(textC), "\\s+")
    when(size(w) >= n, text.ngramsJoin(w, n, distinct = false))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Span-level decontamination: instead of dropping every training doc
    * that shares an n-gram with the benchmark ([[flagged]] — the blunt
    * instrument), REMOVE just the matched n-token windows and keep the
    * rest of the document. This is how pipelines avoid throwing away a
    * whole book because one quiz question appears on page 312.
    *
    * Output text is rebuilt with single spaces (canonical whitespace —
    * token-level surgery cannot preserve the original runs).
    *
    * Scale: bench n-grams broadcast (eval suites are MBs); the train side
    * is a map-only positional-gram explode into that broadcast join, so
    * only MATCHED (doc, pos) rows shuffle (groupBy doc, bounded by hits);
    * the cut itself is one array HOF over the per-doc hit list. */
  def cutSpans(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13): DataFrame = {
    val bg = bench
      .select(explode(wordNgrams(col(textCol), n)).as("ng")).distinct()
    val toks = split(trim(col(textCol)), "\\s+")
    val hits = train
      .select(col(idCol).as("doc_id"),
        posexplode(wordNgramsPositional(col(textCol), n))
          .as(Seq("pos", "ng")))
      .join(broadcast(bg), Seq("ng"))
      .groupBy("doc_id").agg(collect_set(col("pos")).as("hits"))
    train
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("hitsA",
        coalesce(col("hits"), array().cast(ArrayType(IntegerType))))
      .withColumn("kept", filter(col("toks"), (t, j) =>
        size(filter(col("hitsA"), h => j >= h && j <= h + (n - 1))) === 0))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("cleaned_text"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_cut"))
  }

  /** doc_ids of `train` rows sharing at least one word `n`-gram with any
    * `bench` row. */
  def flagged(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13): DataFrame = {
    val bg = bench
      .select(explode(wordNgrams(col(textCol), n)).as("ng")).distinct()
    train
      .select(col(idCol).as("doc_id"), explode(wordNgrams(col(textCol), n)).as("ng"))
      .join(broadcast(bg), Seq("ng"), "leftsemi")
      .select(col("doc_id")).distinct()
  }

  /** Per-SUITE contamination report: for each benchmark suite, how many
    * training documents share an n-gram with it and what corpus
    * fraction that is — the decision table a pipeline reviews before
    * committing to a decontamination pass (one suite at 8% forces a
    * filter; one at 0.01% may not be worth the recall loss).
    *
    * Scale: ALL suites' n-grams broadcast ONCE with the suite label
    * attached (eval suites are tiny by construction); one exploded
    * broadcast join over the corpus; per-suite distinct-doc counts.
    * Suites with zero hits still report (left join from the suite
    * list). The corpus total is one count, re-emitted as a literal. */
  def contaminationReport(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      suiteCol: String,
      n: Int = 13): DataFrame = {
    val total = train.count()
    val bg = bench
      .select(col(suiteCol).as("suite"), explode(wordNgrams(col(textCol), n)).as("ng"))
      .distinct()
    val hits = train
      .select(col(idCol).as("doc_id"), explode(wordNgrams(col(textCol), n)).as("ng"))
      .join(broadcast(bg), Seq("ng"))
      .select(col("suite"), col("doc_id")).distinct()
      .groupBy(col("suite")).agg(count(lit(1)).as("flagged_docs"))
    bench.select(col(suiteCol).as("suite")).distinct()
      .join(hits, Seq("suite"), "left")
      .select(
        col("suite"),
        coalesce(col("flagged_docs"), lit(0L)).as("flagged_docs"),
        round(coalesce(col("flagged_docs"), lit(0L)).cast(
          org.apache.spark.sql.types.DoubleType) / total, 6).as("flagged_rate"))
  }
}
