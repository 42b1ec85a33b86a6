package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer: corpus-trained merges + greedy
  * segmentation — the REAL subword tokenizer of an LLM data pipeline
  * (token budgeting, packing, and dedup all count in these units, not
  * whitespace words).
  *
  * TRAIN (Sennrich et al. 2016 shape): start from the character
  * vocabulary of whitespace words; each round counts adjacent symbol
  * pairs across the (weighted) word vocabulary and merges the most
  * frequent pair. Scale design: training runs on the DISTINCT-WORD
  * histogram, not raw text — one corpus pass builds (word, count), and
  * every merge round is an aggregate over that bounded histogram (natural
  * language vocabularies are ~10^5-10^6 words at any corpus size; the
  * 100 TB corpus is never re-read). Tie-breaks are total (count desc,
  * pair lexicographic), so the learned merge list is deterministic.
  *
  * SEGMENT: greedy lowest-rank merge application per word (the standard
  * BPE apply), map-only with the merge ranks broadcast — no shuffle.
  *
  * No DuckDB oracle: iterative merge application is not SQL-expressible;
  * the query is rows-gated and the algorithm is spec-verified against
  * hand-computed merges. */
object Bpe {

  /** end-of-word marker (keeps merges from crossing word boundaries and
    * lets the segmenter restore word counts) */
  val Eow = "</w>"

  private def words(textCol: String) =
    filter(split(lower(col(textCol)), "[^a-z0-9]+"), x => length(x) > 0)

  /** (word, count) histogram of the training slice — the only corpus
    * pass; everything after runs over this bounded table. */
  private def wordHistogram(df: DataFrame, textCol: String): Array[(String, Long)] =
    df.select(explode(words(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))

  /** Learn `numMerges` merges. The per-round pair count runs driver-side
    * over the collected word histogram: the histogram is vocabulary-
    * bounded (NOT corpus-bounded), so this is the textbook training loop
    * with the corpus pass factored out — at 100 TB the heavy step stays
    * the single distributed histogram aggregate. */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var vocab: Array[(Array[String], Long)] = wordHistogram(df, textCol)
      .map { case (w, c) => ((w.map(_.toString) :+ Eow).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // total order: count desc, then pair lexicographic — deterministic
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** greedy BPE apply: repeatedly merge the LOWEST-RANK adjacent pair */
  private[operators] def applyMerges(
      word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ Eow
    var changed = true
    while (changed && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestI = i }
        }
        i += 1
      }
      if (bestI < 0) changed = false
      else {
        syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++
          syms.drop(bestI + 2)
      }
    }
    syms
  }

  /** Segment every document with the learned merges: map-only, merge
    * ranks broadcast, per-doc output = BPE token count + the first
    * tokens (bounded preview — whole-corpus token arrays would bloat
    * result sets; real exports write the ids column instead). */
  def segment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      previewTokens: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    val prev = previewTokens
    val src = df.select(
      col(idCol).cast(LongType).as("doc_id"), col(textCol).as("_text"))
      .as[(Long, String)]
    src.mapPartitions { it =>
      val rank = rankB.value
      // per-partition word cache: corpora repeat words heavily, and the
      // segmentation of a word is input-independent
      val cache = scala.collection.mutable.HashMap[String, Array[String]]()
      it.map { case (id, text) =>
        val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        var n = 0
        val preview = scala.collection.mutable.ArrayBuffer[String]()
        ws.foreach { w =>
          val toks = cache.getOrElseUpdate(w, applyMerges(w, rank))
          n += toks.length
          if (preview.length < prev)
            preview ++= toks.take(prev - preview.length)
        }
        (id, n.toLong, preview.toSeq)
      }
    }.toDF("doc_id", "n_bpe_tokens", "token_preview")
  }
}
