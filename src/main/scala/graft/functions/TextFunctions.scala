package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels called from generated code.
  *
  * All hashing is deterministic and seed-stable so results are reproducible
  * across runs/executors (required by the correctness gate).
  */
object TextUtil {

  /** 64-bit hash built from two murmur3_x86_32 passes with distinct seeds. */
  def hash64(bytes: Array[Byte]): Long = {
    val lo = Murmur3.hash(bytes, 0)
    val hi = Murmur3.hash(bytes, 0x9747b28c)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  def hash64(s: String): Long = hash64(s.getBytes("UTF-8"))

  private def splitWs(s: String): Array[String] =
    s.trim.split("\\s+").filter(_.nonEmpty)

  // text normalization: NFC-compose, strip ASCII control chars (tab and
  // newline count as whitespace, not controls), collapse whitespace runs,
  // trim. Patterns precompiled — the kernel runs once per row at corpus
  // scale. The \s class is the ASCII set on both sides of the oracle
  // (java.util.regex and RE2 agree on [ \t\n\x0B\f\r]).
  private val ControlRe = java.util.regex.Pattern.compile("[\\x00-\\x08\\x0E-\\x1F\\x7F]")
  private val WsRunRe = java.util.regex.Pattern.compile("\\s+")

  /** Unicode NFC normalization + control strip + whitespace collapse —
    * the canonicalization pass a training corpus runs before hashing,
    * dedup or tokenization (byte-identical text must hash identically
    * regardless of the producer's Unicode composition form). */
  def normalizeText(v: UTF8String): UTF8String = {
    val composed = java.text.Normalizer.normalize(
      v.toString, java.text.Normalizer.Form.NFC)
    val stripped = ControlRe.matcher(composed).replaceAll("")
    UTF8String.fromString(WsRunRe.matcher(stripped).replaceAll(" ").trim)
  }

  /** SimHash-64 over whitespace tokens: per token a 64-bit hash votes +1/-1
    * on each bit; the sign of each bit's tally forms the fingerprint.
    * Near-duplicate docs land at small Hamming distance. */
  def simhash64(text: UTF8String): Long = {
    val tokens = splitWs(text.toString)
    if (tokens.isEmpty) return 0L
    val tally = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = hash64(tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Hashed word-level shingles (n consecutive tokens), distinct + sorted,
    * for exact Jaccard verification via array intersection. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val tokens = splitWs(text.toString)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Long])
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= tokens.length) {
      val sb = new StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      set.add(hash64(sb.toString))
      i += 1
    }
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  /** MinHash signature of the shingle set: k permutations h_i(x)=a_i*x+b_i
    * (odd multipliers from a seed-stable generator), min over shingles.
    * One pass, no shuffle — signature computation is map-only by design so
    * that at 100 TB only the (doc, band-bucket) pairs ever shuffle. */
  def minhashSignature(text: UTF8String, n: Int, k: Int): ArrayData =
    minhashOfShingles(shingleHashes(text, n), k)

  /** MinHash signature straight from a precomputed shingle-hash array —
    * lets a plan compute shingles once and reuse them for both the
    * signature and the exact-Jaccard verify step. */
  // the k permutation constants depend only on k — memoize per JVM
  // (round-13): the inline form re-derived 2k seed-string hashes per ROW,
  // a constant that dominated signature cost on short shingle sets
  private val minhashPerms =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def permsOf(k: Int): (Array[Long], Array[Long]) =
    minhashPerms.computeIfAbsent(k, _ => (
      Array.tabulate(k)(i => hash64(s"minhash-a-$i") | 1L),
      Array.tabulate(k)(i => hash64(s"minhash-b-$i"))))

  def minhashOfShingles(shingles: ArrayData, k: Int): ArrayData = {
    val m = shingles.numElements()
    val (as, bs) = permsOf(k)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = as(i)
      val b = bs(i)
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val v = a * shingles.getLong(j) + b
        if (v < best) best = v
        j += 1
      }
      sig(i) = if (m == 0) 0L else best
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Word-n-gram join over a token array (see [[NgramsJoin]]): window i
    * = tokens i..i+n-1 joined by single spaces; null tokens skipped
    * without a separator (concat_ws), optional first-occurrence distinct
    * (array_distinct binary equality). Empty array below n tokens. */
  def ngramsJoin(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val cnt = len - n + 1
    val out = new java.util.ArrayList[AnyRef](cnt)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i < cnt) {
      val sb = new java.lang.StringBuilder()
      var first = true
      var j = 0
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      val g = UTF8String.fromString(sb.toString)
      if (seen == null || seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Word-n-gram join that SKIPS null and empty tokens before windowing
    * (round-14): one compiled pass equivalent to
    * `ngramsJoin(filter(tokens, t => length(t) > 0), n, distinct = false)`
    * — i.e. the `filter(split(lower(text), "[^a-z0-9]+"), len > 0)` +
    * `transform(sequence(0, size(w)-3), i -> concat(w[i],' ',...))`
    * shingle pipeline, whose HOF stages are all CodegenFallback
    * (interpreted per window per row). Empty array below n kept tokens. */
  def ngramsJoinClean(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    // collect non-null, non-empty token indices first (the filter() stage)
    val keep = new Array[Int](len)
    var m = 0
    var t = 0
    while (t < len) {
      if (!tokens.isNullAt(t) && tokens.getUTF8String(t).numBytes() > 0) {
        keep(m) = t; m += 1
      }
      t += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val cnt = m - n + 1
    val out = new Array[AnyRef](cnt)
    var i = 0
    while (i < cnt) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(keep(i + j)).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Char-trigram shingles of an (already lower-cased) string — the
    * compiled form of the charLmNll expression
    * `zip_with(zip_with(slice(c,1,n-2), slice(c,2,n-2), concat),
    *           slice(c,3,n-2), concat)` over `c = split(s, "")`
    * (round-14). Spark's empty-pattern split yields one element per
    * UNICODE CODE POINT with no trailing empty element (surrogate pairs
    * stay whole, combining marks are their own elements), so gram i =
    * code points i..i+2 and a string of n code points yields exactly
    * n-2 grams (empty below 3). Bit-identical to the expression form:
    * concat of adjacent code-point substrings equals the substring over
    * their span. Lower-casing stays OUTSIDE the kernel (callers pass
    * `lower(col)`), so Spark's own lowercase semantics are untouched. */
  def charTrigrams(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    val n = str.codePointCount(0, len)
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1)
    var i = 0
    var p = 0
    while (p < len) {
      offs(i) = p
      p += Character.charCount(str.codePointAt(p))
      i += 1
    }
    offs(n) = len
    val out = new Array[AnyRef](n - 2)
    i = 0
    while (i < n - 2) {
      out(i) = UTF8String.fromString(str.substring(offs(i), offs(i + 3)))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hashed-feature bucket histogram (round-14): counts per md5-prefix
    * bucket over the non-empty tokens of a split token array — one
    * compiled pass equivalent to the interpreted pipeline
    * `_toks = filter(tokens, len > 0)`;
    * `_tb = transform(_toks, t => substring(md5(t), 1, hexChars))`;
    * `array(size(filter(_tb, == id_0)), ..., size(filter(_tb, == id_B)))`
    * (1 + 1 + 16^hexChars HOF passes per row in Selection.dsirWeights /
    * nbClassify). Bucket index = value of the first `hexChars` hex
    * digits of md5(token-utf8) — exactly the digit-string equality the
    * expression form used, because `bucketIds` enumerates the ids in
    * ascending hex order. Null/empty tokens are skipped (filter
    * semantics). */
  def md5BucketCounts(tokens: ArrayData, hexChars: Int): ArrayData = {
    require(hexChars >= 1 && hexChars <= 2, s"1 or 2 hex chars: $hexChars")
    val counts = new Array[Long](1 << (4 * hexChars))
    val md = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) {
          val d = md.digest(t.getBytes)
          val b = if (hexChars == 1) (d(0) >> 4) & 0xf else d(0) & 0xff
          counts(b) += 1L
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Sum of per-gram micro-nat log-probs under a driver-built model map
    * (round-14): the map-only form of charLmNll's scoring
    * `explode(grams) -> broadcast LEFT JOIN model -> sum(coalesce(_lm,
    * oov)) GROUP BY doc` — same integers in any order (Long addition is
    * exact and commutative), so per-doc sums are bit-identical while the
    * explode, the join and the per-doc shuffle disappear. */
  def sumModelMicro(
      grams: ArrayData,
      model: java.util.HashMap[UTF8String, java.lang.Long],
      oov: Long): Long = {
    var s = 0L
    var i = 0
    val n = grams.numElements()
    while (i < n) {
      val v = model.get(grams.getUTF8String(i))
      s += (if (v == null) oov else v.longValue())
      i += 1
    }
    s
  }

  /** LSH band keys from a minhash signature: hash of each band's r rows.
    * Docs sharing any band key are near-duplicate candidates. */
  def bandKeys(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L
      var r = 0
      while (r < rows) {
        val v = sig.getLong(b * rows + r)
        acc = acc * 31L + v
        r += 1
      }
      // mix in the band index so identical rows in different bands differ
      out(b) = acc * 31L + b
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Rabin-Karp rolling-hash document fingerprint: minimum hash over all
    * `window`-byte windows (winnowing-style robust fingerprint). */
  def rollingFingerprint(text: UTF8String, window: Int): Long = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 0L
    if (bytes.length <= window) return hash64(bytes)
    val base = 1000003L
    var pow = 1L // base^(window-1)
    var i = 0
    while (i < window - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = h * base + (bytes(i) & 0xff); i += 1 }
    var min = h
    i = window
    while (i < bytes.length) {
      h = (h - (bytes(i - window) & 0xff) * pow) * base + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Token-window chunking: split the document into windows of `size`
    * whitespace tokens advancing by `size - overlap` (the training-prep
    * chunker for context-window-bounded models / RAG passage splits).
    * Tokenizes ONCE and slices index ranges — an array-HOF formulation
    * (`transform(sequence(...), i -> slice(w, ...))`) would re-evaluate
    * the tokenization per chunk after project-collapsing (O(len²)); this
    * kernel is O(len + output chars). A document always yields >= 1 chunk
    * (short/empty docs yield themselves), and the last chunk may be short
    * but is never empty. */
  def chunkTokens(text: UTF8String, size: Int, overlap: Int): ArrayData = {
    val tokens = text.toString.trim.split("\\s+")
    val n = tokens.length
    val stride = size - overlap
    val nChunks =
      if (n <= size) 1
      else math.ceil((n - size).toDouble / stride).toInt + 1
    val out = new Array[AnyRef](nChunks)
    var i = 0
    while (i < nChunks) {
      val start = i * stride
      val end = math.min(start + size, n)
      val sb = new java.lang.StringBuilder
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  // --- language-ID: tiny n-gram/stopword heuristic over common words ---
  private val langMarkers: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "and", "of", "to", "is", "in", "that", "it", "was", "for", "with", "not", "this"),
    "fr" -> Array("le", "la", "les", "de", "des", "et", "est", "une", "un", "dans", "que", "pour", "pas"),
    "es" -> Array("el", "la", "los", "las", "de", "y", "es", "en", "que", "un", "una", "por", "con", "no"),
    "de" -> Array("der", "die", "das", "und", "ist", "in", "von", "den", "mit", "nicht", "ein", "eine", "zu"),
    "it" -> Array("il", "la", "di", "che", "e", "un", "una", "per", "non", "sono", "con", "del"),
    "pt" -> Array("o", "a", "os", "as", "de", "que", "e", "um", "uma", "para", "com", "nao"),
  )
  private val markerSets: Array[(String, java.util.HashSet[String])] =
    langMarkers.map { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (l, s)
    }

  /** Heuristic language ID: share of tokens that are marker stopwords per
    * language; CJK codepoint dominance short-circuits to zh/ja/ko buckets.
    * Returns "und" when no evidence. */
  def langId(text: UTF8String): UTF8String = {
    val s = text.toString
    // CJK detection by codepoint ranges
    var cjk = 0
    var hira = 0
    var hangul = 0
    var letters = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      if (Character.isLetter(cp)) {
        letters += 1
        if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
        else if (cp >= 0x3040 && cp <= 0x30ff) hira += 1
        else if (cp >= 0xac00 && cp <= 0xd7af) hangul += 1
      }
      ci += Character.charCount(cp)
    }
    if (letters > 0 && hangul * 2 > letters) return UTF8String.fromString("ko")
    if (letters > 0 && hira * 4 > letters) return UTF8String.fromString("ja")
    if (letters > 0 && cjk * 2 > letters) return UTF8String.fromString("zh")
    val tokens = splitWs(s.toLowerCase)
    if (tokens.isEmpty) return UTF8String.fromString("und")
    var bestLang = "und"
    var bestScore = 0
    var li = 0
    while (li < markerSets.length) {
      val (lang, set) = markerSets(li)
      var score = 0
      var ti = 0
      while (ti < tokens.length) {
        if (set.contains(tokens(ti))) score += 1
        ti += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = lang }
      li += 1
    }
    UTF8String.fromString(bestLang)
  }
}

/** Codegen'd word-n-gram join over a TOKEN ARRAY column — the compiled
  * form of the `(n-1)`-fold `zip_with(slice, slice, concat_ws(" "))`
  * reduce (round-13): bit-identical output — window i joins tokens
  * i..i+n-1 with single spaces, null tokens are skipped WITHOUT a
  * separator (concat_ws semantics), `distinct` keeps first occurrence
  * under binary string equality (array_distinct semantics) — but one
  * compiled pass instead of n-1 interpreted CodegenFallback HOF evals
  * per row. Callers keep their `when(size >= n, ...)` guard, so the
  * short/null-text branches are untouched. */
case class NgramsJoin(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_join"
  override def nullSafeEval(v: Any): Any =
    TextUtil.ngramsJoin(v.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextUtil.ngramsJoin($c, $n, $distinct)")
  override protected def withNewChildInternal(c: Expression): NgramsJoin = copy(child = c)
}

/** Codegen'd empty-skipping word-n-gram join (round-14): equivalent to
  * `NgramsJoin(filter(tokens, len > 0), n, distinct = false)` but one
  * compiled pass — the shingle pipeline of the sketch/stream family
  * (`shinglesOf`), whose filter+transform HOF stages were interpreted. */
case class NgramsJoinClean(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_join_clean"
  override def nullSafeEval(v: Any): Any =
    TextUtil.ngramsJoinClean(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextUtil.ngramsJoinClean($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramsJoinClean =
    copy(child = c)
}

/** Codegen'd char-trigram shingles of an already-lowered string
  * (round-14) — see [[TextUtil.charTrigrams]] for the exact
  * `split(s, "")`-equivalence contract. */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"
  override def nullSafeEval(v: Any): Any =
    TextUtil.charTrigrams(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextUtil.charTrigrams($c)")
  override protected def withNewChildInternal(c: Expression): CharTrigrams =
    copy(child = c)
}

/** Codegen'd md5-prefix bucket histogram over a token array (round-14)
  * — see [[TextUtil.md5BucketCounts]]. */
case class Md5BucketCounts(child: Expression, hexChars: Int)
    extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 2, s"1 or 2 hex chars: $hexChars")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_bucket_counts"
  override def nullSafeEval(v: Any): Any =
    TextUtil.md5BucketCounts(v.asInstanceOf[ArrayData], hexChars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextUtil.md5BucketCounts($c, $hexChars)")
  override protected def withNewChildInternal(c: Expression): Md5BucketCounts =
    copy(child = c)
}

/** Codegen'd per-doc micro-nat model fold (round-14): sums the model's
  * quantized log-prob (or `oov`) over a grams array — the map-only form
  * of charLmNll's explode + broadcast-join + per-doc sum. The model map
  * rides the plan as a reference object (task binaries are broadcast
  * per stage, so it ships once per executor, like the join relation it
  * replaces). */
case class SumModelMicro(
    child: Expression,
    model: java.util.HashMap[UTF8String, java.lang.Long],
    oov: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_model_micro"
  override def nullSafeEval(v: Any): Any =
    TextUtil.sumModelMicro(v.asInstanceOf[ArrayData], model, oov)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("model", model, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextUtil.sumModelMicro($c, $mapRef, ${oov}L)")
  }
  override protected def withNewChildInternal(c: Expression): SumModelMicro =
    copy(child = c)
}

/** Expression plumbing shared by the unary text kernels. */
abstract class TextKernelExpression extends UnaryExpression {
  protected def helperCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, helperCall)
  protected final val H = "graft.functions.TextUtil"
}

case class NormalizeText(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(v: Any): Any =
    TextUtil.normalizeText(v.asInstanceOf[UTF8String])
  override protected def helperCall(c: String): String = s"$H.normalizeText($c)"
  override protected def withNewChildInternal(c: Expression): NormalizeText = copy(c)
}

case class SimHash64(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(v: Any): Any =
    TextUtil.simhash64(v.asInstanceOf[UTF8String])
  override protected def helperCall(c: String): String = s"$H.simhash64($c)"
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

case class ShingleHashes(child: Expression, n: Int) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(v: Any): Any =
    TextUtil.shingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def helperCall(c: String): String = s"$H.shingleHashes($c, $n)"
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(v: Any): Any =
    TextUtil.minhashSignature(v.asInstanceOf[UTF8String], shingleSize, numHashes)
  override protected def helperCall(c: String): String =
    s"$H.minhashSignature($c, $shingleSize, $numHashes)"
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

case class MinHashOfShingles(child: Expression, numHashes: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_of_shingles"
  override def nullSafeEval(v: Any): Any =
    TextUtil.minhashOfShingles(v.asInstanceOf[ArrayData], numHashes)
  override protected def helperCall(c: String): String =
    s"$H.minhashOfShingles($c, $numHashes)"
  override protected def withNewChildInternal(c: Expression): MinHashOfShingles =
    copy(child = c)
}

case class BandKeys(child: Expression, bands: Int, rows: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys"
  override def nullSafeEval(v: Any): Any =
    TextUtil.bandKeys(v.asInstanceOf[ArrayData], bands, rows)
  override protected def helperCall(c: String): String =
    s"$H.bandKeys($c, $bands, $rows)"
  override protected def withNewChildInternal(c: Expression): BandKeys = copy(child = c)
}

case class RollingFingerprint(child: Expression, window: Int)
    extends TextKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"
  override def nullSafeEval(v: Any): Any =
    TextUtil.rollingFingerprint(v.asInstanceOf[UTF8String], window)
  override protected def helperCall(c: String): String =
    s"$H.rollingFingerprint($c, $window)"
  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

case class ChunkTokens(child: Expression, size: Int, overlap: Int)
    extends TextKernelExpression {
  require(size > 0 && overlap >= 0 && overlap < size,
    s"chunk size must be positive and overlap in [0, size): size=$size overlap=$overlap")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_tokens"
  override def nullSafeEval(v: Any): Any =
    TextUtil.chunkTokens(v.asInstanceOf[UTF8String], size, overlap)
  override protected def helperCall(c: String): String =
    s"$H.chunkTokens($c, $size, $overlap)"
  override protected def withNewChildInternal(c: Expression): ChunkTokens =
    copy(child = c)
}

case class LangId(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullSafeEval(v: Any): Any = TextUtil.langId(v.asInstanceOf[UTF8String])
  override protected def helperCall(c: String): String = s"$H.langId($c)"
  override protected def withNewChildInternal(c: Expression): LangId = copy(c)
}

/** Column-level text analysis API. */
object text {
  def normalize(c: Column): Column = column(NormalizeText(expression(c)))
  def simhash(c: Column): Column = column(SimHash64(expression(c)))
  def shingles(c: Column, n: Int): Column = column(ShingleHashes(expression(c), n))
  def ngramsJoin(tokens: Column, n: Int, distinct: Boolean): Column =
    column(NgramsJoin(expression(tokens), n, distinct))
  def ngramsJoinClean(tokens: Column, n: Int): Column =
    column(NgramsJoinClean(expression(tokens), n))
  def charTrigrams(lowered: Column): Column =
    column(CharTrigrams(expression(lowered)))
  def md5BucketCounts(tokens: Column, hexChars: Int): Column =
    column(Md5BucketCounts(expression(tokens), hexChars))
  def sumModelMicro(
      grams: Column,
      model: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long],
      oov: Long): Column =
    column(SumModelMicro(expression(grams), model, oov))
  def minhash(c: Column, shingleSize: Int, numHashes: Int): Column =
    column(MinHashSignature(expression(c), shingleSize, numHashes))
  def minhashOfShingles(shingles: Column, numHashes: Int): Column =
    column(MinHashOfShingles(expression(shingles), numHashes))
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    column(BandKeys(expression(sig), bands, rows))
  def fingerprint(c: Column, window: Int = 32): Column =
    column(RollingFingerprint(expression(c), window))
  def langId(c: Column): Column = column(LangId(expression(c)))
  def chunks(c: Column, size: Int, overlap: Int): Column =
    column(ChunkTokens(expression(c), size, overlap))

  /** whitespace token count (composed from codegen'd built-ins) */
  def tokenCount(c: Column): Column =
    size(split(trim(c), "\\s+"))

  /** exact Jaccard similarity of two hashed-shingle arrays */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(array_union(a, b)).cast(DoubleType)
    when(uni === 0d, 0d).otherwise(inter / uni)
  }
}
