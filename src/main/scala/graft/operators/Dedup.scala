package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{text, vectors}

/** Deduplication operators for large-scale document pipelines.
  *
  * Scale notes (the designs assume a 1000-executor cluster over ~100 TB):
  *  - exact dedup is a single hash-aggregate on the group key — map-side
  *    partial aggregation keeps the shuffle proportional to #distinct keys;
  *  - minhash/simhash signatures are computed map-only (custom codegen'd
  *    expressions, no shuffle); only (doc, band-key) pairs shuffle, and
  *    candidate verification joins only within band buckets — never an
  *    all-pairs product;
  *  - oversized LSH buckets (degenerate near-identical corpora) are capped
  *    to bound the per-bucket pair blowup.
  */
object Dedup {

  /** Exact dedup: one surviving row per key (the one with the smallest
    * tie-break value). Single shuffle on the hashed key with map-side
    * combine; at 100 TB hash the key (md5) instead of grouping on a long
    * text column so shuffle rows stay narrow. */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    val key = md5(concat_ws("\u0000", keyCols.map(col): _*)).as("dedup_key")
    df.select(key, col(tieBreak), struct(df.columns.map(col): _*).as("row"))
      .groupBy(col("dedup_key"))
      .agg(min_by(col("row"), col(tieBreak)).as("row"), count(lit(1)).as("n_copies"))
      .select(col("row.*"), col("n_copies"))
  }

  /** MinHash signatures per document: map-only, no shuffle. */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64): DataFrame =
    df.select(
      col(idCol),
      text.minhash(col(textCol), shingleSize, numHashes).as("minhash_sig"))

  /** MinHash + LSH candidate pairs, verified with exact Jaccard over the
    * hashed shingle sets. `bands` x `rowsPerBand` must equal `numHashes`.
    *
    * Plan shape: signature+bands map-only -> explode bands (xB rows) ->
    * self-join on band key (shuffle on band key only) -> distinct pairs ->
    * verify by joining back the shingle arrays. `maxBucket` drops
    * pathological buckets (bounds worst-case pair count per bucket).
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 200): DataFrame = {
    val numHashes = bands * rowsPerBand
    val docs = df
      .select(
        col(idCol).as("doc_id"),
        text.shingles(col(textCol), shingleSize).as("shingle_set"))
      .withColumn("band_keys", text.lshBands(
        text.minhashOfShingles(col("shingle_set"), numHashes), bands, rowsPerBand))
      // reused by band-bucketing AND the exact-Jaccard verify; explicit
      // MEMORY_AND_DISK (Dataset.cache()'s default, spelled out): the
      // full shingle-set arrays spill to disk rather than evict at 100 TB
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // one shuffle: gather each band bucket's doc ids, cap pathological
    // buckets (a bucket of size m yields O(m^2) pairs), then emit the
    // pairs from the gathered array without a self-join
    val buckets = docs
      .select(col("doc_id"), posexplode(col("band_keys")).as(Seq("band", "key")))
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val candidates = buckets
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a"), col("p.b"))
      .distinct()

    val withSets = candidates
      .join(docs.select(col("doc_id").as("a"), col("shingle_set").as("sa")), "a")
      .join(docs.select(col("doc_id").as("b"), col("shingle_set").as("sb")), "b")
      .withColumn("jaccard", text.jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("a"), col("b"), col("jaccard"))
    withSets
  }

  /** Signature-index rows for a corpus slice: `(doc_id, shingle_set,
    * band_keys)` — persist these as a (graft) table and new batches
    * dedup against the INDEX instead of re-scanning the corpus. At
    * 100 TB this is the only sane shape: each new crawl is O(batch),
    * never O(history). Map-only. */
  def minhashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      text.shingles(col(textCol), shingleSize).as("shingle_set"))
      .withColumn("band_keys", text.lshBands(
        text.minhashOfShingles(col("shingle_set"), bands * rowsPerBand),
        bands, rowsPerBand))

  /** Incremental dedup: flag NEW documents that near-duplicate ANY
    * indexed document. Band-bucket join between the batch's keys and
    * the index's keys (the shuffle carries ids + band keys only — the
    * index's shingle sets join in once, only for candidates), exact
    * Jaccard verify, one flag per new doc. Hot index buckets above
    * `maxBucket` are skipped (the minhashLsh recall trade, documented
    * there); every new doc appears in the output with `is_dup`. */
  def incrementalFlags(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 200): DataFrame = {
    val fresh = minhashIndex(newDocs, idCol, textCol, shingleSize, bands, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nk = fresh.select(col("doc_id").as("nid"),
      posexplode(col("band_keys")).as(Seq("band", "key")))
    val ik = index.select(col("doc_id").as("iid"),
      posexplode(col("band_keys")).as(Seq("band", "key")))
    // cap pathological buckets on the INDEX side (boilerplate shingles)
    val bucketSizes = ik.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bs")).filter(col("bs") <= maxBucket)
    val candidates = nk
      .join(ik.join(bucketSizes.select("band", "key"), Seq("band", "key")),
        Seq("band", "key"))
      .select(col("nid"), col("iid")).distinct()
    val verified = candidates
      .join(fresh.select(col("doc_id").as("nid"), col("shingle_set").as("sn")), "nid")
      .join(index.select(col("doc_id").as("iid"), col("shingle_set").as("si")), "iid")
      .filter(text.jaccard(col("sn"), col("si")) >= jaccardThreshold)
      .select(col("nid")).distinct()
    fresh.select(col("doc_id"))
      .join(verified.withColumnRenamed("nid", "doc_id")
        .withColumn("_hit", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_hit"), lit(false)).as("is_dup"))
  }

  /** Cross-batch near-dup PAIRS: the same band-bucket-join + exact
    * Jaccard verify as [[incrementalFlags]], but KEEPING the matched
    * index identity — `(nid, iid, keepIndexCols...)`, the edge list an
    * incremental component merge ([[mergeComponentLabels]]) consumes.
    * `keepIndexCols` carries extra index columns (e.g. each indexed
    * doc's component label) through to the output, so the caller maps
    * pairs to super-edges without a second history lookup. O(batch)
    * shuffle: band keys + candidate ids; the index never re-shingles. */
  def incrementalPairs(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 200,
      keepIndexCols: Seq[String] = Nil): DataFrame = {
    val fresh = minhashIndex(newDocs, idCol, textCol, shingleSize, bands, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nk = fresh.select(col("doc_id").as("nid"),
      posexplode(col("band_keys")).as(Seq("band", "key")))
    val ik = index.select(col("doc_id").as("iid"),
      posexplode(col("band_keys")).as(Seq("band", "key")))
    // cap pathological buckets on the INDEX side (boilerplate shingles)
    val bucketSizes = ik.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bs")).filter(col("bs") <= maxBucket)
    val candidates = nk
      .join(ik.join(bucketSizes.select("band", "key"), Seq("band", "key")),
        Seq("band", "key"))
      .select(col("nid"), col("iid")).distinct()
    val keep = keepIndexCols.map(col)
    candidates
      .join(fresh.select(col("doc_id").as("nid"), col("shingle_set").as("sn")), "nid")
      .join(index.select(
        (Seq(col("doc_id").as("iid"), col("shingle_set").as("si")) ++ keep): _*),
        "iid")
      .filter(text.jaccard(col("sn"), col("si")) >= jaccardThreshold)
      .select((Seq(col("nid"), col("iid")) ++ keep): _*)
  }

  /** INCREMENTAL connected components: merge a batch of new near-dup
    * pairs into a PERSISTED `(doc_id, component)` label table without
    * re-clustering history — the last full-recompute in the dedup
    * family goes O(batch ∪ touched components).
    *
    * `superPairs` carries SUPER-EDGES: each endpoint is either an
    * existing component label (for endpoints already in `labels` —
    * the minhash index stores each doc's component, so pair generation
    * yields these directly) or a raw doc id (for endpoints history has
    * never labeled). The merge contracts to the component graph:
    * pointer-jumping CC runs over the BATCH-SIZED super-edge set, and
    * because component labels are min member ids, the merged label
    * (min over merged super-nodes) equals the min doc id of the merged
    * cluster — exactly what a full recompute over all pairs yields.
    *
    * Returns the label DELTA only: `(doc_id, component)` for docs
    * newly labeled or re-labeled; history rows in untouched components
    * emit nothing. Upsert the delta into the label table (equality
    * delete on doc_id + append) and refresh the same docs' component
    * column in the minhash index to complete the maintenance cycle.
    *
    * 100 TB shape: new-label rows come straight from the batch-sized
    * component graph; member RE-labeling is one broadcast join of the
    * bounded merge map against `labels` keyed on component — and when
    * `bucketCol = Some((name, n))` names a `pmod(component, n)` column
    * the label table identity-partitions on, the touched-bucket values
    * (a <= n-row bounded collect) push down as a partition filter, so
    * the join reads ONLY touched partitions instead of scanning
    * history. */
  def mergeComponentLabels(
      labels: DataFrame,
      superPairs: DataFrame,
      aCol: String,
      bCol: String,
      bucketCol: Option[(String, Int)] = None): DataFrame = {
    val edges = superPairs
      .select(col(aCol).cast("long").as("sa"), col(bCol).cast("long").as("sb"))
      .filter(col("sa") =!= col("sb"))
    // CC over the CONTRACTED graph — bounded by the batch's pair count,
    // independent of history size
    val m = connectedComponents(edges, "sa", "sb")
      .select(col("doc_id").as("node"), col("component").as("newc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scoped = bucketCol match {
      case Some((bc, n)) =>
        // BOUNDED collect (<= n rows after pmod+distinct, comment-
        // audited): the touched-bucket list becomes a pushable
        // partition filter on the label table's identity partitioning
        val touched = m.select(pmod(col("node"), lit(n.toLong)).as("b"))
          .distinct().collect().map(_.getLong(0))
        labels.filter(col(bc).isin(touched: _*))
      case None => labels
    }
    // every member of a touched existing component, via ONE broadcast
    // join keyed on component; bounded by touched-component mass
    val members = scoped
      .select(col("doc_id"), col("component"))
      .join(broadcast(m.withColumnRenamed("node", "component")),
        Seq("component"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val relabeled = members.filter(col("newc") =!= col("component"))
      .select(col("doc_id"), col("newc").as("component"))
    // super-nodes that matched NO existing component label are docs
    // gaining their first label (new-batch docs and never-clustered
    // indexed docs); both joins here are merge-map-sized
    val matched = members.select(col("component").as("node")).distinct()
    val direct = m.join(matched, Seq("node"), "left_anti")
      .select(col("node").as("doc_id"), col("newc").as("component"))
    relabeled.unionByName(direct)
  }

  /** WRITE BACK a [[mergeComponentLabels]] delta, completing the
    * incremental-CC maintenance cycle against REAL tables so the NEXT
    * batch merges against updated state:
    *
    *   1. label table: equality-delete the delta's doc ids + append the
    *      delta rows (with the `pmod(component, n)` bucket column when
    *      `bucketCol` names the table's identity partitioning) — only
    *      touched docs rewrite;
    *   2. minhash index: the delta's EXISTING index rows rewrite with
    *      their new component (a stale component there would contract a
    *      later batch's super-edge onto a label that no longer exists),
    *      and `batchIndex` — the new batch's [[minhashIndex]] rows —
    *      appends with first labels (null component = unclustered, the
    *      same convention the batch-1 build uses).
    *
    * Everything written is delta/batch-bounded; history rows in
    * untouched components are never rewritten. The delta materializes
    * BEFORE either mutation (its plan reads both tables), and the index
    * refresh reads the pinned pre-delete snapshot — the same
    * read-your-own-delete discipline as the sketch-state tables.
    *
    * INVARIANTS (round-14, load-bearing for the single-upsert commits):
    * `delta.doc_id` must be UNIQUE (mergeComponentLabels emits one row
    * per relabeled doc) and `batchIndex.doc_id` must be DISJOINT from
    * the pre-existing index's ids (batches are disjoint corpus slices).
    * A violated invariant would silently land duplicate index rows on
    * the bench tables (which set `write.upsert.dedup=false`) or
    * silently drop the refreshed row under the default last-wins dedup.
    * Set `spark.graft.debug.assert-upsert-unique=true` to fail loudly
    * instead: each upsert input is then counted against its distinct
    * key count (one cheap aggregate per table, off the bench path). */
  def applyComponentDelta(
      spark: org.apache.spark.sql.SparkSession,
      labels: graft.tables.GraftTable,
      index: graft.tables.GraftTable,
      delta: DataFrame,
      batchIndex: DataFrame,
      bucketCol: Option[(String, Int)] = None): Unit = {
    val d = delta.select(col("doc_id"), col("component"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = d.count() // materialize before mutating what the plan reads
    val assertUnique = spark.conf
      .get("spark.graft.debug.assert-upsert-unique", "false").toBoolean
    def requireUniqueKeys(df: DataFrame, what: String): Unit = if (assertUnique) {
      val r = df.agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("nd")).head()
      require(r.getLong(0) == r.getLong(1),
        s"$what upsert input violates doc_id uniqueness: " +
          s"${r.getLong(0)} rows over ${r.getLong(1)} distinct ids")
    }
    // the batch's index rows always land, labeled or not — unclustered
    // docs must be findable by every later batch's pair generation
    val fresh = batchIndex.join(d, Seq("doc_id"), "left")
    if (touched > 0) {
      val labeled = bucketCol match {
        case Some((bc, n)) =>
          d.withColumn(bc, pmod(col("component"), lit(n.toLong)))
        case None => d
      }
      // round-13: one upsert snapshot per table instead of separate
      // equality-delete + append commits — identical table contents
      // (the upsert's delete and data land at ONE sequence; eq deletes
      // apply strictly below their sequence, exactly like the delete
      // commit preceding the append did) at half the commit machinery
      // (2 manifest/metadata writes per batch cycle, not 5). Delta doc
      // ids are unique by construction, so the upsert's within-batch
      // last-wins window is a no-op semantically.
      requireUniqueKeys(labeled, "labels")
      labels.upsert(spark, labeled, keyCols = Seq("doc_id"))
      val snap = index.metadata.currentSnapshotId.get
      val old = index.scan(spark, snapshotId = Some(snap))
      val order = old.columns
      val refreshed = old.drop("component").join(d, Seq("doc_id"))
        .select(order.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      refreshed.count() // materialize off the pinned snapshot pre-delete
      // refreshed ids (pre-existing index rows) and the fresh batch's
      // ids are disjoint slices of the corpus, so one upsert commits
      // BOTH the component refresh and the batch append: the eq delete
      // covers fresh ids too, a no-op (they have no older rows)
      val indexUp = refreshed.unionByName(fresh.select(order.map(col): _*))
      requireUniqueKeys(indexUp, "index")
      index.upsert(spark, indexUp, keyCols = Seq("doc_id"))
      refreshed.unpersist()
    } else {
      index.append(spark, fresh)
    }
    d.unpersist()
  }

  /** SimHash fingerprints per document (map-only). Near-dups = small
    * Hamming distance; pair generation buckets on rotated prefixes. */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), text.simhash(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs within Hamming distance `maxHamming`, using the
    * pigeonhole trick: split 64 bits into (maxHamming+1) blocks; any pair
    * within the distance shares at least one exact block -> join per block
    * (shuffle on narrow block keys, never all-pairs).
    *
    * Scale note: block keys carry 64/(maxHamming+1) bits, so recall is
    * exact but large `maxHamming` narrows the key space — production
    * dedup uses small distances (default 3 -> 16-bit keys). `maxBucket`
    * caps degenerate buckets (a bucket of m docs yields O(m²) pairs);
    * a dropped bucket trades recall for boundedness, exactly like the
    * minhash-LSH and embedding paths.
    *
    * SIZE THE KEY SPACE TO THE CORPUS: recall silently collapses when
    * corpus / 2^(64/(maxHamming+1)) exceeds `maxBucket`, because every
    * bucket blows the cap and is dropped (e.g. maxHamming=21 -> 2-bit
    * keys -> 4 buckets/block). Keep expected bucket size well under the
    * cap, or raise `maxBucket` along with `maxHamming`. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val sh = simhashes(df, idCol, textCol).withColumnRenamed(idCol, "doc_id")
    val keyed = sh.select(
      col("doc_id"),
      col("simhash"),
      explode(array((0 until blocks).map { i =>
        struct(
          lit(i).as("block"),
          shiftrightunsigned(col("simhash"), i * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.block"), col("bk.key"))
    val sized = keyed
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("block"), col("key"))))
      .filter(col("bucket_n") <= maxBucket)
    val a = sized.select(col("block"), col("key"), col("doc_id").as("a"), col("simhash").as("ha"))
    val b = sized.select(col("block"), col("key"), col("doc_id").as("b"), col("simhash").as("hb"))
    a.join(b, Seq("block", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** N-gram Jaccard similarity for given candidate pairs (exact, on hashed
    * shingles). `pairs` has columns (a, b). */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame,
      n: Int = 3): DataFrame = {
    val sets = docs.select(
      col(idCol).as("doc_id"),
      text.shingles(col(textCol), n).as("s"))
    pairs
      .join(sets.select(col("doc_id").as("a"), col("s").as("sa")), "a")
      .join(sets.select(col("doc_id").as("b"), col("s").as("sb")), "b")
      .select(col("a"), col("b"), text.jaccard(col("sa"), col("sb")).as("jaccard"))
  }

  /** Embedding near-duplicate pairs via banded random-hyperplane LSH:
    * map-only sign-bit signature split into `bands` blocks (near vectors
    * agree on a whole block far more often than on the full signature),
    * bucket gather per (band, block-key) with a `maxBucket` cap so a
    * degenerate corpus (many identical vectors) yields bounded pairs
    * instead of O(m^2), pair generation from the gathered id arrays (ids
    * only ride the shuffle — vectors join back just for the cosine
    * verify). At 100 TB raise `bits` for narrower buckets; `bands` keeps
    * recall. */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double = 0.95,
      bits: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 200): DataFrame = {
    val width = bits / bands
    val sigs = df.select(
      col(idCol).as("id"), vectors.signBits(col(vecCol), bits).as("sig"))
    val banded = sigs.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val buckets = banded
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val candidates = buckets
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("vec_a"), col("p.b").as("vec_b"))
      .distinct()
    val va = df.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val vb = df.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    candidates
      .join(va, "vec_a")
      .join(vb, "vec_b")
      .withColumn("cosine", vectors.cosineSim(col("va"), col("vb")))
      .filter(col("cosine") >= cosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Embedding-side signature index: `(id, vec, sig)` rows to persist as
    * pipeline state for [[embeddingIncrementalFlags]] (the SemDeDup
    * shape, incremental: new embeddings flag against history in
    * O(batch)). Map-only. */
  def embeddingIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int = 16): DataFrame =
    df.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      vectors.signBits(col(vecCol), bits).as("sig"))

  /** Flag NEW embeddings that near-duplicate ANY indexed one: band the
    * sign-bit signatures on both sides, join on (band, block-key) — ids
    * and block keys only on the shuffle — cap hot index buckets, cosine
    * verify against the index vectors, one flag per new id. */
  def embeddingIncrementalFlags(
      newDf: DataFrame,
      index: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double = 0.95,
      bits: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 200): DataFrame = {
    val width = bits / bands
    def bandKeys(sigs: DataFrame, idName: String): DataFrame = sigs.select(
      col("id").as(idName),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col(idName), col("bk.band"), col("bk.key"))
    val fresh = embeddingIndex(newDf, idCol, vecCol, bits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nk = bandKeys(fresh, "nid")
    val ik = bandKeys(index.select(col("id"), col("sig")), "iid")
    val okBuckets = ik.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bs")).filter(col("bs") <= maxBucket)
      .select("band", "key")
    val candidates = nk
      .join(ik.join(okBuckets, Seq("band", "key")), Seq("band", "key"))
      .select(col("nid"), col("iid")).distinct()
    val verified = candidates
      .join(fresh.select(col("id").as("nid"), col("vec").as("vn")), "nid")
      .join(index.select(col("id").as("iid"), col("vec").as("vi")), "iid")
      .filter(vectors.cosineSim(col("vn"), col("vi")) >= cosineThreshold)
      .select(col("nid")).distinct()
    fresh.select(col("id"))
      .join(verified.withColumnRenamed("nid", "id")
        .withColumn("_hit", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("_hit"), lit(false)).as("is_dup"))
  }

  /** word k-gram strings per doc via k-1 zip_withs over shifted slices —
    * slices are function ARGUMENTS (evaluated once per row), never a
    * lambda that re-tokenizes per element (O(len²)); array index i holds
    * the gram starting at token position i+1 */
  private def wordGrams(textCol: Column, k: Int): Column = {
    val w = filter(split(lower(textCol), "[^a-z0-9]+"), x => length(x) > 0)
    val cnt = size(w) - (k - 1)
    if (k == 1) w
    else when(size(w) >= k,
      (0 until k).map(o => slice(w, lit(o + 1), cnt))
        .reduce((acc, p) => zip_with(acc, p, (a, b) => concat_ws(" ", a, b))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact-substring duplication coverage (the "deduplicating training
    * data makes language models better" pass, Lee et al. 2021): a token
    * span is DUPLICATED when the k-token gram starting there occurs more
    * than once anywhere in the corpus. Per document this reports the
    * duplicated-gram count, the number of tokens covered by at least one
    * duplicated gram (overlapping grams merged into spans), the merged
    * span count, and the covered fraction — the signals a pipeline
    * thresholds on to drop or trim substring-contaminated documents.
    *
    * Scale design: the corpus shuffles ONCE as narrow (doc, start,
    * gram-hash) triples — the gram TEXT never leaves its split (md5/16
    * hex ride the shuffle); duplicate detection is a hash-aggregate with
    * map-side combine (shuffle ∝ distinct grams per partition); the
    * join back is a semi-join on the hash; interval merging needs NO
    * interval state — duplicated starts sort per doc and each start
    * contributes `min(gap-to-previous, k)` covered tokens, a window
    * function whose state is one row (never a per-doc array). */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val grams = df.select(
      col(idCol).as("doc_id"),
      posexplode(wordGrams(col(textCol), k)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("start"),
        substring(md5(col("g")), 1, 16).as("h"))
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start"))
    val hits = grams.join(dup, Seq("h"), "left_semi")
      .withColumn("gap", col("start") - lag(col("start"), 1).over(win))
    val agg = hits.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_dup_grams"),
      sum(when(col("gap").isNull, k).otherwise(least(col("gap"), lit(k))))
        .as("covered_tokens"),
      sum(when(col("gap").isNull || col("gap") > k, 1L).otherwise(0L))
        .as("n_spans"))
    df.select(
      col(idCol).as("doc_id"),
      size(filter(split(lower(col(textCol)), "[^a-z0-9]+"), x => length(x) > 0))
        .cast(LongType).as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        when(col("n_tokens") > 0,
          round(coalesce(col("covered_tokens"), lit(0L)).cast(DoubleType) /
            col("n_tokens"), 6)).otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Exact-substring REMOVAL (the cut half of Lee et al. 2021): every
    * token covered by a corpus-duplicated k-gram is dropped and the
    * document re-assembled from the survivors — dedup_substrings' stats
    * tell you how much would go; this actually cuts it.
    *
    * Scale design: duplicate detection is the same narrow-triple shuffle
    * as [[duplicatedSpans]]; the cut avoids a per-position × per-span
    * range join with an AS-OF window — tokens and duplicated starts
    * union into one per-doc ordered stream, a running `max(start)`
    * window attaches each position's latest duplicated start at or
    * before it, and the position is covered iff that start is within
    * k-1. One per-doc sort, state of one row, never an interval list. */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val grams = df.select(
      col(idCol).as("doc_id"),
      posexplode(wordGrams(col(textCol), k)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        substring(md5(col("g")), 1, 16).as("h"))
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    val starts = grams.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"), col("pos").as("start"),
        lit(null).cast("string").as("tok"))
    val toks = df.select(
      col(idCol).as("doc_id"),
      posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        x => length(x) > 0)).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        lit(null).cast("int").as("start"), col("tok"))
    // one ordered stream per doc: at equal pos the START sorts first
    // (null tok), so a gram starting AT a position covers that position
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("pos"), col("tok").asc_nulls_first)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val marked = starts.unionByName(toks)
      .withColumn("last_start", max(col("start")).over(w))
      .filter(col("tok").isNotNull)
      .withColumn("covered",
        col("last_start").isNotNull && col("pos") - col("last_start") < k)
    marked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(!col("covered"), 1L).otherwise(0L)).as("kept_tokens"),
      // collect_list drops the NULLs the `when` leaves for covered rows
      array_join(
        transform(
          sort_array(collect_list(
            when(!col("covered"), struct(col("pos"), col("tok"))))),
          x => x.getField("tok")),
        " ").as("cleaned_text"))
  }

  /** Winnowing fingerprint overlap (Schleimer et al. 2003, the MOSS
    * algorithm): each document keeps the MINIMUM gram hash of every
    * w-wide window over its k-gram sequence — winnowing guarantees any
    * shared substring of length >= w+k-1 tokens produces at least one
    * shared fingerprint, so pair recall over long overlaps is structural,
    * not probabilistic (the difference from minhash, which samples the
    * whole-document shingle SET and loses locality). Pairs sharing >=
    * `minShared` distinct fingerprints are reported with the shared
    * count — the plagiarism/near-dup detector tuned for partial overlap.
    *
    * Scale design: fingerprint selection is MAP-ONLY (window-min folds
    * over the in-row hash array; hex strings of fixed width compare
    * lexicographically = numerically, so the min is engine-portable);
    * only distinct (doc, fingerprint) pairs shuffle; pair generation
    * gathers per-fingerprint buckets with a `maxBucket` cap — bounded
    * pair blowup, never an all-pairs product, same discipline as the
    * LSH paths. */
  def winnowPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4,
      minShared: Int = 2,
      maxBucket: Int = 200): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // gram hashes per doc (codegen'd), then the sliding window-min in a
    // per-partition kernel with a monotonic deque — O(m) per document.
    // NOT an array-HOF `transform(j -> array_min(slice(hs, j, w)))`:
    // CollapseProject inlines the hash-array expression into the lambda,
    // re-tokenizing + re-md5ing the document PER WINDOW POSITION
    // (O(len²·md5) — measured 100x slower at sf0.1). Emits distinct
    // (doc, fingerprint) pairs directly; still map-only, no shuffle.
    val hashed = docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      transform(wordGrams(col(textCol), k),
        g => substring(md5(g), 1, 8)).as("hs"))
    val fps = hashed.as[(Long, Seq[String])].flatMap { case (id, hsSeq) =>
      val hs = hsSeq.toArray
      val m = hs.length
      val out = scala.collection.mutable.HashSet[String]()
      if (m > 0 && m < w) out += hs.min // one whole-array window
      else if (m >= w) {
        val dq = new java.util.ArrayDeque[Int]()
        var j = 0
        while (j < m) {
          while (!dq.isEmpty && hs(dq.peekLast()) >= hs(j)) dq.pollLast()
          dq.addLast(j)
          if (dq.peekFirst() <= j - w) dq.pollFirst()
          if (j >= w - 1) out += hs(dq.peekFirst())
          j += 1
        }
      }
      out.iterator.map(fp => (id, fp))
    }.toDF("doc_id", "fp")
    val pairsPerFp = fps
      .groupBy(col("fp"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a"), col("p.b"))
    pairsPerFp.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Near-duplicate pairs over any fixed-width '01' bit-string
    * fingerprint (dHash, simhash-as-string, …) by the pigeonhole trick:
    * split the string into `maxHamming+1` contiguous blocks — any pair
    * within the distance agrees on at least one whole block — bucket per
    * (block index, block value), cap pathological buckets, emit pairs
    * from the gathered id arrays, then verify with the exact Hamming
    * distance (a 1-char-per-position fold, O(bits) per CANDIDATE pair,
    * never all-pairs). Same scale discipline as [[simhashPairs]], minus
    * the 64-bit ceiling: works at any fingerprint width. */
  def bitstringPairs(
      df: DataFrame,
      idCol: String,
      bitsCol: String,
      maxHamming: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be >= 0")
    val blocks = maxHamming + 1
    val base = df.select(col(idCol).as("doc_id"), col(bitsCol).as("bits"))
    val n = length(col("bits"))
    val keyed = base.select(
      col("doc_id"), col("bits"),
      posexplode(transform(sequence(lit(0), lit(blocks - 1)), b => {
        // near-equal contiguous blocks: [b*n/blocks, (b+1)*n/blocks)
        val lo = floor((b * n) / lit(blocks)).cast("int")
        val hi = floor(((b + 1) * n) / lit(blocks)).cast("int")
        col("bits").substr(lo + 1, hi - lo)
      })).as(Seq("block", "key")))
    val buckets = keyed
      .groupBy(col("block"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val candidates = buckets
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a"), col("p.b"))
      .distinct()
    val ha = base.select(col("doc_id").as("a"), col("bits").as("ba"))
    val hb = base.select(col("doc_id").as("b"), col("bits").as("bb"))
    candidates.join(ha, "a").join(hb, "b")
      .withColumn("hamming",
        size(filter(zip_with(split(col("ba"), ""), split(col("bb"), ""),
          (x, y) => x =!= y), v => v)).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Connected components over a near-duplicate pair list: every doc in a
    * pair gets the MIN doc id of its component — the canonical-survivor
    * assignment a dedup pipeline needs to collapse duplicate CLUSTERS
    * (A~B, B~C => {A,B,C} share one survivor), not just pairs.
    *
    * Scale design: min-label propagation with POINTER JUMPING — each
    * round (a) pulls the min label across edges, then (b) rewrites every
    * label to its label's label, short-circuiting chains — so convergence
    * is O(log n) rounds even on path-shaped components (plain propagation
    * needs O(diameter)). Each round shuffles only narrow (id, label)
    * pairs; `localCheckpoint` truncates the growing plan lineage (on a
    * real cluster use `checkpoint` for durable truncation). The loop is
    * driver-side but every step is distributed; the convergence probe is
    * a `limit(1)` existence check, not a full count. */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
      .union(pairs.select(col(bCol).as("s"), col(aCol).as("d")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val viaEdges = edges
        .join(labels.select(col("id").as("d"), col("comp")), "d")
        .groupBy(col("s").as("id")).agg(min(col("comp")).as("ecomp"))
      // checkpointed: the pointer-jump self-joins `pulled` with itself,
      // and an uncheckpointed plan would re-run the edge join + groupBy
      // once per side, every round. `prev` (the round-entry label) rides
      // along so the convergence probe below is a FILTER over the
      // checkpointed frame instead of a join back against `labels` —
      // one keyed shuffle per round saved (round-13).
      val pulled = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ecomp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .localCheckpoint()
      val jumped = pulled
        .join(pulled.select(col("id").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("comp2"), col("comp")).as("comp"),
          col("prev"))
        .localCheckpoint()
      val changed = jumped
        .filter(col("comp") =!= col("prev")).limit(1).count()
      labels = jumped.select(col("id"), col("comp"))
      done = changed == 0
      round += 1
    }
    labels.select(col("id").as("doc_id"), col("comp").as("component"))
  }

  /** LSH near-dup components with an EXACT-duplicate PRE-COLLAPSE — the
    * production ordering (exact dedup before fuzzy, as in C4/RefinedWeb):
    * documents are grouped by their full shingle SET (md5 of the sorted
    * set), LSH + pointer-jumping run over one REPRESENTATIVE per group,
    * and the component labels expand back over group members.
    *
    * Semantics-preserving by construction — with one equal-or-better
    * asymmetry: Jaccard depends only on the shingle set, so same-set
    * documents have identical neighbors and pairwise similarity 1
    * (>= any threshold) when the set is non-empty; empty-set documents
    * (texts under `shingleSize` words) pair with nothing, exactly like
    * the uncollapsed path. Labels stay the min doc id of the cluster:
    * each group's representative is its min id, and the rep-graph min
    * equals the full-cluster min. The asymmetry: a band bucket holding
    * more than `maxBucket` exact copies is DROPPED (all its pairs lost)
    * in the uncollapsed path but survives as one row after collapse, so
    * on copy-heavy corpora the collapsed labels can RESCUE pairs the
    * cap would have discarded — outputs are equal or better recall,
    * never worse.
    *
    * The 100 TB lever: real corpora are DOMINATED by exact duplicates
    * (boilerplate, mirrors, re-crawls). A bucket holding m copies of one
    * page emits O(m^2) candidate pairs uncollapsed; collapsed it holds 1
    * row, so LSH shuffle volume and pair counts track UNIQUE content —
    * the 10x-copies sf1 shape drops from quadratic to linear. */
  def textComponents(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 200): DataFrame = {
    val keyed = df
      .select(
        col(idCol).cast("long").as("doc_id"),
        text.shingles(col(textCol), shingleSize).as("_sh"))
      .select(col("doc_id"),
        md5(concat_ws("\u0001", sort_array(col("_sh")))).as("_k"),
        (size(col("_sh")) > 0).as("_nonempty"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = keyed.groupBy("_k")
      .agg(min("doc_id").as("_rep"), count(lit(1)).as("_gsize"))
    val members = keyed.join(groups, "_k")
    val reps = df.join(
      members.filter(col("doc_id") === col("_rep"))
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_semi")
    val pairs = minhashLsh(reps, idCol, textCol,
        shingleSize, bands, rowsPerBand, jaccardThreshold, maxBucket)
      .select(col("a"), col("b"))
    val repComps = connectedComponents(pairs, "a", "b")
      .select(col("doc_id").as("_rep"), col("component"))
    // expansion: members inherit their rep's component; an exact-dup
    // group with no fuzzy neighbors is its own cluster labeled by its
    // rep (= min id); empty-set docs and unpaired singletons emit no row
    // materialize via persist(DISK_ONLY) + eager count, NOT
    // localCheckpoint: persist RETAINS the lineage, so on a real cluster
    // an executor lost mid-query recomputes its missing label blocks
    // instead of failing the job (localCheckpoint truncates lineage into
    // non-reliable executor storage — a single executor loss at 100 TB
    // would force a whole-query rerun). The labels frame is one row per
    // clustered doc — far smaller than the corpus — so disk-only blocks
    // are cheap; the eager count pins them before `keyed` unpersists.
    val out = members.filter(col("_nonempty"))
      .join(repComps, Seq("_rep"), "left")
      .filter(col("component").isNotNull || col("_gsize") > 1)
      .select(col("doc_id"),
        coalesce(col("component"), col("_rep")).as("component"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    out.count()
    keyed.unpersist()
    out
  }

  /** End-to-end corpus dedup: given the `(doc_id, component)` labels from
    * [[connectedComponents]], keep one canonical survivor per near-dup
    * cluster (the min-id member IS its component label) plus every
    * unclustered doc. One anti-join — the deduped corpus ships without
    * materializing clusters anywhere. */
  /** Sign-LSH near-dup COMPONENTS over embeddings with an EXACT-duplicate
    * pre-collapse — the embedding-side analog of [[textComponents]]
    * (SemDeDup ordering: exact dedup before fuzzy): vectors group by
    * their exact float contents, banded sign-bit LSH + pointer-jumping CC
    * run over one REPRESENTATIVE per group (its min id), and labels
    * expand back over group members.
    *
    * Semantics-preserving with the same equal-or-better asymmetry as
    * [[textComponents]]: cosine depends only on the vector, so
    * exact-equal non-zero vectors have identical neighbors and pairwise
    * cosine 1 (>= any threshold); zero vectors pair with nothing (cosine
    * undefined) and are excluded from the group-clustering shortcut, like
    * the uncollapsed path leaves them unpaired. A band bucket holding
    * more than `maxBucket` exact copies is dropped (its pairs lost) in
    * the uncollapsed path but survives as one row after collapse —
    * equal-or-better recall, never worse.
    *
    * The 100 TB lever, MEASURED at 100x: on the copies=100 corpus the
    * uncollapsed `dedup_semantic` path ran 4.7x its sf1 wall while the
    * pre-collapsed text family stayed ~1.1-1.7x — identical embeddings
    * re-bucket every copy; collapsing first makes LSH shuffle volume
    * track UNIQUE vectors. */
  def embeddingComponents(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double = 0.95,
      bits: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 200): DataFrame = {
    val keyed = df
      .select(
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("_v"),
        exists(col(vecCol), x => x =!= 0.0f).as("_nonzero"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // group BY the vector itself (Spark normalizes -0.0/NaN in grouping
    // keys, so equality is value-exact and deterministic)
    val groups = keyed.groupBy("_v")
      .agg(min("vec_id").as("_rep"), count(lit(1)).as("_gsize"))
    val members = keyed.join(groups, "_v")
    val reps = df.join(
      members.filter(col("vec_id") === col("_rep"))
        .select(col("vec_id").as(idCol)),
      Seq(idCol), "left_semi")
    val pairs = embeddingNearDup(reps, idCol, vecCol,
        cosineThreshold, bits, bands, maxBucket)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val repComps = connectedComponents(pairs, "a", "b")
      .select(col("doc_id").as("_rep"), col("component"))
    // expansion mirrors textComponents: members inherit the rep's
    // component; an exact-dup group with no fuzzy neighbors is its own
    // cluster labeled by its rep (= min id); zero vectors and unpaired
    // singletons emit no row. persist(DISK_ONLY) + eager count keeps the
    // lineage recomputable on executor loss (see textComponents).
    val out = members.filter(col("_nonzero"))
      .join(repComps, Seq("_rep"), "left")
      .filter(col("component").isNotNull || col("_gsize") > 1)
      .select(col("vec_id").as("doc_id"),
        coalesce(col("component"), col("_rep")).as("component"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    out.count()
    keyed.unpersist()
    out
  }

  def resolveDuplicates(df: DataFrame, idCol: String, components: DataFrame): DataFrame =
    df.join(
      components.filter(col("doc_id") =!= col("component"))
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Prefix-duplicate detection: pairs where one document's (trimmed)
    * text is a strict character prefix of another's — the truncated
    * re-crawl / cut-off-fetch shape MinHash misses when the truncation is
    * aggressive (jaccard of a half-doc vs its full text is ~0.5, well
    * under near-dup thresholds).
    *
    * Bucketing: documents sharing their first `keyChars` characters land
    * in one md5-keyed bucket — any prefix pair (both sides >= keyChars
    * long; shorter docs are skipped, the standard minimum-length floor)
    * agrees on that opening, so pairs generate only within buckets.
    * Oversized buckets (boilerplate openings) are capped like every
    * other pair generator here. Verification is one `startsWith`.
    * Output: (prefix_id, full_id). */
  def prefixDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keyChars: Int = 16,
      maxBucket: Int = 256): DataFrame = {
    val base = df.select(
      col(idCol).cast(LongType).as("doc_id"),
      trim(col(textCol)).as("t"))
      .filter(length(col("t")) >= keyChars)
      .select(col("doc_id"), col("t"), length(col("t")).as("len"),
        md5(substring(col("t"), 1, keyChars)).as("key"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("doc_id"))
    val capped = base.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxBucket).drop("_rn")
    val a = capped.select(col("key"), col("doc_id").as("prefix_id"),
      col("t").as("ta"), col("len").as("la"))
    val b = capped.select(col("key"), col("doc_id").as("full_id"),
      col("t").as("tb"), col("len").as("lb"))
    a.join(b, Seq("key"))
      .filter(col("la") < col("lb") ||
        (col("la") === col("lb") && col("prefix_id") < col("full_id")))
      .filter(col("tb").startsWith(col("ta")))
      .select(col("prefix_id"), col("full_id"))
  }

  /** Containment-duplicate pairs: C(A,B) = |S(a)∩S(b)| / min(|S(a)|,
    * |S(b)|) over word-shingle sets — the asymmetric-size duplication
    * Jaccard misses (a document EMBEDDED in a longer one scores jaccard
    * ≈ |small|/|large| but containment ≈ 1; [[prefixDups]] catches only
    * the strict-prefix special case). The standard near-dup companion
    * for quote-heavy / aggregated / re-crawled web corpora.
    *
    * Scale design: candidates come from a shingle inverted index — only
    * docs SHARING a shingle ever pair, never all-pairs. Two caps bound
    * the fan-out: shingles occurring in more than `maxDf` documents are
    * dropped from the index (boilerplate grams pair everything with
    * everything while carrying no identity — dropping them is the
    * df-cut every inverted index at scale applies; a contained pair
    * shares its CONTENT grams, which are low-df), and surviving buckets
    * generate at most |bucket|² bounded pairs from sorted id arrays.
    * Unlike the winnow/band generators (whose keys are selective by
    * construction), raw word shingles are ZIPFIAN — "of the" appears in
    * essentially every document — so the df cut runs as a partial-
    * aggregated COUNT + semi-join BEFORE any id list materializes:
    * no aggregation buffer ever holds a stopword shingle's posting
    * list. Only (hash, id) rows shuffle; shingle arrays join back once
    * for the EXACT intersection verify on candidates. `minShingles`
    * floors trivially-small documents whose containment is noise. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 2,
      threshold: Double = 0.8,
      maxDf: Int = 64,
      minShingles: Int = 4): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val sets = df.select(
      col(idCol).cast(LongType).as("id"),
      text.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) >= minShingles)
    val inv = sets.select(col("id"), explode(col("sh")).as("h"))
    // df gate first (partial-aggregated count, narrow rows), so the
    // posting-list collect below is bounded by maxDf per key even when
    // a shingle occurs in every document of a 100 TB corpus
    val keep = inv.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2L, maxDf.toLong))
      .select(col("h"))
    val candidates = inv
      .join(keep, Seq("h"), "left_semi")
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a"), col("p.b"))
      .distinct()
    candidates
      .join(sets.select(col("id").as("a"), col("sh").as("sa")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("sb")), "b")
      .select(
        col("a"), col("b"),
        size(col("sa")).cast(LongType).as("size_a"),
        size(col("sb")).cast(LongType).as("size_b"),
        size(array_intersect(col("sa"), col("sb"))).cast(LongType)
          .as("shared"))
      .withColumn("containment",
        col("shared").cast(DoubleType) / least(col("size_a"), col("size_b")))
      .filter(col("containment") >= threshold)
  }

  /** Content-defined chunking (CDC) duplicate report: split every document
    * at content-determined token boundaries (a token is a cut point when
    * its hash falls in a fixed fraction of the hash space), hash each
    * chunk, and report chunks appearing in >= 2 distinct documents.
    *
    * Why CDC instead of fixed-width chunks: an insertion or deletion
    * shifts every fixed-width boundary after it, so near-identical
    * documents share almost no fixed chunks — content-defined boundaries
    * RE-SYNCHRONIZE one cut point after the edit, so all the unchanged
    * material downstream still dedups (the rsync/backup-dedup trick,
    * applied to corpus text). Complements `duplicatedSpans` (which finds
    * fixed-k gram overlap): CDC chunks are variable-length and directly
    * reusable as storage/transfer dedup units.
    *
    * Boundary rule: first hex digit of md5(token) < boundaryHexLt — with
    * the default "2" that is 2/16 = 1/8 of tokens, so chunks average ~8
    * tokens. md5 hex compares are engine-portable (same lowercase hex in
    * Spark and DuckDB) — the same convention as every sampler here.
    *
    * Scale design: tokenization and boundary flags are map-only; the
    * chunk id is a per-document running sum (window partitioned by doc —
    * bounded by document length, never global); chunk assembly shuffles
    * each doc's tokens once keyed by doc id; the final rollup shuffles
    * only (chunk_hash, count) pairs with map-side partial aggregation.
    * Nothing global, nothing driver-side. */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      boundaryHexLt: String = "2"): DataFrame =
    // chunk id = number of boundary tokens STRICTLY BEFORE each token: a
    // boundary token CLOSES its chunk (the cut falls after it, so the
    // boundary token is the last member — the rsync convention); see
    // [[chunksOf]] for the shared chunking front
    chunksOf(df, idCol, textCol, boundaryHexLt)
      .groupBy("chunk_hash", "n_tokens")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_docs") >= 2)

  /** CDC chunk INDEX: one row per distinct chunk of the corpus —
    * (chunk_hash, n_tokens, first_doc, n_copies) — the persistable state
    * of content-defined-chunking dedup. Stored as a graft table, it lets
    * a new crawl flag against history in O(batch) ([[cdcIncrementalFlags]])
    * instead of re-chunking the corpus. */
  def cdcChunkIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      boundaryHexLt: String = "2"): DataFrame =
    chunksOf(df, idCol, textCol, boundaryHexLt)
      .groupBy(col("chunk_hash"), col("n_tokens"))
      .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n_copies"))

  /** Incremental CDC dedup: chunk the NEW batch (map-only + per-doc
    * windows) and flag each chunk against the persisted index with one
    * hash-keyed join — history is never re-chunked, shuffles carry batch
    * rows only. Output per batch doc: chunk counts, how many chunks (and
    * how much token mass) history already holds, and `mostly_known`
    * (known mass >= half) — the gate that drops a re-crawl whose content
    * shifted but did not change. */
  def cdcIncrementalFlags(
      batch: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      boundaryHexLt: String = "2"): DataFrame = {
    val bc = chunksOf(batch, idCol, textCol, boundaryHexLt)
    val known = index.select(col("chunk_hash"), lit(true).as("_known"))
    bc.join(known, Seq("chunk_hash"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        coalesce(sum(when(col("_known"), 1L).otherwise(0L)), lit(0L))
          .as("known_chunks"),
        coalesce(sum(when(col("_known"), col("n_tokens")).otherwise(0L)),
          lit(0L)).as("known_tokens"))
      .withColumn("mostly_known",
        col("known_tokens") * 2 >= col("n_tokens"))
  }

  /** shared CDC chunking: one row per (doc, chunk) with the ordered
    * chunk string's md5 and token count — the common front of the
    * report/cut/index/incremental family */
  private def chunksOf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      boundaryHexLt: String): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        x => length(x) > 0)).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk",
        coalesce(sum(when(substring(md5(col("tok")), 1, 1) < lit(boundaryHexLt),
          lit(1L)).otherwise(lit(0L))).over(w), lit(0L)))
      .groupBy("doc_id", "chunk")
      .agg(
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")))).as("chunk_hash"),
        count(lit(1)).as("n_tokens"))
  }

  /** The ACT step of CDC dedup: every duplicated chunk keeps only its
    * canonical first occurrence (lowest doc_id, then lowest chunk index)
    * and is cut everywhere else; documents are reassembled from their
    * surviving chunks in order. Same boundary rule as [[cdcChunks]].
    * NOTE: the cut removes within-doc repeats too, which the cross-doc
    * report ([[cdcChunks]], n_docs >= 2) deliberately omits — cut mass
    * therefore DOMINATES report mass (PropertySpec pins the exact
    * all-duplicates accounting on random docs).
    *
    * Scale design: the canonical-occurrence choice is a per-chunk-hash
    * window bounded by the copy count of that chunk (never global); the
    * reassembly is a per-doc aggregate. Chunk strings shuffle twice
    * (by hash to rank occurrences, by doc to reassemble) — at 100 TB
    * trade the second into a token-id re-join if chunk payloads dominate.
    *
    * Output: (doc_id, n_tokens, kept_tokens, cleaned_text) — the same
    * shape as `removeDuplicatedSpans`' query, so downstream gates swap
    * freely between span-cut and chunk-cut curation. */
  def cdcChunkCut(
      df: DataFrame,
      idCol: String,
      textCol: String,
      boundaryHexLt: String = "2"): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        x => length(x) > 0)).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withChunk = toks.withColumn("chunk",
      coalesce(sum(when(substring(md5(col("tok")), 1, 1) < lit(boundaryHexLt),
        lit(1L)).otherwise(lit(0L))).over(w), lit(0L)))
    val chunks = withChunk.groupBy("doc_id", "chunk")
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("chunk_str"),
        count(lit(1)).as("n_tokens"))
    val ranked = chunks.withColumn("occ", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("chunk_str")))
        .orderBy(col("doc_id"), col("chunk"))))
    ranked.groupBy("doc_id")
      .agg(
        sum(col("n_tokens")).as("n_tokens"),
        coalesce(sum(when(col("occ") === 1, col("n_tokens"))), lit(0L))
          .as("kept_tokens"),
        coalesce(concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("occ") === 1,
              struct(col("chunk"), col("chunk_str"))))),
            x => x.getField("chunk_str"))), lit(""))
          .as("cleaned_text"))
  }
}
