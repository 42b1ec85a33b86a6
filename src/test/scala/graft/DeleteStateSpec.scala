package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.DiskEqLookup

/** Unit coverage for the disk-backed equality-delete store: sorted-run
  * spill, k-way merge dedupe to max sequence, exact probes over
  * variable-length keys. The e2e CatalogSpec test covers the scan wiring;
  * this forces the paths a single small delete set cannot reach. */
class DeleteStateSpec extends AnyFunSuite {

  private val proj = UnsafeProjection.create(Array(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, StringType, nullable = true)))

  private def keyBytes(k: Long, s: String): Array[Byte] = {
    val row = InternalRow(k, if (s == null) null else UTF8String.fromString(s))
    val b = proj(row).getBytes
    java.util.Arrays.copyOf(b, b.length)
  }

  private def probe(lookup: DiskEqLookup, k: Long, s: String): java.lang.Long = {
    val row = InternalRow(k, if (s == null) null else UTF8String.fromString(s))
    lookup.get(proj(row))
  }

  test("multi-run build dedupes to max sequence; probes are exact") {
    // 500 keys with variable-length string parts, each written TWICE with
    // different sequences across the stream; a 64-byte chunk forces a
    // spill roughly every record -> hundreds of runs through the merge.
    // a ~600-byte sparse budget forces repeated downsampling so nearly
    // every probe lands on the DISK tier; the default budget answers
    // everything from the in-memory sparse index — both must agree.
    def recs = (0L until 500L).flatMap { i =>
      Seq(
        (keyBytes(i, "k" * (1 + (i % 17)).toInt + i.toString), 10L + (i % 3)),
        (keyBytes(i, "k" * (1 + (i % 17)).toInt + i.toString), 20L + (i % 5)))
    }
    for (cap <- Seq(600L, DiskEqLookup.DefaultSparseBytes)) {
      val lookup = DiskEqLookup.build(recs.iterator, chunkBytes = 64, sparseBytes = cap)
      try {
        (0L until 500L).foreach { i =>
          val got = probe(lookup, i, "k" * (1 + (i % 17)).toInt + i.toString)
          assert(got === java.lang.Long.valueOf(20L + (i % 5)), s"key $i cap $cap")
        }
        // absent keys: wrong long part, wrong string part, null string
        assert(probe(lookup, 1000L, "k1") === null)
        assert(probe(lookup, 1L, "nope") === null)
        assert(probe(lookup, 1L, null) === null)
      } finally lookup.close()
    }
  }

  test("randomized: disk store agrees with a reference map at any chunk/budget") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val nKeys = 50 + rnd.nextInt(300)
      val ref = new scala.collection.mutable.HashMap[(Long, String), Long]()
      val recs = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
      (0 until nKeys).foreach { _ =>
        val k = rnd.nextLong() % 1000
        val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
        val dups = 1 + rnd.nextInt(3)
        (0 until dups).foreach { _ =>
          val seq = rnd.nextInt(1000).toLong
          recs += ((keyBytes(k, s), seq))
          ref((k, s)) = math.max(ref.getOrElse((k, s), Long.MinValue), seq)
        }
      }
      val chunk = 1L << rnd.nextInt(12) // 1 B .. 2 KiB runs
      val budget = 1L << (6 + rnd.nextInt(14)) // 64 B .. 512 KiB sparse
      val lookup = DiskEqLookup.build(recs.iterator, chunk, budget)
      try {
        ref.foreach { case ((k, s), seq) =>
          assert(probe(lookup, k, s) === java.lang.Long.valueOf(seq),
            s"trial $trial chunk $chunk budget $budget key ($k,$s)")
        }
        (0 until 50).foreach { _ =>
          val k = rnd.nextLong() % 1000
          val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
          if (!ref.contains((k, s)))
            assert(probe(lookup, k, s) === null, s"absent ($k,$s)")
        }
      } finally lookup.close()
    }
  }

  test("null key fields and empty stream behave") {
    val withNull = Seq((keyBytes(7L, null), 42L))
    val l1 = DiskEqLookup.build(withNull.iterator, chunkBytes = 1 << 20)
    try {
      assert(probe(l1, 7L, null) === java.lang.Long.valueOf(42L))
      assert(probe(l1, 7L, "") === null)
    } finally l1.close()
    val l2 = DiskEqLookup.build(Iterator.empty, chunkBytes = 1 << 20)
    try assert(probe(l2, 1L, "x") === null)
    finally l2.close()
  }
}
