package graft.tables

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for [[TableWrite.encodeBoundValue]] truncation — the
  * binary branch has no end-to-end harvest (neither parquet-mr nor the
  * Avro inline accumulator bounds binary columns), so it is proven here. */
class BoundEncodingSpec extends AnyFunSuite {

  private val bin = IcePrim("binary")
  private val str = IcePrim("string")

  test("binary lower bound truncates to the prefix") {
    val b = Array[Byte](1, 2, 3, 4, 5, 6)
    assert(TableWrite.encodeBoundValue(bin, b, isUpper = false, Some(4)).get
      .toSeq === Seq[Byte](1, 2, 3, 4))
  }

  test("binary upper bound rounds up by bumping the last byte") {
    val b = Array[Byte](1, 2, 3, 4, 5, 6)
    assert(TableWrite.encodeBoundValue(bin, b, isUpper = true, Some(4)).get
      .toSeq === Seq[Byte](1, 2, 3, 5))
  }

  test("binary upper bound walks back over 0xFF bytes") {
    val b = Array[Byte](1, 2, -1, -1, 9)
    // prefix (1,2,0xFF,0xFF): last two bytes unbumpable -> (1,3)
    assert(TableWrite.encodeBoundValue(bin, b, isUpper = true, Some(4)).get
      .toSeq === Seq[Byte](1, 3))
  }

  test("all-0xFF binary prefix has no sound upper bound") {
    val b = Array[Byte](-1, -1, -1, -1, 0)
    assert(TableWrite.encodeBoundValue(bin, b, isUpper = true, Some(4)).isEmpty)
  }

  test("short binary passes through untruncated") {
    val b = Array[Byte](7, 8)
    assert(TableWrite.encodeBoundValue(bin, b, isUpper = true, Some(4)).get
      .toSeq === Seq[Byte](7, 8))
  }

  test("full mode (trunc=None) keeps long strings whole") {
    val s = "x" * 40
    val enc = TableWrite.encodeBoundValue(str, s, isUpper = true, None).get
    assert(new String(enc, "UTF-8") === s)
  }

  test("string truncation at a custom length respects code points") {
    // 𝄞 (U+1D11E) is one code point, two chars: truncate(2) keeps 2 CPs
    val s = "𝄞z-tail-beyond"
    val lo = TableWrite.encodeBoundValue(str, s, isUpper = false, Some(2)).get
    assert(new String(lo, "UTF-8") === "𝄞z")
    val hi = TableWrite.encodeBoundValue(str, s, isUpper = true, Some(2)).get
    assert(new String(hi, "UTF-8") === "𝄞{") // 'z'+1
  }
}
