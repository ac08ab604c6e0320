package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.DeflateLen
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the DEFLATE-length kernel behind `text_compress_ratio`:
  * the Expression's eval must agree with an independent java.util.zip run at
  * the pinned level for arbitrary strings (multi-byte UTF-8 included), the
  * length must be positive for non-empty input, and repetition must never
  * compress WORSE than the concatenation bound allows.
  */
object DeflateLenPropSpec extends Properties("DeflateLen") {

  private def reference(s: String): Long = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  private def kernel(s: String): Long =
    DeflateLen(null).nullSafeEval(UTF8String.fromString(s)).asInstanceOf[Long]

  private val genText = Gen.chooseNum(0, 600).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('é', '中', '!', '\n'))).map(_.mkString))

  property("eval equals an independent java.util.zip deflate") =
    forAll(genText) { s => kernel(s) == reference(s) }

  property("compressed length is positive and bounded by deflate overhead") =
    forAll(genText) { s =>
      val n = kernel(s)
      // zlib wrapper ≥ 8 bytes; stored-block worst case ≤ input + 5 per 64k + 11.
      n >= 8 && n <= s.getBytes("UTF-8").length + 16
    }

  property("10x self-repetition compresses to less than 2x the single copy") =
    forAll(genText.suchThat(_.length >= 20)) { s =>
      kernel(s * 10) < 2 * kernel(s) + 32
    }
}
