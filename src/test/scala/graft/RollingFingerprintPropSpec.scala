package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.RollingFingerprint
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the rolling-hash kernel: the O(1) rolling update
  * (subtract the outgoing char's highest-power term, multiply, add the
  * incoming char — all in wrapping 64-bit arithmetic) must produce EXACTLY
  * the direct polynomial hash of every window, or anchors silently diverge
  * between documents sharing content. The reference below recomputes each
  * window from scratch.
  */
object RollingFingerprintPropSpec extends Properties("RollingFingerprint") {

  private val B = 0x100000001b3L

  private def directAnchors(s: String, window: Int, mask: Long): Seq[Long] = {
    if (s.length < window) return Seq.empty
    val seen = new scala.collection.mutable.LinkedHashSet[Long]
    for (i <- 0 to s.length - window) {
      var h = 0L
      var j = i
      while (j < i + window) { h = h * B + s.charAt(j); j += 1 }
      if ((h & mask) == 0L) seen.add(h)
    }
    seen.toSeq
  }

  private def kernelAnchors(s: String, window: Int, mask: Long): Seq[Long] =
    RollingFingerprint(null, window, mask)
      .nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq

  private val genText = Gen.chooseNum(0, 400).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      9 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('é', '中', '!', '\t')))
      .map(_.mkString))
  private val genWindow = Gen.chooseNum(2, 32)

  property("rolling update ≡ direct polynomial hash of every window") =
    forAll(genText, genWindow) { (s, w) =>
      // Permissive mask so anchors actually fire and any drift is visible.
      kernelAnchors(s, w, 0x3) == directAnchors(s, w, 0x3)
    }

  property("production mask agrees too (sparser anchors)") =
    forAll(genText) { s =>
      kernelAnchors(s, 16, 0x3f) == directAnchors(s, 16, 0x3f)
    }
}
