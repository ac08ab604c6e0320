package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Ipv6Codec

/** Property tests for the IPv6 codec behind the dialect's
  * IPv6NumToString/IPv6StringToNum family: render∘parse and parse∘render
  * round-trip laws over the full 16-byte value space (zero-heavy arrays
  * included, so the `::` compression lanes are actually exercised), RFC
  * 5952 shape invariants on every rendered string, and an independent
  * java.net reference differential for the hex-only forms (InetAddress is
  * fine as a TEST oracle — the production kernel never touches it).
  */
object Ipv6CodecPropSpec extends Properties("Ipv6Codec") {

  // Zero-heavy groups: without this bias, a uniform 16-byte array almost
  // never contains a zero GROUP and the :: lanes go untested.
  private val genGroup: Gen[Int] =
    Gen.frequency(5 -> Gen.const(0), 1 -> Gen.const(0xffff),
      4 -> Gen.chooseNum(1, 0xfffe))

  private val genBytes: Gen[Array[Byte]] =
    Gen.listOfN(8, genGroup).map { gs =>
      val out = new Array[Byte](16)
      gs.zipWithIndex.foreach { case (g, i) =>
        out(2 * i) = (g >>> 8).toByte; out(2 * i + 1) = g.toByte
      }
      out
    }

  property("parse(render(b)) is the identity on 16-byte values") =
    forAll(genBytes) { b =>
      val s = Ipv6Codec.render(b)
      java.util.Arrays.equals(Ipv6Codec.parse(s, acceptIpv4 = true), b) &&
        java.util.Arrays.equals(Ipv6Codec.parse(s, acceptIpv4 = false), b)
    }

  property("rendered form is RFC 5952-shaped: lowercase, no leading zeros, at most one ::") =
    forAll(genBytes) { b =>
      val s = Ipv6Codec.render(b)
      val hexOk = s.forall(c => "0123456789abcdef:.".contains(c))
      val oneDouble = s.sliding(2).count(_ == "::") <= 1
      // no group with a leading zero (the dotted tail has no hex groups)
      val groups = s.replace("::", ":").split("[:.]").filter(_.nonEmpty)
      val noPad = s.contains('.') ||
        groups.forall(g => g == "0" || !g.startsWith("0"))
      hexOk && oneDouble && noPad
    }

  property("render agrees with java.net on non-mapped values (as 16 bytes back)") =
    forAll(genBytes) { b =>
      // The reference: java.net parses our render; its byte view must be b.
      // (We do NOT compare strings — java.net's renderer is not RFC 5952.)
      val addr = java.net.InetAddress.getByName(
        "[" + Ipv6Codec.render(b) + "]")
      java.util.Arrays.equals(addr.getAddress match {
        case a if a.length == 4 =>
          // java.net collapses ::ffff:a.b.c.d to an Inet4Address — rebuild
          val out = new Array[Byte](16)
          out(10) = 0xff.toByte; out(11) = 0xff.toByte
          System.arraycopy(a, 0, out, 12, 4)
          out
        case a => a
      }, b)
    }

  private val genPadded: Gen[String] = Gen.listOfN(8, genGroup).map(gs =>
    gs.map(g => f"$g%04X").mkString(":")) // fully padded, uppercase

  property("reader accepts padded uppercase forms; render canonicalizes idempotently") =
    forAll(genPadded) { s =>
      val b = Ipv6Codec.parse(s, acceptIpv4 = false)
      b != null && {
        val canon = Ipv6Codec.render(b)
        Ipv6Codec.render(Ipv6Codec.parse(canon, acceptIpv4 = false)) == canon
      }
    }

  private val genV4: Gen[String] = Gen.listOfN(4, Gen.chooseNum(0, 255))
    .map(_.mkString("."))

  property("plain IPv4 maps to ::ffff:a.b.c.d for conversions, rejects for isIPv6String") =
    forAll(genV4) { v4 =>
      val b = Ipv6Codec.parse(v4, acceptIpv4 = true)
      b != null && Ipv6Codec.render(b) == "::ffff:" + v4 &&
        Ipv6Codec.parse(v4, acceptIpv4 = false) == null
    }

  private val genInvalid: Gen[String] = Gen.oneOf(
    Gen.const(":::"), Gen.const("1::2::3"), Gen.const("1:2:3:4:5:6:7"),
    Gen.const("1:2:3:4:5:6:7:8:9"), Gen.const("1:2:3:4:5:6:7::8"),
    Gen.const("12345::"), Gen.const("g::1"), Gen.const(" ::1"),
    Gen.const("::1 "), Gen.const("fe80::1%eth0"), Gen.const("1.2.3.4.5"),
    Gen.const("256.1.2.3"), Gen.const("1:2:3:4:5:1.2.3.4::"),
    Gen.const("::1.2.3.4:5"), Gen.const(""), Gen.const(":"),
    Gen.const("1:"), Gen.const(":1"), Gen.const("1:2:3:4:5:6:7:"))

  property("the invalid corpus parses to null under both modes") =
    forAll(genInvalid) { s =>
      Ipv6Codec.parse(s, acceptIpv4 = true) == null &&
        Ipv6Codec.parse(s, acceptIpv4 = false) == null
    }

  private def unsignedLe(a: Array[Byte], b: Array[Byte]): Boolean =
    java.util.Arrays.compareUnsigned(a, b) <= 0

  property("cidrBound: lo <= addr <= hi bytewise, bounds share the prefix, block width = 2^(128-p)") =
    forAll(genBytes, Gen.chooseNum(0, 128)) { (b, p) =>
      val lo = Ipv6Codec.cidrBound(b, p, high = false)
      val hi = Ipv6Codec.cidrBound(b, p, high = true)
      val prefixShared = (0 until 16).forall { i =>
        val bits = math.max(0, math.min(8, p - i * 8))
        val mask = (0xff << (8 - bits)) & 0xff
        (lo(i) & mask) == (b(i) & mask) && (hi(i) & mask) == (b(i) & mask) &&
          (lo(i) & ~mask & 0xff) == 0 && (hi(i) & ~mask & 0xff) == (~mask & 0xff)
      }
      unsignedLe(lo, b) && unsignedLe(b, hi) && prefixShared &&
        java.util.Arrays.equals(Ipv6Codec.cidrBound(lo, p, high = true), hi)
    }
}
