package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's IPv6 value codec — the FixedString(16) semantics behind
  * ClickHouse's `IPv6StringToNum` / `IPv6NumToString` / `toIPv6` family,
  * carried as a 16-byte BINARY column (network byte order, exactly the
  * bytes ClickHouse stores), with the parse and the RFC 5952 render
  * hand-rolled as codegen'd kernels — no `InetAddress` detour, so the
  * expressions stay inside whole-stage codegen and never touch the JDK's
  * resolver machinery.
  *
  * Contract, stated (the parts ClickHouse documents plus the pinned
  * boundaries where its docs are silent):
  *
  *   - PARSE ([[Ipv6Codec.parse]]): accepts the full 8-group hex form,
  *     `::` compression (at most one, expanding AT LEAST one zero group —
  *     `1:2:3:4:5:6:7::8` is invalid), groups of 1-4 hex digits in either
  *     case (ClickHouse: "HEX can be uppercase or lowercase"), an embedded
  *     dotted-quad tail occupying the final 32 bits
  *     (`x:x:x:x:x:x:d.d.d.d`, also after `::`), and — for the CONVERSION
  *     functions only, the documented ClickHouse behavior — a plain
  *     dotted-quad IPv4 address mapped to `::ffff:a.b.c.d`.
  *     `isIPv6String` uses the strict variant (`acceptIpv4 = false`):
  *     ClickHouse documents `isIPv6String('127.0.0.1') = 0`. Zone ids
  *     (`%eth0`), whitespace, stray colons, 5+-digit groups, and octets
  *     over 255 are invalid. Invalid → null (the *OrNull posture; the
  *     throwing forms wrap the null in a raise_error at the builder).
  *   - RENDER ([[Ipv6Codec.render]]): RFC 5952 — lowercase hex, no
  *     leading zeros, the LONGEST run of two-or-more zero groups
  *     compressed to `::` (leftmost on ties, §4.2.3), with ClickHouse's
  *     documented exception that IPv4-MAPPED addresses
  *     (`::ffff:a.b.c.d`) render in mixed dotted notation. Pinned
  *     boundary: IPv4-COMPATIBLE addresses (`::a.b.c.d`, deprecated by
  *     RFC 4291) render as pure hex groups (`::102:304`) — RFC 5952
  *     leaves mixed notation optional there and ClickHouse documents
  *     only the mapped case. A non-16-byte binary input is an ERROR
  *     (ClickHouse requires FixedString(16)), not a silent null.
  *
  * Round-trip law (prop-pinned in Ipv6CodecPropSpec): `parse(render(b))`
  * is the identity on all 16-byte arrays, and `render . parse` is
  * idempotent on valid strings.
  */
case class Ipv6Parse(child: Expression, acceptIpv4: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Ipv6Codec.parse(input.asInstanceOf[UTF8String].toString, acceptIpv4)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Ipv6Codec.parse($c.toString(), $acceptIpv4);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Ipv6Parse =
    copy(child = newChild)
}

/** RFC 5952 render of a 16-byte binary IPv6 value — see [[Ipv6Parse]] for
  * the full codec contract. Errors on a non-16-byte input.
  */
case class Ipv6Render(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Ipv6Codec.render(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.Ipv6Codec.render($c))")

  override protected def withNewChildInternal(newChild: Expression): Ipv6Render =
    copy(child = newChild)
}

/** One bound of `IPv6CIDRToRange(addr, prefix)` — the lowest (`high =
  * false`) or highest (`high = true`) 16-byte address in the /prefix
  * block containing `addr`: bits past the prefix cleared or set. Prefix
  * outside 0..128, or a non-16-byte address, is an ERROR (the
  * IPv4CIDRToRange posture).
  */
case class Ipv6CidrBound(addr: Expression, prefix: Expression, high: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = addr
  override def right: Expression = prefix
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, p: Any): Any =
    Ipv6Codec.cidrBound(a.asInstanceOf[Array[Byte]],
      p.asInstanceOf[Int], high)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, p) =>
      s"graft.functions.Ipv6Codec.cidrBound($a, $p, $high)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Ipv6CidrBound =
    copy(addr = newLeft, prefix = newRight)
}

/** `isIPAddressInRange(addr, cidr)` — CIDR containment for BOTH families
  * (ClickHouse documents the signature and the family-mixing zero:
  * `isIPAddressInRange('127.0.0.1', 'ffff::/16') = 0`). Stated contract
  * for the unpinned corners: a malformed or family-mismatched ADDRESS is
  * simply not in the range (false — the isIPv4String/isIPv6String
  * boolean-test posture; an IPv4-MAPPED string like `::ffff:1.2.3.4`
  * still matches a v6 network, since it IS a v6 address), while a
  * malformed CIDR (no '/', bad prefix bounds, unparseable network) is an
  * ERROR — the range is the query's own constant and deserves a loud
  * failure, never a silent all-false column.
  */
case class IpInRange(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def nullSafeEval(addr: Any, cidr: Any): Any =
    Ipv6Codec.ipInRange(addr.asInstanceOf[UTF8String].toString,
      cidr.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, c) =>
      s"graft.functions.Ipv6Codec.ipInRange($a.toString(), $c.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IpInRange =
    copy(left = newLeft, right = newRight)
}

object Ipv6Codec {

  /** See [[IpInRange]] for the stated contract. */
  def ipInRange(addr: String, cidr: String): Boolean = {
    val slash = cidr.lastIndexOf('/')
    if (slash <= 0 || slash == cidr.length - 1)
      throw new IllegalArgumentException(
        s"isIPAddressInRange: malformed CIDR '$cidr' — expected net/prefix")
    val netS = cidr.substring(0, slash)
    val p =
      try cidr.substring(slash + 1).toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"isIPAddressInRange: malformed CIDR prefix in '$cidr'")
      }
    if (netS.indexOf(':') >= 0) {
      val net = parse(netS, acceptIpv4 = false)
      if (net == null)
        throw new IllegalArgumentException(
          s"isIPAddressInRange: malformed IPv6 network in '$cidr'")
      if (p < 0 || p > 128)
        throw new IllegalArgumentException(
          "isIPAddressInRange: an IPv6 prefix must be in 0..128")
      // strict v6 parse: a plain dotted quad is a FAMILY MISMATCH (the
      // documented mixing zero), but ::ffff:a.b.c.d is a v6 address.
      val a = parse(addr, acceptIpv4 = false)
      a != null && java.util.Arrays.equals(
        cidrBound(a, p, high = false), cidrBound(net, p, high = false))
    } else {
      val net = parseIpv4(netS, 0, netS.length)
      if (net < 0)
        throw new IllegalArgumentException(
          s"isIPAddressInRange: malformed IPv4 network in '$cidr'")
      if (p < 0 || p > 32)
        throw new IllegalArgumentException(
          "isIPAddressInRange: an IPv4 prefix must be in 0..32")
      val a =
        if (addr.indexOf(':') >= 0) -1L // v6 address vs v4 net: mismatch
        else parseIpv4(addr, 0, addr.length)
      val mask = if (p == 0) 0L else (0xffffffffL << (32 - p)) & 0xffffffffL
      a >= 0 && (a & mask) == (net & mask)
    }
  }

  /** See [[Ipv6CidrBound]]: clear (low) or set (high) every bit past the
    * prefix, byte by byte.
    */
  def cidrBound(b: Array[Byte], p: Int, high: Boolean): Array[Byte] = {
    if (b == null) return null
    if (b.length != 16)
      throw new IllegalArgumentException(
        s"IPv6CIDRToRange: expected a 16-byte binary address, got ${b.length} bytes")
    if (p < 0 || p > 128)
      throw new IllegalArgumentException(
        "IPv6CIDRToRange: the prefix must be in 0..128")
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      val bits = math.max(0, math.min(8, p - i * 8))
      val mask = (0xff << (8 - bits)) & 0xff
      out(i) =
        if (high) ((b(i) & mask) | (~mask & 0xff)).toByte
        else (b(i) & mask).toByte
      i += 1
    }
    out
  }

  /** Dotted-quad parse shared by the plain-IPv4 and embedded-tail lanes:
    * four 1-3 digit decimal octets ≤ 255 (leading zeros accepted, matching
    * the engine's IPv4 reader), returned as an unsigned 32-bit value in a
    * Long; −1 when invalid.
    */
  def parseIpv4(s: String, from: Int, until: Int): Long = {
    var v = 0L
    var octet = -1L
    var digits = 0
    var nOctets = 0
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        octet = (if (octet < 0) 0L else octet) * 10 + (c - '0')
        digits += 1
        if (digits > 3 || octet > 255) return -1L
      } else if (c == '.') {
        if (octet < 0 || nOctets >= 3) return -1L
        v = (v << 8) | octet
        nOctets += 1
        octet = -1L
        digits = 0
      } else return -1L
      i += 1
    }
    if (octet < 0 || nOctets != 3) return -1L
    (v << 8) | octet
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** One side of the address (before or after the `::`): hex groups
    * separated by single colons, with an optional dotted-quad LAST group
    * when `v4Tail` (the embedded-IPv4 form — terminal only, so it is
    * never legal on the left of a `::`). Writes into `out` starting at
    * `at`; returns the number of bytes written, or −1 when invalid.
    * An empty side writes nothing (the `::`-at-an-edge case).
    */
  private def parseSide(s: String, out: Array[Byte], at: Int, v4Tail: Boolean): Int = {
    if (s.isEmpty) return 0
    var pos = at
    var i = 0
    val n = s.length
    while (i < n) {
      var j = i
      var dotted = false
      while (j < n && s.charAt(j) != ':') {
        if (s.charAt(j) == '.') dotted = true
        j += 1
      }
      if (dotted) {
        // dotted quad: must be the last group of the side AND tail-legal
        if (j != n || !v4Tail || pos + 4 > 16) return -1
        val v4 = parseIpv4(s, i, n)
        if (v4 < 0) return -1
        out(pos) = (v4 >>> 24).toByte; out(pos + 1) = (v4 >>> 16).toByte
        out(pos + 2) = (v4 >>> 8).toByte; out(pos + 3) = v4.toByte
        pos += 4
      } else {
        if (j == i || j - i > 4 || pos + 2 > 16) return -1 // empty or 5+ digits
        var g = 0
        var k = i
        while (k < j) {
          val h = hexVal(s.charAt(k))
          if (h < 0) return -1
          g = (g << 4) | h
          k += 1
        }
        out(pos) = (g >>> 8).toByte; out(pos + 1) = g.toByte
        pos += 2
      }
      i = j + 1 // skip the separating ':' (or step past the end)
      if (j < n && j == n - 1) return -1 // trailing single ':' on this side
    }
    pos - at
  }

  /** String → 16-byte binary, null when invalid. See [[Ipv6Parse]] for the
    * accepted grammar; `acceptIpv4` adds the plain dotted-quad →
    * `::ffff:a.b.c.d` mapping the conversion functions document.
    */
  def parse(s: String, acceptIpv4: Boolean): Array[Byte] = {
    if (s == null) return null
    val n = s.length
    if (n < 2 || n > 45) return null // "::" .. full mixed form
    if (s.indexOf(':') < 0) {
      if (!acceptIpv4) return null
      val v4 = parseIpv4(s, 0, n)
      if (v4 < 0) return null
      val out = new Array[Byte](16)
      out(10) = 0xff.toByte; out(11) = 0xff.toByte
      out(12) = (v4 >>> 24).toByte; out(13) = (v4 >>> 16).toByte
      out(14) = (v4 >>> 8).toByte; out(15) = v4.toByte
      return out
    }
    // locate the (at most one) '::'
    var dcol = -1
    var i = 0
    while (i + 1 < n) {
      if (s.charAt(i) == ':' && s.charAt(i + 1) == ':') {
        if (dcol >= 0) return null // a second '::'
        if (i + 2 < n && s.charAt(i + 2) == ':') return null // ':::'
        dcol = i
        i += 2
      } else i += 1
    }
    if (dcol < 0 && (s.charAt(0) == ':' || s.charAt(n - 1) == ':')) return null
    val left = if (dcol < 0) s else s.substring(0, dcol)
    val right = if (dcol < 0) "" else s.substring(dcol + 2)
    val out = new Array[Byte](16)
    // A dotted tail occupies the FINAL 32 bits: legal at the end of the
    // whole address only — i.e. on `left` when there is no '::', on
    // `right` otherwise ("1:2:3:4:5:6:1.2.3.4::" is invalid).
    val leftLen = parseSide(left, out, 0, v4Tail = dcol < 0)
    if (leftLen < 0) return null
    val rightBuf = new Array[Byte](16)
    val rightLen = parseSide(right, rightBuf, 0, v4Tail = true)
    if (rightLen < 0) return null
    if (dcol < 0) {
      if (leftLen + rightLen != 16) return null
    } else {
      // '::' must expand at least one zero group
      if (leftLen + rightLen > 14) return null
    }
    System.arraycopy(rightBuf, 0, out, 16 - rightLen, rightLen)
    out
  }

  /** 16-byte binary → RFC 5952 string (see [[Ipv6Render]]); errors on any
    * other length — ClickHouse's IPv6NumToString requires FixedString(16),
    * and a silent null here would let a schema mistake masquerade as data.
    */
  def render(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length != 16)
      throw new IllegalArgumentException(
        s"IPv6NumToString: expected a 16-byte binary value (the engine's " +
          s"IPv6 carrier), got ${b.length} bytes")
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) {
      g(i) = ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)
      i += 1
    }
    // IPv4-mapped: the documented ClickHouse mixed-notation exception.
    if (g(0) == 0 && g(1) == 0 && g(2) == 0 && g(3) == 0 && g(4) == 0 &&
        g(5) == 0xffff)
      return "::ffff:" + (b(12) & 0xff) + "." + (b(13) & 0xff) + "." +
        (b(14) & 0xff) + "." + (b(15) & 0xff)
    // longest zero-group run of length >= 2; strict > keeps the LEFTMOST
    // on ties (RFC 5952 §4.2.3)
    var bestStart = -1
    var bestLen = 1 // a single zero group is never compressed (§4.2.2)
    i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestLen = j - i; bestStart = i }
        i = j
      } else i += 1
    }
    val sb = new java.lang.StringBuilder(39)
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
    }
    sb.toString
  }
}
