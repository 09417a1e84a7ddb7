package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-13 VRL stdlib tranche (vrl stdlib docs; the reference embeds
  * the full VRL runtime via processor/vrl.rs): size-string parsing,
  * number formatting, repeated regex capture, the Community ID flow
  * hash, binary/subnet IP helpers, MIME encoded-words, and UUIDv7.
  * All codegen kernels or thin JDK wrappers — no interpreted UDFs. */

/** `parse_bytes(value, unit[, base])` — "8.5MiB" → bytes (or any target
  * unit). Binary suffixes (KiB…EiB) are 1024-based; decimal (kB…EB)
  * 1000-based unless `base: "2"` forces 1024 (VRL's option for logs
  * that write MB meaning MiB). Unknown units / garbage throw (fallible). */
case class VrlParseBytes(child: Expression, unit: String, base: String)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    VrlParseBytes.parse(v.asInstanceOf[UTF8String], unit, base)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("unit", unit, "java.lang.String")
    val b = ctx.addReferenceObj("base", base, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseBytes.parse($v, $u, $b);")
  }
  override protected def withNewChildInternal(newChild: Expression): VrlParseBytes =
    copy(child = newChild)
}

object VrlParseBytes {
  private val Pat = java.util.regex.Pattern.compile(
    "^\\s*([0-9]*\\.?[0-9]+)\\s*([A-Za-z]+)\\s*$")
  /** factor in bytes for a unit suffix under the given base policy */
  def factor(unitRaw: String, base: String): Double = {
    val u = unitRaw.toLowerCase(java.util.Locale.ROOT)
    if (u == "b") return 1.0
    val (prefix, binary) =
      if (u.endsWith("ib")) (u.dropRight(2), true)
      else if (u.endsWith("b")) (u.dropRight(1), base == "2")
      else throw new IllegalArgumentException(s"parse_bytes: unknown unit `$unitRaw`")
    val exp = "kmgtpe".indexOf(prefix) match {
      case -1 => throw new IllegalArgumentException(
        s"parse_bytes: unknown unit `$unitRaw`")
      case i if prefix.length == 1 => i + 1
      case _ => throw new IllegalArgumentException(
        s"parse_bytes: unknown unit `$unitRaw`")
    }
    math.pow(if (binary) 1024d else 1000d, exp.toDouble)
  }
  def parse(v: UTF8String, targetUnit: String, base: String): Double = {
    val m = Pat.matcher(v.toString)
    if (!m.matches())
      throw new IllegalArgumentException(
        s"parse_bytes: `${v.toString}` is not a <number><unit> size")
    m.group(1).toDouble * factor(m.group(2), base) / factor(targetUnit, base)
  }
}

/** `format_number(value, scale[, decimal_separator[, grouping_separator]])`
  * — fixed-scale, thousand-grouped rendering (VRL defaults: "." / ","). */
case class VrlFormatNumber(child: Expression, scale: Int,
    decSep: String, groupSep: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    VrlFormatNumber.format(v.asInstanceOf[Double], scale, decSep, groupSep)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("dec", decSep, "java.lang.String")
    val g = ctx.addReferenceObj("grp", groupSep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlFormatNumber.format($v, $scale, $d, $g);")
  }
  override protected def withNewChildInternal(newChild: Expression): VrlFormatNumber =
    copy(child = newChild)
}

object VrlFormatNumber {
  def format(v: Double, scale: Int, decSep: String, groupSep: String): UTF8String = {
    val bd = java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    val plain = bd.toPlainString
    val (intPartSigned, frac) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i => (plain.substring(0, i), plain.substring(i + 1))
    }
    val neg = intPartSigned.startsWith("-")
    val intPart = if (neg) intPartSigned.substring(1) else intPartSigned
    val grouped = intPart.reverse.grouped(3).toSeq.map(_.reverse).reverse
      .mkString(groupSep)
    val sb = new StringBuilder
    if (neg) sb += '-'
    sb ++= grouped
    if (frac.nonEmpty) { sb ++= decSep; sb ++= frac }
    UTF8String.fromString(sb.toString)
  }
}

/** `parse_regex_all(value, r'…')` — EVERY match as a struct of the
  * pattern's named groups (parse_regex's repeated form). Pattern and
  * group names resolve at build; no match → empty array. */
case class VrlParseRegexAll(child: Expression, pattern: String,
    names: Seq[String]) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(names.map(n => StructField(n, StringType, nullable = true))),
    containsNull = false)
  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)
  override protected def nullSafeEval(v: Any): Any = {
    val m = compiled.matcher(v.toString)
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    while (m.find()) {
      out += InternalRow.fromSeq(names.map(n =>
        Option(m.group(n)).map(UTF8String.fromString).orNull))
    }
    new GenericArrayData(out.toArray[Any])
  }
  // matcher state is per-call; CodegenFallback keeps the kernel simple
  // (the surrounding projection still whole-stage-codegens around it)
  override protected def withNewChildInternal(newChild: Expression): VrlParseRegexAll =
    copy(child = newChild)
}

/** `community_id(saddr, daddr, sport, dport, proto[, seed])` — the
  * Corelight Community ID v1 flow hash (public spec: seed ++ ordered
  * endpoint tuple ++ proto ++ pad ++ ordered ports, SHA-1, base64,
  * "1:" prefix). Direction-invariant by construction — both directions
  * of a flow hash identically, which is the point. IPv4 + IPv6. */
case class VrlCommunityId(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    VrlCommunityId.compute(
      vs(0).asInstanceOf[UTF8String].toString,
      vs(1).asInstanceOf[UTF8String].toString,
      vs(2).asInstanceOf[Number].intValue(),
      vs(3).asInstanceOf[Number].intValue(),
      vs(4).asInstanceOf[Number].intValue(),
      if (vs.size > 5) vs(5).asInstanceOf[Number].intValue() else 0)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): VrlCommunityId = copy(children = c)
}

object VrlCommunityId {
  private def addr(s: String): Array[Byte] = {
    require(s.matches("[0-9A-Fa-f:.]+"),
      s"community_id: `$s` is not an IP literal") // never a DNS lookup
    java.net.InetAddress.getByName(s).getAddress
  }
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
  def compute(saddr: String, daddr: String, sport: Int, dport: Int,
      proto: Int, seed: Int): UTF8String = {
    var (sa, da, sp, dp) = (addr(saddr), addr(daddr), sport, dport)
    val order = cmp(sa, da)
    if (order > 0 || (order == 0 && sp > dp)) {
      val (ta, tp) = (sa, sp); sa = da; sp = dp; da = ta; dp = tp
    }
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(Array[Byte]((seed >> 8).toByte, seed.toByte))
    md.update(sa); md.update(da)
    md.update(Array[Byte](proto.toByte, 0.toByte))
    md.update(Array[Byte]((sp >> 8).toByte, sp.toByte))
    md.update(Array[Byte]((dp >> 8).toByte, dp.toByte))
    UTF8String.fromString(
      "1:" + java.util.Base64.getEncoder.encodeToString(md.digest()))
  }
}

/** IP helpers: `ip_pton` (string → network-order bytes), `ip_ntop`
  * (inverse), `ip_subnet(ip, mask)` (network address under a dotted
  * mask or /prefix), `ip_to_ipv6` (v4 → ::ffff: mapped form). Literal
  * inputs only — a hostname is rejected, never resolved. */
object VrlIpKernels {
  private def literal(s: String): java.net.InetAddress = {
    require(s.matches("[0-9A-Fa-f:.]+"),
      s"ip function: `$s` is not an IP literal")
    java.net.InetAddress.getByName(s)
  }
  def pton(v: UTF8String): Array[Byte] = literal(v.toString).getAddress
  def ntop(b: Array[Byte]): UTF8String = {
    require(b.length == 4 || b.length == 16,
      s"ip_ntop: need 4 or 16 bytes, got ${b.length}")
    UTF8String.fromString(java.net.InetAddress.getByAddress(b).getHostAddress)
  }
  def subnet(ip: UTF8String, mask: UTF8String): UTF8String = {
    val a = literal(ip.toString).getAddress
    val m = mask.toString.trim
    val bits =
      if (m.startsWith("/")) m.substring(1).toInt
      else {
        val mb = literal(m).getAddress
        require(mb.length == a.length, "ip_subnet: mask family mismatch")
        mb.map(b => Integer.bitCount(b & 0xff)).sum
      }
    require(bits >= 0 && bits <= a.length * 8,
      s"ip_subnet: prefix /$bits out of range")
    val out = a.clone()
    var i = 0
    while (i < out.length) {
      val keep = math.max(0, math.min(8, bits - i * 8))
      out(i) = (out(i) & (0xff << (8 - keep)).toByte).toByte
      i += 1
    }
    UTF8String.fromString(java.net.InetAddress.getByAddress(out).getHostAddress)
  }
  def toV6(v: UTF8String): UTF8String = {
    val a = literal(v.toString)
    a match {
      case v4: java.net.Inet4Address =>
        UTF8String.fromString("::ffff:" + v4.getHostAddress)
      case _ => UTF8String.fromString(a.getHostAddress)
    }
  }
}

case class VrlIpKernel1(child: Expression, method: String)
    extends UnaryExpression {
  override def dataType: DataType = method match {
    case "pton" => BinaryType
    case _ => StringType
  }
  override protected def nullSafeEval(v: Any): Any = method match {
    case "pton" => VrlIpKernels.pton(v.asInstanceOf[UTF8String])
    case "ntop" => VrlIpKernels.ntop(v.asInstanceOf[Array[Byte]])
    case "to_v6" => VrlIpKernels.toV6(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = method match {
      case "pton" => "pton"
      case "ntop" => "ntop"
      case "to_v6" => "toV6"
    }
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlIpKernels.$call($v);")
  }
  override protected def withNewChildInternal(newChild: Expression): VrlIpKernel1 =
    copy(child = newChild)
}

case class VrlIpSubnet(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(ip: Any, mask: Any): Any =
    VrlIpKernels.subnet(ip.asInstanceOf[UTF8String], mask.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VrlIpKernels.subnet($a, $b);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VrlIpSubnet = copy(left = l, right = r)
}

/** `decode_mime_q(value)` — RFC 2047 encoded-words (`=?utf-8?Q?…?=` /
  * `?B?`): Q-encoding (underscore = space, =XX hex) and B (base64),
  * any charset the JDK knows; non-encoded spans pass through. */
case class VrlDecodeMimeQ(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    VrlDecodeMimeQ.decode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlDecodeMimeQ.decode($v);")
  override protected def withNewChildInternal(newChild: Expression): VrlDecodeMimeQ =
    copy(child = newChild)
}

object VrlDecodeMimeQ {
  private val Word = java.util.regex.Pattern.compile(
    "=\\?([^?]+)\\?([QqBb])\\?([^?]*)\\?=")
  def decode(v: UTF8String): UTF8String = {
    val s = v.toString
    val m = Word.matcher(s)
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      sb ++= s.substring(last, m.start())
      val charset = java.nio.charset.Charset.forName(m.group(1))
      val payload = m.group(3)
      val bytes = m.group(2).toUpperCase match {
        case "B" => java.util.Base64.getDecoder.decode(payload)
        case _ =>
          val out = new java.io.ByteArrayOutputStream()
          var i = 0
          while (i < payload.length) {
            payload.charAt(i) match {
              case '_' => out.write(' '); i += 1
              case '=' if i + 3 <= payload.length =>
                out.write(Integer.parseInt(payload.substring(i + 1, i + 3), 16))
                i += 3
              case c => out.write(c.toInt); i += 1
            }
          }
          out.toByteArray
      }
      sb ++= new String(bytes, charset)
      last = m.end()
    }
    sb ++= s.substring(last)
    UTF8String.fromString(sb.toString)
  }
}

/** `uuid_v7()` — time-ordered UUID (RFC 9562 layout: 48-bit unix ms,
  * version 7, 74 random bits). Nondeterministic like Spark's own
  * `uuid()`; per-partition RNG seeded from SecureRandom. */
case class VrlUuidV7() extends LeafExpression
    with Nondeterministic with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  @transient private var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.security.SecureRandom()
  override protected def evalInternal(input: InternalRow): Any = {
    val ms = System.currentTimeMillis()
    val hi = ((ms & 0xffffffffffffL) << 16) | 0x7000L | rng.nextInt(1 << 12).toLong
    val lo = (rng.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
    UTF8String.fromString(new java.util.UUID(hi, lo).toString)
  }
}
