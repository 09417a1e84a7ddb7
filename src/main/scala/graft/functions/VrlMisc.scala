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
  /** `ipv6_to_ipv4` — v4 passes through; the JDK normalizes v4-mapped
    * v6 literals (::ffff:a.b.c.d) to Inet4Address, so any address that
    * still resolves v6 here is genuinely unconvertible → error (VRL's
    * fallible form). */
  def toV4(v: UTF8String): UTF8String = literal(v.toString) match {
    case v4: java.net.Inet4Address => UTF8String.fromString(v4.getHostAddress)
    case other => throw new IllegalArgumentException(
      s"ipv6_to_ipv4: `${v.toString}` is not an IPv4-mapped address")
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
    case "to_v4" => VrlIpKernels.toV4(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = method match {
      case "pton" => "pton"
      case "ntop" => "ntop"
      case "to_v6" => "toV6"
      case "to_v4" => "toV4"
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

/** `assert!(condition[, message])` / `assert_eq!(a, b[, message])` —
  * errors when the guard fails (VRL's fallible assert: the event fails
  * into error handling; `??` / `, err =` catch). True otherwise. */
case class VrlAssert(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(cond: Any, msg: Any): Any =
    if (cond.asInstanceOf[Boolean]) true
    else throw new IllegalArgumentException(msg.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, m) =>
      s"""if ($c) { ${ev.value} = true; }
         |else { throw new IllegalArgumentException($m.toString()); }""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VrlAssert = copy(left = l, right = r)
}

/** `get_env_var!(name)` — resolved at RUNTIME on the evaluating JVM
  * (fallible: missing variable throws, `??` catches). Boundary, stated:
  * in local mode driver and executors share one environment; on a
  * cluster the EXECUTOR's environment answers, which is also what the
  * reference's in-process runtime would see on that host. */
case class VrlEnvVar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    VrlEnvVar.get(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlEnvVar.get($v);")
  override protected def withNewChildInternal(newChild: Expression): VrlEnvVar =
    copy(child = newChild)
}
object VrlEnvVar {
  def get(name: UTF8String): UTF8String = {
    val v = System.getenv(name.toString)
    if (v == null) throw new IllegalArgumentException(
      s"get_env_var: `${name.toString}` is not set")
    UTF8String.fromString(v)
  }
}

/** `get_hostname!()` — the evaluating host's name (per-executor on a
  * cluster, exactly the host tag the reference's runtime would stamp). */
case class VrlHostname() extends LeafExpression with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = VrlHostname.get()
}
object VrlHostname {
  @transient private lazy val name: UTF8String = UTF8String.fromString(
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: java.net.UnknownHostException => "localhost" })
  def get(): UTF8String = name
}

/** `tally(array)` → map of string → count; `tally_value(array, value)`
  * → count of one value (any element type). tally requires string
  * elements like VRL's. */
case class VrlTally(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < arr.numElements()) {
      val e = arr.get(i, StringType)
      require(e != null, "tally: array elements must be non-null strings")
      val k = e.asInstanceOf[UTF8String]
      counts.merge(k, 1L, (a, b) => a + b)
      i += 1
    }
    val ks = new scala.collection.mutable.ArrayBuffer[Any](counts.size)
    val vs = new scala.collection.mutable.ArrayBuffer[Any](counts.size)
    counts.forEach { (k, n) => ks += k; vs += n }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(ks.toArray, vs.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): VrlTally =
    copy(child = newChild)
}

/** `ip_cidr_contains(cidr, ip)` over BOTH families (v4 and v6) via
  * byte-wise prefix compare; malformed input throws (VRL's fallible
  * form — `??` catches), replacing the earlier v4-only arithmetic whose
  * v6 answer was a documented null. */
case class VrlCidrContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(cidr: Any, ip: Any): Any =
    VrlCidrContains.contains(cidr.asInstanceOf[UTF8String],
      ip.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, i) =>
      s"${ev.value} = graft.functions.VrlCidrContains.contains($c, $i);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VrlCidrContains = copy(left = l, right = r)
}
object VrlCidrContains {
  def contains(cidr: UTF8String, ip: UTF8String): Boolean = {
    val c = cidr.toString
    val slash = c.indexOf('/')
    require(slash > 0, s"ip_cidr_contains: `$c` is not base/prefix CIDR")
    val baseS = c.substring(0, slash)
    require(baseS.matches("[0-9A-Fa-f:.]+"),
      s"ip_cidr_contains: `$baseS` is not an IP literal")
    val ipS = ip.toString
    require(ipS.matches("[0-9A-Fa-f:.]+"),
      s"ip_cidr_contains: `$ipS` is not an IP literal")
    val base = java.net.InetAddress.getByName(baseS).getAddress
    val addr = java.net.InetAddress.getByName(ipS).getAddress
    if (base.length != addr.length) return false // family mismatch: not contained
    val bits = c.substring(slash + 1).toInt
    require(bits >= 0 && bits <= base.length * 8,
      s"ip_cidr_contains: prefix /$bits out of range for `$c`")
    var i = 0
    while (i * 8 < bits) {
      val keep = math.min(8, bits - i * 8)
      val mask = (0xff << (8 - keep)) & 0xff
      if ((base(i) & mask) != (addr(i) & mask)) return false
      i += 1
    }
    true
  }
}

/** `parse_ruby_hash(value)` — legacy Rails-style hashes
  * (`{ "k" => "v", :sym => nil, "n" => [1, 2] }`) ride the same VARIANT
  * path as parse_xml/parse_json: this kernel transcribes the hash to
  * JSON text (symbols become string keys, nil → null, `=>` → `:`) and
  * the registration wraps it in Spark's ParseJson. Malformed input
  * throws (fallible). */
case class VrlRubyHashToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    VrlRubyHashToJson.toJson(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlRubyHashToJson.toJson($v);")
  override protected def withNewChildInternal(newChild: Expression): VrlRubyHashToJson =
    copy(child = newChild)
}
object VrlRubyHashToJson {
  def toJson(v: UTF8String): UTF8String = {
    val s = v.toString
    val out = new java.lang.StringBuilder(s.length + 16)
    val p = new Parser(s)
    p.skipWs()
    p.value(out)
    p.skipWs()
    require(p.done, s"parse_ruby_hash: trailing content at offset ${p.pos}")
    UTF8String.fromString(out.toString)
  }
  private final class Parser(s: String) {
    var pos = 0
    def done: Boolean = pos >= s.length
    def skipWs(): Unit = while (!done && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"parse_ruby_hash: $msg at offset $pos")
    private def expect(c: Char): Unit = {
      if (done || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def value(out: java.lang.StringBuilder): Unit = {
      skipWs()
      if (done) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => hash(out)
        case '[' => array(out)
        case '"' | '\'' => out.append(jsonString(quoted()))
        case ':' => // :symbol value position → JSON string
          pos += 1; out.append(jsonString(ident()))
        case c if c.isDigit || c == '-' || c == '+' => number(out)
        case _ =>
          val w = ident()
          w match {
            case "nil" => out.append("null"); ()
            case "true" | "false" => out.append(w); ()
            case other => fail(s"unexpected token `$other`")
          }
      }
    }
    private def hash(out: java.lang.StringBuilder): Unit = {
      expect('{'); out.append('{')
      skipWs()
      var first = true
      while (!done && s.charAt(pos) != '}') {
        if (!first) { expect(','); out.append(','); skipWs() }
        first = false
        // key: quoted string or :symbol (ruby also allows `key:` — the
        // modern syntax — normalized the same way)
        val key = s.charAt(pos) match {
          case '"' | '\'' => quoted()
          case ':' => pos += 1; ident()
          case c if c.isLetter || c == '_' => ident()
          case _ => fail("expected hash key")
        }
        out.append(jsonString(key))
        skipWs()
        if (s.startsWith("=>", pos)) pos += 2
        else if (!done && s.charAt(pos) == ':') pos += 1
        else fail("expected `=>` or `:` after key")
        out.append(':')
        value(out)
        skipWs()
      }
      expect('}'); out.append('}')
      ()
    }
    private def array(out: java.lang.StringBuilder): Unit = {
      expect('['); out.append('[')
      skipWs()
      var first = true
      while (!done && s.charAt(pos) != ']') {
        if (!first) { expect(','); out.append(','); skipWs() }
        first = false
        value(out)
        skipWs()
      }
      expect(']'); out.append(']')
      ()
    }
    private def quoted(): String = {
      val q = s.charAt(pos); pos += 1
      val sb = new java.lang.StringBuilder
      while (!done && s.charAt(pos) != q) {
        val c = s.charAt(pos)
        if (c == '\\' && pos + 1 < s.length) {
          val n = s.charAt(pos + 1)
          sb.append(n match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other
          })
          pos += 2
        } else { sb.append(c); pos += 1 }
      }
      expect(q)
      sb.toString
    }
    private def ident(): String = {
      val start = pos
      while (!done && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_'))
        pos += 1
      if (pos == start) fail("expected identifier")
      s.substring(start, pos)
    }
    private def number(out: java.lang.StringBuilder): Unit = {
      val start = pos
      if (s.charAt(pos) == '+') pos += 1
      else if (s.charAt(pos) == '-') { out.append('-'); pos += 1 }
      while (!done && (s.charAt(pos).isDigit || s.charAt(pos) == '.' ||
        s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) pos += 1
      val body = s.substring(if (s.charAt(start) == '+' || s.charAt(start) == '-')
        start + 1 else start, pos)
      require(body.matches("[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?"),
        s"parse_ruby_hash: bad number `$body`")
      out.append(body)
      ()
    }
    private def jsonString(raw: String): String = {
      val sb = new java.lang.StringBuilder(raw.length + 2)
      JsonEscape.str(raw, sb)
      sb.toString
    }
  }
}

/** `tally_value(array, value)` — occurrences of one value (any element
  * type; null-safe equality like VRL's value compare). */
case class VrlTallyValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(arr: Any, v: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    var n = 0L
    var i = 0
    while (i < a.numElements()) {
      val e = a.get(i, et)
      if (e != null && e == v) n += 1
      i += 1
    }
    n
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VrlTallyValue = copy(left = l, right = r)
}

/** `contains_all(value, substrings)` — true iff the string contains
  * EVERY substring in the array. */
case class VrlContainsAll(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any, subs: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val a = subs.asInstanceOf[ArrayData]
    var i = 0
    while (i < a.numElements()) {
      val sub = a.get(i, StringType)
      require(sub != null, "contains_all: substrings must be non-null")
      if (!s.contains(sub.asInstanceOf[UTF8String])) return false
      i += 1
    }
    true
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VrlContainsAll = copy(left = l, right = r)
}
