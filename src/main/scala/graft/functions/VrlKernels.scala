package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VRL stdlib kernels that need real per-row algorithms (quote-aware CSV
  * split, JDK digests the SQL surface lacks) — codegen'd via static
  * kernel calls, the same pattern as [[VrlParseKeyValue]] /
  * [[BandedLevenshtein]]: `doGenCode` emits one static invocation, so
  * rows never leave whole-stage codegen for an interpreter.
  */

/** VRL `parse_csv(value[, delimiter])` → `array<string>` of ONE record's
  * fields, RFC 4180 quoting: a quoted field may contain the delimiter
  * and doubled quotes escape (`"a""b"`). VRL parses a single line per
  * call (its processor is row-at-a-time); embedded newlines inside a
  * quoted field are kept verbatim. */
case class VrlParseCsv(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any, d: Any): Any =
    VrlParseCsv.parse(v.asInstanceOf[UTF8String], d.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, d) =>
      s"${ev.value} = graft.functions.VrlParseCsv.parse($v, $d);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VrlParseCsv = copy(left = newLeft, right = newRight)
}

object VrlParseCsv {
  def parse(value: UTF8String,
      delim: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = value.toString
    val d = delim.toString
    // length validated at registration (VrlLib's literalString check) —
    // a bad delimiter fails analysis, never a running batch
    assert(d.length == 1, s"parse_csv: delimiter must be one character, got `$d`")
    val dc = d.charAt(0)
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    val cur = new StringBuilder
    var i = 0
    var inQuotes = false
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && s.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += c
      } else c match {
        case '"' if cur.isEmpty => inQuotes = true
        case `dc` => out += UTF8String.fromString(cur.toString); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    out += UTF8String.fromString(cur.toString)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray[Any])
  }
}

/** VRL `sha2(value[, variant])` → lowercase hex digest. The JDK's
  * MessageDigest covers every VRL variant including the SHA-512/224
  * DEFAULT, which Spark's own `sha2(expr, bits)` cannot express. The
  * variant is validated at BUILD time (literal), so an unknown name
  * fails analysis naming the supported set. */
case class VrlDigest(child: Expression, algorithm: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    VrlDigest.digest(v.asInstanceOf[UTF8String], algorithm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val algo = ctx.addReferenceObj("algo", algorithm, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlDigest.digest($v, $algo);")
  }

  override protected def withNewChildInternal(newChild: Expression): VrlDigest =
    copy(child = newChild)
}

object VrlDigest {
  // VRL variant spelling → JDK algorithm name
  val Variants: Map[String, String] = Map(
    "SHA-224" -> "SHA-224", "SHA-256" -> "SHA-256", "SHA-384" -> "SHA-384",
    "SHA-512" -> "SHA-512", "SHA-512/224" -> "SHA-512/224",
    "SHA-512/256" -> "SHA-512/256")

  def digest(v: UTF8String, algo: String): UTF8String = {
    val md = java.security.MessageDigest.getInstance(algo)
    UTF8String.fromString(
      md.digest(v.getBytes).map("%02x".format(_)).mkString)
  }
}

/** VRL `hmac(value, key[, algorithm])` → the raw MAC BYTES (VRL returns
  * bytes for the caller to encode — compose with encode_base64 /
  * encode_base16). Algorithm validated at build time. */
case class VrlHmac(left: Expression, right: Expression, algorithm: String)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(v: Any, k: Any): Any =
    VrlHmac.mac(v.asInstanceOf[UTF8String], k.asInstanceOf[UTF8String], algorithm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val algo = ctx.addReferenceObj("algo", algorithm, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (v, k) =>
      s"${ev.value} = graft.functions.VrlHmac.mac($v, $k, $algo);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VrlHmac = copy(left = newLeft, right = newRight)
}

object VrlHmac {
  // VRL algorithm spelling → JCA Mac name
  val Variants: Map[String, String] = Map(
    "SHA1" -> "HmacSHA1", "SHA-256" -> "HmacSHA256", "SHA-512" -> "HmacSHA512")

  def mac(v: UTF8String, key: UTF8String, algo: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance(algo)
    m.init(new javax.crypto.spec.SecretKeySpec(key.getBytes, algo))
    m.doFinal(v.getBytes)
  }
}

/** VRL `encode_logfmt(object)` / `encode_key_value(object[, kv_delim[,
  * field_delim]])` — a map's entries rendered as `k=v` pairs; a value
  * (or key) containing the field delimiter, the kv delimiter, or a
  * double quote is double-quoted with `\"` escaping, logfmt's rule and
  * the exact inverse of [[VrlParseKeyValue]]. Keys render sorted for
  * deterministic output (VRL objects are sorted maps). */
case class VrlEncodeKeyValue(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(m: Any, kv: Any, fd: Any): Any =
    VrlEncodeKeyValue.encode(
      m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      kv.asInstanceOf[UTF8String], fd.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, kv, fd) =>
      s"${ev.value} = graft.functions.VrlEncodeKeyValue.encode($m, $kv, $fd);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): VrlEncodeKeyValue =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VrlEncodeKeyValue {
  def encode(m: org.apache.spark.sql.catalyst.util.MapData,
      kvDelim: UTF8String, fieldDelim: UTF8String): UTF8String = {
    val kv = kvDelim.toString
    val fd = fieldDelim.toString
    def q(s: String): String =
      // leading/trailing whitespace must quote too: the parser's
      // lenient mode (VRL's default) TRIMS around unquoted values, so
      // an unquoted ` x` would not round-trip (property-spec-caught)
      if (s.contains(fd) || s.contains(kv) || s.contains("\"") ||
        (s.nonEmpty && (s.head.isWhitespace || s.last.isWhitespace)))
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      else s
    val keys = m.keyArray()
    val vals = m.valueArray()
    val pairs = (0 until m.numElements()).map { i =>
      val k = keys.getUTF8String(i).toString
      val v = if (vals.isNullAt(i)) "" else vals.getUTF8String(i).toString
      (k, v)
    }.sortBy(_._1).map { case (k, v) => q(k) + kv + q(v) }
    UTF8String.fromString(pairs.mkString(fd))
  }
}

/** VRL `encode_gzip`/`decode_gzip`/`encode_zlib`/`decode_zlib` — the
  * JDK's Deflater/GZIP streams; binary in, binary out (compose with
  * encode_base64 for text transport, like VRL). */
case class VrlCompress(child: Expression, algorithm: String, encode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(v: Any): Any =
    VrlCompress.run(v.asInstanceOf[Array[Byte]], algorithm, encode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val algo = ctx.addReferenceObj("algo", algorithm, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlCompress.run($v, $algo, $encode);")
  }

  override protected def withNewChildInternal(newChild: Expression): VrlCompress =
    copy(child = newChild)
}

object VrlCompress {
  def run(bytes: Array[Byte], algo: String, encode: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (encode) {
      // zstd/snappy ride the Spark-bundled native codecs (zstd-jni /
      // snappy-java are already on every executor's classpath — Spark's
      // own shuffle/parquet codecs) — raw block formats like VRL's
      if (algo == "zstd") return com.github.luben.zstd.Zstd.compress(bytes)
      if (algo == "snappy") return org.xerial.snappy.Snappy.compress(bytes)
      val os = algo match {
        case "gzip" => new java.util.zip.GZIPOutputStream(out)
        case "zlib" => new java.util.zip.DeflaterOutputStream(out)
      }
      os.write(bytes); os.close()
    } else {
      if (algo == "zstd") {
        val n = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
        require(n >= 0 && n <= Int.MaxValue, "decode_zstd: bad frame header")
        return com.github.luben.zstd.Zstd.decompress(bytes, n.toInt)
      }
      if (algo == "snappy") return org.xerial.snappy.Snappy.uncompress(bytes)
      val is = algo match {
        case "gzip" => new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        case "zlib" => new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(bytes))
      }
      val buf = new Array[Byte](8192)
      var n = is.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
      is.close()
    }
    out.toByteArray
  }
}

/** VRL `parse_query_string(value)` → `map<string,string>` — a leading
  * `?` is accepted, keys and values are URL-DECODED (percent escapes
  * and `+` → space, like VRL), a standalone key maps to `""`, and an
  * invalid percent escape keeps the raw text (VRL's parser is
  * infallible). Documented divergence: VRL returns an ARRAY for a
  * repeated key (mixed scalar/array values in one object), which a
  * typed map column cannot hold — the LAST occurrence wins here. */
case class VrlParseQueryString(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    VrlParseQueryString.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseQueryString.parse($v);")

  override protected def withNewChildInternal(
      newChild: Expression): VrlParseQueryString = copy(child = newChild)
}

object VrlParseQueryString {
  /** form-urlencoded decode, escape-by-escape: '+' → space, valid %XX
    * decodes, an INVALID escape passes through raw WITHOUT poisoning
    * the token's other escapes (URLDecoder would throw and force the
    * whole token raw — 'a+b%zz' must still give 'a b%zz'). */
  private def decode(s: String): String = {
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if (c == '+') { out.write(' '); i += 1 }
      else if (c == '%' && i + 2 < bytes.length &&
          hex(bytes(i + 1).toChar) >= 0 && hex(bytes(i + 2).toChar) >= 0) {
        out.write(hex(bytes(i + 1).toChar) * 16 + hex(bytes(i + 2).toChar))
        i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  def parse(value: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val s0 = value.toString
    val s = if (s0.startsWith("?")) s0.substring(1) else s0
    val m = new java.util.LinkedHashMap[UTF8String, UTF8String]()
    if (s.nonEmpty) s.split("&", -1).foreach { pair =>
      if (pair.nonEmpty) {
        val cut = pair.indexOf('=')
        val (k, v) =
          if (cut < 0) (decode(pair), "")
          else (decode(pair.substring(0, cut)), decode(pair.substring(cut + 1)))
        m.put(UTF8String.fromString(k), UTF8String.fromString(v))
      }
    }
    val keys = new Array[Any](m.size)
    val values = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); keys(i) = e.getKey; values(i) = e.getValue; i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(values))
  }
}

/** VRL `encode_csv(array[, delimiter])` → ONE RFC 4180 record: a field
  * holding the delimiter, a double quote, CR or LF is double-quoted
  * with doubled-quote escaping — the exact inverse of [[VrlParseCsv]].
  * Delimiter validated at BUILD (1-char string literal). */
case class VrlEncodeCsv(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(a: Any, d: Any): Any =
    VrlEncodeCsv.encode(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      d.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, d) =>
      s"${ev.value} = graft.functions.VrlEncodeCsv.encode($a, $d);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VrlEncodeCsv = copy(left = newLeft, right = newRight)
}

object VrlEncodeCsv {
  def encode(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      delim: UTF8String): UTF8String = {
    val d = delim.toString
    val dc = d.charAt(0)
    val out = new StringBuilder
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (i > 0) out += dc
      val f = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      if (f.indexOf(dc) >= 0 || f.indexOf('"') >= 0 ||
          f.indexOf('\n') >= 0 || f.indexOf('\r') >= 0)
        out ++= "\"" + f.replace("\"", "\"\"") + "\""
      else out ++= f
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** VRL `parse_int(value[, base])` → bigint. With no base, the VRL
  * prefix rules apply: `0b` → 2, `0o` → 8, `0x` → 16, else 10 (an
  * optional leading sign precedes the prefix). FALLIBLE like VRL's:
  * unparseable input THROWS, which `??` / `, err =` catch via the
  * try_pair carrier and an unhandled call fails the batch into
  * error_output (the engine's abort channel — VRL itself would reject
  * the unhandled call at compile). Base validated at BUILD. */
case class VrlParseInt(child: Expression, base: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    VrlParseInt.parse(v.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseInt.parse($v, $base);")

  override protected def withNewChildInternal(newChild: Expression): VrlParseInt =
    copy(child = newChild)
}

object VrlParseInt {
  /** base 0 = infer from prefix (VRL's no-base form). */
  def parse(v: UTF8String, base0: Int): Long = {
    var s = v.toString.trim
    var sign = 1L
    if (s.startsWith("+")) s = s.substring(1)
    else if (s.startsWith("-")) { sign = -1L; s = s.substring(1) }
    var base = base0
    if (base == 0) {
      val low = s.toLowerCase(java.util.Locale.ROOT)
      if (low.startsWith("0b")) { base = 2; s = s.substring(2) }
      else if (low.startsWith("0o")) { base = 8; s = s.substring(2) }
      else if (low.startsWith("0x")) { base = 16; s = s.substring(2) }
      else base = 10
    }
    try {
      require(s.nonEmpty)
      // parse WITH the sign attached: Long.MinValue's magnitude
      // overflows a positive parse
      java.lang.Long.parseLong(if (sign < 0) "-" + s else s, base)
    } catch {
      case _: NumberFormatException | _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"parse_int: cannot parse `${v.toString}` in base $base")
    }
  }
}

/** VRL `parse_cef(value)` → the CEF:0 header fields as a struct plus
  * the extension's key=value pairs as a MAP column (vrl stdlib
  * parse_cef; the reference runs it via the embedded VRL runtime).
  * Header pipes unescape `\|` and `\\`; extension values unescape
  * `\=`, `\\`, `\n`, `\r` and may contain spaces — a new key starts
  * only at a ` token=` boundary, the CEF rule. Malformed input THROWS
  * (fallible like VRL's, caught by `??`/`, err =`).
  *
  * Documented divergence: VRL flattens extension keys into the result
  * object; dynamic keys cannot join a static struct, so they land in
  * the `extensions` map field instead. */
case class VrlParseCef(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VrlParseCef.Schema

  override protected def nullSafeEval(v: Any): Any =
    VrlParseCef.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseCef.parse($v);")

  override protected def withNewChildInternal(newChild: Expression): VrlParseCef =
    copy(child = newChild)
}

object VrlParseCef {
  val Schema: StructType = StructType(Seq(
    StructField("cefVersion", IntegerType),
    StructField("deviceVendor", StringType),
    StructField("deviceProduct", StringType),
    StructField("deviceVersion", StringType),
    StructField("deviceEventClassId", StringType),
    StructField("name", StringType),
    StructField("severity", StringType),
    StructField("extensions",
      MapType(StringType, StringType, valueContainsNull = false))))

  private def splitHeader(s: String): (Array[String], String) = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    while (i < s.length && parts.length < 7) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          cur += (s.charAt(i + 1) match {
            case '|' => '|'
            case '\\' => '\\'
            case other => other
          })
          i += 1
        case '|' => parts += cur.toString; cur.clear()
        case c => cur += c
      }
      i += 1
    }
    require(parts.length == 7, s"parse_cef: expected 7 header fields in `$s`")
    (parts.toArray, s.substring(i))
  }

  def parse(value: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = value.toString.trim
    require(s.startsWith("CEF:"), s"parse_cef: not a CEF record: `$s`")
    val (header, ext) = splitHeader(s.substring(4))
    // extension keys are word tokens immediately followed by '=' — a
    // value may hold spaces, so the NEXT key is found by lookahead
    val keyPat = java.util.regex.Pattern.compile("(?:^|\\s)([\\w.]+)=")
    val m = keyPat.matcher(ext)
    val keys = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    while (m.find()) keys += ((m.group(1), m.start, m.end))
    def unesc(v: String): String = {
      val out = new StringBuilder
      var i = 0
      while (i < v.length) {
        if (v.charAt(i) == '\\' && i + 1 < v.length) {
          out += (v.charAt(i + 1) match {
            case 'n' => '\n'
            case 'r' => '\r'
            case '=' => '='
            case '\\' => '\\'
            case other => other
          })
          i += 2
        } else { out += v.charAt(i); i += 1 }
      }
      out.toString
    }
    val ks = new Array[Any](keys.length)
    val vs = new Array[Any](keys.length)
    for (idx <- keys.indices) {
      val (k, _, vStart) = keys(idx)
      val vEnd = if (idx + 1 < keys.length) keys(idx + 1)._2 else ext.length
      ks(idx) = UTF8String.fromString(k)
      vs(idx) = UTF8String.fromString(unesc(ext.substring(vStart, vEnd).trim))
    }
    val extMap = new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vs))
    org.apache.spark.sql.catalyst.InternalRow(
      header(0).trim.toInt,
      UTF8String.fromString(header(1)), UTF8String.fromString(header(2)),
      UTF8String.fromString(header(3)), UTF8String.fromString(header(4)),
      UTF8String.fromString(header(5)), UTF8String.fromString(header(6)),
      extMap)
  }
}

/** VRL case conversions — `camelcase` / `pascalcase` / `snakecase` /
  * `screamingsnakecase` / `kebabcase`: the input tokenizes on
  * separators ([ _-]+) AND camel boundaries (aB, ABBr|eviation), then
  * re-joins in the target convention, VRL's behavior. One kernel, the
  * style chosen at BUILD. */
case class VrlCaseConvert(child: Expression, style: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    VrlCaseConvert.convert(v.asInstanceOf[UTF8String], style)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val st = ctx.addReferenceObj("style", style, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlCaseConvert.convert($v, $st);")
  }

  override protected def withNewChildInternal(newChild: Expression): VrlCaseConvert =
    copy(child = newChild)
}

object VrlCaseConvert {
  val Styles = Set("camel", "pascal", "snake", "screaming_snake", "kebab")

  private def words(s: String): Seq[String] = {
    // split camel boundaries first (aB → a B; ABCd → AB Cd), then
    // separators; drop empties
    val boundary = s
      .replaceAll("([\\p{Ll}\\p{Nd}])(\\p{Lu})", "$1 $2")
      .replaceAll("(\\p{Lu}+)(\\p{Lu}\\p{Ll})", "$1 $2")
    boundary.split("[\\s_\\-]+").toSeq.filter(_.nonEmpty)
  }

  def convert(v: UTF8String, style: String): UTF8String = {
    // Locale.ROOT everywhere: default-locale casing (tr_TR dotless-ı)
    // would make row values differ by deployment environment
    val R = java.util.Locale.ROOT
    val ws = words(v.toString)
    def cap(w: String) =
      if (w.isEmpty) w
      else w.substring(0, 1).toUpperCase(R) + w.substring(1).toLowerCase(R)
    val out = style match {
      case "camel" => ws.zipWithIndex.map {
        case (w, 0) => w.toLowerCase(R)
        case (w, _) => cap(w)
      }.mkString
      case "pascal" => ws.map(cap).mkString
      case "snake" => ws.map(_.toLowerCase(R)).mkString("_")
      case "screaming_snake" => ws.map(_.toUpperCase(R)).mkString("_")
      case "kebab" => ws.map(_.toLowerCase(R)).mkString("-")
    }
    UTF8String.fromString(out)
  }
}

/** VRL `encrypt(plaintext, algorithm, key, iv: ...)` /
  * `decrypt(ciphertext, algorithm, key, iv: ...)` — the AES family the
  * vrl stdlib exposes, on the JDK's ciphers (CBC-PKCS7 ≡ the JDK's
  * PKCS5 at AES's 16-byte block, CFB, CTR). Algorithm validated at
  * BUILD; key/iv length errors THROW per row (fallible, `??`-catchable
  * like VRL's). encrypt returns raw BYTES (compose with encode_base64),
  * decrypt returns the plaintext string. */
case class VrlCipher(first: Expression, second: Expression,
    third: Expression, transform: String, encrypt: Boolean)
    extends TernaryExpression {
  override def dataType: DataType = if (encrypt) BinaryType else StringType

  override protected def nullSafeEval(v: Any, k: Any, iv: Any): Any = {
    val out = VrlCipher.run(
      if (encrypt) v.asInstanceOf[UTF8String].getBytes
      else v.asInstanceOf[Array[Byte]],
      k.asInstanceOf[UTF8String].getBytes,
      iv.asInstanceOf[UTF8String].getBytes, transform, encrypt)
    if (encrypt) out else UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("transform", transform, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (v, k, iv) =>
      if (encrypt)
        s"${ev.value} = graft.functions.VrlCipher.run($v.getBytes(), $k.getBytes(), $iv.getBytes(), $t, true);"
      else
        s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes(" +
          s"graft.functions.VrlCipher.run($v, $k.getBytes(), $iv.getBytes(), $t, false));")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): VrlCipher =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VrlCipher {
  // VRL algorithm spelling → (JCA transformation, key bytes)
  val Variants: Map[String, (String, Int)] = Map(
    "AES-128-CBC-PKCS7" -> ("AES/CBC/PKCS5Padding", 16),
    "AES-192-CBC-PKCS7" -> ("AES/CBC/PKCS5Padding", 24),
    "AES-256-CBC-PKCS7" -> ("AES/CBC/PKCS5Padding", 32),
    "AES-128-CFB" -> ("AES/CFB/NoPadding", 16),
    "AES-192-CFB" -> ("AES/CFB/NoPadding", 24),
    "AES-256-CFB" -> ("AES/CFB/NoPadding", 32),
    "AES-128-CTR" -> ("AES/CTR/NoPadding", 16),
    "AES-192-CTR" -> ("AES/CTR/NoPadding", 24),
    "AES-256-CTR" -> ("AES/CTR/NoPadding", 32),
    "AES-128-OFB" -> ("AES/OFB/NoPadding", 16),
    "AES-192-OFB" -> ("AES/OFB/NoPadding", 24),
    "AES-256-OFB" -> ("AES/OFB/NoPadding", 32),
    // AEAD: the JDK appends/expects the 16-byte tag on the ciphertext,
    // the same layout VRL's Rust AEAD crates use; 12-byte nonce
    "CHACHA20-POLY1305" -> ("ChaCha20-Poly1305", 32))

  def run(data: Array[Byte], key: Array[Byte], iv: Array[Byte],
      spec: String, encrypt: Boolean): Array[Byte] = {
    val Array(transform, keyLenS) = spec.split(";")
    val keyLen = keyLenS.toInt
    require(key.length == keyLen,
      s"encrypt/decrypt: key must be $keyLen bytes, got ${key.length}")
    val chacha = transform.startsWith("ChaCha20")
    val ivLen = if (chacha) 12 else 16
    require(iv.length == ivLen,
      s"encrypt/decrypt: iv must be $ivLen bytes for $transform, got ${iv.length}")
    val c = javax.crypto.Cipher.getInstance(transform)
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, if (chacha) "ChaCha20" else "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }
}

/** VRL `encode_percent(value)` / `decode_percent(value)` — URL percent
  * encoding with VRL's NON_ALPHANUMERIC default set (everything but
  * A-Za-z0-9 encodes, UTF-8 bytes); decode reverses any %XX and leaves
  * invalid escapes raw (infallible like VRL's). `format_int(value[,
  * base])` is parse_int's inverse. `encode_punycode`/`decode_punycode`
  * ride the JDK's IDN (RFC 3490 toASCII/toUnicode). All four are
  * static-kernel one-liners registered in [[VrlLib]]. */
object VrlStringKernels {
  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def encodePercent(v: UTF8String): UTF8String = {
    val bytes = v.getBytes
    val out = new StringBuilder
    bytes.foreach { b =>
      val u = b & 0xff
      if (isUnreserved(u)) out += u.toChar
      else out ++= f"%%$u%02X"
    }
    UTF8String.fromString(out.toString)
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  def decodePercent(v: UTF8String): UTF8String = {
    val s = v.toString
    val out = new java.io.ByteArrayOutputStream()
    val utf8 = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < utf8.length) {
      val c = utf8(i)
      if (c == '%' && i + 2 < utf8.length) {
        val h = hexVal(utf8(i + 1).toChar)
        val l = hexVal(utf8(i + 2).toChar)
        if (h >= 0 && l >= 0) { out.write(h * 16 + l); i += 3 }
        else { out.write(c.toInt); i += 1 } // invalid escape stays raw
      } else { out.write(c.toInt); i += 1 }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  def formatInt(v: Long, base: Int): UTF8String =
    UTF8String.fromString(java.lang.Long.toString(v, base))

  def encodePunycode(v: UTF8String): UTF8String =
    UTF8String.fromString(
      java.net.IDN.toASCII(v.toString,
        java.net.IDN.ALLOW_UNASSIGNED).toLowerCase(java.util.Locale.ROOT))

  def decodePunycode(v: UTF8String): UTF8String =
    UTF8String.fromString(
      java.net.IDN.toUnicode(v.toString, java.net.IDN.ALLOW_UNASSIGNED))
}

/** 1-arg static-kernel shim: the codegen template every
  * [[VrlStringKernels]] entry shares (method chosen at BUILD). */
case class VrlStringKernel1(child: Expression, method: String,
    outType: DataType) extends UnaryExpression {
  override def dataType: DataType = outType

  override protected def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    method match {
      case "encodePercent" => VrlStringKernels.encodePercent(u)
      case "decodePercent" => VrlStringKernels.decodePercent(u)
      case "encodePunycode" => VrlStringKernels.encodePunycode(u)
      case "decodePunycode" => VrlStringKernels.decodePunycode(u)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlStringKernels.$method($v);")

  override protected def withNewChildInternal(newChild: Expression): VrlStringKernel1 =
    copy(child = newChild)
}

/** VRL `format_int(value[, base])` — parse_int's inverse; base
  * validated at BUILD. */
case class VrlFormatInt(child: Expression, base: Int) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    VrlStringKernels.formatInt(v.asInstanceOf[Long], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlStringKernels.formatInt($v, $base);")

  override protected def withNewChildInternal(newChild: Expression): VrlFormatInt =
    copy(child = newChild)
}

/** VRL `parse_aws_alb_log(value)` → the ALB access-log struct (vrl
  * stdlib; field list and quoting per the published AWS ALB access-log
  * format). Space-separated tokens with double-quoted fields; the
  * quoted `request` splits into method/url/protocol; `-` → null;
  * processing times are seconds as double, byte counts long, status
  * codes int; the two trailing `_list` fields land as arrays.
  * Malformed input THROWS (fallible, `??`-catchable). */
case class VrlParseAlbLog(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VrlParseAlbLog.Schema

  override protected def nullSafeEval(v: Any): Any =
    VrlParseAlbLog.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseAlbLog.parse($v);")

  override protected def withNewChildInternal(newChild: Expression): VrlParseAlbLog =
    copy(child = newChild)
}

object VrlParseAlbLog {
  val Schema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("timestamp", StringType),
    StructField("elb", StringType),
    StructField("client_host", StringType),
    StructField("target_host", StringType),
    StructField("request_processing_time", DoubleType),
    StructField("target_processing_time", DoubleType),
    StructField("response_processing_time", DoubleType),
    StructField("elb_status_code", IntegerType),
    StructField("target_status_code", IntegerType),
    StructField("received_bytes", LongType),
    StructField("sent_bytes", LongType),
    StructField("request_method", StringType),
    StructField("request_url", StringType),
    StructField("request_protocol", StringType),
    StructField("user_agent", StringType),
    StructField("ssl_cipher", StringType),
    StructField("ssl_protocol", StringType),
    StructField("target_group_arn", StringType),
    StructField("trace_id", StringType),
    StructField("domain_name", StringType),
    StructField("chosen_cert_arn", StringType),
    StructField("matched_rule_priority", IntegerType),
    StructField("request_creation_time", StringType),
    StructField("actions_executed", StringType),
    StructField("redirect_url", StringType),
    StructField("error_reason", StringType),
    StructField("target_port_list", ArrayType(StringType, containsNull = false)),
    StructField("target_status_code_list", ArrayType(StringType, containsNull = false)),
    StructField("classification", StringType),
    StructField("classification_reason", StringType)))

  /** space-split honoring double quotes; quotes stripped. */
  private[functions] def tokens(s: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var started = false
    s.foreach {
      case '"' => inQ = !inQ; started = true
      case ' ' if !inQ =>
        if (started || cur.nonEmpty) { out += cur.toString; cur.clear(); started = false }
      case c => cur += c
    }
    if (started || cur.nonEmpty) out += cur.toString
    out.toIndexedSeq
  }

  def parse(value: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val t = tokens(value.toString.trim)
    require(t.length >= 12, s"parse_aws_alb_log: expected >= 12 fields, got ${t.length}")
    def at(i: Int): String = if (i < t.length) t(i) else "-"
    def str(i: Int): Any = {
      val v = at(i)
      if (v == "-" || v.isEmpty) null else UTF8String.fromString(v)
    }
    def dbl(i: Int): Any = {
      val v = at(i); if (v == "-") null else v.toDouble
    }
    def int(i: Int): Any = {
      val v = at(i); if (v == "-") null else v.toInt
    }
    def lng(i: Int): Any = {
      val v = at(i); if (v == "-") null else v.toLong
    }
    def list(i: Int): Any = {
      val v = at(i)
      val parts = if (v == "-" || v.isEmpty) Array.empty[Any]
        else v.split(" ").map(p => UTF8String.fromString(p): Any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(parts)
    }
    // the quoted request field: "METHOD URL PROTOCOL" (any part may be -)
    val req = at(12).split(" ", 3)
    def reqPart(j: Int): Any = {
      if (j < req.length && req(j) != "-" && req(j).nonEmpty)
        UTF8String.fromString(req(j)) else null
    }
    org.apache.spark.sql.catalyst.InternalRow(
      str(0), str(1), str(2), str(3), str(4),
      dbl(5), dbl(6), dbl(7),
      int(8), int(9), lng(10), lng(11),
      reqPart(0), reqPart(1), reqPart(2),
      str(13), str(14), str(15), str(16), str(17), str(18), str(19),
      int(20), str(21), str(22), str(23), str(24),
      list(25), list(26), str(27), str(28))
  }
}

/** VRL `parse_aws_vpc_flow_log(value[, format])` — the VPC flow-log
  * fields as a struct. The format is the space-separated field-name
  * list (AWS's custom-format string, `${}`-stripped names accepted);
  * DEFAULT is the v2 standard 14-field layout. The format must be a
  * string LITERAL (validated at build, like sha2's variant), so the
  * struct schema is fixed per call site; `-` → null; known numeric
  * fields type as long. */
object VrlParseVpcFlow {
  val DefaultFormat = "version account_id interface_id srcaddr dstaddr " +
    "srcport dstport protocol packets bytes start end action log_status"

  private val LongFields = Set("version", "srcport", "dstport", "protocol",
    "packets", "bytes", "start", "end", "tcp_flags", "traffic_path")

  def schemaFor(format: String): StructType = {
    val names = format.trim.split("\\s+").map(
      _.stripPrefix("${").stripSuffix("}").replace('-', '_'))
    require(names.nonEmpty && names.distinct.length == names.length,
      s"parse_aws_vpc_flow_log: bad format `$format`")
    StructType(names.map(n =>
      StructField(n, if (LongFields(n)) LongType else StringType)))
  }

  def parse(value: UTF8String, schema: StructType): org.apache.spark.sql.catalyst.InternalRow = {
    val t = value.toString.trim.split("\\s+")
    require(t.length == schema.length,
      s"parse_aws_vpc_flow_log: expected ${schema.length} fields, got ${t.length}")
    val vals = new Array[Any](t.length)
    var i = 0
    while (i < t.length) {
      vals(i) =
        if (t(i) == "-") null
        else if (schema(i).dataType == LongType) t(i).toLong
        else UTF8String.fromString(t(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}

case class VrlParseVpcFlow(child: Expression, format: String)
    extends UnaryExpression {
  private val schema = VrlParseVpcFlow.schemaFor(format)
  override def dataType: DataType = schema

  override protected def nullSafeEval(v: Any): Any =
    VrlParseVpcFlow.parse(v.asInstanceOf[UTF8String], schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("schema", schema,
      "org.apache.spark.sql.types.StructType")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseVpcFlow.parse($v, $sc);")
  }

  override protected def withNewChildInternal(newChild: Expression): VrlParseVpcFlow =
    copy(child = newChild)
}

/** VRL `redact(value, filters: [...])` — every filter match replaces
  * with `[REDACTED]`. Filters are regex string literals or the named
  * filter `us_social_security_number`, resolved at BUILD into a chain
  * of codegen RegExpReplace — nothing interpreted per row. */
object VrlRedact {
  val Named: Map[String, String] = Map(
    "us_social_security_number" -> "\\b\\d{3}-?\\d{2}-?\\d{4}\\b")
}

/** VRL `parse_tokens(value)` → `array<string>`: whitespace-separated
  * tokens where double-quoted strings and square-bracketed groups each
  * form ONE token (delimiters stripped), the classic access-log
  * tokenizer. `-` stays a literal token like VRL's. */
case class VrlParseTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    VrlParseTokens.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseTokens.parse($v);")

  override protected def withNewChildInternal(newChild: Expression): VrlParseTokens =
    copy(child = newChild)
}

object VrlParseTokens {
  def parse(value: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = value.toString
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    val cur = new StringBuilder
    var mode = ' ' // ' ' plain, '"' quoted, '[' bracketed
    var started = false
    def flush(): Unit = {
      if (started || cur.nonEmpty) out += UTF8String.fromString(cur.toString)
      cur.clear(); started = false
    }
    s.foreach { c =>
      mode match {
        case '"' =>
          if (c == '"') { flush(); mode = ' ' } else cur += c
        case '[' =>
          if (c == ']') { flush(); mode = ' ' } else cur += c
        case _ => c match {
          case '"' => mode = '"'; started = true
          case '[' => mode = '['; started = true
          case ' ' | '\t' => flush()
          case other => cur += other; started = true
        }
      }
    }
    flush()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** VRL `sieve(value, permitted)` — keeps only the PERMITTED pattern's
  * matches (non-matching runs drop; pass `replace_single`-style
  * behavior by post-processing). Pattern compiled ONCE at build. */
case class VrlSieve(child: Expression, pattern: String) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    VrlSieve.sieve(v.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pattern", pattern, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlSieve.sieve($v, $p);")
  }

  override protected def withNewChildInternal(newChild: Expression): VrlSieve =
    copy(child = newChild)
}

object VrlSieve {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.regex.Pattern]()

  def sieve(v: UTF8String, pattern: String): UTF8String = {
    val p = cache.computeIfAbsent(pattern, java.util.regex.Pattern.compile(_))
    val m = p.matcher(v.toString)
    val out = new StringBuilder
    while (m.find()) out ++= m.group()
    UTF8String.fromString(out.toString)
  }
}
