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
      if (s.contains(fd) || s.contains(kv) || s.contains("\""))
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
      val os = algo match {
        case "gzip" => new java.util.zip.GZIPOutputStream(out)
        case "zlib" => new java.util.zip.DeflaterOutputStream(out)
      }
      os.write(bytes); os.close()
    } else {
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
  private def decode(s: String): String =
    try java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
    catch { case _: IllegalArgumentException => s }

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
      sign * java.lang.Long.parseLong(s, base)
    } catch {
      case _: NumberFormatException | _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"parse_int: cannot parse `${v.toString}` in base $base")
    }
  }
}
