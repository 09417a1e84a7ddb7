package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-13 VRL stdlib tranche 4 (vrl 0.30 stdlib — the version the
  * reference pins in crates/arkflow-plugin/Cargo.toml:70 and runs via
  * processor/vrl.rs): SeaHash, byte-chunking, emptiness, multi-pattern
  * regex tests, the rate-limited `log` sink, InfluxDB line protocol and
  * CBOR rides on the VARIANT path, charset transcoding, and the syslog
  * facility keyword pair. All codegen kernels, thin JDK wrappers, or
  * CodegenFallback leaves inside an otherwise codegen'd projection —
  * no interpreted UDFs. */

/** `seahash(value)` — the SeaHash portable hash (public algorithm from
  * the seahash crate docs, the exact function VRL calls): four 64-bit
  * lanes, the multiply–shift `diffuse` permutation, little-endian
  * words, length-xor finalizer. VRL surfaces the u64 as its integer
  * type (i64), i.e. the same bit pattern — matched here. */
case class VrlSeaHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VrlSeaHash.hash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlSeaHash.hash($v);")
  override protected def withNewChildInternal(newChild: Expression): VrlSeaHash =
    copy(child = newChild)
}

object VrlSeaHash {
  private final val P = 0x6eed0e9da4d94a4fL
  private def diffuse(x0: Long): Long = {
    var x = x0 * P
    x ^= (x >>> 32) >>> (x >>> 60).toInt
    x * P
  }
  /** little-endian read of `len` (1-8) bytes at `off`, zero-extended */
  private def readLE(b: Array[Byte], off: Int, len: Int): Long = {
    var w = 0L
    var i = 0
    while (i < len) { w |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    w
  }
  def hash(v: UTF8String): Long = hashBytes(v.getBytes)
  def hashBytes(buf: Array[Byte]): Long = {
    var a = 0x16f11fe89b0d677cL
    var b = 0xb480a793d8e6c86cL
    var c = 0x6fe2e5aaf078ebc9L
    var d = 0x14f994a4c5259381L
    val n = buf.length
    var i = 0
    while (i + 32 <= n) {
      a = diffuse(a ^ readLE(buf, i, 8))
      b = diffuse(b ^ readLE(buf, i + 8, 8))
      c = diffuse(c ^ readLE(buf, i + 16, 8))
      d = diffuse(d ^ readLE(buf, i + 24, 8))
      i += 32
    }
    // tail: full words into successive lanes, one final partial word
    var lane = 0
    while (i < n) {
      val take = math.min(8, n - i)
      val w = readLE(buf, i, take)
      lane match {
        case 0 => a = diffuse(a ^ w)
        case 1 => b = diffuse(b ^ w)
        case 2 => c = diffuse(c ^ w)
        case _ => d = diffuse(d ^ w)
      }
      lane += 1
      i += take
    }
    a ^= b; c ^= d; a ^= c
    a ^= n.toLong
    diffuse(a)
  }
}

/** `chunks(value, chunk_size)` — the string's BYTES split into slices of
  * at most chunk_size bytes (VRL chunks on byte boundaries; a slice may
  * split a multi-byte character, exactly like VRL's — stated in its own
  * docs). chunk_size is validated per call (fallible on < 1). */
case class VrlChunks(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any, size: Any): Any =
    VrlChunks.split(v.asInstanceOf[UTF8String], size.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.VrlChunks.split($v, (int) $s);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VrlChunks = copy(left = l, right = r)
}
object VrlChunks {
  def split(v: UTF8String, size: Int): ArrayData = {
    require(size >= 1, s"chunks: chunk_size must be >= 1, got $size")
    val bytes = v.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      math.max(1, (bytes.length + size - 1) / size))
    var i = 0
    while (i < bytes.length) {
      val end = math.min(bytes.length, i + size)
      out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, i, end))
      i = end
    }
    // empty input → empty array (Rust `chunks` yields no chunks)
    new GenericArrayData(out.toArray)
  }
}

/** `is_empty(value)` — true for an empty string, array, or map (VRL's
  * three container kinds). Type resolved from the child's schema, so
  * the check itself is branch-free per row. */
case class VrlIsEmpty(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | _: ArrayType | _: MapType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"is_empty takes a string, array, or object, got ${other.sql}")
    }
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].numBytes() == 0
    case _: ArrayType => v.asInstanceOf[ArrayData].numElements() == 0
    case _: MapType =>
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData].numElements() == 0
  }
  override protected def withNewChildInternal(newChild: Expression): VrlIsEmpty =
    copy(child = newChild)
}

/** `log(value[, level[, rate_limit_secs]])` — VRL's side-effect log:
  * writes the rendered value to the host log at `level` and returns
  * null. Vector rate-limits these by call site (default 1 s) so a hot
  * stream cannot flood the log — matched with a per-expression-instance
  * (= per call site per executor) token clock. */
case class VrlLog(child: Expression, level: String, rateSecs: Int)
    extends UnaryExpression with CodegenFallback {
  // NEVER foldable: a literal message would otherwise be constant-folded
  // at PLAN time — one driver-side log line during optimization and the
  // per-event executor logging never runs
  override def foldable: Boolean = false
  override def nullable: Boolean = true
  override def dataType: DataType = NullType
  @transient private lazy val logger =
    org.slf4j.LoggerFactory.getLogger("graft.vrl.log")
  // primed flag, not a zero seed: System.nanoTime()'s origin is
  // arbitrary (may be negative/small per the JVM spec), so `lastEmit=0`
  // could silently suppress the first rate window after JVM start
  @transient private var primed = false
  @transient private var lastEmit = 0L
  /** rate clock, factored out so the first-event guarantee is testable */
  private[graft] def shouldEmit(now: Long): Boolean =
    if (!primed || now - lastEmit >= rateSecs * 1000000000L) {
      primed = true; lastEmit = now; true
    } else false
  override def eval(input: InternalRow): Any = {
    if (shouldEmit(System.nanoTime())) {
      val v = child.eval(input)
      val msg = if (v == null) "null" else v.toString
      level match {
        case "error" => logger.error(msg)
        case "warn" => logger.warn(msg)
        case "debug" => logger.debug(msg)
        case "trace" => logger.trace(msg)
        case _ => logger.info(msg)
      }
    }
    null
  }
  override protected def withNewChildInternal(newChild: Expression): VrlLog =
    copy(child = newChild)
}

/** `match_any(value, [r'…', r'…'])` — true if ANY pattern matches; the
  * patterns are literals, compiled once at construction (fails analysis
  * on a bad pattern, like the other literal-pattern shims). */
case class VrlMatchAny(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(patterns.nonEmpty, "match_any: need at least one pattern")
  @transient private lazy val compiled =
    patterns.map(java.util.regex.Pattern.compile(_))
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString
    compiled.exists(_.matcher(s).find())
  }
  override protected def withNewChildInternal(newChild: Expression): VrlMatchAny =
    copy(child = newChild)
}

/** `decode_charset(value, from_charset)` / `encode_charset(value,
  * to_charset)` — transcoding between UTF-8 (VRL's working encoding)
  * and any charset the JDK knows. decode: foreign bytes → UTF-8 string;
  * encode: string → foreign bytes (compose with encode_base64 to ship
  * them). The charset name is validated at BUILD. */
case class VrlCharset(child: Expression, charset: String, encode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = if (encode) BinaryType else StringType
  override protected def nullSafeEval(v: Any): Any =
    if (encode) VrlCharset.enc(v.asInstanceOf[UTF8String], charset)
    else VrlCharset.dec(v.asInstanceOf[Array[Byte]], charset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("charset", charset, "java.lang.String")
    val call = if (encode) "enc" else "dec"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlCharset.$call($v, $cs);")
  }
  override protected def withNewChildInternal(newChild: Expression): VrlCharset =
    copy(child = newChild)
}
object VrlCharset {
  def enc(v: UTF8String, charset: String): Array[Byte] =
    v.toString.getBytes(java.nio.charset.Charset.forName(charset))
  def dec(b: Array[Byte], charset: String): UTF8String =
    UTF8String.fromString(new String(b, java.nio.charset.Charset.forName(charset)))
}

/** `to_syslog_facility(code)` / `to_syslog_facility_code(name)` — the
  * RFC 3164 facility table under VRL's OWN keyword spellings (vrl
  * stdlib to_syslog_facility: 13 "security", 14 "console",
  * 15 "solaris-cron" — NOT the syslog_loose names parse_syslog uses).
  * Fallible: an out-of-range code / unknown keyword throws, which
  * `??` / `, err =` catch. */
object VrlSyslogFacility {
  private[functions] val Names = IndexedSeq(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7")
  def name(code: Long): UTF8String = {
    require(code >= 0 && code <= 23,
      s"to_syslog_facility: code must be 0-23, got $code")
    UTF8String.fromString(Names(code.toInt))
  }
  def code(name: UTF8String): Long = {
    val i = Names.indexOf(name.toString.toLowerCase(java.util.Locale.ROOT))
    require(i >= 0, s"to_syslog_facility_code: unknown facility `$name`")
    i.toLong
  }
}
case class VrlSyslogFacilityKernel(child: Expression, toName: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = if (toName) StringType else LongType
  override protected def nullSafeEval(v: Any): Any =
    if (toName) VrlSyslogFacility.name(v.asInstanceOf[Number].longValue())
    else VrlSyslogFacility.code(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (toName) nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlSyslogFacility.name((long) $v);")
    else nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlSyslogFacility.code($v);")
  override protected def withNewChildInternal(newChild: Expression): VrlSyslogFacilityKernel =
    copy(child = newChild)
}

/** `object_from_array(entries)` / `object_from_array(values, keys)` —
  * VRL's map builder. The 1-arg form takes an array of [key, value]
  * pairs (zip's output shape); the 2-arg form pairs values[i] with
  * keys[i], truncating to the shorter array (Rust zip semantics, which
  * the VRL implementation iterates with). Later duplicate keys WIN,
  * VRL's object insert order — Spark's map_from_entries would throw,
  * hence the kernel. */
private[functions] object VrlObjectBuild {
  /** materialize an insert-ordered key→value accumulation as MapData */
  def toMapData(m: java.util.LinkedHashMap[UTF8String, Any]):
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData = {
    val ks = new Array[Any](m.size)
    val vs = new Array[Any](m.size)
    var j = 0
    m.forEach { (k, value) => ks(j) = k; vs(j) = value; j += 1 }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(ks, vs)
  }
}

case class VrlObjectFromPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType match {
    case ArrayType(ArrayType(et, _), _) => MapType(StringType, et)
    case other => throw new IllegalArgumentException(
      s"object_from_array: need an array of [key, value] pairs, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val entries = v.asInstanceOf[ArrayData]
    val inner = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType].elementType
    val m = new java.util.LinkedHashMap[UTF8String, Any]()
    var i = 0
    while (i < entries.numElements()) {
      val pair = entries.get(i, ArrayType(inner)).asInstanceOf[ArrayData]
      require(pair != null && pair.numElements() == 2,
        "object_from_array: every entry must be a [key, value] pair")
      val k = pair.get(0, inner)
      require(k != null, "object_from_array: keys must be non-null")
      val ks = UTF8String.fromString(k.toString)
      m.remove(ks) // re-insert so a later duplicate takes the later position
      m.put(ks, pair.get(1, inner))
      i += 1
    }
    VrlObjectBuild.toMapData(m)
  }
  override protected def withNewChildInternal(newChild: Expression): VrlObjectFromPairs =
    copy(child = newChild)
}

case class VrlObjectFromKv(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  // left = values, right = keys (VRL argument order)
  override def dataType: DataType = left.dataType match {
    case ArrayType(et, _) => MapType(StringType, et)
    case other => throw new IllegalArgumentException(
      s"object_from_array: values must be an array, got ${other.sql}")
  }
  override protected def nullSafeEval(values: Any, keys: Any): Any = {
    val va = values.asInstanceOf[ArrayData]
    val ka = keys.asInstanceOf[ArrayData]
    val vt = left.dataType.asInstanceOf[ArrayType].elementType
    val kt = right.dataType.asInstanceOf[ArrayType].elementType
    val n = math.min(va.numElements(), ka.numElements())
    val m = new java.util.LinkedHashMap[UTF8String, Any]()
    var i = 0
    while (i < n) {
      val k = ka.get(i, kt)
      require(k != null, "object_from_array: keys must be non-null")
      val ks = UTF8String.fromString(k.toString)
      m.remove(ks)
      m.put(ks, va.get(i, vt))
      i += 1
    }
    VrlObjectBuild.toMapData(m)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VrlObjectFromKv = copy(left = l, right = r)
}

/** shared JSON string-escape for the to-JSON transcription kernels
  * (ruby hash / influx line protocol / CBOR) — one place to extend the
  * escape set. */
private[functions] object JsonEscape {
  def str(raw: String, out: java.lang.StringBuilder): Unit = {
    out.append('"')
    raw.foreach {
      case '"' => out.append("\\\"")
      case '\\' => out.append("\\\\")
      case '\n' => out.append("\\n")
      case '\r' => out.append("\\r")
      case '\t' => out.append("\\t")
      case c if c < 0x20 => out.append(f"\\u${c.toInt}%04x")
      case c => out.append(c)
    }
    out.append('"')
    ()
  }
}

/** base64 with VRL's options: `padding:` (encode only) and `charset:`
  * ("standard" | "url_safe"). The optionless forms stay on Spark's own
  * codegen'd Base64/UnBase64 — this kernel is built only when an option
  * is present (validated at build). Decode is lenient about absent
  * padding, like the Rust base64 crate VRL rides. */
case class VrlBase64(child: Expression, urlSafe: Boolean, padding: Boolean,
    encode: Boolean) extends UnaryExpression {
  // both directions surface as STRING: VRL's decoded bytes ARE its
  // strings (same contract as decode_gzip & co.)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    if (encode) VrlBase64.enc(v.asInstanceOf[Array[Byte]], urlSafe, padding)
    else VrlBase64.dec(v.asInstanceOf[UTF8String], urlSafe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      if (encode)
        s"${ev.value} = graft.functions.VrlBase64.enc($v, $urlSafe, $padding);"
      else s"${ev.value} = graft.functions.VrlBase64.dec($v, $urlSafe);")
  override protected def withNewChildInternal(newChild: Expression): VrlBase64 =
    copy(child = newChild)
}
object VrlBase64 {
  def enc(v: Array[Byte], urlSafe: Boolean, padding: Boolean): UTF8String = {
    var e = if (urlSafe) java.util.Base64.getUrlEncoder else java.util.Base64.getEncoder
    if (!padding) e = e.withoutPadding()
    UTF8String.fromString(e.encodeToString(v))
  }
  def dec(v: UTF8String, urlSafe: Boolean): UTF8String = {
    val d = if (urlSafe) java.util.Base64.getUrlDecoder else java.util.Base64.getDecoder
    UTF8String.fromBytes(d.decode(v.toString))
  }
}

/** `random_bytes(length)` — cryptographically random bytes
  * (SecureRandom-seeded per-partition RNG like uuid_v7), BinaryType so
  * it composes with encode_base64/encode_base16. VRL's 64 KiB cap is
  * enforced per call (fallible). */
case class VrlRandomBytes(child: Expression) extends UnaryExpression
    with Nondeterministic with CodegenFallback {
  override def dataType: DataType = BinaryType
  @transient private var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.security.SecureRandom()
  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val n = v.asInstanceOf[Number].intValue()
    require(n >= 0 && n <= 65536,
      s"random_bytes: length must be 0-65536, got $n")
    val out = new Array[Byte](n)
    rng.nextBytes(out)
    out
  }
  override protected def withNewChildInternal(newChild: Expression): VrlRandomBytes =
    copy(child = newChild)
}

/** `compact(value)` — VRL's defaults drop null, empty-string, empty-
  * array and empty-object entries, RECURSING into nested containers
  * (recursive/string/object/array/null all true). The dispatch mirrors
  * that structurally: the schema states the nesting, so recursion is a
  * type-driven composition of transform/filter (arrays) and
  * transform_values/map_filter (maps) — all codegen. Struct fields are
  * schema, not rows — rejected with the note. The per-kind off-switch
  * options are not supported (arity error at build). */
case class VrlCompact(child: Expression)
    extends Expression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => VrlCompact.compacted(child, child.dataType)
    case other => throw new IllegalArgumentException(
      s"compact() takes an array or map, got ${other.simpleString} — " +
        "struct fields are schema, which cannot be dropped per row")
  }
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
object VrlCompact {
  /** keep-predicate for one value of type `dt`: non-null, and non-empty
    * when the type carries a VRL emptiness (string/array/map) */
  private def keep(x: Expression, dt: DataType): Expression = dt match {
    case StringType => And(IsNotNull(x), Not(EqualTo(x, Literal(""))))
    case _: ArrayType | _: MapType =>
      And(IsNotNull(x), GreaterThan(Size(x, legacySizeOfNull = false), Literal(0)))
    case _ => IsNotNull(x)
  }
  /** recursively compact a value of type `dt` (containers compact their
    * contents first, so an array that BECOMES empty is then dropped by
    * the enclosing keep) */
  private[functions] def compacted(e: Expression, dt: DataType): Expression = dt match {
    case ArrayType(et, _) =>
      val inner = compactedInner(et, "__ca")
      val filtered = inner match {
        case Some((x, body)) => ArrayTransform(e, LambdaFunction(body, Seq(x)))
        case None => e
      }
      val f = NamedLambdaVariable("__cf", et, nullable = true)
      ArrayFilter(filtered, LambdaFunction(keep(f, et), Seq(f)))
    case MapType(kt, vt, _) =>
      val inner = compactedInner(vt, "__cm")
      val transformed = inner match {
        case Some((x, body)) =>
          val k0 = NamedLambdaVariable("__ck0", kt, nullable = false)
          TransformValues(e, LambdaFunction(body, Seq(k0, x)))
        case None => e
      }
      val k = NamedLambdaVariable("__ck", kt, nullable = false)
      val v = NamedLambdaVariable("__cv", vt, nullable = true)
      MapFilter(transformed, LambdaFunction(keep(v, vt), Seq(k, v)))
    case _ => e
  }
  /** lambda (variable, body) recursively compacting one ELEMENT of type
    * `et`, or None when the element type has nothing nested to compact */
  private def compactedInner(et: DataType,
      prefix: String): Option[(NamedLambdaVariable, Expression)] = et match {
    case _: ArrayType | _: MapType =>
      val x = NamedLambdaVariable(prefix, et, nullable = true)
      Some((x, compacted(x, et)))
    case _ => None
  }
}

/** `parse_influxdb_line_protocol(value)` — the InfluxDB text wire
  * format (public spec: measurement[,tag=v…] field=v[,…] [timestamp]),
  * one object per line, field values typed (float default, `i` int,
  * `u` uint, quoted string, boolean). Mixed-type field OBJECTS ride the
  * VARIANT path like parse_json: this kernel transcribes to JSON text
  * and the registration wraps it in ParseJson. Malformed lines throw
  * (VRL's fallible form). */
case class VrlInfluxToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    VrlInfluxToJson.toJson(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlInfluxToJson.toJson($v);")
  override protected def withNewChildInternal(newChild: Expression): VrlInfluxToJson =
    copy(child = newChild)
}
object VrlInfluxToJson {
  def toJson(v: UTF8String): UTF8String = {
    val out = new java.lang.StringBuilder("[")
    var first = true
    v.toString.split("\n").foreach { line0 =>
      val line = line0.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        if (!first) out.append(',')
        first = false
        lineToJson(line, out)
      }
    }
    out.append(']')
    UTF8String.fromString(out.toString)
  }

  private def fail(line: String, msg: String) = throw new IllegalArgumentException(
    s"parse_influxdb_line_protocol: $msg in `$line`")

  /** next unescaped occurrence of any stop char from `i`; -1 if none */
  private def scan(s: String, from: Int, stops: String): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) i += 2
      else if (stops.indexOf(s.charAt(i)) >= 0) return i
      else i += 1
    }
    -1
  }
  private def unescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length &&
        ",= \"\\".indexOf(s.charAt(i + 1)) >= 0) {
        sb.append(s.charAt(i + 1)); i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
  private def jsonStr(raw: String, out: java.lang.StringBuilder): Unit =
    JsonEscape.str(raw, out)

  private def lineToJson(line: String, out: java.lang.StringBuilder): Unit = {
    // measurement ends at the first unescaped ',' (tags follow) or ' '
    val mEnd = scan(line, 0, ", ")
    if (mEnd <= 0) fail(line, "missing fields section")
    out.append("{\"measurement\":")
    jsonStr(unescape(line.substring(0, mEnd)), out)
    var i = mEnd
    // duplicate tag/field names: LAST occurrence wins (matching VRL) —
    // verbatim transcription would emit duplicate JSON keys, which
    // Spark's parse_json (allowDuplicateKeys=false) rejects
    val tags = new java.util.LinkedHashMap[String, String]()
    while (i < line.length && line.charAt(i) == ',') {
      val kEnd = scan(line, i + 1, "=")
      if (kEnd < 0) fail(line, "tag without `=`")
      val vEnd = scan(line, kEnd + 1, ", ") match {
        case -1 => fail(line, "missing fields section")
        case e => e
      }
      tags.put(unescape(line.substring(i + 1, kEnd)),
        unescape(line.substring(kEnd + 1, vEnd)))
      i = vEnd
    }
    out.append(",\"tags\":{")
    val tagIt = tags.entrySet().iterator()
    var firstTag = true
    while (tagIt.hasNext) {
      val e = tagIt.next()
      if (!firstTag) out.append(',')
      firstTag = false
      jsonStr(e.getKey, out)
      out.append(':')
      jsonStr(e.getValue, out)
    }
    out.append("},\"fields\":{")
    if (i >= line.length || line.charAt(i) != ' ') fail(line, "missing fields section")
    while (i < line.length && line.charAt(i) == ' ') i += 1
    val fieldsM = new java.util.LinkedHashMap[String, String]()
    var done = false
    while (!done) {
      val kEnd = scan(line, i, "=")
      if (kEnd < 0) fail(line, "field without `=`")
      val fName = unescape(line.substring(i, kEnd))
      val vb = new java.lang.StringBuilder
      i = kEnd + 1
      if (i < line.length && line.charAt(i) == '"') {
        // quoted string value: \" and \\ escapes
        val sb = new java.lang.StringBuilder
        i += 1
        var closed = false
        while (i < line.length && !closed) {
          val c = line.charAt(i)
          if (c == '\\' && i + 1 < line.length) { sb.append(line.charAt(i + 1)); i += 2 }
          else if (c == '"') { closed = true; i += 1 }
          else { sb.append(c); i += 1 }
        }
        if (!closed) fail(line, "unclosed string field value")
        jsonStr(sb.toString, vb)
      } else {
        val vEnd = scan(line, i, ", ") match {
          case -1 => line.length
          case e => e
        }
        val raw = line.substring(i, vEnd)
        i = vEnd
        if (raw.isEmpty) fail(line, "empty field value")
        val lower = raw.toLowerCase(java.util.Locale.ROOT)
        if (raw.endsWith("i") || raw.endsWith("u")) {
          val body = raw.substring(0, raw.length - 1)
          if (!body.matches("[+-]?[0-9]+")) fail(line, s"bad integer field `$raw`")
          vb.append(body)
        } else if (lower == "t" || lower == "true") vb.append("true")
        else if (lower == "f" || lower == "false") vb.append("false")
        else if (raw.matches("[+-]?([0-9]+(\\.[0-9]+)?|\\.[0-9]+)([eE][+-]?[0-9]+)?"))
          vb.append(if (raw.startsWith("+")) raw.substring(1) else raw)
        else fail(line, s"bad field value `$raw`")
      }
      fieldsM.put(fName, vb.toString)
      if (i < line.length && line.charAt(i) == ',') i += 1
      else done = true
    }
    val fIt = fieldsM.entrySet().iterator()
    var firstField = true
    while (fIt.hasNext) {
      val e = fIt.next()
      if (!firstField) out.append(',')
      firstField = false
      jsonStr(e.getKey, out)
      out.append(':').append(e.getValue)
    }
    out.append('}')
    // optional trailing timestamp
    while (i < line.length && line.charAt(i) == ' ') i += 1
    if (i < line.length) {
      val ts = line.substring(i).trim
      if (!ts.matches("[+-]?[0-9]+")) fail(line, s"bad timestamp `$ts`")
      out.append(",\"timestamp\":").append(ts)
    }
    out.append('}')
    ()
  }
}

/** `parse_cbor(value)` — RFC 8949 CBOR decode over a binary column,
  * riding the VARIANT path (schemaless nesting like parse_json): this
  * kernel transcribes the item tree to JSON text and the registration
  * wraps it in ParseJson. Covers all major types incl. indefinite
  * lengths, half/single/double floats, and tags (unwrapped). Byte
  * strings surface as lossy UTF-8 text (VRL's bytes ARE its strings).
  * Malformed input throws (fallible). */
case class VrlCborToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    VrlCborToJson.toJson(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlCborToJson.toJson($v);")
  override protected def withNewChildInternal(newChild: Expression): VrlCborToJson =
    copy(child = newChild)
}
object VrlCborToJson {
  def toJson(bytes: Array[Byte]): UTF8String = {
    val d = new Decoder(bytes)
    val out = new java.lang.StringBuilder
    d.item(out)
    require(d.pos == bytes.length,
      s"parse_cbor: ${bytes.length - d.pos} trailing bytes after the item")
    UTF8String.fromString(out.toString)
  }

  private final class Decoder(b: Array[Byte]) {
    var pos = 0
    // bounded recursion: a few KB of repeated 0x81/0x9f headers would
    // otherwise StackOverflowError — an Error that escapes the fallible
    // (??) handling and kills the batch. Past the cap we throw the same
    // IllegalArgumentException every other malformed input throws.
    private var depth = 0
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"parse_cbor: $msg at offset $pos")
    private def u8(): Int = {
      if (pos >= b.length) fail("truncated input")
      val v = b(pos) & 0xff; pos += 1; v
    }
    private def uN(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    /** argument for additional-info `info` (majors 0-6); -1 = indefinite */
    private def arg(info: Int): Long = info match {
      case 24 => uN(1)
      case 25 => uN(2)
      case 26 => uN(4)
      case 27 => uN(8)
      case 28 | 29 | 30 => fail(s"reserved additional info $info")
      case 31 => -1L
      case n => n.toLong
    }
    private def atBreak: Boolean =
      pos < b.length && (b(pos) & 0xff) == 0xff
    private def checkLen(n: Long): Int = {
      if (n < 0 || n > b.length - pos) fail(s"length $n exceeds remaining input")
      n.toInt
    }
    private def strBytes(major: Int, info: Int): Array[Byte] = {
      val a = arg(info)
      if (a >= 0) {
        val n = checkLen(a)
        val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
        pos += n
        out
      } else {
        // indefinite: definite-length chunks of the SAME major until break
        val buf = new java.io.ByteArrayOutputStream()
        var done = false
        while (!done) {
          if (atBreak) { pos += 1; done = true }
          else {
            val ib = u8()
            if ((ib >> 5) != major || (ib & 0x1f) == 31)
              fail("bad indefinite string chunk")
            val n = checkLen(arg(ib & 0x1f))
            buf.write(b, pos, n)
            pos += n
          }
        }
        buf.toByteArray
      }
    }
    private def jsonStr(raw: String, out: java.lang.StringBuilder): Unit =
      JsonEscape.str(raw, out)
    private def half(bits: Int): Double = {
      val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
      val exp = (bits >> 10) & 0x1f
      val frac = bits & 0x3ff
      if (exp == 0) sign * frac * math.pow(2, -24)
      else if (exp == 31) { if (frac == 0) sign * Double.PositiveInfinity else Double.NaN }
      else sign * (1024 + frac) * math.pow(2, exp - 25)
    }
    private def num(d: Double, out: java.lang.StringBuilder): Unit = {
      // JSON has no NaN/Inf — VRL surfaces them as null
      if (d.isNaN || d.isInfinite) out.append("null")
      else if (d == math.rint(d) && math.abs(d) < 1e15)
        out.append(d.toLong).append(".0")
      else out.append(d)
      ()
    }
    def item(out: java.lang.StringBuilder): Unit = {
      depth += 1
      if (depth > 1000) fail("nesting deeper than 1000 levels")
      val ib = u8()
      val major = ib >> 5
      val info = ib & 0x1f
      major match {
        case 0 =>
          val a = arg(info)
          if (a == -1L && info == 31) fail("indefinite integer")
          out.append(java.lang.Long.toUnsignedString(a))
        case 1 =>
          val a = arg(info)
          if (a == -1L && info == 31) fail("indefinite integer")
          // -1 - a, exact even past i64 via unsigned BigInteger
          out.append(java.math.BigInteger.valueOf(-1).subtract(
            new java.math.BigInteger(java.lang.Long.toUnsignedString(a))).toString)
        case 2 | 3 => jsonStr(new String(strBytes(major, info),
          java.nio.charset.StandardCharsets.UTF_8), out)
        case 4 =>
          val a = arg(info)
          out.append('[')
          var first = true
          if (a >= 0) {
            var i = 0L
            while (i < a) {
              if (!first) out.append(',')
              first = false
              item(out)
              i += 1
            }
          } else {
            var done = false
            while (!done) {
              if (atBreak) { pos += 1; done = true }
              else {
                if (!first) out.append(',')
                first = false
                item(out)
              }
            }
          }
          out.append(']')
        case 5 =>
          val a = arg(info)
          // duplicate map keys: LAST occurrence wins (VRL's take) —
          // transcribed verbatim they would become duplicate JSON keys,
          // which Spark's parse_json (allowDuplicateKeys=false) rejects
          val entries = new java.util.LinkedHashMap[String, String]()
          def entry(): Unit = {
            // keys: text/byte strings verbatim; anything else transcribed
            // then string-quoted (JSON keys must be strings)
            if (pos >= b.length) fail("truncated map key")
            val kMajor = (b(pos) & 0xff) >> 5
            val kOut = new java.lang.StringBuilder
            if (kMajor == 2 || kMajor == 3) item(kOut)
            else {
              val tmp = new java.lang.StringBuilder
              item(tmp)
              jsonStr(tmp.toString, kOut)
            }
            val vOut = new java.lang.StringBuilder
            item(vOut)
            entries.put(kOut.toString, vOut.toString)
            ()
          }
          if (a >= 0) {
            var i = 0L
            while (i < a) { entry(); i += 1 }
          } else {
            var done = false
            while (!done) {
              if (atBreak) { pos += 1; done = true }
              else entry()
            }
          }
          out.append('{')
          val it = entries.entrySet().iterator()
          var first = true
          while (it.hasNext) {
            val e = it.next()
            if (!first) out.append(',')
            first = false
            out.append(e.getKey).append(':').append(e.getValue)
          }
          out.append('}')
        case 6 =>
          arg(info) // the tag number — unwrapped: the tagged item speaks
          item(out)
        case 7 => info match {
          case 20 => out.append("false")
          case 21 => out.append("true")
          case 22 | 23 => out.append("null") // null / undefined
          case 25 => num(half(uN(2).toInt), out)
          case 26 => num(java.lang.Float.intBitsToFloat(uN(4).toInt).toDouble, out)
          case 27 => num(java.lang.Double.longBitsToDouble(uN(8)), out)
          case 24 => out.append(uN(1)) // simple value 32-255: its number
          case 31 => fail("unexpected break")
          case n => out.append(n) // simple value 0-19: its number
        }
        case _ => fail(s"unknown major type $major")
      }
      depth -= 1
      ()
    }
  }
}
