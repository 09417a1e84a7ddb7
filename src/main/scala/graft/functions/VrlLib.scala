package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VRL stdlib shims that need more than a name alias (processor/vrl.rs —
  * the reference embeds the full VRL runtime; the remap processor maps
  * its stdlib onto Spark's codegen'd functions and fills the gaps here).
  * Both are RuntimeReplaceable COMPOSITIONS of Spark's own expressions —
  * the optimizer swaps in the replacement before codegen, so nothing
  * here adds an interpreted call to the hot path.
  */
object VrlLib {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vrl_length", { exprs =>
        require(exprs.size == 1, "length(value) takes 1 argument")
        VrlLength(exprs.head)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vrl_strptime", { exprs =>
        require(exprs.size == 2,
          "parse_timestamp(value, format) takes 2 arguments")
        VrlStrptime(exprs.head, exprs(1))
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vrl_parse_url", { exprs =>
        // VRL's 1-arg parse_url(u) → the full parts struct; a 2-arg call
        // falls through to Spark's own parse_url(u, part) untouched
        if (exprs.size == 2) new ParseUrl(exprs.toSeq)
        else {
          require(exprs.size == 1, "parse_url(url) takes 1 argument")
          VrlLib.parseUrlStruct(exprs.head)
        }
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vrl_parse_regex", { exprs =>
        require(exprs.size == 2, "parse_regex(value, pattern) takes 2 arguments")
        VrlLib.parseRegexStruct(exprs.head, exprs(1))
      }, "scala_udf")
  }

  /** VRL `parse_url(url)` → `struct<scheme, username, password, host,
    * port, path, query: map<string,string>, fragment>` (vrl stdlib
    * parse_url's object shape), composed from Spark's codegen'd ParseUrl
    * part extraction + str_to_map for the query object. An unparseable
    * URL yields null parts (VRL errors instead — with `, err =` the
    * value side is null either way, the err message is not populated;
    * documented divergence). */
  private[functions] def parseUrlStruct(u: Expression): Expression = {
    def part(p: String) = new ParseUrl(Seq(u, Literal(p)))
    val userinfo = part("USERINFO")
    val nullStr = Literal.create(null, StringType)
    CreateNamedStruct(Seq(
      Literal("scheme"), part("PROTOCOL"),
      Literal("username"), SubstringIndex(userinfo, Literal(":"), Literal(1)),
      Literal("password"),
      If(Contains(userinfo, Literal(":")),
        SubstringIndex(userinfo, Literal(":"), Literal(-1)), nullStr),
      Literal("host"), part("HOST"),
      // '' casts to null int under the engine's non-ANSI sessions — a
      // portless authority yields port = null like VRL
      Literal("port"),
      Cast(RegExpExtract(part("AUTHORITY"), Literal(":([0-9]+)$"), Literal(1)),
        IntegerType),
      Literal("path"), part("PATH"),
      Literal("query"),
      new StringToMap(part("QUERY"), Literal("&"), Literal("=")),
      Literal("fragment"), part("REF")))
  }

  /** VRL `parse_regex(value, r'(?P<name>…)')` → struct of the named
    * captures. The pattern must be a literal (it always is — VRL regex
    * literals are compile-time); `(?P<` (Rust/VRL spelling) translates to
    * Java's `(?<`, group INDICES are computed here once, and each field
    * becomes a codegen'd regexp_extract. A non-matching row yields a
    * null struct (VRL errors; same `, err =` caveat as parse_url). */
  private[functions] def parseRegexStruct(v: Expression, patE: Expression): Expression = {
    val pat = patE match {
      case Literal(s: UTF8String, StringType) => s.toString
      case _ => throw new IllegalArgumentException(
        "parse_regex: the pattern argument must be a (raw) string literal")
    }
    val javaPat = pat.replace("(?P<", "(?<")
    val groups = namedGroups(javaPat)
    require(groups.nonEmpty,
      s"parse_regex: pattern has no named capture groups: `$pat`")
    val struct = CreateNamedStruct(groups.flatMap { case (name, idx) =>
      Seq(Literal(name), RegExpExtract(v, Literal(javaPat), Literal(idx)))
    })
    If(RLike(v, Literal(javaPat)), struct, Literal.create(null, struct.dataType))
  }

  /** (name, 1-based group index) for each NAMED capturing group, indexed
    * among ALL capturing groups — escape- and character-class-aware. */
  private[functions] def namedGroups(p: String): Seq[(String, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var i = 0
    var idx = 0
    var inClass = false
    while (i < p.length) {
      p.charAt(i) match {
        case '\\' => i += 1 // skip the escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (i + 1 < p.length && p.charAt(i + 1) == '?') {
            // named group (?<name>…), NOT lookbehind (?<= / (?<!
            if (i + 3 < p.length && p.charAt(i + 2) == '<' &&
                p.charAt(i + 3) != '=' && p.charAt(i + 3) != '!') {
              idx += 1
              val end = p.indexOf('>', i + 3)
              require(end > 0, s"parse_regex: unclosed group name in `$p`")
              out += ((p.substring(i + 3, end), idx))
              i = end
            } // else non-capturing / lookaround: no index
          } else idx += 1 // plain capturing group
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }
}

/** VRL `length(value)` is polymorphic — array → element count, map →
  * entry count, string → UTF-8 BYTE count (VRL's documented semantics;
  * its `strlen` is the character count, which the remap processor
  * aliases to Spark's `char_length`). Spark's `length`/`size` are each
  * monomorphic, so this dispatches on the resolved child type. */
case class VrlLength(child: Expression)
    extends Expression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case BinaryType => Length(child)
    case StringType => OctetLength(child)
    case other => throw new IllegalArgumentException(
      s"length() takes a string, array or map, got ${other.simpleString(10)}")
  }
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** VRL `parse_timestamp(value, format)` takes a strftime-style format
  * (`%Y-%m-%dT%H:%M:%S%z` — chrono's dialect, vrl stdlib
  * parse_timestamp); Spark's `to_timestamp` takes a Java DateTimeFormatter
  * pattern. The format must be a literal (it is in every VRL program —
  * the language has no dynamic format strings reaching this call in
  * practice); it is translated ONCE at analysis and the whole call
  * replaced by Spark's own ParseToTimestamp, so parsing stays codegen'd.
  * Unsupported specifiers fail analysis loudly with the supported list.
  */
case class VrlStrptime(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable {
  override lazy val replacement: Expression = right match {
    case Literal(fmt: UTF8String, StringType) =>
      // timezone set here, not by the analyzer's ResolveTimeZone — a
      // lazily-built replacement is constructed after that rule ran
      ParseToTimestamp(left, Some(Literal(VrlStrptime.translate(fmt.toString))),
        TimestampType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone), false)
    case _ => throw new IllegalArgumentException(
      "parse_timestamp: the format argument must be a string literal")
  }
  override def children: Seq[Expression] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object VrlStrptime {
  // strftime → DateTimeFormatter, the chrono specifiers VRL programs use.
  // %s (epoch seconds) has no Java pattern letter — callers should use
  // to_timestamp(to_int(x)) instead; rejected below with the others.
  private val Specifiers = Map(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd", "%e" -> "d",
    "%H" -> "HH", "%I" -> "hh", "%M" -> "mm", "%S" -> "ss", "%p" -> "a",
    "%b" -> "MMM", "%B" -> "MMMM", "%a" -> "EEE", "%A" -> "EEEE",
    "%j" -> "DDD", "%z" -> "xx", "%:z" -> "xxx", "%Z" -> "zzz",
    "%3f" -> "SSS", "%6f" -> "SSSSSS", "%9f" -> "SSSSSSSSS",
    "%F" -> "yyyy-MM-dd", "%T" -> "HH:mm:ss", "%R" -> "HH:mm",
    "%D" -> "MM/dd/yy", "%%" -> "'%'")

  /** Literal text (anything outside a % specifier) is single-quoted when
    * it contains letters — Java patterns treat bare letters as pattern
    * fields — and embedded quotes double. */
  def translate(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%') {
        val spec = Seq(3, 2).map(n => fmt.slice(i, i + n)).find(Specifiers.contains)
        spec match {
          case Some(s) => out ++= Specifiers(s); i += s.length
          case None => throw new IllegalArgumentException(
            s"parse_timestamp: unsupported strftime specifier at `${fmt.drop(i).take(3)}`; " +
              s"supported: ${Specifiers.keys.toSeq.sorted.mkString(" ")}")
        }
      } else {
        val start = i
        while (i < fmt.length && fmt.charAt(i) != '%') i += 1
        val lit = fmt.substring(start, i)
        if (lit.exists(c => c.isLetter || c == '\''))
          out ++= "'" + lit.replace("'", "''") + "'"
        else out ++= lit
      }
    }
    out.toString
  }
}
