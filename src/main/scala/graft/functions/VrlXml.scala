package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VRL `parse_xml` (reference: processor/vrl.rs delegates to the embedded
  * VRL runtime; vrl stdlib parse_xml docs define the conversion): XML text
  * becomes a schemaless object. Like `parse_json`, the result is a Spark 4
  * VARIANT — this kernel converts XML to the equivalent JSON text and the
  * registration site wraps it in Spark's own codegen'd `ParseJson`, so the
  * schemaless-nesting problem is solved by the same VARIANT path.
  *
  * Conversion rules (VRL defaults: trim=true, include_attr=true,
  * attr_prefix="@", text_key="text", always_use_text_key=false,
  * parse_bool=true, parse_null=true, parse_number=true):
  *   - the root element's name is the single key of the top-level object
  *   - attributes become "@name" keys (string values, never re-typed)
  *   - repeated sibling elements with one name collapse into an array
  *   - an element with only text becomes a typed scalar (bool/null/number
  *     when the trimmed text matches, else string); with attributes or
  *     child elements too, the text lands under the "text" key
  *   - an element with no attributes, children, or text becomes {}
  *
  * Malformed XML throws (VRL's fallible form) so `??` / `, err =` catch
  * it. DTDs and external entities are disabled outright — a parse kernel
  * running on untrusted 100 TB input must not be an XXE vector.
  */
case class VrlXmlToJson(child: Expression,
    opts: VrlXmlToJson.Opts = VrlXmlToJson.Opts()) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    VrlXmlToJson.toJson(v.asInstanceOf[UTF8String], opts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val o = ctx.addReferenceObj("opts", opts, "graft.functions.VrlXmlToJson.Opts")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlXmlToJson.toJson($v, $o);")
  }

  override protected def withNewChildInternal(newChild: Expression): VrlXmlToJson =
    copy(child = newChild)
}

object VrlXmlToJson {
  /** vrl-stdlib parse_xml options, defaults per its docs. Built from the
    * canonical `k=v;…` literal the compiler's label-aware rewrite packs
    * (named-option SUBSETS are the norm for this function, so the
    * generic strip-labels-keep-positions pass would misbind them). */
  case class Opts(trim: Boolean = true, includeAttr: Boolean = true,
      attrPrefix: String = "@", textKey: String = "text",
      alwaysUseTextKey: Boolean = false, parseBool: Boolean = true,
      parseNull: Boolean = true, parseNumber: Boolean = true)

  def parseOpts(spec: String): Opts =
    spec.split(';').filter(_.nonEmpty).foldLeft(Opts()) { (o, kv) =>
      val Array(k, v) = kv.split("=", 2)
      k match {
        case "trim" => o.copy(trim = v.toBoolean)
        case "include_attr" => o.copy(includeAttr = v.toBoolean)
        case "attr_prefix" => o.copy(attrPrefix = v)
        case "text_key" => o.copy(textKey = v)
        case "always_use_text_key" => o.copy(alwaysUseTextKey = v.toBoolean)
        case "parse_bool" => o.copy(parseBool = v.toBoolean)
        case "parse_null" => o.copy(parseNull = v.toBoolean)
        case "parse_number" => o.copy(parseNumber = v.toBoolean)
        case other => throw new IllegalArgumentException(
          s"parse_xml: unknown option `$other`")
      }
    }
  import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

  /** StAX factories are not thread-safe; one per executor task thread.
    * Coalescing merges CDATA into text; DTD + external entities off. */
  private val factory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f
    }
  }

  /** In-flight element frame: attribute pairs, child-name → values
    * (insertion-ordered, multi-valued), accumulated text. */
  private final class Frame {
    val attrs = new scala.collection.mutable.ArrayBuffer[(String, String)](2)
    val kids = new java.util.LinkedHashMap[String, java.util.ArrayList[Object]]()
    val text = new java.lang.StringBuilder
  }

  def toJson(value: UTF8String): UTF8String = toJson(value, Opts())

  def toJson(value: UTF8String, opts: Opts): UTF8String = {
    val reader: XMLStreamReader =
      factory.get().createXMLStreamReader(new java.io.StringReader(value.toString))
    try {
      val out = new java.lang.StringBuilder(value.numBytes() + 16)
      var stack = List.empty[(String, Frame)]
      var rootName: String = null
      var rootValue: Object = null
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val f = new Frame
            var i = 0
            while (i < reader.getAttributeCount) {
              f.attrs += ((reader.getAttributeLocalName(i), reader.getAttributeValue(i)))
              i += 1
            }
            stack = (reader.getLocalName, f) :: stack
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            // trim=false keeps whitespace-only text nodes (VRL's option)
            if (stack.nonEmpty && (!opts.trim || !reader.isWhiteSpace))
              stack.head._2.text.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            val (name, f) = stack.head
            stack = stack.tail
            val v = materialize(f, opts)
            stack match {
              case (_, parent) :: _ =>
                parent.kids.computeIfAbsent(name, _ => new java.util.ArrayList[Object]())
                  .add(v)
              case Nil => rootName = name; rootValue = v
            }
          case _ => ()
        }
      }
      out.append('{')
      writeString(out, rootName)
      out.append(':')
      writeValue(out, rootValue)
      out.append('}')
      UTF8String.fromString(out.toString)
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        throw new IllegalArgumentException(
          s"parse_xml: malformed XML (${e.getMessage})")
    } finally reader.close()
  }

  /** Closed frame → value: scalar for text-only leaves, {} for empty
    * leaves, LinkedHashMap(@attrs ++ children ++ text-key) otherwise. */
  private def materialize(f: Frame, opts: Opts): Object = {
    val text = if (opts.trim) f.text.toString.trim else f.text.toString
    val attrs = if (opts.includeAttr) f.attrs else f.attrs.take(0)
    if (attrs.isEmpty && f.kids.isEmpty && !opts.alwaysUseTextKey) {
      if (text.isEmpty) new java.util.LinkedHashMap[String, Object]()
      else typedScalar(text, opts)
    } else {
      val m = new java.util.LinkedHashMap[String, Object]()
      attrs.foreach { case (k, v) => m.put(opts.attrPrefix + k, v) }
      f.kids.forEach { (k, vs) =>
        m.put(k, if (vs.size == 1) vs.get(0) else vs)
      }
      if (text.nonEmpty) m.put(opts.textKey, typedScalar(text, opts))
      m
    }
  }

  /** parse_bool / parse_null / parse_number over trimmed element text.
    * Numbers must round-trip (a Long, or a finite Double written in a
    * form Double.parseDouble accepts) — anything else stays a string.
    * Deliberate number-format boundary (vs VRL's roxmltree-based
    * parse_xml): a LEADING-ZERO digit string ("007") re-types to the
    * number 7 — the textual form is not preserved; a digit string too
    * long for a Long (> 19 digits) stays TEXT rather than losing
    * precision through a double; non-finite double forms stay text.
    * Pinned by the round-14 StreamingSpec case. */
  private def typedScalar(text: String, opts: Opts): Object = text match {
    case "true" | "false" if opts.parseBool =>
      java.lang.Boolean.valueOf(text)
    case "null" if opts.parseNull => null
    case _ =>
      if (!opts.parseNumber) text
      else if (IntRe.matches(text))
        try java.lang.Long.valueOf(text) catch { case _: NumberFormatException => text }
      else if (NumRe.matches(text)) {
        val d = java.lang.Double.parseDouble(text)
        if (java.lang.Double.isFinite(d)) java.lang.Double.valueOf(d) else text
      } else text
  }

  private val IntRe = "-?[0-9]+".r
  private val NumRe = "-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?".r

  private def writeValue(out: java.lang.StringBuilder, v: Object): Unit = v match {
    case null => out.append("null")
    case s: String => writeString(out, s)
    case m: java.util.LinkedHashMap[_, _] =>
      out.append('{')
      var first = true
      m.forEach { (k, mv) =>
        if (!first) out.append(',')
        first = false
        writeString(out, k.asInstanceOf[String])
        out.append(':')
        writeValue(out, mv.asInstanceOf[Object])
      }
      out.append('}')
    case l: java.util.ArrayList[_] =>
      out.append('[')
      var i = 0
      while (i < l.size) {
        if (i > 0) out.append(',')
        writeValue(out, l.get(i).asInstanceOf[Object])
        i += 1
      }
      out.append(']')
    case other => out.append(other.toString) // Long / Double / Boolean
  }

  private def writeString(out: java.lang.StringBuilder, s: String): Unit = {
    out.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => out.append("\\\"")
        case '\\' => out.append("\\\\")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case _ if c < 0x20 => out.append(f"\\u${c.toInt}%04x")
        case _ => out.append(c)
      }
      i += 1
    }
    out.append('"')
    ()
  }
}
