package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Simhash signature of an `array<string>` of words as one fused codegen
  * expression: per word ONE md5, updating every bit's ±1 vote counter in
  * the same pass. The SQL-composable form — `transform(ws, w -> md5(w))`
  * then `bits` separate `size(filter(...))` scans — walks the hash array
  * once per bit and allocates the intermediate hash strings; this is a
  * single loop with an int[] of counters and zero intermediate arrays.
  *
  * Bit j (1-based hex digit j of each word's md5) votes +1 when the
  * digit is >= '8', −1 otherwise; the signature bit is "1" when the sum
  * is positive — IDENTICAL semantics (and output) to the composed form
  * and to the DuckDB oracle's exploded sum, just faster.
  */
case class SimhashBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(ws: Any, bits: Any): Any =
    SimhashBits.signature(ws.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ws, bits) =>
      s"${ev.value} = graft.functions.SimhashBits.signature($ws, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashBits =
    copy(left = newLeft, right = newRight)
}

object SimhashBits {
  def signature(ws: ArrayData, bits: Int): UTF8String = {
    val votes = new Array[Int](bits)
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val hex = org.apache.commons.codec.digest.DigestUtils
          .md5Hex(ws.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          // hex digit >= '8': '8','9' or 'a'..'f' (lowercase hex)
          if (hex.charAt(j) >= '8') votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      } else {
        // a null element votes -1 everywhere, matching the composed
        // form (2*size(filter(...)) > size(ws): null hashes never pass
        // the filter but still count in size)
        var j = 0
        while (j < bits) { votes(j) -= 1; j += 1 }
      }
      i += 1
    }
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) {
      out(j) = if (votes(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Expose as SQL function `simhash_bits(words, bits)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_bits", exprs => SimhashBits(exprs(0), exprs(1)), "scala_udf")
}
