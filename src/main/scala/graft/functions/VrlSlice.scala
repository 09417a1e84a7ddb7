package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.IntegerType

/** VRL `slice(value, start, [end])` for STRING values (processor/vrl.rs
  * stdlib): 0-based, end-exclusive, negative indices count from the end,
  * out-of-range indices clamp — none of which Spark's `substring`
  * (1-based, length-counted) or `slice` (arrays, 1-based) matches
  * directly. Registered as `graft_vrl_slice`; the remap processor's
  * FnAliases rewrites VRL `slice(` call sites to it.
  *
  * COMPOSED from existing codegen expressions (Substring/Length/
  * arithmetic) rather than a UDF, so it stays inside whole-stage codegen;
  * array inputs fail loudly at analysis (Length is string/binary-typed) —
  * use Spark's own `slice` for arrays.
  */
object VrlSlice {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vrl_slice", { exprs =>
        require(exprs.size == 2 || exprs.size == 3,
          "slice(value, start[, end]) takes 2 or 3 arguments")
        val s = exprs.head
        val len = Length(s)
        def norm(e: Expression): Expression = {
          val i = Cast(e, IntegerType)
          If(GreaterThanOrEqual(i, Literal(0)), i, Add(len, i))
        }
        val st0 = norm(exprs(1))
        val en0 = if (exprs.size == 3) norm(exprs(2)) else len
        val st = Least(Seq(Greatest(Seq(st0, Literal(0))), len))
        val en = Least(Seq(Greatest(Seq(en0, st)), len))
        Substring(s, Add(st, Literal(1)), Subtract(en, st))
      }, "scala_udf")
}
