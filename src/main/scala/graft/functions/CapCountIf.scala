package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.LongAccumulator

/** A pass-through boolean predicate that COUNTS its false rows into a
  * Spark [[LongAccumulator]] — the drop-observability primitive for
  * filters that discard data for scale reasons (the inverted-index df
  * caps, the PPJoin prefix stop-token cut).
  *
  * Why not `Dataset.observe`: a CollectMetrics node only surfaces its
  * metric when it sits in the main linear dataflow of the collecting
  * action — under a broadcast exchange, under a WindowExec, or
  * duplicated across a self-join it arrives empty (all three measured,
  * round 14), and the pair-join operators hit all three shapes. Forcing
  * delivery with eager localCheckpoints costs the plan its stats (AQE
  * falls back from broadcast to sort-merge joins; q158 measured 2.4×)
  * — the wrong trade for a counter. An accumulator delivers from every
  * executed task regardless of plan shape, at the cost of the usual
  * accumulator caveat: task retries / AQE stage re-execution can
  * double-count, so the value is a MONOTONE ops counter ("dropping
  * happened, this order of magnitude"), not an exact ledger — the same
  * contract CapStats' observe-based LSH counters already state.
  *
  * `deterministic = false` keeps the optimizer from folding, inferring
  * constraints from, or re-deriving the predicate — the count must tick
  * exactly where the filter runs. The comparison itself stays inside
  * whole-stage codegen.
  */
case class CapCountIf(child: Expression, acc: LongAccumulator)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override lazy val deterministic: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BooleanType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"CapCountIf takes a boolean predicate, got ${other.sql}")
    }
  override protected def nullSafeEval(v: Any): Any = {
    val pass = v.asInstanceOf[Boolean]
    if (!pass) acc.add(1L)
    pass
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accRef = ctx.addReferenceObj("acc", acc,
      classOf[LongAccumulator].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $c;
         |if (!${ev.value}) $accRef.add(1L);
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): CapCountIf =
    copy(child = newChild)
}

object CapCountIf {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.types.StringType

  private val accs =
    new java.util.concurrent.ConcurrentHashMap[String, LongAccumulator]()

  /** The named drop accumulator for `label` (registered once per JVM;
    * named `graft_cap/<label>` so it shows in the Spark UI). */
  def accumulator(spark: SparkSession, label: String): LongAccumulator =
    accs.computeIfAbsent(label,
      l => spark.sparkContext.longAccumulator(s"graft_cap/$l"))

  /** Cumulative dropped-row count for a label since session start. */
  def droppedTotal(label: String): Option[Long] =
    Option(accs.get(label)).map(_.value.longValue)

  /** `graft_cap_count_if(pred, 'label')` — the SQL surface, resolved at
    * analysis time on the driver (where the accumulator registry lives). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cap_count_if", { exprs =>
        require(exprs.size == 2,
          "graft_cap_count_if(pred, label) takes 2 arguments")
        val label = exprs(1) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_cap_count_if: label must be a string literal, got $other")
        }
        CapCountIf(exprs.head, accumulator(SparkSession.active, label))
      }, "scala_udf")
}
