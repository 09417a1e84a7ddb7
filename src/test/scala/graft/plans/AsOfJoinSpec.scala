package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom AsOfJoinExec must agree with the composed range-join
  * formulation (q66's query shape) on real data, and its plan must show
  * the operator with Catalyst-inserted exchanges/sorts.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.streaming.SparkTestSession.spark

  test("custom as-of join matches the composed formulation on events") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))

    val custom = AsOf.join(clicks, purchases, "user_id", "ts", "p_user", "p_ts")
      .select(col("event_id"), col("p_ts"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val composed = clicks.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") <= col("ts"), "left")
      .groupBy(col("event_id")).agg(max(col("p_ts")).as("p_ts"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(custom.size == composed.size && custom == composed,
      s"sizes custom=${custom.size} composed=${composed.size}")
    assert(custom.valuesIterator.exists(_ >= 0), "expected at least one match")
    assert(custom.valuesIterator.contains(-1L), "expected at least one no-match click")
  }

  test("forward as-of join matches the composed min-aggregate formulation") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))

    val custom = AsOf.join(clicks, purchases, "user_id", "ts", "p_user", "p_ts",
        forward = true)
      .select(col("event_id"), col("p_ts"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val composed = clicks.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") >= col("ts"), "left")
      .groupBy(col("event_id")).agg(min(col("p_ts")).as("p_ts"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(custom.size == composed.size && custom == composed,
      s"sizes custom=${custom.size} composed=${composed.size}")
    assert(custom.valuesIterator.exists(_ >= 0), "expected at least one match")
  }

  test("plan shows AsOfJoinExec with Catalyst-inserted exchange and sort") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val p = AsOf.join(clicks, purchases, "user_id", "ts", "p_user", "p_ts")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // nodeName strips the Exec suffix
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Sort ["), p)
  }
}
