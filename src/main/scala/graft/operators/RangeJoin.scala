package graft.operators

import graft.{Q, Tables}
import graft.Q.QueryFn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the non-equi join family every
  * analytics engine needs (sessionization, validity windows, IP->geo
  * lookups). Spark plans a raw `p BETWEEN s AND e` predicate as a
  * BroadcastNestedLoopJoin (small side) or a cartesian product (two big
  * sides) — O(n·m) row comparisons, the classic 100 TB trap.
  *
  * The scale-safe formulation is bin-bucketing: intervals explode into
  * the fixed-width bins they cover, points map to their single bin, and
  * an EQUI-join on the bin meets only same-bin candidates before the
  * exact predicate filters them — O(candidates-per-bin) instead of
  * O(n·m), shuffled and parallelized like any hash join.
  *
  * `binWidth` is the tuning knob: per-interval replication is
  * `width/binWidth + 1` rows, per-bin candidate volume is
  * `points-per-bin x intervals-per-bin`. Pick it near the typical
  * interval width.
  */
object RangeJoin {

  /** Join every point row to every interval row with
    * `start <= point < end`, via the binned equi-join above. Point,
    * start, and end must be integral (epoch units — cast first);
    * output = point columns ++ interval columns. Column names must not
    * collide (rename first), and values must be non-negative (bin
    * arithmetic uses floor division).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // Integral `div`, never `floor(col / width)`: Spark evaluates long/long
    // `/` in Double, which loses precision above 2^53 — at ns-epoch scale
    // (~1.8e18) a value near a bin boundary can round into the wrong bin
    // and silently drop true pairs (the exact predicate only removes false
    // candidates). SQL `div` is a true integral divide; truncation toward
    // zero == floor for the non-negative inputs this operator requires.
    def bin(sqlExpr: String) = expr(s"CAST(($sqlExpr) AS LONG) div $binWidth")
    val p = points.withColumn("__bin", bin(s"`$pointCol`"))
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("__bin", explode(sequence(
        bin(s"`$startCol`"),
        // last covered point of [s, e) is e-1
        bin(s"`$endCol` - 1"))))
    p.join(iv, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  val queries: Map[String, QueryFn] = Map(
    // Per-order count of lineitems shipping inside the order's first day
    // — a genuinely two-big-sides range join (600k points x 150k 1-day
    // intervals at sf0.1; PlanSpec asserts no BNLJ/cartesian). The count
    // depends only on the point VALUE, so the point side pre-aggregates
    // to (distinct value, multiplicity) BEFORE the join — eager
    // aggregation pushdown. Ship dates are day-granular: 600k rows
    // collapse to ~2.4k distinct days, so the join meets thousands of
    // candidates instead of ~36M matched pairs. At 100 TB the same holds
    // whenever point cardinality exceeds distinct-value cardinality
    // (timestamps binned to any calendar grain); for high-cardinality
    // points the pre-agg degrades to a no-op shuffle — drop it then.
    "q71_range_join" -> ((s, dir) => {
      val lineitem = Tables.load(s, dir, "lineitem")
      val orders = Tables.load(s, dir, "orders")
      val points = lineitem
        .select(unix_timestamp(col("l_shipdate")).as("ship_s"))
        .groupBy(col("ship_s")).agg(count(lit(1)).as("mult"))
      val intervals = orders.select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("win_start"),
        (unix_timestamp(col("o_orderdate")) + 86400L).as("win_end"))
      pointInInterval(points, "ship_s", intervals,
          "win_start", "win_end", binWidth = 86400L)
        .groupBy(col("o_orderkey"))
        .agg(sum(col("mult")).as("n_in_window"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q71_range_join" ->
      """SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_in_window
        |FROM orders o JOIN lineitem l
        |  ON epoch(l.l_shipdate) >= epoch(o.o_orderdate)
        | AND epoch(l.l_shipdate) < epoch(o.o_orderdate) + 86400
        |GROUP BY o.o_orderkey
        |ORDER BY o.o_orderkey""".stripMargin
  )
}
