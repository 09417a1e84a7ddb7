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

  /** Interval×interval OVERLAP self-join — the second member of the
    * non-equi family (concurrent-span detection, validity-conflict
    * checks, log/trace interval intersection). The raw predicate
    * `a.lo <= b.hi AND b.lo <= a.hi` plans as a cartesian product just
    * like the point case; the scale shape is the same bin bucketing
    * with BOTH sides exploding to covered bins, plus a
    * FIRST-AGREEING-BIN predicate (the q58 chunk-dedup pattern): a pair
    * counts only in the bin where its overlap STARTS, so every true
    * pair appears exactly once and no `distinct` ever runs on the pair
    * stream. Intervals are closed ([lo, hi], integral units).
    *
    * Per-interval replication is width/binWidth+1 — pick binWidth near
    * the typical interval width; split or cap outlier spans at ingest
    * (they otherwise fan out across many bins and skew those buckets).
    */
  def intervalOverlapPairs(iv: DataFrame, keyCols: Seq[String],
      idCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(sqlExpr: String) = expr(s"CAST(($sqlExpr) AS LONG) div $binWidth")
    val binned = iv
      .filter(col(hiCol) >= col(loCol)) // empty intervals match nothing
      .withColumn("__bin", explode(sequence(bin(s"`$loCol`"), bin(s"`$hiCol`"))))
    val keep = keyCols.map(col)
    val a = binned.select(col("__bin") +: keep :+ col(idCol).as("__ida")
      :+ col(loCol).as("__loa") :+ col(hiCol).as("__hia"): _*)
    val b = binned.select(col("__bin") +: keep :+ col(idCol).as("__idb")
      :+ col(loCol).as("__lob") :+ col(hiCol).as("__hib"): _*)
    a.join(b, "__bin" +: keyCols)
      .filter(col("__ida") < col("__idb") &&
        col("__loa") <= col("__hib") && col("__lob") <= col("__hia"))
      // count the pair only where its overlap starts (no distinct)
      .filter(bin("greatest(__loa, __lob)") === col("__bin"))
      .select(keep :+ col("__ida").as("id_a") :+ col("__idb").as("id_b")
        :+ (least(col("__hia"), col("__hib")) -
            greatest(col("__loa"), col("__lob"))).as("overlap"): _*)
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
    }),
    // Concurrent activity spans per user: each event opens a span of
    // `value` minutes; pairs of overlapping spans for the same user.
    // ts is epoch-nano BIGINT (Tables normalization); 6h bins sit near
    // the span-length scale (value <= ~490 min).
    "q157_interval_overlap" -> ((s, dir) => {
      val iv = Tables.load(s, dir, "events").select(
        col("event_id"), col("user_id"),
        col("ts").cast("long").as("lo"),
        (col("ts").cast("long") +
          expr("CAST(round(value * 60000000000) AS LONG)")).as("hi"))
      intervalOverlapPairs(iv, Seq("user_id"), "event_id", "lo", "hi",
          binWidth = 6L * 3600L * 1000000000L)
        .select(col("user_id"), col("id_a").as("ea"), col("id_b").as("eb"),
          col("overlap").as("overlap_ns"))
        .orderBy(col("user_id"), col("ea"), col("eb"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q71_range_join" ->
      """SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_in_window
        |FROM orders o JOIN lineitem l
        |  ON epoch(l.l_shipdate) >= epoch(o.o_orderdate)
        | AND epoch(l.l_shipdate) < epoch(o.o_orderdate) + 86400
        |GROUP BY o.o_orderkey
        |ORDER BY o.o_orderkey""".stripMargin,

    // the oracle runs the direct theta-join — grading that binning
    // neither drops nor duplicates any true pair
    "q157_interval_overlap" ->
      """WITH iv0 AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS lo,
        |    epoch_ns(ts) + CAST(round(value * 60000000000) AS BIGINT) AS hi
        |  FROM events
        |), iv AS (SELECT * FROM iv0 WHERE hi >= lo)
        |SELECT a.user_id AS user_id, a.event_id AS ea, b.event_id AS eb,
        |  least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_ns
        |FROM iv a JOIN iv b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id AND a.lo <= b.hi AND b.lo <= a.hi
        |ORDER BY user_id, ea, eb""".stripMargin
  )
}
