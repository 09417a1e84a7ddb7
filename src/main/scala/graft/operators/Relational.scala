package graft.operators

import graft.{Q, Tables}
import graft.Q.QueryFn
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY.md §2.7): SELECT/filter/project,
  * aggregation, joins of every shape, set ops, subqueries, grouping
  * sets/rollup, window functions, CTEs, conditional expressions.
  *
  * The reference delegates all of this to DataFusion
  * (crates/arkflow-plugin/src/processor/sql.rs:93-200); here Catalyst
  * owns it. Queries are written with the DataFrame API where that is the
  * idiomatic Spark shape, and as shared ANSI SQL where the DuckDB oracle
  * dialect coincides exactly.
  */
object Relational {

  import Q.{d, dsum}

  // ---- shared SQL texts (valid verbatim in both Spark SQL and DuckDB) ----

  private val q10Sql =
    """SELECT p_brand, count(*) AS n_parts
      |FROM part
      |WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) FROM part)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  private val q11Sql =
    """SELECT o.o_orderkey, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice > 1.5 * (
      |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin

  private val q18Sql =
    """SELECT o_orderkey,
      |       ntile(4)  OVER w AS quartile,
      |       round(percent_rank() OVER w, 6) AS pr,
      |       round(cume_dist()    OVER w, 6) AS cd
      |FROM orders
      |WHERE o_orderkey < 2000
      |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  private val q19Sql =
    """SELECT o_custkey, count(*) AS n_orders,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_price
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 5
      |ORDER BY o_custkey""".stripMargin

  private val q21Sql =
    """WITH seg AS (
      |  SELECT c_mktsegment AS segment, count(*) AS n FROM customer GROUP BY c_mktsegment
      |), tot AS (SELECT count(*) AS t FROM customer)
      |SELECT segment, n, round(CAST(100 * n AS DOUBLE) / t, 4) AS pct
      |FROM seg CROSS JOIN tot
      |ORDER BY segment""".stripMargin

  private val q22Sql =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |            WHEN o_totalprice < 150000 THEN 'mid'
      |            ELSE 'high' END AS bucket,
      |       count(*) AS n,
      |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
      |       count(coalesce(nullif(o_orderpriority, '1-URGENT'), NULL)) AS n_not_urgent,
      |       round(CAST(sum(CAST(greatest(o_totalprice, 100000) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_floor100k,
      |       round(CAST(sum(CAST(least(o_totalprice, 100000)    AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_cap100k
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // ---- queries ----

  val queries: Map[String, QueryFn] = Map(
    // TPC-H Q1-shaped scan+aggregate; filter and the 4 needed columns are
    // pushed into the parquet scan, partial aggregation is map-side.
    "q01_agg_pushdown" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(sum(d(col("l_extendedprice")) * (lit(1).cast(Q.dec) - d(col("l_discount"))))
            .cast("double"), 2).as("sum_disc_price"),
          round(sum(d(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Projection+filter: only 3 columns reach the scan; predicate pushed down.
    "q02_filter_project" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))),

    // 3-way join + aggregate + top-N (TPC-H Q3 shape). customer side is
    // broadcast-able at any SF where segments are selective; AQE picks it.
    "q03_join_topn" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderkey"), o("o_orderdate"))
        .agg(round(sum(d(col("l_extendedprice")) * (lit(1).cast(Q.dec) - d(col("l_discount"))))
          .cast("double"), 2).as("revenue"))
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    // Semi join (EXISTS): planned as LeftSemi, no row duplication.
    "q04_semi_join" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Anti join (NOT EXISTS).
    "q05_anti_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // TPC-H Q6 shape: pure scan + filter + single-row aggregate.
    "q06_cond_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(d(col("l_extendedprice")) * d(col("l_discount"))).cast("double"), 2)
          .as("revenue"))),

    // ROLLUP + grouping() markers.
    "q07_rollup" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).as("g1"), grouping(col("l_linestatus")).as("g2"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g1"), col("g2"),
          col("n"), col("sum_qty"))
        .orderBy(col("g1"), col("g2"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // INTERSECT (set semantics).
    "q08_intersect" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // EXCEPT (set semantics).
    "q09_except" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // Uncorrelated scalar subquery (SQL path — shared text with the oracle).
    "q10_scalar_subquery" -> Q.fromSql(q10Sql),

    // Correlated scalar subquery; Catalyst decorrelates to an aggregate+join.
    "q11_correlated_subquery" -> Q.fromSql(q11Sql),

    // Left outer join keeping empty groups.
    "q12_left_join" -> ((s, dir) => {
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer")
      n.join(c, c("c_nationkey") === n("n_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"),
          round(sum(d(coalesce(col("c_acctbal"), lit(0)))).cast("double"), 2).as("tot_bal"))
        .orderBy(col("n_name"))
    }),

    // Full outer join of two aggregates.
    "q13_full_outer" -> ((s, dir) => {
      val cc = Tables.load(s, dir, "customer").groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("n_cust"))
      val ss = Tables.load(s, dir, "supplier").groupBy(col("s_nationkey").as("k"))
        .agg(count(lit(1)).as("n_supp"))
      cc.join(ss, cc("k") === ss("k"), "full_outer")
        .select(coalesce(cc("k"), ss("k")).as("nationkey"), col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // Cross join (tiny dims only — never at fact-table scale).
    "q14_cross_join" -> ((s, dir) => {
      val r1 = Tables.load(s, dir, "region").select(col("r_name").as("a"))
      val r2 = Tables.load(s, dir, "region").select(col("r_name").as("b"))
      r1.crossJoin(r2).orderBy(col("a"), col("b"))
    }),

    // Ranking window functions; rank/dense_rank get real ties (bucketed
    // key), row_number gets a unique ordering so all three are deterministic.
    "q15_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables.load(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000))
      val wUnique = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("bal_bucket").desc, col("c_custkey"))
      val wTies = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("bal_bucket").desc)
      c.select(col("c_mktsegment"), col("c_custkey"), col("bal_bucket"),
          row_number().over(wUnique).as("rn"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"))
        .filter(col("rn") <= 5)
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // lag/lead over a unique per-partition ordering.
    "q16_window_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      Tables.load(s, dir, "lineitem").filter(col("l_suppkey") < 20)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // Running sum with an explicit ROWS frame.
    "q17_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(sum(d(col("l_quantity"))).over(w).cast("double"), 2).as("run_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Distribution window functions (shared SQL text).
    "q18_window_dist" -> Q.fromSql(q18Sql),
    // GROUP BY ... HAVING.
    "q19_having" -> Q.fromSql(q19Sql),

    // Global top-K: Spark plans TakeOrderedAndProject (no full sort shuffle).
    "q20_topk" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(20)),

    // CTE + cross join against a 1-row aggregate.
    "q21_cte" -> Q.fromSql(q21Sql),
    // CASE / coalesce / nullif / greatest / least.
    "q22_conditional" -> Q.fromSql(q22Sql)
  )

  // ---- oracles (DuckDB dialect; identical text where possible) ----

  val oracle: Map[String, String] = Map(
    "q01_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin,

    "q03_join_topn" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q06_cond_agg" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) AS g1, grouping(l_linestatus) AS g2,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q08_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q09_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q10_scalar_subquery" -> q10Sql,
    "q11_correlated_subquery" -> q11Sql,

    "q12_left_join" ->
      """SELECT n_name, count(c_custkey) AS n_cust,
        |  round(CAST(sum(CAST(coalesce(c_acctbal, 0) AS DECIMAL(18,4))) AS DOUBLE), 2) AS tot_bal
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q13_full_outer" ->
      """WITH cc AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1),
        |     ss AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(cc.k, ss.k) AS nationkey, n_cust, n_supp
        |FROM cc FULL OUTER JOIN ss ON cc.k = ss.k
        |ORDER BY nationkey""".stripMargin,

    "q14_cross_join" ->
      """SELECT r1.r_name AS a, r2.r_name AS b
        |FROM region r1 CROSS JOIN region r2
        |ORDER BY a, b""".stripMargin,

    "q15_window_rank" ->
      """SELECT c_mktsegment, c_custkey, bal_bucket, rn, rnk, drnk FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC, c_custkey) AS rn,
        |    rank()       OVER (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC) AS drnk
        |  FROM customer) t
        |WHERE rn <= 5
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q16_window_lag" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  lag(l_quantity)  OVER w AS prev_qty,
        |  lead(l_quantity) OVER w AS next_qty
        |FROM lineitem
        |WHERE l_suppkey < 20
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q17_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run_qty
        |FROM lineitem
        |WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q18_window_dist" -> q18Sql,
    "q19_having" -> q19Sql,

    "q20_topk" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q21_cte" -> q21Sql,
    "q22_conditional" -> q22Sql
  )
}
