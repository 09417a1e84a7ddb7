package graft.operators

import graft.Q
import graft.Q.QueryFn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical aggregates, ordered-set aggregates, and pivot
  * (SURVEY.md §2.7 aggregate rows: var/stddev/corr/covar/regr_*,
  * array_agg/string_agg, first/last/nth, bool/bit aggregates, median/
  * percentiles, grouping sets, approx aggregates).
  */
object Analytics {

  // Moment-based statistics are float ratios; both engines agree to well
  // below the rounded precision on this data.
  private val q33Sql =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(stddev_pop(l_quantity), 4) AS sdp_qty,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(var_pop(l_quantity), 4) AS varp_qty,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qe,
      |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covp_qe
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  private val q34Sql =
    """SELECT l_linestatus,
      |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
      |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
      |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  private val q38Sql =
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0) AS all_pos,
      |  bool_or(l_discount > 0.08) AS any_big_disc,
      |  CAST(bit_and(l_linenumber) AS BIGINT) AS band,
      |  CAST(bit_or(l_linenumber) AS BIGINT) AS bor,
      |  CAST(bit_xor(l_linenumber) AS BIGINT) AS bxor
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  private val q39Sql =
    """SELECT l_returnflag, l_linestatus,
      |  grouping(l_returnflag) AS g1, grouping(l_linestatus) AS g2,
      |  count(*) AS n,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  private val q41Sql =
    """SELECT l_orderkey, l_linenumber,
      |  first_value(l_quantity) OVER w AS fv,
      |  last_value(l_quantity)  OVER w AS lv,
      |  nth_value(l_quantity, 2) OVER w AS nth2
      |FROM lineitem
      |WHERE l_orderkey < 500
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private val q35Spark =
    """SELECT n_name,
      |  count(c_custkey) AS n_cust,
      |  array_join(array_sort(collect_list(c_name)), '|') AS names
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  private val q35Duck =
    """SELECT n_name,
      |  count(c_custkey) AS n_cust,
      |  coalesce(string_agg(c_name, '|' ORDER BY c_name), '') AS names
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  private val q36Spark =
    """SELECT c_mktsegment,
      |  max_by(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS richest,
      |  min_by(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS poorest,
      |  round(max(c_acctbal), 2) AS max_bal,
      |  round(min(c_acctbal), 2) AS min_bal
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private val q36Duck =
    """SELECT c_mktsegment,
      |  arg_max(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS richest,
      |  arg_min(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS poorest,
      |  round(max(c_acctbal), 2) AS max_bal,
      |  round(min(c_acctbal), 2) AS min_bal
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private val q37Spark =
    """SELECT l_returnflag,
      |  round(median(l_quantity), 4) AS med,
      |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS p25,
      |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 4) AS p75,
      |  round(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90d
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  private val q37Duck =
    """SELECT l_returnflag,
      |  round(median(l_quantity), 4) AS med,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS p75,
      |  round(quantile_disc(l_quantity, 0.9), 4) AS p90d
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // Approximate aggregates, graded in their EXACT regime (the q117
  // discipline): a sketch is an engine-specific estimate in general,
  // but each has a provable exact regime where its answer IS the true
  // value — and that regime is checkable against DuckDB's exact
  // aggregates. HLL++'s linear-counting estimate depends only on the
  // value SET (duplicate-insensitive), and l_linenumber's domain is
  // 1..7 at every TPC-H scale, so the estimate is a scale-independent
  // constant: measured exactly 7 per flag at rsd 0.02 (2^12 registers,
  // zero register collisions among the 7 hashes) just as at the old
  // rsd 0.005. The HLL feeds off the pre-grouped g rows (identical
  // registers from 21 rows instead of 600k).
  //
  // Round-17 optimization (OPTIMIZATION_r17.md, guide §1.2 "per-task
  // work"): (a) rsd 0.005 -> 0.02 — the 2^16-register buffer cost a
  // measured ~3.5 s FIXED (input-independent: 3.5 s on a 21-row
  // input), quadratic in register count (0.33 s at 0.02, 0.95 s at
  // 0.01); (b) percentile_approx(l_quantity, 0.5, 1e6) -> exact
  // discrete median over value counts. The 1e6-accuracy sketch held
  // ~every row of the group in its sample buffer (the sketch WAS the
  // data: 9-10 s of executor CPU at sf0.1), and its exactness argument
  // was scale-bounded (rank error eps*n < 1 only under 1e6-row
  // groups). The value-count fold is quantile_disc BY CONSTRUCTION at
  // every scale — first v whose cumulative count reaches rank
  // (n+1) DIV 2 = DuckDB's lower-median rank floor(0.5*(n-1))+1 — and
  // its heavy lifting is one map-side-combinable count over the
  // ~3x7x50-value grid; the fold runs over a ~350-element array per
  // flag. Oracle text unchanged; equality re-proven at
  // sf0.001/0.01/0.1 (tools/check.py) including the knife-edge R flag
  // whose median is 26 by a 145-rank margin.
  private val q40Spark =
    """WITH g AS (
      |  SELECT l_returnflag, l_linenumber, l_quantity, count(*) AS c
      |  FROM lineitem
      |  GROUP BY l_returnflag, l_linenumber, l_quantity
      |), p AS (
      |  SELECT l_returnflag,
      |    approx_count_distinct(l_linenumber, 0.02) AS approx_lines,
      |    array_sort(collect_list(CASE WHEN l_quantity IS NOT NULL
      |      THEN named_struct('v', l_quantity, 'c', c) END)) AS a,
      |    sum(CASE WHEN l_quantity IS NOT NULL THEN c ELSE 0L END) AS n
      |  FROM g GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, approx_lines,
      |  CAST(aggregate(a,
      |    named_struct('cum', CAST(0 AS BIGINT), 'med', CAST(NULL AS DOUBLE)),
      |    (acc, x) -> named_struct('cum', acc.cum + x.c,
      |      'med', CASE WHEN acc.med IS NULL AND acc.cum + x.c >= (n + 1) DIV 2
      |             THEN x.v ELSE acc.med END)).med AS DOUBLE) AS approx_median
      |FROM p ORDER BY l_returnflag""".stripMargin
  private val q40Duck =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_linenumber) AS BIGINT) AS approx_lines,
      |  CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS approx_median
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // Sketch-error audit (the q137/q138 recall-audit pattern applied to
  // q40's sketches): Spark computes the approx AND the exact aggregate
  // and grades the sketch against its documented error band — HLL++
  // relativeSD defaults to 0.05, percentile_approx's rank error at the
  // default accuracy is far inside the p45..p55 value band. The booleans
  // are deterministic (both sketches are deterministic given the data),
  // so DuckDB pins exact counts + TRUE and the driver hash-verifies —
  // upgrading the sketches from a rows-only row to a graded guarantee.
  // NEVER mix count(DISTINCT) with percentile_approx in one aggregate:
  // the distinct-rewrite Expand multiplies the input through the
  // quantile-sketch buffer (measured 37 s on sf0.1 where each aggregate
  // alone is <1 s). Shape instead: (a) the distinct side pre-aggregates
  // (flag, partkey) pairs — map-side combinable, and HLL is
  // duplicate-insensitive so approx_count_distinct over the distinct
  // pairs estimates the same cardinality; (b) percentiles run in their
  // own 3-row aggregation, percentile(..., array(...)) computing both
  // band edges in one buffer; (c) a 3×3 join stitches the audit.
  private val q141Spark =
    """WITH parts AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS BIGINT) AS exact_parts,
      |    approx_count_distinct(l_partkey) AS ap
      |  FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)
      |  GROUP BY l_returnflag
      |), qs AS (
      |  SELECT l_returnflag,
      |    CAST(percentile_approx(l_quantity, 0.5) AS DOUBLE) AS am,
      |    percentile(l_quantity, array(0.45, 0.55)) AS band
      |  FROM lineitem
      |  GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, exact_parts,
      |  (abs(ap - exact_parts) <= CAST(ceil(0.05 * exact_parts) AS BIGINT))
      |    AS hll_in_band,
      |  (am BETWEEN band[0] AND band[1]) AS median_in_band
      |FROM parts JOIN qs USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  private val q141Duck =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  TRUE AS hll_in_band,
      |  TRUE AS median_in_band
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // Benford first-significant-digit audit — the forensic data-quality
  // pass for a value column: natural multiplicative data follows
  // P(d) = log10(1 + 1/d); a synthetic or truncated feed doesn't. One
  // row-local digit extraction + one 9-row aggregation; identical
  // double expression tree in both engines (log10/floor/power), so the
  // digits bucket identically.
  private val q181Sql =
    """WITH d AS (
      |  SELECT CAST(floor(l_extendedprice /
      |    pow(10, floor(log10(l_extendedprice)))) AS INT) AS digit
      |  FROM lineitem WHERE l_extendedprice > 0
      |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_all FROM d)
      |SELECT digit, CAST(count(*) AS BIGINT) AS n,
      |  round(count(*) / n_all, 6) AS frac,
      |  round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
      |  round(count(*) / n_all - round(log10(1.0 + 1.0 / digit), 6), 6) AS dev
      |FROM d CROSS JOIN n
      |GROUP BY digit, n_all
      |ORDER BY digit""".stripMargin

  /** Referential-integrity ORPHAN audit: child rows whose key has no
    * match in the parent dimension — the join-health check a pipeline
    * runs before every fact-to-dim join (orphans silently vanish in
    * inner joins and null-fill in left joins; either way you want the
    * count first). One anti-join (parent side broadcasts when it is a
    * real dimension) + two tiny aggregates. `countDistinct` is exact
    * because the audit is the graded contract; swap
    * approx_count_distinct at 100 TB (the q40/q128 trade).
    */
  def orphanAudit(child: DataFrame, childKey: org.apache.spark.sql.Column,
      parent: DataFrame, parentKey: org.apache.spark.sql.Column): DataFrame = {
    // null (or uncastable) child keys are a SEPARATE data-quality
    // problem: a null never matches an anti-join, so it would inflate
    // the orphan count while silently vanishing from the key stats —
    // exclude them up front so every reported number covers the same
    // rows (and matches the oracle's null-skipping count(k))
    val orphans = child.select(childKey.cast("long").as("k"))
      .filter(col("k").isNotNull)
      .join(parent.select(parentKey.cast("long").as("k")), Seq("k"), "left_anti")
    val totals = child.agg(count(lit(1)).as("n_child_rows"))
    orphans
      .agg(count(lit(1)).as("n_orphan_rows"),
        countDistinct(col("k")).as("n_orphan_keys"),
        min(col("k")).as("min_orphan_key"),
        max(col("k")).as("max_orphan_key"))
      .crossJoin(totals)
      .select(col("n_child_rows"), col("n_orphan_rows"), col("n_orphan_keys"),
        round(col("n_orphan_rows").cast("double") / col("n_child_rows"), 6)
          .as("orphan_rate"),
        col("min_orphan_key"), col("max_orphan_key"))
  }

  /** k-anonymity audit over a quasi-identifier tuple: every equivalence
    * class (distinct QI combination) with its size, a `< k` risk flag,
    * and the worst-case re-identification probability 1/size — the
    * check a pipeline runs before releasing any row-level extract
    * (classes smaller than k single out individuals). One hash
    * aggregation keyed by the QI columns, map-side combinable; output
    * is one row per class regardless of corpus size.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k > 0, s"need QI columns and k > 0, got $qiCols / $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_n"))
      .select(qiCols.map(col) ++ Seq(
        col("class_n"),
        (col("class_n") < k).cast("int").as("at_risk"),
        round(lit(1.0) / col("class_n"), 6).as("reident_prob")): _*)
  }

  /** l-diversity audit — the companion check [[kAnonymityAudit]] can't
    * express: a class can be large (k-anonymous) yet still leak when
    * every member shares the SAME sensitive value (homogeneity attack —
    * Machanavajjhala et al. 2007). Per equivalence class: size,
    * distinct sensitive values, and the `< l` risk flag. One hash
    * aggregation keyed by the QI columns (count-distinct adds its
    * usual partial-dedup pass), one row per class out.
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(qiCols.nonEmpty && l > 0, s"need QI columns and l > 0, got $qiCols / $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_n"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .select(qiCols.map(col) ++ Seq(
        col("class_n"), col("distinct_sensitive"),
        (col("distinct_sensitive") < l).cast("int").as("at_risk")): _*)
  }

  private val q219Oracle =
    """SELECT o_orderstatus, year(o_orderdate) AS order_year,
      |  CAST(count(*) AS BIGINT) AS class_n,
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS distinct_sensitive,
      |  CAST(count(DISTINCT o_orderpriority) < 5 AS INT) AS at_risk
      |FROM orders
      |GROUP BY o_orderstatus, year(o_orderdate)
      |ORDER BY o_orderstatus, order_year""".stripMargin

  private val q186Oracle =
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS class_n,
      |  CAST(count(*) < 10 AS INT) AS at_risk,
      |  round(1.0 / count(*), 6) AS reident_prob
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // Chi-square test of independence over the FULL contingency grid
  // (row-margin × col-margin cross join rebuilds absent cells — a cell
  // with expected mass but zero observations still contributes): per
  // cell O, E = r*c/n and (O-E)^2/E. Three tiny aggregates off one
  // grouped scan; the grid is |sources|×|langs| rows however large the
  // corpus. Identical double expression tree in both engines.
  private val q187Sql =
    """WITH o AS (
      |  SELECT source, lang, CAST(count(*) AS DOUBLE) AS obs
      |  FROM documents GROUP BY source, lang
      |), rt AS (SELECT source, sum(obs) AS r FROM o GROUP BY source),
      |ct AS (SELECT lang, sum(obs) AS c FROM o GROUP BY lang),
      |n AS (SELECT sum(obs) AS n_all FROM o),
      |grid AS (
      |  SELECT rt.source, ct.lang, rt.r, ct.c
      |  FROM rt CROSS JOIN ct
      |)
      |SELECT g.source, g.lang,
      |  CAST(coalesce(o.obs, 0) AS BIGINT) AS observed,
      |  round(g.r * g.c / n.n_all, 6) AS expected,
      |  round((coalesce(o.obs, 0) - g.r * g.c / n.n_all) *
      |        (coalesce(o.obs, 0) - g.r * g.c / n.n_all) /
      |        (g.r * g.c / n.n_all), 6) AS chi2_contrib
      |FROM grid g
      |LEFT JOIN o ON g.source = o.source AND g.lang = o.lang
      |CROSS JOIN n
      |ORDER BY g.source, g.lang""".stripMargin

  // Differentially-private count release via the Laplace mechanism with
  // DETERMINISTIC noise: the uniform comes from the house md5 bucket of
  // the group key ((h+0.5)/2^32 ∈ (0,1)), inverse-CDF'd to Laplace
  // scale 1/ε. A production release swaps a real RNG in — the mechanism
  // (sensitivity-1 count, scale, clamp-at-zero) is what's graded here,
  // and determinism is what makes it oracle-checkable. ε = 1.0. One
  // aggregation; noise is a row-local expression on the group rows.
  private def q188Sql(bucket32: String) =
    s"""WITH c AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS true_n FROM documents
       |  GROUP BY source
       |), u AS (
       |  SELECT source, true_n,
       |    ($bucket32 + 0.5) / 4294967296.0 AS u
       |  FROM c
       |)
       |SELECT source, true_n,
       |  round(-1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise,
       |  CAST(greatest(0.0, round(true_n +
       |    round(-1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6), 0))
       |    AS BIGINT) AS noisy_n
       |FROM u
       |ORDER BY source""".stripMargin
  private val q188Spark =
    q188Sql("CAST(conv(substring(md5(source), 1, 8), 16, 10) AS BIGINT)")
  private val q188Duck =
    q188Sql("CAST(CAST('0x' || substring(md5(source), 1, 8) AS UBIGINT) AS BIGINT)")

  val queries: Map[String, QueryFn] = Map(
    // the test data is FK-clean (user_id 0-149 ⊂ custkeys), so the
    // audit runs against a STALE dimension slice (c_custkey < 100) —
    // the realistic failure mode (dim snapshot lagging the fact feed)
    // planted identically in the oracle
    "q185_orphan_audit" -> ((s, dir) =>
      orphanAudit(
        graft.Tables.load(s, dir, "events"), col("user_id"),
        graft.Tables.load(s, dir, "customer").filter(col("c_custkey") < 100),
        col("c_custkey"))),

    "q186_k_anonymity" -> ((s, dir) =>
      kAnonymityAudit(graft.Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    "q219_l_diversity" -> ((s, dir) =>
      lDiversityAudit(
        graft.Tables.load(s, dir, "orders")
          .withColumn("order_year", year(col("o_orderdate"))),
        Seq("o_orderstatus", "order_year"), "o_orderpriority", l = 5)
        .orderBy(col("o_orderstatus"), col("order_year"))),

    "q187_chi2_independence" -> Q.fromSql(q187Sql),
    "q188_dp_counts" -> Q.fromSql(q188Spark),

    "q181_benford" -> Q.fromSql(q181Sql),
    "q33_stats_agg" -> Q.fromSql(q33Sql),
    "q34_regr_agg" -> Q.fromSql(q34Sql),
    "q35_collect_agg" -> Q.fromSql(q35Spark),
    "q36_minmax_by" -> Q.fromSql(q36Spark),
    "q37_percentiles" -> Q.fromSql(q37Spark),
    "q38_bool_bit_agg" -> Q.fromSql(q38Sql),
    "q39_grouping_sets" -> Q.fromSql(q39Sql),
    "q40_approx_agg" -> Q.fromSql(q40Spark),
    "q141_sketch_audit" -> Q.fromSql(q141Spark),
    "q41_first_last_nth" -> Q.fromSql(q41Sql),
    // Pivot: DataFrame pivot with pinned value list (scales: one shuffle,
    // map-side partial aggregation per pivot column).
    "q46_pivot" -> ((s, dir) => {
      graft.Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("signup"), lit(0L)).as("n_signup"))
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q186_k_anonymity" -> q186Oracle,
    "q219_l_diversity" -> q219Oracle,
    "q187_chi2_independence" -> q187Sql,
    "q188_dp_counts" -> q188Duck,

    "q185_orphan_audit" ->
      """WITH orphans AS (
        |  SELECT e.user_id AS k FROM events e
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |    WHERE c.c_custkey < 100 AND c.c_custkey = e.user_id)
        |)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_child_rows,
        |  CAST(count(k) AS BIGINT) AS n_orphan_rows,
        |  CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys,
        |  round(CAST(count(k) AS DOUBLE) /
        |    (SELECT count(*) FROM events), 6) AS orphan_rate,
        |  min(k) AS min_orphan_key, max(k) AS max_orphan_key
        |FROM orphans""".stripMargin,

    "q181_benford" -> q181Sql,
    "q33_stats_agg" -> q33Sql,
    "q34_regr_agg" -> q34Sql,
    "q35_collect_agg" -> q35Duck,
    "q36_minmax_by" -> q36Duck,
    "q37_percentiles" -> q37Duck,
    "q38_bool_bit_agg" -> q38Sql,
    "q39_grouping_sets" -> q39Sql,
    "q40_approx_agg" -> q40Duck,
    "q141_sketch_audit" -> q141Duck,
    "q41_first_last_nth" -> q41Sql,
    "q46_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
  )
}
