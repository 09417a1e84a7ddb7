package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the shapes that make these queries
  * scale (pushdown, broadcast, top-K without full sort, codegen) must
  * survive future edits — a correct-but-shuffle-heavy plan is a bug here.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.streaming.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter is pushed into the parquet scan, aggregation is two-phase") {
    val p = plan("q01_agg_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final aggregation expected")
  }

  test("q02: scan reads only the three projected columns") {
    val p = plan("q02_filter_project")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderpriority:string>"))
  }

  test("q03: dimension sides broadcast; lineitem is never shuffled for the join") {
    val p = plan("q03_join_topn")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q20: global top-K plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q20_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q60: query side of the kNN cross join is broadcast") {
    val p = plan("q60_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q58: simhash pairing is a banded equi-join — no cartesian/nested-loop product") {
    val p = plan("q58_simhash_hamming")
    assert(!p.contains("BroadcastNestedLoopJoin"), "all-pairs product crept back in")
    assert(!p.contains("CartesianProduct"), "all-pairs product crept back in")
  }

  test("q244: auto-width simhash pairing stays a banded equi-join at any derived width") {
    val p = plan("q244_simhash_autopairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "all-pairs product crept back in")
    assert(!p.contains("CartesianProduct"), "all-pairs product crept back in")
  }

  test("q178: the wedge join runs over the CAPPED adjacency (rank window present, no product)") {
    val p = plan("q178_adamic_adar")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the md5-ordered per-center row_number cap must stay ahead of the
    // self-join — its removal re-opens the hub-deg² term
    assert(p.contains("row_number"), "degree-cap window vanished from the plan")
  }

  test("q245/q65: image fixture decode has no shuffle beyond the scan; GD training never sorts globally") {
    // q65: generate → decode is mapPartitions over the scan only
    val p65 = plan("q65_multimodal_meta")
    assert(!p65.contains("SortMergeJoin") && !p65.contains("CartesianProduct"))
    // q107: every aggregation is keyed; a global Sort would mean the
    // gradient loop grew an accidental total order
    val p107 = graft.SparkEntry.queries("q107_classifier_train")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p107.contains("CartesianProduct"))
  }

  test("q62: embedding near-dup is LSH-bucketed — no cartesian/nested-loop product") {
    val p = plan("q62_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), "all-pairs product crept back in")
    assert(!p.contains("CartesianProduct"), "all-pairs product crept back in")
  }

  test("q51/q53: LSH banding and the DF-capped jaccard index stay equi-join only") {
    for (q <- Seq("q51_minhash_lsh", "q53_jaccard_pairs")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q grew a nested-loop product")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian product")
    }
  }

  test("q66/q70: both as-of directions run the custom AsOfJoinExec") {
    for (q <- Seq("q66_asof_join", "q70_asof_forward")) {
      val p = plan(q)
      assert(p.contains("AsOfJoin"), s"$q: " + p.linesIterator.take(8).mkString("\n"))
    }
  }

  test("q80: the benchmark shingle side broadcasts — the corpus scan never shuffles for the join") {
    val p = plan("q80_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("SortMergeJoin"),
      "decontamination must not shuffle the training corpus")
  }

  test("q78: stratified sampling is a pure scan-side filter (no exchange before the sort)") {
    val p = plan("q78_stratified_sample")
    // exactly one exchange: the presentation ORDER BY's range partitioning
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("q81: per-source rank runs two-phase WindowGroupLimit (partial top-k before the shuffle)") {
    val p = plan("q81_source_cap")
    // Spark pushes `row_number() <= k` as WindowGroupLimit both BEFORE
    // the exchange (partial, caps each map task's output at k per
    // source) and after — a hot domain ships at most k × tasks rows
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      p.linesIterator.take(12).mkString("\n"))
  }

  test("q172/q180: row-local codegen text metrics — only the presentation sort exchanges") {
    for (q <- Seq("q172_char_entropy", "q180_blocklist")) {
      val p = plan(q)
      // exactly one exchange: the ORDER BY's range partitioning; the
      // metric itself must never shuffle (a Project directly over the scan)
      assert("Exchange".r.findAllIn(p).size == 1, s"$q: $p")
      assert(!p.contains("HashAggregate") && !p.contains("Join"),
        s"$q grew an aggregation/join it doesn't need")
    }
  }

  test("q174: HRW argmax materializes once — no parquet re-scan after the checkpoint") {
    val p = plan("q174_hrw_shards")
    // the assignment localCheckpoints; both the occupancy aggregate and
    // the output join must read the materialized (doc_id, shard) table,
    // never re-scan the corpus or re-run the nShards-way md5 argmax
    assert(!p.contains("Scan parquet"),
      "corpus re-scanned after the assignment checkpoint")
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q169: AUC collapses to distinct scores before the prefix pass (one wide shuffle)") {
    val p = plan("q169_roc_auc")
    // the corpus-width shuffle is the groupBy(score); everything after
    // operates on the collapsed table
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "partial+final aggregation on score expected")
  }

  test("sweep: no query plans an accidental cartesian/nested-loop product") {
    // intentional products: q14 is the cross-join row itself; q21 attaches
    // a ONE-ROW total via CROSS JOIN (broadcast of a single row); q49
    // projects IN/NOT IN as SELECT-list booleans (no semi-join rewrite
    // exists — Spark broadcasts the dimension-scale subquery sides); q60/
    // q61/q67 broadcast a tiny query/centroid side against the scan.
    // ... and q77/q85 attach ONE-ROW corpus stats (N+avgdl / token
    // totals) the same way q21 attaches its one-row total; q88 the
    // one-row corpus size; q91 broadcasts the tiny centroid table for
    // cell assignment, exactly like q61/q67; q112 broadcasts the tiny
    // anchor side against the scan, the q60 shape; q118 attaches its
    // ONE-ROW OLS stats (n/Σx/Σy/Σxy/Σx²) the q21/q77 way.
    // ... q147 attaches the ONE-ROW corpus token total the same way;
    // q155 broadcasts the tiny centroid table for Lloyd assignment,
    // exactly like q61/q67; q161 attaches its two ONE-ROW token totals
    // the q21/q77 way.
    val intentional = Set("q14_cross_join", "q21_cte", "q49_subquery_forms",
      "q60_knn_brute", "q61_ivf_knn", "q67_ivf_kmeans_knn", "q77_bm25",
      "q85_mixture_sample", "q88_tfidf_keywords", "q91_semantic_dedup",
      "q112_hard_negatives", "q118_linear_probe", "q123_sparse_cosine",
      "q128_corpus_profile", "q137_ivf_recall", "q138_pq_recall",
      "q147_js_divergence", "q155_kmeans_lloyd", "q161_collocations",
      "q163_rrf_fusion", "q165_quantile_norm",
      // q170 attaches the 1-row corpus-total aggregate to the nBins-row
      // reliability table — a broadcast of one scalar, not a data product
      "q170_calibration",
      // q173 broadcasts the 1-row query vector (and later the <=k
      // selected vectors) into every MMR round — intentional products
      "q173_mmr_select",
      // q179 pairs the per-group count table with itself (k groups ->
      // k(k-1)/2 rows); q181/q183 attach the 1-row total — tiny
      // aggregates, not data products
      "q179_ks_test", "q181_benford", "q183_temperature_mix",
      // q184 broadcasts the <=k selected vectors per greedy round (the
      // q173 shape); q185 attaches the 1-row child-count aggregate
      "q184_kcenter", "q185_orphan_audit",
      // q187 rebuilds the full contingency grid from the two tiny margin
      // tables (|sources|×|langs| rows) plus the 1-row total; q189 rides
      // the q60 broadcast-anchor kNN scan; q195 attaches the 1-row
      // slice-total aggregate to the nBins-row grid (the q170 shape)
      "q187_chi2_independence", "q189_ndcg", "q195_psi",
      // q197 attaches the 1-row source-count; q198 attaches the 1-row
      // totals and the 1-row water-fill level to the k-row source table
      "q197_interleave", "q198_waterfill",
      // q202 pairs the per-group count table with itself (the q179
      // shape); q203 attaches the 1-row bigram total; q205 attaches
      // the 1-row corpus aggregate to the k-row source table; q207
      // rides the q60/q96 broadcast-anchor scans plus a k×k range
      // join building the 10-row RBO weight table
      "q202_mann_whitney", "q203_bigram_entropy", "q205_concentration",
      // q208 crosses the B-row (B=10) bin table for the PAV minimax
      // grid; q209 pairs the two one-row proportion summaries
      "q207_rbo", "q208_isotonic", "q209_two_prop_z",
      // q214 attaches the 1-row min/max extent and the 1-row total;
      // q215 attaches the 1-row corpus-max timestamp; q216 the 1-row
      // reference vocabulary size
      "q214_mutual_info", "q215_rfm", "q216_ngram_perplexity",
      // q218 rides the q60/q189 broadcast-anchor kNN scan
      "q218_rank_metrics",
      // q221 attaches the 1-row eigenvalue and 1-row trace aggregates
      // to the d-row loading vector; q224 attaches the 1-row OLS fit
      // to the nBuckets-row growth curve; q225 the 1-row side totals
      "q221_top_component", "q224_heaps_law", "q225_log_odds",
      // q227 attaches the 1-row corpus-max timestamp; q228 the 1-row
      // session total; q230 the 1-row edge count and 1-row Q total
      "q227_kaplan_meier", "q228_assoc_rules", "q230_modularity",
      // q231 attaches the 1-row collection-token total; q232 the 1-row
      // bin-table totals (the q170 shape); q233 the 1-row positive
      // total and 1-row best-F1
      "q231_lm_retrieval", "q232_brier", "q233_pr_curve",
      // q237 attaches the two 1-row marginal pair-sums; q241 the 1-row
      // count totals
      "q237_adjusted_rand", "q241_changepoint",
      // q242 is a constants-only product of two literal grids
      "q242_lsh_planner",
      // q245 broadcasts the X-language side against the Y scan (the
      // q60 anchor shape — swap IVF/LSH candidates at corpus scale);
      // q247 attaches the 1-row Neyman term total the q21/q198 way;
      // q248 attaches the 1-row corpus total to the support-bounded
      // confidence table (the q170 shape)
      "q245_margin_bitext", "q247_neyman_sample", "q248_risk_coverage")
    graft.SparkEntry.queries.keys.filterNot(intentional).toSeq.sorted.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("bucketed tables join with NO exchange (the 100TB co-location path)") {
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1") // force the join to exercise partitioning
    try {
      val orders = graft.Tables.load(spark, sf, "orders")
      val customer = graft.Tables.load(spark, sf, "customer")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed-by-join-key tables must join without shuffling:\n" +
          p.linesIterator.take(12).mkString("\n"))
      assert(j.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.conf.set(bcast, prev)
    }
  }

  test("q01 runs inside WholeStageCodegen (final AQE plan)") {
    val df = graft.SparkEntry.queries("q01_agg_pushdown")(spark, sf)
    df.collect() // finalize the AQE plan on this QueryExecution
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // '*' marks operators running inside WholeStageCodegen
    assert(formatted.contains("* HashAggregate") && formatted.contains("* Filter"),
      formatted.take(800))
  }
}
