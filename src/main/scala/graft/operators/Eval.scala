package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Model-evaluation operators for the quality-classifier loop of a
  * training-data pipeline: once a filtering model scores the corpus
  * (q106/q118), these measure how good the scores ARE — ranking power
  * (ROC AUC) and probability calibration (reliability bins) — so a
  * filtering threshold can be chosen on evidence instead of folklore.
  *
  * Reference context: the reference delegates all analytics to its SQL
  * engine and ships no eval surface; these are the pipeline-completing
  * operators the builder prompt asks for beyond the reference inventory.
  */
object Eval {

  /** ROC AUC of `scoreCol` against binary `labelCol`, tie-aware
    * (Mann-Whitney rank-sum with average ranks), computed EXACTLY in
    * integer arithmetic: per distinct score s with n_s rows and p_s
    * positives, twice the positive rank-sum is
    * sum(p_s * (2*C(s) + n_s + 1)) where C(s) counts rows below s —
    * every term a BIGINT, so the single final division is the only
    * floating-point step and the result is bit-stable across engines
    * and partitionings.
    *
    * Scale: rows collapse to one row per DISTINCT score first (the
    * corpus shuffles once, keyed by score). The prefix count C(s) uses
    * the canonical two-pass distributed prefix sum over a range
    * partitioning by score ([[Corpus.packSequences]] pattern) — no
    * single-partition window anywhere, so score cardinality up to the
    * full corpus size stays distributed.
    */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = scored.sparkSession
    val g = scored.groupBy(col(scoreCol).cast("double").as("score"))
      .agg(count(lit(1)).as("n_s"),
        sum(col(labelCol).cast("long")).as("p_s"))
      .repartitionByRange(col("score"))
      .sortWithinPartitions(col("score"))
    // two-pass prefix sum: pass 1 per-partition totals (a few KB at any
    // scale), pass 2 re-reads the same shuffle with broadcast bases.
    val rdd = g.rdd.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val totals = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single((i, it.foldLeft(0L)(_ + _._2)))
      }
      .collect().sortBy(_._1).map(_._2)
    val bases = spark.sparkContext.broadcast(totals.scanLeft(0L)(_ + _))
    val terms = rdd.mapPartitionsWithIndex { case (i, it) =>
      var below = bases.value(i)
      it.map { case (_, nS, pS) =>
        val term = pS * (2L * below + nS + 1L)
        below += nS
        (term, pS, nS - pS)
      }
    }
    val agg = spark.createDataFrame(terms).toDF("r2", "p", "q")
      .agg(sum(col("r2")).as("r2"), sum(col("p")).as("n_pos"),
        sum(col("q")).as("n_neg"))
    agg.select(col("n_pos"), col("n_neg"),
      round((col("r2") - col("n_pos") * (col("n_pos") + lit(1L)))
        .cast("double") /
        (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Reliability table: scores bucketed into `nBins` equal-width bins
    * over [0,1]; per bin the observed positive rate vs the mean
    * predicted score, plus each bin's weighted contribution to the
    * expected calibration error (ECE = sum of contributions). One
    * aggregation keyed by bin — nBins rows out regardless of corpus
    * size. Mean scores go through DECIMAL so the per-bin averages are
    * order-exact against the oracle.
    */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val bins = scored
      .select(
        least(floor(col(scoreCol) * nBins), lit(nBins - 1)).cast("int").as("bin"),
        col(scoreCol).cast("double").as("score"),
        col(labelCol).cast("long").as("label"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("label")).as("n_pos"),
        round(sum(Q.d(col("score"))).cast("double") / count(lit(1)), 6)
          .as("mean_score"))
    // total row count re-derived from the nBins-row aggregate itself —
    // no second corpus scan, no driver action.
    val total = bins.agg(sum(col("n")).cast("double").as("n_all"))
    bins.crossJoin(total)
      .withColumn("frac_pos",
        round(col("n_pos").cast("double") / col("n"), 6))
      .withColumn("ece_part",
        round(abs(col("frac_pos") - col("mean_score")) * col("n") / col("n_all"), 6))
      .select(col("bin"), col("n"), col("n_pos"), col("mean_score"),
        col("frac_pos"), col("ece_part"))
  }

  // The q55 quality score as the model score, the planted weak label
  // (doc mentions "spark") as ground truth — both already oracle-pinned
  // conventions (q55, q107).
  /** The q55 quality score (rounded 4dp) as a reusable column — the
    * shared "model score" convention for the eval/selection family. */
  private[operators] def q55Score(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ws = split(text, " ")
    val stopList = TextAnalysis.stop("en")
    val stopRatio = size(filter(ws, w => w.isInCollection(stopList)))
      .cast("double") / size(ws)
    round(least(lit(1.0), size(ws) / lit(100.0)) * (lit(1.0) - stopRatio), 4)
  }

  private[operators] def scoredDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    docs.select(col("doc_id"),
      q55Score(col("text")).as("score"),
      col("text").contains("spark").cast("int").as("label"))
  }

  private[operators] val scoredSql = {
    val stopList = TextAnalysis.stop("en").map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  round(least(1.0, len(string_split(text, ' ')) / 100.0) *
       |    (1.0 - CAST(len(list_filter(string_split(text, ' '),
       |      x -> x IN ($stopList))) AS DOUBLE) /
       |      len(string_split(text, ' '))), 4) AS score,
       |  CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS label
       |FROM documents""".stripMargin
  }

  /** NDCG@k over a scored (query, candidate, relevance) ranking — the
    * standard graded-retrieval metric (discounted gain of the produced
    * order vs the ideal order). `ranked` carries one row per (qid, cid)
    * with a rank column (1-based) and a 0/1-or-graded `rel` column;
    * only ranks <= k contribute to DCG while IDCG uses the ideal
    * ordering of the SAME candidate pool truncated at k.
    *
    * Scale: two aggregations keyed by qid (map-side combinable) — the
    * candidate pool per query is already bounded upstream (a kNN or
    * retrieval top-N), so no global ordering exists anywhere; the ideal
    * rank is a per-qid window over that bounded pool. DCG terms go
    * through DECIMAL so the per-query sums are order-independent.
    */
  def ndcgAtK(ranked: DataFrame, qidCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 12)
    val idealW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rel").desc, col("rank"))
    val base = ranked.select(col(qidCol).as("qid"),
      col(rankCol).cast("long").as("rank"), col(relCol).cast("double").as("rel"))
    val withIdeal = base.withColumn("irank", row_number().over(idealW))
    val agg = withIdeal.groupBy(col("qid")).agg(
      sum(col("rel").cast("long")).as("n_rel"),
      sum(when(col("rank") <= k,
        (col("rel") / log2(col("rank") + 1)).cast(dec)).otherwise(lit(null)))
        .as("dcg_d"),
      sum(when(col("irank") <= k,
        (col("rel") / log2(col("irank") + 1)).cast(dec)).otherwise(lit(null)))
        .as("idcg_d"))
    agg.select(col("qid"), col("n_rel"),
      round(coalesce(col("dcg_d").cast("double"), lit(0.0)), 6).as("dcg"),
      round(coalesce(col("idcg_d").cast("double"), lit(0.0)), 6).as("idcg"),
      when(coalesce(col("idcg_d"), lit(0)) === 0, lit(0.0))
        .otherwise(round(col("dcg_d").cast("double") /
          col("idcg_d").cast("double"), 6)).as("ndcg"))
  }

  /** Per-subgroup ROC AUC — the fairness/robustness slice of
    * [[rocAuc]]: a filter that ranks well overall can still rank one
    * source/language at chance, and the aggregate hides it (the
    * subgroup table is where that shows). Same tie-aware integer
    * rank-sum identity per group; degenerate slices (all-positive /
    * all-negative) report NULL rather than a fabricated number.
    *
    * Rows collapse to one per (group, DISTINCT score) first; the
    * prefix window partitions BY GROUP over that support-bounded
    * table (scores are 4dp ⇒ ≤ 10001 rows per group; unbounded score
    * domains should quantize or use [[rocAuc]]'s two-pass prefix
    * machinery per slice).
    */
  def subgroupAuc(scored: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = scored.groupBy(col(groupCol).as("g"),
        col(scoreCol).cast("double").as("score"))
      .agg(count(lit(1)).as("n_s"), sum(col(labelCol).cast("long")).as("p_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score"))
      .rowsBetween(Long.MinValue, -1)
    val agg = g
      .withColumn("below", coalesce(sum(col("n_s")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("p_s") * (lit(2L) * col("below") + col("n_s") + lit(1L)))
          .as("r2"),
        sum(col("p_s")).as("n_pos"),
        sum(col("n_s") - col("p_s")).as("n_neg"))
    agg.select(col("g"), (col("n_pos") + col("n_neg")).as("n"),
      col("n_pos"), col("n_neg"),
      when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
        .otherwise(round(
          (col("r2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Precision/recall/F1 across every decision threshold — the curve a
    * filter-deployment picks its operating point from (the classifier
    * analogue of q152's dedup threshold curve; [[rocAuc]] summarizes
    * ranking power, this shows what each cut COSTS). One row per
    * distinct score s: predict-positive at score ≥ s, with TP/FP/FN
    * from suffix sums and F1 = 2TP/(pred_pos + pos) — every metric an
    * exact integer ratio. The best achievable F1 rides along each row.
    *
    * The corpus collapses to one row per DISTINCT score first; with
    * 4dp scores in [0,1] that support is ≤ 10001 rows BY CONSTRUCTION,
    * so the suffix-sum window runs over a bounded table (unbounded
    * score domains should quantize first or reuse [[rocAuc]]'s
    * two-pass prefix machinery). Zero denominators short-circuit via
    * CASE (ANSI division semantics error on them in both engines).
    */
  def prCurve(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val g = scored.groupBy(col(scoreCol).cast("double").as("threshold"))
      .agg(count(lit(1)).as("n_s"), sum(col(labelCol).cast("long")).as("p_s"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc).rowsBetween(Long.MinValue, 0)
    val tot = g.agg(sum(col("p_s")).as("pos"))
    val curve = g
      .withColumn("pred_pos", sum(col("n_s")).over(w))
      .withColumn("tp", sum(col("p_s")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("threshold"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        (col("pos") - col("tp")).as("fn"),
        when(col("pred_pos") === 0, lit(0.0))
          .otherwise(round(col("tp").cast("double") / col("pred_pos"), 6))
          .as("precision"),
        when(col("pos") === 0, lit(0.0))
          .otherwise(round(col("tp").cast("double") / col("pos"), 6))
          .as("recall"),
        when(col("pred_pos") + col("pos") === 0, lit(0.0))
          .otherwise(round((lit(2L) * col("tp")).cast("double") /
            (col("pred_pos") + col("pos")), 6)).as("f1"))
    val best = curve.agg(max(col("f1")).as("best_f1"))
    curve.crossJoin(broadcast(best))
  }

  /** Brier score with the Murphy decomposition — the proper-scoring
    * companion to [[calibrationBins]]' ECE: brier = mean (p−y)²
    * (computed EXACTLY in DECIMAL — scores are 4dp), decomposed over
    * reliability bins into reliability (how far bin means sit from bin
    * outcomes — lower better), resolution (how far bin outcomes spread
    * from the base rate — higher better) and uncertainty (the base
    * rate's intrinsic ȳ(1−ȳ)). A filter model can only improve brier
    * by gaining resolution or shedding reliability error; the split
    * says which lever moved.
    *
    * One binning aggregation (nBins rows out at any corpus size), the
    * totals re-derived from the bin table, component sums in DECIMAL.
    */
  def brierDecomposition(scored: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val dec18 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val base = scored.select(
        least(floor(col(scoreCol) * nBins), lit(nBins - 1)).cast("int").as("bin"),
        col(scoreCol).cast("double").as("score"),
        col(labelCol).cast("long").as("label"))
      .withColumn("e", Q.d(col("score")) - col("label"))
    val bins = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("label")).as("n_pos"),
        sum(Q.d(col("score"))).as("ssc"),
        sum(col("e") * col("e")).as("sse"))
    val tot = bins.agg(sum(col("n_b")).as("n_all"),
      sum(col("n_pos")).as("pos_all"), sum(col("sse")).as("sse_all"))
    val pb = col("ssc").cast("double") / col("n_b")
    val yb = col("n_pos").cast("double") / col("n_b")
    val ybar = col("pos_all").cast("double") / col("n_all")
    bins.crossJoin(broadcast(tot))
      .agg(max(col("n_all")).as("n"),
        max(col("pos_all")).as("pos_all"),
        max(col("sse_all")).as("sse_all"),
        sum((col("n_b") * pow(pb - yb, 2)).cast(dec18)).as("rel_d"),
        sum((col("n_b") * pow(yb - ybar, 2)).cast(dec18)).as("res_d"))
      .select(col("n"),
        round(col("sse_all").cast("double") / col("n"), 6).as("brier"),
        round(col("rel_d").cast("double") / col("n"), 6).as("reliability"),
        round(col("res_d").cast("double") / col("n"), 6).as("resolution"),
        round((col("pos_all").cast("double") / col("n")) *
          (lit(1.0) - col("pos_all").cast("double") / col("n")), 6)
          .as("uncertainty"))
  }

  /** MRR / precision@k / average precision over a scored (query,
    * candidate, relevance) ranking — the binary-relevance retrieval
    * metrics beside [[ndcgAtK]]'s graded one: MRR answers "how deep is
    * the first hit", P@k "how clean is the page", AP "how front-loaded
    * are ALL the hits". Same input contract as ndcgAtK (one row per
    * (qid, cid) with 1-based rank and 0/1 rel, pool already truncated
    * upstream); AP normalizes by the pool's relevant count, 0 when the
    * pool has no relevant candidate.
    *
    * Scale: one per-qid running-relevance window over the bounded
    * candidate pool (never the corpus), one aggregation keyed by qid;
    * AP terms sum in DECIMAL.
    */
  def rankMetricsAtK(ranked: DataFrame, qidCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 12)
    val base = ranked.select(col(qidCol).as("qid"),
      col(rankCol).cast("long").as("rank"), col(relCol).cast("int").as("rel"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rank"))
    val cum = base.withColumn("cum_rel", sum(col("rel")).over(w))
    val agg = cum.groupBy(col("qid")).agg(
      sum(col("rel").cast("long")).as("n_rel"),
      min(when(col("rel") === 1, col("rank"))).as("first_rel"),
      sum(when(col("rel") === 1 && col("rank") <= k,
        (col("cum_rel").cast("double") / col("rank")).cast(dec))
        .otherwise(lit(null))).as("ap_num"))
    agg.select(col("qid"), col("n_rel"),
      when(col("first_rel").isNull, lit(0.0))
        .otherwise(round(lit(1.0) / col("first_rel"), 6)).as("mrr"),
      round(col("n_rel").cast("double") / lit(k), 6).as("p_at_k"),
      when(col("n_rel") === 0, lit(0.0))
        .otherwise(round(col("ap_num").cast("double") / col("n_rel"), 6))
        .as("ap"))
  }

  /** Krippendorff's alpha for m binary raters with complete data — the
    * multi-rater generalization of [[cohensKappa]] (which cannot go
    * past two annotators): 1 − D_o/D_e over the coincidence counts.
    * With every unit rated by all m raters and binary values, both
    * disagreement terms have exact integer numerators —
    * num_o = Σ_u n_u1·(m − n_u1) and alpha collapses to
    * 1 − num_o·(n−1) / ((m−1)·N0·N1) with n = m·units — so the single
    * final division is the only floating-point step (the [[rocAuc]]
    * discipline). One aggregation over the corpus, one row out.
    */
  def krippendorffAlpha(labeled: DataFrame, raterCols: Seq[String]): DataFrame = {
    val m = raterCols.length
    require(m >= 2, s"need at least 2 raters, got $m")
    val nU1 = raterCols.map(c => col(c).cast("long")).reduce(_ + _)
    val agg = labeled.select(nU1.as("n_u1"))
      .agg(count(lit(1)).as("units"),
        sum(col("n_u1") * (lit(m.toLong) - col("n_u1"))).as("num_o"),
        sum(col("n_u1")).as("n1"))
    agg.select(col("units"),
        (lit(m.toLong) * col("units")).as("n"),
        (lit(m.toLong) * col("units") - col("n1")).as("n0"),
        col("n1"), col("num_o"))
      .select(col("units"), col("n"), col("n0"), col("n1"),
        round((lit(2L) * col("num_o")).cast("double") /
          (lit((m - 1).toLong) * col("n")), 6).as("d_o"),
        round((lit(2L) * col("n0") * col("n1")).cast("double") /
          (col("n") * (col("n") - lit(1L))), 6).as("d_e"),
        round(lit(1.0) - (col("num_o") * (col("n") - lit(1L))).cast("double") /
          (lit((m - 1).toLong) * col("n0") * col("n1")).cast("double"), 6)
          .as("alpha"))
  }

  /** Cohen's kappa between two binary annotators — chance-corrected
    * agreement (po - pe)/(1 - pe), THE gate before trusting weak labels
    * or LLM-judge labels enough to train on them. One aggregation over
    * the corpus: the four confusion cells in a single pass, kappa as
    * row-local arithmetic on the one output row.
    */
  def cohensKappa(labeled: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = labeled.agg(
      count(lit(1)).as("n"),
      sum((col(aCol) === 1 && col(bCol) === 1).cast("long")).as("n11"),
      sum((col(aCol) === 1 && col(bCol) === 0).cast("long")).as("n10"),
      sum((col(aCol) === 0 && col(bCol) === 1).cast("long")).as("n01"),
      sum((col(aCol) === 0 && col(bCol) === 0).cast("long")).as("n00"))
    cells.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      round((col("n11") + col("n00")).cast("double") / col("n"), 6).as("po"),
      round(((col("n11") + col("n10")) * (col("n11") + col("n01")) +
             (col("n01") + col("n00")) * (col("n10") + col("n00")))
        .cast("double") / (col("n") * col("n")), 6).as("pe"))
      .withColumn("kappa",
        round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6))
  }

  /** Spearman rank correlation between two per-row signals, exact with
    * AVERAGE ranks for ties: rho = Pearson correlation of the rank
    * variables. Average rank of value v = (#rows below v) + (ties+1)/2
    * — computed per DISTINCT value with the same two-pass distributed
    * prefix count as [[rocAuc]] (one range-partitioned shuffle per
    * variable, per-partition totals to the driver, broadcast bases; no
    * single-partition window), then joined back and fed to one final
    * moment aggregation. Rank sums ride DECIMAL(38,6): ranks are
    * half-integers bounded by n, so Σxy ≤ n³ stays exact far beyond
    * 100 TB row counts.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    def ranks(c: String): DataFrame = {
      val g = df.groupBy(col(c).cast("double").as("v"))
        .agg(count(lit(1)).as("n_v"))
        .repartitionByRange(col("v"))
        .sortWithinPartitions(col("v"))
      val rdd = g.rdd.map(r => (r.getDouble(0), r.getLong(1)))
      val totals = rdd
        .mapPartitionsWithIndex { case (i, it) =>
          Iterator.single((i, it.foldLeft(0L)(_ + _._2)))
        }
        .collect().sortBy(_._1).map(_._2)
      val bases = spark.sparkContext.broadcast(totals.scanLeft(0L)(_ + _))
      val ranked = rdd.mapPartitionsWithIndex { case (i, it) =>
        var below = bases.value(i)
        it.map { case (v, nV) =>
          val r = below + (nV + 1) / 2.0
          below += nV
          (v, r)
        }
      }
      spark.createDataFrame(ranked).toDF("v", "r")
    }
    val rx = ranks(xCol).select(col("v").as("xv"), col("r").as("rx"))
    val ry = ranks(yCol).select(col("v").as("yv"), col("r").as("ry"))
    val joined = df
      .select(col(xCol).cast("double").as("xv"), col(yCol).cast("double").as("yv"))
      .join(rx, "xv").join(ry, "yv")
    val m = joined.agg(
      count(lit(1)).as("n"),
      sum(col("rx").cast(dec)).as("sx"), sum(col("ry").cast(dec)).as("sy"),
      sum((col("rx") * col("ry")).cast(dec)).as("sxy"),
      sum((col("rx") * col("rx")).cast(dec)).as("sxx"),
      sum((col("ry") * col("ry")).cast(dec)).as("syy"))
    m.select(col("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
         sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
        6).as("rho"))
  }

  /** Population Stability Index between a reference and a current slice
    * of a score distribution — the standard production drift monitor
    * (rule of thumb: < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted;
    * PSI is symmetrized KL on binned marginals). Scores bucket into
    * `nBins` equal-width bins over [0,1]; per bin the contribution
    * (p_cur − p_ref)·ln(p_cur/p_ref), fractions floor-clamped at `eps`
    * so a bin empty on one side stays finite. The complete bin list is
    * rebuilt by a range cross (the q187 absent-cell rigor) — a bin both
    * slices miss still reports. One grouped scan; everything after is
    * nBins-row arithmetic.
    */
  def psi(scored: DataFrame, scoreCol: String, isRef: Column,
      nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val spark = scored.sparkSession
    val counts = scored
      .select(
        least(floor(col(scoreCol) * nBins), lit(nBins - 1)).cast("int").as("bin"),
        isRef.cast("int").as("is_ref"))
      .groupBy(col("bin"))
      .agg(sum(col("is_ref")).as("n_ref"),
        sum(lit(1) - col("is_ref")).as("n_cur"))
    val grid = spark.range(nBins).select(col("id").cast("int").as("bin"))
    val tot = counts.agg(sum(col("n_ref")).as("tr"), sum(col("n_cur")).as("tc"))
    val p = grid.join(counts, Seq("bin"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        greatest(coalesce(col("n_ref"), lit(0L)).cast("double") / col("tr"),
          lit(eps)).as("p_ref"),
        greatest(coalesce(col("n_cur"), lit(0L)).cast("double") / col("tc"),
          lit(eps)).as("p_cur"))
    p.select(col("bin"), col("n_ref"), col("n_cur"),
      round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
      round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
        .as("psi_part"))
  }

  /** Deterministic subsample-bootstrap confidence interval on the mean
    * of a score: `nReps` replicates each keep the rows whose
    * content-derived uniform (md5 of rep:id) falls under `keepFrac`
    * (the e⁻¹-complement ~0.632 mimics the expected distinct mass of a
    * with-replacement resample); the CI is the [lo, hi] percentile of
    * the replicate means. Deterministic so the mechanism is
    * oracle-checkable — swap a real RNG per replicate for production.
    *
    * Scale: the corpus expands nReps× via one array explode but
    * collapses immediately into nReps partial-aggregated means
    * (map-side combine; DECIMAL sums for order independence); the
    * percentile runs over the nReps-row replicate table. No shuffle of
    * the raw corpus at any width.
    */
  def bootstrapCi(scored: DataFrame, idCol: String, scoreCol: String,
      nReps: Int = 20, keepFrac: Double = 0.632,
      lo: Double = 0.025, hi: Double = 0.975): DataFrame = {
    require(nReps > 1, s"nReps must be > 1, got $nReps")
    val cut = math.floor(keepFrac * 4294967296.0).toLong
    val reps = scored.select(col(idCol).cast("string").as("id"),
        Q.d(col(scoreCol)).as("s"))
      .withColumn("rep", explode(sequence(lit(0), lit(nReps - 1))))
      .filter(Q.md5Bucket32(
        concat(col("rep").cast("string"), lit(":"), col("id"))) < cut)
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n"),
        (sum(col("s")).cast("double") / count(lit(1))).as("mean_s"))
    reps.agg(
      count(lit(1)).as("n_reps"),
      // decimal-summed mean of the replicate means: order-independent
      round(sum(Q.d(col("mean_s"))).cast("double") / count(lit(1)), 6)
        .as("boot_mean"),
      round(expr(s"percentile(mean_s, $lo)"), 6).as("ci_lo"),
      round(expr(s"percentile(mean_s, $hi)"), 6).as("ci_hi"))
  }

  /** Isotonic calibration of the reliability table — the standard
    * post-hoc calibrator (fit a monotone map from score to observed
    * positive rate; apply it instead of the raw score). Pool-adjacent-
    * violators computed via the minimax identity
    * fitted_i = max_{j≤i} min_{k≥i} wavg(y[j..k]) — an O(B³) form that
    * is PURE relational algebra over the B-row bin table (B = 10
    * here), so both engines derive the identical monotone fit; every
    * segment mean is an exact integer ratio (Σn_pos/Σn over the
    * segment). The corpus is touched exactly once (the q170 binning
    * aggregation); everything else is arithmetic on ≤B³ tiny rows.
    */
  def isotonicCalibration(scored: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    val bins = calibrationBins(scored, scoreCol, labelCol, nBins)
      .select(col("bin"), col("n"), col("n_pos"), col("frac_pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(Long.MinValue, 0)
    val pre = bins.select(col("bin"), col("n"), col("n_pos"), col("frac_pos"),
      sum(col("n")).over(w).as("cn"), sum(col("n_pos")).over(w).as("cp"))
    val jt = pre.select(col("bin").as("j"), (col("cn") - col("n")).as("cnj"),
      (col("cp") - col("n_pos")).as("cpj"))
    val kt = pre.select(col("bin").as("k"), col("cn").as("cnk"),
      col("cp").as("cpk"))
    val it = pre.select(col("bin").as("i"), col("n"), col("n_pos"),
      col("frac_pos"))
    val grid = it.crossJoin(jt).crossJoin(kt)
      .filter(col("j") <= col("i") && col("i") <= col("k"))
      .withColumn("wavg",
        (col("cpk") - col("cpj")).cast("double") / (col("cnk") - col("cnj")))
    grid.groupBy(col("i"), col("n"), col("n_pos"), col("frac_pos"), col("j"))
      .agg(min(col("wavg")).as("minw"))
      .groupBy(col("i"), col("n"), col("n_pos"), col("frac_pos"))
      .agg(round(max(col("minw")), 6).as("iso_fitted"))
      .select(col("i").as("bin"), col("n"), col("n_pos"), col("frac_pos"),
        col("iso_fitted"))
  }

  /** Two-proportion z-test between two corpus slices — the A/B gate
    * ("did the new filter change the positive-label rate") beside the
    * rank tests (q202 asks about a numeric's location; this asks about
    * a binary rate). Pooled-variance z plus the unpooled 95% Wald CI
    * of the difference; everything from one two-row aggregation, the
    * z expression a single identical double tree in both engines.
    * Degenerate pooled rates (p̂ ∈ {0,1} ⇒ σ = 0) report NULL z.
    */
  def twoProportionZ(labeled: DataFrame, groupCol: String, labelCol: String,
      groupA: String, groupB: String): DataFrame = {
    val cells = labeled
      .filter(col(groupCol).isin(groupA, groupB))
      .groupBy((col(groupCol) === groupA).as("is_a"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("pos"))
    val a = cells.filter(col("is_a")).select(col("n").as("na"), col("pos").as("xa"))
    val b = cells.filter(!col("is_a")).select(col("n").as("nb"), col("pos").as("xb"))
    val pa = col("xa").cast("double") / col("na")
    val pb = col("xb").cast("double") / col("nb")
    val pPool = (col("xa") + col("xb")).cast("double") / (col("na") + col("nb"))
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("na") + lit(1.0) / col("nb")))
    val seU = sqrt(pa * (lit(1.0) - pa) / col("na") +
      pb * (lit(1.0) - pb) / col("nb"))
    a.crossJoin(b).select(
      col("na"), col("xa"), col("nb"), col("xb"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      round(pa - pb, 6).as("diff"),
      when(se > 0, round((pa - pb) / se, 6)).as("z"),
      round(pa - pb - lit(1.96) * seU, 6).as("ci_lo"),
      round(pa - pb + lit(1.96) * seU, 6).as("ci_hi"))
  }

  /** Binned mutual information between two numeric signals — the
    * dependence measure that sees what correlation cannot (a U-shaped
    * or any non-monotone relation scores 0 on Pearson/Spearman but
    * > 0 here). Both signals bin equal-width over their [min, max]
    * (10×10 grid); MI, the marginal entropies and the normalized
    * MI/√(HₓH_y) all come from the one joint-count aggregation —
    * every log argument is a ratio of integer counts, so the double
    * trees are engine-identical, and the per-cell terms sum in
    * DECIMAL. One corpus scan + a 1-row min/max broadcast.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 1, s"nBins must be > 1, got $nBins")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 18)
    val v = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    val ext = v.agg(min(col("x")).as("xmn"), max(col("x")).as("xmx"),
      min(col("y")).as("ymn"), max(col("y")).as("ymx"))
    def bin(c: Column, mn: Column, mx: Column) =
      when(mx === mn, lit(0)).otherwise(
        least(floor((c - mn) / (mx - mn) * nBins), lit(nBins - 1)).cast("int"))
    val joint = v.crossJoin(broadcast(ext))
      .select(bin(col("x"), col("xmn"), col("xmx")).as("bx"),
        bin(col("y"), col("ymn"), col("ymx")).as("by"))
      .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("cxy"))
    val mx = joint.groupBy(col("bx")).agg(sum(col("cxy")).as("cx"))
    val my = joint.groupBy(col("by")).agg(sum(col("cxy")).as("cy"))
    val n = joint.agg(sum(col("cxy")).as("n"))
    val t = joint.join(mx, "bx").join(my, "by").crossJoin(broadcast(n))
    val agg = t.agg(
      max(col("n")).as("n"),
      count(lit(1)).as("n_cells"),
      sum((col("cxy").cast("double") / col("n") *
        log(col("cxy").cast("double") * col("n") / (col("cx") * col("cy"))))
        .cast(dec)).as("mi_d"),
      sum((col("cxy").cast("double") / col("n") *
        log(col("cx").cast("double") / col("n"))).cast(dec)).as("hx_d"),
      sum((col("cxy").cast("double") / col("n") *
        log(col("cy").cast("double") / col("n"))).cast(dec)).as("hy_d"))
    agg.select(col("n"), col("n_cells"),
      round(col("mi_d").cast("double"), 6).as("mi"),
      round(-col("hx_d").cast("double"), 6).as("h_x"),
      round(-col("hy_d").cast("double"), 6).as("h_y"),
      round(col("mi_d").cast("double") /
        sqrt(col("hx_d").cast("double") * col("hy_d").cast("double")), 6)
        .as("nmi"))
  }

  /** Split-conformal prediction sets (Vovk's conformal framework; the
    * Angelopoulos–Bates split-conformal recipe) — the
    * distribution-free uncertainty layer for a deployed quality
    * classifier: a deterministic calibration split (house md5 uniform)
    * yields the true-class nonconformity scores, their
    * ⌈(n+1)(1−α)⌉-th smallest value becomes the threshold q̂, and every
    * test document gets the PREDICTION SET of labels whose
    * nonconformity is ≤ q̂ — marginal coverage ≥ 1−α holds by
    * exchangeability, no model assumptions.
    *
    * Scale shape: q̂ is an EXACT order statistic computed on the
    * support-bounded distinct-score table (6dp rounding bounds the
    * running-count window at ≤ 10⁶ rows — the q243 discipline, never a
    * corpus sort); one double collects to the driver; the test pass is
    * row-local against the broadcast threshold.
    */
  def conformalSets(scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val isCal = (Q.md5Bucket32(concat(lit("conf:"), col(idCol).cast("string")))
      + lit(0.5)) / lit(4294967296.0) < 0.5
    val base = scored.select(col(idCol).as("doc_id"),
        col(scoreCol).as("s"), col(labelCol).cast("int").as("y"),
        isCal.as("is_cal"))
      .localCheckpoint(true) // feeds the calibration agg AND the test pass
    val aTrue = when(col("y") === 1, round(lit(1.0) - col("s"), 6))
      .otherwise(col("s"))
    val cal = base.filter(col("is_cal")).select(aTrue.as("a"))
    val nCal = cal.count()
    require(nCal > 0, "conformal calibration split is empty")
    val k = math.ceil((nCal + 1) * (1 - alpha)).toLong
    val qHat: Double =
      if (k > nCal) Double.MaxValue // degenerate n: every label covered
      else {
        val byVal = cal.groupBy(col("a")).agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("a"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        byVal.withColumn("cum", sum(col("c")).over(w))
          .filter(col("cum") >= k)
          .orderBy(col("a")).limit(1)
          .collect().head.getDouble(0)
      }
    base.filter(!col("is_cal"))
      .select(col("doc_id"), col("s").as("score"), col("y").as("label"),
        (col("s") <= qHat).as("in_set_0"),
        (round(lit(1.0) - col("s"), 6) <= qHat).as("in_set_1"))
      .withColumn("covered",
        when(col("label") === 1, col("in_set_1")).otherwise(col("in_set_0")))
  }

  /** Selective-prediction risk–coverage curve (Geifman & El-Yaniv
    * 2017's selective classification view) — the deployment question a
    * quality filter answers with abstention: "if the classifier only
    * acts on its most-confident fraction c, what error rate does it
    * incur?" Confidence is the margin |s − 0.5|·2 (4dp), prediction is
    * s ≥ 0.5, and the curve reports, at every REALIZABLE threshold
    * (each distinct confidence — a deployed cutoff can only sit at
    * those boundaries), the cumulative coverage and selective risk,
    * plus each bucket's AURC contribution (Σ over the curve =
    * coverage-weighted area under risk).
    *
    * Scale shape: one hash aggregation to the distinct-confidence
    * table, then cumulative windows over that SUPPORT-BOUNDED table
    * (≤ 10⁴ + 1 rows at 4dp — the rocAuc/q243 discipline; never a
    * per-item global sort or window).
    */
  def riskCoverageCurve(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val base = scored.select(
      round(abs(col(scoreCol) - 0.5) * 2.0, 4).as("conf"),
      ((col(scoreCol) >= 0.5).cast("int") =!= col(labelCol).cast("int"))
        .cast("long").as("err"))
    val g = base.groupBy(col("conf"))
      .agg(count(lit(1)).as("n_g"), sum(col("err")).as("e_g"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("conf").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = g.agg(sum(col("n_g")).as("n_all"))
    g.withColumn("n_cum", sum(col("n_g")).over(w))
      .withColumn("e_cum", sum(col("e_g")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("conf"), col("n_cum"),
        round(col("n_cum").cast("double") / col("n_all"), 6).as("coverage"),
        round(col("e_cum").cast("double") / col("n_cum"), 6).as("risk"),
        // double arithmetic with a fixed association tree — decimal
        // DIVISION scale rules differ across engines, doubles don't
        round(col("n_g").cast("double") / col("n_all") *
          (col("e_cum").cast("double") / col("n_cum")), 6)
          .as("aurc_part"))
  }

  /** DeLong's test (DeLong, DeLong & Clarke-Pearson 1988) for the
    * AUC DIFFERENCE of two scoring functions evaluated on the same
    * items — THE standard answer to "is quality filter B actually
    * better than filter A, or is the AUC gap noise": the paired
    * structural-components estimator of var(AUC_A − AUC_B) and its z
    * statistic.
    *
    * Exactness: every per-item placement rides as the INTEGER
    * numerator `2·(opposite-class strictly-worse) + ties` (mid-rank
    * tie handling), so all sums/cross-products are DECIMAL(38,0)-exact
    * under any partitioning; placements come from each metric's
    * support-bounded distinct-score table (two windows over ≤10⁴ rows,
    * broadcast back — the rocAuc machinery, no per-item sort). The
    * final scalar algebra is ONE SQL expression text evaluated by both
    * engines ([[delongFinalExprs]]) — no mirrored reimplementation to
    * drift.
    */
  def delongAucCompare(scored: DataFrame, aCol: String, bCol: String,
      labelCol: String): DataFrame = {
    val dec0 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base = scored.select(col(aCol).as("sa"), col(bCol).as("sb"),
        col(labelCol).cast("int").as("y"))
      .localCheckpoint(true) // two support aggs + the join all read it
    def support(metric: String): DataFrame = {
      val g = base.groupBy(col(metric))
        .agg(sum(when(col("y") === 0, 1L).otherwise(0L)).as("negc"),
          sum(col("y").cast("long")).as("posc"))
      val up = org.apache.spark.sql.expressions.Window.orderBy(col(metric))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val down = org.apache.spark.sql.expressions.Window.orderBy(col(metric).desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      g.withColumn("negb", coalesce(sum(col("negc")).over(up), lit(0L)))
        .withColumn("posa", coalesce(sum(col("posc")).over(down), lit(0L)))
        .select(col(metric),
          (lit(2L) * col("negb") + col("negc")).as(s"p2_$metric"),
          (lit(2L) * col("posa") + col("posc")).as(s"q2_$metric"))
    }
    val items = base
      .join(broadcast(support("sa")), "sa")
      .join(broadcast(support("sb")), "sb")
    def d(c: org.apache.spark.sql.Column) = c.cast(dec0)
    val agg = items.agg(
      count(when(col("y") === 1, 1)).cast("double").as("np"),
      count(when(col("y") === 0, 1)).cast("double").as("nn"),
      sum(when(col("y") === 1, d(col("p2_sa")))).cast("double").as("sa2"),
      sum(when(col("y") === 1, d(col("p2_sb")))).cast("double").as("sb2"),
      sum(when(col("y") === 1, d(col("p2_sa")) * d(col("p2_sa")))).cast("double").as("saa"),
      sum(when(col("y") === 1, d(col("p2_sb")) * d(col("p2_sb")))).cast("double").as("sbb"),
      sum(when(col("y") === 1, d(col("p2_sa")) * d(col("p2_sb")))).cast("double").as("sab"),
      sum(when(col("y") === 0, d(col("q2_sa")))).cast("double").as("ta2"),
      sum(when(col("y") === 0, d(col("q2_sb")))).cast("double").as("tb2"),
      sum(when(col("y") === 0, d(col("q2_sa")) * d(col("q2_sa")))).cast("double").as("taa"),
      sum(when(col("y") === 0, d(col("q2_sb")) * d(col("q2_sb")))).cast("double").as("tbb"),
      sum(when(col("y") === 0, d(col("q2_sa")) * d(col("q2_sb")))).cast("double").as("tab"))
    agg.selectExpr(Eval.delongFinalExprs: _*)
  }

  /** The DeLong closing algebra as ONE shared SQL text — Spark's
    * selectExpr and the DuckDB oracle evaluate the identical expression
    * trees over the identically-named exact sums. */
  private[operators] val delongVarExpr: String = {
    def s10(x: String, y: String, sx: String, sy: String) =
      s"(($x - $sx * $sy / np) / (np - 1) / (4.0 * nn * nn))"
    def s01(x: String, y: String, sx: String, sy: String) =
      s"(($x - $sx * $sy / nn) / (nn - 1) / (4.0 * np * np))"
    s"((${s10("saa", "saa", "sa2", "sa2")} + ${s10("sbb", "sbb", "sb2", "sb2")} - " +
      s"2 * ${s10("sab", "sab", "sa2", "sb2")}) / np + " +
      s"(${s01("taa", "taa", "ta2", "ta2")} + ${s01("tbb", "tbb", "tb2", "tb2")} - " +
      s"2 * ${s01("tab", "tab", "ta2", "tb2")}) / nn)"
  }

  private[operators] val delongFinalExprs: Seq[String] = Seq(
    "CAST(np AS BIGINT) AS n_pos",
    "CAST(nn AS BIGINT) AS n_neg",
    "round(sa2 / (2.0 * nn * np), 6) AS auc_a",
    "round(sb2 / (2.0 * nn * np), 6) AS auc_b",
    "round((sa2 - sb2) / (2.0 * nn * np), 6) AS delta",
    s"round($delongVarExpr, 12) AS var_delta",
    s"round(CASE WHEN $delongVarExpr > 0 THEN " +
      s"((sa2 - sb2) / (2.0 * nn * np)) / sqrt($delongVarExpr) END, 6) AS z")

  def queries: Map[String, Q.QueryFn] = Map(
    "q249_delong_compare" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      // filter A: the q55 quality score; filter B: the naive length
      // heuristic it should beat — the comparison a curation team
      // actually runs before swapping filters
      val scored2 = docs.select(
        q55Score(col("text")).as("qual"),
        round(least(lit(1.0), col("n_chars") / 500.0), 4).as("len_score"),
        col("text").contains("spark").cast("int").as("label"))
      delongAucCompare(scored2, "qual", "len_score", "label")
    }),

    "q248_risk_coverage" -> ((s, dir) =>
      riskCoverageCurve(scoredDocs(s, dir), "score", "label")
        .orderBy(col("conf").desc)),

    "q246_conformal_sets" -> ((s, dir) =>
      conformalSets(scoredDocs(s, dir), "doc_id", "score", "label",
        alpha = 0.1)
        .orderBy(col("doc_id"))),

    "q169_roc_auc" -> ((s, dir) =>
      rocAuc(scoredDocs(s, dir), "score", "label")),

    "q170_calibration" -> ((s, dir) =>
      calibrationBins(scoredDocs(s, dir), "score", "label", nBins = 10)
        .orderBy(col("bin"))),

    // retrieval eval over the q60 kNN ranking: relevance = label match
    // between query vector and candidate (the standard proxy when no
    // human judgments exist); NDCG@10 of the cosine order
    "q189_ndcg" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val labels = emb.select(col("vec_id"), col("label"))
      val ranked = Similarity.bruteForceKnn(emb, nQueries = 5, k = 10)
        .join(labels.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
        .join(labels.select(col("vec_id").as("cid"), col("label").as("cl")), "cid")
        .withColumn("rel", (col("ql") === col("cl")).cast("int"))
      ndcgAtK(ranked, "qid", "rnk", "rel", k = 10).orderBy(col("qid"))
    }),

    // agreement between the two house weak labelers: the planted
    // "mentions spark" label vs "q55 quality score >= 0.35"
    "q190_cohens_kappa" -> ((s, dir) =>
      cohensKappa(
        scoredDocs(s, dir).select(col("doc_id"), col("label").as("a"),
          (col("score") >= 0.35).cast("int").as("b")),
        "a", "b")),

    // binary-relevance metrics over the SAME q60/q189 kNN pool
    "q218_rank_metrics" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val labels = emb.select(col("vec_id"), col("label"))
      val ranked = Similarity.bruteForceKnn(emb, nQueries = 5, k = 10)
        .join(labels.select(col("vec_id").as("qid"), col("label").as("ql")), "qid")
        .join(labels.select(col("vec_id").as("cid"), col("label").as("cl")), "cid")
        .withColumn("rel", (col("ql") === col("cl")).cast("int"))
      rankMetricsAtK(ranked, "qid", "rnk", "rel", k = 10).orderBy(col("qid"))
    }),

    // the q190 pair plus a third weak labeler (n_chars >= 300) — the
    // multi-rater agreement gate kappa can't express
    "q220_krippendorff" -> ((s, dir) =>
      krippendorffAlpha(
        scoredDocs(s, dir)
          .join(Tables.load(s, dir, "documents")
            .select(col("doc_id"), col("n_chars")), "doc_id")
          .select(col("label").as("a"),
            (col("score") >= 0.35).cast("int").as("b"),
            (col("n_chars") >= 300).cast("int").as("c")),
        Seq("a", "b", "c"))),

    "q191_spearman" -> ((s, dir) =>
      spearman(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            q55Score(col("text")).as("score")),
        "n_chars", "score", "doc_id")),

    // drift monitor: "last snapshot" = doc_id < 250 as the reference
    // slice, the rest as current — the planted split both engines carve
    // identically
    "q195_psi" -> ((s, dir) =>
      psi(scoredDocs(s, dir), "score", col("doc_id") < 250, nBins = 10)
        .orderBy(col("bin"))),

    "q200_bootstrap_ci" -> ((s, dir) =>
      bootstrapCi(scoredDocs(s, dir), "doc_id", "score", nReps = 20)),

    "q208_isotonic" -> ((s, dir) =>
      isotonicCalibration(scoredDocs(s, dir), "score", "label", nBins = 10)
        .orderBy(col("bin"))),

    "q232_brier" -> ((s, dir) =>
      brierDecomposition(scoredDocs(s, dir), "score", "label", nBins = 10)),

    "q233_pr_curve" -> ((s, dir) =>
      prCurve(scoredDocs(s, dir), "score", "label")
        .orderBy(col("threshold"))),

    "q243_subgroup_auc" -> ((s, dir) =>
      subgroupAuc(
        scoredDocs(s, dir)
          .join(Tables.load(s, dir, "documents")
            .select(col("doc_id"), col("source")), "doc_id"),
        "source", "score", "label")
        .orderBy(col("g"))),

    "q214_mutual_info" -> ((s, dir) =>
      mutualInformation(
        Tables.load(s, dir, "documents")
          .select(q55Score(col("text")).as("score"),
            col("n_chars").cast("double").as("n_chars")),
        "score", "n_chars", nBins = 10)),

    // label rate between the two largest planted sources — the A/B
    // shape a filter rollout comparison takes
    "q209_two_prop_z" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      twoProportionZ(
        docs.select(col("source"),
          col("text").contains("spark").cast("int").as("label")),
        "source", "label", "src0", "src1")
    })
  )

  def oracle: Map[String, String] = Map(
    "q249_delong_compare" -> {
      def side(m: String) =
        s"""g_$m AS (
           |  SELECT $m,
           |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS negc,
           |    CAST(sum(y) AS BIGINT) AS posc
           |  FROM s2 GROUP BY $m
           |), p_$m AS (
           |  SELECT $m,
           |    2 * coalesce(sum(negc) OVER (ORDER BY $m
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + negc AS p2_$m,
           |    2 * coalesce(sum(posc) OVER (ORDER BY $m DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + posc AS q2_$m
           |  FROM g_$m
           |)""".stripMargin
      s"""WITH sc AS ($scoredSql
         |), s2 AS (
         |  SELECT sc.score AS sa,
         |    round(least(1.0, d.n_chars / 500.0), 4) AS sb,
         |    sc.label AS y
         |  FROM sc JOIN documents d USING (doc_id)
         |), ${side("sa")}, ${side("sb")},
         |items AS (
         |  SELECT s2.y, p_sa.p2_sa, p_sa.q2_sa, p_sb.p2_sb, p_sb.q2_sb
         |  FROM s2 JOIN p_sa USING (sa) JOIN p_sb USING (sb)
         |), agg AS (
         |  SELECT
         |    CAST(count(CASE WHEN y = 1 THEN 1 END) AS DOUBLE) AS np,
         |    CAST(count(CASE WHEN y = 0 THEN 1 END) AS DOUBLE) AS nn,
         |    CAST(sum(CASE WHEN y = 1 THEN CAST(p2_sa AS HUGEINT) END) AS DOUBLE) AS sa2,
         |    CAST(sum(CASE WHEN y = 1 THEN CAST(p2_sb AS HUGEINT) END) AS DOUBLE) AS sb2,
         |    CAST(sum(CASE WHEN y = 1 THEN CAST(p2_sa AS HUGEINT) * p2_sa END) AS DOUBLE) AS saa,
         |    CAST(sum(CASE WHEN y = 1 THEN CAST(p2_sb AS HUGEINT) * p2_sb END) AS DOUBLE) AS sbb,
         |    CAST(sum(CASE WHEN y = 1 THEN CAST(p2_sa AS HUGEINT) * p2_sb END) AS DOUBLE) AS sab,
         |    CAST(sum(CASE WHEN y = 0 THEN CAST(q2_sa AS HUGEINT) END) AS DOUBLE) AS ta2,
         |    CAST(sum(CASE WHEN y = 0 THEN CAST(q2_sb AS HUGEINT) END) AS DOUBLE) AS tb2,
         |    CAST(sum(CASE WHEN y = 0 THEN CAST(q2_sa AS HUGEINT) * q2_sa END) AS DOUBLE) AS taa,
         |    CAST(sum(CASE WHEN y = 0 THEN CAST(q2_sb AS HUGEINT) * q2_sb END) AS DOUBLE) AS tbb,
         |    CAST(sum(CASE WHEN y = 0 THEN CAST(q2_sa AS HUGEINT) * q2_sb END) AS DOUBLE) AS tab
         |  FROM items
         |)
         |SELECT ${delongFinalExprs.mkString(",\n  ")}
         |FROM agg""".stripMargin
    },

    "q248_risk_coverage" ->
      s"""WITH scored AS ($scoredSql
        |), base AS (
        |  SELECT round(abs(score - 0.5) * 2.0, 4) AS conf,
        |    CASE WHEN (CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) <> label
        |      THEN 1 ELSE 0 END AS err
        |  FROM scored
        |), g AS (
        |  SELECT conf, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(err) AS BIGINT) AS e_g
        |  FROM base GROUP BY conf
        |), c AS (
        |  SELECT conf, n_g,
        |    sum(n_g) OVER (ORDER BY conf DESC) AS n_cum,
        |    sum(e_g) OVER (ORDER BY conf DESC) AS e_cum
        |  FROM g
        |), t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_all FROM g)
        |SELECT conf, CAST(n_cum AS BIGINT) AS n_cum,
        |  round(CAST(n_cum AS DOUBLE) / n_all, 6) AS coverage,
        |  round(CAST(e_cum AS DOUBLE) / n_cum, 6) AS risk,
        |  round(CAST(n_g AS DOUBLE) / n_all *
        |    (CAST(e_cum AS DOUBLE) / n_cum), 6) AS aurc_part
        |FROM c CROSS JOIN t
        |ORDER BY conf DESC""".stripMargin,

    "q246_conformal_sets" ->
      s"""WITH scored AS ($scoredSql
        |), base AS (
        |  SELECT doc_id, score AS s, label AS y,
        |    (CAST(CAST('0x' || substring(md5('conf:' || doc_id), 1, 8)
        |      AS UBIGINT) AS BIGINT) + 0.5) / 4294967296.0 < 0.5 AS is_cal
        |  FROM scored
        |), cal AS (
        |  SELECT CASE WHEN y = 1 THEN round(1.0 - s, 6) ELSE s END AS a
        |  FROM base WHERE is_cal
        |), kk AS (
        |  SELECT CAST(ceil((count(*) + 1) * 0.9) AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_cal
        |  FROM cal
        |), qh AS (
        |  SELECT CASE WHEN k > n_cal THEN 1.7976931348623157e308 ELSE (
        |    SELECT min(a) FROM (
        |      SELECT a, sum(c) OVER (ORDER BY a) AS cum FROM (
        |        SELECT a, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY a) t1
        |    ) t2 WHERE cum >= k) END AS q_hat
        |  FROM kk
        |)
        |SELECT b.doc_id, b.s AS score, b.y AS label,
        |  b.s <= q.q_hat AS in_set_0,
        |  round(1.0 - b.s, 6) <= q.q_hat AS in_set_1,
        |  CASE WHEN b.y = 1 THEN round(1.0 - b.s, 6) <= q.q_hat
        |       ELSE b.s <= q.q_hat END AS covered
        |FROM base b CROSS JOIN qh q
        |WHERE NOT b.is_cal
        |ORDER BY b.doc_id""".stripMargin,

    "q169_roc_auc" ->
      s"""WITH lab AS ($scoredSql
        |), g AS (
        |  SELECT score, count(*) AS n_s, sum(label) AS p_s
        |  FROM lab GROUP BY score
        |), c AS (
        |  SELECT score, n_s, p_s,
        |    coalesce(sum(n_s) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM g
        |), t AS (
        |  SELECT sum(p_s * (2 * below + n_s + 1)) AS r2,
        |    sum(p_s) AS n_pos, sum(n_s - p_s) AS n_neg
        |  FROM c
        |)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  round(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
        |    (2.0 * n_pos * n_neg), 6) AS auc
        |FROM t""".stripMargin,

    "q170_calibration" ->
      s"""WITH lab AS ($scoredSql
        |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_all FROM lab
        |), b AS (
        |  SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
        |    count(*) AS n, sum(label) AS n_pos,
        |    round(CAST(sum(CAST(score AS DECIMAL(18,4))) AS DOUBLE) /
        |      count(*), 6) AS mean_score
        |  FROM lab GROUP BY 1
        |)
        |SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
        |  mean_score,
        |  round(CAST(n_pos AS DOUBLE) / n, 6) AS frac_pos,
        |  round(abs(round(CAST(n_pos AS DOUBLE) / n, 6) - mean_score) *
        |    n / n_all, 6) AS ece_part
        |FROM b CROSS JOIN n
        |ORDER BY bin""".stripMargin,

    "q189_ndcg" ->
      s"""WITH ${Similarity.duckPrep},
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(list_dot_product(q.vd, c.vd) / (q.nrm * c.nrm), 6) AS cos
         |  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
         |), pool AS (
         |  SELECT qid, cid, rnk FROM (
         |    SELECT qid, cid, cos,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
         |    FROM scored) t
         |  WHERE rnk <= 10
         |), rel AS (
         |  SELECT p.qid, p.rnk,
         |    CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END AS rel
         |  FROM pool p
         |  JOIN embeddings lq ON lq.vec_id = p.qid
         |  JOIN embeddings lc ON lc.vec_id = p.cid
         |), ideal AS (
         |  SELECT qid, rnk, rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, rnk) AS irank
         |  FROM rel
         |), agg AS (
         |  SELECT qid, sum(rel) AS n_rel,
         |    sum(CASE WHEN rnk <= 10
         |      THEN CAST(rel / log2(rnk + 1) AS DECIMAL(28,12)) END) AS dcg_d,
         |    sum(CASE WHEN irank <= 10
         |      THEN CAST(rel / log2(irank + 1) AS DECIMAL(28,12)) END) AS idcg_d
         |  FROM ideal GROUP BY qid
         |)
         |SELECT qid, CAST(n_rel AS BIGINT) AS n_rel,
         |  round(CAST(coalesce(dcg_d, 0) AS DOUBLE), 6) AS dcg,
         |  round(CAST(coalesce(idcg_d, 0) AS DOUBLE), 6) AS idcg,
         |  CASE WHEN coalesce(idcg_d, 0) = 0 THEN 0.0
         |    ELSE round(CAST(dcg_d AS DOUBLE) / CAST(idcg_d AS DOUBLE), 6)
         |  END AS ndcg
         |FROM agg
         |ORDER BY qid""".stripMargin,

    "q243_subgroup_auc" ->
      s"""WITH lab AS ($scoredSql
         |), j AS (
         |  SELECT d.source AS g, s.score, s.label
         |  FROM documents d JOIN lab s ON d.doc_id = s.doc_id
         |), gg AS (
         |  SELECT g, CAST(score AS DOUBLE) AS score,
         |    CAST(count(*) AS BIGINT) AS n_s,
         |    CAST(sum(label) AS BIGINT) AS p_s
         |  FROM j GROUP BY g, CAST(score AS DOUBLE)
         |), c AS (
         |  SELECT g, n_s, p_s,
         |    CAST(coalesce(sum(n_s) OVER (PARTITION BY g ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS below
         |  FROM gg
         |), a AS (
         |  SELECT g,
         |    CAST(sum(p_s * (2 * below + n_s + 1)) AS BIGINT) AS r2,
         |    CAST(sum(p_s) AS BIGINT) AS n_pos,
         |    CAST(sum(n_s - p_s) AS BIGINT) AS n_neg
         |  FROM c GROUP BY g
         |)
         |SELECT g, n_pos + n_neg AS n, n_pos, n_neg,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |    ELSE round(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |      (2.0 * n_pos * n_neg), 6) END AS auc
         |FROM a
         |ORDER BY g""".stripMargin,

    "q233_pr_curve" ->
      s"""WITH lab AS ($scoredSql
         |), g AS (
         |  SELECT CAST(score AS DOUBLE) AS threshold,
         |    CAST(count(*) AS BIGINT) AS n_s,
         |    CAST(sum(label) AS BIGINT) AS p_s
         |  FROM lab GROUP BY 1
         |), tot AS (SELECT CAST(sum(p_s) AS BIGINT) AS pos FROM g),
         |c AS (
         |  SELECT threshold,
         |    CAST(sum(n_s) OVER (ORDER BY threshold DESC
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pred_pos,
         |    CAST(sum(p_s) OVER (ORDER BY threshold DESC
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp
         |  FROM g
         |), m AS (
         |  SELECT threshold, tp, pred_pos - tp AS fp, pos - tp AS fn,
         |    CASE WHEN pred_pos = 0 THEN 0.0
         |      ELSE round(CAST(tp AS DOUBLE) / pred_pos, 6) END AS precision,
         |    CASE WHEN pos = 0 THEN 0.0
         |      ELSE round(CAST(tp AS DOUBLE) / pos, 6) END AS recall,
         |    CASE WHEN pred_pos + pos = 0 THEN 0.0
         |      ELSE round(CAST(2 * tp AS DOUBLE) / (pred_pos + pos), 6)
         |    END AS f1
         |  FROM c CROSS JOIN tot
         |), best AS (SELECT max(f1) AS best_f1 FROM m)
         |SELECT threshold, tp, fp, fn, precision, recall, f1, best_f1
         |FROM m CROSS JOIN best
         |ORDER BY threshold""".stripMargin,

    "q232_brier" ->
      s"""WITH lab AS ($scoredSql
         |), base AS (
         |  SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
         |    CAST(score AS DOUBLE) AS score, CAST(label AS BIGINT) AS label,
         |    CAST(score AS DECIMAL(18,4)) - label AS e
         |  FROM lab
         |), bins AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
         |    CAST(sum(label) AS BIGINT) AS n_pos,
         |    sum(CAST(score AS DECIMAL(18,4))) AS ssc,
         |    sum(e * e) AS sse
         |  FROM base GROUP BY bin
         |), tot AS (
         |  SELECT CAST(sum(n_b) AS BIGINT) AS n_all,
         |    CAST(sum(n_pos) AS BIGINT) AS pos_all, sum(sse) AS sse_all
         |  FROM bins
         |), c AS (
         |  SELECT max(n_all) AS n, max(pos_all) AS pos_all,
         |    max(sse_all) AS sse_all,
         |    sum(CAST(n_b * pow(CAST(ssc AS DOUBLE) / n_b -
         |      CAST(n_pos AS DOUBLE) / n_b, 2) AS DECIMAL(38,18))) AS rel_d,
         |    sum(CAST(n_b * pow(CAST(n_pos AS DOUBLE) / n_b -
         |      CAST(pos_all AS DOUBLE) / n_all, 2) AS DECIMAL(38,18))) AS res_d
         |  FROM bins CROSS JOIN tot
         |)
         |SELECT CAST(n AS BIGINT) AS n,
         |  round(CAST(sse_all AS DOUBLE) / n, 6) AS brier,
         |  round(CAST(rel_d AS DOUBLE) / n, 6) AS reliability,
         |  round(CAST(res_d AS DOUBLE) / n, 6) AS resolution,
         |  round((CAST(pos_all AS DOUBLE) / n) *
         |    (CAST(1.0 AS DOUBLE) - CAST(pos_all AS DOUBLE) / n), 6)
         |    AS uncertainty
         |FROM c""".stripMargin,

    "q218_rank_metrics" ->
      s"""WITH ${Similarity.duckPrep},
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(list_dot_product(q.vd, c.vd) / (q.nrm * c.nrm), 6) AS cos
         |  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
         |), pool AS (
         |  SELECT qid, cid, rnk FROM (
         |    SELECT qid, cid, cos,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
         |    FROM scored) t
         |  WHERE rnk <= 10
         |), rel AS (
         |  SELECT p.qid, p.rnk,
         |    CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END AS rel
         |  FROM pool p
         |  JOIN embeddings lq ON lq.vec_id = p.qid
         |  JOIN embeddings lc ON lc.vec_id = p.cid
         |), cum AS (
         |  SELECT qid, rnk, rel,
         |    sum(rel) OVER (PARTITION BY qid ORDER BY rnk) AS cum_rel
         |  FROM rel
         |), agg AS (
         |  SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel,
         |    min(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
         |    sum(CASE WHEN rel = 1 AND rnk <= 10
         |      THEN CAST(CAST(cum_rel AS DOUBLE) / rnk AS DECIMAL(28,12)) END)
         |      AS ap_num
         |  FROM cum GROUP BY qid
         |)
         |SELECT qid, n_rel,
         |  CASE WHEN first_rel IS NULL THEN 0.0
         |    ELSE round(CAST(1.0 AS DOUBLE) / first_rel, 6) END AS mrr,
         |  round(CAST(n_rel AS DOUBLE) / 10, 6) AS p_at_k,
         |  CASE WHEN n_rel = 0 THEN 0.0
         |    ELSE round(CAST(ap_num AS DOUBLE) / n_rel, 6) END AS ap
         |FROM agg
         |ORDER BY qid""".stripMargin,

    "q220_krippendorff" ->
      s"""WITH lab AS ($scoredSql
         |), r AS (
         |  SELECT s.label +
         |    (CASE WHEN s.score >= 0.35 THEN 1 ELSE 0 END) +
         |    (CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END) AS n_u1
         |  FROM lab s JOIN documents d ON d.doc_id = s.doc_id
         |), agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS units,
         |    CAST(sum(n_u1 * (3 - n_u1)) AS BIGINT) AS num_o,
         |    CAST(sum(n_u1) AS BIGINT) AS n1
         |  FROM r
         |), t AS (
         |  SELECT units, 3 * units AS n, 3 * units - n1 AS n0, n1, num_o
         |  FROM agg
         |)
         |SELECT units, n, n0, n1,
         |  round(CAST(2 * num_o AS DOUBLE) / (2 * n), 6) AS d_o,
         |  round(CAST(2 * n0 * n1 AS DOUBLE) / (n * (n - 1)), 6) AS d_e,
         |  round(CAST(1.0 AS DOUBLE) - CAST(num_o * (n - 1) AS DOUBLE) /
         |    CAST(2 * n0 * n1 AS DOUBLE), 6) AS alpha
         |FROM t""".stripMargin,

    "q190_cohens_kappa" ->
      s"""WITH lab AS ($scoredSql
         |), ab AS (
         |  SELECT label AS a,
         |    CASE WHEN score >= 0.35 THEN 1 ELSE 0 END AS b
         |  FROM lab
         |), cells AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM ab
         |), pop AS (
         |  SELECT n, n11, n10, n01, n00,
         |    round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
         |    round(CAST((n11 + n10) * (n11 + n01) +
         |               (n01 + n00) * (n10 + n00) AS DOUBLE) / (n * n), 6) AS pe
         |  FROM cells
         |)
         |SELECT n, n11, n10, n01, n00, po, pe,
         |  round((po - pe) / (1.0 - pe), 6) AS kappa
         |FROM pop""".stripMargin,

    "q191_spearman" ->
      s"""WITH lab AS (
         |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS xv, score AS yv
         |  FROM (SELECT d.doc_id, d.n_chars, s.score
         |        FROM documents d JOIN ($scoredSql) s ON d.doc_id = s.doc_id)
         |), rxg AS (
         |  SELECT xv, count(*) AS n_v,
         |    coalesce(sum(count(*)) OVER (ORDER BY xv
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         |  FROM lab GROUP BY xv
         |), ryg AS (
         |  SELECT yv, count(*) AS n_v,
         |    coalesce(sum(count(*)) OVER (ORDER BY yv
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         |  FROM lab GROUP BY yv
         |), j AS (
         |  SELECT l.doc_id,
         |    rx.below + (rx.n_v + 1) / 2.0 AS rx,
         |    ry.below + (ry.n_v + 1) / 2.0 AS ry
         |  FROM lab l JOIN rxg rx ON l.xv = rx.xv JOIN ryg ry ON l.yv = ry.yv
         |), m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(rx AS DECIMAL(38,6))) AS sx,
         |    sum(CAST(ry AS DECIMAL(38,6))) AS sy,
         |    sum(CAST(rx * ry AS DECIMAL(38,6))) AS sxy,
         |    sum(CAST(rx * rx AS DECIMAL(38,6))) AS sxx,
         |    sum(CAST(ry * ry AS DECIMAL(38,6))) AS syy
         |  FROM j
         |)
         |SELECT n,
         |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
         |FROM m""".stripMargin,

    "q214_mutual_info" ->
      s"""WITH lab AS ($scoredSql
         |), v AS (
         |  SELECT s.score AS x, CAST(d.n_chars AS DOUBLE) AS y
         |  FROM documents d JOIN lab s ON d.doc_id = s.doc_id
         |), ext AS (
         |  SELECT min(x) AS xmn, max(x) AS xmx,
         |    min(y) AS ymn, max(y) AS ymx FROM v
         |), binned AS (
         |  SELECT
         |    CASE WHEN xmx = xmn THEN 0
         |      ELSE CAST(least(floor((x - xmn) / (xmx - xmn) * 10), 9) AS INT)
         |    END AS gx,
         |    CASE WHEN ymx = ymn THEN 0
         |      ELSE CAST(least(floor((y - ymn) / (ymx - ymn) * 10), 9) AS INT)
         |    END AS gy
         |  FROM v CROSS JOIN ext
         |), joint AS (
         |  SELECT gx, gy, CAST(count(*) AS BIGINT) AS cxy
         |  FROM binned GROUP BY gx, gy
         |), mxt AS (SELECT gx, sum(cxy) AS cx FROM joint GROUP BY gx),
         |myt AS (SELECT gy, sum(cxy) AS cy FROM joint GROUP BY gy),
         |nt AS (SELECT sum(cxy) AS n FROM joint),
         |t AS (
         |  SELECT j.cxy, m1.cx, m2.cy, nt.n
         |  FROM joint j JOIN mxt m1 USING (gx) JOIN myt m2 USING (gy)
         |  CROSS JOIN nt
         |), agg AS (
         |  SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
         |    sum(CAST(CAST(cxy AS DOUBLE) / n *
         |      ln(CAST(cxy AS DOUBLE) * n / (cx * cy)) AS DECIMAL(38,18))) AS mi_d,
         |    sum(CAST(CAST(cxy AS DOUBLE) / n *
         |      ln(CAST(cx AS DOUBLE) / n) AS DECIMAL(38,18))) AS hx_d,
         |    sum(CAST(CAST(cxy AS DOUBLE) / n *
         |      ln(CAST(cy AS DOUBLE) / n) AS DECIMAL(38,18))) AS hy_d
         |  FROM t
         |)
         |SELECT CAST(n AS BIGINT) AS n, n_cells,
         |  round(CAST(mi_d AS DOUBLE), 6) AS mi,
         |  round(-CAST(hx_d AS DOUBLE), 6) AS h_x,
         |  round(-CAST(hy_d AS DOUBLE), 6) AS h_y,
         |  round(CAST(mi_d AS DOUBLE) /
         |    sqrt(CAST(hx_d AS DOUBLE) * CAST(hy_d AS DOUBLE)), 6) AS nmi
         |FROM agg""".stripMargin,

    "q208_isotonic" ->
      s"""WITH lab AS ($scoredSql
         |), b AS (
         |  SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(label) AS BIGINT) AS n_pos
         |  FROM lab GROUP BY 1
         |), pre AS (
         |  SELECT bin, n, n_pos,
         |    round(CAST(n_pos AS DOUBLE) / n, 6) AS frac_pos,
         |    sum(n) OVER (ORDER BY bin) AS cn,
         |    sum(n_pos) OVER (ORDER BY bin) AS cp
         |  FROM b
         |), jt AS (SELECT bin AS j, cn - n AS cnj, cp - n_pos AS cpj FROM pre),
         |kt AS (SELECT bin AS k, cn AS cnk, cp AS cpk FROM pre),
         |it AS (SELECT bin AS i, n, n_pos, frac_pos FROM pre),
         |grid AS (
         |  SELECT i, n, n_pos, frac_pos, j,
         |    CAST(cpk - cpj AS DOUBLE) / (cnk - cnj) AS wavg
         |  FROM it CROSS JOIN jt CROSS JOIN kt
         |  WHERE j <= i AND i <= k
         |), m1 AS (
         |  SELECT i, n, n_pos, frac_pos, j, min(wavg) AS minw
         |  FROM grid GROUP BY i, n, n_pos, frac_pos, j
         |)
         |SELECT i AS bin, n, n_pos, frac_pos,
         |  round(max(minw), 6) AS iso_fitted
         |FROM m1 GROUP BY i, n, n_pos, frac_pos
         |ORDER BY bin""".stripMargin,

    "q209_two_prop_z" ->
      """WITH lab AS (
        |  SELECT source,
        |    CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS label
        |  FROM documents WHERE source IN ('src0', 'src1')
        |), cells AS (
        |  SELECT (source = 'src0') AS is_a,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS pos
        |  FROM lab GROUP BY 1
        |), a AS (SELECT n AS na, pos AS xa FROM cells WHERE is_a),
        |b AS (SELECT n AS nb, pos AS xb FROM cells WHERE NOT is_a)
        |SELECT na, xa, nb, xb,
        |  round(CAST(xa AS DOUBLE) / na, 6) AS p_a,
        |  round(CAST(xb AS DOUBLE) / nb, 6) AS p_b,
        |  round(CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb, 6) AS diff,
        |  CASE WHEN sqrt(CAST(xa + xb AS DOUBLE) / (na + nb) *
        |      (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb)) *
        |      (1.0 / na + 1.0 / nb)) > 0
        |    THEN round((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb) /
        |      sqrt(CAST(xa + xb AS DOUBLE) / (na + nb) *
        |        (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb)) *
        |        (1.0 / na + 1.0 / nb)), 6)
        |  END AS z,
        |  round(CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb -
        |    1.96 * sqrt(CAST(xa AS DOUBLE) / na * (1.0 - CAST(xa AS DOUBLE) / na) / na +
        |      CAST(xb AS DOUBLE) / nb * (1.0 - CAST(xb AS DOUBLE) / nb) / nb), 6) AS ci_lo,
        |  round(CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb +
        |    1.96 * sqrt(CAST(xa AS DOUBLE) / na * (1.0 - CAST(xa AS DOUBLE) / na) / na +
        |      CAST(xb AS DOUBLE) / nb * (1.0 - CAST(xb AS DOUBLE) / nb) / nb), 6) AS ci_hi
        |FROM a CROSS JOIN b""".stripMargin,

    "q195_psi" ->
      s"""WITH lab AS ($scoredSql
         |), b AS (
         |  SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
         |    sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS n_ref,
         |    sum(CASE WHEN doc_id < 250 THEN 0 ELSE 1 END) AS n_cur
         |  FROM lab GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
         |    CAST(sum(n_cur) AS DOUBLE) AS tc FROM b
         |), grid AS (SELECT unnest(generate_series(0, 9)) AS bin),
         |p AS (
         |  SELECT g.bin,
         |    CAST(coalesce(b.n_ref, 0) AS BIGINT) AS n_ref,
         |    CAST(coalesce(b.n_cur, 0) AS BIGINT) AS n_cur,
         |    greatest(coalesce(b.n_ref, 0) / tot.tr, 1e-6) AS p_ref,
         |    greatest(coalesce(b.n_cur, 0) / tot.tc, 1e-6) AS p_cur
         |  FROM grid g LEFT JOIN b ON g.bin = b.bin CROSS JOIN tot
         |)
         |SELECT CAST(bin AS INT) AS bin, n_ref, n_cur,
         |  round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
         |  round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_part
         |FROM p
         |ORDER BY bin""".stripMargin,

    "q200_bootstrap_ci" ->
      s"""WITH lab AS ($scoredSql
         |), reps AS (
         |  SELECT r.rep, l.doc_id, CAST(l.score AS DECIMAL(18,4)) AS s
         |  FROM lab l
         |  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS rep) r
         |  WHERE CAST(CAST('0x' || substring(md5(
         |    CAST(r.rep AS VARCHAR) || ':' || CAST(l.doc_id AS VARCHAR)),
         |    1, 8) AS UBIGINT) AS BIGINT) < ${math.floor(0.632 * 4294967296.0).toLong}
         |), m AS (
         |  SELECT rep, count(*) AS n,
         |    CAST(sum(s) AS DOUBLE) / count(*) AS mean_s
         |  FROM reps GROUP BY rep
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |  round(CAST(sum(CAST(mean_s AS DECIMAL(18,4))) AS DOUBLE) /
         |    count(*), 6) AS boot_mean,
         |  round(quantile_cont(mean_s, 0.025), 6) AS ci_lo,
         |  round(quantile_cont(mean_s, 0.975), 6) AS ci_hi
         |FROM m""".stripMargin
  )
}
