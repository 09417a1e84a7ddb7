package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def queries: Map[String, Q.QueryFn] = Map(
    "q169_roc_auc" -> ((s, dir) =>
      rocAuc(scoredDocs(s, dir), "score", "label")),

    "q170_calibration" -> ((s, dir) =>
      calibrationBins(scoredDocs(s, dir), "score", "label", nBins = 10)
        .orderBy(col("bin")))
  )

  def oracle: Map[String, String] = Map(
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
        |ORDER BY bin""".stripMargin
  )
}
