package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe harness behind SCALING.md's "measured at 4×" tables:
  * builds the perturbed 4× corpus (three near-duplicate copies per
  * document, one token prepended — the adversarial mostly-shared-ngrams
  * case) and times an operator at 1× and 4× in one session. Earlier
  * rounds ran this ad hoc; checked in so the probes are re-runnable.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ScaleProbe [op]
  */
object ScaleProbe {

  /** 4× perturbation: copies c=1..3 prepend "c<c>dup" and shift ids. */
  def perturb4x(docs: DataFrame): DataFrame = {
    val n = lit(1000000L)
    (1 to 3).map(c =>
      docs.select((col("doc_id") + n * c).as("doc_id"),
        concat(lit(s"c${c}dup "), col("text")).as("text"),
        col("source"), col("lang")))
      .foldLeft(docs.select(col("doc_id"), col("text"), col("source"), col("lang")))(_ unionByName _)
  }

  private def time(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = body
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $rows%9d rows")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val op = args.headOption.getOrElse("simhash_auto")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Shims.register(spark)
    val docs = Tables.load(spark, sfDir, "documents").localCheckpoint(true)
    val big = perturb4x(docs).localCheckpoint(true)
    println(s"[probe] corpus 1x=${docs.count()} docs, 4x=${big.count()} docs")
    op match {
      case "simhash_auto" =>
        for (d <- Seq(docs, big)) {
          val n = d.count()
          val bits = operators.Dedup.simhashAutoBits(n)
          time(s"simhash auto (n=$n -> bits=$bits)") {
            operators.Dedup.simhashNearDupPairs(d, "doc_id", "text", maxDist = 2).count()
          }
        }
        // the pinned-16 comparison row (the documented saturation trap)
        for (d <- Seq(docs, big)) {
          val n = d.count()
          time(s"simhash pinned bits=16 (n=$n)") {
            operators.Dedup.simhashBandedPairs(
              operators.Dedup.simhash(d, "doc_id", "text", bits = 16),
              maxDist = 2, bits = 16).count()
          }
        }
      case "adamic_adar" =>
        for (d <- Seq(docs, big)) {
          val n = d.count()
          val pairs = operators.Dedup.minhashPairs(d, "doc_id", "text")
          time(s"adamic-adar (n=$n)") {
            operators.Corpus.adamicAdar(pairs, "doc_a", "doc_b").count()
          }
        }
      case other => sys.error(s"unknown probe op: $other")
    }
    spark.stop()
  }
}
