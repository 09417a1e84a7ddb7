package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement main for the optimization round — not part of
  * the driver contract; deleted before the round closes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_bench_sf0.1_8f")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-bench-local")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (sys.env.get("SCRATCH_MINPART").isDefined)
      b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env("SCRATCH_MINPART"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"[scratch] calib=${Bench.calibrate(spark)}%.3f s (quiet pin 0.45)")
    def time(label: String)(mk: => DataFrame): Unit = {
      def one(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      one()
      val ts = (1 to 3).map(_ => one())
      println(f"[scratch] $label min=${ts.min}%.3f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    for (q <- Seq("q217_hits", "q99_pagerank", "q178_adamic_adar")) {
      time(q)(SparkEntry.queries(q)(spark, sfDir))
    }
    spark.stop()
  }
}
