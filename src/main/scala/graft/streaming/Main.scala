package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI entry point — the equivalent of the reference's
  * `arkflow --config stream.yaml` (crates/arkflow/src/main.rs:24-40):
  * load the YAML engine config, run every stream.
  *
  * Usage: runMain graft.streaming.Main <config.yaml> [maxSeconds]
  * Streaming queries run until maxSeconds (default: forever).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val configPath = args(0)
    val maxSeconds = args.lift(1).map(_.toLong)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(configPath)), java.nio.charset.StandardCharsets.UTF_8)
    val queries = Engine.run(spark, Config.fromYaml(yaml))
    maxSeconds match {
      case Some(s) =>
        Thread.sleep(s * 1000)
        queries.foreach(_.stop())
      case None =>
        queries.foreach(_.awaitTermination())
    }
    spark.stop()
  }
}
