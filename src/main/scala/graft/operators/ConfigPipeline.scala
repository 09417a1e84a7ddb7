package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** q250 — one complete YAML stream config graded against the DuckDB
  * oracle: the whole CONFIG path (Config.fromYaml → Engine.run → file
  * input → arrow_to_json → json_to_arrow → sql processor → parquet sink)
  * produces the rows the oracle SQL computes directly over the same
  * table. Every piece of that chain is spec-tested individually; this
  * entry closes the seam where the config-driven composition itself was
  * only ScalaTest-graded (round-8/9 advice): a regression anywhere in
  * parse → dispatch → codec round-trip → SQL → sink now trips the
  * hash-compare correctness gate, not just unit suites.
  *
  * The JSON codec round-trip (arrow_to_json → json_to_arrow) is
  * deliberate: it exercises the reference's envelope convention
  * (crates/arkflow-core/src/lib.rs:52 binary `__value__` column) and
  * per-batch schema inference on the graded path, and the oracle proves
  * the round-trip is value- and type-exact for the table's longs and
  * strings.
  */
object ConfigPipeline {

  private def q250(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q250").toString
    val out = s"$base/out"
    val yaml =
      s"""streams:
         |  - input:
         |      type: file
         |      format: parquet
         |      path: "$dir/nation.parquet"
         |    pipeline:
         |      processors:
         |        - type: arrow_to_json
         |        - type: json_to_arrow
         |        - type: sql
         |          query: "SELECT n_regionkey, count(*) AS nations, min(n_name) AS first_name FROM flow GROUP BY n_regionkey"
         |    output:
         |      type: parquet
         |      path: "$out"
         |""".stripMargin
    val conf = graft.streaming.Config.fromYaml(yaml)
    // file input = batch semantics: run() executes the stream to EOF
    // synchronously through Engine.runBatch and the parquet sink
    graft.streaming.Engine.run(spark, conf)
    spark.read.parquet(out).select("n_regionkey", "nations", "first_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q250_config_pipeline" -> ((s, dir) => q250(s, dir)))

  def oracle: Map[String, String] = Map(
    "q250_config_pipeline" ->
      """SELECT n_regionkey, count(*) AS nations, min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey""".stripMargin)
}
