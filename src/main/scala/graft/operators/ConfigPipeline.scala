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

  /** q251 — the VRL (remap) processor on the graded path: the config
    * pipeline runs the reference's `vrl` processor kind with a program
    * exercising its core surface (local variable, upcase, expression-form
    * if/else, fallible `, err =` assignment, truncate) between the codec
    * round-trip and the SQL aggregate, and the oracle recomputes the
    * same values in plain SQL. Closes the seam where VRL semantics were
    * only ScalaTest-graded (processor/vrl.rs; examples/vrl_example.yaml
    * dialect). */
  private def q251(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q251").toString
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
         |        - type: vrl
         |          statement: |
         |            base = 2
         |            .uname = upcase(.n_name)
         |            .bucket = if .n_regionkey > base { "high" } else { "low" }
         |            .nk2, err = .n_nationkey * base
         |            .short = truncate(.n_name, 3)
         |        - type: sql
         |          query: "SELECT bucket, count(*) AS n, min(uname) AS first_uname, sum(nk2) AS sum_nk2, min(short) AS first_short FROM flow GROUP BY bucket"
         |    output:
         |      type: parquet
         |      path: "$out"
         |""".stripMargin
    graft.streaming.Engine.run(spark, graft.streaming.Config.fromYaml(yaml))
    spark.read.parquet(out)
      .select("bucket", "n", "first_uname", "sum_nk2", "first_short")
  }

  /** q252 — the python processor on the graded path: the config pipeline
    * spawns the reference's python worker (full-module `script` +
    * `function:`, per-batch schema inference — no output_schema) to
    * derive a character count per document, and the oracle recomputes
    * the same aggregate from `length(text)` directly
    * (processor/python.rs contract; worker = python3 + pyarrow over
    * Arrow IPC). */
  private def q252(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q252").toString
    val out = s"$base/out"
    val yaml =
      s"""streams:
         |  - input:
         |      type: file
         |      format: parquet
         |      path: "$dir/documents.parquet"
         |    pipeline:
         |      processors:
         |        - type: python
         |          script: |
         |            import pyarrow as pa
         |
         |            def doc_stats(batch):
         |                texts = [t.as_py() for t in batch.column('text')]
         |                return pa.RecordBatch.from_arrays(
         |                    [batch.column('doc_id'), batch.column('lang'),
         |                     pa.array([len(t) for t in texts], type=pa.int64())],
         |                    names=['doc_id', 'lang', 'chars'])
         |          function: doc_stats
         |        - type: sql
         |          query: "SELECT lang, count(*) AS docs, sum(chars) AS total_chars, min(doc_id) AS first_doc FROM flow GROUP BY lang"
         |    output:
         |      type: parquet
         |      path: "$out"
         |""".stripMargin
    graft.streaming.Engine.run(spark, graft.streaming.Config.fromYaml(yaml))
    spark.read.parquet(out).select("lang", "docs", "total_chars", "first_doc")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q250_config_pipeline" -> ((s, dir) => q250(s, dir)),
    "q251_config_vrl" -> ((s, dir) => q251(s, dir)),
    "q252_config_python" -> ((s, dir) => q252(s, dir)))

  def oracle: Map[String, String] = Map(
    "q250_config_pipeline" ->
      """SELECT n_regionkey, count(*) AS nations, min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "q251_config_vrl" ->
      """SELECT CASE WHEN n_regionkey > 2 THEN 'high' ELSE 'low' END AS bucket,
        |       count(*) AS n, min(upper(n_name)) AS first_uname,
        |       CAST(sum(n_nationkey * 2) AS BIGINT) AS sum_nk2,
        |       min(substr(n_name, 1, 3)) AS first_short
        |FROM nation GROUP BY 1""".stripMargin,
    "q252_config_python" ->
      """SELECT lang, count(*) AS docs, CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |       min(doc_id) AS first_doc
        |FROM documents GROUP BY lang""".stripMargin)
}
