package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, ParsedStatement}
import org.apache.spark.sql.functions._

/** Processors (SURVEY.md §2.3): batch-in/batch-out transforms applied in
  * order inside foreachBatch — the Spark shape of the reference pipeline
  * (crates/arkflow-core/src/pipeline/mod.rs:57-85). An empty output frame
  * is the `None` result; fan-out (`Multiple`) is a union.
  */
object Processors {

  type BatchTransform = DataFrame => DataFrame

  /** `sql` processor (processor/sql.rs:39-201): registers the batch as
    * `tableName` and runs one pre-validated statement. DDL/DML are
    * rejected at build time like the reference's SQLOptions
    * (sql.rs:185-201), by inspecting the parsed plan.
    */
  final case class SqlProcessor(query: String, tableName: String = "flow")
      extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = {
      val spark = batch.sparkSession
      validate(spark.sessionState.sqlParser.parsePlan(query))
      batch.createOrReplaceTempView(tableName)
      spark.sql(query)
    }
    private def validate(plan: LogicalPlan): Unit = plan match {
      case _: Command | _: ParsedStatement | _: InsertIntoStatement =>
        throw new IllegalArgumentException(
          s"sql processor only accepts queries, got: ${plan.getClass.getSimpleName}")
      case _ => ()
    }
  }

  /** `json_to_arrow` (processor/json.rs:38-72): binary JSON envelope ->
    * columns with per-batch inference and optional projection. */
  final case class JsonToArrow(fieldsToInclude: Seq[String] = Nil)
      extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = Codecs.JsonCodec(fieldsToInclude).decode(batch)
  }

  /** `arrow_to_json` (processor/json.rs:75-114): serialize all columns to a
    * JSON-line `__value__`, keeping the original columns alongside. */
  case object ArrowToJson extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame =
      batch.withColumn(Codecs.ValueCol,
        to_json(struct(batch.columns.map(col): _*)).cast("binary"))
  }

  /** `protobuf_to_arrow` / `arrow_to_protobuf` via the native wire-format
    * expressions in [[Protobuf]]. */
  final case class ProtobufToArrow(fields: Seq[ProtoField]) extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = {
      Protobuf.register(batch.sparkSession, "p", fields)
      batch.selectExpr(s"proto_decode_p(${Codecs.ValueCol}) AS __m").select("__m.*")
    }
  }
  final case class ArrowToProtobuf(fields: Seq[ProtoField]) extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = {
      Protobuf.register(batch.sparkSession, "p", fields)
      val cols = fields.map(f => col(f.name)).toArray
      batch.select(struct(cols: _*).as("__m"))
        .selectExpr(s"proto_encode_p(__m) AS ${Codecs.ValueCol}")
    }
  }

  /** `batch` processor (processor/batch.rs:31-127): the reference merges
    * micro-batches up to count/size/interval; in Spark the trigger owns
    * batch granularity, so this is partition compaction only. */
  final case class BatchCompact(partitions: Int) extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = batch.coalesce(partitions)
  }

  /** Faithful cross-micro-batch accumulator (processor/batch.rs flush-on-
    * count): unions incoming batches until at least `minRows` are pending,
    * then releases them as one batch; otherwise emits an empty frame (the
    * engine's `None` short-circuit). Plans-only state on the driver —
    * rows stay distributed; a restart re-accumulates from the replayed
    * micro-batches.
    */
  final class BatchAccumulator(minRows: Long) extends (DataFrame => DataFrame) {
    private var pending: Option[DataFrame] = None
    override def apply(batch: DataFrame): DataFrame = synchronized {
      val merged = pending.map(_.unionByName(batch)).getOrElse(batch)
      if (merged.count() >= minRows) { pending = None; merged }
      else { pending = Some(merged); batch.limit(0) }
    }
  }

  /** VRL-substitute (processor/vrl.rs — no JVM VRL interpreter exists):
    * the capability is "safe per-row transform DSL"; covered by a list of
    * SQL expressions applied as a projection. */
  final case class ExprProcessor(exprs: Seq[String]) extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = batch.selectExpr(exprs: _*)
  }

  /** Remap DSL — the documented semantic port of the VRL processor
    * (SURVEY.md §2.3 vrl row): a line-per-statement program of
    * field assignments and deletions, compiled to Catalyst expressions
    * (never a row-at-a-time interpreter):
    *
    * {{{
    *   .fahrenheit = .value * 9 / 5 + 32   // assignment, .field refs
    *   .sensor = upper(.sensor)            // any SQL function
    *   del(.timestamp)                     // drop a field
    * }}}
    */
  final case class RemapProcessor(program: String) extends (DataFrame => DataFrame) {
    private val FieldRef = "(?<![A-Za-z0-9_)])\\.([A-Za-z_][A-Za-z0-9_]*)".r
    private val Del = """del\(\s*\.([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
    private val Assign = """\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)""".r

    private val statements: Seq[DataFrame => DataFrame] = program.linesIterator
      .map(_.replaceAll("(#|//).*$", "").trim).filter(_.nonEmpty)
      .map {
        case Del(field) => (df: DataFrame) => df.drop(field)
        case Assign(field, rhs) =>
          val sql = FieldRef.replaceAllIn(rhs, m => "`" + m.group(1) + "`")
          (df: DataFrame) => df.withColumn(field, expr(sql))
        case other =>
          throw new IllegalArgumentException(s"remap: cannot parse `$other`")
      }.toSeq

    def apply(batch: DataFrame): DataFrame =
      statements.foldLeft(batch)((df, stmt) => stmt(df))
  }

  /** Temporary lookup table (SURVEY.md §2.6, core temporary/mod.rs:40-45):
    * `provider` fetches/derives the lookup rows for the current batch
    * (e.g. from JDBC/Redis keyed by a batch expression); the result is
    * registered under `name` and broadcast for the join — the Spark shape
    * of processor/sql.rs:148-183. */
  final case class TemporaryLookup(name: String, provider: DataFrame => DataFrame)

  /** `sql` processor with temporary lookup tables joined in. */
  final case class LookupSqlProcessor(query: String, tableName: String,
      temporaries: Seq[TemporaryLookup]) extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = {
      temporaries.foreach { t =>
        broadcast(t.provider(batch)).createOrReplaceTempView(t.name)
      }
      SqlProcessor(query, tableName)(batch)
    }
  }

  /** Cross-source window join processor (buffer/join.rs:62-130): the
    * batch arrives union-tagged with `__input_name` (multiple_inputs
    * fan-in); each source's slice registers as a view named by its input
    * and the join SQL runs across them. A missing expected source yields
    * an empty window, like the reference's missing-source check.
    */
  final case class WindowJoinProcessor(joinSql: String, expected: Seq[String],
      decode: String => BatchTransform = _ => JsonToArrow())
      extends (DataFrame => DataFrame) {
    def apply(batch: DataFrame): DataFrame = {
      val present = batch.select("__input_name").distinct()
        .collect().map(_.getString(0)).toSet
      val sources = expected.filter(present.contains).map { name =>
        name -> decode(name)(
          batch.filter(col("__input_name") === name).drop("__input_name"))
      }.toMap
      Windows.windowJoin(batch.sparkSession, sources, joinSql, expected)
    }
  }

  /** Build the processor chain from config components. */
  def fromConf(confs: Seq[ComponentConf]): Seq[BatchTransform] = confs.map { c =>
    c.kind match {
      case "sql" =>
        SqlProcessor(c.options("query"), c.options.getOrElse("table_name", "flow"))
      case "json_to_arrow" =>
        JsonToArrow(c.options.get("fields_to_include").toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)))
      case "arrow_to_json" => ArrowToJson
      case "batch" => BatchCompact(c.options.getOrElse("partitions", "1").toInt)
      case "expr" => ExprProcessor(c.options("exprs").split(";").map(_.trim).toSeq)
      case "vrl" | "remap" => RemapProcessor(c.options("program"))
      case other => throw new IllegalArgumentException(s"unknown processor: $other")
    }
  }
}
