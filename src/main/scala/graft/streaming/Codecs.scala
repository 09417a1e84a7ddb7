package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Codecs: bytes <-> columnar batches (SURVEY.md §2.5).
  *
  * The binary envelope convention follows the reference: undecoded
  * messages are a single non-null `__value__` binary column
  * (crates/arkflow-core/src/lib.rs:52, 252-279).
  */
object Codecs {

  val ValueCol = "__value__"

  /** JSON string-content escaping for hand-built documents (auth
    * payloads, JS API configs, control-plane bodies) — one shared
    * implementation so control-character handling can't drift between
    * the connectors. Returns the escaped CONTENT (no surrounding
    * quotes). */
  def jsonEscape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"' => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** JSON codec (codec/json.rs:23-52): decode infers the schema from the
    * batch (per-batch inference is legal inside foreachBatch — SURVEY §1.3),
    * optionally keeping only `fieldsToInclude`; encode serializes every
    * column to one JSON object per row.
    *
    * Pass `declaredSchema` when the stream feeds a schema-sensitive sink
    * (parquet append, JDBC insert): inference then never runs, so empty
    * and non-empty micro-batches carry identical types. Without it, a
    * zero-row batch has nothing to infer from — decode returns a
    * STATICALLY-empty frame (empty LocalRelation) that the engine's
    * held-back check skips before any sink sees its placeholder schema.
    */
  final case class JsonCodec(fieldsToInclude: Seq[String] = Nil,
      declaredSchema: Option[org.apache.spark.sql.types.StructType] = None) {
    def decode(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val strings = df.select(col(ValueCol).cast("string")).as[String]
      val parsed = declaredSchema match {
        case Some(s) => spark.read.schema(s).json(strings)
        case None => spark.read.json(strings)
      }
      if (parsed.schema.isEmpty)
        // Inference saw zero rows. A made-up schema here (e.g. all-string)
        // would poison schema-sensitive sinks, so emit the engine's
        // held-back sentinel instead: the zero-column frame
        // ([[Engine.heldBackSentinel]]) that short-circuits the pipeline.
        Engine.heldBackSentinel(spark)
      else if (fieldsToInclude.isEmpty) parsed
      else parsed.select(fieldsToInclude.map(col): _*)
    }
    def encode(df: DataFrame): DataFrame =
      df.select(to_json(struct(df.columns.map(col): _*)).cast("binary").as(ValueCol))
  }

  /** Debezium CDC envelope codec (codec/debezium.rs:58-127): flattens the
    * business payload — `after` for create/update/read, `before` for
    * delete — and exposes `op`, `ts_ms`, `source_db`, `source_table`.
    */
  object DebeziumJsonCodec {
    def decode(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val parsed = spark.read.json(df.select(col(ValueCol).cast("string")).as[String])
      val payload = when(col("op") === "d", col("before")).otherwise(col("after"))
      parsed
        .withColumn("__payload", payload)
        .select(col("__payload.*"),
          col("op"), col("ts_ms"),
          col("source.db").as("source_db"),
          col("source.table").as("source_table"))
    }
  }
}
