package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL-visible metadata columns (SURVEY.md §1.2; reference
  * crates/arkflow-core/src/lib.rs:56-69): `__meta_source`,
  * `__meta_partition`, `__meta_offset`, `__meta_key`, `__meta_timestamp`,
  * `__meta_ingest_time`, and free-form `__meta_ext` map.
  *
  * Type mapping per SURVEY §1.4: unsigned partition/offset widen to
  * signed (IntegerType/LongType), ns timestamps truncate to micros.
  */
object Metadata {
  val Source = "__meta_source"
  val Partition = "__meta_partition"
  val Offset = "__meta_offset"
  val Key = "__meta_key"
  val Timestamp = "__meta_timestamp"
  val IngestTime = "__meta_ingest_time"
  val Ext = "__meta_ext"

  /** Stamp the standard metadata columns on a batch. */
  def stamp(df: DataFrame, source: String,
            ext: Map[String, String] = Map.empty): DataFrame = {
    val withStd = df
      .withColumn(Source, lit(source))
      .withColumn(IngestTime, current_timestamp())
    if (ext.isEmpty) withStd
    else withStd.withColumn(Ext,
      map(ext.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*))
  }

  /** Strip every metadata column (for sinks that want payload only). */
  def strip(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.startsWith("__meta_")): _*)
}
