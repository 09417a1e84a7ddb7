package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query receives a scale-factor directory and reads the parquet
  * lazily; Catalyst prunes columns and pushes filters into the scan, so
  * registering all tables costs nothing until an action runs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The engine-facing contract for `events.ts` is epoch-NANOSECOND
    * BIGINT, whatever the generator wrote physically: TIMESTAMP(NANOS)
    * parquet arrives as long already (nanosAsLong), while timestamp[us]
    * arrives as TimestampType/TimestampNTZType and is converted here
    * (UTC session, so the naive wall clock IS the epoch — matching the
    * DuckDB oracles, which normalize with `epoch_ns(ts)` on their side).
    * Row-local codegen cast; nothing downstream changes shape. */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) => df
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * 1000"))
      case None => df
    }

  /** Register every table for `dir` as a temp view (for the SQL-path queries). */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
