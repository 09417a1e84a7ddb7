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

  /** Parquet SCHEMA cache, keyed by table path (round-18, guide §1.2
    * "don't compute things you throw away" applied to actions): every
    * bare `spark.read.parquet(path)` runs a one-task schema-inference
    * job before any query executes, and the 275-entry sweep paid it
    * 10× per SQL-path entry (Tables.register infers all ten tables) —
    * measured as 10 of q23's 13 jobs, ~0.4 s of a 0.57 s entry. A
    * table's file schema is immutable metadata (this is exactly what a
    * catalog/metastore persists so scans never infer); caching it is
    * NOT result caching — every query still reads its data from the
    * parquet files. Keyed by path; the fixture builders write each
    * path once behind a marker, so a path's schema never changes
    * within a JVM. The first load of a path still pays one inference
    * (fresh JVMs start cold). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Schema-cached parquet read of an immutable path (no reader
    * options). Shared with the streaming file input for its plain
    * parquet case. */
  def cachedParquet(spark: SparkSession, path: String): DataFrame = {
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = cachedParquet(spark, s"$dir/$name.parquet")
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

  /** Last dir registered per session — registration is idempotent for a
    * fixed dir, and every SQL-path query calls [[register]] on entry, so
    * re-pointing ten temp views per query is pure per-entry overhead.
    * Keyed WEAKLY by session (a stopped session must not pin the map);
    * a dir CHANGE re-registers, which ScaleProbe relies on when it runs
    * one query against sf0.1 and /tmp/sf1 in the same session. */
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table for `dir` as a temp view (for the SQL-path queries). */
  def register(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registeredDir.put(spark, dir)
      ()
    }
}
