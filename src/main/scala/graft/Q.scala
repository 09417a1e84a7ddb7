package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query inventory.
  *
  * Oracle-parity conventions (the driver diffs every query against DuckDB
  * running the `oracleSql` on the same parquet):
  *   - double aggregation goes through DECIMAL(18,4) so the sum is exact
  *     and order-independent in both engines, then back to double + round;
  *   - orderings always end in a unique key (no nondeterministic ties);
  *   - explicit NULLS FIRST everywhere an ordered column is nullable
  *     (Spark default asc = nulls first, DuckDB default = nulls last);
  *   - every computed column is aliased identically in Spark and SQL.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  val dec: DecimalType = DecimalType(18, 4)

  /** Exact cast for double columns entering an aggregation. */
  def d(c: Column): Column = c.cast(dec)

  /** Exact decimal sum -> double, rounded. */
  def dsum(c: Column, scale: Int = 2): Column = round(sum(d(c)).cast("double"), scale)

  /** The house ORACLE-REPRODUCIBLE 32-bit hash: first 8 md5 hex chars
    * as a long. Single-sourced because the DuckDB side must render the
    * IDENTICAL value — `CAST(CAST('0x' || substring(md5(x), 1, 8) AS
    * UBIGINT) AS BIGINT)` — wherever any operator buckets, samples, or
    * derives a uniform from content. Swap xxhash64 for production
    * throughput when a differential oracle isn't required. */
  def md5Bucket32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** [[md5Bucket32]]'s driver-side twin, for assertions about which
    * bucket a known string lands in. */
  def md5Bucket32Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** A query that runs one SQL text against the registered test tables.
    * Used where the Spark and DuckDB dialects coincide, so the exact same
    * string is also the oracle.
    */
  def fromSql(sql: String): QueryFn =
    (spark, dir) => { Tables.register(spark, dir); spark.sql(sql) }
}
