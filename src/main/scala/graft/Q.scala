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

  /** A query that runs one SQL text against the registered test tables.
    * Used where the Spark and DuckDB dialects coincide, so the exact same
    * string is also the oracle.
    */
  def fromSql(sql: String): QueryFn =
    (spark, dir) => { Tables.register(spark, dir); spark.sql(sql) }
}
