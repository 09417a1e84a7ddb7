package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard pattern
  * Spark-native libraries use to materialize a Dataset from a custom
  * LogicalPlan (only `Dataset.ofRows` is touched).
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A sibling session on the same SparkContext with its OWN extensions —
    * what `spark.sql.extensions=...` produces at startup, constructible
    * mid-JVM for tests. A bare `getOrCreate` would return the existing
    * session and silently skip the extensions, so the default/active
    * session registrations are cleared around the build and restored
    * after (the SparkContext itself is reused, never restarted). */
  def sessionWithExtensions(spark: SparkSession,
      configure: SparkSessionExtensions => Unit): SparkSession = synchronized {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder().withExtensions(e => configure(e)).getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
