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
      // restore BOTH states explicitly — with no prior session, getOrCreate
      // registered the extensions session as the JVM default, and leaving
      // it there would hand the injected strategy/functions to every
      // unrelated getOrCreate that follows
      prevDefault match {
        case Some(d) => SparkSession.setDefaultSession(d)
        case None => SparkSession.clearDefaultSession()
      }
      prevActive match {
        case Some(a) => SparkSession.setActiveSession(a)
        case None => SparkSession.clearActiveSession()
      }
    }
  }
}
