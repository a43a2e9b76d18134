package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** TEST-ONLY session factory (package-tree technique, test classpath
  * only — the production Bridge surface stays minimal): builds a
  * SparkSession with NO extensions over an existing context, the shape
  * an externally-created session has before `GraftSession.install`.
  * `newSession()` cannot model this — it carries the parent's
  * extensions, so the extension-seat optimizer rules still fire and
  * the `extraOptimizations` fallback seat stays unreachable.
  */
object TestSessions {
  /** A vanilla (extension-free) session sharing `spark`'s context. */
  def vanilla(spark: SparkSession): SparkSession =
    new org.apache.spark.sql.classic.SparkSession(spark.sparkContext)
}
