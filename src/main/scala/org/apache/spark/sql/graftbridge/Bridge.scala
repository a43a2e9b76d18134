package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals needed by an extension
  * library: wrapping a Catalyst [[Expression]] as a user-facing [[Column]]
  * and registering expression builders on a live session. This is the
  * standard technique used by open-source Spark extension libraries
  * (a file placed under the `org.apache.spark.sql` package tree).
  */
object Bridge {

  /** Wrap a raw Catalyst expression as a Column (Spark 4.x ColumnNode API). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expression(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .expression(c)

  /** Materialize an analyzed LogicalPlan as a DataFrame (the hook a
    * command exec needs to evaluate a statement's source relation —
    * e.g. MERGE INTO's USING side — as a frame at execution time).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap a streaming Sink.addBatch micro-batch DataFrame as a
    * plain batch frame over its already-planned rows (the Delta sink
    * technique: `toRdd` on the incremental execution, rows copied,
    * re-wrapped with `internalCreateDataFrame`). A sink that runs
    * MULTIPLE actions over the raw addBatch frame would re-trigger
    * the incremental plan per action; this pins the batch to one
    * execution.
    */
  def rewrapBatch(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    classic.internalCreateDataFrame(
      qe.toRdd.map(_.copy()), df.schema, isStreaming = false)
  }

  /** Register a builder for `name` on an existing session (post-hoc; no
    * SparkSessionExtensions needed, so it works on any caller session).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry: FunctionRegistry =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
    val info = new ExpressionInfo("graft", name)
    registry.registerFunction(FunctionIdentifier(name), info, builder)
  }
}
