package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Standard Spark extension entry point: load the whole function
  * surface into any session via configuration, no code changes —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (equivalent to calling `GraftFunctions.register(spark)`; this is
  * the deployment-friendly path for spark-submit / Thrift server /
  * notebook clusters).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.PrenormalizeCosine)
    // BEFORE DvColumnarRead: the filtered metadata-COUNT fold must
    // see the bare relation in the same batch pass, or the DV
    // substitution dissolves the match
    ext.injectOptimizerRule(_ => graft.plans.MetadataFilteredCount)
    // operator-optimization seat: sees the un-converted
    // DataSourceV2Relation, so the substituted DV plan gets the full
    // pushdown/pruning/codegen treatment from the remaining passes
    ext.injectOptimizerRule(_ => graft.plans.DvColumnarRead)
    ext.injectPlannerStrategy(_ => graft.plans.GraftDmlStrategy)
  }
}
