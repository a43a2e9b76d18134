package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.graftbridge.Bridge

import graft.catalog.GraftUpdatable

/** Planner strategy that gives graft catalog tables plain SQL
  * `UPDATE t SET … WHERE …` — the statement a store user reaches for
  * first (both reference stores are full SQL engines: T-SQL,
  * `AzureSQL/csharp/README.md:130-132`; Cosmos SQL,
  * `AzureCosmosDB/csharp/README.md:104-106`).
  *
  * How it hooks in: Spark 4 analyzes `UPDATE` into a fully-resolved
  * [[UpdateTable]] command and only rejects it at PLANNING time when
  * the table lacks `SupportsRowLevelOperations`
  * (`SparkStrategies$BasicOperators`). Strategies registered on
  * `spark.experimental.extraStrategies` run BEFORE the built-ins, so
  * this one claims `UpdateTable` over a [[GraftUpdatable]] relation
  * and plans it as a driver-side command exec that routes to the
  * manifest format's copy-on-write rewrite
  * (`ManifestTableFormat.update`: pre-scan for affected file NAMES
  * with the predicate pushed down, rewrite only those files,
  * rm+add in one atomic log commit). Everything else falls through
  * to Spark untouched.
  *
  * Registered by `GraftSession.install` (post-hoc, works on any live
  * session) and by `GraftExtensions` (config-driven deployments).
  */
object GraftUpdateStrategy extends SparkStrategy {

  /** The catalog table behind the UPDATE target, whether the optimizer
    * has already rewritten the relation into its scan form
    * (V2ScanRelationPushDown runs before planning) or not.
    */
  private def tableOf(p: LogicalPlan)
      : Option[org.apache.spark.sql.connector.catalog.Table] = p match {
    case r: DataSourceV2Relation => Some(r.table)
    case r: DataSourceV2ScanRelation => Some(r.relation.table)
    case SubqueryAlias(_, child) => tableOf(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(table, assignments, condition) =>
      tableOf(table) match {
        case Some(t: GraftUpdatable) =>
          GraftUpdateExec(t.name(), t, assignments, condition) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** The physical node behind [[GraftUpdateStrategy]]: runs the store
  * update exactly once (UPDATE is an eagerly-executed command) and
  * returns no rows. Catalyst attribute references are rebound BY NAME
  * into fresh unresolved columns, because the rewrite re-reads the
  * affected files as a new frame whose attributes carry new expr ids —
  * sound here since graft tables have a flat, fixed-name schema.
  */
final case class GraftUpdateExec(
    tableName: String,
    table: GraftUpdatable,
    assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private def rebind(e: Expression): Column = {
    // subqueries reach the exec either logically (SubqueryExpression)
    // or already planned (ExecSubqueryExpression) — PlanExpression is
    // the common parent of both
    if (e.exists(_.isInstanceOf[PlanExpression[_]]))
      throw new UnsupportedOperationException(
        s"$tableName: UPDATE with a subquery in SET/WHERE is not " +
          "supported — materialize the subquery as a view and use " +
          "CALL <catalog>.merge_into(table, view) for keyed bulk " +
          "updates")
    Bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  private lazy val done: Unit = {
    val set = assignments.map {
      case Assignment(k: AttributeReference, v) => k.name -> rebind(v)
      case Assignment(k, _) => throw new UnsupportedOperationException(
        s"$tableName: UPDATE target must be a top-level column, " +
          s"got ${k.sql}")
    }
    table.updateWhere(condition.map(rebind), set)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD[InternalRow]
  }

  override def executeCollect(): Array[InternalRow] = {
    done
    Array.empty
  }
}
