package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.connector.catalog.Table

/** Capability seam between the SQL `UPDATE` planner strategy
  * (`graft.plans.GraftUpdateStrategy`) and the catalog's tables:
  * a table exposing this trait accepts a row-level update keyed by an
  * arbitrary predicate, executed as the manifest format's
  * copy-on-write rewrite (`ManifestTableFormat.update`). The columns
  * arrive UNRESOLVED (name-rebound by the strategy) because the
  * rewrite re-reads the affected files as a fresh frame.
  */
trait GraftUpdatable extends Table {

  /** Apply `SET` assignments to every row matching `condition`
    * (`None` = all rows). Must either complete atomically
    * (snapshot-isolated readers, one commit) or throw — never a
    * partial update.
    */
  def updateWhere(
      condition: Option[Column], set: Seq[(String, Column)]): Unit
}
