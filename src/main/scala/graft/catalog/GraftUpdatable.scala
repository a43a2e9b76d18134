package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.connector.catalog.Table

/** Capability seam between the SQL `UPDATE` planner strategy
  * (`graft.plans.GraftDmlStrategy`) and the catalog's tables:
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

  /** Remove every row matching `condition` — the row-level DELETE
    * fallback for predicates the document-keyed `SupportsDelete` path
    * cannot translate. Same atomicity contract as [[updateWhere]].
    */
  def deleteRowsWhere(condition: Column): Unit

  /** SQL `MERGE INTO`: apply the WHEN-clause algebra against
    * `source` under `onCond` (expressions rebound to the `__graft_t`
    * / `__graft_s` aliases), in one atomic commit. `urlProbe` is the
    * planner's url-equality extract from ON, when present — the
    * bloom-pruning fast path.
    */
  def mergeRows(
      source: org.apache.spark.sql.DataFrame,
      onCond: Column,
      matched: Seq[graft.sink.GraftMergeAction],
      notMatched: Seq[graft.sink.GraftMergeAction],
      notMatchedBySource: Seq[graft.sink.GraftMergeAction],
      urlProbe: Option[org.apache.spark.sql.DataFrame]): Unit
}
