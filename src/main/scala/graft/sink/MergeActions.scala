package graft.sink

import org.apache.spark.sql.Column

/** The WHEN-clause algebra of SQL `MERGE INTO`, rebound to the
  * rewrite's fixed aliases (`__graft_t` target, `__graft_s` source) —
  * the shape `ManifestTableFormat.mergeInto` executes as one
  * copy-on-write commit. Clause order is first-match-wins, the SQL
  * semantics; a clause's `cond` of `None` means unconditional.
  */
sealed trait GraftMergeAction {
  def cond: Option[Column]
}

/** WHEN [NOT] MATCHED [BY SOURCE] … THEN UPDATE SET. */
final case class GraftMergeUpdate(
    cond: Option[Column],
    set: Seq[(String, Column)]) extends GraftMergeAction

/** WHEN [NOT] MATCHED [BY SOURCE] … THEN DELETE. */
final case class GraftMergeDelete(
    cond: Option[Column]) extends GraftMergeAction

/** WHEN NOT MATCHED … THEN INSERT. */
final case class GraftMergeInsert(
    cond: Option[Column],
    values: Seq[(String, Column)]) extends GraftMergeAction
