package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sink.ChunkStore

/** P10: incremental derived-table maintenance off the change feed —
  * the downstream half of the reference's architecture. The reference
  * keeps its vector store in sync with a storage container by
  * consuming that container's change feed (the blob trigger,
  * `AzureCosmosDB/.../BlobTriggerFunction.cs:41-52`, create and
  * delete both); this runner is the same pattern with a manifest
  * table as the SOURCE: consume `graft-cdf`, apply a per-document
  * projection/transform, and keep a second store in sync — a
  * replica, a filtered projection, a re-embedded copy, a downstream
  * serving table.
  *
  * Semantics per micro-batch (one `changesBetween` span):
  *  - documents with INSERT rows in the batch upsert their
  *    TRANSFORMED rows into the target (A17 merge — whole-document
  *    replace, so the delete half of an upsert pair needs no separate
  *    handling); a document the transform FILTERS OUT entirely is
  *    deleted from the target instead (a rewrite that newly fails a
  *    filtering projection must evict the old version);
  *  - documents with ONLY delete rows propagate as whole-document
  *    deletes (A20), url-keyed, pushed down as a FRAME (never a
  *    driver url set).
  *
  * Exactly-once without a transaction between checkpoint and store:
  * both halves are IDEMPOTENT on replay (merge replaces the same
  * document with the same rows; deleting an absent document is a
  * no-op), so the at-least-once replay the sink checkpoint gives on
  * crash converges to the same target state. The transform must be
  * deterministic and preserve `document_url` (the sync key) for this
  * to hold — same contract the reference's pipeline has on its id
  * scheme.
  *
  * Scale shape: each batch touches O(churn) rows (the change feed's
  * contract) and the target's merge selects affected files by bloom
  * probe — a quiet 100 TB table costs nothing per tick; a busy one
  * costs its churn, never its size.
  */
object ChangeFeedSync {

  /** Start the sync as a continuous streaming query (caller owns the
    * lifecycle). `transform` maps INSERTED rows (source schema, no
    * `_change_type`) to the target's rows; identity = replication.
    */
  def start(
      spark: SparkSession,
      sourcePath: String,
      target: ChunkStore,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.format("graft-cdf")
      .option("path", sourcePath)
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, target, transform)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Drain everything currently committed and return (AvailableNow +
    * awaitTermination) — the batch-ish entry point for maintenance
    * cadence jobs; resume state lives in `checkpointDir`.
    */
  def syncOnce(
      spark: SparkSession,
      sourcePath: String,
      target: ChunkStore,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity): Unit =
    start(spark, sourcePath, target, checkpointDir, transform,
      Trigger.AvailableNow()).awaitTermination()

  /** One change-feed span applied to the target. Package-visible for
    * direct batch use (`changesBetween` output has the same shape).
    */
  private[pipeline] def applyBatch(
      batch: DataFrame,
      target: ChunkStore,
      transform: DataFrame => DataFrame): Unit = {
    // foreachBatch recomputes the incremental plan per action; the
    // span is O(churn) rows by contract, so pin it once
    val pinned = batch.persist()
    try {
      val inserts = pinned
        .filter(col("_change_type") === "insert").drop("_change_type")
      val insertedUrls = inserts.select("document_url").distinct()
      val deleteOnly = pinned
        .filter(col("_change_type") === "delete")
        .select("document_url").distinct()
        .join(insertedUrls, Seq("document_url"), "left_anti")
      if (!deleteOnly.isEmpty) target.delete(deleteOnly)
      if (!inserts.isEmpty) {
        val out = transform(inserts).persist()
        try {
          require(out.columns.contains("document_url"),
            "ChangeFeedSync transform must preserve document_url " +
              "(the sync key) — produced: " + out.columns.mkString(", "))
          // a FILTERING transform can drop a changed document
          // entirely — its stale rows must leave the target too, or
          // a rewrite that newly fails the filter would serve the old
          // version forever (delete of a never-synced document is a
          // no-op, so this stays idempotent)
          val vanished = insertedUrls.join(
            out.select("document_url").distinct(),
            Seq("document_url"), "left_anti")
          if (!vanished.isEmpty) target.delete(vanished)
          if (!out.isEmpty) target.upsert(out)
        } finally out.unpersist()
      }
    } finally pinned.unpersist()
  }
}
