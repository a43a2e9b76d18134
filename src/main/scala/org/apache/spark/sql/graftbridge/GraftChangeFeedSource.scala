package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** V1 streaming [[Source]] over a graft manifest table's change feed —
  * the read-side twin of the reference's blob trigger (which IS a
  * change-feed consumer of its storage account,
  * `AzureCosmosDB/csharp/DocumentVectorPipelineFunctions/BlobTriggerFunction.cs:41`):
  * `spark.readStream.format("graft-cdf")` turns every manifest table
  * into a streaming SOURCE, so downstream incremental pipelines
  * (re-embed on change, index maintenance, cache invalidation) ride
  * Structured Streaming's checkpointing instead of hand-rolled cursors.
  *
  * Offsets ARE manifest versions (a [[LongOffset]] of the committed
  * version), which makes the mapping exactly-once by construction:
  * a micro-batch covering `(from, to]` is `changesBetween(from, to)` —
  * the net row-level delta computed from the log's file diff, reading
  * only churn-touched files, with copy-on-write survivor rows
  * cancelling via `exceptAll` (see `ManifestTableFormat.changesBetween`).
  * Restart replays the pending batch from the sink checkpoint's
  * offsets and resumes — versions are stable across processes because
  * they are the table's own commit log.
  *
  * Scale shape: per batch O(churn files) read + one exceptAll shuffle
  * over changed-file rows, never the table; driver state is one long.
  * Retention contract: both ends of a batch must still be
  * reconstructable from the log — a vacuumed-away history fails
  * loudly (`filesAtVersion`'s reconstructability check), same as any
  * log-structured streaming source whose log was cleaned past the
  * checkpoint.
  *
  * This class lives under `org.apache.spark.sql` because the V1
  * source seam (`Source`, `LongOffset`, `internalCreateDataFrame`) is
  * `private[sql]` — the standard extension-library technique, as with
  * [[Bridge]].
  *
  * @param currentVersion latest committed version, −1 before the first commit
  * @param changes        `(from, to] =>` net change frame in `streamSchema`
  *                       column order minus ordering guarantees
  * @param startingVersion exclusive lower bound for a fresh (no
  *                        checkpoint) query; −1 = full current snapshot
  *                        as inserts, then deltas
  */
class GraftChangeFeedSource(
    sqlContext: SQLContext,
    streamSchema: StructType,
    currentVersion: () => Long,
    changes: (Long, Long) => DataFrame,
    startingVersion: Long,
    maxVersionsPerBatch: Option[Long]) extends Source
    with SupportsTriggerAvailableNow {

  require(maxVersionsPerBatch.forall(_ >= 1),
    s"maxVersionsPerBatch must be >= 1, got $maxVersionsPerBatch")

  private def classic = sqlContext.sparkSession
    .asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** High-water mark of offsets this source has handed out or been
    * asked to serve — keeps `getOffset` monotonic under rate limiting
    * and across checkpoint-restored batches.
    */
  @volatile private var lastEnd: Long = startingVersion

  /** Trigger.AvailableNow pins the drain target to the version
    * current when the trigger fired — later commits wait for the next
    * run, and the rate-limited loop stops exactly at the pin.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override def schema: StructType = streamSchema

  private def versionOf(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong // LongOffset.json is the bare number
    case other => other.json.trim.toLong
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentVersion())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control offset negotiation (the path the micro-batch
    * planner takes for sources that pace themselves — ReadLimit stays
    * version-internal here via `maxVersionsPerBatch`). Returns the
    * previous high-water mark when nothing new is committed, null
    * before anything ever is.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latestNow = currentVersion()
    val cap = availableNowTarget.fold(latestNow)(math.min(latestNow, _))
    val floor = math.max(
      lastEnd,
      math.max(startingVersion,
        Option(start).map(versionOf).getOrElse(startingVersion)))
    if (cap <= floor) {
      if (floor > startingVersion) LongOffset(floor) else null
    } else {
      val end = maxVersionsPerBatch.fold(cap)(m => math.min(cap, floor + m))
      lastEnd = math.max(lastEnd, end)
      LongOffset(end)
    }
  }

  override def reportLatestOffset(): OffsetV2 = {
    val latest = currentVersion()
    if (latest < 0) null else LongOffset(latest)
  }

  /** Legacy (non-admission-control) offset poll — same contract
    * without the AvailableNow pin or pacing floor negotiation.
    */
  override def getOffset: Option[Offset] = {
    val latest = currentVersion()
    if (latest < 0 || latest <= startingVersion) None
    else {
      val floor = math.max(lastEnd, startingVersion)
      val end = math.max(
        floor,
        maxVersionsPerBatch.fold(latest)(m => math.min(latest, floor + m)))
      lastEnd = math.max(lastEnd, end)
      Some(LongOffset(end))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    lastEnd = math.max(lastEnd, to)
    val batch =
      if (to <= from)
        classic.createDataFrame(
          classic.sparkContext.emptyRDD[Row], streamSchema)
      else
        changes(from, to)
          .select(streamSchema.fieldNames.map(col).toIndexedSeq: _*)
    // V1 sources must return an isStreaming frame — the micro-batch
    // planner splices its logical plan in place of the source node
    classic.internalCreateDataFrame(
      batch.queryExecution.toRdd, streamSchema, isStreaming = true)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftChangeFeedSource[$streamSchema]"
}
