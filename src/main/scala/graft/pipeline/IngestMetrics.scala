package graft.pipeline

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** Per-stage operational counters for the ingest dataflow — the
  * engine-side analog of the monitoring the reference deploys around
  * its function host (SURVEY A-tier: App Insights per-invocation
  * telemetry). Spark accumulators: incremented executor-side inside
  * the typed stages, read driver-side after (or during) a run, shown
  * in the Spark UI under their `graft.ingest.*` names.
  *
  * Semantics are OPERATIONAL, not transactional: Spark re-executes
  * failed/speculative tasks and accumulator updates from non-result
  * stages can double-count on retry — the standard accumulator
  * caveat. Use the counters for paging/dashboards (chunks/s, retry
  * storms, batch latency); use the committed table for exactness.
  */
final class IngestMetrics(sc: SparkContext) extends Serializable {

  /** Files routed by extension (A3). */
  val docs: LongAccumulator = sc.longAccumulator("graft.ingest.docs")

  /** Chunks produced by the chunking stage (A8-A12). */
  val chunks: LongAccumulator = sc.longAccumulator("graft.ingest.chunks")

  /** Documents quarantined by the isolating router (poison-document
    * isolation; the reference's dead-letter analog). A non-zero value
    * is the page: some inputs are not making it into the store.
    */
  val quarantined: LongAccumulator =
    sc.longAccumulator("graft.ingest.quarantined")

  /** Embedding service batches attempted (A13: batches of ≤10);
    * includes retried attempts.
    */
  val embedBatches: LongAccumulator =
    sc.longAccumulator("graft.ingest.embed_batches")

  /** Texts sent to the embedder across all attempts. */
  val embedTexts: LongAccumulator =
    sc.longAccumulator("graft.ingest.embed_texts")

  /** A16 retries (a retry storm here is the signal the reference's
    * 429 handling exists for).
    */
  val embedRetries: LongAccumulator =
    sc.longAccumulator("graft.ingest.embed_retries")

  /** Summed embedding batch latency, milliseconds (avg = millis /
    * batches; per-task wall-clock overlaps under `maxInFlight` > 1).
    */
  val embedMillis: LongAccumulator =
    sc.longAccumulator("graft.ingest.embed_millis")

  /** Driver-side view for logs/bench rows. */
  def snapshot: Map[String, Long] = Map(
    "docs" -> docs.value,
    "chunks" -> chunks.value,
    "quarantined" -> quarantined.value,
    "embed_batches" -> embedBatches.value,
    "embed_texts" -> embedTexts.value,
    "embed_retries" -> embedRetries.value,
    "embed_millis" -> embedMillis.value)
}
