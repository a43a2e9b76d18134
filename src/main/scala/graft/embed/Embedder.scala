package graft.embed

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Embedding stage contract (SURVEY A15). A side-effecting service
  * boundary in the reference (Azure OpenAI embeddings, batched ≤10,
  * dimension-reduced to 1536 — AzureCosmosDB/.../BlobTriggerFunction
  * .cs:122-157), so on Spark it lives behind a trait called from
  * `mapPartitions` — never an SQL expression the optimizer could
  * duplicate or reorder.
  */
trait Embedder extends Serializable {
  def dimensions: Int

  /** Embed one batch of texts; result aligns by index with the input
    * (the reference relies on the same alignment,
    * AzureCosmosDB/.../CosmosDBClientWrapper.cs:50).
    */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic offline embedder (SURVEY §5: "trait boundaries with
  * deterministic fakes are load-bearing"): SHA-256 of the text seeds a
  * spec-fixed PRNG → unit-norm vector. Pure and cross-JVM stable, so
  * pipeline tests and the idempotency gate are reproducible.
  */
final case class DeterministicEmbedder(
    dimensions: Int = 64,
    seed: Long = 42L) extends Embedder {

  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map(one)

  private def one(text: String): Array[Float] = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes(UTF_8))
    var h = seed
    var i = 0
    while (i < 8) { h = h * 31 + (digest(i) & 0xffL); i += 1 }
    // java.util.Random's LCG + nextGaussian are specified by the JDK
    // docs, so this is deterministic across JVM vendors/versions.
    val rnd = new java.util.Random(h)
    val v = Array.fill(dimensions)(rnd.nextGaussian().toFloat)
    var norm = 0.0
    v.foreach(x => norm += x.toDouble * x)
    val inv = if (norm == 0.0) 1.0 else 1.0 / math.sqrt(norm)
    v.map(x => (x * inv).toFloat)
  }
}

/** Raised by remote embedder clients for retryable failures (the
  * reference retries HTTP 429/401 — BlobTriggerFunction.cs:138).
  */
final class RetryableEmbeddingException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** A16: retry with fixed delay and a ceiling, matching the reference's
  * policy shape (100 × 10 s on retryable statuses; other errors
  * rethrow — AzureCosmosDB/.../BlobTriggerFunction.cs:32-33,129-156).
  * The ceiling is configurable because the reference's own 100×10 s
  * budget exceeds its 10-min host timeout (SURVEY §6) — a bug we do
  * not reproduce by default.
  */
final case class RetryPolicy(
    maxRetries: Int = 100,
    delayMillis: Long = 10000L)

final class RetryingEmbedder(
    inner: Embedder,
    policy: RetryPolicy = RetryPolicy(),
    sleep: Long => Unit = Thread.sleep,
    onRetry: () => Unit = () => ()) extends Embedder {

  override def dimensions: Int = inner.dimensions

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    var attempt = 0
    while (true) {
      try {
        return inner.embed(texts)
      } catch {
        case e: RetryableEmbeddingException =>
          attempt += 1
          if (attempt > policy.maxRetries) throw e
          onRetry()
          sleep(policy.delayMillis)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Telemetry wrapper: counts batches/texts and sums call latency into
  * an [[graft.pipeline.IngestMetrics]]. Compose OUTSIDE the retry
  * wrapper to measure end-to-end batch latency including retry sleeps
  * (`metered(retrying(http))` — what `embedChunks` builds), or INSIDE
  * it to count every attempt; either way the retry counter
  * ([[RetryingEmbedder]]'s `onRetry` hook) distinguishes a slow
  * service from a rate-limited one.
  */
final class MeteredEmbedder(
    inner: Embedder,
    metrics: graft.pipeline.IngestMetrics) extends Embedder {

  override def dimensions: Int = inner.dimensions

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val t0 = System.nanoTime()
    try inner.embed(texts)
    finally {
      metrics.embedBatches.add(1L)
      metrics.embedTexts.add(texts.size.toLong)
      metrics.embedMillis.add((System.nanoTime() - t0) / 1000000L)
    }
  }
}
