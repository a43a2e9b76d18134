package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.embed._

/** A15/A16 remote-client behavior against a scripted fake transport —
  * no network: batching ≤ 10, payload shape (dimensions option),
  * index re-alignment, 429/401 → retryable, other statuses fatal, and
  * the RetryingEmbedder loop over the mapped exceptions.
  */
class EmbedderSpec extends AnyFunSuite {

  /** Scripted transport: pops one (status, body) per call, records
    * every request. `vectorsFor` builds a valid 200 response for the
    * requested batch (optionally shuffling the index order).
    */
  private final class FakeTransport(script: Seq[(Int, String)])
      extends HttpTransport {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    private var i = 0
    override def post(url: String, body: String,
        headers: Map[String, String]): (Int, String) = {
      calls += body
      val r = script(math.min(i, script.size - 1))
      i += 1
      r
    }
  }

  private def okBody(n: Int, dim: Int = 4, reversed: Boolean = false): String = {
    val order = if (reversed) (n - 1) to 0 by -1 else 0 until n
    order.map { ix =>
      val vec = (0 until dim).map(j => s"${ix + 1}.$j").mkString(",")
      s"""{"index":$ix,"embedding":[$vec]}"""
    }.mkString("""{"data":[""", ",", "]}")
  }

  private def cfg = HttpEmbedderConfig(
    endpoint = "http://localhost/embed", model = "test-model",
    apiKey = Some("k"), dimensions = 4, maxBatchSize = 10)

  test("success path: batches of ≤10, dimensions in payload, aligned result") {
    val t = new FakeTransport(Seq((200, okBody(10)), (200, okBody(10)),
      (200, okBody(5))))
    val e = new HttpEmbedder(cfg, t)
    val vecs = e.embed((1 to 25).map(i => s"text $i"))
    assert(vecs.size == 25)
    assert(t.calls.size == 3) // 10 + 10 + 5
    assert(t.calls.head.contains("\"dimensions\":4"))
    assert(t.calls.head.contains("\"model\":\"test-model\""))
    assert(t.calls.last.contains("text 25"))
    // alignment: vector 0 of each batch starts with 1.0
    assert(vecs(0)(0) == 1.0f && vecs(10)(0) == 1.0f && vecs(20)(0) == 1.0f)
  }

  test("service reordering is re-aligned by the index field") {
    val t = new FakeTransport(Seq((200, okBody(3, reversed = true))))
    val vecs = new HttpEmbedder(cfg, t).embed(Seq("a", "b", "c"))
    assert(vecs(0)(0) == 1.0f && vecs(1)(0) == 2.0f && vecs(2)(0) == 3.0f)
  }

  test("429 and 401 map to RetryableEmbeddingException") {
    for (status <- Seq(429, 401)) {
      val t = new FakeTransport(Seq((status, "busy")))
      intercept[RetryableEmbeddingException] {
        new HttpEmbedder(cfg, t).embed(Seq("x"))
      }
    }
  }

  test("other HTTP errors are fatal (no retry mapping)") {
    for (status <- Seq(400, 403, 500, 503)) {
      val t = new FakeTransport(Seq((status, "nope")))
      val ex = intercept[java.io.IOException] {
        new HttpEmbedder(cfg, t).embed(Seq("x"))
      }
      assert(ex.getMessage.contains(status.toString))
    }
  }

  test("mismatched vector count in a 200 response fails loudly") {
    val t = new FakeTransport(Seq((200, okBody(2))))
    intercept[IllegalArgumentException] {
      new HttpEmbedder(cfg, t).embed(Seq("a", "b", "c"))
    }
  }

  test("RetryingEmbedder retries through transient 429s, then succeeds") {
    val t = new FakeTransport(Seq((429, ""), (429, ""), (200, okBody(1))))
    var slept = 0L
    val e = new RetryingEmbedder(new HttpEmbedder(cfg, t),
      RetryPolicy(maxRetries = 5, delayMillis = 7L), ms => slept += ms)
    assert(e.embed(Seq("x")).head.length == 4)
    assert(t.calls.size == 3)
    assert(slept == 14L)
  }

  test("RetryingEmbedder gives up after the retry ceiling") {
    val t = new FakeTransport(Seq((429, "")))
    val e = new RetryingEmbedder(new HttpEmbedder(cfg, t),
      RetryPolicy(maxRetries = 2, delayMillis = 0L), _ => ())
    intercept[RetryableEmbeddingException] { e.embed(Seq("x")) }
    assert(t.calls.size == 3) // initial + 2 retries
  }

  test("RetryingEmbedder does NOT retry fatal statuses") {
    val t = new FakeTransport(Seq((500, "boom"), (200, okBody(1))))
    val e = new RetryingEmbedder(new HttpEmbedder(cfg, t),
      RetryPolicy(maxRetries = 5, delayMillis = 0L), _ => ())
    intercept[java.io.IOException] { e.embed(Seq("x")) }
    assert(t.calls.size == 1)
  }
}

/** JVM-global overlap probe: the embedder closure is serialized into
  * the task, so instance counters would mutate a task-side COPY —
  * statics are shared in local mode and observable from the test.
  */
object OverlapProbe {
  val active = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { active.set(0); maxActive.set(0) }
  def vecFor(text: String, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => (text.hashCode * (j + 1)).toFloat)
}

/** Latency-injecting fake: records how many embed() calls run
  * concurrently; vectors are a pure function of the text so alignment
  * is checkable per row.
  */
final class SlowFakeEmbedder(val dimensions: Int) extends Embedder {
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val a = OverlapProbe.active.incrementAndGet()
    OverlapProbe.maxActive.updateAndGet(m => math.max(m, a))
    Thread.sleep(40)
    OverlapProbe.active.decrementAndGet()
    texts.map(t => OverlapProbe.vecFor(t, dimensions))
  }
}

/** The remote client through the ACTUAL ingest dataflow — proves the
  * trait boundary holds end-to-end: HttpEmbedder (fake transport,
  * flaky on its first call) wrapped in the A16 retry policy, executed
  * inside mapPartitions on executors, batches ≤ 10.
  */
class HttpEmbedderPipelineSpec extends SparkSpec {

  test("maxInFlight overlaps embedding calls INSIDE one task; " +
      "alignment and order match the synchronous path") {
    import spark.implicits._
    import graft.pipeline.{IngestPipeline, PendingChunk}
    OverlapProbe.reset()
    val pending = (1 to 12)
      .map(i => PendingChunk(s"doc://$i", i, s"text $i", None))
      .toDS().coalesce(1) // ONE task: any overlap is intra-partition
    val out = IngestPipeline.embedChunks(pending, new SlowFakeEmbedder(4),
        IngestPipeline.Config(batchSize = 1, maxInFlight = 4))
      .collect()
    assert(OverlapProbe.maxActive.get() >= 2,
      s"no overlap observed (maxActive=${OverlapProbe.maxActive.get()})")
    // submission-order emission: rows come back in input order
    assert(out.map(_.chunk_id).toSeq == (1 to 12))
    // batch→row alignment: every vector is the fake's function of its
    // OWN row's text
    out.foreach(c => assert(c.embedding.toSeq ==
      OverlapProbe.vecFor(c.chunk_text, 4).toSeq, c.chunk_id))
  }

  test("maxInFlight propagates a batch failure as itself (A16 fatal)") {
    import spark.implicits._
    import graft.pipeline.{IngestPipeline, PendingChunk}
    val boom = new Embedder {
      val dimensions = 4
      override def embed(texts: Seq[String]): Seq[Array[Float]] =
        if (texts.exists(_.contains("7")))
          throw new java.io.IOException("fatal 500")
        else texts.map(_ => new Array[Float](4))
    }
    val pending = (1 to 8)
      .map(i => PendingChunk(s"doc://$i", i, s"text $i", None))
      .toDS().coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      IngestPipeline.embedChunks(pending, boom,
        IngestPipeline.Config(batchSize = 1, maxInFlight = 3)).collect()
    }
    assert(e.getCause.isInstanceOf[java.io.IOException] ||
      e.getMessage.contains("fatal 500"))
  }

  test("ingest pipeline embeds through a retrying HTTP client (A15/A16)") {
    import graft.embed._
    import graft.pipeline.IngestPipeline

    // Serializable scripted transport: the first call throttles (429,
    // exercising the executor-side retry), then answers every request
    // with vectors derived from the request's own batch size.
    val transport = new HttpTransport {
      @transient private var calls = 0
      override def post(url: String, body: String,
          headers: Map[String, String]): (Int, String) = {
        calls += 1
        if (calls == 1) return (429, "throttle")
        val root = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(body)
        val n = root.path("input").size()
        val items = (0 until n).map { i =>
          val vec = Seq.fill(4)(s"0.5").mkString(",")
          s"""{"index":$i,"embedding":[$vec]}"""
        }.mkString("""{"data":[""", ",", "]}")
        (200, items)
      }
    }
    val embedder = new RetryingEmbedder(
      new HttpEmbedder(HttpEmbedderConfig(
        endpoint = "http://fake/embed", dimensions = 4, maxBatchSize = 10),
        transport),
      RetryPolicy(maxRetries = 3, delayMillis = 0L), _ => ())

    val docs = Tables(spark, sf(), "documents").limit(25)
    val out = IngestPipeline.ingestDocumentsTable(spark, docs, embedder)
    import org.apache.spark.sql.functions._
    assert(out.count() == 25)
    assert(out.filter(size(col("embedding")) =!= 4).count() == 0)
    assert(out.select("embedding").head().getSeq[Float](0) ==
      Seq(0.5f, 0.5f, 0.5f, 0.5f))
  }
}
