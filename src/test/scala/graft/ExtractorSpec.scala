package graft

import graft.extract._

/** A5 remote-client behavior against a scripted fake transport — no
  * network (the EmbedderSpec pattern): submit → 202 → long-poll →
  * parse; synchronous 200; txt/md BOM-aware short-circuit; A16 retry
  * mapping (429/401 retryable with a bounded budget, others fatal);
  * bounded poll budget; and the Spark-side wiring through
  * `IngestPipeline.routeAndChunk` as a config choice.
  */
class ExtractorSpec extends SparkSpec {

  /** Scripted transport: pops one response per call, records every
    * request (method, url, body-as-string).
    */
  private final class FakeDocTransport(script: Seq[DocResponse])
      extends DocTransport {
    val calls =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    private var i = 0
    override def send(method: String, url: String, body: Array[Byte],
        headers: Map[String, String]): DocResponse = {
      calls += ((method, url, new String(body, "UTF-8")))
      val r = script(math.min(i, script.size - 1))
      i += 1
      r
    }
  }

  private def resultBody(status: String = "succeeded"): String =
    s"""{"status":"$status","analyzeResult":{
       |"content":"alpha beta\\ngamma delta",
       |"pages":[
       | {"pageNumber":1,
       |  "lines":[{"content":"alpha beta"}],
       |  "words":[{"content":"alpha"},{"content":"beta"}]},
       | {"pageNumber":2,
       |  "lines":[{"content":"gamma delta"}],
       |  "words":[{"content":"gamma"},{"content":"delta"}]}],
       |"paragraphs":[{"content":"alpha beta"},{"content":"gamma delta"}]
       |}}""".stripMargin.replace("\n", "")

  private val accepted = DocResponse(202,
    Map("operation-location" -> "http://svc/op/1"), "")
  private val running = DocResponse(200, Map.empty,
    """{"status":"running"}""")
  private def cfg = HttpExtractorConfig(
    endpoint = "http://svc/analyze", apiKey = Some("k"),
    maxRetries = 3, retryDelayMillis = 1L, pollIntervalMillis = 1L,
    maxPolls = 5)
  private def client(t: DocTransport) =
    new HttpExtractor(cfg, t, sleep = _ => ())

  test("submit → 202 → poll running → succeeded: parsed pages/words/content") {
    val t = new FakeDocTransport(Seq(accepted, running, running,
      DocResponse(200, Map.empty, resultBody())))
    val out = client(t).extract("doc.pdf", "rawbytes".getBytes)
    assert(out.pages.map(_.pageNumber) == Seq(1, 2))
    assert(out.pages.head.lines == Seq("alpha beta"))
    assert(out.pages(1).words == Seq("gamma", "delta"))
    assert(out.paragraphs == Seq("alpha beta", "gamma delta"))
    assert(out.content == "alpha beta\ngamma delta")
    // request shape: POST base64Source with the api key, then GETs of
    // the Operation-Location (header matched case-insensitively)
    val (m0, u0, b0) = t.calls.head
    assert(m0 == "POST" && u0 == "http://svc/analyze")
    assert(b0.contains("\"base64Source\":\"" +
      java.util.Base64.getEncoder.encodeToString("rawbytes".getBytes)))
    assert(t.calls.tail.forall { case (m, u, _) =>
      m == "GET" && u == "http://svc/op/1" })
    assert(t.calls.size == 4)
  }

  test("synchronous 200 on submit parses without polling") {
    val t = new FakeDocTransport(Seq(
      DocResponse(200, Map.empty, resultBody())))
    val out = client(t).extract("doc.pdf", "x".getBytes)
    assert(out.pages.size == 2 && t.calls.size == 1)
  }

  test("txt/md short-circuit to BOM-aware decode — no service call") {
    val t = new FakeDocTransport(Seq(accepted))
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "hello world\nsecond line".getBytes("UTF-8")
    val out = client(t).extract("notes.txt", bom)
    assert(out.content == "hello world\nsecond line")
    assert(out.pages.head.words == Seq("hello", "world", "second", "line"))
    assert(t.calls.isEmpty)
    val md = client(t).extract("readme.MD", "# title".getBytes)
    assert(md.content == "# title" && t.calls.isEmpty)
  }

  test("429/401 at submit retry within the bounded budget; then give up") {
    var slept = 0L
    val t = new FakeDocTransport(Seq(
      DocResponse(429, Map.empty, "busy"),
      DocResponse(401, Map.empty, "token"),
      DocResponse(200, Map.empty, resultBody())))
    val c = new HttpExtractor(cfg, t, sleep = ms => slept += ms)
    assert(c.extract("doc.pdf", "x".getBytes).pages.size == 2)
    assert(t.calls.size == 3 && slept == 2L)
    // budget exhaustion: maxRetries=3 → the 4th retryable is terminal
    val always429 = new FakeDocTransport(Seq(DocResponse(429, Map.empty, "")))
    val e = intercept[RetryableExtractionException] {
      client(always429).extract("doc.pdf", "x".getBytes)
    }
    assert(e.getMessage.contains("429") && e.getMessage.contains("3 retries"))
    assert(always429.calls.size == 4)
  }

  test("other statuses are fatal at submit and at poll") {
    val e = intercept[java.io.IOException] {
      client(new FakeDocTransport(Seq(DocResponse(500, Map.empty, "boom"))))
        .extract("doc.pdf", "x".getBytes)
    }
    assert(e.getMessage.contains("500"))
    val e2 = intercept[java.io.IOException] {
      client(new FakeDocTransport(Seq(accepted,
        DocResponse(503, Map.empty, "down"))))
        .extract("doc.pdf", "x".getBytes)
    }
    assert(e2.getMessage.contains("503"))
    // a failed operation is fatal, not retried
    val e3 = intercept[java.io.IOException] {
      client(new FakeDocTransport(Seq(accepted,
        DocResponse(200, Map.empty, """{"status":"failed","error":"bad"}"""))))
        .extract("doc.pdf", "x".getBytes)
    }
    assert(e3.getMessage.contains("failed"))
  }

  test("poll budget is bounded: a never-finishing operation throws") {
    val t = new FakeDocTransport(Seq(accepted, running))
    val e = intercept[java.io.IOException] {
      client(t).extract("doc.pdf", "x".getBytes)
    }
    assert(e.getMessage.contains("5 polls"))
  }

  test("wall-clock deadline bounds any retry/poll composition") {
    // per-path bounds individually generous, global deadline already
    // spent: the FIRST retry or poll wait must abort — no composition
    // of submit retries + polls can outrun the task envelope
    val spent = cfg.copy(maxRetries = 1000, maxPolls = 100000,
      deadlineMillis = 0L)
    val always429 = new FakeDocTransport(Seq(DocResponse(429, Map.empty, "")))
    val e1 = intercept[RetryableExtractionException] {
      new HttpExtractor(spent, always429, sleep = _ => ())
        .extract("doc.pdf", "x".getBytes)
    }
    assert(e1.getMessage.contains("deadline"))
    val neverDone = new FakeDocTransport(Seq(accepted, running))
    val e2 = intercept[RetryableExtractionException] {
      new HttpExtractor(spent, neverDone, sleep = _ => ())
        .extract("doc.pdf", "x".getBytes)
    }
    assert(e2.getMessage.contains("deadline"))
  }

  test("202 without Operation-Location is a loud failure") {
    val t = new FakeDocTransport(Seq(DocResponse(202, Map.empty, "")))
    val e = intercept[java.io.IOException] {
      client(t).extract("doc.pdf", "x".getBytes)
    }
    assert(e.getMessage.contains("Operation-Location"))
  }

  test("wired through IngestPipeline.routeAndChunk as the extractor") {
    import spark.implicits._
    // serializable scripted transport: every POST returns the result
    // synchronously (top-level class — the fake must survive the
    // closure round-trip without dragging the suite along)
    val extractor = new HttpExtractor(cfg,
      new SyncFakeTransport(resultBody()), sleep = _ => ())
    val files = Seq(
      ("a.pdf", "ignored".getBytes),
      ("b.txt", "plain text body here".getBytes)).toDS()
    val chunks = graft.pipeline.IngestPipeline
      .routeAndChunk(files, extractor).collect()
    // the pdf went through the remote parse; the txt never did
    assert(chunks.exists(c => c.document_url == "a.pdf" &&
      c.chunk_text.contains("alpha")))
    assert(chunks.exists(c => c.document_url == "b.txt" &&
      c.chunk_text.contains("plain text")))
  }
}

/** Executor-shippable fake: returns `body` for every request. */
private class SyncFakeTransport(body: String) extends DocTransport {
  override def send(method: String, url: String, reqBody: Array[Byte],
      headers: Map[String, String]): DocResponse =
    DocResponse(200, Map.empty, body)
}
