package graft.extract

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.chunk.{Extracted, PageExtract}

/** Transport seam for the remote document-analysis client: one
  * request, one (status, headers, body) back. Production uses
  * [[JdkDocTransport]]; tests inject a scripted fake so the full
  * client — submit, long-poll, retry envelope, payload parse — runs
  * with no network. Serializable because the extractor ships to
  * executors and runs inside `flatMap`/`mapPartitions` (one client
  * per task, as the reference holds one service client per function
  * instance).
  */
trait DocTransport extends Serializable {
  def send(
      method: String,
      url: String,
      body: Array[Byte],
      headers: Map[String, String]): DocResponse
}

/** Response headers are matched case-insensitively by [[header]] —
  * HTTP header names are case-insensitive and proxies rewrite case.
  */
final case class DocResponse(
    status: Int,
    headers: Map[String, String],
    body: String) {
  def header(name: String): Option[String] =
    headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }
}

/** Plain-JDK transport (no extra dependencies). Connect/read timeouts
  * bound a hung service call so a Spark task fails fast instead of
  * pinning an executor slot.
  */
final class JdkDocTransport(
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends DocTransport {

  override def send(
      method: String,
      url: String,
      body: Array[Byte],
      headers: Map[String, String]): DocResponse = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      if (body.nonEmpty) {
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try out.write(body) finally out.close()
      }
      val status = conn.getResponseCode
      val in = if (status < 400) conn.getInputStream else conn.getErrorStream
      val text =
        if (in == null) ""
        else try new String(in.readAllBytes(), UTF_8) finally in.close()
      import scala.jdk.CollectionConverters._
      val hs = conn.getHeaderFields.asScala.collect {
        case (k, vs) if k != null && !vs.isEmpty => k -> vs.get(0)
      }.toMap
      DocResponse(status, hs, text)
    } finally conn.disconnect()
  }
}

/** Remote-extraction client configuration, mirroring the reference's
  * service-call shape (AzureCosmosDB/.../BlobTriggerFunction.cs:84-99
  * — an analyze submission long-polled to completion) with the A16
  * retry policy of the embedding hop (429 rate-limit and the 401
  * token-refresh quirk retry; everything else is fatal,
  * BlobTriggerFunction.cs:129-156).
  *
  * The TOTAL budget is a WALL-CLOCK DEADLINE enforced across the
  * whole extract() call — submit retries, polls, poll retries, and
  * the transport's own blocking time all count against it (the
  * reference's own loop, 100 × 10 s against a 10-minute function
  * timeout, is the bug SURVEY §6 names; per-path caps alone still
  * compose past the envelope, which is why the deadline is global).
  * Precision, stated honestly: sleeps are CLAMPED to the remaining
  * budget and the deadline is re-checked before each, but a transport
  * call already in flight when the budget runs out is not
  * interrupted — total time can overshoot `deadlineMillis` by AT MOST
  * one blocking transport call (the transport's own connect/read
  * timeout bounds that). The per-path bounds (`maxRetries`,
  * `maxPolls`) remain as fast-fail signals for a service that is
  * answering but stuck.
  */
final case class HttpExtractorConfig(
    endpoint: String,
    apiKey: Option[String] = None,
    retryableStatuses: Set[Int] = Set(429, 401),
    maxRetries: Int = 30,
    retryDelayMillis: Long = 10000L,
    pollIntervalMillis: Long = 1000L,
    maxPolls: Int = 300,
    deadlineMillis: Long = 480000L)

/** Raised for retryable analyze-service failures (the extractor twin
  * of `RetryableEmbeddingException`).
  */
final class RetryableExtractionException(msg: String)
    extends RuntimeException(msg)

/** A5 (remote flavor): JSON-over-HTTP document-analysis client behind
  * the [[Extractor]] trait, so `IngestPipeline` swaps it in for the
  * offline [[StubAnalyzeExtractor]] with no pipeline change.
  *
  * Protocol (the shape of every hosted layout/OCR service, and
  * specifically the reference's Document Intelligence call):
  *  - txt/md SHORT-CIRCUIT to BOM-aware [[TextDecode]] — plain text
  *    never needs the analysis service (the reference routes the same
  *    way; this client keeps the fallback so a direct caller gets it
  *    even outside `IngestPipeline`'s A3 routing).
  *  - submit: `POST endpoint` with `{"base64Source": "..."}`;
  *    a `200` carries the result inline (synchronous services), a
  *    `202` carries an `Operation-Location` header to poll — the
  *    `WaitUntil.Completed` long-poll the reference's SDK hides.
  *  - poll: `GET` the operation until `status` is `succeeded` (parse
  *    `analyzeResult`) or `failed` (fatal); bounded by `maxPolls`.
  *  - retry: ONLY the configured statuses (429/401), bounded by
  *    `maxRetries`, at both the submit and poll hops.
  *
  * Response parse: `analyzeResult.{content, pages[].lines[].content,
  * pages[].words[].content, paragraphs[].content}` → [[Extracted]] —
  * the exact tree the downstream chunkers (A6-A12) consume.
  */
final class HttpExtractor(
    cfg: HttpExtractorConfig,
    transport: DocTransport = new JdkDocTransport(),
    sleep: Long => Unit = Thread.sleep) extends Extractor {

  override def extract(path: String, content: Array[Byte]): Extracted = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i  => path.substring(i + 1).toLowerCase
    }
    ext match {
      case "txt" | "md" =>
        val lines = TextDecode.decodeLines(content).filter(_.nonEmpty)
        Extracted(
          pages = Seq(PageExtract(pageNumber = 1, lines = lines,
            words = lines.flatMap(_.split("\\s+").filter(_.nonEmpty)))),
          paragraphs = Nil,
          content = lines.mkString("\n"))
      case _ => analyze(path, content)
    }
  }

  private def headers: Map[String, String] =
    Map("Content-Type" -> "application/json") ++
      cfg.apiKey.map(k => "api-key" -> k)

  private def analyze(path: String, content: Array[Byte]): Extracted = {
    val deadline = System.currentTimeMillis() + cfg.deadlineMillis
    def checkDeadline(stage: String): Unit =
      if (System.currentTimeMillis() >= deadline)
        throw new RetryableExtractionException(
          s"analyze for $path exceeded the ${cfg.deadlineMillis} ms " +
            s"wall-clock deadline at $stage — the global budget no " +
            "retry/poll composition may pass")
    // never sleep past the deadline: a wait that would overshoot is
    // cut to the remaining budget, so the only possible overshoot is
    // one in-flight transport call (see the class doc)
    def boundedSleep(ms: Long): Unit = {
      val remaining = deadline - System.currentTimeMillis()
      if (remaining > 0) sleep(math.min(ms, remaining))
    }
    var retries = 0
    def retryOr(status: Int, stage: String)(fatal: => Nothing): Unit =
      if (cfg.retryableStatuses(status)) {
        retries += 1
        if (retries > cfg.maxRetries)
          throw new RetryableExtractionException(
            s"analyze service still returning $status at $stage after " +
              s"${cfg.maxRetries} retries for $path")
        checkDeadline(stage)
        boundedSleep(cfg.retryDelayMillis)
      } else fatal

    val body = requestJson(content)
    // submit (re-submission loop only for retryable statuses)
    var submitted: Option[DocResponse] = None
    while (submitted.isEmpty) {
      val r = transport.send("POST", cfg.endpoint, body, headers)
      r.status match {
        case 200 | 202 => submitted = Some(r)
        case s => retryOr(s, "submit")(throw new java.io.IOException(
          s"analyze service returned fatal status $s for $path: ${
            r.body.take(200)}"))
      }
    }
    val first = submitted.get
    if (first.status == 200) return parseResult(first.body, path)

    // long-poll the operation to completion (WaitUntil.Completed)
    val op = first.header("Operation-Location").getOrElse(
      throw new java.io.IOException(
        s"202 without Operation-Location from analyze service for $path"))
    var polls = 0
    while (true) {
      val r = transport.send("GET", op, Array.emptyByteArray,
        headers - "Content-Type")
      r.status match {
        case 200 =>
          val root = mapper.readTree(r.body)
          root.path("status").asText("") match {
            case "succeeded" => return parseResult(r.body, path)
            case "failed" => throw new java.io.IOException(
              s"analyze operation failed for $path: ${r.body.take(200)}")
            case _ => // notStarted / running
              polls += 1
              if (polls > cfg.maxPolls) throw new java.io.IOException(
                s"analyze operation still running after ${cfg.maxPolls} " +
                  s"polls for $path — exceeds the bounded budget")
              checkDeadline("poll")
              boundedSleep(cfg.pollIntervalMillis)
          }
        case s => retryOr(s, "poll")(throw new java.io.IOException(
          s"analyze poll returned fatal status $s for $path: ${
            r.body.take(200)}"))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // one mapper per client: construction is Jackson's most expensive
  // operation and it is thread-safe after configuration; transient
  // because ObjectMapper is not serializable (rebuilt per executor)
  @transient private lazy val mapper = new ObjectMapper()

  private def requestJson(content: Array[Byte]): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("base64Source",
      java.util.Base64.getEncoder.encodeToString(content))
    mapper.writeValueAsString(root).getBytes(UTF_8)
  }

  private def parseResult(body: String, path: String): Extracted = {
    val root = mapper.readTree(body)
    val ar = root.path("analyzeResult")
    require(!ar.isMissingNode,
      s"analyze response for $path has no analyzeResult: ${body.take(200)}")
    def texts(node: JsonNode): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      node.forEach { item: JsonNode => out += item.path("content").asText("") }
      out.toSeq
    }
    val pages = {
      val out = scala.collection.mutable.ArrayBuffer.empty[PageExtract]
      ar.path("pages").forEach { p: JsonNode =>
        out += PageExtract(
          pageNumber = p.path("pageNumber").asInt(out.size + 1),
          lines = texts(p.path("lines")),
          words = texts(p.path("words")))
      }
      out.toSeq
    }
    Extracted(
      pages = pages,
      paragraphs = texts(ar.path("paragraphs")),
      content = ar.path("content").asText(""))
  }
}
