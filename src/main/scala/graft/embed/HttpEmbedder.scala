package graft.embed

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Transport seam for remote embedder clients: one POST, one
  * (status, body) back. Production uses [[JdkHttpTransport]]; tests
  * inject a scripted fake so the full client — batching, payload
  * shape, status mapping, index re-alignment — runs with no network.
  * Serializable because the embedder is shipped to executors and
  * called from `mapPartitions` (one client per task, as the reference
  * holds one service client per function instance).
  */
trait HttpTransport extends Serializable {
  def post(url: String, body: String, headers: Map[String, String]): (Int, String)
}

/** Plain-JDK transport (java.net.HttpURLConnection — no extra
  * dependencies). Connect/read timeouts bound a hung service call so
  * a Spark task fails fast instead of pinning an executor slot.
  */
final class JdkHttpTransport(
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000) extends HttpTransport {

  override def post(
      url: String,
      body: String,
      headers: Map[String, String]): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val out = conn.getOutputStream
      try out.write(body.getBytes(UTF_8)) finally out.close()
      val status = conn.getResponseCode
      val in = if (status < 400) conn.getInputStream else conn.getErrorStream
      val text =
        if (in == null) ""
        else try new String(in.readAllBytes(), UTF_8) finally in.close()
      (status, text)
    } finally conn.disconnect()
  }
}

/** Remote-embedder client configuration, mirroring the reference's
  * service-call shape (AzureCosmosDB/.../BlobTriggerFunction.cs:26-36,
  * 122-157): batches capped at `maxBatchSize` (=10 there), an optional
  * `dimensions` request parameter (the reference reduces its model's
  * native width to 1536), and retry ONLY on the status codes the
  * reference treats as transient (429 rate-limit and its 401
  * token-refresh quirk); anything else is fatal.
  */
final case class HttpEmbedderConfig(
    endpoint: String,
    model: String = "",
    apiKey: Option[String] = None,
    dimensions: Int = 1536,
    sendDimensions: Boolean = true,
    maxBatchSize: Int = 10,
    retryableStatuses: Set[Int] = Set(429, 401))

/** A15 (remote flavor): JSON-over-HTTP embeddings client behind the
  * [[Embedder]] trait, so `IngestPipeline.embedChunks` swaps it in for
  * the offline fake with no pipeline change. Wrap in
  * [[RetryingEmbedder]] for the A16 policy — this class maps
  * retryable statuses to [[RetryableEmbeddingException]] and nothing
  * else, so the retry loop never spins on a fatal error.
  *
  * Request:  {"input": ["...", ...], "model": "...", "dimensions": N}
  * Response: {"data": [{"index": i, "embedding": [..]}, ...]} —
  * re-aligned by the `index` field (the service may reorder), then
  * checked 1:1 against the input batch.
  */
final class HttpEmbedder(
    cfg: HttpEmbedderConfig,
    transport: HttpTransport = new JdkHttpTransport()) extends Embedder {

  override def dimensions: Int = cfg.dimensions

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.grouped(math.max(1, cfg.maxBatchSize)).flatMap(embedBatch).toSeq

  private def embedBatch(batch: Seq[String]): Seq[Array[Float]] = {
    val (status, body) = transport.post(cfg.endpoint, requestJson(batch),
      cfg.apiKey.map(k => "api-key" -> k).toMap)
    status match {
      case 200 => parseResponse(body, batch.size)
      case s if cfg.retryableStatuses(s) =>
        throw new RetryableEmbeddingException(
          s"embedding service returned retryable status $s")
      case s =>
        throw new java.io.IOException(
          s"embedding service returned fatal status $s: ${body.take(200)}")
    }
  }

  private def requestJson(batch: Seq[String]): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val input = root.putArray("input")
    batch.foreach(input.add)
    if (cfg.model.nonEmpty) root.put("model", cfg.model)
    if (cfg.sendDimensions) root.put("dimensions", cfg.dimensions)
    m.writeValueAsString(root)
  }

  private def parseResponse(body: String, expected: Int): Seq[Array[Float]] = {
    val root = new ObjectMapper().readTree(body)
    val data = root.path("data")
    require(data.isArray && data.size() == expected,
      s"embedding response carries ${data.size()} vectors for a " +
        s"batch of $expected")
    val out = new Array[Array[Float]](expected)
    data.forEach { item: JsonNode =>
      val ix = item.path("index").asInt(-1)
      require(ix >= 0 && ix < expected, s"embedding response index $ix " +
        s"outside batch of $expected")
      require(out(ix) == null, s"duplicate embedding response index $ix")
      val emb = item.path("embedding")
      require(emb.isArray, "embedding response item has no embedding array")
      require(emb.size() == cfg.dimensions,
        s"embedding response width ${emb.size()} != configured " +
          s"dimensions ${cfg.dimensions} — the service ignored the " +
          "dimensions parameter or is misconfigured")
      val v = new Array[Float](emb.size())
      var j = 0
      while (j < v.length) { v(j) = emb.get(j).floatValue(); j += 1 }
      out(ix) = v
    }
    out.toSeq
  }
}
