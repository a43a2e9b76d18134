package graft.extract

import java.nio.charset.StandardCharsets
import graft.chunk.{Extracted, PageExtract}

/** BOM-aware text decoding (SURVEY A4 — the reference's line reader
  * detects encodings from the BOM:
  * AzureCosmosDB/.../BlobTriggerFunction.cs:167-184).
  */
object TextDecode {

  def decode(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
      (bytes(2) & 0xff) == 0xbf)
      new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8)
    else if (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE)
    else if (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE)
    else
      new String(bytes, StandardCharsets.UTF_8)
  }

  /** Decode to lines, tolerating \r\n and \r line ends. */
  def decodeLines(bytes: Array[Byte]): Seq[String] =
    decode(bytes).split("\r\n|\r|\n", -1).toSeq
}

/** Document-structure extraction contract (SURVEY A5). In the
  * reference this is a network call to Document Intelligence
  * `prebuilt-read` (AzureCosmosDB/.../BlobTriggerFunction.cs:84-99);
  * external services are unreachable in this environment, so the
  * pluggable trait + deterministic stub are the load-bearing design,
  * wired through `mapPartitions` (side-effecting stage — deliberately
  * NOT a Catalyst expression).
  */
trait Extractor extends Serializable {
  def extract(path: String, content: Array[Byte]): Extracted
}

/** Deterministic STUB of the OCR/layout service for offline use: it
  * decodes the bytes as text and fabricates an AnalyzeResult-shaped
  * tree (pages of lines/words). Real deployments implement
  * [[Extractor]] with an HTTP client to their layout service; the
  * Spark-side plumbing (schema, batching, partitioning) is identical.
  */
final case class StubAnalyzeExtractor(
    linesPerPage: Int = 40) extends Extractor {

  override def extract(path: String, content: Array[Byte]): Extracted = {
    val lines = TextDecode.decodeLines(content).filter(_.nonEmpty)
    val pages = lines.grouped(math.max(1, linesPerPage)).zipWithIndex.map {
      case (pageLines, i) =>
        PageExtract(
          pageNumber = i + 1,
          lines = pageLines,
          words = pageLines.flatMap(_.split("\\s+").filter(_.nonEmpty)))
    }.toSeq
    Extracted(pages = pages, paragraphs = Nil,
      content = lines.mkString("\n"))
  }
}
