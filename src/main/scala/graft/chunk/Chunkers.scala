package graft.chunk

import scala.collection.mutable.ArrayBuffer

/** The unit of embedding (SURVEY §1.1 item 3): superset of the two
  * reference shapes — Cosmos `TextChunk(Text, ChunkNumber)`
  * (reference: AzureCosmosDB/.../DocumentChunker.cs:7-9) and SQL
  * `TextChunk(Text, PageNumberIfKnown, ChunkNumber)`
  * (reference: AzureSQL/.../TextChunker.cs:6-9).
  */
final case class TextChunk(
    text: String,
    pageNumber: Option[Int],
    chunkNumber: Int)

/** Extraction output consumed by the chunker fallback cascade
  * (SURVEY §1.1 item 2; reference shape: Document Intelligence
  * AnalyzeResult as read at AzureCosmosDB/.../DocumentChunker.cs:40-56).
  */
final case class PageExtract(
    pageNumber: Int,
    lines: Seq[String],
    words: Seq[String])

final case class Extracted(
    pages: Seq[PageExtract],
    paragraphs: Seq[String],
    content: String)

/** Token estimation used for chunk budgeting (SURVEY D4). The
  * reference delegates to Semantic Kernel's text chunker, whose
  * published heuristic is ~4 characters per token; we adopt the same
  * heuristic as OUR spec (SK is marked experimental by the reference
  * itself — AzureCosmosDB/.../DocumentChunker.cs:16 SKEXP0050).
  */
object Tokens {
  def count(s: String): Int = s.length / 4
  def count2(chars: Int): Int = chars / 4
}

/** Pure-Scala chunking kernels (SURVEY A6, A8-A12). No Spark imports —
  * these are unit-testable functions that the Catalyst expression layer
  * and the pipeline stages call into.
  *
  * Reference fidelity notes (behaviors preserved on purpose):
  *  - word re-blocking emits 41-word blocks because the reference
  *    checks `wordCount > 40` AFTER incrementing
  *    (AzureCosmosDB/.../DocumentChunker.cs:97-106);
  *  - the char-bounded chunker's tail chunk carries page index ==
  *    page COUNT (the loop increments past the last page before the
  *    tail flush, AzureSQL/.../TextChunker.cs:39-48) and a lone
  *    trailing separator is dropped (`sb.Length > 1` guard, :43);
  *  - `.txt` input routes to the MARKDOWN splitter (the reference's
  *    ChunkTextLines body calls SplitMarkdownParagraphs,
  *    AzureCosmosDB/.../DocumentChunker.cs:63-71).
  */
object Chunkers {

  /** Separator preference for balanced long-line splitting, most to
    * least preferred. Plain text prefers line breaks, then sentence
    * punctuation; markdown prefers punctuation before line breaks.
    */
  private val PlainSeps: Seq[Seq[String]] = Seq(
    Seq("\n", "\r"), Seq("."), Seq("?", "!"), Seq(";"), Seq(":"),
    Seq(","), Seq(")", "]", "}"), Seq(" "), Seq("-"))

  private val MarkdownSeps: Seq[Seq[String]] = Seq(
    Seq(".", "!", "?"), Seq(";"), Seq(":"), Seq(","),
    Seq(")", "]", "}"), Seq(" "), Seq("-"), Seq("\n", "\r"))

  private def seps(markdown: Boolean): Seq[Seq[String]] =
    if (markdown) MarkdownSeps else PlainSeps

  /** Cut position just after the occurrence of any separator in the
    * group closest to the midpoint; -1 if no usable occurrence.
    */
  private def findCut(text: String, group: Seq[String]): Int = {
    val mid = text.length / 2
    var best = -1
    var bestDist = Int.MaxValue
    group.foreach { sep =>
      var idx = text.indexOf(sep)
      while (idx >= 0) {
        val cut = idx + sep.length
        val d = math.abs(cut - mid)
        if (cut > 0 && cut < text.length && d < bestDist) {
          bestDist = d
          best = cut
        }
        idx = text.indexOf(sep, idx + 1)
      }
    }
    best
  }

  /** Recursively split a line that exceeds the token budget, cutting
    * at the most-preferred separator nearest the midpoint (separator
    * stays on the left half); falls back to a hard midpoint cut for
    * separator-free text, so termination is guaranteed.
    */
  def splitLongLine(line: String, maxTokens: Int, markdown: Boolean): Seq[String] = {
    if (line.length <= 1 || Tokens.count(line) <= maxTokens) Seq(line)
    else {
      val cut = seps(markdown).iterator
        .map(g => findCut(line, g))
        .find(_ > 0)
        .getOrElse(math.max(1, line.length / 2))
      val (l, r) = line.splitAt(cut)
      splitLongLine(l, maxTokens, markdown) ++ splitLongLine(r, maxTokens, markdown)
    }
  }

  /** A8/A9 core: greedy packing of lines into paragraphs of at most
    * `maxTokens` (heuristic tokens), with a balancing pass that merges
    * an undersized final paragraph (< maxTokens/4) into its
    * predecessor when the merge fits, and optional leading-overlap
    * from the following paragraph.
    */
  def splitParagraphs(
      lines: Seq[String],
      maxTokens: Int,
      overlapTokens: Int = 0,
      markdown: Boolean = false): Seq[String] = {
    require(maxTokens > 0, "maxTokens must be positive")
    val budget = math.max(1, maxTokens - math.max(0, overlapTokens))
    val pieces = lines.flatMap(l => splitLongLine(l, budget, markdown))

    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    pieces.foreach { piece =>
      // account in characters over the candidate paragraph, not as a
      // sum of per-piece token counts — floor(len/4) per piece
      // undercounts the joined text and would overshoot the budget
      if (Tokens.count2(sb.length + piece.length) > budget && sb.nonEmpty) {
        val t = sb.result().trim
        if (t.nonEmpty) out += t
        sb.clear()
      }
      sb.append(piece).append('\n')
    }
    if (sb.nonEmpty) {
      val t = sb.result().trim
      if (t.nonEmpty) out += t
    }

    // Balance: fold an undersized tail into its predecessor
    // (whitespace-normalized, as the merge re-joins on single spaces).
    if (out.length > 1 && Tokens.count(out.last) < maxTokens / 4) {
      val mergedWords =
        out(out.length - 2).split("\\s+").filter(_.nonEmpty) ++
          out.last.split("\\s+").filter(_.nonEmpty)
      val merged = mergedWords.mkString(" ")
      if (Tokens.count(merged) <= maxTokens) {
        out.remove(out.length - 1)
        out(out.length - 1) = merged
      }
    }

    if (overlapTokens > 0 && out.length > 1) {
      out.toSeq.zipWithIndex.map { case (p, i) =>
        if (i == out.length - 1) p
        else {
          val next = out(i + 1)
          val raw = next.take(overlapTokens * 4)
          val cut = raw.lastIndexOf(' ')
          val ovl = (if (cut > 0) raw.substring(0, cut) else raw).trim
          if (ovl.isEmpty) p else p + " " + ovl
        }
      }
    } else out.toSeq
  }

  /** A6: fallback cascade — pages[].lines → paragraphs → pages[].words
    * (re-blocked) → whole content
    * (reference: AzureCosmosDB/.../DocumentChunker.cs:40-56).
    */
  def cascadeLines(e: Extracted): Seq[String] = {
    if (e.pages.nonEmpty && e.pages.head.lines.nonEmpty)
      e.pages.flatMap(_.lines)
    else if (e.paragraphs.nonEmpty)
      e.paragraphs
    else if (e.pages.nonEmpty && e.pages.head.words.nonEmpty)
      reblockWords(e.pages.flatMap(_.words))
    else
      Seq(Option(e.content).getOrElse(""))
  }

  /** A10: accumulate words into pseudo-lines. Preserved quirk: blocks
    * carry maxWords+1 words (post-increment check in the reference).
    */
  def reblockWords(words: Seq[String], maxWords: Int = 40): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var n = 0
    words.foreach { w =>
      sb.append(w).append(' ')
      n += 1
      if (n > maxWords) {
        sb.setLength(sb.length - 1)
        out += sb.result()
        sb.clear()
        n = 0
      }
    }
    if (sb.nonEmpty) {
      sb.setLength(sb.length - 1)
      out += sb.result()
    }
    out.toSeq
  }

  /** A8: token-bounded chunking over an extraction result, 0-based
    * chunk numbering (A12).
    */
  def fixedSizeChunking(
      e: Extracted,
      maxTokens: Int = 250,
      overlapTokens: Int = 0): Seq[TextChunk] =
    numbered(splitParagraphs(cascadeLines(e), maxTokens, overlapTokens,
      markdown = false))

  /** A9 (and the .txt path — reference quirk: both route to the
    * markdown splitter).
    */
  def chunkTextLines(
      lines: Seq[String],
      maxTokens: Int = 250,
      overlapTokens: Int = 0): Seq[TextChunk] =
    numbered(splitParagraphs(lines, maxTokens, overlapTokens, markdown = true))

  def chunkMarkdownLines(
      lines: Seq[String],
      maxTokens: Int = 250,
      overlapTokens: Int = 0): Seq[TextChunk] =
    numbered(splitParagraphs(lines, maxTokens, overlapTokens, markdown = true))

  private def numbered(paras: Seq[String]): Seq[TextChunk] =
    paras.zipWithIndex.map { case (p, i) => TextChunk(p, None, i) }

  /** A11: char-bounded word accumulation with page provenance
    * (reference: AzureSQL/.../TextChunker.cs:13-49). Emission happens
    * when the builder EXCEEDS chunkSize, so a chunk can overrun by up
    * to one word; preserved quirks: tail page index == page count and
    * the `length > 1` tail guard.
    */
  def charChunksWithPages(
      pages: Seq[Seq[String]],
      chunkSize: Int = 2048): Seq[TextChunk] = {
    val out = ArrayBuffer.empty[TextChunk]
    val sb = new StringBuilder
    var pageIdx = 0
    var chunkIdx = 0
    pages.foreach { words =>
      words.foreach { w =>
        sb.append(w).append(' ')
        if (sb.length > chunkSize) {
          sb.setLength(sb.length - 1)
          out += TextChunk(sb.result(), Some(pageIdx), chunkIdx)
          sb.clear()
          chunkIdx += 1
        }
      }
      pageIdx += 1
    }
    if (sb.length > 1) {
      sb.setLength(sb.length - 1)
      out += TextChunk(sb.result(), Some(pageIdx), chunkIdx)
    }
    out.toSeq
  }
}
