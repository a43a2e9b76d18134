package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.chunk._

/** Unit tests for the pure chunking kernels (SURVEY §5.2), anchored to
  * the reference boundary cases.
  */
class ChunkersSpec extends AnyFunSuite {

  // --- A6 fallback cascade -------------------------------------------------

  private def ex(
      pages: Seq[PageExtract] = Nil,
      paragraphs: Seq[String] = Nil,
      content: String = "") = Extracted(pages, paragraphs, content)

  test("cascade picks pages[].lines when present") {
    val e = ex(pages = Seq(
      PageExtract(1, Seq("l1", "l2"), Seq("w1")),
      PageExtract(2, Seq("l3"), Nil)))
    assert(Chunkers.cascadeLines(e) == Seq("l1", "l2", "l3"))
  }

  test("cascade falls back to paragraphs when pages have no lines") {
    val e = ex(pages = Seq(PageExtract(1, Nil, Seq("w"))),
      paragraphs = Seq("p1", "p2"))
    assert(Chunkers.cascadeLines(e) == Seq("p1", "p2"))
  }

  test("cascade falls back to re-blocked words (docx analog)") {
    val e = ex(pages = Seq(PageExtract(1, Nil, (1 to 50).map(i => s"w$i"))))
    val lines = Chunkers.cascadeLines(e)
    assert(lines.length == 2)
    assert(lines.head.split(' ').length == 41) // reference post-increment quirk
    assert(lines(1).split(' ').length == 9)
  }

  test("cascade falls back to whole content when nothing else") {
    assert(Chunkers.cascadeLines(ex(content = "body")) == Seq("body"))
    assert(Chunkers.cascadeLines(ex()) == Seq(""))
  }

  // --- A10 word re-blocking ------------------------------------------------

  test("reblockWords emits maxWords+1 blocks and a tail (reference quirk)") {
    val words = (1 to 100).map(i => s"w$i")
    val blocks = Chunkers.reblockWords(words, 40)
    assert(blocks.map(_.split(' ').length) == Seq(41, 41, 18))
    assert(blocks.flatMap(_.split(' ')) == words)
  }

  test("reblockWords on empty input") {
    assert(Chunkers.reblockWords(Nil) == Nil)
  }

  test("reblockWords exact multiple leaves no tail") {
    val words = (1 to 82).map(_.toString)
    assert(Chunkers.reblockWords(words, 40).length == 2)
  }

  // --- A11 char-bounded chunking with page provenance ----------------------

  test("charChunks: page provenance and tail page index == page count") {
    // Two pages; words sized so the first chunk closes inside page 0.
    val p0 = Seq.fill(30)("a" * 99) // 100 chars each with separator
    val p1 = Seq.fill(5)("b" * 99)
    val chunks = Chunkers.charChunksWithPages(Seq(p0, p1), chunkSize = 1000)
    assert(chunks.nonEmpty)
    assert(chunks.head.pageNumber.contains(0))
    assert(chunks.head.chunkNumber == 0)
    // reference quirk: tail flush happens after the loop has advanced
    // pageIdx past the last page
    assert(chunks.last.pageNumber.contains(2))
    // chunk numbering dense from 0
    assert(chunks.map(_.chunkNumber) == chunks.indices)
  }

  test("charChunks: emission on exceeding chunkSize (chunk may overrun)") {
    val chunks = Chunkers.charChunksWithPages(
      Seq(Seq("aaaa", "bbbb", "cccc")), chunkSize = 9)
    // "aaaa bbbb " has length 10 > 9 → emit "aaaa bbbb"; tail "cccc"
    assert(chunks.map(_.text) == Seq("aaaa bbbb", "cccc"))
  }

  test("charChunks: no content loss") {
    val pages = Seq(Seq("x", "yy", "zzz"), Seq("pp", "q"))
    val chunks = Chunkers.charChunksWithPages(pages, chunkSize = 4)
    assert(chunks.flatMap(_.text.split(' ')) == pages.flatten)
  }

  test("charChunks: empty input") {
    assert(Chunkers.charChunksWithPages(Nil) == Nil)
    assert(Chunkers.charChunksWithPages(Seq(Nil, Nil)) == Nil)
  }

  // --- A8/A9 paragraph splitting -------------------------------------------

  test("splitParagraphs packs short lines up to the token budget") {
    // 40-char lines ≈ 10 tokens each; budget 25 tokens → 2 lines per chunk
    val lines = (1 to 6).map(i => s"line$i" + ("x" * 35))
    val paras = Chunkers.splitParagraphs(lines, maxTokens = 25)
    assert(paras.length == 3)
    assert(paras.forall(p => Tokens.count(p) <= 25))
  }

  test("splitParagraphs: empty and blank input") {
    assert(Chunkers.splitParagraphs(Nil, 250) == Nil)
    assert(Chunkers.splitParagraphs(Seq(""), 250) == Nil)
    assert(Chunkers.splitParagraphs(Seq("  ", ""), 250) == Nil)
  }

  test("splitParagraphs splits an over-budget line at sentence bounds") {
    val line = ("A sentence here. " * 40).trim // ~680 chars ≈ 170 tokens
    val paras = Chunkers.splitParagraphs(Seq(line), maxTokens = 50)
    assert(paras.length > 1)
    assert(paras.forall(p => Tokens.count(p) <= 50))
    // no content loss modulo the trim/newline joins
    assert(paras.mkString(" ").split("\\s+").mkString(" ") ==
      line.split("\\s+").mkString(" "))
  }

  test("splitParagraphs handles separator-free text via midpoint cuts") {
    val line = "q" * 1000 // 250 tokens, no separators
    val paras = Chunkers.splitParagraphs(Seq(line), maxTokens = 50)
    assert(paras.forall(p => Tokens.count(p) <= 50))
    assert(paras.mkString == line)
  }

  test("splitParagraphs balances an undersized tail") {
    // budget 100 tokens (400 chars); lines of ~90 tokens then a tiny one:
    // without balancing the tiny line would be its own paragraph.
    val lines = Seq("a" * 360, "b" * 360, "tiny")
    val paras = Chunkers.splitParagraphs(lines, maxTokens = 100)
    assert(paras.length == 2)
    assert(paras.last.endsWith("tiny"))
  }

  test("splitParagraphs overlap appends the next chunk's head") {
    // budget = 25-5 = 20 tokens = 80 chars → one line per paragraph
    val lines = Seq("a" * 80, "b" * 80)
    val ovl = Chunkers.splitParagraphs(lines, maxTokens = 25, overlapTokens = 5)
    assert(ovl.length == 2)
    assert(ovl.head == "a" * 80 + " " + "b" * 20) // 5 tokens ≈ 20 chars
    assert(ovl(1) == "b" * 80) // last chunk has nothing to overlap
    // still within the overall budget
    assert(ovl.forall(p => Tokens.count(p) <= 25))
  }

  test("fixedSizeChunking numbers chunks densely from 0") {
    val e = ex(paragraphs = (1 to 20).map(i => s"para $i " + ("t" * 100)))
    val chunks = Chunkers.fixedSizeChunking(e, maxTokens = 60)
    assert(chunks.map(_.chunkNumber) == chunks.indices)
    assert(chunks.forall(_.pageNumber.isEmpty))
  }

  test("chunkTextLines and chunkMarkdownLines agree (txt→markdown quirk)") {
    val lines = Seq("Some text. More text here.", "And another line.")
    assert(Chunkers.chunkTextLines(lines, 10) ==
      Chunkers.chunkMarkdownLines(lines, 10))
  }

  // --- token estimator -----------------------------------------------------

  test("token heuristic is len/4") {
    assert(Tokens.count("") == 0)
    assert(Tokens.count("abcd") == 1)
    assert(Tokens.count("abcdefg") == 1)
    assert(Tokens.count("a" * 1000) == 250)
  }
}
