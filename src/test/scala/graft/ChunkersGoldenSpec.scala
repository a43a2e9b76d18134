package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.chunk._

/** Golden outputs (SURVEY §5.5): chunk boundaries are the most
  * regression-prone semantics, so exact outputs for a fixture corpus
  * are pinned here. Any change to these is a spec change and must be
  * deliberate.
  */
class ChunkersGoldenSpec extends AnyFunSuite {

  test("golden: markdown chunking at 20 tokens") {
    val md = Seq(
      "# Title",
      "",
      "Intro paragraph with several words. It continues for a while to fill the budget.",
      "- bullet one has some content",
      "- bullet two has more content",
      "",
      "Final paragraph. Short.")
    assert(Chunkers.chunkMarkdownLines(md, 20).map(_.text) == Seq(
      "# Title",
      "Intro paragraph with several words. It continues for a while to fill the budget.",
      "- bullet one has some content\n- bullet two has more content",
      "Final paragraph. Short."))
  }

  private val plain = Seq(
    "The quick brown fox jumps over the lazy dog near the river bank today.",
    "A second sentence follows; it has clauses, commas, and other brittle split points!",
    "Third line is terse.")

  test("golden: plain chunking at 15 tokens") {
    assert(Chunkers.splitParagraphs(plain, 15) == Seq(
      "The quick brown fox jumps over the",
      "lazy dog near the river bank today.\nA second sentence follows;",
      "it has clauses, commas, and other brittle split points!",
      "Third line is terse."))
  }

  test("golden: plain chunking at 15 tokens with overlap 4") {
    assert(Chunkers.splitParagraphs(plain, 15, 4) == Seq(
      "The quick brown fox jumps over the lazy dog near",
      "lazy dog near the river bank today. A second",
      "A second sentence follows; it has clauses,",
      "it has clauses, commas, and other",
      "and other brittle split points! Third line is",
      "Third line is terse."))
  }

  test("golden: char chunking with page provenance at 64 chars") {
    val pages = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ").toSeq,
      "lambda mu nu xi omicron pi rho sigma".split(" ").toSeq)
    val got = Chunkers.charChunksWithPages(pages, 64)
    assert(got == Seq(
      // crosses into page 1 before exceeding the budget → page 1
      TextChunk("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        Some(1), 0),
      // tail flush: page index == page count (reference quirk)
      TextChunk("nu xi omicron pi rho sigma", Some(2), 1)))
  }

  test("golden: signature kernels are bit-stable") {
    import org.apache.spark.unsafe.types.UTF8String
    val t = UTF8String.fromString("the quick brown fox jumps over the lazy dog")
    assert(graft.functions.HashOps.simhash64(t, 2) ==
      graft.functions.HashOps.simhash64(t, 2))
    val sig = graft.functions.HashOps.minhashSignature(t, 8, 2)
    assert(sig.numElements() == 8)
    val sh = graft.functions.HashOps.wordShingles(t, 2)
    assert(sh.numElements() == 8) // 9 words → 8 distinct 2-shingles
  }
}
