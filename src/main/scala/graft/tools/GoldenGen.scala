package graft.tools

import graft.chunk._

/** Scratch: print chunker outputs for the golden fixtures. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val md = Seq(
      "# Title",
      "",
      "Intro paragraph with several words. It continues for a while to fill the budget.",
      "- bullet one has some content",
      "- bullet two has more content",
      "",
      "Final paragraph. Short.")
    println("== markdown maxTokens=20 ==")
    Chunkers.chunkMarkdownLines(md, 20).foreach(c =>
      println(s"[${c.chunkNumber}] <${c.text.replace("\n", "\\n")}>"))

    val plain = Seq(
      "The quick brown fox jumps over the lazy dog near the river bank today.",
      "A second sentence follows; it has clauses, commas, and other brittle split points!",
      "Third line is terse.")
    println("== plain maxTokens=15 ==")
    Chunkers.splitParagraphs(plain, 15).foreach(p =>
      println(s"<${p.replace("\n", "\\n")}>"))

    println("== plain maxTokens=15 overlap=4 ==")
    Chunkers.splitParagraphs(plain, 15, 4).foreach(p =>
      println(s"<${p.replace("\n", "\\n")}>"))

    println("== charChunks 64 ==")
    val pages = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ").toSeq,
      "lambda mu nu xi omicron pi rho sigma".split(" ").toSeq)
    Chunkers.charChunksWithPages(pages, 64).foreach(c =>
      println(s"[${c.chunkNumber} p${c.pageNumber.get}] <${c.text}>"))
  }
}
