package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.chunk._

/** Property tests (SURVEY §5.3): content preservation, budget
  * compliance, dense numbering — for any word sequence. Driven through
  * ScalaCheck's Test API directly (no scalatestplus bridge needed).
  */
class ChunkersPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val words: Gen[List[String]] = Gen.listOf(word)

  test("reblockWords: lossless and ≤ maxWords+1 per block") {
    check(Prop.forAll(words, Gen.chooseNum(1, 60)) { (ws, mw) =>
      val blocks = Chunkers.reblockWords(ws, mw)
      val lossless = blocks.flatMap(_.split(' ')).toList == ws
      val bounded = blocks.forall(_.split(' ').length <= mw + 1)
      lossless && bounded
    })
  }

  test("charChunks: lossless, dense numbering, bounded overrun") {
    check(Prop.forAll(Gen.listOf(words), Gen.chooseNum(4, 64)) { (pages, cs) =>
      val nonEmptyPages = pages.map(_.filter(_.nonEmpty))
      val chunks = Chunkers.charChunksWithPages(nonEmptyPages, cs)
      val lossless =
        chunks.flatMap(_.text.split(' ')).toList == nonEmptyPages.flatten
      val dense = chunks.map(_.chunkNumber) == chunks.indices
      // a chunk exceeds the budget by at most one word + separator
      val maxWord = nonEmptyPages.flatten.map(_.length).maxOption.getOrElse(0)
      val bounded = chunks.forall(_.text.length <= cs + maxWord + 1)
      lossless && dense && bounded
    })
  }

  test("splitParagraphs: within budget and word-lossless") {
    val line: Gen[String] = Gen.chooseNum(0, 30)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOf(line), Gen.chooseNum(5, 100)) { (lines, mt) =>
      val paras = Chunkers.splitParagraphs(lines, mt)
      val bounded = paras.forall(p => Tokens.count(p) <= mt)
      val normalize = (ss: Seq[String]) =>
        ss.flatMap(_.split("\\s+")).filter(_.nonEmpty).mkString(" ")
      val lossless = normalize(paras) == normalize(lines)
      bounded && lossless
    })
  }

  test("fixedSizeChunking: dense 0-based numbering") {
    check(Prop.forAll(Gen.listOf(word)) { ws =>
      val e = Extracted(Nil, ws.filter(_.nonEmpty), "")
      val chunks = Chunkers.fixedSizeChunking(e, 20)
      chunks.map(_.chunkNumber) == chunks.indices
    })
  }
}
