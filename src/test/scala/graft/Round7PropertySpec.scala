package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.chunk.SemanticChunker
import graft.ops.BpeTrainer

/** Property tests for the round-7 kernels: BPE encode is lossless
  * against the pre-tokens for ANY trained model and ANY input
  * (unicode included), the trainer is invariant to type-table order,
  * and semantic chunking reassembles losslessly under arbitrary
  * sentence structure and parameters.
  */
class Round7PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genWord = Gen.nonEmptyListOf(
    Gen.frequency(
      8 -> Gen.alphaLowerChar.map(_.toString),
      2 -> Gen.oneOf("é", "ß", "中", "😀", "7"))).map(_.mkString)

  private val genText = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, genWord)
    seps <- Gen.listOfN(n, Gen.oneOf(" ", " ", ". ", "! ", "\n"))
  } yield ws.zip(seps).map { case (w, s) => w + s }.mkString

  test("bpe_encode is lossless vs pre-tokens for any model and text") {
    import spark.implicits._
    val genCase = for {
      text <- genText
      nTypes <- Gen.choose(1, 12)
      types <- Gen.listOfN(nTypes, genWord)
      merges <- Gen.choose(0, 20)
    } yield (text, types, merges)
    check(Prop.forAll(genCase) { case (text, types, nMerges) =>
      val model = BpeTrainer.trainFromTypes(
        types.map(w => (w, 5L)).toArray, nMerges, minPairCount = 1L)
      val pat =
        "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
      val row = Seq(text).toDF("t")
        .select(
          concat_ws("", BpeTrainer.encode(col("t"), model)).as("enc"),
          concat_ws("", regexp_extract_all(col("t"), lit(pat), lit(0)))
            .as("pre"))
        .collect().head
      row.getString(0) == row.getString(1)
    }, 25)
  }

  test("BPE training is invariant to type-table order") {
    val genTypes = for {
      n <- Gen.choose(1, 10)
      ts <- Gen.listOfN(n, Gen.zip(genWord, Gen.choose(1L, 50L)))
    } yield ts.distinctBy(_._1)
    check(Prop.forAll(genTypes) { types =>
      val a = BpeTrainer.trainFromTypes(types.toArray, 10)
      val b = BpeTrainer.trainFromTypes(
        scala.util.Random.shuffle(types).toArray, 10)
      a == b
    }, 25)
  }

  test("semantic chunking reassembles losslessly for any structure") {
    import spark.implicits._
    val genSentences = for {
      n <- Gen.choose(1, 12)
      ss <- Gen.listOfN(n, Gen.nonEmptyListOf(genWord).map(_.mkString(" ")))
    } yield ss.map(_ + ".").mkString(" ")
    val genParams = for {
      text <- genSentences
      maxD <- Gen.choose(0.1, 1.5)
      maxS <- Gen.choose(1, 6)
    } yield (text, maxD, maxS)
    check(Prop.forAll(genParams) { case (text, maxD, maxS) =>
      val out = SemanticChunker.chunk(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        maxDistance = maxD, maxSentences = maxS)
        .orderBy("chunk_number").collect()
      val rebuilt = out.map(_.getAs[String]("chunk_text")).mkString(" ")
      val budgetOk = out.forall(_.getAs[Int]("n_sentences") <= maxS)
      val dense = out.map(_.getAs[Int]("chunk_number")).toSeq ==
        out.indices.toSeq
      // sentence-level normalization: the splitter collapses the
      // inter-sentence whitespace to single spaces
      val normalized = text.split("(?<=[.!?…])\\s+|\\n+")
        .filter(_.trim.nonEmpty).mkString(" ")
      rebuilt == normalized && budgetOk && dense
    }, 20)
  }
}
