package graft

import org.apache.spark.sql.functions._

import graft.chunk.SemanticChunker
import graft.functions.GraftFunctions.bow_embed

/** D27 semantic chunking: topic shifts become chunk boundaries,
  * reassembly is lossless at the sentence level, the size backstop
  * holds, and the bow_embed kernel behaves (deterministic, unit-norm,
  * vocabulary overlap = proximity).
  */
class SemanticChunkerSpec extends SparkSpec {

  test("bow_embed: deterministic, unit norm, overlap means proximity") {
    import spark.implicits._
    val df = Seq(
      ("a", "spark shuffle partition exchange spark"),
      ("b", "spark shuffle partition spark codegen"),
      ("c", "cats purr milk whiskers kitten")).toDF("k", "t")
      .withColumn("v", bow_embed(col("t"), lit(32)))
    val m = df.select("k", "v").collect()
      .map(r => r.getString(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(cos(m("a"), m("a")) - 1.0) < 1e-5) // unit norm
    assert(cos(m("a"), m("b")) > 0.5)                  // shared vocab
    assert(cos(m("a"), m("c")) < 0.3)                  // disjoint vocab
    // determinism across evaluations
    val again = df.select("v").collect().head.getSeq[Float](0)
    assert(again == df.select("v").collect().head.getSeq[Float](0))
  }

  test("topic shift becomes the chunk boundary; reassembly is lossless") {
    import spark.implicits._
    // within-topic sentences share EXACT tokens (bag-of-words has no
    // stemming — that is the caller's normalization knob)
    val text = "Spark shuffles partition data. Spark shuffles partition " +
      "exchanges. Spark shuffles partition codegen. Cats purr milk " +
      "whiskers. Cats purr milk kittens. Cats purr milk bowls."
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = SemanticChunker.chunk(docs, "doc_id", "text",
      maxDistance = 0.6, maxSentences = 16)
      .orderBy("chunk_number").collect()
    assert(out.length == 2, out.mkString("\n"))
    assert(out(0).getAs[String]("chunk_text").startsWith("Spark"))
    assert(!out(0).getAs[String]("chunk_text").contains("Cats"))
    assert(out(1).getAs[String]("chunk_text").startsWith("Cats"))
    // sentence-level lossless: the chunks concatenate to the original
    assert(out.map(_.getAs[String]("chunk_text")).mkString(" ") == text)
  }

  test("size backstop splits an over-long coherent run") {
    import spark.implicits._
    val text = (1 to 7).map(i => s"Spark shuffles partition data $i.")
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = SemanticChunker.chunk(docs, "doc_id", "text",
      maxDistance = 0.9, maxSentences = 3)
      .orderBy("chunk_number").collect()
    assert(out.map(_.getAs[Int]("n_sentences")).toSeq == Seq(3, 3, 1))
    assert(out.map(_.getAs[String]("chunk_text")).mkString(" ") == text)
  }

  test("chunk numbering is dense per document and content-ordered") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alpha beta gamma. Alpha gamma beta. Cats purr milk."),
      (2L, "Only one sentence here.")).toDF("doc_id", "text")
    val out = SemanticChunker.chunk(docs, "doc_id", "text")
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(byDoc(2L).map(_.getAs[Int]("chunk_number")).toSeq == Seq(0))
    assert(byDoc(1L).map(_.getAs[Int]("chunk_number")).sorted.toSeq ==
      byDoc(1L).indices.toSeq)
  }

  test("blank, whitespace-only and NULL documents survive as one " +
      "empty chunk — chunk() is total over its input doc set") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One fish. Two fish."),
      (2L, ""), (3L, "   \n  "), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = SemanticChunker.chunk(docs, "doc_id", "text")
    assert(out.select("doc_id").distinct().count() == 4)
    Seq(2L, 3L, 4L).foreach { id =>
      val rows = out.filter(col("doc_id") === id).collect()
      assert(rows.length == 1, s"doc $id: ${rows.mkString(",")}")
      assert(rows.head.getAs[String]("chunk_text") == "")
      assert(rows.head.getAs[Int]("chunk_number") == 0)
      assert(rows.head.getAs[Int]("n_sentences") == 0)
    }
    val real = out.filter(col("doc_id") === 1L).collect().head
    assert(real.getAs[Int]("n_sentences") == 2)
  }
}
