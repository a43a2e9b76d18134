package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeTrainer
import graft.ops.BpeTrainer.BpeModel

/** D26 BPE vocabulary induction: planted merge order, lossless
  * round-trip, determinism, serialization, and the codegen encoder.
  */
class BpeTrainerSpec extends SparkSpec {

  test("planted frequencies drive merge order") {
    // "ab" dominates -> ("a","b") must be the first merge; "cde"
    // appears 10x -> ("c","d") then ("cd","e") (pair counts 10 each,
    // lexicographic tie-break picks ("c","d") first)
    val types = Array(("ab", 100L), ("cde", 10L), ("fg", 1L))
    val m = BpeTrainer.trainFromTypes(types, numMerges = 3)
    assert(m.merges == Vector(("a", "b"), ("c", "d"), ("cd", "e")))
    // "fg" never merges: pair count 1 < minPairCount 2
    assert(!m.vocabulary.contains("fg"))
  }

  test("training exhausts cleanly when no pair clears minPairCount") {
    val m = BpeTrainer.trainFromTypes(
      Array(("xy", 1L), ("zq", 1L)), numMerges = 10)
    assert(m.merges.isEmpty)
  }

  test("encode round-trips pre-tokens losslessly and compresses") {
    import spark.implicits._
    val docs = Seq(
      "the cat sat on the mat, the cat sat again",
      "unicode café naïve 😀 emoji text",
      "numbers 12345 and punctuation!!! runs").toDF("text")
      .withColumn("id", monotonically_increasing_id())
    val model = BpeTrainer.learn(docs, "text", numMerges = 20,
      maxTypes = 1000, minPairCount = 2)
    assert(model.merges.nonEmpty)
    val enc = docs.withColumn("toks", BpeTrainer.encode(col("text"), model))
      .withColumn("pre", regexp_extract_all(col("text"),
        lit("'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"),
        lit(0)))
    val rows = enc.select(
      concat_ws("", col("toks")) === concat_ws("", col("pre")),
      size(col("toks")) <= aggregate(col("pre"), lit(0),
        (acc, w) => acc + length(w)))
      .collect()
    assert(rows.forall(r => r.getBoolean(0)), "lossless round-trip")
    assert(rows.forall(r => r.getBoolean(1)), "never longer than chars")
    // something actually merged somewhere
    val totalToks = enc.select(sum(size(col("toks")))).collect().head.getLong(0)
    val totalChars = enc.select(sum(aggregate(col("pre"), lit(0),
      (acc, w) => acc + length(w)))).collect().head.getLong(0)
    assert(totalToks < totalChars, s"$totalToks vs $totalChars")
  }

  test("deterministic and serialization round-trips") {
    import spark.implicits._
    val docs = Seq.tabulate(50)(i =>
      s"repeatable words appear here often $i").toDF("text")
    val a = BpeTrainer.learn(docs, "text", numMerges = 15, maxTypes = 500)
    val b = BpeTrainer.learn(docs, "text", numMerges = 15, maxTypes = 500)
    assert(a == b)
    assert(BpeModel.parse(a.serialized) == a)
  }

  test("bpe_encode works through SQL and codegen") {
    import spark.implicits._
    val model = BpeModel(Vector(("a", "b"), ("ab", "c")))
    val df = Seq("abc abx zabc").toDF("t")
    df.createOrReplaceTempView("bpe_in")
    val viaSql = spark.sql(
      s"SELECT bpe_encode(t, '${model.serialized}') AS toks FROM bpe_in")
      .collect().head.getSeq[String](0)
    // GPT-2 pre-tokens keep the leading space: "abc", " abx", " zabc"
    // "abc" -> ab+c -> abc; " abx" -> " ","ab","x"; " zabc" -> " ","z","abc"
    assert(viaSql == Seq("abc", " ", "ab", "x", " ", "z", "abc"))
  }
}
