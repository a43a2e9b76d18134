package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dedup operator semantics (SURVEY D1/D2) on planted duplicates. */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf(), "documents")
    .select(col("doc_id"), col("text")).limit(100).cache()

  test("exactDedup collapses identical content, keeps smallest id") {
    val doubled = docs.unionAll(
      docs.select((col("doc_id") + 5000L).as("doc_id"), col("text")))
    val out = Dedup.exactDedup(doubled, "doc_id", "text")
    assert(out.count() == 100)
    assert(out.filter(col("dups") =!= 2).count() == 0)
    assert(out.filter(col("keeper") >= 5000).count() == 0)
  }

  test("minhashLshPairs finds planted near-duplicates with high recall") {
    // edit each doc slightly: near-dup pair (id, id+5000) per doc
    val edited = docs.select((col("doc_id") + 5000L).as("doc_id"),
      concat(col("text"), lit(" tiny tail")).as("text"))
    val pairs = Dedup.minhashLshPairs(docs.unionAll(edited),
      "doc_id", "text", threshold = 0.5)
    val planted = pairs
      .filter(col("id2") === col("id1") + 5000L).count()
    assert(planted >= 90, s"recall too low: $planted/100") // LSH may miss a few
    // verification removes false positives: every pair really has j ≥ 0.5
    assert(pairs.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("simhashPairs: identical and near-identical texts pair up") {
    val edited = docs.select((col("doc_id") + 5000L).as("doc_id"),
      col("text")) // identical copy → hamming 0
    val pairs = Dedup.simhashPairs(docs.unionAll(edited),
      "doc_id", "text", maxHamming = 3)
    val planted = pairs
      .filter(col("id2") === col("id1") + 5000L && col("hamming") === 0)
      .count()
    assert(planted == 100)
  }

  test("wordJaccardPairs matches a hand-computed case") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val got = Dedup.wordJaccardPairs(df, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.6))) // |∩|=3, |∪|=5
  }

  test("shingles: n-grams with short-text collapse") {
    import spark.implicits._
    val out = Seq("one two three four", "hi")
      .toDF("t").select(Dedup.shingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set("one two three", "two three four"))
    assert(out(1) == Set("hi"))
  }
}
