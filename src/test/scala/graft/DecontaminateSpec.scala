package graft

import org.apache.spark.sql.functions._

import graft.ops.Decontaminate

/** D11 — n-gram benchmark decontamination (see LlmOpsQueries d11 for
  * the oracle-gated variant over the harness table; this spec pins the
  * operator semantics on constructed corpora).
  */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private val evalDoc =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("blocklist members and their n-gram-sharing copies are flagged") {
    // doc 1 = eval doc verbatim; doc 2 shares an 8-gram window (same
    // first 9 words, new tail); doc 3 disjoint vocabulary; doc 4 a
    // 7-word overlap only (one short of the 8-gram rule -> clean).
    val corpus = Seq(
      (1L, evalDoc),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota other words"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "beta gamma delta epsilon zeta eta theta x y z")
    ).toDF("doc_id", "text")
    val bl = Seq((99L, evalDoc)).toDF("doc_id", "text")
    val out = Decontaminate.flag(corpus, bl, "doc_id", "text", n = 8)
      .select("doc_id", "contaminated", "n_hits")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    // doc 1: grams 1..3 of the eval doc all shared
    assert(out(1L) == ((true, 3L)))
    // doc 2: shares exactly the eval doc's grams at offsets 1 and 2
    assert(out(2L) == ((true, 2L)))
    assert(out(3L) == ((false, 0L)))
    assert(out(4L) == ((false, 0L)))
  }

  test("short blocklist text collapses to a whole-text shingle") {
    // word_shingles on < n words yields the whole text as one gram:
    // only an identical short document matches it.
    val corpus = Seq(
      (1L, "tiny eval prompt"),
      (2L, "tiny eval prompt plus trailing context")
    ).toDF("doc_id", "text")
    val bl = Seq((9L, "tiny eval prompt")).toDF("doc_id", "text")
    val out = Decontaminate.flag(corpus, bl, "doc_id", "text", n = 8)
      .select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toMap
    assert(out(1L))
    assert(!out(2L))
  }

  test("tokenization is case- and whitespace-insensitive") {
    val corpus = Seq(
      (1L, "Alpha  BETA\tgamma\ndelta epsilon zeta eta THETA iota kappa")
    ).toDF("doc_id", "text")
    val bl = Seq((9L, evalDoc)).toDF("doc_id", "text")
    val out = Decontaminate.flag(corpus, bl, "doc_id", "text", n = 8)
    assert(out.filter(col("contaminated")).count() == 1)
  }

  test("reserved output columns are rejected") {
    val corpus = Seq((1L, "a", true)).toDF("doc_id", "text", "contaminated")
    intercept[IllegalArgumentException] {
      Decontaminate.flag(corpus, corpus, "doc_id", "text")
    }
  }

  test("semanticFlags keeps every corpus row when the eval set is empty") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f))
    ).toDF("doc_id", "vec")
    val eval = Seq.empty[(Long, Array[Float])].toDF("doc_id", "vec")
    val out = Decontaminate.semanticFlags(corpus, eval,
        "doc_id", "vec", minSimilarity = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.isNullAt(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    // max_sim null, zero hits, not contaminated — rows never vanish
    assert(out.values.forall(_ == ((true, 0L, false))))
  }
}
