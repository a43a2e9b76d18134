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

  test("connectedComponents: chains collapse to min-id roots (D2e)") {
    import spark.implicits._
    // two chains (1-2-3, 10-11) and an isolated pair (20-21); the
    // chain is NOT a clique — propagation must walk 2 hops
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id1", "id2")
    val roots = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(roots == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // a longer path than maxIter allows fails loudly, never partial
    val chain = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id1", "id2")
    intercept[IllegalArgumentException](
      Dedup.connectedComponents(chain, maxIter = 2))
  }

  test("shingles: n-grams with short-text collapse") {
    import spark.implicits._
    val out = Seq("one two three four", "hi")
      .toDF("t").select(Dedup.shingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set("one two three", "two three four"))
    assert(out(1) == Set("hi"))
  }

  test("winnow fingerprints: the shared-substring guarantee holds") {
    import spark.implicits._
    import graft.functions.GraftFunctions.winnow_fingerprints
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    val a = s"completely unrelated preamble text here $passage and then some trailing content"
    val b = s"different opening words entirely $passage closing remarks differ too"
    val c = "nothing in common with either document at all whatsoever zzz"
    val fps = Seq(a, b, c).toDF("t")
      .select(winnow_fingerprints(col("t"), lit(8), lit(4)).as("f"))
      .collect().map(_.getSeq[Long](0).toSet)
    // a and b share a long passage → guaranteed common fingerprint
    assert((fps(0) & fps(1)).nonEmpty)
    // identical text → identical fingerprint set
    val again = Seq(a).toDF("t")
      .select(winnow_fingerprints(col("t"), lit(8), lit(4)).as("f"))
      .collect().head.getSeq[Long](0).toSet
    assert(again == fps(0))
    assert((fps(0) & fps(2)).isEmpty)
  }

  test("winnowOverlapPairs surfaces partial plagiarism, not unrelated docs") {
    import spark.implicits._
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // plant: doc 9000 = first half of doc 0 + second half of doc 1
    val d0 = texts.find(_._1 == 0).get._2
    val d1 = texts.find(_._1 == 1).get._2
    val frank = (9000L, d0.substring(0, d0.length / 2) + " " +
      d1.substring(d1.length / 2))
    val df = (texts :+ frank).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(df, "doc_id", "text",
        k = 8, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 9000L)), s"missing (0,9000) in $pairs")
    assert(pairs.contains((1L, 9000L)), s"missing (1,9000) in $pairs")
  }

  test("gram_hashes: positional, raw-split, short-text empty") {
    import spark.implicits._
    import graft.functions.GraftFunctions.gram_hashes
    val df = Seq(
      ("a b c d e", 1),     // 5 words, n=3 → 3 grams
      ("x a b c y", 2),     // shares gram "a b c" at pos 1
      ("a b", 3)            // < n words → empty
    ).toDF("t", "id")
    val rows = df.select(col("id"), gram_hashes(col("t"), lit(3)).as("g"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1).length == 3)
    assert(rows(2).length == 3)
    assert(rows(3).isEmpty)
    // equal grams hash equal across positions/documents; others differ
    assert(rows(1).head == rows(2)(1)) // "a b c" in both
    assert(rows(1)(1) != rows(2)(2))   // "b c d" vs "b c y"
  }

  test("repeatedNgramSpans merges a planted shared run into one span") {
    import spark.implicits._
    val filler1 = (0 until 20).map(i => s"u$i").mkString(" ")
    val filler2 = (0 until 20).map(i => s"v$i").mkString(" ")
    val shared = (0 until 12).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"$filler1 $shared"),           // shared run at words 20..31
      (2L, s"$shared $filler2"),           // shared run at words 0..11
      (3L, filler2 + " tailword")          // no shared 8-gram with others? v-words overlap doc 2!
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedNgramSpans(df, "doc_id", "text", n = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // doc 1: hits at positions 20..24 (grams starting in the shared
    // run) → one span [20, 31]
    assert(spans.contains((1L, 20L, 31L)), s"got $spans")
    // doc 2: s-run hits (0..4, covering words 0..11) are ADJACENT to
    // the v-run hits shared with doc 3 (12..24, covering 12..31) —
    // contiguous coverage merges into one maximal span [0, 31]
    assert(spans.contains((2L, 0L, 31L)), s"got $spans")
    // doc 3 shares its v-filler prefix with doc 2 → [0, 19]
    assert(spans.contains((3L, 0L, 19L)), s"got $spans")
  }

  test("groupMinhashOverlap: identical groups 1.0, disjoint groups 0.0") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten"
    val df = Seq(
      ("gA", a), ("gA", b),
      ("gB", a), ("gB", b),   // same union set as gA
      ("gC", "crimson amber teal violet maroon olive navy coral plum jade")
    ).toDF("source", "text")
    val m = graft.ops.Dedup.groupMinhashOverlap(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(m(("gA", "gA")) == 1.0)
    assert(m(("gA", "gB")) == 1.0)  // identical union sets
    assert(m(("gA", "gC")) == 0.0)  // disjoint vocabularies
    assert(m.size == 6)             // 3 groups → 6 ordered pairs
  }

  test("cutRepeatedSpans removes exactly the shared run, keeps the rest") {
    import spark.implicits._
    val run = (0 until 9).map(i => s"s$i").mkString(" ") // 9 shared words
    val df = Seq(
      (1L, s"a b c $run x y"),
      (2L, s"p q $run r"),
      (3L, "u v w entirely unrelated text here")
    ).toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(df, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (("a b c x y", 9L)))
    assert(out(2L) == (("p q r", 9L)))
    assert(out(3L) == (("u v w entirely unrelated text here", 0L)))
  }

  test("repeatedNgramSpans ignores runs repeated only within one doc") {
    import spark.implicits._
    val run = (0 until 10).map(i => s"w$i").mkString(" ")
    val other = (0 until 10).map(i => s"z$i").mkString(" ")
    val df = Seq(
      (1L, s"$run $run"),   // repeats internally, no second doc
      (2L, other)
    ).toDF("doc_id", "text")
    assert(Dedup.repeatedNgramSpans(df, "doc_id", "text", n = 8).count() == 0)
  }

  test("cutCommonLines removes corpus-common lines, keeps rare/blank lines (D23)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common header\nunique one\n\ncommon footer"),
      (2L, "common header\nunique two\ncommon footer"),
      (3L, "common header\nunique three\ncommon footer"),
      (4L, "solo doc\nno boilerplate here")
    ).toDF("doc_id", "text")
    val out = Dedup.cutCommonLines(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
    // header + footer hit 3 distinct docs → cut everywhere; unique
    // lines and the BLANK line survive (blanks are never candidates)
    assert(out(0).getString(1) == "unique one\n" && out(0).getLong(2) == 2)
    assert(out(1).getString(1) == "unique two" && out(1).getLong(2) == 2)
    assert(out(2).getString(1) == "unique three" && out(2).getLong(2) == 2)
    assert(out(3).getString(1) == "solo doc\nno boilerplate here" &&
      out(3).getLong(2) == 0)
    // raising the threshold above the corpus spread cuts nothing
    val none = Dedup.cutCommonLines(docs, "doc_id", "text", minDocs = 4)
    assert(none.filter(col("n_cut") =!= 0L).count() == 0)
  }
}
