package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.{Retrieval, Dedup, Sampling, TextAnalysis}

/** Hybrid retrieval (B6/B7) and the round-4 corpus operators (D13-D15):
  * RRF fusion arithmetic, MMR greedy cross-check, SemDeDup planted
  * recovery, n-gram multiset semantics, DSIR weight direction.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("rrfFuse sums reciprocal ranks and treats absence as zero") {
    val r1 = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val r2 = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(r1, r2), "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused(2L) == math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6)
    assert(fused(1L) == math.rint(1.0 / 61 * 1e6) / 1e6)
    assert(fused(4L) == math.rint(1.0 / 62 * 1e6) / 1e6)
    assert(fused.size == 4)
    // item in both lists beats the two top-1-only items here
    assert(fused(2L) > fused(1L) && fused(2L) > fused(4L))
  }

  test("bm25 ranks an on-topic document above an off-topic one") {
    val docs = Seq(
      (1L, "window filter window filter window"),
      (2L, "window of other words entirely unrelated padding here"),
      (3L, "nothing relevant at all in this text")).toDF("doc_id", "text")
    val scores = Retrieval.bm25(docs, "doc_id", "text",
        Seq("window", "filter"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    assert(!scores.contains(3L)) // no query term → no score row
  }

  test("mmrRerank agrees with a brute-force greedy reference") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 30L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val q = Array.fill(16)(rnd.nextGaussian().toFloat)
    val df = vecs.toDF("id", "v")
    val lambda = 0.5
    val got = Retrieval.mmrRerank(df, "id", "v", q.toSeq, k = 6,
        lambda = lambda)
      .orderBy("mmr_rank").collect().map(_.getLong(0)).toSeq

    // independent functional reference (map-based, no shared arrays)
    def sim(a: Array[Float], b: Array[Float]) =
      1.0 - VectorOps.cosineDistance(a, b)
    val rel = vecs.map { case (i, v) => i -> sim(v, q) }.toMap
    var selected = Vector.empty[Long]
    var remaining = vecs.map(_._1).toSet
    while (selected.length < 6) {
      val byId = vecs.toMap
      val pick = remaining.toSeq.sorted.maxBy { i =>
        val div =
          if (selected.isEmpty) 0.0
          else selected.map(s => sim(byId(i), byId(s))).max
        // negate id epsilon-free: maxBy keeps the FIRST max of the
        // sorted scan, so ties resolve to the smallest id
        lambda * rel(i) - (1 - lambda) * div
      }
      selected :+= pick
      remaining -= pick
    }
    assert(got == selected)
    // rank 1 is the pure-relevance argmax
    assert(got.head == vecs.maxBy { case (i, v) => (sim(v, q), -i) }._1)
  }

  test("semanticDedup flags planted copies with their original as root") {
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
      .select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") < 20).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x + ((i % 3) - 1).cast("float") * lit(1e-4f)).as("embedding"))
    val out = Dedup.semanticDedup(emb.union(planted),
      "vec_id", "embedding", nCells = 8, tau = 0.99)
    val copies = out.filter(col("vec_id") >= 100000).collect()
    assert(copies.length == 20)
    copies.foreach { r =>
      assert(r.getBoolean(2), s"copy ${r.getLong(0)} not flagged")
      assert(r.getLong(3) == r.getLong(0) - 100000,
        s"copy ${r.getLong(0)} rooted at ${r.getLong(3)}")
    }
    // keepers (the originals) must never be flagged as dups of copies
    val originals = out.filter(col("vec_id") < 100000 && col("is_dup"))
      .select("dup_of").collect().map(_.getLong(0))
    assert(originals.forall(_ < 100000))
  }

  test("wordNgrams keeps multiplicity and drops short texts") {
    val df = Seq("a b a b", "single", "", "  x   y  ").toDF("t")
      .select(TextAnalysis.wordNgrams(col("t"), 2).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got(0) == List("a b", "b a", "a b")) // duplicate bigram kept
    assert(got(1) == Nil) // < n words → empty, no whole-text collapse
    assert(got(2) == Nil)
    assert(got(3) == List("x y")) // whitespace runs collapse
  }

  test("importanceWeights scores target-like documents higher") {
    // two sub-languages: target docs repeat "alpha beta", raw filler
    // repeats "gamma delta"; held-out docs of each style must separate
    val docs = ((0L until 40L).map { i =>
      if (i % 10 == 0) (i, "alpha beta alpha beta alpha beta")
      else (i, "gamma delta gamma delta gamma delta")
    } ++ Seq((100L, "alpha beta alpha beta"),
      (101L, "gamma delta gamma delta"))).toDF("doc_id", "text")
    val scores = Sampling.importanceWeights(docs,
        col("doc_id") % 10 === 0 && col("doc_id") < 40L,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores(100L) > 0, s"target-like ${scores(100L)}")
    assert(scores(101L) < 0, s"raw-like ${scores(101L)}")
    assert(scores(100L) > scores(101L))
  }

  test("assembleContext fills the budget greedily, skipping oversize (B8)") {
    import spark.implicits._
    import graft.ops.Retrieval
    // 4-char tokens: text of n*4 chars = n tokens
    def text(n: Int): String = "abcd" * n
    val docs = Seq(
      (1L, text(50)), // rank 1: 50 tokens — fits
      (2L, text(80)), // rank 2: 80 tokens — would exceed 100, skipped
      (3L, text(30)), // rank 3: 30 tokens — fits after the skip
      (4L, text(25)), // rank 4: 25 tokens — no longer fits (80+25>100... 50+30=80, +25=105>100) skipped
      (5L, text(20))  // rank 5: 20 tokens — fits exactly (80+20=100)
    ).toDF("doc_id", "text")
    val ranked = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L))
      .toDF("doc_id", "mmr_rank")
    val got = Retrieval.assembleContext(ranked, docs,
        "doc_id", "mmr_rank", "text", 100L)
      .orderBy("ctx_rank")
      .select("doc_id", "ctx_rank", "tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1, 50L, 50L), (3L, 2, 30L, 80L),
      (5L, 3, 20L, 100L)))
  }

  test("assembleContext: nothing fits → empty; everything fits → all") {
    import spark.implicits._
    import graft.ops.Retrieval
    val docs = Seq((1L, "abcd" * 50)).toDF("doc_id", "text")
    val ranked = Seq((1L, 1L)).toDF("doc_id", "mmr_rank")
    assert(Retrieval.assembleContext(ranked, docs,
      "doc_id", "mmr_rank", "text", 10L).count() === 0)
    assert(Retrieval.assembleContext(ranked, docs,
      "doc_id", "mmr_rank", "text", 50L).count() === 1)
    intercept[IllegalArgumentException] {
      Retrieval.assembleContext(ranked, docs,
        "doc_id", "mmr_rank", "text", 0L)
    }
  }

  test("evalRanking: reciprocal rank, recall@k, and the no-hit case") {
    import spark.implicits._
    val ranked = Seq(
      // q1: relevant at ranks 2 and 4 (of 4)
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L),
      // q2: no relevant hit in the ranking
      (2L, 10L, 1L), (2L, 12L, 2L)
    ).toDF("q", "d", "rank")
    val gold = Seq(
      (1L, 11L), (1L, 13L), (1L, 99L), // 99 never retrieved
      (2L, 42L)
    ).toDF("q", "d")
    val at2 = Retrieval.evalRanking(ranked, gold, "q", "d", "rank", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    // q1: first hit rank 2 → rr 0.5; 1 of 3 gold within top-2
    assert(at2(1L) == ((0.5, BigDecimal(1.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(at2(2L) == ((0.0, 0.0)))
    val at4 = Retrieval.evalRanking(ranked, gold, "q", "d", "rank", k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // q1: 2 of 3 gold within top-4
    assert(at4(1L) == BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("snippets: first match, clamped window, case-folded, no-match drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c TARGET d e f g"),   // centered window
      (2L, "TARGET x y z q r s"),     // clamped at the start
      (3L, "p q r s t u target"),     // clamped at the end
      (4L, "target early target late"), // first match wins
      (5L, "no match here")
    ).toDF("doc_id", "text")
    val got = Retrieval.snippets(docs, "doc_id", "text", "Target", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((4L, "a b c TARGET d e f")))
    assert(got(2L) == ((1L, "TARGET x y z")))
    assert(got(3L) == ((7L, "s t u target")))
    assert(got(4L) == ((1L, "target early target late")))
    assert(!got.contains(5L) && got.size == 4)
  }

  test("lateInteraction: MaxSim picks each query vector's best match") {
    import spark.implicits._
    // doc A holds exact matches for both query vectors → score 2.0;
    // doc B holds one exact match and one orthogonal → score 1.0;
    // single-vector mean pooling could NOT separate A from a doc
    // averaging both directions — MaxSim must.
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val e3 = Array(0f, 0f, 1f, 0f)
    val docVecs = Seq(
      ("A", e1), ("A", e2),
      ("B", e1), ("B", e3)
    ).toDF("doc", "v")
    val queryVecs = Seq((0L, e1), (1L, e2)).toDF("qid", "v")
    val got = Retrieval.lateInteraction(docVecs, queryVecs,
        "doc", "v", "qid", k = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("A", 2.0), ("B", 1.0)))
  }

  test("importanceWeights: no bigrams → null score, zero n_grams") {
    val docs = Seq((1L, "word"), (2L, "two words")).toDF("doc_id", "text")
    val rows = Sampling.importanceWeights(docs, lit(false),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getLong(1) == 0L && rows(0).isNullAt(3))
    assert(rows(1).getLong(1) == 1L && !rows(1).isNullAt(3))
  }
}
