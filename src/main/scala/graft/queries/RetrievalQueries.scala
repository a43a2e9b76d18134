package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.ops.{Retrieval, Similarity, VectorSearch}

/** Hybrid retrieval conformance queries (SURVEY B6/B7): BM25 + vector
  * rank fusion and diversity-aware reranking — the read-path
  * composition the reference's store provisions both index kinds for.
  */
object RetrievalQueries {

  /** Deterministic exact vector top-k with full tiebreak (dist, id) —
    * the candidate list both queries below consume.
    */
  private def vectorTopK(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int) = {
    val emb = Tables(s, dir, "embeddings")
    val probe = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    emb.select(col("vec_id").as("doc_id"),
        (round(cosine_distance(col("embedding"), typedlit(probe)), 6)
          + lit(0.0)).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(k)
  }

  def defs: Map[String, QueryDef] = Map(

    // B6: hybrid full-text + vector retrieval, fused by reciprocal
    // rank (RRF, k=60). Both input rankings are deterministic top-20
    // lists (scores rounded to 6dp, ties broken by id), so the fused
    // scores are exact rational sums both engines reproduce. The
    // single-partition rank windows run over 20-row inputs
    // (dimension-scale by construction — the corpus-scale work is
    // inside the BM25/vector top-k operators).
    // B10: retrieval evaluation (MRR components + recall@k) — the
    // metrics loop for tuning the read path. Ranking = exact top-10
    // cosine for 5 probe vectors; gold = same-label vectors excluding
    // the probe itself (the probe is still rank 1 in the ranking, as
    // a distractor the metric must skip). Full hash-match oracle:
    // DuckDB replays the ranking, the gold set, the first-hit
    // reciprocal rank (0 when no hit), and the recall fraction.
    "b10_retrieval_eval" -> QueryDef(
      """WITH r AS (
        |  SELECT p.vec_id AS probe_id, b.vec_id AS nn_id,
        |         ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |           ORDER BY ROUND(1.0 - list_cosine_similarity(
        |                     b.embedding::DOUBLE[], p.embedding::DOUBLE[]), 6),
        |                 b.vec_id) AS rk
        |  FROM embeddings b, embeddings p WHERE p.vec_id < 5),
        |r10 AS (SELECT * FROM r WHERE rk <= 10),
        |g AS (SELECT p.vec_id AS probe_id, b.vec_id AS nn_id
        |      FROM embeddings b, embeddings p
        |      WHERE p.vec_id < 5 AND b.label = p.label
        |        AND b.vec_id <> p.vec_id),
        |h AS (SELECT r10.probe_id, r10.rk, (g.nn_id IS NOT NULL) AS rel
        |      FROM r10 LEFT JOIN g
        |        ON r10.probe_id = g.probe_id AND r10.nn_id = g.nn_id),
        |pq AS (SELECT probe_id, MIN(CASE WHEN rel THEN rk END) AS frst,
        |              SUM(CASE WHEN rel AND rk <= 10 THEN 1 ELSE 0 END) AS hits
        |       FROM h GROUP BY probe_id),
        |t AS (SELECT probe_id, COUNT(*) AS n_rel FROM g GROUP BY probe_id)
        |SELECT t.probe_id, ROUND(COALESCE(1.0 / frst, 0.0), 6) AS rr,
        |       ROUND(COALESCE(hits, 0) * 1.0 / n_rel, 6) AS recall_at_10
        |FROM t LEFT JOIN pq USING (probe_id) ORDER BY probe_id""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 5)
      val ranked = Similarity.knnJoinBrute(e, probes,
          "vec_id", "embedding", k = 10)
        .withColumn("rank", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("dist"), col("nn_id"))))
      val gold = e.select(col("vec_id").as("nn_id"), col("label"))
        .join(broadcast(probes.select(col("vec_id").as("probe_id"),
          col("label"))), Seq("label"))
        .filter(col("nn_id") =!= col("probe_id"))
        .select("probe_id", "nn_id")
      Retrieval.evalRanking(ranked, gold,
          "probe_id", "nn_id", "rank", k = 10)
        .orderBy("probe_id")
    },

    // B4g: search-result snippets — the ±3-word window around the
    // first 'window' occurrence per matching doc (the store-side
    // highlight feature next to the B4 search family). Full
    // hash-match oracle: DuckDB replays the 1-based first-match
    // position and the clamped slice bounds.
    "b4g_snippets" -> QueryDef(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT doc_id, ws,
        |             list_position(list_transform(ws, x -> lower(x)),
        |                           'window') AS pos
        |      FROM t)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |       array_to_string(
        |         ws[GREATEST(1, pos - 3):LEAST(len(ws), pos + 3)], ' ')
        |         AS snippet
        |FROM p WHERE pos IS NOT NULL AND pos > 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Retrieval.snippets(Tables(s, dir, "documents"),
          "doc_id", "text", term = "window", context = 3)
        .orderBy("doc_id")
    },

    // B9: multi-vector late interaction (ColBERT MaxSim) — each label
    // group of the embeddings table is a "document bag", the first 3
    // vectors are the query bag; score = Σ over query vectors of the
    // best within-bag cosine. Full hash-match oracle: DuckDB replays
    // the per-pair 6dp rounding, the two-level max/sum, and the
    // (score, doc) tiebreak.
    "b9_late_interaction" -> QueryDef(
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv
        |           FROM embeddings WHERE vec_id < 3),
        |s AS (SELECT b.label AS doc, q.qid,
        |             ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
        |                                          q.qv::DOUBLE[]), 6) AS sim
        |      FROM embeddings b, q),
        |m AS (SELECT doc, qid, MAX(sim) AS best FROM s GROUP BY doc, qid)
        |SELECT doc, ROUND(SUM(best), 6) AS li_score
        |FROM m GROUP BY doc
        |ORDER BY li_score DESC, doc LIMIT 5""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      Retrieval.lateInteraction(
        e.select(col("label"), col("embedding")),
        e.filter(col("vec_id") < 3).select(col("vec_id"), col("embedding")),
        "label", "embedding", "vec_id", k = 5)
    },

    "b6_hybrid_rrf" -> QueryDef(
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
        |qtok AS (SELECT doc_id, w FROM tok WHERE w IN ('window', 'filter')),
        |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf FROM qtok GROUP BY 1, 2),
        |idf AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM qtok GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |              AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
        |       FROM documents),
        |bm AS (SELECT t.doc_id,
        |              ROUND(SUM(LN(1 + (st.n - i.df + 0.5) / (i.df + 0.5)) * t.tf * 2.2
        |                        / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / st.avgdl))), 6) AS score
        |       FROM tf t JOIN idf i ON t.w = i.w
        |       JOIN dl d ON d.doc_id = t.doc_id CROSS JOIN st
        |       GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT 20),
        |bmr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
        |vp AS (SELECT e.vec_id AS doc_id,
        |              CAST(UNNEST(e.embedding) AS DOUBLE) AS x,
        |              CAST(UNNEST(q.embedding) AS DOUBLE) AS y
        |       FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
        |vd AS (SELECT doc_id,
        |              ROUND(1.0 - SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) + 0.0 AS dist
        |       FROM vp GROUP BY doc_id ORDER BY dist, doc_id LIMIT 20),
        |vr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY dist, doc_id) AS r FROM vd),
        |f AS (SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
        |             ROUND(COALESCE(1.0 / (60 + b.r), 0) + COALESCE(1.0 / (60 + v.r), 0), 6) AS rrf_score
        |      FROM bmr b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id)
        |SELECT doc_id, rrf_score FROM f
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val bmTop = Retrieval.bm25(docs, "doc_id", "text",
          Seq("window", "filter"))
        .orderBy(desc("score"), asc("doc_id")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("score"), asc("doc_id"))))
      val vecTop = vectorTopK(s, dir, 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(asc("dist"), asc("doc_id"))))
      Retrieval.rrfFuse(
          Seq(bmTop.select("doc_id", "rank"), vecTop.select("doc_id", "rank")),
          "doc_id")
        .orderBy(desc("rrf_score"), asc("doc_id"))
        .limit(10)
    },

    // B7: maximal-marginal-relevance rerank of the vector top-20.
    // MMR's greedy selection is inherently sequential, so the oracle
    // pins the SQL-checkable contract: the first pick is the exact
    // top-1 (at step 1 the diversity term is zero, so MMR = argmax
    // relevance — here the probe's own vector); exactly k distinct
    // candidates come back, all from the top-20; and the selected set
    // is no MORE redundant than plain top-k (max pairwise cosine
    // similarity ≤, the property MMR exists to enforce). A
    // brute-force cross-check of every greedy step runs in
    // RetrievalSpec.
    "b7_mmr_rerank" -> QueryDef(
      """WITH vp AS (SELECT e.vec_id AS doc_id,
        |              CAST(UNNEST(e.embedding) AS DOUBLE) AS x,
        |              CAST(UNNEST(q.embedding) AS DOUBLE) AS y
        |       FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
        |vd AS (SELECT doc_id,
        |              ROUND(1.0 - SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) + 0.0 AS dist
        |       FROM vp GROUP BY doc_id ORDER BY dist, doc_id LIMIT 20)
        |SELECT (SELECT doc_id FROM vd ORDER BY dist, doc_id LIMIT 1) AS first_id,
        |       CAST(5 AS BIGINT) AS n_sel,
        |       TRUE AS subset_ok, TRUE AS distinct_ok, TRUE AS diversity_ok""".stripMargin) {
      (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val cand = vectorTopK(s, dir, 20)
        .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
          Seq("doc_id"))
      val sel = Retrieval.mmrRerank(cand, "doc_id", "embedding",
        probe, k = 5, lambda = 0.5)
      // contract evaluation on the driver over ≤ 20 candidates
      val candRows = cand.select(col("doc_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val picked = sel.orderBy("mmr_rank").collect().map(_.getLong(0))
      def maxPairSim(ids: Seq[Long]): Double = {
        val ps = for {
          i <- ids.indices; j <- (i + 1) until ids.length
        } yield 1.0 - graft.functions.VectorOps.cosineDistance(
          candRows(ids(i)), candRows(ids(j)))
        if (ps.isEmpty) 0.0 else ps.max
      }
      val topKPlain = cand.orderBy(col("dist"), col("doc_id")).limit(5)
        .collect().map(_.getLong(0)).toSeq
      import s.implicits._
      Seq((picked.head, picked.length.toLong,
          picked.forall(candRows.contains),
          picked.distinct.length == picked.length,
          maxPairSim(picked.toSeq) <= maxPairSim(topKPlain) + 1e-9))
        .toDF("first_id", "n_sel", "subset_ok", "distinct_ok",
          "diversity_ok")
    },

    // B8: end-to-end RAG context assembly — vector top-20 → MMR
    // rerank (k=8) → greedy token-budget fill (budget 300 ≈ half the
    // candidates' total, so the fill is genuinely partial). The greedy
    // fill is sequential, so the oracle pins the SQL-checkable
    // contract: the first context entry is the exact vector top-1 (MMR
    // pick #1, 32-139-token docs always fit a 300 budget), the budget
    // is respected, the fill is MAXIMAL (no skipped candidate fits the
    // leftover), selection follows MMR rank order, and the token
    // arithmetic matches an independent length/4 recount.
    "b8_rag_context" -> QueryDef(
      """WITH vp AS (SELECT e.vec_id AS doc_id,
        |              CAST(UNNEST(e.embedding) AS DOUBLE) AS x,
        |              CAST(UNNEST(q.embedding) AS DOUBLE) AS y
        |       FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
        |vd AS (SELECT doc_id,
        |              ROUND(1.0 - SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) + 0.0 AS dist
        |       FROM vp GROUP BY doc_id ORDER BY dist, doc_id LIMIT 20)
        |SELECT (SELECT doc_id FROM vd ORDER BY dist, doc_id LIMIT 1) AS first_id,
        |       TRUE AS budget_ok, TRUE AS maximal_ok,
        |       TRUE AS order_ok, TRUE AS tokens_ok""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val docs = Tables(s, dir, "documents")
      val probe = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val cand = vectorTopK(s, dir, 20)
        .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
          Seq("doc_id"))
      val mmr = Retrieval.mmrRerank(cand, "doc_id", "embedding",
        probe, k = 8, lambda = 0.5)
      val budget = 300L
      val ctx = Retrieval.assembleContext(mmr, docs,
          "doc_id", "mmr_rank", "text", budget)
        .orderBy("ctx_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      // independent token recount (length/4) for all 8 candidates
      val toks = docs
        .join(broadcast(mmr.select("doc_id")), Seq("doc_id"))
        .select(col("doc_id"),
          floor(length(col("text")) / 4).cast("long").as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val selected = ctx.map(_._1).toSet
      val total = if (ctx.isEmpty) 0L else ctx.last._5
      val budgetOk = total <= budget && ctx.forall(_._5 <= budget)
      val maximalOk = toks.keys.filterNot(selected)
        .forall(id => toks(id) > budget - total)
      val orderOk = ctx.map(_._2).toSeq == (1 to ctx.length) &&
        (ctx.length < 2 || ctx.map(_._3).sliding(2).forall(p => p(0) < p(1)))
      val tokensOk = ctx.forall(c => c._4 == toks(c._1)) &&
        ctx.map(_._4).sum == total
      import s.implicits._
      Seq((ctx.head._1, budgetOk, maximalOk, orderOk, tokensOk))
        .toDF("first_id", "budget_ok", "maximal_ok", "order_ok", "tokens_ok")
    }
  )
}
