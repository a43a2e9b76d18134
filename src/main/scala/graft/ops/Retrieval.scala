package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Hybrid retrieval (SURVEY B6/B7): the read-path composition the
  * reference's store is built toward — a full-text ranking (BM25,
  * `AzureCosmosDB/csharp/README.md:15`) and a vector ranking
  * (`CosmosDBClientWrapper.cs:119-128`) fused into one result list —
  * plus diversity-aware reranking of the fused candidates.
  *
  * Scale design: fusion and reranking operate on TOP-K LISTS, never on
  * the corpus. Each input ranking is bounded at k rows by its own
  * top-k operator (TakeOrderedAndProject / index-pruned scan), so the
  * fusion joins are dimension-scale regardless of corpus size, and the
  * MMR greedy runs on a driver-local candidate set the same way the PQ
  * codebook trainer does (bounded by contract, documented at the call
  * site). The expensive work — scoring 100 TB of text or vectors —
  * happens inside the upstream operators that already have scale paths
  * (B4d text index, D3e vector index).
  */
object Retrieval {

  /** Okapi BM25 scores for a bag of query terms (scan path; the
    * persistent-index form is [[TextIndex.query]]). Same scale shape
    * as SURVEY B4c: the query-term filter sits BELOW both aggregates
    * so tf/df shuffle only query-term rows, and the (tiny,
    * term-bounded) tf×idf set BROADCASTS into the doc-length scan —
    * the corpus-sized side never shuffles.
    *
    * Returns (idCol, score) with score rounded to 6dp for
    * deterministic cross-engine ordering.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val stats = docs.agg(
      count(lit(1)).cast("double"),
      avg(size(split(col(textCol), " ")).cast("double"))).head()
    val (n, avgdl) = (stats.getDouble(0), stats.getDouble(1))
    val qtok = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").isin(terms: _*))
    val tf = qtok.groupBy(idCol, "w")
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = qtok.groupBy("w")
      .agg(countDistinct(idCol).cast("double").as("df"))
    val dl = docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("double").as("dl"))
    val idfW = log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
    val lenNorm = lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))
    dl.join(broadcast(tf.join(broadcast(idf), "w")), idCol)
      .groupBy(idCol)
      .agg(round(sum(idfW * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lenNorm)), 6).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009):
    * fused(d) = Σ_r 1/(kRrf + rank_r(d)) over the rankings that
    * contain d. Each input must carry (idCol, rankCol) with ranks
    * 1-based; items absent from a ranking contribute 0.
    *
    * RRF needs only RANKS, not comparable scores — which is why it is
    * the standard BM25+vector fusion: the two score distributions
    * never need calibrating. Inputs are top-k lists (k rows each), so
    * the outer-join cascade is dimension-scale by construction.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String = "rank",
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val parts = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col(rankCol).cast("long").as(s"__r$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val contrib = parts.indices.map { i =>
      when(col(s"__r$i").isNotNull, lit(1.0) / (lit(kRrf) + col(s"__r$i")))
        .otherwise(lit(0.0))
    }
    joined
      .withColumn("rrf_score", round(contrib.reduce(_ + _), 6))
      .select(col(idCol), col("rrf_score"))
  }

  /** B10: retrieval evaluation — per-query reciprocal rank of the
    * first relevant hit and recall@k against a gold relevance table:
    * the metrics loop that tunes every knob in this engine's read
    * path (nprobe, numTables, rerank depth, fusion weights).
    *
    * The output is driven by the GOLD query set: a query the
    * retriever returned nothing for scores rr = 0 / recall = 0 (a
    * retrieval failure must drag the aggregate down, not vanish from
    * it), and a query present in the ranking but absent from gold is
    * excluded — it has no relevance denominator, and silently keeping
    * it would divide by null.
    *
    * Shape: one equi-join of the ranking (k rows per query by
    * construction) against the gold pairs, then two grouped
    * aggregates — all bounded by ranking size × gold size per query,
    * never corpus size; gold totals aggregate map-side.
    */
  def evalRanking(
      ranked: DataFrame,
      gold: DataFrame,
      qCol: String,
      dCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    val hits = ranked
      .select(col(qCol), col(dCol), col(rankCol).cast("long").as("__rk"))
      .join(gold.select(col(qCol), col(dCol), lit(true).as("__rel")),
        Seq(qCol, dCol), "left")
    val perQ = hits.groupBy(qCol).agg(
      min(when(col("__rel"), col("__rk"))).as("__first"),
      sum(when(col("__rel") && col("__rk") <= k, 1L).otherwise(0L))
        .as("__hits"))
    val totals = gold.groupBy(qCol)
      .agg(count(lit(1)).as("__n_rel"))
    totals.join(perQ, Seq(qCol), "left")
      .select(col(qCol),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6).as("rr"),
        round(coalesce(col("__hits"), lit(0L)) / col("__n_rel"), 6)
          .as(s"recall_at_$k"))
  }

  /** B4g: search-result snippet extraction — the ±`context`-word
    * window around the FIRST occurrence of `term` (case-folded), per
    * matching document: the store-side "highlight" companion of the
    * B4 full-text family. Per-row built-in expressions only (split /
    * array_position / slice), whole-stage codegen, no shuffle beyond
    * the caller's own — at 100 TB snippets render on whatever top-k
    * list the search already produced, never on the corpus.
    * Output `(idCol, pos 1-based, snippet)`.
    */
  def snippets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      term: String,
      context: Int = 3): DataFrame = {
    val toks = split(col(textCol), " ")
    val pos = array_position(transform(toks, t => lower(t)),
      term.toLowerCase)
    val start = greatest(lit(1), col("pos") - context)
    val end = least(size(col("__t")), (col("pos") + context).cast("int"))
    docs.select(col(idCol), pos.as("pos"), toks.as("__t"))
      .filter(col("pos") > 0)
      .select(col(idCol), col("pos").cast("long").as("pos"),
        array_join(slice(col("__t"), start.cast("int"),
          (end - start + 1).cast("int")), " ").as("snippet"))
  }

  /** B9: multi-vector "late interaction" scoring (ColBERT — Khattab &
    * Zaharia, SIGIR 2020): the query is a BAG of vectors and each
    * document a BAG of vectors; score(d, q) = Σ_{qv} max_{dv∈d}
    * cos(qv, dv) — every query vector independently matches its best
    * document vector, so fine-grained matches survive where
    * single-vector pooling would average them away.
    *
    * Shape: the query bag broadcasts (bounded by contract, like D3's
    * probes); the MaxSim stage is two map-side-combined aggregates
    * over one doc-vector scan — keyed on (doc, query-vector) then doc
    * — and the final top-k lowers to TakeOrderedAndProject. Per-pair
    * similarities round to 6dp BEFORE max/sum so results are
    * engine-reproducible.
    */
  def lateInteraction(
      docVecs: DataFrame,
      queryVecs: DataFrame,
      docCol: String,
      vecCol: String,
      qidCol: String,
      k: Int): DataFrame = {
    import graft.functions.GraftFunctions.cosine_distance
    val d = docVecs.select(col(docCol).as("doc"), col(vecCol).as("dv"))
    val q = queryVecs.select(col(qidCol).as("__qid"), col(vecCol).as("qv"))
    d.crossJoin(broadcast(q))
      .select(col("doc"), col("__qid"),
        round(lit(1.0) - cosine_distance(col("dv"), col("qv")), 6).as("sim"))
      .groupBy("doc", "__qid").agg(max("sim").as("best"))
      .groupBy("doc").agg(round(sum("best"), 6).as("li_score"))
      .orderBy(desc("li_score"), asc("doc"))
      .limit(k)
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) of a bounded candidate set: greedily pick
    * argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s), trading relevance
    * against redundancy with the already-selected set S.
    *
    * The candidate set is collected to the driver BY CONTRACT — MMR is
    * a rerank of an upstream top-N (N ≲ 10³), inherently sequential
    * (each pick depends on all previous picks), and the collected
    * state is N×dim floats — the same driver-scale envelope as the PQ
    * codebook. The corpus-scale work lives in the operator that
    * produced the candidates.
    *
    * Ties break by id; similarities are cosine. Returns
    * (idCol, mmr_rank 1-based, relevance = cosine sim to the query,
    * both rounded to 6dp).
    */
  def mmrRerank(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Seq[Float],
      k: Int,
      lambda: Double = 0.5): DataFrame = {
    val spark = candidates.sparkSession
    val rows = candidates.select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(rows.length <= 100000,
      s"MMR candidate set ${rows.length} exceeds the driver-scale contract")
    val q = queryVec.toArray
    val rel = rows.map { case (_, v) => 1.0 - VectorOps.cosineDistance(v, q) }
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val chosen = Array.fill(rows.length)(false)
    // maxSim(i) = max similarity of candidate i to the selected set,
    // updated incrementally — O(k·N) pair evaluations total
    val maxSim = Array.fill(rows.length)(Double.NegativeInfinity)
    while (selected.length < math.min(k, rows.length)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < rows.length) {
        if (!chosen(i)) {
          val div = if (selected.isEmpty) 0.0 else maxSim(i)
          val s = lambda * rel(i) - (1.0 - lambda) * div
          // strict > with ascending id scan = deterministic min-id tiebreak
          if (s > bestScore + 1e-12 || best < 0) { bestScore = s; best = i }
        }
        i += 1
      }
      chosen(best) = true
      selected += best
      var j = 0
      while (j < rows.length) {
        if (!chosen(j)) {
          val s = 1.0 - VectorOps.cosineDistance(rows(j)._2, rows(best)._2)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case (i, r) =>
        (rows(i)._1, r + 1,
          BigDecimal(rel(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
      .toDF(idCol, "mmr_rank", "relevance")
  }

  /** Context-window assembly (B8) — the last step of the RAG read
    * path: fill a token budget with the top-ranked candidates IN RANK
    * ORDER, skipping any candidate that no longer fits (greedy fill —
    * maximal: when it finishes, no skipped candidate fits in the
    * remaining budget). Token counts use the same `token_count`
    * estimator the chunker budgets with (A8), so retrieval-side
    * budgeting agrees with ingest-side budgeting.
    *
    * Scale shape: `ranked` is an upstream top-N (bounded by the
    * retrieval operators that produced it). The candidates' texts are
    * fetched by broadcasting the N-row rank list into ONE scan of
    * `docs` — the corpus never shuffles — and the sequential fill runs
    * driver-local over N (id, rank, tokens) triples, the same
    * driver-scale contract as [[mmrRerank]].
    *
    * Returns (idCol, ctx_rank 1-based selection order, rankCol
    * passthrough, tokens, cum_tokens).
    */
  def assembleContext(
      ranked: DataFrame,
      docs: DataFrame,
      idCol: String,
      rankCol: String,
      textCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget=$tokenBudget")
    val spark = ranked.sparkSession
    val cand = docs
      .join(broadcast(ranked.select(col(idCol).cast("long").as("__id"),
        col(rankCol).cast("long").as("__rank"))),
        col(idCol).cast("long") === col("__id"))
      .select(col("__id"), col("__rank"),
        graft.functions.GraftFunctions.token_count(col(textCol))
          .cast("long").as("__tok"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(c => (c._2, c._1))
    require(cand.length <= 100000,
      s"context candidate set ${cand.length} exceeds the driver-scale contract")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long, Long, Long)]
    var cum = 0L
    cand.foreach { case (id, rank, tok) =>
      if (cum + tok <= tokenBudget) {
        cum += tok
        out += ((id, out.length + 1, rank, tok, cum))
      }
    }
    import spark.implicits._
    out.toSeq.toDF(idCol, "ctx_rank", rankCol, "tokens", "cum_tokens")
  }
}
