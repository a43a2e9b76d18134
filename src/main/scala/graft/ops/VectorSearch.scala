package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine_distance, cosine_distance_stored_norm, dot_product, l2_distance, vector_norm}

/** The read-path API the reference's stores provide (SURVEY §3.3,
  * B1-B3): top-k by vector distance with optional metadata filtering —
  * `SELECT TOP k ... FROM c WHERE ... ORDER BY VectorDistance(c.embedding, @q)`
  * re-expressed as a DataFrame operator.
  *
  * Physical shape (pinned in PlanSpec): the filter pushes to the scan,
  * the single query vector broadcasts, and the k-limit lowers to
  * TakeOrderedAndProject — per-partition partial top-k merged at the
  * driver, shuffle-free, which is exactly the plan you want when the
  * chunk table is 100 TB.
  */
object VectorSearch {

  private def distExpr(metric: String, v: Column, q: Column): Column =
    metric match {
      case "cosine" => cosine_distance(v, q)
      case "l2"     => l2_distance(v, q)
      case "dot"    => -dot_product(v, q) // larger dot = nearer
      case other    => throw new IllegalArgumentException(
        s"unknown metric '$other' (cosine | l2 | dot)")
    }

  /** Exact top-k rows by distance to `queryVec`. Result carries all
    * input columns plus `dist` (rounded to 6 for deterministic ties,
    * broken by the remaining sort stability of limit+order).
    *
    * When the table carries a [[withNorm]]-materialized norm column
    * (`"<vecCol>_norm"`, the withNorm naming convention) and the
    * metric is cosine, the scan LOWERS to the stored-norm kernel
    * automatically — the caller writes the norm once at ingest and
    * every `topK` after that does dot-product-only per-row work,
    * without opting in at each call site. Results are bit-identical
    * either way (gate b2b); pass a differently-named norm column to
    * [[topKStoredNorm]] explicitly.
    */
  def topK(
      table: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      vecCol: String = "embedding",
      metric: String = "cosine",
      filter: Option[Column] = None): DataFrame = {
    val normCol = s"${vecCol}_norm"
    if (metric == "cosine" && table.columns.contains(normCol))
      return topKStoredNorm(table, queryVec, k, vecCol, normCol, filter)
    val base = filter.fold(table)(table.where)
    base
      .withColumn("dist",
        // + 0.0 folds IEEE -0.0 to +0.0 (self-match distance) for stable hashing
        round(distExpr(metric, col(vecCol), typedlit(queryVec)), 6) + lit(0.0))
      .orderBy(col("dist"))
      .limit(k)
  }

  /** Materializes the stored-norm column next to the vector — the
    * write-side half of the stored-norm read path. Written once at
    * ingest (8 bytes/row), it removes the per-row `Σ x²` accumulation
    * from EVERY subsequent cosine scan: at 100 TB the norm column is
    * amortized across all queries that ever touch the table.
    */
  def withNorm(
      table: DataFrame,
      vecCol: String = "embedding",
      normCol: String = "embedding_norm"): DataFrame =
    table.withColumn(normCol, vector_norm(col(vecCol)))

  /** Exact cosine top-k over a table carrying a [[withNorm]]-written
    * norm column: per-row work is the dot product alone. The probe's
    * norm is `vector_norm(<literal>)` — foldable, so Catalyst's
    * constant folding evaluates it once at plan time with the same
    * accumulation order as the stored side. Bit-identical results to
    * [[topK]] (gate b2b hash-matches the b2 oracle).
    *
    * INVARIANT: `normCol` must equal `vector_norm(vecCol)` for every
    * row — the kernel TRUSTS it; a stale norm (vector updated without
    * rewriting the column) silently yields wrong distances and a
    * wrong top-k. Any path that rewrites the vector must recompute
    * the norm in the same write ([[withNorm]] on the outgoing frame —
    * never carry the old column through). [[validateNorms]] is the
    * spot-check for tables of unknown provenance.
    */
  def topKStoredNorm(
      table: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      vecCol: String = "embedding",
      normCol: String = "embedding_norm",
      filter: Option[Column] = None): DataFrame = {
    val base = filter.fold(table)(table.where)
    val q = typedlit(queryVec)
    base
      .withColumn("dist",
        round(cosine_distance_stored_norm(
          col(vecCol), q, col(normCol), vector_norm(q)), 6) + lit(0.0))
      .orderBy(col("dist"))
      .limit(k)
  }

  /** Audit the [[topKStoredNorm]] invariant: fails loudly if any of
    * `sample` scanned rows carries `normCol ≠ vector_norm(vecCol)`.
    * Bit-exact comparison — both sides accumulate in the same order,
    * so ANY divergence means the column is stale, not rounding. One
    * narrow aggregate over a limited scan; run it when adopting a
    * table whose write path you don't control.
    */
  def validateNorms(
      table: DataFrame,
      vecCol: String = "embedding",
      normCol: String = "embedding_norm",
      sample: Int = 100000): Unit = {
    val bad = table.limit(sample)
      .filter(col(normCol) =!= vector_norm(col(vecCol)))
      .count()
    require(bad == 0L,
      s"$bad of up to $sample sampled rows have $normCol != " +
        s"vector_norm($vecCol) — the stored norm is stale; rewrite it " +
        "with VectorSearch.withNorm before using topKStoredNorm")
  }

  /** B3: metadata filter + vector ordering (filter BEFORE distance so
    * pushdown/pruning applies).
    */
  def topKWhere(
      table: DataFrame,
      predicate: Column,
      queryVec: Seq[Float],
      k: Int,
      vecCol: String = "embedding",
      metric: String = "cosine"): DataFrame =
    topK(table, queryVec, k, vecCol, metric, Some(predicate))
}
