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
    */
  def topK(
      table: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      vecCol: String = "embedding",
      metric: String = "cosine",
      filter: Option[Column] = None): DataFrame = {
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
