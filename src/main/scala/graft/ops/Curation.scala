package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation (the composed training-data filter): one
  * declarative plan that annotates every document with the standard
  * keep/drop signals — quality score, language, exact-duplicate
  * status, deterministic sample membership — plus the FIRST failing
  * reason, so downstream auditing can answer "why was this document
  * dropped" without re-running the pipeline.
  *
  * Scale: quality/lang/sample are per-row expressions (no shuffle;
  * lang-ID runs the one-pass `profile_scores` kernel); duplicate
  * detection is one window over the content hash (a single exchange
  * on sha2 — same shape as D1's groupBy, but keeping every row so the
  * annotation is total). The filter composes into the scan when only
  * `curate` output is consumed.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.3,
      lang: String = "en",
      sampleFraction: Double = 1.0,
      sampleSalt: String = "")

  /** Every input row, annotated: quality, lang, is_duplicate (not the
    * minimum-id holder of its exact content group), in_sample, keep,
    * and drop_reason ∈ {quality, lang, duplicate, sample, ''} — the
    * first failing check in that fixed order ('' = kept).
    */
  def annotate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config()): DataFrame = {
    val byContent = Window.partitionBy(sha2(col(textCol), 256))
    docs
      .withColumn("quality",
        TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang", TextAnalysis.langId(col(textCol)))
      .withColumn("is_duplicate",
        min(col(idCol)).over(byContent) =!= col(idCol))
      .withColumn("in_sample",
        Sampling.inHashSample(col(idCol), cfg.sampleFraction, cfg.sampleSalt))
      .withColumn("drop_reason",
        when(col("quality") < cfg.minQuality, "quality")
          .when(col("lang") =!= cfg.lang, "lang")
          .when(col("is_duplicate"), "duplicate")
          .when(!col("in_sample"), "sample")
          .otherwise(""))
      .withColumn("keep", col("drop_reason") === "")
  }

  /** The curated corpus: rows passing every check. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config()): DataFrame =
    annotate(docs, idCol, textCol, cfg)
      .filter(col("keep"))
      .drop("quality", "lang", "is_duplicate", "in_sample",
        "drop_reason", "keep")

  /** NEAR-duplicate annotation: MinHash-LSH pairs cluster via
    * connected components and every non-root cluster member is flagged
    * with its cluster root (the canonical keeper — smallest id). Exact
    * duplicates are a special case (Jaccard 1), so this subsumes
    * [[annotate]]'s `is_duplicate` at the cost of the LSH band join.
    * Adds `near_dup_root` (null = keeper or unique) and
    * `is_near_duplicate`.
    */
  def annotateNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashLshPairs(
      docs.select(col(idCol), col(textCol)), idCol, textCol,
      threshold = jaccardThreshold)
    // generous round bound: rounds only run while unconverged, and an
    // organic near-dup CHAIN (not clique) can be longer than a dedup
    // clique's diameter
    val roots = Dedup.connectedComponents(pairs, maxIter = 20)
      .filter(col("id") =!= col("root")) // keepers carry no flag
      .select(col("id").as(idCol), col("root").as("near_dup_root"))
    docs.join(roots, Seq(idCol), "left")
      .withColumn("is_near_duplicate", col("near_dup_root").isNotNull)
  }
}
