package graft.ops

import org.apache.spark.sql.DataFrame
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
    *
    * Duplicate-flag shape: the exchange under the duplicate check
    * carries ONLY (hash, id) — the corpus text never crosses the wire.
    * A window keyed on sha2(text) over the full rows would compute the
    * same boolean but ship every column (i.e. the whole corpus)
    * through its exchange; instead the narrow (hash, id) projection
    * aggregates to a per-content min-id table (map-side partial min),
    * the non-keeper ids fall out of one narrow join that reuses the
    * aggregation's partitioning, and the resulting duplicate-id list
    * — 8 bytes per DUPLICATE, not per row — broadcast-joins back onto
    * the untouched full rows. (If a corpus ever carries more
    * duplicates than fit a broadcast, drop the hint and the join-back
    * degrades to a shuffle on the id; the text column still moves at
    * most once, same as the window formulation's floor.)
    */
  def annotate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config(),
      blocklist: Option[DataFrame] = None,
      ngram: Int = 8,
      srcCol: Option[String] = None,
      blockedSources: Option[DataFrame] = None): DataFrame = {
    require(!docs.columns.exists(Seq("__dup", "__cont", "__blk").contains),
      "__dup/__cont/__blk are reserved by Curation.annotate")
    val narrow = docs.select(
      sha2(col(textCol), 256).as("__h"), col(idCol).as("__id"))
    val minIds = narrow.groupBy("__h").agg(min(col("__id")).as("__min"))
    val dupIds = narrow.join(minIds, Seq("__h"))
      .filter(col("__id") =!= col("__min"))
      .select(col("__id").as(idCol), lit(true).as("__dup"))
    // benchmark decontamination (D11) composes as one more broadcast
    // flag table — hit-bounded, same join-back shape as the dup ids
    val withCont = blocklist match {
      case Some(bl) =>
        val hits = Decontaminate
          .hitCounts(docs, bl, idCol, textCol, ngram)
          .select(col(idCol), lit(true).as("__cont"))
        docs.join(broadcast(hits), Seq(idCol), "left")
      case None => docs.withColumn("__cont", lit(false))
    }
    // P7: provenance (source/domain) blocklist — the URL-filter step
    // every web-corpus pipeline runs FIRST (cheapest signal, so it
    // leads the drop-reason order). Blocked sources are a dimension
    // table at any corpus scale → broadcast left join, one flag.
    val withBlk = (srcCol, blockedSources) match {
      case (Some(sc), Some(bs)) =>
        require(bs.columns.length == 1,
          s"blockedSources must have exactly one column, got ${bs.columns.mkString(",")}")
        withCont.join(
          broadcast(bs.select(col(bs.columns.head).cast("string").as(sc))
            .distinct().withColumn("__blk", lit(true))),
          Seq(sc), "left")
      case (None, None) => withCont.withColumn("__blk", lit(false))
      case _ => throw new IllegalArgumentException(
        "srcCol and blockedSources must be provided together")
    }
    withBlk
      .join(broadcast(dupIds), Seq(idCol), "left")
      .withColumn("quality",
        TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang", TextAnalysis.langId(col(textCol)))
      .withColumn("is_blocked", coalesce(col("__blk"), lit(false)))
      .drop("__blk")
      .withColumn("is_duplicate", coalesce(col("__dup"), lit(false)))
      .drop("__dup")
      .withColumn("is_contaminated", coalesce(col("__cont"), lit(false)))
      .drop("__cont")
      .withColumn("in_sample",
        Sampling.inHashSample(col(idCol), cfg.sampleFraction, cfg.sampleSalt))
      .withColumn("drop_reason",
        when(col("is_blocked"), "blocked")
          .when(col("quality") < cfg.minQuality, "quality")
          .when(col("lang") =!= cfg.lang, "lang")
          .when(col("is_duplicate"), "duplicate")
          .when(col("is_contaminated"), "contaminated")
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
      .drop("quality", "lang", "is_blocked", "is_duplicate",
        "is_contaminated", "in_sample", "drop_reason", "keep")

  /** P8: the end-to-end training-export composition — curate (P3),
    * token-count, and budgeted shard packing (D12) in ONE declarative
    * plan. Returns the packed keeper rows `(idCol, tc, grp, shard)`;
    * pair with [[Packing.manifest]] for the export datasheet (D12b).
    *
    * Scale: exactly the parts' shapes — P3's per-row expressions +
    * narrow (hash, id) duplicate aggregate, then D12's single keyed
    * window; nothing materializes between stages, so Catalyst fuses
    * the per-row work into the packing scan.
    */
  def exportShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config(),
      budget: Long = 1L << 20,
      numGroups: Int = 256,
      salt: String = ""): DataFrame = {
    val kept = curate(docs, idCol, textCol, cfg)
    val narrow = kept.select(col(idCol),
      graft.functions.GraftFunctions.token_count(col(textCol))
        .cast("long").as("tc"))
    Packing.packShards(narrow, idCol, "tc", budget, numGroups, salt)
  }

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

  /** D20: corpus snapshot diff — the dataset-governance pass between
    * two corpus versions: per id, `added` (new in v2), `removed`
    * (gone from v2), `changed` (same id, different content), or
    * `unchanged`. One full-outer join on the id over narrow
    * (id, content-hash) projections — the texts never cross the
    * exchange, only 8 B ids and 32 B digests.
    */
  def snapshotDiff(
      v1: DataFrame,
      v2: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val a = v1.select(col(idCol), sha2(col(textCol), 256).as("__h1"))
    val b = v2.select(col(idCol), sha2(col(textCol), 256).as("__h2"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h1").isNull, "added")
          .when(col("__h2").isNull, "removed")
          .when(col("__h1") =!= col("__h2"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** P6: corpus audit report (the "datasheet" pass every training-data
    * pipeline runs before export): per source — document count, total
    * token budget, language spread, exact-duplicate count (corpus-wide
    * content groups, min-id keeper), exact interpolated median length,
    * and mean quality.
    *
    * Determinism: per-source quality is summed as round(q·1e6)
    * integers (q itself is already rounded to 6dp), so group sums are
    * exact in any addition order; the mean divides once at the end.
    *
    * Scale: ONE grouped aggregate over per-row expressions (sources
    * are dimension-scale) plus the same narrow (hash, id) duplicate
    * shape as [[annotate]] — the text column never shuffles; the only
    * full-width operation is the scan itself. The exact median is the
    * one at-scale caveat (percentile holds per-group values); swap in
    * approx_percentile when sources are corpus-scale — c13b is the
    * pinned sketch substitute.
    */
  def auditReport(
      docs: DataFrame,
      srcCol: String,
      idCol: String,
      textCol: String,
      langCol: String,
      charsCol: String): DataFrame = {
    val narrow = docs.select(
      sha2(col(textCol), 256).as("__h"), col(idCol).as("__id"))
    val minIds = narrow.groupBy("__h").agg(min(col("__id")).as("__min"))
    val dupIds = narrow.join(minIds, Seq("__h"))
      .filter(col("__id") =!= col("__min"))
      .select(col("__id").as(idCol), lit(true).as("__dup"))
    docs.join(broadcast(dupIds), Seq(idCol), "left")
      .groupBy(col(srcCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(graft.functions.GraftFunctions.token_count(col(textCol))
          .cast("long")).as("total_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dups"),
        expr(s"percentile($charsCol, 0.5)").as("median_chars"),
        sum(round(TextAnalysis.qualityScore(col(textCol)) * 1e6)
          .cast("long")).as("__q6"))
      .withColumn("avg_quality",
        round(col("__q6") / lit(1e6) / col("n_docs"), 6))
      .drop("__q6")
  }
}
