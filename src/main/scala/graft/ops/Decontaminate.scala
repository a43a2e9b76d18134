package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine_distance, word_shingles}

/** Benchmark decontamination: flag corpus documents that share any
  * lowercase word n-gram with a blocklist (an eval/test set whose
  * content must not leak into training data). This is the standard
  * n-gram-overlap rule (GPT-3 appendix C / PaLM-style 8-gram
  * decontamination), expressed as a Spark plan.
  *
  * Scale shape (100 TB corpus, MB-scale blocklist — eval sets are
  * small by definition):
  *  - the corpus side computes its distinct n-grams per row with the
  *    codegen `word_shingles` kernel and explodes them IN-TASK — the
  *    corpus never shuffles;
  *  - the blocklist's distinct gram set is broadcast, so the probe is
  *    a broadcast semi-ish join (hash lookup inside the scan stage);
  *  - only matching (id, gram) pairs survive to the one real exchange
  *    — a groupBy on the contaminated ids, bounded by the number of
  *    HITS, not the corpus;
  *  - the per-id hit counts broadcast back onto the untouched corpus
  *    rows (decontamination removes a tiny fraction by design; if a
  *    corpus were mostly contaminated, drop that hint and the
  *    join-back degrades to an id-keyed shuffle join).
  *
  * Grams are joined as STRINGS here, so the match is exact (no hash
  * collisions → the DuckDB oracle reproduces it bit-for-bit). At
  * 100 TB, hash both sides down to 64-bit first (`xxhash64(gram)`)
  * to cut the probe bytes ~8×; a collision only ever flags an extra
  * document — conservative in the direction decontamination wants.
  */
object Decontaminate {

  /** The (idCol, n_hits) table of contaminated documents only —
    * n_hits = distinct n-grams shared with the blocklist. This is the
    * reusable core: [[flag]] joins it back onto the corpus, and
    * [[Curation.annotate]] folds it into the composed pipeline's
    * drop reasons. Bounded by hits, so broadcastable by contract.
    */
  def hitCounts(
      corpus: DataFrame,
      blocklist: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val grams = corpus.select(
      col(idCol), explode(word_shingles(col(textCol), lit(n))).as("__g"))
    val bl = blocklist
      .select(explode(word_shingles(col(textCol), lit(n))).as("__g"))
      .distinct()
    // word_shingles is per-row distinct and bl is distinct, so a plain
    // count after the join IS the distinct shared-gram count.
    grams.join(broadcast(bl), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** D11b — the EMBEDDING-SPACE sibling of the n-gram rule: flag
    * corpus rows whose max cosine similarity against any eval-set
    * embedding reaches `minSimilarity`. Catches the paraphrased /
    * reworded leakage exact-gram matching misses (and misses nothing
    * the gram rule needs — run both; a real pipeline unions the
    * flags).
    *
    * Scale shape: the eval side BROADCASTS (eval sets are small by
    * definition — the same contract as [[hitCounts]]'s blocklist);
    * per-row work is `|eval| `codegen cosine kernels inside the scan
    * stage, and the one exchange carries (id, max/count partials) —
    * map-side combined, bounded by corpus rows, never embeddings.
    * For eval sets too big to broadcast, route through
    * [[Similarity.ivfPqAnnJoin]] instead (ANN candidate generation,
    * exact re-rank).
    *
    * Output: one row per corpus row — `max_sim` (rounded to 6 for
    * deterministic hashing), `n_hits` (eval items at or above the
    * threshold), `contaminated`. No argmax column: a similarity tie
    * would make the matched id engine-dependent where the count and
    * max are not. An EMPTY eval set keeps every corpus row (`max_sim`
    * null, `n_hits` 0, `contaminated` false) — the broadcast side
    * joins left, so corpus rows never vanish.
    */
  def semanticFlags(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      vecCol: String,
      minSimilarity: Double): DataFrame = {
    require(minSimilarity >= -1.0 && minSimilarity <= 1.0,
      s"minSimilarity must be a cosine similarity, got $minSimilarity")
    val ev = broadcast(evalSet.select(col(vecCol).as("__evec")))
    corpus.select(col(idCol), col(vecCol))
      .join(ev, lit(true), "left")
      .select(col(idCol),
        (lit(1.0) - cosine_distance(col(vecCol), col("__evec")))
          .as("__sim"))
      .groupBy(col(idCol))
      .agg(
        (round(max(col("__sim")), 6) + lit(0.0)).as("max_sim"),
        sum(when(col("__sim") >= minSimilarity, 1L).otherwise(0L))
          .as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0L)
  }

  /** Corpus rows annotated with `n_hits` (distinct shared n-grams
    * with the blocklist) and `contaminated` (n_hits > 0).
    */
  def flag(
      corpus: DataFrame,
      blocklist: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    require(!corpus.columns.contains("n_hits") &&
      !corpus.columns.contains("contaminated"),
      "n_hits/contaminated are reserved by Decontaminate.flag")
    val hits = hitCounts(corpus, blocklist, idCol, textCol, n)
    corpus.join(broadcast(hits), Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
