package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: corpus snapshots
  * must be reproducible across runs, engines, and cluster layouts, so
  * membership derives from a content hash of the ROW KEY — never from
  * `rand()` (seed-stable only per partition layout) and never from
  * Spark-specific hashes (no cross-engine oracle).
  *
  * Membership test: the first 4 hex chars of `md5(key)` compared
  * against `floor(fraction * 65536)` in hex — a uniform 16-bit
  * threshold that any engine with md5 reproduces bit-for-bit. Rows are
  * filtered at the scan (no shuffle); stratification is free because
  * the hash is independent of any stratum column.
  */
object Sampling {

  /** Membership column: true iff `key` falls in the `fraction` sample.
    * Deterministic in the key alone; `salt` yields independent samples
    * (e.g. disjoint train/validation splits via different salts).
    */
  def inHashSample(key: Column, fraction: Double, salt: String = ""): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    val t = math.floor(fraction * 65536).toLong
    // t = 65536 renders as the 5-char "10000", which compares BELOW
    // every 4-char hex string lexicographically — special-case it
    if (t >= 65536) lit(true)
    else substring(md5(concat(key.cast("string"), lit(salt))), 1, 4) <
      lit(f"$t%04x")
  }

  /** The `fraction` sample of `df` by `keyCol` — uniform within every
    * stratum of any other column, reproducible anywhere.
    */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(inHashSample(col(keyCol), fraction, salt))

  /** D7e: leakage-safe train/validation split — assignment keyed by
    * the SOURCE (domain/crawl/site), not the document. Near-duplicate
    * documents cluster within a source (templated pages, snapshot
    * re-crawls), so a document-level split leaks train near-dups into
    * validation; keying the assignment on the source sends every
    * document of a source to the SAME side — the eval-hygiene rule
    * of the dedup-then-split pipelines. The same engine-portable
    * 16-bit md5 threshold as D7, so any engine reproduces the
    * assignment bit-for-bit; different salts give independent splits.
    * One per-row expression at the scan — no shuffle, no state, and
    * group atomicity holds by construction (the expression is a
    * function of the source alone).
    */
  def splitBySource(
      df: DataFrame,
      sourceCol: String,
      valFraction: Double,
      salt: String = ""): DataFrame = {
    require(!df.columns.contains("split"),
      "splitBySource reserves the column name 'split'")
    df.withColumn("split",
      when(inHashSample(col(sourceCol), valFraction, salt), "val")
        .otherwise("train"))
  }

  /** Data-mixture sampling (D7c): per-source sampling fractions in one
    * scan-level filter — the deterministic version of the weighted
    * source mixing every pretraining recipe specifies ("X% web, Y%
    * code, Z% books"). Each source's rows pass through its own
    * [[inHashSample]] threshold, so the output hits each source's
    * fraction in expectation with zero shuffles and full
    * reproducibility; sources absent from `fractions` are dropped
    * (explicit mixture = explicit allowlist). Salt as in
    * [[inHashSample]]: independent mixtures (epochs/ablations) from
    * the same corpus.
    */
  def mixtureSample(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      fractions: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "mixtureSample needs at least one source")
    fractions.foreach { case (s, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction for '$s' = $f")
    }
    // deterministic predicate order (sorted keys) so plans are stable
    val pred = fractions.toSeq.sortBy(_._1)
      .map { case (s, f) =>
        col(sourceCol) === lit(s) && inHashSample(col(keyCol), f, salt)
      }
      .reduce(_ || _)
    df.filter(pred)
  }

  /** Temperature-rebalanced mixture (D7d): derive each source's
    * sampling fraction FROM the corpus's own source distribution so
    * the output follows q(s) ∝ p(s)^τ — the standard multilingual /
    * multi-source rebalancing rule (τ < 1 flattens the distribution,
    * boosting rare sources; τ = 1 is a no-op). The acceptance rate per
    * source is p^(τ−1) normalized so the most-boosted source keeps
    * everything (no upsampling — pure subsampling), rounded to 6 dp so
    * any engine recomputes the identical thresholds.
    *
    * Scale shape: ONE narrow counting aggregate ((source, count) pairs
    * — source cardinality is recipe-scale driver state), then the same
    * scan-level md5-threshold filter as [[mixtureSample]]. The corpus
    * never shuffles.
    */
  def temperatureMixture(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      tau: Double,
      salt: String = ""): DataFrame = {
    require(tau > 0.0 && tau <= 4.0, s"tau=$tau (want 0 < tau <= 4)")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
    require(counts.nonEmpty, "temperatureMixture: empty corpus")
    val total = counts.map(_._2).sum.toDouble
    val raw = counts.map { case (s, n) =>
      (s, math.pow(n / total, tau - 1.0))
    }
    val mx = raw.map(_._2).max
    val fractions = raw.map { case (s, r) =>
      (s, math.round(r / mx * 1e6) / 1e6)
    }.toMap
    mixtureSample(df, keyCol, sourceCol, fractions, salt)
  }

  /** Deterministic fixed-size sample PER STRATUM — the reproducible
    * replacement for reservoir sampling: the `n` hash-smallest keys of
    * each stratum. Any engine recomputes the same members, any subset
    * of the data yields a consistent prefix, and the per-stratum rank
    * is a keyed window (one shuffle on the stratum, bounded state —
    * never a global sort).
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, s"n=$n")
    import org.apache.spark.sql.expressions.Window
    val rank = row_number().over(Window.partitionBy(stratumCol)
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))),
        col(keyCol)))
    df.withColumn("__r", rank).filter(col("__r") <= n).drop("__r")
  }

  /** Hashed n-gram bucket for importance features: the first 2 hex
    * chars of md5(gram) as an integer 0..255 folded into `buckets` —
    * engine-portable (any SQL engine with md5 recomputes it).
    */
  private[ops] def gramBucket(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 2), 16, 10).cast("long"), lit(buckets))

  /** D15: DSIR-style importance weighting (Xie et al., "Data Selection
    * for Language Models via Importance Resampling", NeurIPS 2023):
    * score every document by how much more likely its hashed-bigram
    * features are under a TARGET distribution (e.g. a trusted
    * high-quality subset) than under the RAW corpus —
    * mean_g [ log p_target(bucket(g)) − log p_raw(bucket(g)) ] with
    * add-one smoothing over `buckets` hashed features. Documents that
    * look like the target score > 0; importance resampling keeps the
    * top scores (or samples ∝ exp(score)).
    *
    * Output: (idCol, n_grams, w6_sum, score) — per-bucket log-weights
    * are quantized to integer MICRO-NATS (×1e6) so every per-document
    * sum is integer-exact regardless of partition/addition order; the
    * final score divides once at the end (round 6dp). Documents with
    * no bigram (< 2 words) carry n_grams=0 and null sums.
    *
    * Scale design: the two bucket-count aggregates shuffle 8-byte
    * (bucket, count) partials — `buckets` rows survive, collected as
    * KB-scale driver state (the "model" is a `buckets`-entry literal
    * array, the same envelope as the PQ codebook). The SCORING pass is
    * then per-row expressions only — transform + aggregate over the
    * gram array against the broadcast-literal weight table — so the
    * corpus itself NEVER shuffles: at 100 TB the cost is one counting
    * scan plus one scoring scan.
    */
  def importanceWeights(
      docs: DataFrame,
      isTarget: Column,
      idCol: String,
      textCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 65536, s"buckets=$buckets")
    val grams = docs.select(col(idCol), isTarget.as("__t"),
        explode(TextAnalysis.wordNgrams(col(textCol), 2)).as("__g"))
      .withColumn("__b", gramBucket(col("__g"), buckets))
    val counts = grams.groupBy("__b").agg(
      count(lit(1)).as("cr"),
      count(when(col("__t"), 1)).as("ct"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rTot = counts.map(_._2).sum.toDouble
    val tTot = counts.map(_._3).sum.toDouble
    val w6 = new Array[Long](buckets)
    counts.foreach { case (b, cr, ct) =>
      w6(b.toInt) = math.round(
        (math.log((ct + 1.0) / (tTot + buckets))
          - math.log((cr + 1.0) / (rTot + buckets))) * 1e6)
    }
    // empty buckets: cr = ct = 0 → weight of an unseen feature
    val w0 = math.round(
      (math.log(1.0 / (tTot + buckets)) - math.log(1.0 / (rTot + buckets)))
        * 1e6)
    val seen = counts.map(_._1.toInt).toSet
    (0 until buckets).filterNot(seen).foreach(w6(_) = w0)
    val wLit = typedlit(w6.toSeq)
    docs
      .withColumn("__ts", TextAnalysis.wordNgrams(col(textCol), 2))
      .withColumn("n_grams", size(col("__ts")).cast("long"))
      .withColumn("w6_sum",
        when(col("n_grams") > 0,
          aggregate(
            transform(col("__ts"),
              g => element_at(wLit, (gramBucket(g, buckets) + 1).cast("int"))),
            lit(0L), (acc, x) => acc + x)))
      .withColumn("score",
        when(col("n_grams") > 0,
          round(col("w6_sum") / lit(1e6) / col("n_grams"), 6)))
      .select(col(idCol), col("n_grams"), col("w6_sum"), col("score"))
  }

  /** D22: cluster-balanced (diversity) sampling — the fixed-n-per-cell
    * subset selection used to build diverse eval/seed sets: spread the
    * sample across k-means cells instead of letting dense regions
    * dominate a uniform draw. Members within a cell are chosen by the
    * D7b rule (n md5-smallest ids — reproducible across runs, engines,
    * and layouts). Output `(cell, idCol)`.
    *
    * Scale: one assignment scan (centroids are broadcast literals,
    * per-row argmin — D17's shape) + one keyed window on the cell with
    * bounded per-cell state; never a global sort.
    */
  def clusterSample(
      emb: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      nPerCell: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nPerCell >= 1, s"nPerCell must be >= 1, got $nPerCell")
    emb.select(col(idCol),
        KMeans.assign(col(vecCol), centroids).as("cell"),
        md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("cell").orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= nPerCell)
      .select(col("cell"), col(idCol))
  }
}
