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
}
