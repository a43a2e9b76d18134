package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling equi-join (SURVEY §4's "salting for skew" knob as a
  * first-class operator): a shuffled join hashes every row of a key to
  * ONE reducer, so a hot key (the power-law reality of web corpora —
  * one domain, one template, one empty-string default) turns into a
  * single straggler task at 100 TB no matter how many executors exist.
  *
  * Salting splits each hot key across `salt` reducers: the fact side
  * scatters by a deterministic per-row hash, the (smaller) dim side
  * replicates each key `salt` times, and the join key becomes
  * (key, salt-bucket). The output is ROW-IDENTICAL to the plain join —
  * only the physical distribution changes; dim-side bytes grow ×salt,
  * which is the designed trade (replicate the small side, never the
  * corpus).
  *
  * AQE's skew-join rule covers sort-merge joins after the fact, but
  * only splits oversized PARTITIONS; explicit salting also covers
  * shuffled-hash joins, stabilizes the plan for repeated production
  * runs, and lets the caller size `salt` from [[hotKeys]] evidence.
  */
object SkewJoin {

  /** Hot-key evidence: the top-`k` keys by row count plus their share
    * of the table — the input to choosing a salt factor (a key with
    * share `s` needs ≈ s × shuffle-partitions salt buckets to even
    * out).
    *
    * ONE scan of `df` — this helper targets exactly the tables too
    * big to scan twice, so SkewJoinSpec pins the single-scan plan:
    * the grand total for the shares comes from an empty-frame window
    * over the per-key AGGREGATE (map-side combined, so the scan's
    * output is (key, count) pairs — never rows), not from a second
    * `count()` pass over the fact table. The global window stage
    * concentrates those pairs in one task — diagnostic cost scales
    * with DISTINCT KEYS, not corpus rows, the right trade for a
    * skew-evidence probe.
    */
  def hotKeys(df: DataFrame, key: String, k: Int = 10): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()), 6))
      .orderBy(desc("n"), col(key))
      .limit(k)

  /** Salted inner equi-join of `fact` (big, possibly skewed) with
    * `dim` (smaller) on `factKey = dimKey`. Output columns = fact ++
    * dim-without-dimKey, exactly as a plain inner join projected the
    * same way.
    *
    * The fact row's salt bucket derives from a hash of ALL its columns
    * (layout-independent, so the physical plan is stable across runs);
    * identical duplicate rows sharing a bucket is fine — correctness
    * never depends on the spread, only the straggler bound does.
    * `merge` hint on both sides: broadcast would make salting moot and
    * a plain shuffled join is exactly what the operator exists to
    * protect.
    */
  def salted(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      salt: Int): DataFrame = {
    require(salt >= 2 && salt <= 4096, s"salt=$salt (want 2..4096)")
    val reserved = Seq("__salt")
    require(!(fact.columns ++ dim.columns).exists(reserved.contains),
      "__salt is reserved by SkewJoin")
    val factS = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salt))
        .cast("int"))
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    factS.hint("merge")
      .join(dimS.hint("merge"),
        factS(factKey) === dimS(dimKey) && factS("__salt") === dimS("__salt"),
        "inner")
      .drop(dimS(dimKey)).drop(dimS("__salt")).drop(factS("__salt"))
  }
}
