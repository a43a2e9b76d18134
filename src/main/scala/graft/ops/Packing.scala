package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export shard packing: assign every document to a shard so
  * that (a) shard token sums respect a budget, (b) the assignment is a
  * pure function of the data — stable across runs, engines, cluster
  * layouts, and input order — and (c) document order within a shard is
  * content-hash-shuffled (the deterministic replacement for a global
  * random shuffle before training).
  *
  * Scheme: md5(id ‖ salt) orders documents pseudo-randomly; the first
  * two hex chars pick one of `numGroups` independent pack groups; a
  * per-group running token total (exclusive prefix sum) divided by the
  * budget yields the shard number. Greedy sequential fill, so a
  * shard's token total is < budget + its largest document.
  *
  * Scale: ONE exchange, keyed on the group — a keyed window over
  * (group, hash) with bounded per-group state, never a global sort.
  * Parallelism is capped by `numGroups`: size it to ≥ the cluster's
  * core count at the target scale (the default 256 suits the local
  * harness; a 1000-executor export would run 10k-100k groups — group
  * count only changes WHICH shard a document lands in, not any
  * contract). Different `salt`s give independent shuffles (epochs).
  */
object Packing {

  /** Input rows plus `grp` (pack group), `shard` (shard number within
    * the group), and `h` dropped — (grp, shard) is the global shard
    * key. `tokensCol` must be a non-negative numeric column.
    */
  def packShards(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numGroups: Int = 256,
      salt: String = ""): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(numGroups >= 1 && numGroups <= 256,
      s"numGroups must be in [1, 256], got $numGroups (two hex chars)")
    require(!df.columns.exists(Seq("grp", "shard", "__h").contains),
      "grp/shard/__h are reserved by Packing.packShards")
    val h = md5(concat(col(idCol).cast("string"), lit(salt)))
    val grp = (conv(substring(col("__h"), 1, 2), 16, 10).cast("int")
      % numGroups).as("grp")
    val w = Window.partitionBy("grp").orderBy("__h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__h", h)
      .withColumn("grp", grp)
      .withColumn("shard",
        floor(coalesce(sum(col(tokensCol)).over(w), lit(0L)) / budget)
          .cast("long"))
      .drop("__h")
  }

  /** D12b: the export manifest — one row per (grp, shard) with the
    * document count, token total, and an ORDER-IMMUNE membership
    * checksum: the sum of each member's 32-bit md5 prefix over
    * `id:tokens`, so any dropped/duplicated/relabeled document or
    * altered token count changes the shard's checksum, while executor
    * scheduling and row order cannot (integer addition commutes).
    * md5 is the engine-portable hash (same trick as the D7 sampler
    * and D15 buckets), so an external consumer can re-derive the
    * checksum from the manifest schema alone.
    *
    * Scale: one grouped aggregate over per-row expressions — partials
    * combine map-side, the exchange carries (grp, shard) groups ×
    * partitions rows of four longs; nothing corpus-wide.
    */
  def manifest(
      packed: DataFrame,
      idCol: String,
      tokensCol: String): DataFrame =
    packed.groupBy("grp", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("token_sum"),
        sum(conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
            col(tokensCol).cast("long").cast("string"))), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
}
