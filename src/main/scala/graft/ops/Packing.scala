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

  /** D24: token-budget SEQUENCE packing — the pretraining
    * concat-and-chop step (distinct from [[packShards]]'s byte/token
    * shard budgeting): documents concatenate in a deterministic
    * pseudo-random order onto one global token tape, and the tape is
    * cut into fixed-`seqLen` training sequences. A document that
    * straddles a cut contributes one SPAN row per sequence it touches
    * — exactly the (sequence, doc, offsets) records a training-data
    * writer needs to emit packed examples with document-boundary
    * attention masks (the GPT/T5 packing recipe).
    *
    * Output: one row per (seq_id, doc) overlap — `seq_id`, the id
    * column, `tc` (the document's token count), `seq_offset` (span
    * start within the sequence), `doc_offset` (span start within the
    * document), `span_tokens` (span length). Per sequence the spans
    * tile [0, seqLen) exactly (the final sequence may be short); per
    * document they tile [0, tc) — both property-pinned.
    *
    * Scale — the naive form is a GLOBAL window (one Exchange
    * SinglePartition: a non-starter at 100 TB). This is instead the
    * classic two-level distributed prefix sum: md5's leading hex
    * chars bucket the tape WITHOUT breaking its order (a string's
    * prefix sorts before the rest of it), each bucket cumsums locally
    * under one keyed window, bucket subtotals (≤ `16^leadHexChars`
    * longs — KB-scale) come to the driver once for the exclusive
    * scan, and the offsets broadcast back. Exchanges: one hash
    * partition on the bucket + one tiny aggregate; the explode is
    * per-row. Parallelism = bucket count (`leadHexChars`=2 → 256 for
    * the local harness; 3-4 at cluster scale — the bucketing never
    * changes any output value, only the parallelism).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      seqLen: Long,
      leadHexChars: Int = 2,
      salt: String = ""): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(leadHexChars >= 1 && leadHexChars <= 4,
      s"leadHexChars must be in [1, 4], got $leadHexChars")
    require(!df.columns.exists(c =>
      Seq("seq_id", "seq_offset", "doc_offset", "span_tokens",
        "__h", "__bkt", "__pre", "__off", "__gstart").contains(c) ||
        (c == "tc" && tokensCol != "tc")),
      "output/scratch columns are reserved by Packing.packSequences")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
      col(idCol), col(tokensCol).cast("long").as("tc"))
      .filter(col("tc") > 0L)
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit(salt))))
      .withColumn("__bkt",
        conv(substring(col("__h"), 1, leadHexChars), 16, 10).cast("long"))
    val w = Window.partitionBy("__bkt").orderBy("__h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = keyed
      .withColumn("__pre", coalesce(sum("tc").over(w), lit(0L)))
      .persist()
    try {
      // bucket subtotals → driver exclusive scan (≤ 16^leadHexChars
      // rows of one long each) → broadcast offsets
      val subtotals = cum.groupBy("__bkt").agg(sum("tc").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toIndexedSeq
      // Exclusive scan via zip-with-init: empty subtotals (no rows
      // with tc > 0) yields an empty offset table and an empty span
      // frame with the output schema, not a MatchError.
      val running = subtotals.scanLeft(0L) { case (acc, (_, t)) => acc + t }
      val offsets = subtotals.map(_._1).zip(running.init)
      val offDf = offsets.toDF("__bkt", "__off")
      cum.join(broadcast(offDf), Seq("__bkt"))
        .withColumn("__gstart", col("__off") + col("__pre"))
        .withColumn("seq_id", explode(sequence(
          floor(col("__gstart") / seqLen),
          floor((col("__gstart") + col("tc") - 1L) / seqLen))))
        .withColumn("seq_offset",
          greatest(col("seq_id") * seqLen, col("__gstart"))
            - col("seq_id") * seqLen)
        .withColumn("doc_offset",
          greatest(col("seq_id") * seqLen, col("__gstart"))
            - col("__gstart"))
        .withColumn("span_tokens",
          least((col("seq_id") + 1L) * seqLen, col("__gstart") + col("tc"))
            - greatest(col("seq_id") * seqLen, col("__gstart")))
        .select(col("seq_id"), col(idCol), col("tc"),
          col("seq_offset"), col("doc_offset"), col("span_tokens"))
    } finally cum.unpersist()
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
