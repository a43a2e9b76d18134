package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Incremental near-dup detection on ingest (the streaming face of
  * D2): each micro-batch's documents are MinHash-signed and band-join
  * against a persistent signature store; matches emit
  * (incoming_id, existing_id, estimated jaccard) and only NON-duplicate
  * documents append their signatures — the store grows with the unique
  * corpus, not the ingest volume.
  *
  * Scale design: the store holds EXPLODED band keys
  * `(band, key, id, sig)` partitioned by `band`, so the per-batch probe
  * is an equi-join on (band, key) with uniformly hashed keys — the
  * band file layout prunes to matching partitions and no signature is
  * recomputed for stored documents. Verification uses the
  * signature-estimated Jaccard (equal-position fraction) — texts are
  * never stored, so the store is ~(numHashes+bands)×8 bytes per
  * document at any corpus size.
  */
object StreamingDedup {

  /** One micro-batch: returns the duplicate matches
    * (id, existing_id, est_jaccard) and appends the non-duplicates'
    * signatures to the store. Batch form of the `foreachBatch` body —
    * "the batch is a bounded stream".
    *
    * Contract: detects CROSS-batch duplicates (vs the accumulated
    * store). Duplicates WITHIN one batch are the batch-level
    * operators' job ([[graft.ops.Dedup.minhashLshPairs]]) — run one
    * before this when a single batch may carry its own re-uploads.
    */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame, // (idCol, textCol)
      storePath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    import graft.functions.GraftFunctions.minhash_signature

    val signed = batch.select(col(idCol).as("id"),
        minhash_signature(col(textCol), lit(numHashes), lit(shingleSize))
          .as("sig"))
      .localCheckpoint(true) // one signature pass; probed AND appended

    val banded = signed.select(col("id"), col("sig"),
      posexplode(Dedup.bandKeys(col("sig"), numHashes, bands))
        .as(Seq("band", "key")))

    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val storeExists = fs.exists(new org.apache.hadoop.fs.Path(storePath))

    val matches = if (!storeExists) {
      // typed empty frame: id columns keep the caller's id type
      signed.select(col("id"), col("id").as("existing_id"),
        lit(0.0).as("est_jaccard")).limit(0)
    } else {
      val store = spark.read.parquet(storePath)
      banded.as("n")
        .join(store.as("o"),
          col("n.band") === col("o.band") && col("n.key") === col("o.key"))
        .select(col("n.id").as("id"), col("o.id").as("existing_id"),
          col("n.sig").as("nsig"), col("o.sig").as("osig"))
        .distinct()
        // estimated Jaccard = fraction of equal minhash positions
        .withColumn("est_jaccard",
          aggregate(zip_with(col("nsig"), col("osig"),
              (a, b) => when(a === b, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / numHashes)
        .filter(col("est_jaccard") >= threshold)
        .select("id", "existing_id", "est_jaccard")
    }
    val m = matches.localCheckpoint(true) // evaluated twice below

    // only non-duplicates enter the store: re-uploads never bloat it
    val fresh = banded.join(m.select("id").distinct(), Seq("id"), "left_anti")
    fresh.select(col("band"), col("key"), col("id"), col("sig"))
      .write.mode(SaveMode.Append).partitionBy("band").parquet(storePath)
    // the batch signature checkpoint served both consumers (probe +
    // append) — free its blocks; a long-running stream must not
    // accumulate one per micro-batch (m stays: it is the result)
    Dedup.freeLocalCheckpoint(signed)
    m
  }
}
