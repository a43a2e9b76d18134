package graft.pipeline

import org.apache.hadoop.fs.Path
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
  * `(band, key, id, sig)` partitioned by `band`; the per-batch probe
  * is an equi-join on (band, key) — the batch side is tiny and
  * broadcasts, so the store never shuffles. The store SCAN is
  * O(unique corpus) per probe: right for cadence-driven dedup;
  * sub-second micro-batches should batch probes or compact the store
  * into a bucketed layout. Verification uses the signature-estimated
  * Jaccard (equal-position fraction) — texts are never stored, so the
  * store is ~(numHashes+bands)×8 bytes per document at any corpus
  * size. The signature parameters are STAMPED into the store on
  * bootstrap and validated per call: probing a store built with a
  * different fold would silently match nothing.
  */
object StreamingDedup {

  private def paramsTag(numHashes: Int, bands: Int, shingleSize: Int) =
    s"numHashes=$numHashes bands=$bands shingles=$shingleSize"

  /** One micro-batch: returns the duplicate matches
    * (id, existing_id, est_jaccard) and appends the non-duplicates'
    * signatures to the store. Batch form of the `foreachBatch` body —
    * "the batch is a bounded stream".
    *
    * Contracts:
    *  - detects CROSS-batch duplicates (vs the accumulated store);
    *    duplicates WITHIN one batch are the batch-level operators' job
    *    ([[graft.ops.Dedup.minhashLshPairs]]) — run one before this
    *    when a single batch may carry its own re-uploads;
    *  - a document id already in the store never matches ITSELF, so
    *    an at-least-once replay (foreachBatch crash-recovery) reports
    *    the replayed docs as unique instead of self-duplicates —
    *    idempotent modulo the duplicate store rows the replay appends,
    *    which are harmless (same band/key/sig) and collapse at the
    *    next compaction.
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

    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tagPath = new Path(root, "_graft_dedup_params")
    val tag = paramsTag(numHashes, bands, shingleSize)

    // "store exists" must mean DATA exists: an empty first batch
    // leaves a file-less directory whose parquet read would fail
    val storeHasData = fs.exists(tagPath)
    if (storeHasData) {
      val in = fs.open(tagPath)
      val onDisk = try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      require(onDisk == tag,
        s"signature store at $storePath was built with '$onDisk' but " +
          s"probed with '$tag' — signatures are incompatible across " +
          "parameter changes; rebuild the store or match the parameters")
    }

    val matches = if (!storeHasData) {
      // typed empty frame: id columns keep the caller's id type
      signed.select(col("id"), col("id").as("existing_id"),
        lit(0.0).as("est_jaccard")).limit(0)
    } else {
      val store = spark.read.parquet(storePath)
      banded.as("n")
        .join(store.as("o"),
          col("n.band") === col("o.band") && col("n.key") === col("o.key") &&
            // never match a doc against its own stored signature: an
            // at-least-once replay would otherwise report every
            // replayed doc as a self-duplicate
            col("n.id") =!= col("o.id"))
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

    // only non-duplicates enter the store (left_anti ignores duplicate
    // right-side keys — no distinct needed): re-uploads never bloat it
    val fresh = banded.join(m.select("id"), Seq("id"), "left_anti")
    val appended = fresh.select(col("band"), col("key"), col("id"), col("sig"))
    appended.write.mode(SaveMode.Append).partitionBy("band").parquet(storePath)
    // stamp params once data exists; count the write's output via the
    // directory, not an extra job: any parquet part implies data
    if (!storeHasData && !fs.exists(tagPath)) {
      val hasParquet = {
        val it = fs.listFiles(root, true)
        var found = false
        while (!found && it.hasNext)
          found = it.next().getPath.getName.endsWith(".parquet")
        found
      }
      if (hasParquet) {
        val out = fs.create(tagPath, true)
        try out.write(tag.getBytes("UTF-8")) finally out.close()
      }
    }
    // the batch signature checkpoint served both consumers (probe +
    // append) — free its blocks; a long-running stream must not
    // accumulate one per micro-batch (m stays: it is the result)
    Dedup.freeLocalCheckpoint(signed)
    m
  }
}
