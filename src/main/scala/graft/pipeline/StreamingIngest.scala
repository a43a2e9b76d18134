package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.embed.Embedder
import graft.extract.Extractor
import graft.sink.ChunkStore

/** Streaming ingestion (SURVEY A1/A2, §3.1-3.2): the reference's blob
  * trigger becomes a Structured Streaming `binaryFile` source; each
  * micro-batch runs the same route→extract→chunk→embed dataflow and
  * MERGEs (partition-overwrite upsert) into the chunk store; deletes
  * are detected as catalog-vs-listing anti-joins (the reference's
  * delete handler was a TODO stub — A20 — completed here).
  */
object StreamingIngest {

  /** Opt-in near-dup skip on ingest (the D6 cost-control story,
    * composed from [[StreamingDedup]]): a re-uploaded near-duplicate
    * document is detected against the persistent signature store
    * BEFORE chunk+embed, so it costs one MinHash pass instead of an
    * embedding bill — and its chunks never reach the store.
    */
  final case class DedupConfig(
      signatureStorePath: String,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3)

  /** Fixed schema of the binaryFile source (streaming sources require
    * an explicit schema; SURVEY §1.1 item 1 / FIXTURES §2).
    */
  val binaryFileSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))

  /** Start an AvailableNow (or ProcessingTime) ingest over a
    * directory of documents.
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      store: ChunkStore,
      embedder: Embedder,
      extractor: Extractor,
      cfg: IngestPipeline.Config = IngestPipeline.Config(),
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      dedup: Option[DedupConfig] = None,
      indexPaths: Seq[String] = Nil,
      metrics: Option[IngestMetrics] = None): StreamingQuery = {
    store.ensure()
    val files = spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .load(inputDir)
      .select(col("path"), col("content"))

    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, inputDir, store, embedder, extractor,
          cfg, dedup, indexPaths, metrics)
        ()
      }
      .start()
  }

  /** One micro-batch: upsert new/changed docs, delete disappeared
    * ones. Exposed for testing and for batch backfill ("the batch is a
    * bounded stream"). With a [[DedupConfig]], documents matching the
    * signature store are dropped BEFORE chunk+embed and returned as
    * (id, existing_id, est_jaccard) — the skip happens where the money
    * is (the embedding stage), and only non-duplicates enter either
    * store. Returns the empty frame when dedup is off.
    */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      inputDir: String,
      store: ChunkStore,
      embedder: Embedder,
      extractor: Extractor,
      cfg: IngestPipeline.Config,
      dedup: Option[DedupConfig] = None,
      indexPaths: Seq[String] = Nil,
      metrics: Option[IngestMetrics] = None): DataFrame = {
    import spark.implicits._
    val allFiles = batch.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val (files, matches) = dedup match {
      case None =>
        (allFiles, spark.emptyDataFrame
          .withColumn("id", lit(null).cast("string"))
          .withColumn("existing_id", lit(null).cast("string"))
          .withColumn("est_jaccard", lit(null).cast("double")).limit(0))
      case Some(dc) =>
        // document-identity text via the same routing as the chunker;
        // the signature store keys on the document_url
        val docText = allFiles
          .map { case (p, b) =>
            (p, IngestPipeline.documentText(p, b, extractor))
          }
          .toDF("document_url", "doc_text")
        val m = StreamingDedup.processBatch(spark, docText,
          dc.signatureStorePath, idCol = "document_url",
          textCol = "doc_text", threshold = dc.threshold,
          numHashes = dc.numHashes, bands = dc.bands,
          shingleSize = dc.shingleSize) // localCheckpointed result
        val kept = allFiles.toDF("path", "content")
          .join(m.select(col("id").as("path")), Seq("path"), "left_anti")
          .as[(String, Array[Byte])]
        (kept, m)
    }
    val chunks =
      IngestPipeline.embedChunks(
        IngestPipeline.routeAndChunk(files, extractor, cfg, metrics),
        embedder, cfg, metrics)
    // no emptiness pre-check: that would execute the embedding stage
    // twice per micro-batch; an empty frame under dynamic partition
    // overwrite touches no partitions anyway
    store.upsert(chunks.toDF())

    // A2/A20: documents present in the store but gone from the source
    // listing were deleted upstream. Runs per batch ONLY when the
    // store's catalog is metadata-only (per-document layout: partition
    // directory names, one filesystem listing each side — no data
    // scan, no shuffle, no Spark job). A bucketed store answers the
    // catalog with a full scan, so there deletes are a maintenance
    // concern: schedule [[detectDeletes]] on its own cadence instead
    // (warned once so the change of contract is visible).
    if (store.hasMetadataCatalog)
      detectDeletes(spark, inputDir, store, indexPaths)
    else if (warnedBucketedDeletes.compareAndSet(false, true)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "this store answers its document catalog with a scan " +
          "(bucketed layout or log-committed format) — per-batch " +
          "delete detection is disabled; schedule StreamingIngest." +
          "detectDeletes on a maintenance cadence to propagate deletes")
    }
    matches
  }

  private val warnedBucketedDeletes =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Compare the store's document catalog against the source listing
    * and drop documents that disappeared upstream — from the chunk
    * store AND from every attached persistent index (`indexPaths`:
    * vector/text indexes keyed by `document_url`, dispatched by
    * [[graft.ops.IndexMaintenance]]). Without the propagation an
    * append-only index keeps serving a deleted document's rows until
    * a rebuild — the read-path gap the reference store never has (its
    * index lives on the container).
    *
    * Cost = catalog cost (metadata-only for the per-document layout;
    * a scan + distinct for bucketed stores — run on a maintenance
    * cadence there). Driver memory is O(actual deletes), not
    * O(catalog) and not O(listing): both sides are DataFrames — the
    * store's [[ChunkStore.documentCatalog]] and the source listing
    * streamed through a disk-backed frame — and the diff is a LEFT
    * ANTI JOIN, so a 10⁸-document catalog against a 10⁸-blob listing
    * costs executor time, never driver heap. Only the documents that
    * actually disappeared (churn-bounded) reach the driver, as the
    * delete call's argument.
    *
    * Safety contract: absence-of-listing is never read as
    * everything-was-deleted. A missing input directory (transient
    * mount/path failure) skips detection with a warning, and an EMPTY
    * listing against a non-empty store also refuses to act — wiping a
    * whole store requires the explicit
    * `store.delete(store.listDocumentUrls())`.
    */
  def detectDeletes(
      spark: SparkSession,
      inputDir: String,
      store: ChunkStore,
      indexPaths: Seq[String] = Nil): Unit = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val inPath = new org.apache.hadoop.fs.Path(inputDir)
    val ifs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!ifs.exists(inPath)) {
      log.warn(s"delete detection skipped: input path $inputDir does not " +
        "exist (transient mount or misconfiguration?) — refusing to treat " +
        "a missing listing as a mass delete")
      return
    }
    import spark.implicits._
    val catalog = store.documentCatalog().persist()
    try {
      if (catalog.isEmpty) return
      // stream the source listing into a disk-backed frame — O(batch)
      // driver heap at any listing size; the spool is closed once the
      // anti-join has collected, so a long-running job holds at most
      // one listing copy on disk at a time
      val files = ifs.listFiles(inPath, true)
      val sp = graft.sink.StreamedNames.spool(
        spark, "__p", new Iterator[String] {
          def hasNext: Boolean = files.hasNext
          def next(): String = files.next().getPath.toString
        })
      try {
        if (sp.count == 0L) {
          log.warn(s"delete detection skipped: input listing at $inputDir " +
            s"is empty but the store holds ${catalog.count()} documents — " +
            "refusing to mass-delete; wipe explicitly via store.delete if " +
            "intended")
          return
        }
        // Both sides normalized through the same Hadoop Path rendering:
        // document_url originates from the binaryFile source's `path`
        // column (a Path.toString), but re-render the stored side so a
        // divergence (file:/// vs file:/, URI escaping, another source)
        // can't make every document look deleted. The diff is a LEFT
        // ANTI JOIN whose result flows to the store and the indexes as
        // a FRAME (TableFormat.delete(DataFrame)) — nothing url-shaped
        // ever collects to the driver, at any churn size.
        val rendered = catalog.as[String]
          .map(u => (u, new org.apache.hadoop.fs.Path(u).toString))
          .toDF("document_url", "__p")
        val gone = rendered.join(sp.df, Seq("__p"), "left_anti")
          .select("document_url").persist()
        try {
          if (!gone.isEmpty) {
            store.delete(gone)
            indexPaths.foreach(p =>
              graft.ops.IndexMaintenance.deleteFrom(spark, p, gone))
          }
        } finally gone.unpersist()
      } finally sp.close()
    } finally catalog.unpersist()
  }
}
