package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.embed.Embedder
import graft.extract.{Extractor, TextDecode}
import graft.functions.GraftFunctions.chunk_text

/** A chunk awaiting embedding (A8-A12 output). */
final case class PendingChunk(
    document_url: String,
    chunk_id: Int,
    chunk_text: String,
    page_number: Option[Int])

/** A document the ingest dataflow rejected instead of letting it kill
  * the job (poison-document isolation — the reference host isolates
  * failures per blob and dead-letters repeated failures:
  * AzureCosmosDB/.../BlobTriggerFunction.cs:40-54 + the Functions
  * blob-trigger poison-queue semantics). `stage` names the failing
  * per-document stage (`decode`/`extract`/`chunk`), `error` carries
  * the exception class + message (truncated), `byte_length` the input
  * size — enough to triage and replay without re-running the fleet.
  */
final case class QuarantinedDoc(
    document_url: String,
    stage: String,
    error: String,
    byte_length: Long)

/** Union row of the isolating router: exactly one side is set. */
final case class RoutedOutcome(
    chunk: Option[PendingChunk],
    quarantined: Option[QuarantinedDoc])

/** The persisted record (SURVEY §1.1 item 4). */
final case class EmbeddedChunk(
    chunk_id: Int,
    chunk_text: String,
    embedding: Array[Float],
    page_number: Option[Int],
    document_url: String)

/** The ingestion dataflow (SURVEY §3.1), Spark-first:
  *
  * route(extension) → extract → chunk → repartition → embed
  * (mapPartitions, batched) → chunk rows.
  *
  * The reference's thread-pool parallelism (A13/A14: batches of 10,
  * DOP 50) maps to Spark task parallelism: `repartition` sizes the
  * embed stage, `iter.grouped(batchSize)` inside each task preserves
  * the service batch shape.
  */
object IngestPipeline {

  final case class Config(
      maxTokens: Int = 250,       // A8 default (DocumentChunker.cs:13)
      overlapTokens: Int = 0,     // A8 default (DocumentChunker.cs:14)
      batchSize: Int = 10,        // A13 (BlobTriggerFunction.cs:35)
      embedPartitions: Int = 0,   // A14 analog; 0 = leave as planned
      maxInFlight: Int = 1)       // A14 intra-task overlap; 1 = sync

  /** A3: extension-based routing + A4 text decode + A8/A9 chunking for
    * binary file rows (`binaryFile` source schema: path, content).
    * txt/md decode in-process; everything else goes through the
    * pluggable extractor (A5) then token chunking (A8). Typed flatMap:
    * per-file imperative logic is the honest shape here, exactly like
    * the reference's per-blob function body.
    *
    * STRICT variant: a per-document throw fails the task (and after
    * `spark.task.maxFailures`, the job). Production ingest should use
    * [[routeAndChunkIsolated]], which quarantines poison documents
    * instead — [[StreamingIngest.processBatch]] does.
    */
  def routeAndChunk(
      files: Dataset[(String, Array[Byte])],
      extractor: Extractor,
      cfg: Config = Config(),
      metrics: Option[IngestMetrics] = None): Dataset[PendingChunk] = {
    import files.sparkSession.implicits._
    files.flatMap { case (path, bytes) =>
      val ext = path.lastIndexOf('.') match {
        case -1 => ""
        case i  => path.substring(i + 1).toLowerCase
      }
      val out = ext match {
        case "txt" =>
          // reference quirk preserved: the .txt path also uses the
          // markdown splitter (DocumentChunker.cs:63-71)
          Chunkers.chunkTextLines(TextDecode.decodeLines(bytes),
              cfg.maxTokens, cfg.overlapTokens)
            .map(c => PendingChunk(path, c.chunkNumber, c.text, c.pageNumber))
        case "md" =>
          Chunkers.chunkMarkdownLines(TextDecode.decodeLines(bytes),
              cfg.maxTokens, cfg.overlapTokens)
            .map(c => PendingChunk(path, c.chunkNumber, c.text, c.pageNumber))
        case _ =>
          Chunkers.fixedSizeChunking(extractor.extract(path, bytes),
              cfg.maxTokens, cfg.overlapTokens)
            .map(c => PendingChunk(path, c.chunkNumber, c.text, c.pageNumber))
      }
      metrics.foreach { m =>
        m.docs.add(1L); m.chunks.add(out.size.toLong)
      }
      out
    }
  }

  /** [[routeAndChunk]] with per-document failure isolation. At 100 TB
    * a poison document (corrupt payload, extractor throw after
    * retries) is a certainty, and the strict router lets one such doc
    * fail the task — and, after `spark.task.maxFailures`, the whole
    * job. Here every per-document stage runs under a guard: a
    * NonFatal throw costs ONE [[QuarantinedDoc]] row carrying the
    * failing stage and error rendering, and the task moves to the
    * next document. Fatal errors (OOM, interrupts) still propagate —
    * those are task health, not document health. Mirrors the
    * reference host's per-blob isolation
    * (AzureCosmosDB/.../BlobTriggerFunction.cs:40-54).
    *
    * Split the union with [[chunksOf]] / [[quarantineOf]]; persist
    * the outcome dataset first if both sides feed separate actions
    * (extraction is the expensive stage — don't run it twice).
    */
  def routeAndChunkIsolated(
      files: Dataset[(String, Array[Byte])],
      extractor: Extractor,
      cfg: Config = Config(),
      metrics: Option[IngestMetrics] = None): Dataset[RoutedOutcome] = {
    import files.sparkSession.implicits._
    files.flatMap { case (path, bytes) =>
      var stage = "decode"
      try {
        val ext = path.lastIndexOf('.') match {
          case -1 => ""
          case i  => path.substring(i + 1).toLowerCase
        }
        val out = ext match {
          case "txt" =>
            val lines = TextDecode.decodeLines(bytes)
            stage = "chunk"
            Chunkers.chunkTextLines(lines, cfg.maxTokens, cfg.overlapTokens)
              .map(c => PendingChunk(path, c.chunkNumber, c.text, c.pageNumber))
          case "md" =>
            val lines = TextDecode.decodeLines(bytes)
            stage = "chunk"
            Chunkers.chunkMarkdownLines(lines, cfg.maxTokens,
                cfg.overlapTokens)
              .map(c => PendingChunk(path, c.chunkNumber, c.text, c.pageNumber))
          case _ =>
            stage = "extract"
            val extracted = extractor.extract(path, bytes)
            stage = "chunk"
            Chunkers.fixedSizeChunking(extracted, cfg.maxTokens,
                cfg.overlapTokens)
              .map(c => PendingChunk(path, c.chunkNumber, c.text, c.pageNumber))
        }
        metrics.foreach { m =>
          m.docs.add(1L); m.chunks.add(out.size.toLong)
        }
        out.map(c => RoutedOutcome(Some(c), None))
      } catch {
        case scala.util.control.NonFatal(e) =>
          metrics.foreach(_.quarantined.add(1L))
          // fold the CAUSE CHAIN before truncating: a wrapper whose
          // own message is null would otherwise render as a bare
          // class name, hiding the root failure the operator needs
          val chain = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).take(8).map(t =>
              s"${t.getClass.getName}: ${Option(t.getMessage).getOrElse("")}")
            .mkString(" <- ")
          Seq(RoutedOutcome(None, Some(QuarantinedDoc(
            path, stage, chain.take(512), bytes.length.toLong))))
      }
    }
  }

  /** The chunk side of [[routeAndChunkIsolated]]'s union. */
  def chunksOf(outcomes: Dataset[RoutedOutcome]): Dataset[PendingChunk] = {
    import outcomes.sparkSession.implicits._
    outcomes.flatMap(_.chunk)
  }

  /** The quarantine side of [[routeAndChunkIsolated]]'s union. */
  def quarantineOf(
      outcomes: Dataset[RoutedOutcome]): Dataset[QuarantinedDoc] = {
    import outcomes.sparkSession.implicits._
    outcomes.flatMap(_.quarantined)
  }

  /** The document's TEXT rendering for document-level operators
    * (near-dup detection on ingest): the same routing as
    * [[routeAndChunk]] — txt/md decode in-process, everything else
    * goes through the extractor — flattened to one string. Chunking
    * keeps its own structural view (lines/pages); this is the
    * content-identity view.
    */
  def documentText(
      path: String,
      bytes: Array[Byte],
      extractor: Extractor): String = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i  => path.substring(i + 1).toLowerCase
    }
    ext match {
      case "txt" | "md" => TextDecode.decodeLines(bytes).mkString("\n")
      case _            => extractor.extract(path, bytes).content
    }
  }

  /** A11 variant (the SQL pipeline's char chunker with page
    * provenance) over extracted binary files.
    */
  def routeAndChunkChars(
      files: Dataset[(String, Array[Byte])],
      extractor: Extractor,
      chunkSize: Int = 2048): Dataset[PendingChunk] = {
    import files.sparkSession.implicits._
    files.flatMap { case (path, bytes) =>
      val extracted = extractor.extract(path, bytes)
      Chunkers.charChunksWithPages(extracted.pages.map(_.words), chunkSize)
        .map(c => PendingChunk(path, c.chunkNumber, c.text, c.pageNumber))
    }
  }

  /** Chunk the harness `documents` table (text-per-row analog of the
    * txt path) declaratively: the chunk_text Catalyst expression +
    * posexplode stay inside whole-stage codegen, no typed round-trip.
    */
  def chunkDocumentsTable(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs.select(
        concat(lit("doc://"), col("doc_id")).as("document_url"),
        posexplode(chunk_text(col("text"),
          lit(cfg.maxTokens), lit(cfg.overlapTokens), lit("plain")))
          .as(Seq("chunk_id", "chunk_text")))
      .withColumn("page_number", lit(null).cast("int"))

  /** A13-A16: embedding stage. Batched calls inside mapPartitions —
    * the embedder is a serialized client per task, batches align by
    * index, task parallelism replaces the reference's DOP-50 pool,
    * and `maxInFlight` adds the reference's INTRA-worker overlap
    * (it runs up to 50 concurrent embedding calls per host —
    * BlobTriggerFunction.cs:36,104-108; a latency-bound HTTP embedder
    * leaves throughput on the table at one in-flight request per
    * task).
    */
  def embedChunks(
      chunks: Dataset[PendingChunk],
      embedder: Embedder,
      cfg: Config = Config(),
      metrics: Option[IngestMetrics] = None): Dataset[EmbeddedChunk] = {
    import chunks.sparkSession.implicits._
    val sized =
      if (cfg.embedPartitions > 0) chunks.repartition(cfg.embedPartitions)
      else chunks
    // metered OUTSIDE any retry wrapper the caller composed: batches
    // count logical service batches, latency is end-to-end including
    // retry sleeps, and the separate retry counter (RetryingEmbedder's
    // onRetry hook) distinguishes a slow service from a rate-limited
    // one
    val instrumented = metrics
      .map(new graft.embed.MeteredEmbedder(embedder, _): Embedder)
      .getOrElse(embedder)
    sized.mapPartitions { it =>
      val batches = it.grouped(cfg.batchSize)
      if (cfg.maxInFlight <= 1)
        batches.flatMap(b =>
          align(b, instrumented.embed(b.map(_.chunk_text))))
      else pipelined(batches, instrumented, cfg.maxInFlight)
    }
  }

  private def align(
      batch: Seq[PendingChunk],
      vecs: Seq[Array[Float]]): Seq[EmbeddedChunk] =
    batch.lazyZip(vecs).map { (c, v) =>
      EmbeddedChunk(c.chunk_id, c.chunk_text, v, c.page_number,
        c.document_url)
    }

  /** Bounded in-flight window: keep up to `maxInFlight` embed() calls
    * running on a task-local pool, emitting results in SUBMISSION
    * order — batch→row alignment and output order are identical to the
    * synchronous path, only the service latency overlaps. A16 retry
    * semantics are untouched (the RetryingEmbedder wrapper executes
    * inside the worker thread); a batch failure propagates when its
    * result is dequeued, with the ExecutionException unwrapped so
    * fatal errors surface as themselves. The pool is torn down by the
    * task-completion listener, so an abort mid-stream (task kill,
    * downstream limit) cannot leak threads. Embedders must be
    * thread-safe for maxInFlight > 1 — the shipped ones are
    * (stateless per call).
    */
  private def pipelined(
      batches: Iterator[Seq[PendingChunk]],
      embedder: Embedder,
      maxInFlight: Int): Iterator[EmbeddedChunk] = {
    import java.util.concurrent.{Callable, ExecutionException, Executors, Future => JFuture}
    val exec = Executors.newFixedThreadPool(maxInFlight)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => exec.shutdownNow()))
    val inFlight = scala.collection.mutable.Queue
      .empty[(Seq[PendingChunk], JFuture[Seq[Array[Float]]])]
    def fill(): Unit =
      while (inFlight.size < maxInFlight && batches.hasNext) {
        val b = batches.next()
        inFlight.enqueue((b, exec.submit(new Callable[Seq[Array[Float]]] {
          override def call(): Seq[Array[Float]] =
            embedder.embed(b.map(_.chunk_text))
        })))
      }
    val out = new Iterator[Seq[EmbeddedChunk]] {
      override def hasNext: Boolean = {
        fill()
        val more = inFlight.nonEmpty
        if (!more) exec.shutdown() // drained normally; listener is backup
        more
      }
      override def next(): Seq[EmbeddedChunk] = {
        if (!hasNext) throw new NoSuchElementException("drained")
        val (b, f) = inFlight.dequeue()
        val vecs = try f.get() catch {
          case e: ExecutionException if e.getCause != null => throw e.getCause
        }
        fill() // keep the window full while this batch is consumed
        align(b, vecs)
      }
    }
    out.flatten
  }

  /** D6: embedding cache — skip re-embedding chunks that already
    * exist unchanged in the store. Pending chunks anti-join the
    * store's (document_url, chunk_id, content-hash) keys: misses go to
    * the embedder, hits reuse the stored vector. This is the cost
    * control the reference implies via its retry ceilings and TPM
    * quota (SURVEY D6): at 100 TB re-ingest, unchanged documents cost
    * a hash + a join, not an embedding call.
    */
  def incrementalEmbed(
      pending: Dataset[PendingChunk],
      existing: DataFrame,
      embedder: Embedder,
      cfg: Config = Config()): DataFrame = {
    import pending.sparkSession.implicits._
    val keyCols = Seq("document_url", "chunk_id", "h")
    val cached = existing.select(
      col("document_url"), col("chunk_id"), col("chunk_text"),
      col("embedding"), col("page_number"),
      sha2(col("chunk_text"), 256).as("h"))
    val pend = pending.toDF()
      .withColumn("h", sha2(col("chunk_text"), 256))

    val toEmbed = pend
      .join(cached.select(keyCols.map(col): _*), keyCols, "left_anti")
      .drop("h")
      .as[PendingChunk]
    val reused = pend
      .join(cached.select(col("document_url"), col("chunk_id"), col("h"),
        col("embedding")), keyCols)
      .select(col("chunk_id"), col("chunk_text"), col("embedding"),
        col("page_number"), col("document_url"))

    embedChunks(toEmbed, embedder, cfg).toDF().unionByName(reused)
  }

  /** End-to-end batch ingest of the harness documents table. The
    * chunking here is declarative (codegen chunk_text — no typed
    * hooks), so `docs`/`chunks` metrics come from the embed stage's
    * text counter; service-stage metrics are the accumulators.
    */
  def ingestDocumentsTable(
      spark: SparkSession,
      docs: DataFrame,
      embedder: Embedder,
      cfg: Config = Config(),
      metrics: Option[IngestMetrics] = None): DataFrame = {
    import spark.implicits._
    val pending = chunkDocumentsTable(docs, cfg).as[PendingChunk]
    embedChunks(pending, embedder, cfg, metrics).toDF()
  }
}
