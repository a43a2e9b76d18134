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
      embedPartitions: Int = 0)   // A14 analog; 0 = leave as planned

  /** A3: extension-based routing + A4 text decode + A8/A9 chunking for
    * binary file rows (`binaryFile` source schema: path, content).
    * txt/md decode in-process; everything else goes through the
    * pluggable extractor (A5) then token chunking (A8). Typed flatMap:
    * per-file imperative logic is the honest shape here, exactly like
    * the reference's per-blob function body.
    */
  def routeAndChunk(
      files: Dataset[(String, Array[Byte])],
      extractor: Extractor,
      cfg: Config = Config()): Dataset[PendingChunk] = {
    import files.sparkSession.implicits._
    files.flatMap { case (path, bytes) =>
      val ext = path.lastIndexOf('.') match {
        case -1 => ""
        case i  => path.substring(i + 1).toLowerCase
      }
      ext match {
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
    * index, task parallelism replaces the reference's DOP-50 pool.
    */
  def embedChunks(
      chunks: Dataset[PendingChunk],
      embedder: Embedder,
      cfg: Config = Config()): Dataset[EmbeddedChunk] = {
    import chunks.sparkSession.implicits._
    val sized =
      if (cfg.embedPartitions > 0) chunks.repartition(cfg.embedPartitions)
      else chunks
    sized.mapPartitions { it =>
      it.grouped(cfg.batchSize).flatMap { batch =>
        val vecs = embedder.embed(batch.map(_.chunk_text))
        batch.lazyZip(vecs).map { (c, v) =>
          EmbeddedChunk(c.chunk_id, c.chunk_text, v, c.page_number,
            c.document_url)
        }
      }
    }
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

  /** End-to-end batch ingest of the harness documents table. */
  def ingestDocumentsTable(
      spark: SparkSession,
      docs: DataFrame,
      embedder: Embedder,
      cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val pending = chunkDocumentsTable(docs, cfg).as[PendingChunk]
    embedChunks(pending, embedder, cfg).toDF()
  }
}
