package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.embed.DeterministicEmbedder
import graft.functions.GraftFunctions.vector_norm
import graft.pipeline.IngestPipeline

/** End-to-end ingestion dataflow through the conformance gate
  * (SURVEY §3.1). The embedding itself is engine-defined (the
  * deterministic offline embedder), so the oracle checks the
  * SQL-checkable invariants: one chunk per harness doc at the default
  * 250-token budget (docs are ≤553 chars ≈ ≤138 tokens), dimension 64,
  * unit norm, and chunk text == source text.
  */
object PipelineQueries {

  def defs: Map[String, QueryDef] = Map(

    "p1_ingest_invariants" -> QueryDef(
      """SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS document_url,
        |       CAST(1 AS BIGINT) AS nchunks,
        |       CAST(64 AS BIGINT) AS dim,
        |       CAST(1.0 AS DOUBLE) AS nrm,
        |       text AS chunk_text
        |FROM documents ORDER BY document_url""".stripMargin) { (s, dir) =>
      val chunks = IngestPipeline.ingestDocumentsTable(
        s, Tables(s, dir, "documents"), DeterministicEmbedder(64))
      chunks.groupBy("document_url")
        .agg(count(lit(1)).as("nchunks"),
          max(size(col("embedding"))).cast("long").as("dim"),
          round(max(vector_norm(col("embedding"))), 6).as("nrm"),
          max(col("chunk_text")).as("chunk_text"))
        .orderBy("document_url")
    },

    // Raw pipeline output surface. Embedding VALUES are spec'd by the
    // deterministic embedder (not SQL), so the embedding projects to
    // its unit norm plus a well-formedness check of the sha2 content
    // digest; everything else — one chunk per doc, chunk id 0, chunk
    // text == source text, url shape — the oracle recomputes exactly.
    "p2_ingest_chunks" -> QueryDef(
      """SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS document_url,
        |       CAST(0 AS BIGINT) AS chunk_id,
        |       text AS chunk_text,
        |       CAST(1.0 AS DOUBLE) AS embedding_norm,
        |       TRUE AS embedding_sha_ok
        |FROM documents ORDER BY document_url, chunk_id""".stripMargin) { (s, dir) =>
      IngestPipeline.ingestDocumentsTable(
          s, Tables(s, dir, "documents"), DeterministicEmbedder(64))
        .select(col("document_url"),
          col("chunk_id").cast("long").as("chunk_id"),
          col("chunk_text"),
          round(vector_norm(col("embedding")), 6).as("embedding_norm"),
          sha2(to_json(col("embedding")), 256).rlike("^[0-9a-f]{64}$")
            .as("embedding_sha_ok"))
        .orderBy("document_url", "chunk_id")
    }
  )
}
