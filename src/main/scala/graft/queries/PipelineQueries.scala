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

    // Raw pipeline output surface (embedding values are spec'd by the
    // deterministic embedder, not SQL — rows-only). The driver sorts
    // results via pandas, which cannot hash array columns, so the
    // embedding is projected to scalars that still pin its full
    // fidelity: the norm plus a sha2 over its JSON rendering.
    "p2_ingest_chunks" -> QueryDef.rowsOnly { (s, dir) =>
      IngestPipeline.ingestDocumentsTable(
          s, Tables(s, dir, "documents"), DeterministicEmbedder(64))
        .withColumn("embedding_norm", round(vector_norm(col("embedding")), 6))
        .withColumn("embedding_sha", sha2(to_json(col("embedding")), 256))
        .drop("embedding")
        .orderBy("document_url", "chunk_id")
    }
  )
}
