package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions.{chunk_text, token_count}

/** Tier A chunking surface exercised through the conformance gate
  * (SURVEY A8/A10/A12, D4). The chunker itself is not ANSI-SQL
  * expressible, so the oracles check its load-bearing invariants
  * instead: losslessness (ordered reassembly of chunks == original
  * text after whitespace normalization) and block arithmetic.
  */
object ChunkQueries {

  def defs: Map[String, QueryDef] = Map(

    // A8+A12: chunk, number via posexplode, rejoin in chunk order —
    // must reproduce the source text (modulo whitespace joins). This
    // is the strongest SQL-checkable statement of chunker correctness.
    "a8_chunk_lossless" -> QueryDef(
      "SELECT doc_id, text AS re FROM documents ORDER BY doc_id") { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      docs
        .select(col("doc_id"),
          posexplode(chunk_text(col("text"), lit(60), lit(0), lit("plain")))
            .as(Seq("chunk_id", "chunk")))
        .groupBy("doc_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
            c => c.getField("chunk")),
          " ").as("re0"))
        .select(col("doc_id"),
          regexp_replace(col("re0"), "\\s+", " ").as("re"))
        .orderBy("doc_id")
    },

    // A8 raw surface (chunk bodies are spec'd by our golden tests, not
    // an SQL oracle → rows-only).
    "a8_chunk_fixed" -> QueryDef.rowsOnly { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(chunk_text(col("text"), lit(60), lit(0), lit("markdown")))
            .as(Seq("chunk_id", "chunk")))
        .orderBy("doc_id", "chunk_id")
    },

    // A10: 40-word re-blocking in its SQL form (posexplode → group by
    // floor(pos/41) — the 41 keeps the reference's post-increment
    // quirk). Oracle checks block count arithmetic + lossless rejoin.
    "a10_word_reblock" -> QueryDef(
      """SELECT doc_id,
        |       CAST(CEIL(LENGTH(string_split(text, ' ')) / 41.0) AS BIGINT) AS nblk,
        |       text AS re
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .groupBy(col("doc_id"), floor(col("pos") / 41).as("blk"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            c => c.getField("w")),
          " ").as("btxt"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nblk"),
          array_join(
            transform(array_sort(collect_list(struct(col("blk"), col("btxt")))),
              c => c.getField("btxt")),
            " ").as("re"))
        .orderBy("doc_id")
    },

    // A11: char-bounded chunking with page provenance over extracted
    // binary payloads (SQL-variant pipeline; stateful fold → rows-only,
    // semantics pinned by ChunkersSpec/ChunkersGoldenSpec).
    "a11_char_chunks" -> QueryDef.rowsOnly { (s, dir) =>
      import s.implicits._
      val files = Tables(s, dir, "documents")
        .select(concat(lit("doc://"), col("doc_id"), lit(".pdf")).as("path"),
          encode(col("text"), "UTF-8").as("content"))
        .as[(String, Array[Byte])]
      graft.pipeline.IngestPipeline.routeAndChunkChars(
          files, graft.extract.StubAnalyzeExtractor(linesPerPage = 1),
          chunkSize = 256)
        .toDF()
        .orderBy("document_url", "chunk_id")
    },

    // D4: token estimator (chunk budgeting heuristic, len/4).
    "d4_token_count" -> QueryDef(
      """SELECT doc_id, CAST(LENGTH(text) // 4 AS INTEGER) AS tc
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), token_count(col("text")).as("tc"))
        .orderBy("doc_id")
    }
  )
}
