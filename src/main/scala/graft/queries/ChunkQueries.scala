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

    // A8 markdown-mode surface. Chunk BODIES are engine spec (golden
    // tests pin them); the oracle gates the invariants that define a
    // correct chunking: ordered rejoin reproduces the text, every
    // chunk fits the 60-token budget, and chunk ids are a contiguous
    // 0..n-1 (violation-count == 0 encoded as booleans the oracle
    // recomputes as TRUE from the same table).
    "a8_chunk_fixed" -> QueryDef(
      """SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS re,
        |       TRUE AS within_budget, TRUE AS ids_contiguous
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(chunk_text(col("text"), lit(60), lit(0), lit("markdown")))
            .as(Seq("chunk_id", "chunk")))
        .groupBy("doc_id")
        .agg(
          // whitespace-normalized on BOTH sides so the gate is
          // corpus-independent (raw `text AS re` would false-fail on a
          // future doc carrying a double space)
          trim(regexp_replace(array_join(
            transform(
              array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
              c => c.getField("chunk")),
            " "), "\\s+", " ")).as("re"),
          (max(token_count(col("chunk"))) <= 60).as("within_budget"),
          (min(col("chunk_id")) === 0 &&
            max(col("chunk_id")) === count(lit(1)) - 1).as("ids_contiguous"))
        .orderBy("doc_id")
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
    // binary payloads (SQL-variant pipeline). The stateful fold's
    // chunk boundaries are engine spec (ChunkersSpec/Golden pin them);
    // the oracle gates the fold's defining invariants per document:
    // lossless ordered rejoin, contiguous ids, the emit-on-exceed rule
    // (only the tail chunk may be under 256 chars; no chunk exceeds
    // 256 + its final word), and the page-provenance bound (single-
    // line docs → page 0, tail quirk page 1 == page count).
    "a11_char_chunks" -> QueryDef(
      """SELECT 'doc://' || CAST(doc_id AS VARCHAR) || '.pdf' AS document_url,
        |       trim(regexp_replace(text, '\s+', ' ', 'g')) AS re,
        |       TRUE AS ids_contiguous, TRUE AS no_overrun,
        |       TRUE AS nontail_filled, TRUE AS pages_ok
        |FROM documents ORDER BY document_url""".stripMargin) { (s, dir) =>
      import s.implicits._
      val files = Tables(s, dir, "documents")
        .select(concat(lit("doc://"), col("doc_id"), lit(".pdf")).as("path"),
          encode(col("text"), "UTF-8").as("content"))
        .as[(String, Array[Byte])]
      val shortLen = length(col("chunk_text")) < 256
      graft.pipeline.IngestPipeline.routeAndChunkChars(
          files, graft.extract.StubAnalyzeExtractor(linesPerPage = 1),
          chunkSize = 256)
        .toDF()
        .groupBy("document_url")
        .agg(
          trim(regexp_replace(array_join(
            transform(
              array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
              c => c.getField("chunk_text")),
            " "), "\\s+", " ")).as("re"),
          (min(col("chunk_id")) === 0 &&
            max(col("chunk_id")) === count(lit(1)) - 1).as("ids_contiguous"),
          // pre-append length was <= 256 ⇒ chunk minus its last word
          // fits the budget (the one-word overrun the reference allows)
          (sum(when(length(col("chunk_text")) -
              length(substring_index(col("chunk_text"), " ", -1)) <= 256, 0)
            .otherwise(1)) === 0).as("no_overrun"),
          // emission fires only when the builder EXCEEDS chunkSize ⇒
          // every non-tail chunk carries >= 256 chars
          (sum(when(shortLen, 1).otherwise(0)) <= 1 &&
            (sum(when(shortLen, 1).otherwise(0)) === 0 ||
              max(when(shortLen, col("chunk_id"))) === max(col("chunk_id"))))
            .as("nontail_filled"),
          (sum(when(col("page_number").isNull, 1).otherwise(0)) === 0 &&
            min(col("page_number")) >= 0 && max(col("page_number")) <= 1)
            .as("pages_ok"))
        .orderBy("document_url")
    },

    // D4: token estimator (chunk budgeting heuristic, len/4).
    "d4_token_count" -> QueryDef(
      """SELECT doc_id, CAST(LENGTH(text) // 4 AS INTEGER) AS tc
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), token_count(col("text")).as("tc"))
        .orderBy("doc_id")
    },

    // D27: semantic chunking. Boundary CHOICES depend on the
    // embedding, so the gate plants sentence structure (the corpus is
    // punctuation-free word soup: re-terminate every 6 words) and
    // pins the operator's contract over every document: ordered
    // reassembly is byte-lossless, no chunk exceeds the sentence
    // budget, chunk numbering is dense from 0, and every document
    // survives. SemanticChunkerSpec pins the boundary placement
    // itself on planted two-topic text.
    "d27_semantic_chunks" -> QueryDef(
      """SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT)
        |         AS n_docs,
        |       TRUE AS lossless_ok, TRUE AS budget_ok,
        |       TRUE AS dense_ok""".stripMargin) { (s, dir) =>
      import graft.chunk.SemanticChunker
      val sentenced = Tables(s, dir, "documents").select(
        col("doc_id"),
        concat_ws(" ", transform(
          // groups of 6 words -> planted sentences ending in "."
          filter(transform(
            sequence(lit(0),
              ((size(split(col("text"), " ")) - 1) / 6).cast("int")),
            g => concat_ws(" ", slice(split(col("text"), " "),
              g * 6 + 1, lit(6)))),
            p => length(p) > 0),
          p => concat(p, lit(".")))).as("text"))
      val chunks = SemanticChunker.chunk(sentenced, "doc_id", "text",
        maxDistance = 0.7, maxSentences = 4)
      val per = chunks.groupBy("doc_id").agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(
            col("chunk_number"), col("chunk_text")))),
          c => c.getField("chunk_text"))).as("rebuilt"),
        max("n_sentences").as("max_n"),
        (max("chunk_number") === count(lit(1)) - 1 &&
          min("chunk_number") === 0).as("dense"))
      val checks = sentenced.join(per, Seq("doc_id")).agg(
        count(lit(1)).as("n_docs"),
        min((col("rebuilt") === col("text")).cast("int")).as("lossless"),
        max("max_n").as("worst_n"),
        min(col("dense").cast("int")).as("dense_min"))
        .collect().head
      import s.implicits._
      Seq((checks.getLong(0), checks.getInt(1) == 1,
          checks.getInt(2) <= 4, checks.getInt(3) == 1))
        .toDF("n_docs", "lossless_ok", "budget_ok", "dense_ok")
    }
  )
}
