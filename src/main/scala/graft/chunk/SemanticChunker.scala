package graft.chunk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{bow_embed, cosine_distance}

/** D27: SEMANTIC chunking — split a document where the topic shifts,
  * measured as a cosine dip between adjacent sentence embeddings (the
  * "semantic chunker" of modern RAG stacks), instead of the A8-A11
  * family's size-only boundaries. The reference's chunkers are all
  * size/structure-driven (`AzureCosmosDB/.../DocumentChunker.cs`,
  * `AzureSQL/.../TextChunker.cs`); this is the embedding-aware
  * sibling the retrieval literature reaches for when chunk coherence
  * matters more than uniform size.
  *
  * Fully declarative plan, one doc-keyed lineage:
  *  1. sentences: in-plan split (terminator-preserving regex) +
  *     `posexplode` — no UDF;
  *  2. sentence embeddings: any `Column => Column` (a real model
  *     vector column if the caller has one); the default is the
  *     deterministic random-indexing [[graft.functions.BowEmbed]]
  *     kernel, so the operator is self-contained and reproducible;
  *  3. boundaries: `lag` window per document + the codegen
  *     `cosine_distance` kernel — a new chunk starts where distance
  *     exceeds `maxDistance`;
  *  4. chunk ids: running sum of boundary flags over the same window
  *     partitioning (no extra exchange), then a size backstop — a
  *     semantic chunk longer than `maxSentences` splits at the budget
  *     (the A8 contract kept as a guard);
  *  5. reassembly: group by (doc, chunk), order-immune
  *     `sort_array(collect_list(struct(idx, sentence)))` rebuild.
  *
  * Scale shape: sentence rows carry text through exactly TWO
  * doc-keyed exchanges (the window's and the reassembly's — the
  * second could reuse the first's partitioning only if Spark
  * recognized subset keys, which it does not); everything else is
  * per-row codegen. Bounded driver state: none.
  */
object SemanticChunker {

  /** Sentence boundary: split AFTER terminator runs (.!?…), keeping
    * the terminator with its sentence; newlines also split (titles,
    * lists). Lossless at the sentence level: `concat_ws(" ", …)` over
    * the pieces equals the single-spaced original.
    */
  private val sentenceSplit = "(?<=[.!?…])\\s+|\\n+"

  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Double = 0.6,
      maxSentences: Int = 16,
      embed: Column => Column = bow_embed(_, lit(32))): DataFrame = {
    require(maxDistance >= 0.0 && maxDistance <= 2.0,
      s"maxDistance must be a cosine distance in [0, 2], got $maxDistance")
    require(maxSentences >= 1,
      s"maxSentences must be >= 1, got $maxSentences")
    require(!docs.columns.exists(_.startsWith("__sc_")),
      "column prefix __sc_ is reserved by SemanticChunker")
    val sentences = docs.select(
        col(idCol),
        posexplode_outer(filter(split(col(textCol), sentenceSplit),
          s => length(trim(s)) > 0)).as(Seq("__sc_idx", "__sc_sent")))
      // a blank/whitespace-only (or NULL) document explodes to no
      // sentence rows and would VANISH from the output; the _outer
      // explode keeps one NULL row, coalesced to a single empty
      // sentence, so chunk() is TOTAL over its input doc set — a
      // blank document yields exactly one empty chunk
      // (chunk_number 0, chunk_text '', n_sentences 0)
      .select(col(idCol),
        coalesce(col("__sc_idx"), lit(0)).as("__sc_idx"),
        coalesce(col("__sc_sent"), lit("")).as("__sc_sent"))
    val w = Window.partitionBy(idCol).orderBy("__sc_idx")
    val withDist = sentences
      .withColumn("__sc_v", embed(col("__sc_sent")))
      .withColumn("__sc_prev", lag(col("__sc_v"), 1).over(w))
      .withColumn("__sc_break",
        when(col("__sc_prev").isNull, 1)
          .when(cosine_distance(col("__sc_v"), col("__sc_prev"))
            > maxDistance, 1)
          .otherwise(0))
      .withColumn("__sc_sem", sum(col("__sc_break")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // size backstop inside each semantic chunk (A8's budget kept)
      .withColumn("__sc_pos", row_number().over(
        Window.partitionBy(col(idCol), col("__sc_sem"))
          .orderBy("__sc_idx")) - 1)
      .withColumn("__sc_chunk",
        concat_ws("#", col("__sc_sem"),
          (col("__sc_pos") / maxSentences).cast("int")))
    withDist
      .groupBy(col(idCol), col("__sc_chunk"))
      .agg(
        min("__sc_idx").as("__sc_first"),
        // real sentence rows are never empty (the split filter drops
        // them), so the blank-document placeholder counts zero
        sum(when(col("__sc_sent") =!= "", 1).otherwise(0))
          .cast("int").as("n_sentences"),
        concat_ws(" ",
          transform(
            sort_array(collect_list(struct(
              col("__sc_idx"), col("__sc_sent")))),
            s => s.getField("__sc_sent"))).as("chunk_text"))
      .withColumn("chunk_number", row_number().over(
        Window.partitionBy(idCol).orderBy("__sc_first")) - 1)
      .select(col(idCol), col("chunk_number"), col("chunk_text"),
        col("n_sentences"))
  }
}
