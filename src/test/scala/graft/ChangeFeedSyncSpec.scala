package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.ChangeFeedSync
import graft.sink.{ChunkStore, ManifestTableFormat}

/** P10: change-feed-driven derived-table maintenance. A target store
  * tracks a source manifest table through upserts and deletes with a
  * per-document transform, resumes from its checkpoint, and replays
  * idempotently.
  */
class ChangeFeedSyncSpec extends SparkSpec {

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def chunksOf(url: String, texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i, t, Seq(i.toFloat, 1f), 1, url)
    }.toDF("chunk_id", "chunk_text", "embedding", "page_number",
      "document_url")
  }

  private def state(store: ChunkStore): Set[(String, Int, String)] =
    store.read().select("document_url", "chunk_id", "chunk_text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet

  test("replica tracks source through upserts and deletes; replay is idempotent") {
    val srcPath = fresh("graft-sync-src") + "/t"
    val dstPath = fresh("graft-sync-dst") + "/t"
    val ckpt = fresh("graft-sync-ck")
    val src = new ChunkStore(spark, srcPath,
      format = ManifestTableFormat.factory)
    val dst = new ChunkStore(spark, dstPath,
      format = ManifestTableFormat.factory)
    // the derived table is a PROJECTION: uppercased text
    val upper = (df: DataFrame) =>
      df.withColumn("chunk_text", org.apache.spark.sql.functions.upper(col("chunk_text")))

    src.upsert(chunksOf("doc://a", "a1", "a2"))
    src.upsert(chunksOf("doc://b", "b1"))
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, upper)
    assert(state(dst) == Set(
      ("doc://a", 0, "A1"), ("doc://a", 1, "A2"), ("doc://b", 0, "B1")))

    // upsert rewrites a document; delete removes one — one drain
    src.upsert(chunksOf("doc://a", "a1v2"))
    src.delete(Seq("doc://b"))
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, upper)
    assert(state(dst) == Set(("doc://a", 0, "A1V2")))

    // nothing new: a drain changes nothing (checkpoint resume)
    val v = dst.read().count()
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, upper)
    assert(state(dst) == Set(("doc://a", 0, "A1V2")))
    assert(dst.read().count() == v)

    // replay idempotence: a FRESH checkpoint replays all history onto
    // the existing target and converges to the same state
    ChangeFeedSync.syncOnce(spark, srcPath, dst, fresh("graft-sync-ck2"),
      upper)
    assert(state(dst) == Set(("doc://a", 0, "A1V2")))
  }

  test("a filtering projection evicts documents that stop qualifying") {
    val srcPath = fresh("graft-sync-filter-src") + "/t"
    val dstPath = fresh("graft-sync-filter-dst") + "/t"
    val ckpt = fresh("graft-sync-filter-ck")
    val src = new ChunkStore(spark, srcPath,
      format = ManifestTableFormat.factory)
    val dst = new ChunkStore(spark, dstPath,
      format = ManifestTableFormat.factory)
    // the projection keeps only documents whose text contains "keep"
    val onlyKeep = (df: DataFrame) =>
      df.filter(col("chunk_text").contains("keep"))
    src.upsert(chunksOf("doc://a", "keep me"))
    src.upsert(chunksOf("doc://b", "drop me"))
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, onlyKeep)
    assert(state(dst) == Set(("doc://a", 0, "keep me")))
    // a REWRITE that newly fails the filter must evict the old rows
    src.upsert(chunksOf("doc://a", "no longer qualifying"))
    // and one that newly passes must appear
    src.upsert(chunksOf("doc://b", "keep me now"))
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, onlyKeep)
    assert(state(dst) == Set(("doc://b", 0, "keep me now")))
  }

  test("derived semantic-chunk table follows a documents table " +
      "(the reference pipeline, incremental)") {
    import graft.chunk.SemanticChunker
    import graft.functions.GraftFunctions.bow_embed
    val srcPath = fresh("graft-sync-rechunk-src") + "/t"
    val dstPath = fresh("graft-sync-rechunk-dst") + "/t"
    val ckpt = fresh("graft-sync-rechunk-ck")
    val src = new ChunkStore(spark, srcPath,
      format = ManifestTableFormat.factory)
    val dst = new ChunkStore(spark, dstPath,
      format = ManifestTableFormat.factory)
    // whole documents ride the source table as single-chunk rows;
    // the DERIVED table holds their semantic chunks + embeddings —
    // the reference's extract->chunk->embed->upsert dataflow as an
    // incremental consumer of the change feed
    val rechunk = (docs: DataFrame) =>
      SemanticChunker.chunk(
        docs.select(col("document_url"), col("chunk_text")),
        "document_url", "chunk_text",
        maxDistance = 0.6, maxSentences = 4)
        .select(col("chunk_number").as("chunk_id"),
          col("chunk_text"),
          bow_embed(col("chunk_text"), lit(8)).as("embedding"),
          lit(1).as("page_number"), col("document_url"))

    src.upsert(chunksOf("doc://a",
      "Spark shuffles partition data. Spark shuffles partition " +
        "codegen. Cats purr milk whiskers. Cats purr milk bowls."))
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, rechunk)
    val chunks1 = dst.read()
      .select("document_url", "chunk_id", "chunk_text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(chunks1.length == 2, chunks1.mkString("\n"))
    assert(chunks1.exists(c => c._3.startsWith("Spark")) &&
      chunks1.exists(c => c._3.startsWith("Cats")))
    // embeddings landed alongside
    assert(dst.read().select("embedding").collect()
      .forall(_.getSeq[Float](0).length == 8))

    // rewriting the document re-chunks it wholesale in the replica
    src.upsert(chunksOf("doc://a", "Only one topic now."))
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, rechunk)
    val chunks2 = dst.read()
      .select("chunk_id", "chunk_text").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(chunks2.toSeq == Seq((0, "Only one topic now.")))

    // deleting the document empties the derived table
    src.delete(Seq("doc://a"))
    ChangeFeedSync.syncOnce(spark, srcPath, dst, ckpt, rechunk)
    assert(dst.read().count() == 0)
  }

  test("transform must keep the sync key") {
    val srcPath = fresh("graft-sync-key") + "/t"
    val src = new ChunkStore(spark, srcPath,
      format = ManifestTableFormat.factory)
    src.upsert(chunksOf("doc://a", "a1"))
    val dst = new ChunkStore(spark, fresh("graft-sync-key-dst") + "/t",
      format = ManifestTableFormat.factory)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ChangeFeedSync.syncOnce(spark, srcPath, dst,
        fresh("graft-sync-key-ck"), _.drop("document_url"))
    }
    assert(e.getCause.getMessage.contains("document_url"))
  }
}
