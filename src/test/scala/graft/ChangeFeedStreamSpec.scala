package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.sink.{ChunkStore, ManifestTableFormat}

/** The manifest change feed as a Structured Streaming SOURCE
  * (`format("graft-cdf")`): offsets are manifest versions, each
  * micro-batch is the net `changesBetween` delta, and restart rides
  * the sink checkpoint. Twin of the batch gate c37e_change_feed.
  */
class ChangeFeedStreamSpec extends SparkSpec {

  private def freshPath(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def chunksOf(url: String, texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i, t, Seq(i.toFloat, 1f), 1, url)
    }.toDF("chunk_id", "chunk_text", "embedding", "page_number",
      "document_url")
  }

  /** Drain everything currently available (AvailableNow), resuming
    * from `ckpt`, and return the sunk rows as (url, chunk_text,
    * change_type) triples. foreachBatch because it supports
    * checkpoint RECOVERY (the memory sink does not in append mode) —
    * resume-across-runs is exactly what these cases pin.
    */
  private def drain(
      path: String, ckpt: String, name: String,
      extraOptions: Map[String, String] = Map.empty)
      : Seq[(String, String, String)] = {
    val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val reader = spark.readStream.format("graft-cdf").option("path", path)
    val q = extraOptions.foldLeft(reader) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("document_url", "chunk_text", "_change_type")
          .collect()
          .foreach(r => buf.add((r.getString(0), r.getString(1), r.getString(2))))
      }
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }

  test("fresh query streams the current snapshot, then only deltas") {
    val tbl = freshPath("graft-cdf-tbl") + "/t"
    val ckpt = freshPath("graft-cdf-ckpt")
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    store.upsert(chunksOf("doc://a", "a1", "a2")) // v0
    store.upsert(chunksOf("doc://b", "b1"))       // v1

    val first = drain(tbl, ckpt, "cdf_run1")
    assert(first.toSet == Set(
      ("doc://a", "a1", "insert"), ("doc://a", "a2", "insert"),
      ("doc://b", "b1", "insert")))

    // no new commits -> restart produces nothing new
    val second = drain(tbl, ckpt, "cdf_run2")
    assert(second.isEmpty)

    // an upsert rewriting doc://a shows as its old rows deleted +
    // new rows inserted; doc://b (untouched file) does not reappear
    store.upsert(chunksOf("doc://a", "a1v2"))     // v2
    val third = drain(tbl, ckpt, "cdf_run3")
    assert(third.toSet == Set(
      ("doc://a", "a1", "delete"), ("doc://a", "a2", "delete"),
      ("doc://a", "a1v2", "insert")))

    // a document delete shows as deletes only
    store.delete(Seq("doc://b"))                  // v3
    val fourth = drain(tbl, ckpt, "cdf_run4")
    assert(fourth.toSet == Set(("doc://b", "b1", "delete")))
  }

  test("TRUNCATE and RESTORE stream as their net row deltas") {
    val tbl = freshPath("graft-cdf-rst") + "/t"
    val ckpt = freshPath("graft-cdf-rst-ckpt")
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    store.upsert(chunksOf("doc://a", "a1"))       // v0
    store.upsert(chunksOf("doc://b", "b1"))       // v1
    assert(drain(tbl, ckpt, "cdf_rst1").size == 2)

    val mtf = new ManifestTableFormat(spark, tbl, store.schema)
    mtf.truncate()                                // v2
    val afterTrunc = drain(tbl, ckpt, "cdf_rst2")
    assert(afterTrunc.toSet == Set(
      ("doc://a", "a1", "delete"), ("doc://b", "b1", "delete")))

    mtf.restore(1L)                               // v3: both come back
    val afterRestore = drain(tbl, ckpt, "cdf_rst3")
    assert(afterRestore.toSet == Set(
      ("doc://a", "a1", "insert"), ("doc://b", "b1", "insert")))

    // a restore spanning PARTIAL overlap: drop doc://b again by
    // restoring to v0 — only the net difference streams
    mtf.restore(0L)                               // v4
    val afterBack = drain(tbl, ckpt, "cdf_rst4")
    assert(afterBack.toSet == Set(("doc://b", "b1", "delete")))
  }

  test("startingVersion skips history; maxVersionsPerBatch paces batches") {
    val tbl = freshPath("graft-cdf-sv") + "/t"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    store.upsert(chunksOf("doc://old", "o1"))     // v0
    store.upsert(chunksOf("doc://new", "n1"))     // v1
    store.upsert(chunksOf("doc://new2", "n2"))    // v2

    // start past v0: the old document never streams
    val fromV0 = drain(tbl, freshPath("graft-cdf-sv-ck"), "cdf_sv",
      Map("startingVersion" -> "0"))
    assert(fromV0.map(_._1).toSet == Set("doc://new", "doc://new2"))

    // rate limit: one version per micro-batch still drains everything
    // under AvailableNow (three one-version batches), same net rows
    val paced = drain(tbl, freshPath("graft-cdf-mv-ck"), "cdf_mv",
      Map("maxVersionsPerBatch" -> "1"))
    assert(paced.toSet == Set(
      ("doc://old", "o1", "insert"),
      ("doc://new", "n1", "insert"),
      ("doc://new2", "n2", "insert")))
  }

  test("startingTimestamp resolves to the commit clock") {
    val tbl = freshPath("graft-cdf-ts") + "/t"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    store.upsert(chunksOf("doc://old", "o1"))     // v0
    Thread.sleep(1100)                            // separate commit mtimes
    val cut = System.currentTimeMillis()
    store.upsert(chunksOf("doc://new", "n1"))     // v1
    val got = drain(tbl, freshPath("graft-cdf-ts-ck"), "cdf_ts",
      Map("startingTimestamp" -> cut.toString))
    assert(got.map(_._1) == Seq("doc://new"))
    intercept[Exception] {
      drain(tbl, freshPath("graft-cdf-ts-ck2"), "cdf_ts2",
        Map("startingTimestamp" -> cut.toString,
          "startingVersion" -> "0"))
    }
  }

  test("empty table yields no batch; a first commit then streams") {
    val tbl = freshPath("graft-cdf-empty") + "/t"
    val ckpt = freshPath("graft-cdf-empty-ck")
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    // no commits yet: the stream starts and terminates with nothing
    assert(drain(tbl, ckpt, "cdf_e1").isEmpty)
    store.upsert(chunksOf("doc://x", "x1"))
    assert(drain(tbl, ckpt, "cdf_e2").toSet ==
      Set(("doc://x", "x1", "insert")))
  }

  test("change feed speaks the EVOLVED schema: post-ALTER streams " +
      "carry the new column, pre-ALTER rows null-filled") {
    import org.apache.spark.sql.functions._
    val tbl = freshPath("graft-cdf-evo") + "/t"
    val ckpt = freshPath("graft-cdf-evo-ckpt")
    val store = new graft.sink.ChunkStore(spark, tbl,
      format = graft.sink.ManifestTableFormat.factory)
    store.upsert(chunksOf("doc://old", "before"))          // v0
    val mtf = new graft.sink.ManifestTableFormat(
      spark, tbl, store.schema)
    mtf.addColumn("lang", org.apache.spark.sql.types.StringType) // v1
    import spark.implicits._
    store.append(Seq((0, "after", Seq(1f), 1, "doc://new", "de"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url", "lang")
      .withColumn("embedding", col("embedding").cast("array<float>")))
    // a stream created NOW infers the evolved feed schema; the
    // snapshot batch carries pre-ALTER rows with lang = NULL
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Option[String], String)]()
    val q = spark.readStream.format("graft-cdf").option("path", tbl)
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("document_url", "lang", "_change_type").collect()
          .foreach(r => buf.add(
            (r.getString(0), Option(r.getString(1)), r.getString(2))))
      }
      .queryName("cdf_evo")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(buf.asScala.toSet == Set(
      ("doc://old", None, "insert"),
      ("doc://new", Some("de"), "insert")), buf.asScala.toSet)
  }

  test("spans crossing ADD/RENAME/DROP COLUMN replay under the head " +
      "schema: null-fill for pre-ALTER rows, rename maps physically, " +
      "drop disappears — every restart drains exactly once") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StringType
    val tbl = freshPath("graft-cdf-ddlspan") + "/t"
    val ckpt = freshPath("graft-cdf-ddlspan-ckpt")
    val store = new graft.sink.ChunkStore(spark, tbl,
      format = graft.sink.ManifestTableFormat.factory)
    val mtf = new graft.sink.ManifestTableFormat(spark, tbl, store.schema)

    def drainCols(cols: String*): Seq[Seq[Option[String]]] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        Seq[Option[String]]]()
      val q = spark.readStream.format("graft-cdf").option("path", tbl)
        .load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select(cols.map(c => col(c).cast("string")): _*).collect()
            .foreach(r => buf.add(
              cols.indices.map(i => Option(r.getString(i)))))
        }
        .queryName("cdf_ddlspan")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq
    }

    store.upsert(chunksOf("doc://a", "t-a"))                       // v0
    assert(drainCols("document_url", "_change_type").toSet ==
      Set(Seq(Some("doc://a"), Some("insert"))))

    // span crossing ADD COLUMN: the restarted stream speaks the head
    // schema; the pre-ALTER row from the SAME span null-fills
    mtf.addColumn("lang", StringType)                              // v1
    import spark.implicits._
    store.upsert(chunksOf("doc://b", "t-b"))                       // v2
    store.append(Seq((0, "t-c", Seq(1f), 1, "doc://c", "de"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url", "lang")
      .withColumn("embedding", col("embedding").cast("array<float>")))
    val addSpan = drainCols("document_url", "lang", "_change_type")
    assert(addSpan.toSet == Set(
      Seq(Some("doc://b"), None, Some("insert")),
      Seq(Some("doc://c"), Some("de"), Some("insert"))), addSpan)

    // span crossing RENAME: physical column mapping keeps pre-rename
    // DATA readable under the new name — both commits' rows carry it
    mtf.renameColumn("chunk_text", "body")
    store.upsert(chunksOf("doc://a", "t-a2")
      .withColumnRenamed("chunk_text", "body")
      .withColumn("lang", lit(null).cast("string")))
    val renSpan = drainCols("document_url", "body", "_change_type")
    // doc://a rewrite: old row out (its PRE-RENAME text readable as
    // `body`), new row in
    assert(renSpan.toSet == Set(
      Seq(Some("doc://a"), Some("t-a"), Some("delete")),
      Seq(Some("doc://a"), Some("t-a2"), Some("insert"))), renSpan)

    // span crossing DROP: the dropped column is gone from the feed;
    // rows whose only difference was the dropped value cancel in the
    // exceptAll under the head schema (documented net-delta algebra)
    mtf.dropColumn("lang")
    store.upsert(chunksOf("doc://d", "t-d")
      .withColumnRenamed("chunk_text", "body"))
    val dropSpan = drainCols("document_url", "body", "_change_type")
    assert(dropSpan.toSet ==
      Set(Seq(Some("doc://d"), Some("t-d"), Some("insert"))), dropSpan)
    // the feed schema no longer knows `lang` (a non-empty span, so
    // the consumer's select actually evaluates)
    store.upsert(chunksOf("doc://e", "t-e")
      .withColumnRenamed("chunk_text", "body"))
    val err = intercept[Exception] { drainCols("lang") }
    assert(Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(t =>
        Option(t.getMessage).exists(_.contains("lang"))))
  }

  test("staged-delta reader null-fills columns the staged file lacks " +
      "(replay of a pre-ALTER batch under the evolved feed schema)") {
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    // a group written under the OLD schema (no `lang` field)
    val oldType = MessageTypeParser.parseMessageType(
      """message chunk {
        |  optional int32 chunk_id;
        |  optional binary chunk_text (UTF8);
        |}""".stripMargin)
    val g = new SimpleGroupFactory(oldType).newGroup()
    g.add("chunk_id", 7)
    g.add("chunk_text", "hello")
    val evolved = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("chunk_text",
        org.apache.spark.sql.types.StringType)))
    val row = graft.streaming.ChangeFeedReaderFactory.toRow(g, evolved)
    assert(row.getInt(0) == 7)
    assert(row.isNullAt(1), "absent column must read NULL")
    assert(row.getUTF8String(2).toString == "hello")
  }

  test("startingTimestamp resolves ONCE per query: the pinned version " +
      "survives a restart even if commit mtimes later shift") {
    val meta = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("graft-cdf-pin").toString,
      "graft-starting-version")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // first resolution pins; a later re-creation of the stream (query
    // restart) must read the pin back, not re-resolve against the
    // now-mutated clock (vacuumed history dates by checkpoint mtime)
    assert(graft.streaming.GraftChangeFeedStream
      .pinnedLong(fs, meta, () => 5L) == 5L)
    assert(graft.streaming.GraftChangeFeedStream
      .pinnedLong(fs, meta, () => 99L) == 5L)
  }
}
