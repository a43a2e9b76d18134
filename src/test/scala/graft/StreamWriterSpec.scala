package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sink.{ChunkStore, ManifestTableFormat}
import graft.streaming.StreamWriter

/** Exactly-once streaming appends into a manifest table: the
  * `(appId, batchId)` transaction marker commits atomically with the
  * batch's files, so foreachBatch's at-least-once replay converges
  * to each batch applied once — with no natural key on the rows
  * (the contract `ChangeFeedSync`'s idempotent merges cannot give).
  */
class StreamWriterSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-swr").toString

  private def chunkify(df: DataFrame): DataFrame =
    df.select(lit(0).as("chunk_id"), col("text").as("chunk_text"),
      array(lit(1f)).as("embedding"), lit(0).as("page_number"),
      col("url").as("document_url"))

  test("appendStream: a replayed (app, batch) no-ops; new batches land") {
    import spark.implicits._
    val path = s"${fresh()}/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val rows = chunkify(Seq(("a", "doc://1"), ("b", "doc://2"))
      .toDF("text", "url"))

    assert(mtf.appendStream(rows, "app1", 0L))
    assert(!mtf.appendStream(rows, "app1", 0L), "replay must no-op")
    assert(store.read().count() == 2)

    // an EARLIER batch id is also a replay (high-water mark, not set)
    assert(!mtf.appendStream(rows, "app1", -1L))
    assert(mtf.appendStream(rows, "app1", 1L))
    assert(store.read().count() == 4)

    // a different app is independent
    assert(mtf.appendStream(rows, "app2", 0L))
    assert(store.read().count() == 6)
  }

  test("empty batches still commit their marker") {
    import spark.implicits._
    val path = s"${fresh()}/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val empty = chunkify(Seq.empty[(String, String)].toDF("text", "url"))
    assert(mtf.appendStream(empty, "app", 0L))
    assert(!mtf.appendStream(empty, "app", 0L))
    val rows = chunkify(Seq(("a", "doc://1")).toDF("text", "url"))
    assert(!mtf.appendStream(rows, "app", 0L),
      "a replay of the empty batch must not re-apply different rows")
    assert(store.read().count() == 0)
  }

  test("markers survive checkpoint + vacuum (txn sidecar)") {
    import spark.implicits._
    val path = s"${fresh()}/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val rows = chunkify(Seq(("a", "doc://1")).toDF("text", "url"))
    assert(mtf.appendStream(rows, "app", 7L))
    mtf.checkpoint()
    mtf.vacuum()
    // the entry carrying the marker is gone; the sidecar holds it
    val reader = new ManifestTableFormat(spark, path, store.schema)
    assert(!reader.appendStream(rows, "app", 7L),
      "vacuum must not forget streaming transaction markers")
    assert(!reader.appendStream(rows, "app", 3L))
    assert(reader.appendStream(rows, "app", 8L))
    assert(store.read().count() == 2)
    assert(reader.streamTransactions == Seq("app" -> 8L))
  }

  test("two writers racing the SAME batch: exactly one data commit") {
    import spark.implicits._
    val path = s"${fresh()}/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val rows = chunkify(Seq(("a", "doc://1"), ("b", "doc://2"))
      .toDF("text", "url"))
    // the competitor commits the same (app, batch) INSIDE the victim's
    // race window (after staging, before its first commit attempt)
    val competitor = new ManifestTableFormat(spark, path, store.schema)
    var injected = false
    val victim = new ManifestTableFormat(spark, path, store.schema) {
      override protected def beforeCommit(): Unit =
        if (!injected) {
          injected = true
          assert(competitor.appendStream(rows, "app", 0L))
        }
    }
    assert(!victim.appendStream(rows, "app", 0L),
      "the losing replay must detect the winner's marker and abort")
    assert(store.read().count() == 2, "exactly one copy of the batch")
    // the loser's staged files were reclaimed eagerly (no garbage
    // waiting for vacuum)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listFiles(
      new org.apache.hadoop.fs.Path(path, "data"), true)
    var n = 0
    while (dataFiles.hasNext) {
      val st = dataFiles.next()
      if (st.isFile && st.getPath.getName.startsWith("part-")) n += 1
    }
    assert(n == store.read().inputFiles.length,
      "no orphaned staged files from the losing writer")
  }

  test("StreamWriter end-to-end: restart from the same checkpoint " +
      "replays without duplicates; appends keep flowing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    val path = s"$root/t"
    val ckpt = s"$root/ckpt"
    val input = MemoryStream[(String, String)]
    val source = chunkify(input.toDF().toDF("text", "url"))

    input.addData(("a", "doc://1"), ("b", "doc://2"))
    StreamWriter.sync(source, path, ckpt) // appId defaults to queryId
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    assert(store.read().count() == 2)

    // second drain from the SAME checkpoint: batch 0 must not replay
    input.addData(("c", "doc://3"))
    StreamWriter.sync(source, path, ckpt)
    assert(store.read().count() == 3)
    assert(store.read().select("chunk_text").as[String].collect().sorted
      .toSeq == Seq("a", "b", "c"))

    // and a THIRD drain with nothing new is a no-op
    StreamWriter.sync(source, path, ckpt)
    assert(store.read().count() == 3)
  }

  test("explicit appId shares a target across re-created queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    val path = s"$root/t"
    val input = MemoryStream[(String, String)]
    val source = chunkify(input.toDF().toDF("text", "url"))
    input.addData(("a", "doc://1"))
    StreamWriter.sync(source, path, s"$root/ckpt1", Some("pipe"))
    // a FRESH checkpoint restarts batch ids at 0 — with the same
    // explicit appId the marker makes the re-delivered batch a no-op
    val input2 = MemoryStream[(String, String)]
    input2.addData(("a", "doc://1"))
    StreamWriter.sync(chunkify(input2.toDF().toDF("text", "url")),
      path, s"$root/ckpt2", Some("pipe"))
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    assert(store.read().count() == 1,
      "same appId + fresh checkpoint must not duplicate batch 0")
  }

  test("native writeStream.format(\"graft\"): exactly-once across " +
      "checkpoint restarts; parity with StreamWriter on one target") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    val path = s"$root/t"
    val ckpt = s"$root/ckpt"
    val input = MemoryStream[(String, String)]
    val source = chunkify(input.toDF().toDF("text", "url"))
    def drain(ck: String, app: Option[String] = None): Unit = {
      val w = source.writeStream.format("graft")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = app.fold(w)(a => w.option("appId", a)).start(path)
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }

    input.addData(("a", "doc://1"), ("b", "doc://2"))
    drain(ckpt)
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    assert(store.read().count() == 2)

    // same checkpoint, nothing new: no-op; new data flows once
    drain(ckpt)
    assert(store.read().count() == 2)
    input.addData(("c", "doc://3"))
    drain(ckpt)
    assert(store.read().count() == 3)

    // the append was LOG-committed: time travel + txn marker exist
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    assert(mtf.version >= 1 && mtf.streamTransactions.nonEmpty)

    // explicit appId + FRESH checkpoint: batch 0 re-delivers, the
    // marker makes it a no-op (restart-no-duplicates, native path)
    val input2 = MemoryStream[(String, String)]
    input2.addData(("x", "doc://9"))
    val src2 = chunkify(input2.toDF().toDF("text", "url"))
    def drain2(ck: String): Unit = {
      val q = src2.writeStream.format("graft")
        .option("checkpointLocation", ck).option("appId", "pipe2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(path)
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    drain2(s"$root/ck-a")
    drain2(s"$root/ck-b")
    assert(store.read().filter(col("document_url") === "doc://9")
      .count() == 1, "fresh checkpoint + same appId must not duplicate")

    // StreamWriter (the wrapper) and the native sink share the same
    // marker protocol, so they compose on one target table
    val input3 = MemoryStream[(String, String)]
    input3.addData(("w", "doc://20"))
    StreamWriter.sync(chunkify(input3.toDF().toDF("text", "url")),
      path, s"$root/ck-w", Some("pipe3"))
    assert(store.read().count() == 5)

    // refusals: Complete mode; a partition declaration that
    // contradicts the EXISTING table's (empty) recorded partition
    // columns (on the DSv2 path the declaration rides the
    // partitionColumns option — the V2 seam does not forward
    // .partitionBy; the V1 seam's .partitionBy is pinned in the
    // disabledV2StreamingWriters test below)
    // (the V2 failure may surface on the stream thread — await it and
    // walk the cause chain rather than expecting a synchronous throw)
    def failMsg(start: => org.apache.spark.sql.streaming.StreamingQuery)
        : String = {
      val t = intercept[Exception] {
        val q = start
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .flatMap(c => Option(c.getMessage)).mkString("\n")
    }
    // either guard is fine: Spark's analyzer rejects Complete with no
    // aggregation up front; a query shape that reaches the sink hits
    // the builder's own Append-only refusal
    val m1 = failMsg(source.writeStream.format("graft")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ck-c").start(path))
    assert(m1.toLowerCase.contains("append") ||
      m1.toLowerCase.contains("output mode"), m1)
    val m2 = failMsg(source.writeStream.format("graft")
      .option("partitionColumns", "page_number")
      .option("checkpointLocation", s"$root/ck-d").start(path))
    assert(m2.contains("partition columns"), m2)
  }

  test("native sink .partitionBy bootstraps PARTITIONED BY (c37q) " +
      "semantics: recorded once, every batch clusters, mismatch " +
      "refuses (V1 seam, kept reachable via disabledV2StreamingWriters" +
      " — the V2 seam does not forward .partitionBy; its twin rides " +
      "the partitionColumns option, pinned in StreamWriterV2Spec)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.disabledV2Writers",
      classOf[graft.sources.GraftDataSource].getCanonicalName)
    try partitionByV1Body()
    finally spark.conf.unset("spark.sql.streaming.disabledV2Writers")
  }

  private def partitionByV1Body(): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    val path = s"$root/pt"
    val input = MemoryStream[(String, String)]
    val source = chunkify(input.toDF().toDF("text", "url"))
      .withColumn("page_number",
        (length(col("chunk_text")) % 4).cast("int"))
    def drain(ck: String, parts: Seq[String]): Unit = {
      val w = source.writeStream.format("graft")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = (if (parts.isEmpty) w else w.partitionBy(parts: _*))
        .start(path)
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    input.addData(("a", "doc://1"), ("bb", "doc://2"), ("ccc", "doc://3"),
      ("dddd", "doc://4"))
    drain(s"$root/ck-1", Seq("page_number"))
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    assert(mtf.partitionColumns == Seq("page_number"),
      "the sink's partitionBy must be recorded as the table's " +
        s"partition columns, got ${mtf.partitionColumns}")
    assert(store.read().count() == 4)

    // a restarted query with NO partitionBy keeps writing (the
    // recorded columns cluster every write regardless of declaration)
    input.addData(("eeeee", "doc://5"))
    drain(s"$root/ck-1", Nil)
    assert(store.read().count() == 5)
    // … but a CONTRADICTING declaration refuses loudly
    val e = intercept[Exception] {
      source.writeStream.format("graft").partitionBy("chunk_id")
        .option("checkpointLocation", s"$root/ck-3").start(path)
    }
    assert(e.getMessage.contains("partition columns"), e.getMessage)
  }
}
