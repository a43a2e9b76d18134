package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sink.{ChunkStore, ManifestTableFormat}

/** The DSv2 STREAMING_WRITE path ([[graft.streaming.GraftStreamingWrite]]):
  * `writeStream.format("graft")` now routes through
  * `SupportsWrite` + `STREAMING_WRITE` — executor tasks stage parquet
  * directly (no driver re-write), the epoch commit is one atomic
  * adds+marker log entry via `commitStagedStream`, and the whole V1
  * `Sink.addBatch` seam is bypassed. Pins: V2 routing is observable
  * (staged files live under `data/stream-*`, never `data/batch-*`),
  * exactly-once across checkpoint restarts and fresh checkpoints with
  * an explicit appId, empty-batch markers, partition-column bootstrap
  * + clustering + mismatch refusal via the `partitionColumns` option
  * (the V2 twin of the V1 seam's `.partitionBy`), and
  * `writeStream.toTable` onto a catalog table (V2-only — the V1 seam
  * never reached catalog identifiers).
  */
class StreamWriterV2Spec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graft-swv2").toString

  private def chunkify(df: DataFrame): DataFrame =
    df.select(lit(0).as("chunk_id"), col("text").as("chunk_text"),
      array(lit(1f)).as("embedding"), lit(0).as("page_number"),
      col("url").as("document_url"))

  private def drain(src: DataFrame, path: String, ck: String,
      app: Option[String] = None,
      parts: Option[String] = None): Unit = {
    val w0 = src.writeStream.format("graft")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val w1 = app.fold(w0)(a => w0.option("appId", a))
    val w = parts.fold(w1)(p => w1.option("partitionColumns", p))
    val q = w.start(path)
    try q.awaitTermination() finally if (q.isActive) q.stop()
  }

  test("V2 routing is real: micro-batches stage under data/stream-* " +
      "(executor-written parquet), commit exactly-once across " +
      "restarts, and markers land") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    val path = s"$root/t"
    val ckpt = s"$root/ckpt"
    val input = MemoryStream[(String, String)]
    val source = chunkify(input.toDF().toDF("text", "url"))

    input.addData(("a", "doc://1"), ("b", "doc://2"))
    drain(source, path, ckpt)
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    assert(store.read().count() == 2)

    // THE routing pin: the V1 seam stages under data/batch-* (driver
    // df.write); the DSv2 task writers stage under data/stream-*. If
    // this ever reads batch-*, the STREAMING_WRITE claim regressed to
    // the V1 path silently.
    val files = store.read().inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("/stream-")),
      s"expected every live file under data/stream-*, got:\n${
        files.mkString("\n")}")

    // same checkpoint, nothing new: no-op; batch ids advance
    drain(source, path, ckpt)
    assert(store.read().count() == 2)
    input.addData(("c", "doc://3"))
    drain(source, path, ckpt)
    assert(store.read().count() == 3)
    assert(store.read().select("chunk_text").as[String].collect()
      .sorted.toSeq == Seq("a", "b", "c"))

    // the commit is log-native: txn marker recorded, time travel works
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    assert(mtf.streamTransactions.nonEmpty,
      "V2 epoch commit must record the (appId, batchId) marker")

    // explicit appId + FRESH checkpoint: batch 0 re-delivers and the
    // marker no-ops it (restart-no-duplicates on the DSv2 path)
    val input2 = MemoryStream[(String, String)]
    input2.addData(("x", "doc://9"))
    val src2 = chunkify(input2.toDF().toDF("text", "url"))
    drain(src2, path, s"$root/ck-a", app = Some("pipe"))
    drain(src2, path, s"$root/ck-b", app = Some("pipe"))
    assert(store.read().filter(col("document_url") === "doc://9")
      .count() == 1, "fresh checkpoint + same appId must not duplicate")
  }

  test("empty micro-batches still commit their marker (replay of an " +
      "empty epoch stays unambiguous)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    val path = s"$root/t"
    val input = MemoryStream[(String, String)]
    val source = chunkify(input.toDF().toDF("text", "url"))
      .filter(lit(false)) // every batch empty
    input.addData(("a", "doc://1"))
    drain(source, path, s"$root/ck", app = Some("app"))
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    assert(store.read().count() == 0)
    assert(mtf.streamTransactions == Seq("app" -> 0L),
      s"empty epoch must still commit its marker, got ${
        mtf.streamTransactions}")
    // the marker makes a fresh-checkpoint batch 0 with REAL rows a
    // no-op — exactly the empty-batch ambiguity the marker closes
    val input2 = MemoryStream[(String, String)]
    input2.addData(("b", "doc://2"))
    drain(chunkify(input2.toDF().toDF("text", "url")), path,
      s"$root/ck2", app = Some("app"))
    assert(store.read().count() == 0)
  }

  test("partitionColumns option: V2 bootstrap records c37q partition " +
      "columns, every batch range-clusters (value-contiguous files), " +
      "and a contradicting declaration refuses") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    val path = s"$root/pt"
    val input = MemoryStream[(String, String)]
    val source = chunkify(input.toDF().toDF("text", "url"))
      .withColumn("page_number",
        (length(col("chunk_text")) % 4).cast("int"))
    input.addData(("a", "doc://1"), ("bb", "doc://2"),
      ("ccc", "doc://3"), ("dddd", "doc://4"))
    drain(source, path, s"$root/ck-1", parts = Some("page_number"))

    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    assert(mtf.partitionColumns == Seq("page_number"),
      s"bootstrap must record the declaration, got ${
        mtf.partitionColumns}")
    assert(store.read().count() == 4)

    // range clustering (RequiresDistributionAndOrdering): each staged
    // file covers ONE contiguous page_number range — with 4 distinct
    // values across tasks, every file is single-valued, so partition
    // predicates prune to a strict file subset
    val perFile = store.read().inputFiles.toSeq.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("page_number"), max("page_number")).head()
      (r.getInt(0), r.getInt(1))
    }
    assert(perFile.forall { case (lo, hi) => lo == hi },
      s"files must be value-contiguous under range clustering: $perFile")

    // a restarted query with NO declaration keeps writing (recorded
    // columns cluster every batch regardless)
    input.addData(("eeeee", "doc://5"))
    drain(source, path, s"$root/ck-1")
    assert(store.read().count() == 5)

    // contradiction refuses (same c37q message as every other seam)
    val t = intercept[Exception] {
      val q = source.writeStream.format("graft")
        .option("partitionColumns", "chunk_id")
        .option("checkpointLocation", s"$root/ck-3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(path)
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    val msg = Iterator.iterate(t: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(c => Option(c.getMessage))
      .mkString("\n")
    assert(msg.contains("partition columns"), msg)
  }

  test("commitStagedStream: two committers racing the SAME epoch — " +
      "exactly one lands, the loser's staged files are reclaimed " +
      "eagerly") {
    import spark.implicits._
    val root = fresh()
    val path = s"$root/t"
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkify(
      Seq(("seed", "doc://0")).toDF("text", "url"))) // table exists
    def stage(mtf: ManifestTableFormat, tag: String): Seq[String] = {
      val dir = mtf.newStreamStagingDir()
      chunkify(Seq((s"$tag-a", s"doc://$tag-1"), (s"$tag-b", s"doc://$tag-2"))
        .toDF("text", "url"))
        .repartition(1).write.parquet(dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString)
    }
    val competitor = new ManifestTableFormat(spark, path, store.schema)
    val competitorFiles = stage(competitor, "win")
    var injected = false
    val victim = new ManifestTableFormat(spark, path, store.schema) {
      override protected def beforeCommit(): Unit =
        if (!injected) {
          injected = true
          assert(competitor.commitStagedStream(
            competitorFiles, "app", 5L))
        }
    }
    val victimFiles = stage(victim, "lose")
    assert(!victim.commitStagedStream(victimFiles, "app", 5L),
      "the losing replay must detect the winner's marker and abort")
    // exactly the winner's rows landed
    assert(store.read().count() == 3)
    assert(store.read().filter(col("chunk_text").startsWith("lose"))
      .isEmpty, "the loser's rows must not be visible")
    // the loser's staged files were deleted eagerly (no vacuum debt)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    victimFiles.foreach(f =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(f)),
        s"loser's staged file survived: $f"))
    // replay of the same epoch on a fresh instance also no-ops
    val replay = new ManifestTableFormat(spark, path, store.schema)
    val replayFiles = stage(replay, "replay")
    assert(!replay.commitStagedStream(replayFiles, "app", 5L))
    assert(store.read().count() == 3)
  }

  test("EXISTING-table toTable lane: streaming epochs range-cluster " +
      "on the table's recorded partition columns (value-contiguous " +
      "staged files)") {
    // The bootstrap-lane clustering pin above goes through
    // GraftDataSource's eager write; THIS lane goes through the
    // catalog WriteBuilder, whose RequiresDistributionAndOrdering
    // delegates to the streaming write built by toStreaming — an
    // ordering V2Writes happens to guarantee in Spark 4.1.2 but no
    // contract does. If a Spark upgrade reorders the rule and
    // clustering silently drops, these files stop being
    // single-valued and this test fails loudly.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    spark.conf.set("spark.sql.catalog.swv2c",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.swv2c.warehouse", root)
    spark.sql("CREATE TABLE swv2c.pt (k INT, v STRING) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('format'='manifest')")

    val input = MemoryStream[(Int, String)]
    // 12 rows over 3 distinct k, interleaved so an unclustered write
    // would stage multi-valued files with near-certainty
    input.addData((0 until 12).map(i => (i % 3, s"v$i")): _*)
    val q = input.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("swv2c.pt")
    try q.awaitTermination() finally if (q.isActive) q.stop()

    assert(spark.sql("SELECT count(*) FROM swv2c.pt").head().getLong(0)
      == 12)
    // live files from the manifest itself (a catalog-table scan's
    // inputFiles is empty by design — DSv2 wrapper)
    val mtf = new ManifestTableFormat(spark, s"$root/pt",
      spark.table("swv2c.pt").schema)
    val perFile = mtf.liveFilesWithDv.map(_._1).map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).head()
      (r.getInt(0), r.getInt(1))
    }
    assert(perFile.size >= 3, s"expected >=3 clustered files: $perFile")
    assert(perFile.forall { case (lo, hi) => lo == hi },
      "staged files must be value-contiguous under streaming range " +
        s"clustering: $perFile")
  }

  test("writeStream.toTable onto a catalog manifest table (V2-only " +
      "surface) — exactly-once, CHECK constraints enforce on the " +
      "staged batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = fresh()
    spark.conf.set("spark.sql.catalog.swv2",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.swv2.warehouse", root)
    spark.sql("CREATE TABLE swv2.t (k INT, v STRING) " +
      "TBLPROPERTIES ('format'='manifest')")
    spark.sql("CALL swv2.add_constraint('t', 'pos', 'k >= 0')")

    val input = MemoryStream[(Int, String)]
    val src = input.toDF().toDF("k", "v")
    def drainTable(ck: String): Unit = {
      val q = src.writeStream
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("swv2.t")
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    input.addData((1, "a"), (2, "b"))
    drainTable(s"$root/ck")
    assert(spark.sql("SELECT count(*) FROM swv2.t").head().getLong(0) == 2)
    // restart from the same checkpoint: no duplicates
    drainTable(s"$root/ck")
    assert(spark.sql("SELECT count(*) FROM swv2.t").head().getLong(0) == 2)

    // a violating batch fails the epoch commit and commits NOTHING
    // (constraints evaluate over the staged files before the log add)
    input.addData((-7, "bad"), (3, "good"))
    val t = intercept[Exception] { drainTable(s"$root/ck") }
    val msg = Iterator.iterate(t: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(c => Option(c.getMessage))
      .mkString("\n")
    assert(msg.contains("CHECK constraint"), msg)
    assert(spark.sql("SELECT count(*) FROM swv2.t").head().getLong(0) == 2,
      "the violating epoch must leave the table untouched")
  }
}
