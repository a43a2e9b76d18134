package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{IndexSync, VectorIndex}
import graft.sink.{ChunkStore, ManifestTableFormat}

/** D3i: a persistent IVF-PQ index follows a manifest table through
  * the change feed — upserts re-point, deletes stop serving, identical
  * re-inserts revive, and replaying any span appends nothing twice.
  */
class IndexSyncSpec extends SparkSpec {

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def chunkOf(url: String, vec: Seq[Float], text: String): DataFrame = {
    import spark.implicits._
    Seq((0, text, vec, 1, url))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url")
  }

  /** Content-addressed index rows: id moves when the embedding does. */
  private def prepare(rows: DataFrame): DataFrame =
    rows.select(
      IndexSync.contentAddressedId(
        Seq(col("document_url"), col("chunk_id")),
        Seq(col("embedding"))).as("vid"),
      col("embedding").as("v"))

  private def served(idxPath: String, probe: Seq[Float]): Seq[String] = {
    import spark.implicits._
    val probes = Seq(("p", probe)).toDF("vid", "v")
    VectorIndex.queryIvfPq(spark, idxPath, probes, k = 10,
        nprobe = 2, rerankPerProbe = 64)
      .select("nn_id").collect().map(_.getString(0)).toSeq
  }

  test("index follows the table: upsert, delete, revive, replay") {
    val tbl = fresh("graft-isync-tbl") + "/t"
    val idx = fresh("graft-isync-idx") + "/ix"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, tbl, store.schema)

    val va = Seq(1f, 0f, 0f, 0f)
    val vb = Seq(0f, 1f, 0f, 0f)
    val vc = Seq(0f, 0f, 1f, 0f)
    store.upsert(chunkOf("doc://a", va, "a"))
    store.upsert(chunkOf("doc://b", vb, "b"))
    store.upsert(chunkOf("doc://c", vc, "c"))

    VectorIndex.buildIvfPq(prepare(store.read()), idx, "vid", "v",
      nlist = 2, m = 2, ks = 4)
    IndexSync.markSynced(spark, idx, mtf.version)
    assert(IndexSync.lastSynced(spark, idx) == mtf.version)

    // a no-op catch-up does nothing
    assert(IndexSync.catchUp(spark, tbl, idx, prepare) ==
      IndexSync.Stats(mtf.version, mtf.version, 0L, 0L))

    // new doc d, rewritten a (vector moves), deleted b
    val vd = Seq(0f, 0f, 0f, 1f)
    val va2 = Seq(0.9f, 0.1f, 0f, 0f)
    store.upsert(chunkOf("doc://d", vd, "d"))
    store.upsert(chunkOf("doc://a", va2, "a2"))
    store.delete(Seq("doc://b"))
    val s1 = IndexSync.catchUp(spark, tbl, idx, prepare)
    assert(s1.appended == 2L, s1)   // d + rewritten a
    assert(s1.tombstoned == 2L, s1) // old a + b

    val all = served(idx, vd)
    assert(all.exists(_.startsWith("doc://d#")), all)
    assert(all.exists(_.startsWith("doc://a#")), all)
    assert(!all.exists(_.startsWith("doc://b#")), all)
    // the rewritten doc serves its NEW id only (old content id is gone)
    val aIds = all.filter(_.startsWith("doc://a#"))
    assert(aIds.size == 1, all)

    // idempotence: catching up again applies nothing
    val s2 = IndexSync.catchUp(spark, tbl, idx, prepare)
    assert(s2.appended == 0L && s2.tombstoned == 0L, s2)

    // full replay (lost sync record) converges without duplicates,
    // and earlier tombstones survive the replay's revive rewrite
    // (the rewrite must keep the sidecar's schema — a renamed column
    // reads back as nulls and silently serves every deleted id)
    IndexSync.markSynced(spark, idx, -1L)
    val s3 = IndexSync.catchUp(spark, tbl, idx, prepare)
    assert(s3.appended == 0L && s3.tombstoned == 0L, s3)
    val replayed = served(idx, vd)
    assert(replayed.count(_.startsWith("doc://d#")) == 1)
    assert(!replayed.exists(_.startsWith("doc://b#")), replayed)
    assert(replayed.count(_.startsWith("doc://a#")) == 1, replayed)

    // delete d, then re-insert it with IDENTICAL content: the revive
    // path must unmask the same physical rows (nothing re-appended)
    store.delete(Seq("doc://d"))
    val s4 = IndexSync.catchUp(spark, tbl, idx, prepare)
    assert(s4.tombstoned == 1L, s4)
    val afterDelete = served(idx, vd)
    assert(!afterDelete.exists(_.startsWith("doc://d#")), afterDelete)
    assert(!afterDelete.exists(_.startsWith("doc://b#")), afterDelete)
    store.upsert(chunkOf("doc://d", vd, "d"))
    val s5 = IndexSync.catchUp(spark, tbl, idx, prepare)
    assert(s5.appended == 0L && s5.tombstoned == 0L, s5)
    assert(served(idx, vd).exists(_.startsWith("doc://d#")))
  }

  test("text index follows the table: upsert, delete, revive, replay") {
    import graft.ops.TextIndex
    val tbl = fresh("graft-tsync-tbl") + "/t"
    val idx = fresh("graft-tsync-idx") + "/ix"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, tbl, store.schema)
    def doc(url: String, text: String) =
      chunkOf(url, Seq(1f, 0f, 0f, 0f), text)
    store.upsert(doc("doc://a", "apples and oranges"))
    store.upsert(doc("doc://b", "bananas and apples"))
    val tprep = (rows: DataFrame) => rows.select(
      graft.ops.IndexSync.contentAddressedId(
        Seq(col("document_url"), col("chunk_id")),
        Seq(col("chunk_text"))).as("tid"),
      col("chunk_text").as("text"))
    TextIndex.build(tprep(store.read()), idx, "tid", "text")
    IndexSync.markSynced(spark, idx, mtf.version)

    def hits(term: String): Seq[String] =
      TextIndex.query(spark, idx, Seq(term), k = 10)
        .select("doc_id").collect().map(_.getString(0)).toSeq

    // churn: new doc, rewritten a, deleted b
    store.upsert(doc("doc://c", "cherries everywhere"))
    store.upsert(doc("doc://a", "apples replaced by pears"))
    store.delete(Seq("doc://b"))
    val s1 = IndexSync.catchUpText(spark, tbl, idx, tprep)
    assert(s1.appended == 2L && s1.tombstoned == 2L, s1)
    assert(hits("cherries").exists(_.startsWith("doc://c#")))
    assert(hits("pears").exists(_.startsWith("doc://a#")))
    assert(!hits("oranges").exists(_.startsWith("doc://a#")))
    assert(!hits("bananas").exists(_.startsWith("doc://b#")))
    // stamped BM25 stats track the live corpus exactly: a(rewritten)
    // and c live; b deleted
    assert(TextIndex.load(spark, idx).docCount == 2.0)

    // idempotent + full replay converges
    val s2 = IndexSync.catchUpText(spark, tbl, idx, tprep)
    assert(s2.appended == 0L && s2.tombstoned == 0L, s2)
    IndexSync.markSynced(spark, idx, -1L)
    val s3 = IndexSync.catchUpText(spark, tbl, idx, tprep)
    assert(s3.appended == 0L && s3.tombstoned == 0L, s3)
    assert(!hits("bananas").exists(_.startsWith("doc://b#")))

    // delete + identical re-insert: revive unmasks, stats recount
    store.delete(Seq("doc://c"))
    val s4 = IndexSync.catchUpText(spark, tbl, idx, tprep)
    assert(s4.tombstoned == 1L, s4)
    assert(hits("cherries").isEmpty)
    assert(TextIndex.load(spark, idx).docCount == 1.0)
    store.upsert(doc("doc://c", "cherries everywhere"))
    val s5 = IndexSync.catchUpText(spark, tbl, idx, tprep)
    assert(s5.appended == 0L && s5.tombstoned == 0L, s5)
    assert(hits("cherries").exists(_.startsWith("doc://c#")))
    assert(TextIndex.load(spark, idx).docCount == 2.0)
  }

  test("a held sync lock refuses a second catch-up, release admits it") {
    val tbl = fresh("graft-isync-lock") + "/t"
    val idx = fresh("graft-isync-lock-idx") + "/ix"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    store.upsert(chunkOf("doc://a", Seq(1f, 0f, 0f, 0f), "a"))
    VectorIndex.buildIvfPq(prepare(store.read()), idx, "vid", "v",
      nlist = 2, m = 2, ks = 4)
    IndexSync.markSynced(spark, idx, 0L)
    val lock = new org.apache.hadoop.fs.Path(idx + "/_sync_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lock, false).close()
    val e = intercept[IllegalStateException] {
      IndexSync.catchUp(spark, tbl, idx, prepare)
    }
    assert(e.getMessage.contains("_sync_lock"))
    fs.delete(lock, false)
    // released: the catch-up runs (no-op span) and removes its lock
    IndexSync.catchUp(spark, tbl, idx, prepare)
    assert(!fs.exists(lock))
  }

  test("a STALE sync lock (hard-killed holder) is taken over") {
    val tbl = fresh("graft-isync-stale") + "/t"
    val idx = fresh("graft-isync-stale-idx") + "/ix"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    store.upsert(chunkOf("doc://a", Seq(1f, 0f, 0f, 0f), "a"))
    VectorIndex.buildIvfPq(prepare(store.read()), idx, "vid", "v",
      nlist = 2, m = 2, ks = 4)
    IndexSync.markSynced(spark, idx, 0L)
    val lock = new org.apache.hadoop.fs.Path(idx + "/_sync_lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lock, false).close()
    // age the lock past the staleness bound: an OOM/SIGKILL'd sync
    // can never delete its own lock, and without takeover every later
    // catchUp / CALL sync_index would wedge until manual cleanup
    val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    fs.setTimes(lock, old, old)
    IndexSync.catchUp(spark, tbl, idx, prepare) // takes over, runs
    assert(!fs.exists(lock))
  }

  test("catchUpText heals a torn append instead of double-counting") {
    import graft.ops.TextIndex
    val tbl = fresh("graft-tsync-torn") + "/t"
    val idx = fresh("graft-tsync-torn-idx") + "/ix"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, tbl, store.schema)
    def doc(url: String, text: String) =
      chunkOf(url, Seq(1f, 0f, 0f, 0f), text)
    val tprep = (rows: DataFrame) => rows.select(
      IndexSync.contentAddressedId(
        Seq(col("document_url"), col("chunk_id")),
        Seq(col("chunk_text"))).as("tid"),
      col("chunk_text").as("text"))
    store.upsert(doc("doc://a", "apples and oranges"))
    TextIndex.build(tprep(store.read()), idx, "tid", "text")
    IndexSync.markSynced(spark, idx, mtf.version)

    // new doc commits to the TABLE; now simulate a hard-killed sync
    // that crashed between its postings write and its doclen write:
    // the batch's postings landed, the doclen existence anchor did
    // not, and the pending marker names the touched buckets
    store.upsert(doc("doc://c", "cherries and apples"))
    val tornId = tprep(store.read()
        .filter(col("document_url") === "doc://c"))
      .select("tid").collect().head.getString(0)
    val posts = spark.read.parquet(idx + "/postings")
    val appleTb = posts.filter(col("term") === "apples")
      .select("tb").collect().head.getInt(0)
    import spark.implicits._
    Seq((tornId, "apples", 1.0, Seq(1)), (tornId, "cherries", 1.0, Seq(0)))
      .toDF("doc_id", "term", "tf", "positions")
      .withColumn("tb", when(col("term") === "apples", appleTb)
        .otherwise(pmod(hash(col("term")),
          lit(TextIndex.load(spark, idx).numBuckets))))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("tb").parquet(idx + "/postings")
    val tornTbs = spark.read.parquet(idx + "/postings")
      .filter(col("doc_id") === tornId)
      .select("tb").distinct().collect().map(_.getInt(0)).sorted
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(idx + "/_append_pending"), true)
    out.write(tornTbs.mkString("\n").getBytes("UTF-8")); out.close()

    // the replay heals the orphans FIRST, then re-appends the batch
    // exactly once: without the heal, doc c's "apples"/"cherries"
    // term frequencies would double
    val s1 = IndexSync.catchUpText(spark, tbl, idx, tprep)
    assert(s1.appended == 1L, s1)
    val dup = spark.read.parquet(idx + "/postings")
      .groupBy("doc_id", "term").count().filter(col("count") > 1)
    assert(dup.isEmpty,
      s"duplicated postings: ${dup.collect().mkString(", ")}")
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(idx + "/_append_pending")))
    def hits(term: String) =
      TextIndex.query(spark, idx, Seq(term), k = 10)
        .select("doc_id").collect().map(_.getString(0)).toSeq
    assert(hits("cherries").exists(_.startsWith("doc://c#")))
    assert(hits("apples").count(_.nonEmpty) == 2)
    assert(TextIndex.load(spark, idx).docCount == 2.0)
    // no marker → heal is a no-op
    assert(!TextIndex.healTornAppend(spark, idx))
  }

  test("an index synced past the table fails loudly") {
    val tbl = fresh("graft-isync-bad") + "/t"
    val idx = fresh("graft-isync-bad-idx") + "/ix"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    store.upsert(chunkOf("doc://a", Seq(1f, 0f, 0f, 0f), "a"))
    VectorIndex.buildIvfPq(prepare(store.read()), idx, "vid", "v",
      nlist = 2, m = 2, ks = 4)
    IndexSync.markSynced(spark, idx, 99L)
    val e = intercept[IllegalArgumentException] {
      IndexSync.catchUp(spark, tbl, idx, prepare)
    }
    assert(e.getMessage.contains("synced past"))
  }
}
