package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{AutoOptimize, IndexSync, VectorIndex}
import graft.pipeline.IncrementalAgg
import graft.sink.{ChunkStore, ManifestTableFormat}

/** `CALL auto_optimize` / `graft.ops.AutoOptimize` — the log-stats
  * maintenance policy. One call on a churned table must run exactly
  * the needed subset (DV purge, recluster-or-compact, index + agg
  * catch-up, vacuum dry run) and converge the table to a clean state;
  * a second call must find nothing to do.
  */
class AutoOptimizeSpec extends SparkSpec {

  private def freshCatalog(n: String): (String, String) = {
    val cat = s"autoopt$n"
    val wh = Files.createTempDirectory(s"graft-autoopt-$n").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def rows(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, s"text-$i", Seq(1f, i.toFloat, 0f, 1f),
        i % 10, s"doc://$i"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url")
  }

  test("a churned table converges in ONE call; the second call " +
      "finds nothing to do") {
    val (cat, wh) = freshCatalog("1")
    val tbl = s"$wh/chunks"
    val idx = Files.createTempDirectory("graft-autoopt-idx").toString + "/ix"
    val agg = s"$wh/chunks_by_page"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, tbl, store.schema)

    // healthy baseline: data, a recorded z-order spec, a synced
    // index, a bootstrapped agg table
    store.append(rows(0 until 40))
    mtf.compactZorder(Seq("page_number"))
    assert(mtf.clusterSpec.exists(_._1 == Seq("page_number")))
    VectorIndex.buildIvfPq(
      store.read().select(
        IndexSync.contentAddressedId(
          Seq(col("document_url"), col("chunk_id")),
          Seq(col("embedding"))).as("vid"),
        col("embedding").as("v")),
      idx, "vid", "v", nlist = 4, m = 2, ks = 4)
    IndexSync.markSynced(spark, idx, mtf.version)
    IncrementalAgg.catchUp(spark, tbl, agg,
      Seq("page_number"), Seq("chunk_id"))

    // churn: small-file appends dilute the curve, DV deletes pile
    // merge-on-read debt, the index and agg fall behind
    (0 until 4).foreach(k =>
      store.append(rows(40 + k * 10 until 50 + k * 10)))
    spark.conf.set("spark.graft.deletionVectors", "true")
    try store.deleteWhere(col("page_number") === 1)
    finally spark.conf.set("spark.graft.deletionVectors", "false")
    val pre = mtf.maintenanceStats(
      ManifestTableFormat.defaultTargetFileBytes)
    assert(pre.dvFiles > 0, "churn must have produced DV debt")
    assert(mtf.newFileFraction(mtf.clusterSpec.get._2) >= 0.3,
      "churn must have diluted the recorded clustering")

    val r1 = spark.sql(s"CALL $cat.auto_optimize('chunks', '$idx', " +
      "'', 'chunks_by_page')").collect().head
    assert(r1.getLong(2) > 0L, s"DV purge expected: $r1") // dv purged
    assert(r1.getLong(4) == 1L, s"recluster expected: $r1")
    assert(r1.getLong(5) > 0L, s"index appends expected: $r1")
    assert(r1.getLong(6) > 0L, s"index tombstones expected: $r1")
    assert(r1.getLong(7) > 0L, s"agg groups expected: $r1")
    val acts = r1.getString(10)
    Seq("rewrite_dvs", "recluster", "sync_index", "sync_agg")
      .foreach(a => assert(acts.contains(a), s"missing $a in: $acts"))

    // converged: no DV debt, curve fresh, derived artifacts at head
    val post = mtf.maintenanceStats(
      ManifestTableFormat.defaultTargetFileBytes)
    assert(post.dvFiles == 0L)
    assert(mtf.newFileFraction(mtf.clusterSpec.get._2) == 0.0)
    assert(IndexSync.lastSynced(spark, idx) == mtf.version)
    // the agg equals a from-scratch recompute of the live table
    val recomputed = store.read().groupBy("page_number")
      .agg(count(lit(1)).as("cnt"), sum("chunk_id").as("s"),
        count("chunk_id").as("nn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val held = new ChunkStore(spark, agg,
        format = ManifestTableFormat.factory).read()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(held == recomputed)

    // idempotent: nothing left to do (vacuum stays report-only, so
    // its reclaimable counts MAY remain non-zero — by design)
    val r2 = spark.sql(s"CALL $cat.auto_optimize('chunks', '$idx', " +
      "'', 'chunks_by_page')").collect().head
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L &&
      r2.getLong(4) == 0L && r2.getLong(5) == 0L &&
      r2.getLong(6) == 0L && r2.getLong(7) == 0L,
      s"second call must be a no-op: $r2")
    assert(r2.getLong(8) > 0L,
      "dry-run must still REPORT the reclaimable bytes it never deletes")
  }

  test("small-file compaction path (no clustering spec): >=4 small " +
      "files compact; fewer do not") {
    val tbl = Files.createTempDirectory("graft-autoopt-sf").toString + "/t"
    val store = new ChunkStore(spark, tbl,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, tbl, store.schema)
    (0 until 3).foreach(k => store.append(rows(k * 10 until k * 10 + 10)))
    val filesBefore = mtf.liveFiles.size
    assert(filesBefore >= 4)
    val r = AutoOptimize.run(spark, tbl)
    assert(r.filesCompacted > 0 && !r.reclustered, r)
    assert(mtf.liveFiles.size < filesBefore)
    // now under the threshold: second run leaves the layout alone
    val r2 = AutoOptimize.run(spark, tbl)
    assert(r2.filesCompacted == 0L, r2)
  }

  test("agg spec derives from the agg table alone; a foreign agg " +
      "table refuses") {
    val d = Files.createTempDirectory("graft-autoopt-spec").toString
    val store = new ChunkStore(spark, s"$d/src",
      format = ManifestTableFormat.factory)
    store.append(rows(0 until 20))
    IncrementalAgg.catchUp(spark, s"$d/src", s"$d/agg",
      Seq("page_number"), Seq("chunk_id"),
      minCols = Seq("chunk_id"), maxCols = Seq("chunk_id"))
    val spec = IncrementalAgg.specOf(spark, s"$d/agg")
    assert(spec.contains((s"$d/src", Seq("page_number"),
      Seq("chunk_id"), Seq("chunk_id"), Seq("chunk_id"))))
    // a non-agg manifest table has no marker → None → refusal
    assert(IncrementalAgg.specOf(spark, s"$d/src").isEmpty)
    intercept[IllegalArgumentException] {
      AutoOptimize.run(spark, s"$d/src", aggPaths = Seq(s"$d/src"))
    }
    // an agg table following a DIFFERENT source refuses loudly
    val other = new ChunkStore(spark, s"$d/other",
      format = ManifestTableFormat.factory)
    other.append(rows(0 until 5))
    intercept[IllegalArgumentException] {
      AutoOptimize.run(spark, s"$d/other", aggPaths = Seq(s"$d/agg"))
    }
  }
}
