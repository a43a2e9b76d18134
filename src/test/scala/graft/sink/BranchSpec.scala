package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Branches + write-audit-publish on the manifest format (the
  * Iceberg branch / Delta WAP idea): a branch is a self-contained
  * fork of the commit log under `_log/branches/<name>/` sharing the
  * table's `data/` namespace, so fastForward is one atomic metadata
  * commit of the branch's NET actions. Pins: isolation in both
  * directions, net add/rm cancellation, strict-fast-forward
  * divergence refusal, DDL/vacuum refusals on branch handles,
  * vacuum keeping branch-referenced files until drop, streaming
  * txn-marker carryover, and creation-race atomicity.
  */
class BranchSpec extends SparkSpec {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-branch").toString + "/t"

  private def chunkRows(ids: Range, tag: String, page: Int = 1) = {
    import spark.implicits._
    ids.map(i => (0, s"$tag$i", Seq(1f), page, f"doc://$i%05d"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url").coalesce(1)
  }

  private def urls(store: ChunkStore): Set[String] =
    store.read().select("document_url").collect()
      .map(_.getString(0)).toSet

  test("branch writes are invisible to main and vice versa; " +
      "fast-forward publishes the net state atomically") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 10, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val fork = mtf.createBranch("audit")
    assert(fork == mtf.version)
    assert(mtf.listBranches == Seq(("audit", fork)))

    val bstore = new ChunkStore(spark, path,
      format = ManifestTableFormat.branchFactory("audit"))
    // branch: delete 3 docs, append 5 new ones
    bstore.deleteWhere(col("document_url") <= "doc://00003")
    bstore.append(chunkRows(11 to 15, "new-"))
    // isolation: main still serves the forked state
    assert(urls(store) == (1 to 10).map(i => f"doc://$i%05d").toSet)
    // the branch sees its own head
    assert(urls(bstore) == (4 to 15).map(i => f"doc://$i%05d").toSet)
    // a main-side commit after READS would diverge — don't; publish
    val mainV = mtf.version
    val (adds, rms) = mtf.fastForward("audit")
    assert(adds >= 1 && rms >= 1, s"published delta ($adds, $rms)")
    // ONE squash commit: main advanced exactly one version
    assert(mtf.version == mainV + 1)
    assert(urls(store) == (4 to 15).map(i => f"doc://$i%05d").toSet)
    // post-publish the branch is disposable
    mtf.dropBranch("audit")
    assert(mtf.listBranches.isEmpty)
  }

  test("net cancellation: files added then deleted within the branch " +
      "never surface in the published commit") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 5, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.createBranch("wip")
    val bstore = new ChunkStore(spark, path,
      format = ManifestTableFormat.branchFactory("wip"))
    // branch: append a batch, then delete ALL of it again
    bstore.append(chunkRows(100 to 104, "tmp-", page = 9))
    bstore.deleteWhere(col("page_number") === 9)
    // plus one surviving change so the publish is non-empty
    bstore.append(chunkRows(200 to 200, "keep-"))
    val before = mtf.version
    val (adds, _) = mtf.fastForward("wip")
    assert(mtf.version == before + 1)
    // net: only the surviving file publishes — no trace of the
    // cancelled batch in main's new entry
    val entry = new Path(path, f"_log/${mtf.version}%012d.json")
    val fs = entry.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lines = scala.io.Source.fromInputStream(fs.open(entry), "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    val addLines = lines.filter(_.contains("\"a\":\"add\""))
    assert(addLines.size == adds.toInt)
    assert(!addLines.exists(_.contains("tmp-")), "cancelled batch leaked")
    assert(urls(store) ==
      ((1 to 5).map(i => f"doc://$i%05d") :+ "doc://00200").toSet)
  }

  test("strict fast-forward: a main commit after the fork refuses " +
      "the publish, and nothing lands") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 5, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.createBranch("stale")
    val bstore = new ChunkStore(spark, path,
      format = ManifestTableFormat.branchFactory("stale"))
    bstore.append(chunkRows(10 to 12, "b-"))
    // main advances past the fork
    store.append(chunkRows(20 to 22, "m-"))
    val mainState = urls(store)
    val e = intercept[IllegalStateException] {
      mtf.fastForward("stale")
    }
    assert(e.getMessage.contains("re-branch"), e.getMessage)
    assert(urls(store) == mainState, "refused publish must not land")
  }

  test("branch handles refuse DDL, vacuum, and branch administration") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 3, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.createBranch("b1")
    val bmtf = new ManifestTableFormat(spark, path, store.schema,
      branch = Some("b1"))
    intercept[UnsupportedOperationException] {
      bmtf.addColumn("x", org.apache.spark.sql.types.IntegerType)
    }
    intercept[UnsupportedOperationException] { bmtf.vacuum() }
    intercept[UnsupportedOperationException] { bmtf.createBranch("b2") }
    intercept[UnsupportedOperationException] { bmtf.fastForward("b1") }
    // and a branch of a branch name that was never forked refuses
    intercept[IllegalArgumentException] {
      new ChunkStore(spark, path,
        format = ManifestTableFormat.branchFactory("nope")).read()
    }
  }

  test("main vacuum keeps branch-referenced files while the branch " +
      "lives; dropBranch releases them") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 3, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.createBranch("keepalive")
    val bstore = new ChunkStore(spark, path,
      format = ManifestTableFormat.branchFactory("keepalive"))
    bstore.append(chunkRows(10 to 12, "b-"))
    // main vacuum must NOT reclaim the branch's (main-unreferenced)
    // data files
    val (reclaimed1, _) = mtf.vacuum()
    assert(reclaimed1 == 0L, s"vacuum ate $reclaimed1 branch files")
    assert(urls(bstore) == (1 to 12).filter(i => i <= 3 || i >= 10)
      .map(i => f"doc://$i%05d").toSet)
    // dropped branch → its files become garbage → reclaimed
    mtf.dropBranch("keepalive")
    val (reclaimed2, _) = mtf.vacuum()
    assert(reclaimed2 >= 1L, "dropped branch's files must reclaim")
    assert(urls(store) == (1 to 3).map(i => f"doc://$i%05d").toSet)
  }

  test("streaming to a branch: txn markers carry over on publish " +
      "(exactly-once survives the fast-forward)") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 3, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.createBranch("stream")
    val bmtf = new ManifestTableFormat(spark, path, store.schema,
      branch = Some("stream"))
    assert(bmtf.appendStream(chunkRows(10 to 12, "s-"), "appX", 7L))
    // replay on the branch no-ops
    assert(!bmtf.appendStream(chunkRows(10 to 12, "s-"), "appX", 7L))
    mtf.fastForward("stream")
    // the marker crossed: a replay against MAIN no-ops too
    assert(mtf.streamTransactions.contains(("appX", 7L)))
    assert(!mtf.appendStream(chunkRows(10 to 12, "s-"), "appX", 7L))
    assert(urls(store).size == 6)
  }

  test("deletion vectors cross the publish: a branch DV delete " +
      "lands on main as the same merge-on-read state") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 10, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val mainFiles = mtf.liveFiles.toSet
    mtf.createBranch("dv")
    val bmtf = new ManifestTableFormat(spark, path, store.schema,
      branch = Some("dv"))
    spark.conf.set("spark.graft.deletionVectors", "true")
    try bmtf.deleteWhereDv(col("document_url") <= "doc://00003")
    finally spark.conf.unset("spark.graft.deletionVectors")
    // merge-on-read on the branch: same data files, a vector attached
    assert(bmtf.liveFiles.toSet == mainFiles)
    assert(bmtf.liveFilesWithDv.exists(_._2.isDefined))
    mtf.fastForward("dv")
    // the DV re-add crossed: main keeps the file, applies the vector
    assert(mtf.liveFiles.toSet == mainFiles,
      "publish must carry the DV re-add, not a rewrite")
    assert(mtf.liveFilesWithDv.exists(_._2.isDefined))
    assert(urls(store) == (4 to 10).map(i => f"doc://$i%05d").toSet)
    // and vacuum (post-drop) keeps the DV object main now references
    mtf.dropBranch("dv")
    mtf.vacuum()
    assert(urls(store) == (4 to 10).map(i => f"doc://$i%05d").toSet)
  }

  test("empty branch fast-forwards as a no-op; unknown branch and " +
      "duplicate creation refuse") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 3, "base-"))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.createBranch("empty")
    val v = mtf.version
    assert(mtf.fastForward("empty") == ((0L, 0L)))
    assert(mtf.version == v, "no-op publish must not commit")
    intercept[IllegalArgumentException] { mtf.fastForward("ghost") }
    intercept[IllegalStateException] { mtf.createBranch("empty") }
  }
}
