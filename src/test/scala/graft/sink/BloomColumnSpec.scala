package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-column bloom filters (protocol v9, the Delta bloom-filter-
  * index idea at file-skipping granularity): declared columns get a
  * per-file bloom over xxhash64(value) in the add-action; an
  * equality probe on a declared column prunes files whose bloom
  * excludes the value. Pins: pruning on an unclustered column where
  * min/max cannot help, strictly fail-open behavior (undeclared
  * columns, pre-declaration files), survival through checkpoint +
  * fresh-handle replay, type refusals, and exactness of the pruned
  * read.
  */
class BloomColumnSpec extends SparkSpec {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-cbl").toString + "/t"

  // page_number gets a SCRAMBLE of the id: unique-ish, uncorrelated
  // with the id-ranged commits, so per-file min/max spans the domain
  private def scrambled(ids: Range) = {
    import spark.implicits._
    ids.map(i => (0, s"t$i", Seq(1f),
      ((i.toLong * 2654435761L) % 997003L).toInt, f"doc://$i%05d"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url").coalesce(1)
  }

  private def probesFor(mtf: ManifestTableFormat, v: Int) = {
    import org.apache.spark.sql.catalyst.expressions.{
      AttributeReference, EqualTo, Literal}
    val typeOf = (n: String) =>
      if (n.equalsIgnoreCase("page_number"))
        Some(("page_number", org.apache.spark.sql.types.IntegerType))
      else None
    StatsProbes.extract(Seq(EqualTo(
      AttributeReference("page_number",
        org.apache.spark.sql.types.IntegerType)(),
      Literal(v))), typeOf)
  }

  test("equality on a declared unclustered column prunes to the " +
      "owning file; undeclared stays fail-open; checkpoint survives") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.recordBloomColumns(Seq("page_number"))
    store.append(scrambled(0 until 250))
    store.append(scrambled(250 until 500))
    store.append(scrambled(500 until 750))
    val files = mtf.liveFiles
    assert(files.size == 3)
    // the value lives in commit 2's file; min/max spans collide, so
    // only the bloom can prune
    val v = ((300L * 2654435761L) % 997003L).toInt
    val kept = mtf.pruneFilesForScan(files, probesFor(mtf, v))
    assert(kept.isDefined && kept.get.size < 3,
      s"bloom must prune: kept ${kept.map(_.size)} of 3")
    // correctness: the pruned read still finds exactly the row
    val rows = store.read().filter(col("page_number") === v).collect()
    assert(rows.map(_.getAs[String]("document_url")).toSeq ==
      Seq("doc://00300"))
    // an absent value prunes everything
    val none = mtf.pruneFilesForScan(files, probesFor(mtf, 996999))
    assert(none.isDefined && none.get.isEmpty
      || none.exists(_.size < 3))
    // checkpoint + fresh handle: blooms survive the stats-frame
    // parquet roundtrip
    mtf.checkpoint()
    val fresh = new ManifestTableFormat(spark, path, store.schema)
    val kept2 = fresh.pruneFilesForScan(fresh.liveFiles, probesFor(fresh, v))
    assert(kept2.isDefined && kept2.get.size < 3,
      "bloom must survive checkpoint replay")
  }

  test("pre-declaration files fail open; re-records after rewrite") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    store.append(scrambled(0 until 250)) // BEFORE declaration
    mtf.recordBloomColumns(Seq("page_number"))
    store.append(scrambled(250 until 500)) // after
    val files = mtf.liveFiles
    // a value INSIDE both files' min/max ranges (so range skipping
    // cannot prune) that is not any id's scramble image
    val ghost = ((300L * 2654435761L) % 997003L).toInt + 1
    val kept = mtf.pruneFilesForScan(files, probesFor(mtf, ghost))
    // the post-declaration file drops; the pre-declaration one has no
    // bloom and must stay (fail open)
    assert(kept.isDefined && kept.get.size == 1,
      s"expected only the bloom-less file kept, got ${kept.map(_.size)}")
    // compaction rewrites both files -> the new file carries a bloom
    mtf.compact()
    val kept2 = mtf.pruneFilesForScan(mtf.liveFiles, probesFor(mtf, ghost))
    assert(kept2.isDefined && kept2.get.isEmpty,
      "after compaction every live file carries a bloom")
  }

  test("IN-lists prune through the blooms (the runtime DPP key-set " +
      "shape); oversized sets keep only the envelope") {
    import org.apache.spark.sql.catalyst.expressions.{
      AttributeReference, In, Literal}
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    mtf.recordBloomColumns(Seq("page_number"))
    store.append(scrambled(0 until 250))
    store.append(scrambled(250 until 500))
    store.append(scrambled(500 until 750))
    val attr = AttributeReference("page_number",
      org.apache.spark.sql.types.IntegerType)()
    val typeOf = (n: String) =>
      if (n.equalsIgnoreCase("page_number"))
        Some(("page_number", org.apache.spark.sql.types.IntegerType))
      else None
    def probesIn(vals: Seq[Int]) = StatsProbes.extract(
      Seq(In(attr, vals.map(Literal(_)))), typeOf)
    // two values from commits 1 and 3: their IN spans the whole
    // min/max envelope, only the blooms can drop commit 2's file
    def sv(i: Long) = ((i * 2654435761L) % 997003L).toInt
    val kept = mtf.pruneFilesForScan(mtf.liveFiles,
      probesIn(Seq(sv(10), sv(700))))
    assert(kept.isDefined && kept.get.size == 2,
      s"IN must bloom-prune to 2 files, kept ${kept.map(_.size)}")
    // an IN past the cap keeps only the envelope (no per-value
    // tests): every file survives — fail-open, never wrong
    val big = (0 until 300).map(i => sv(i))
    val keptBig = mtf.pruneFilesForScan(mtf.liveFiles, probesIn(big))
    assert(keptBig.isEmpty || keptBig.exists(_.size == 3),
      "oversized IN must fail open to the envelope")
  }

  test("declaration refusals: unknown column, unsupported type, " +
      "branch handle") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(scrambled(0 until 10))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    intercept[IllegalArgumentException] {
      mtf.recordBloomColumns(Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      mtf.recordBloomColumns(Seq("embedding")) // array<float>
    }
    mtf.createBranch("b")
    intercept[UnsupportedOperationException] {
      new ManifestTableFormat(spark, path, store.schema,
        branch = Some("b")).recordBloomColumns(Seq("page_number"))
    }
  }
}
