package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{GraphIndex, Similarity}

/** Graph ANN index semantics (SURVEY B2/D3 graph form): per-cell NSW
  * build, beam-search query, recall vs brute force, append ≡ rebuild,
  * tombstone delete + compacting rebuild.
  */
class GraphIndexSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private lazy val emb = Tables(spark, sf(), "embeddings").cache()

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft-gidx-$tag").toString + "/idx"

  test("beam search with ef = n is exhaustive: exact top-k on one cell") {
    // a fully-searched NSW graph must reproduce brute force exactly
    val rnd = new java.util.Random(3)
    val nodes = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val adj = GraphIndex.buildCellGraph(nodes, m = 6, efC = 40)
    // degree cap honored
    assert(adj.forall(_.length <= 12))
    val q = Array.fill(8)(rnd.nextGaussian().toFloat)
    val got = GraphIndex.beamSearch(q, 0, nodes.length,
      nodes.map(_._1).toArray, nodes.map(_._2).toArray, adj(_))
      .take(5).map(_._2.toLong)
    val want = nodes.map { case (id, v) =>
      (graft.functions.VectorOps.cosineDistance(q, v), id)
    }.sorted.take(5).map(_._2)
    assert(got == want, s"exhaustive beam search not exact: $got vs $want")
  }

  test("build + query: recall clears the floor, top-k complete, deterministic") {
    val path = freshPath("bq")
    GraphIndex.build(emb, path, "vec_id", "embedding",
      nlist = 16, m = 8, efConstruction = 64)
    val probes = emb.filter(col("vec_id") < 25)
    val got = GraphIndex.query(spark, path, probes, k = 5, nprobe = 4,
      ef = 64).cache()
    // every probe gets a full top-5
    assert(got.count() == 125)
    assert(got.groupBy("probe_id").count()
      .filter(col("count") =!= 5).count() == 0)
    // recall@5 vs brute force over the same probes
    val brute = Similarity.knnJoinBrute(emb, probes, "vec_id", "embedding",
      k = 5).select("probe_id", "nn_id")
    val hits = brute.join(got.select("probe_id", "nn_id"),
      Seq("probe_id", "nn_id"), "left_semi").count()
    info(s"graph ANN recall@5: $hits/125")
    // at these cell sizes ef ≥ |cell| makes the in-cell search
    // exhaustive, so recall here IS the nprobe=4/16 coarse-routing
    // recall (same bound as d3c's IVF at the same params — measured
    // 78/125 at sf0.001); gate floor mirrors d3c's 50%
    assert(hits >= 70, s"recall too low: $hits/125")
    // determinism: a second query returns identical rows
    val again = GraphIndex.query(spark, path, probes, k = 5, nprobe = 4,
      ef = 64)
    assert(got.exceptAll(again).count() == 0 &&
      again.exceptAll(got).count() == 0)
    got.unpersist()
  }

  test("nprobe is the recall knob: more probed cells → more true-kNN recall") {
    val path = freshPath("knob")
    GraphIndex.build(emb, path, "vec_id", "embedding",
      nlist = 16, m = 8, efConstruction = 64)
    val probes = emb.filter(col("vec_id") < 25)
    val brute = Similarity.knnJoinBrute(emb, probes, "vec_id", "embedding",
      k = 5).select("probe_id", "nn_id").cache()
    def recall(nprobe: Int): Long = brute
      .join(GraphIndex.query(spark, path, probes, k = 5, nprobe = nprobe,
          ef = 256).select("probe_id", "nn_id"),
        Seq("probe_id", "nn_id"), "left_semi")
      .count()
    val r2 = recall(2)
    val r16 = recall(16)
    info(s"recall@5: nprobe=2 $r2/125, nprobe=16 $r16/125")
    // ef = 256 ≥ any cell at sf0.001, so nprobe=16 probes every cell
    // exhaustively — exact brute-force recall; fewer cells cost recall
    assert(r16 == 125, s"exhaustive nprobe must be exact: $r16/125")
    assert(r2 < r16, s"nprobe knob has no effect: $r2 vs $r16")
    brute.unpersist()
  }

  test("append is batch-invariant: any batch split yields the identical node table") {
    // insertion order inside a cell is sorted-by-id — a FUNCTION of
    // the cell's final node set — so rebuilding a touched cell after
    // one big append or after several small ones must produce
    // bit-identical vectors AND adjacency (the graph twin of d3f's
    // batch_invariant contract)
    val pathA = freshPath("apA")
    val pathB = freshPath("apB")
    val first = emb.filter(col("vec_id") % 5 =!= 0)
    val rest = emb.filter(col("vec_id") % 5 === 0)
    GraphIndex.build(first, pathA, "vec_id", "embedding", nlist = 8)
    GraphIndex.build(first, pathB, "vec_id", "embedding", nlist = 8)
    GraphIndex.append(rest, pathA)
    GraphIndex.append(rest.filter(col("vec_id") % 10 === 0), pathB)
    GraphIndex.append(rest.filter(col("vec_id") % 10 =!= 0), pathB)
    val a = spark.read.parquet(s"$pathA/data")
      .select("nn_id", "cell", "vec", "nbrs").orderBy("nn_id")
    val b = spark.read.parquet(s"$pathB/data")
      .select("nn_id", "cell", "vec", "nbrs").orderBy("nn_id")
    assert(a.collect().toSeq == b.collect().toSeq,
      "append is not batch-invariant")
    // and the appended ids actually serve queries
    val probes = rest.filter(col("vec_id") < 50)
    val got = GraphIndex.query(spark, pathA, probes, k = 1, nprobe = 2,
      ef = 32)
    assert(got.filter(col("probe_id") === col("nn_id") &&
      col("dist") < 1e-9).count() == probes.count(),
      "appended vectors are not their own nearest neighbor")
  }

  test("delete tombstones immediately, compact drops rows and preserves answers") {
    val path = freshPath("del")
    GraphIndex.build(emb, path, "vec_id", "embedding", nlist = 8)
    val probes = emb.filter(col("vec_id") < 10)
    import spark.implicits._
    val victims = Seq(0L, 1L, 2L).toDF("vec_id")
    GraphIndex.delete(victims, path)
    // ef = 256 ≥ any cell size at sf0.001 → the beam search is
    // exhaustive, so pre/post-compaction answers are EXACTLY equal
    // (with a smaller ef both sides are approximate and the equality
    // below would be probabilistic)
    val afterDelete = GraphIndex.query(spark, path, probes, k = 5,
      nprobe = 4, ef = 256).cache()
    // deleted ids never surface, every probe still gets a full top-5
    assert(afterDelete.filter(col("nn_id").isin(0L, 1L, 2L)).count() == 0)
    assert(afterDelete.count() == 50)
    GraphIndex.compact(spark, path)
    // physically gone + tombstones cleared
    assert(spark.read.parquet(s"$path/data")
      .filter(col("nn_id").isin(0L, 1L, 2L)).count() == 0)
    assert(!new org.apache.hadoop.fs.Path(s"$path/tombstones")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")))
    // compaction rebuilds the affected cells: the emitted answer set
    // stays identical (the anti-join already hid the rows)
    val afterCompact = GraphIndex.query(spark, path, probes, k = 5,
      nprobe = 4, ef = 256)
    assert(afterDelete.exceptAll(afterCompact).count() == 0 &&
      afterCompact.exceptAll(afterDelete).count() == 0,
      "compaction changed the emitted answers")
    afterDelete.unpersist()
  }

  test("large tombstone sets stay off the driver: tombstones enter the query plan as a join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val path = freshPath("bigtomb")
    GraphIndex.build(emb, path, "vec_id", "embedding", nlist = 8)
    val probes = emb.filter(col("vec_id") < 5)
    // pre-delete: no tombstones → no join anywhere in the query plan
    val before = GraphIndex.query(spark, path, probes, k = 3, nprobe = 8,
      ef = 2048)
    assert(before.queryExecution.optimizedPlan.collect {
      case j: LJoin => j }.isEmpty)
    // delete HALF the corpus in one batch — the shape whose collected
    // driver Set the old path broadcast; now it must flow through a
    // join against the tombstone frame
    val victims = emb.filter(col("vec_id") % 2 === 0).select("vec_id")
    GraphIndex.delete(victims, path)
    val after = GraphIndex.query(spark, path, probes, k = 3, nprobe = 8,
      ef = 2048)
    assert(after.queryExecution.optimizedPlan.collect {
      case j: LJoin => j }.nonEmpty,
      "tombstones must attach via a join, not a driver-collected set")
    val rows = after.cache()
    // no tombstoned id is emitted; every probe still gets its k
    assert(rows.join(victims.withColumnRenamed("vec_id", "nn_id"),
      Seq("nn_id"), "left_semi").count() == 0)
    assert(rows.groupBy("probe_id").count()
      .filter(col("count") =!= 3).count() == 0)
    // with nprobe = nlist and ef ≥ |cell| the search is exhaustive, so
    // the masked index must reproduce brute force over the survivors
    val survivors = emb.join(victims, Seq("vec_id"), "left_anti")
    val brute = Similarity.knnJoinBrute(survivors, probes, "vec_id",
      "embedding", k = 3).select("probe_id", "nn_id")
    assert(rows.select("probe_id", "nn_id").exceptAll(brute).count() == 0 &&
      brute.exceptAll(rows.select("probe_id", "nn_id")).count() == 0)
    rows.unpersist()
  }

  test("query prunes the node-table scan to the probed cells (static partition pruning)") {
    val path = freshPath("prune")
    GraphIndex.build(emb, path, "vec_id", "embedding", nlist = 8)
    val oneProbe = emb.filter(col("vec_id") === 7)
    val got = GraphIndex.query(spark, path, oneProbe, k = 3, nprobe = 2,
      ef = 32)
    got.collect()
    // AQE wraps the plan — collect scans through the adaptive node
    val scans = collectWithSubqueries(got.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val scan = scans.find(_.toString.contains("cell")).get
    assert(!scan.toString.contains("PartitionFilters: []"),
      s"expected cell partition filters in: ${scan.toString.take(800)}")
    // one probe × nprobe=2 → at most 2 of the 8 cell directories read
    // (DataFrame.inputFiles ignores partition pruning; the scan's own
    // numFiles metric counts what was actually planned)
    val all = spark.read.parquet(s"$path/data").inputFiles.length
    val read = scan.metrics("numFiles").value
    assert(read < all, s"read $read of $all files — no pruning")
  }

  test("IndexMaintenance routes deletes/compaction to a graph index by stamp") {
    val path = freshPath("im")
    GraphIndex.build(emb, path, "vec_id", "embedding", nlist = 8)
    import spark.implicits._
    graft.ops.IndexMaintenance.deleteFrom(spark, path, Seq(5L).toDF("id"))
    val got = GraphIndex.query(spark, path,
      emb.filter(col("vec_id") === 5), k = 1, nprobe = 2, ef = 64)
    assert(got.filter(col("nn_id") === 5L).count() == 0,
      "tombstoned id still served after IndexMaintenance.deleteFrom")
    graft.ops.IndexMaintenance.compact(spark, path)
    assert(spark.read.parquet(s"$path/data")
      .filter(col("nn_id") === 5L).count() == 0)
  }

  test("string-keyed ids are rejected loudly (no silent null-cast)") {
    import spark.implicits._
    val byUrl = emb.select(
      concat(lit("doc://"), col("vec_id")).as("url"), col("embedding"))
    val e1 = intercept[IllegalArgumentException] {
      GraphIndex.build(byUrl, freshPath("str"), "url", "embedding")
    }
    assert(e1.getMessage.contains("integral id"))
    val path = freshPath("str2")
    GraphIndex.build(emb, path, "vec_id", "embedding", nlist = 4)
    val e2 = intercept[IllegalArgumentException] {
      GraphIndex.delete(Seq("doc://5").toDF("url"), path)
    }
    assert(e2.getMessage.contains("integral id"))
  }

  test("stamp validates loudly: querying an unbuilt path fails") {
    val e = intercept[IllegalArgumentException] {
      GraphIndex.query(spark, freshPath("missing"),
        emb.filter(col("vec_id") < 1), k = 1)
    }
    assert(e.getMessage.contains("stamp"))
  }

  test("k larger than a cell still returns what exists (no crash, no dup)") {
    val path = freshPath("tiny")
    GraphIndex.build(emb.filter(col("vec_id") < 6), path,
      "vec_id", "embedding", nlist = 2, m = 4, efConstruction = 16)
    val probes = emb.filter(col("vec_id") === 0)
    val got = GraphIndex.query(spark, path, probes, k = 10, nprobe = 2,
      ef = 32)
    val n = got.count()
    assert(n <= 6 && n > 0)
    assert(got.select("nn_id").distinct().count() == n)
  }
}
