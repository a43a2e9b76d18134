package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{GraphIndex, Similarity, VectorIndex}

/** ANN quality DATASHEET: recall@10 + wall latency vs brute force for
  * the four approximate families (LSH / IVF / IVF-PQ / per-cell NSW
  * graph) over the `embeddings` table of `args(0)`, with the recall
  * knobs (numTables / nprobe) swept once each. The gates pin recall
  * FLOORS at one knob setting; this main records the knob CURVES so a
  * recall cliff at scale is visible in BENCH_NOTES, not discovered by
  * a user. Prints one JSON line per (method, knob) with recall,
  * candidate-efficiency context and seconds (median of `reps` runs).
  *
  * Usage: runMain graft.tools.AnnDatasheet <sfDir> [probes=100] [reps=3]
  */
object AnnDatasheet {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbes = args.lift(1).map(_.toInt).getOrElse(100)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.getOrCreate(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val e = graft.Tables(spark, dir, "embeddings").persist()
    val n = e.count()
    val probes = e.filter(col("vec_id") < nProbes).persist()
    val np = probes.count().toInt
    val k = 10

    // ground truth ONCE; keyed set on the driver (np*k pairs)
    val brute = Similarity.knnJoinBrute(e, probes, "vec_id", "embedding",
      k = k)
    val truth = brute.select("probe_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def measure(name: String, knob: String, run: () => DataFrame): Unit = {
      // recall from one materialization; latency = median of reps
      val got = run().select("probe_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val recall = got.count(truth.contains).toDouble / truth.size
      val complete = got.length == np * k
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run().select("probe_id", "nn_id").write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.size / 2)
      println(f"""{"method":"$name","knob":"$knob","recall_at_$k":$recall%.3f,"complete":$complete,"sec":$med%.3f,"n":$n,"probes":$np}""")
    }

    // brute force is the latency baseline (recall 1 by construction)
    measure("brute", "-", () =>
      Similarity.knnJoinBrute(e, probes, "vec_id", "embedding", k = k))

    for (l <- Seq(1, 2, 4, 8))
      measure("lsh", s"numTables=$l", () =>
        Similarity.lshAnnJoin(e, probes, "vec_id", "embedding",
          k = k, dim = 64, numTables = l))

    for (nprobe <- Seq(1, 2, 4, 8))
      measure("ivf", s"nlist=16,nprobe=$nprobe", () =>
        Similarity.ivfAnnJoin(e, probes, "vec_id", "embedding",
          k = k, nlist = 16, nprobe = nprobe))
    for (nprobe <- Seq(2, 8))
      measure("ivf", s"nlist=64,nprobe=$nprobe", () =>
        Similarity.ivfAnnJoin(e, probes, "vec_id", "embedding",
          k = k, nlist = 64, nprobe = nprobe))

    for (nprobe <- Seq(2, 4, 8))
      measure("ivfpq", s"nlist=16,nprobe=$nprobe,rerank=96", () =>
        Similarity.ivfPqAnnJoin(e, probes, "vec_id", "embedding",
          k = k, nlist = 16, nprobe = nprobe, rerankPerProbe = 96))
    // recall-cliff decomposition: is the cap the rerank pool or the
    // code resolution? (sweep each independently)
    for (rr <- Seq(256, 512))
      measure("ivfpq", s"nlist=16,nprobe=4,rerank=$rr", () =>
        Similarity.ivfPqAnnJoin(e, probes, "vec_id", "embedding",
          k = k, nlist = 16, nprobe = 4, rerankPerProbe = rr))
    for (ks <- Seq(64, 256))
      measure("ivfpq", s"nlist=16,nprobe=4,ks=$ks,rerank=96", () =>
        Similarity.ivfPqAnnJoin(e, probes, "vec_id", "embedding",
          k = k, nlist = 16, nprobe = 4, ks = ks, rerankPerProbe = 96))
    measure("ivfpq", "nlist=16,nprobe=4,ks=64,rerank=256", () =>
      Similarity.ivfPqAnnJoin(e, probes, "vec_id", "embedding",
        k = k, nlist = 16, nprobe = 4, ks = 64, rerankPerProbe = 256))
    // serving-path economics: pay the ks=256 training ONCE in the
    // index build, query with a deeper rerank pool
    val ipath256 = s"/tmp/graft-annds-ivfpq256-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    VectorIndex.buildIvfPq(e, ipath256, "vec_id", "embedding",
      nlist = 16, m = 8, ks = 256)
    for (rr <- Seq(96, 256))
      measure("ivfpq-index", s"nlist=16,ks=256,nprobe=4,rerank=$rr", () =>
        VectorIndex.queryIvfPq(spark, ipath256, probes, k = k,
          nprobe = 4, rerankPerProbe = rr))

    // graph: persistent index built once per nlist, queried per nprobe
    for (nprobe <- Seq(2, 4, 8)) {
      val path = s"/tmp/graft-annds-g16-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      GraphIndex.build(e, path, "vec_id", "embedding",
        nlist = 16, m = 8, efConstruction = 64)
      measure("graph", s"nlist=16,nprobe=$nprobe,ef=64", () =>
        GraphIndex.query(spark, path, probes, k = k,
          nprobe = nprobe, ef = 64))
    }

    // stamped IVF-PQ index serving lane (zero-training query path)
    val ipath = s"/tmp/graft-annds-ivfpq-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    VectorIndex.buildIvfPq(e, ipath, "vec_id", "embedding",
      nlist = 16, m = 8, ks = 16)
    for (nprobe <- Seq(4, 8))
      measure("ivfpq-index", s"nlist=16,nprobe=$nprobe,rerank=96", () =>
        VectorIndex.queryIvfPq(spark, ipath, probes, k = k,
          nprobe = nprobe, rerankPerProbe = 96))

    spark.stop()
  }
}
