package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.Quantize

/** Dev probe: PQ recall@10 vs rerank size per SF, so the d8c gate
  * floor and rerank policy come from data. Not part of the
  * conformance surface.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[16]")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables(spark, dir, "embeddings").cache()
      val n = e.count()
      val model = Quantize.trainPq(e, "vec_id", "embedding", m = 8, ks = 16)
      val coded = Quantize.withPqCodes(e, "embedding", model).cache()
      val probe = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val exact = graft.ops.VectorSearch.topK(e, probe, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (r <- Seq(60, 100, 200, (n / 10).toInt)) {
        val pq = Quantize.topKPq(coded, model, probe, k = 10,
            idCol = "vec_id", rerank = r)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(s"== $dir n=$n rerank=$r recall=${(exact & pq).size}/10 " +
          s"self=${pq.contains(0L)}")
      }
      coded.unpersist(); e.unpersist()
    }

    // IVF-PQ recall with the d3c-style probe set (vec_id < 10, k=5)
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables(spark, dir, "embeddings").cache()
      val probes = e.filter(col("vec_id") < 10)
      val brute = graft.ops.Similarity
        .knnJoinBrute(e, probes, "vec_id", "embedding", 5)
        .select("probe_id", "nn_id").cache()
      for (r <- Seq(64, 96)) {
        val approx = graft.ops.Similarity.ivfPqAnnJoin(e, probes,
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4,
          rerankPerProbe = r)
        val hits = brute.join(approx.select("probe_id", "nn_id"),
          Seq("probe_id", "nn_id"), "left_semi").count()
        println(s"== ivfpq $dir rerank=$r recall=$hits/${brute.count()} " +
          s"rows=${approx.count()}")
      }
      brute.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
