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
    spark.stop()
  }
}
