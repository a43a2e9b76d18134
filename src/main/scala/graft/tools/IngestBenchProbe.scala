package graft.tools

import graft.Tables

/** Adjudication probe (round 8, VERDICT "what's wrong" #2): is the
  * driver-bench ingest-row regression the IngestMetrics attachment
  * (fixed per-run cost) or sub-second single-run noise? Runs the
  * bench's exact ingest row 2×6 times alternating metrics off/on in
  * one warm JVM and prints the per-rep seconds.
  */
object IngestBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    docs.count() // warm the scan
    def rep(withMetrics: Boolean): Double = {
      val m = if (withMetrics)
        Some(new graft.pipeline.IngestMetrics(spark.sparkContext))
      else None
      val t0 = System.nanoTime()
      val out = graft.pipeline.IngestPipeline.ingestDocumentsTable(
        spark, docs, graft.embed.DeterministicEmbedder(64), metrics = m)
      out.count()
      (System.nanoTime() - t0) / 1e9
    }
    val reps = (1 to 6).map(i => (i % 2 == 0, rep(i % 2 == 0)))
    reps.foreach { case (m, s) =>
      println(f"metrics=$m%-5s secs=$s%.3f")
    }
    val (on, off) = reps.partition(_._1)
    println(f"median-ish on=${on.map(_._2).sorted.apply(1)}%.3f " +
      f"off=${off.map(_._2).sorted.apply(1)}%.3f")
    spark.stop()
  }
}
