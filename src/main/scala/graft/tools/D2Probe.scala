package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Dedup

/** Scratch probe: where does d2_minhash_lsh spend its time at sf0.1? */
object D2Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val d = Tables(spark, dir, "documents")
    println("docs rows: " + d.count())
    val edited = d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" tail edit")).as("text"))
    val all = d.select(col("doc_id"), col("text")).unionAll(edited)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("signatures+bands only") {
      val sig = all.select(col("doc_id"),
        Dedup.bandKeys(Dedup.minhashSignature(col("text"), 64, 3), 64, 16)
          .as("bands"))
      sig.write.format("noop").mode("overwrite").save()
    }
    val sig = all.select(col("doc_id").as("id"),
      Dedup.bandKeys(Dedup.minhashSignature(col("text"), 64, 3), 64, 16)
        .as("bands"))
    val buckets = sig.select(col("id"),
      posexplode(col("bands")).as(Seq("band", "key"))).cache()
    time("bucket explode+cache") { buckets.count() }
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct().cache()
    time("candidates") { println("  n_cand = " + cand.count()) }
    time("full minhashLshPairs") {
      Dedup.minhashLshPairs(all, "doc_id", "text", 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    // biggest bucket groups (skew check)
    buckets.groupBy("band", "key").count().orderBy(desc("count"))
      .show(5, truncate = false)
    spark.stop()
  }
}
