package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry, Tables}

/** Scratch probe main (verification harness, not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]")
    spark.sparkContext.setLogLevel("WARN")

    println("== entry() smoke ==")
    val e = SparkEntry.entry(spark)
    println("entry rows: " + e.count())
    e.show(5, truncate = false)

    println("== SQL registration path ==")
    Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("embeddings")
    spark.sql(
      """SELECT vec_id, round(cosine_distance(embedding, embedding), 6) d,
        |       round(vector_norm(embedding), 6) n
        |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin)
      .show(truncate = false)

    println("== dimension mismatch probe ==")
    try {
      spark.sql(
        """SELECT cosine_distance(embedding, slice(embedding, 1, 8))
          |FROM embeddings LIMIT 1""".stripMargin).collect()
      println("NO ERROR (unexpected)")
    } catch {
      case ex: Throwable =>
        println("error class: " + ex.getClass.getSimpleName)
        val root = Option(ex.getCause).getOrElse(ex)
        println("msg: " + root.getMessage.linesIterator.take(2).mkString(" | "))
    }

    println("== null safety probe ==")
    spark.sql(
      """SELECT cosine_distance(CAST(NULL AS ARRAY<FLOAT>), embedding) d
        |FROM embeddings LIMIT 1""".stripMargin).show()

    println("== physical plan of top-k ==")
    SparkEntry.all("b2_vector_topk").fn(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    println("== round-7 kernels through SQL ==")
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("documents")
    spark.sql(
      """SELECT doc_id,
        |       size(bpe_encode(text, '')) n_raw,
        |       round(cosine_distance(bow_embed(text, 16),
        |                             bow_embed(text, 16)), 6) self_d
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin)
      .show(truncate = false)

    println("== graft-cdf streaming source smoke ==")
    locally {
      import graft.sink.{ChunkStore, ManifestTableFormat}
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-probe-cdf").toString + "/t"
      new ChunkStore(spark, dir, format = ManifestTableFormat.factory)
        .upsert(Seq((0, "probe", Seq(1f, 2f), 1, "doc://p"))
          .toDF("chunk_id", "chunk_text", "embedding", "page_number",
            "document_url"))
      val q = spark.readStream.format("graft-cdf").option("path", dir)
        .load()
        .writeStream.format("memory").queryName("probe_cdf")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println("cdf rows: " + spark.table("probe_cdf").count())
    }

    spark.stop()
  }
}
