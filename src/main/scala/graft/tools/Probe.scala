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

    spark.stop()
  }
}
