package graft.tools

import graft.{GraftSession, Tables}

/** Scratch probe: print harness table schemas + sample rows. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[4]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      val df = Tables(spark, dir, n)
      println(s"== $n (${df.count()} rows) ==")
      println(df.schema.treeString)
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
