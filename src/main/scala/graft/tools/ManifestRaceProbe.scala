package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sink.{ChunkStore, ManifestTableFormat}

/** Dev probe (spawned as a SEPARATE JVM by the cross-process race
  * test): performs `batches` merges of `rows` disjoint-keyed chunk
  * rows each into the manifest store at `path`, then exits 0. Two of
  * these racing against one log is the real multi-writer scenario the
  * in-process spec can only simulate — every commit must land as its
  * own version or retry loudly; exit code != 0 means a lost/livelocked
  * commit.
  *
  * Usage: ManifestRaceProbe <storePath> <tag> <batches> <rowsPerBatch>
  */
object ManifestRaceProbe {
  def main(args: Array[String]): Unit = {
    val Array(path, tag, batchesS, rowsS) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-probe-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val store = new ChunkStore(spark, path,
        format = ManifestTableFormat.factory)
      val batches = batchesS.toInt
      val rows = rowsS.toInt
      for (b <- 1 to batches) {
        store.upsert(
          (1 to rows).map(i =>
            (0, s"$tag-b$b-r$i", Seq(1f), 1, f"doc://$tag/$i%04d"))
            .toDF("chunk_id", "chunk_text", "embedding", "page_number",
              "document_url"))
      }
    } finally spark.stop()
  }
}
