package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialize a driver-side string iterator as a DISK-BACKED
  * single-column DataFrame: fixed-size batches append to a temp
  * parquet table the returned frame reads, so driver heap stays
  * O(batch) however long the iterator runs. This is the bridge from
  * the metadata APIs that only exist as driver iterators (Hadoop
  * `RemoteIterator` listings, partition-directory names) into the
  * engine's anti-join paths — the alternative, `createDataset` of a
  * collected Seq, pins the whole listing in a driver `LocalRelation`.
  *
  * The temp table lives under `java.io.tmpdir` for the JVM's
  * lifetime (same convention as the gate-query staging dirs).
  */
private[graft] object StreamedNames {

  /** Stream `names` into a disk-backed frame with column `colName`.
    * Returns the frame and the total count (counted while streaming —
    * no extra job for callers that gate on emptiness).
    */
  def toFrame(
      spark: SparkSession,
      colName: String,
      names: Iterator[String],
      batch: Int = 1 << 16): (DataFrame, Long) = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-streamed-names").toString
    var n = 0L
    val buf = new scala.collection.mutable.ArrayBuffer[String](batch)
    def flush(): Unit = if (buf.nonEmpty) {
      spark.createDataset(buf.toSeq).toDF(colName)
        .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
      buf.clear()
    }
    while (names.hasNext) {
      buf += names.next()
      n += 1
      if (buf.length >= batch) flush()
    }
    flush()
    val df =
      if (n == 0L) spark.emptyDataset[String].toDF(colName)
      else spark.read.parquet(dir)
    (df, n)
  }
}
