package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucket-join co-location (SCALE §2): persist the two sides of a
  * repeated equi-join — canonically chunks ↔ embeddings on the
  * document key — as bucketed, sorted tables so every later join or
  * aggregation on that key is EXCHANGE-FREE: the file-scan itself
  * reports hash partitioning, and sort-merge join consumes both sides
  * with no shuffle and no sort.
  *
  * At 100 TB this converts the dominant recurring cost (re-shuffling
  * the fact tables for each analysis query) into a one-time write-side
  * cost; it is the table-format analog of the reference's fixed Cosmos
  * partition key. Bucket counts must match on both sides.
  */
object CoLocate {

  /** Save as a bucketed + sorted managed parquet table. */
  def saveBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (scan reports the bucket
    * partitioning; joins on `key` against an equally-bucketed side
    * plan without exchanges).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
