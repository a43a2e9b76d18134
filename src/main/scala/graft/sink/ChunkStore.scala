package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.types._

/** The canonical chunk table (SURVEY §1.1 item 4; FIXTURES §2) and its
  * sink semantics:
  *
  *  - A19/A21 ensure-schema bootstrap (`ensure()`),
  *  - A17 idempotent keyed upsert — emulated on plain Parquet as
  *    dynamic partition overwrite by `document_url`: semantically equal
  *    to the reference's MERGE for whole-document re-ingest, which is
  *    its only upsert scenario (chunk ids are per-document ordinals,
  *    AzureCosmosDB/.../CosmosDBClientWrapper.cs:48). On a Delta/
  *    Iceberg-capable cluster this becomes `MERGE INTO` in
  *    `foreachBatch` — same call site, different writer.
  *  - A18 append mode (the SQL variant's non-idempotent INSERT path),
  *  - A20 delete — completed here (the reference left it a TODO stub).
  *
  * Scale note: partitioning by `document_url` mirrors the Cosmos
  * partition key (`CosmosDBClientWrapper.cs:132`) and gives
  * single-partition point lookups (B5) + surgical per-document
  * upsert/delete. At extreme document counts you'd bucket documents
  * into N hash partitions instead (same API, coarser layout).
  */
final class ChunkStore(spark: SparkSession, path: String) {

  val schema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType),
    StructField("chunk_text", StringType),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("page_number", IntegerType),
    StructField("document_url", StringType)))

  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  /** A19/A21: bootstrap an empty partitioned table if absent. */
  def ensure(): Unit = if (!exists) {
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.partitionBy("document_url").parquet(path)
  }

  private def normalized(chunks: DataFrame): DataFrame =
    chunks.select("chunk_id", "chunk_text", "embedding", "page_number",
      "document_url")

  /** A17: idempotent upsert — replaces exactly the partitions
    * (documents) present in `chunks`, leaves everything else in place.
    */
  def upsert(chunks: DataFrame): Unit = {
    ensure()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    normalized(chunks).write.mode(SaveMode.Overwrite)
      .partitionBy("document_url").parquet(path)
  }

  /** A18: append-only insert (re-processing duplicates, as in the
    * reference's SQL variant).
    */
  def append(chunks: DataFrame): Unit = {
    ensure()
    normalized(chunks).write.mode(SaveMode.Append)
      .partitionBy("document_url").parquet(path)
  }

  /** A20 (completed): drop all chunks of the given documents by
    * removing their partition directories. Directory names use
    * Spark's Hive-style partition-value escaping.
    */
  def delete(documentUrls: Seq[String]): Unit = {
    val f = fs
    documentUrls.foreach { url =>
      val dir = new Path(path,
        "document_url=" + ExternalCatalogUtils.escapePathName(url))
      if (f.exists(dir)) f.delete(dir, true)
    }
  }

  def read(): DataFrame =
    if (exists) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
