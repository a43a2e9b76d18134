package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kind-dispatching index maintenance — the glue that keeps the
  * persistent indexes delete-consistent with the chunk store
  * (SURVEY A20 at scale): the reference's store indexes live ON the
  * container so a document delete is index-consistent by construction
  * (`AzureCosmosDB/.../CosmosDBClientWrapper.cs:112-152`); external
  * index artifacts need the delete propagated explicitly, which is
  * what [[graft.pipeline.StreamingIngest.detectDeletes]] routes
  * through here.
  *
  * A path is recognized by its stamp file — the same validate-or-fail
  * contract as the index loaders; a directory with no stamp fails
  * loudly rather than silently swallowing a delete (an unpropagated
  * delete is exactly the bug this object exists to prevent).
  */
object IndexMaintenance {

  private def hasStamp(spark: SparkSession, path: String,
      stamp: String): Boolean = {
    val p = new Path(path, stamp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Tombstone `ids` in the index at `path`, whatever its kind.
    * Idempotent, O(ids); rows are physically dropped by the matching
    * `compact` on a maintenance cadence.
    */
  def deleteFrom(spark: SparkSession, path: String, ids: DataFrame): Unit =
    if (hasStamp(spark, path, "_graft_vector_index"))
      VectorIndex.delete(ids, path)
    else if (hasStamp(spark, path, "_graft_text_index"))
      TextIndex.delete(ids, path)
    else if (hasStamp(spark, path, "_graft_graph_index"))
      GraphIndex.delete(ids, path)
    else throw new IllegalArgumentException(
      s"no vector, text, or graph index stamp at $path — refusing to " +
        "skip a delete propagation (the index would keep serving " +
        "deleted rows)")

  /** Physically drop tombstoned rows from the index at `path`. */
  def compact(spark: SparkSession, path: String): Unit =
    if (hasStamp(spark, path, "_graft_vector_index"))
      VectorIndex.compact(spark, path)
    else if (hasStamp(spark, path, "_graft_text_index"))
      TextIndex.compact(spark, path)
    else if (hasStamp(spark, path, "_graft_graph_index"))
      GraphIndex.compact(spark, path)
    else throw new IllegalArgumentException(
      s"no vector, text, or graph index stamp at $path")
}
