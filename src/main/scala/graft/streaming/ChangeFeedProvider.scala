package graft.streaming

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.graftbridge.GraftChangeFeedSource
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sink.{ChunkStore, ManifestTableFormat}

/** `spark.readStream.format("graft-cdf").option("path", dir).load()` —
  * a manifest table as a Structured Streaming SOURCE. Each micro-batch
  * is the net row-level delta between two committed versions (the
  * same contract as the batch `changesBetween` behind gate
  * c37e_change_feed): one row per changed chunk, `_change_type`
  * `insert` | `delete`, upserts appearing as old-rows-deleted +
  * new-rows-inserted, compaction/recluster survivor rows cancelling.
  *
  * Options:
  *  - `path` (required): the manifest table root (the dir with `_log`)
  *  - `startingVersion` (default −1): exclusive lower bound for a
  *    query starting WITHOUT a sink checkpoint. −1 streams the full
  *    current snapshot as inserts first (Delta's default), the
  *    table's current version streams deltas only from "now".
  *  - `startingTimestamp` (epoch millis or ISO `yyyy-MM-dd HH:mm:ss`):
  *    resolved to the newest version committed at or before it (the
  *    `TIMESTAMP AS OF` convention — commit mtimes), then used as the
  *    exclusive lower bound. Mutually exclusive with
  *    `startingVersion`.
  *  - `maxVersionsPerBatch` (optional): rate limit — at most this
  *    many log versions per micro-batch (Delta's maxFilesPerTrigger
  *    analog at version granularity).
  *
  * Restart rides the sink checkpoint: offsets are the table's own
  * committed versions, so a replayed batch recomputes the identical
  * delta (the log is immutable history until vacuum prunes it; a
  * pruned-away restart fails loudly rather than silently skipping).
  */
class ChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("Path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-cdf needs .option(\"path\", <manifest table root>)"))

  /** Read the pinned starting version from the source's metadata dir,
    * or resolve it now and persist it (the V1 `Source` metadataPath
    * exists for exactly this — per-query, checkpoint-scoped state).
    * Driver-only single writer; the pin makes timestamp resolution a
    * one-time event per query lifetime, stable across restarts.
    */
  private[graft] def pinnedVersion(
      spark: org.apache.spark.sql.SparkSession,
      metadataPath: String,
      resolve: () => Long): Long = {
    val dir = new org.apache.hadoop.fs.Path(metadataPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pin = new org.apache.hadoop.fs.Path(dir, "starting_version")
    if (fs.exists(pin)) {
      val in = fs.open(pin)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64)
        var n = in.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toString("UTF-8").trim.toLong
      } finally in.close()
    } else {
      val v = resolve()
      if (!fs.exists(dir)) fs.mkdirs(dir)
      val out = fs.create(pin, false)
      try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
      v
    }
  }

  private def feedSchema(sqlContext: SQLContext, path: String): StructType = {
    val store = new ChunkStore(sqlContext.sparkSession, path,
      format = ManifestTableFormat.factory)
    StructType(store.schema.fields :+
      StructField("_change_type", StringType, nullable = false))
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), feedSchema(sqlContext, pathOf(parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val startingVersion =
      (parameters.get("startingVersion"),
          parameters.get("startingTimestamp")) match {
        case (Some(_), Some(_)) => throw new IllegalArgumentException(
          "graft-cdf: startingVersion and startingTimestamp are " +
            "mutually exclusive")
        case (Some(v), None) => v.toLong
        case (None, Some(ts)) =>
          val millis = ts.trim.toLongOption.getOrElse(
            java.sql.Timestamp.valueOf(ts.trim).getTime)
          // resolve the timestamp to a version ONCE per query and pin
          // it in the source's metadata dir: versionAtTimestamp dates
          // vacuum-pruned history by the checkpoint file's mtime, so
          // re-resolving on restart could shift the lower bound upward
          // and a replayed batch-0 would silently carry fewer snapshot
          // rows than the original run delivered
          pinnedVersion(spark, metadataPath,
            () => mtf.versionAtTimestamp(millis))
        case (None, None) => -1L
      }
    val maxPerBatch = parameters.get("maxVersionsPerBatch").map(_.toLong)
    new GraftChangeFeedSource(
      sqlContext,
      feedSchema(sqlContext, path),
      () => mtf.version,
      (from, to) => mtf.changesBetween(from, to),
      startingVersion,
      maxPerBatch)
  }
}
