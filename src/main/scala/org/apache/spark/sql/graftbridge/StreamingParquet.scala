package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, EvalMode, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
import org.apache.spark.sql.execution.datasources.DataSourceUtils
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** The one staged file (possibly none — empty task) a DSv2 streaming
  * task reports back to the driver's `StreamingWrite.commit`.
  */
case class StagedStreamFile(file: String, rows: Long)
    extends WriterCommitMessage

/** Bridge into the `private[sql]`/`private[spark]` machinery the DSv2
  * STREAMING_WRITE task path needs (package-tree technique, same file
  * placement as [[Bridge]]):
  *
  *  - `ParquetOutputWriter` + `ParquetWriteSupport` — Spark's own
  *    InternalRow → parquet writer (vectorizable files, identical
  *    on-disk shape to the driver-side `df.write.parquet` path);
  *  - `SessionState.newHadoopConf()` — the Hadoop conf with EVERY
  *    SQL conf entry copied in, which is how `ParquetWriteSupport
  *    .init` receives legacy-format/timestamp-type/rebase/timezone
  *    settings on executors;
  *  - `SerializableConfiguration` — ships that conf inside the
  *    (serialized) writer factory;
  *  - `DataSourceUtils.PARTITIONING_COLUMNS_KEY` — the option key
  *    `DataStreamWriter` encodes `.partitionBy` under (V1 seam) and
  *    users can set directly for V2 bootstrap.
  *
  * Break mode: any member moving → compile error here;
  * `StreamWriterV2Spec` round-trips rows through an executor-written
  * file, so a semantic change fails the suite.
  */
object StreamingParquet {

  /** Driver-side: the Hadoop conf executor tasks write parquet under —
    * session SQL confs + write-support class + physical schema +
    * session compression codec.
    */
  def writerConf(
      spark: SparkSession, physSchema: StructType)
      : SerializableConfiguration = {
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val sqlConf = classic.sessionState.conf
    val conf = classic.sessionState.newHadoopConf()
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(physSchema, conf)
    conf.set(ParquetOutputFormat.COMPRESSION,
      new ParquetOptions(Map.empty[String, String], sqlConf)
        .compressionCodecClassName)
    // ParquetWriteSupport.init ASSERTS these are present (the session
    // defaults are not in newHadoopConf unless explicitly set) — the
    // same five ParquetFileFormat.prepareWrite pins for its tasks
    import org.apache.spark.sql.internal.SQLConf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(
        SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    new SerializableConfiguration(conf)
  }

  /** Whether ANSI cast semantics apply to input→table type coercion
    * (decided on the driver from the session conf, shipped to tasks).
    */
  def ansiEnabled(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.ansiEnabled

  def sessionTimeZone(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.sessionLocalTimeZone

  /** The option key `.partitionBy` columns are JSON-encoded under. */
  def partitioningColumnsKey: String =
    DataSourceUtils.PARTITIONING_COLUMNS_KEY

  def decodePartitioningColumns(encoded: String): Seq[String] =
    DataSourceUtils.decodePartitioningColumns(encoded)
}

/** Serialized to executors; one writer per task. `mapping` aligns the
  * incoming row to the table's physical column order: source ordinal
  * in the input schema, or -1 for an evolved column the input does
  * not carry (null fill) — resolved ONCE on the driver so tasks do
  * no name matching.
  */
class StreamingParquetWriterFactory(
    conf: SerializableConfiguration,
    stagingDir: String,
    inputSchema: StructType,
    mapping: Seq[(Int, DataType)],
    ansiCast: Boolean,
    timeZoneId: String) extends StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new StreamingParquetDataWriter(conf, stagingDir, inputSchema,
      mapping, ansiCast, timeZoneId, partitionId, taskId, epochId)
}

class StreamingParquetDataWriter(
    conf: SerializableConfiguration,
    stagingDir: String,
    inputSchema: StructType,
    mapping: Seq[(Int, DataType)],
    ansiCast: Boolean,
    timeZoneId: String,
    partitionId: Int,
    taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {

  // taskId (the TID) is unique per application, so concurrent
  // attempts of one partition never collide on the file name; the
  // epoch is in the name for operability (which batch staged this)
  private val file = new Path(stagingDir,
    f"part-$epochId%05d-$partitionId%05d-$taskId.parquet")

  private lazy val proj = {
    val exprs: Seq[Expression] = mapping.map { case (ord, dt) =>
      if (ord < 0) Literal.create(null, dt)
      else {
        val in = inputSchema(ord)
        val ref = BoundReference(ord, in.dataType, in.nullable)
        if (in.dataType == dt) ref
        else Cast(ref, dt, Option(timeZoneId),
          if (ansiCast) EvalMode.ANSI else EvalMode.LEGACY)
      }
    }
    UnsafeProjection.create(exprs)
  }

  // created on the first row: an empty task stages no file at all
  private var writer: ParquetOutputWriter = null
  private var rows = 0L

  private def ensureWriter(): Unit = if (writer == null) {
    val attemptId = new TaskAttemptID(
      new TaskID(new JobID("graft-stream", 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(conf.value, attemptId)
    writer = new ParquetOutputWriter(file.toString, ctx)
  }

  override def write(row: InternalRow): Unit = {
    ensureWriter()
    // ParquetWriteSupport consumes the row synchronously — the
    // projection's reused buffer never escapes the call
    writer.write(proj(row))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    StagedStreamFile(if (rows > 0) file.toString else "", rows)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close()
      catch { case scala.util.control.NonFatal(_) => () }
      file.getFileSystem(conf.value).delete(file, false)
    }
  }

  override def close(): Unit = ()
}
