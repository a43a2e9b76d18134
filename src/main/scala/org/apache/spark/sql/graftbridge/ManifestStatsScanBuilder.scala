package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.ManifestTableFormat.StatsProbe
import graft.sink.StatsProbes

/** A parquet ScanBuilder for MANIFEST-format tables that consults the
  * log's per-file stats (url bloom + min/max, per-column min/max +
  * null counts) to shrink the FILE list before delegating to Spark's
  * own parquet scan — Delta-style data skipping, driven by the
  * predicates Catalyst pushes. The layout twin is
  * [[SidecarPrunedScanBuilder]]; this one needs no sidecar because
  * the manifest's add-actions already carry the stats.
  *
  * Lives in the `org.apache.spark.sql` tree for the `private[sql]`
  * `SupportsPushDownCatalystFilters` seam — the only hook that sees
  * predicates BEFORE the scan's file list is fixed.
  *
  * Soundness: probe extraction ([[graft.sink.StatsProbes]]) only
  * fires on an UNWRAPPED attribute compared to a literal OF THE
  * COLUMN'S OWN TYPE — a cast-wrapped attribute (e.g. a float column
  * compared under double) is skipped entirely, because the literal's
  * canonical rendering would not be the rendering the stats side used
  * and cross-representation rounding could invert an ordering. The
  * evaluation side
  * ([[graft.sink.ManifestTableFormat.pruneFilesForScan]]) is
  * fail-open on every absent/uncastable stat, and all original
  * predicates still reach the parquet scan (row-group pruning +
  * residual filters), so results equal the unpruned scan's.
  */
class ManifestStatsScanBuilder(
    spark: SparkSession,
    tableName: String,
    tableSchema: StructType,
    paths: Seq[String],
    options: CaseInsensitiveStringMap,
    pruner: Seq[StatsProbe] => Option[Seq[String]])
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private def mk(files: Seq[String]): FileScanBuilder =
    ParquetTable(tableName, spark, options, files, Some(tableSchema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
      .asInstanceOf[FileScanBuilder]

  private var inner: FileScanBuilder = mk(paths)

  private def typeOf(name: String): Option[(String, DataType)] =
    tableSchema.fields.find(_.name.equalsIgnoreCase(name))
      .map(f => (f.name, f.dataType))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val probes = StatsProbes.extract(filters, typeOf)
    if (probes.nonEmpty)
      pruner(probes).foreach { files => inner = mk(files) }
    inner.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def build(): Scan = inner.build()

  // aggregate pushdown forwards to the parquet delegate (footer
  // MIN/MAX/COUNT, behind spark.sql.parquet.aggregatePushdown) — the
  // file list is already pruned by the time the planner asks, so the
  // delegate's footer aggregation runs over exactly the planned subset
  override def pushAggregation(aggregation: Aggregation): Boolean =
    inner match {
      case a: SupportsPushDownAggregates => a.pushAggregation(aggregation)
      case _ => false
    }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner match {
      case a: SupportsPushDownAggregates =>
        a.supportCompletePushDown(aggregation)
      case _ => false
    }
}
