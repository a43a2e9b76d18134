package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.ManifestTableFormat
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
  * Column mapping (protocol v5): data files store PHYSICAL column
  * names, the table presents LOGICAL ones. The inner parquet scan is
  * built over the physical schema; pushed filters and pruned columns
  * translate logical→physical on the way in, the scan's readSchema
  * translates back on the way out, and residual filters are returned
  * as the ORIGINAL logical expressions (the inner builder returns a
  * subset of what it was given, mapped back by identity). On a
  * never-renamed table the mapping is the identity and every
  * translation is a no-op.
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
/** The physical parquet scan presented under the table's LOGICAL
  * column names (v5 column mapping) — rows travel positionally, so
  * only `readSchema` needs the translation. `inner` is exposed for
  * plan-shape tests that reach into the FileScan's file index.
  */
final class RenamedScan(
    val inner: Scan,
    logicalOf: Map[String, String]) extends Scan {
  override def readSchema(): StructType =
    StructType(inner.readSchema().fields.map { f =>
      logicalOf.get(f.name.toLowerCase)
        .map(l => StructField(l, f.dataType, f.nullable, f.metadata))
        .getOrElse(f)
    })
  override def description(): String = inner.description()
  override def toBatch: Batch = inner.toBatch
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
}

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

  // logical → physical (lower-cased logical key); identity when the
  // table was never renamed
  private val physOf: Map[String, String] = tableSchema.fields
    .map(f => f.name.toLowerCase -> ManifestTableFormat.physicalName(f))
    .toMap
  private val logicalOf: Map[String, String] = tableSchema.fields
    .map(f => ManifestTableFormat.physicalName(f).toLowerCase -> f.name)
    .toMap
  private val identityMapping = tableSchema.fields.forall(f =>
    ManifestTableFormat.physicalName(f) == f.name)

  private def physSchema(s: StructType): StructType =
    if (identityMapping) s
    else StructType(s.fields.map(f => StructField(
      physOf.getOrElse(f.name.toLowerCase, f.name), f.dataType,
      f.nullable)))

  private def toPhys(e: Expression): Expression =
    if (identityMapping) e
    else e.transform {
      case a: AttributeReference
          if physOf.get(a.name.toLowerCase).exists(_ != a.name) =>
        a.withName(physOf(a.name.toLowerCase))
    }

  private def mk(files: Seq[String]): FileScanBuilder =
    ParquetTable(tableName, spark, options, files,
      Some(physSchema(tableSchema)), classOf[ParquetFileFormat])
      .newScanBuilder(options)
      .asInstanceOf[FileScanBuilder]

  private var inner: FileScanBuilder = mk(paths)

  /** Probe names are PHYSICAL — that is how the stats were recorded,
    * and renames never invalidate them.
    */
  private def typeOf(name: String): Option[(String, DataType)] =
    tableSchema.fields.find(_.name.equalsIgnoreCase(name))
      .map(f => (ManifestTableFormat.physicalName(f), f.dataType))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val probes = StatsProbes.extract(filters, typeOf)
    if (probes.nonEmpty)
      pruner(probes).foreach { files => inner = mk(files) }
    if (identityMapping) inner.pushFilters(filters)
    else {
      // translate in, map residuals back to the caller's expressions
      // (the inner builder returns a subset of its input)
      val pairs = filters.map(f => (f, toPhys(f)))
      val residual = inner.pushFilters(pairs.map(_._2))
      residual.map(r =>
        pairs.find(_._2 eq r).map(_._1).getOrElse(r))
    }
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(physSchema(requiredSchema))

  override def build(): Scan = {
    val built = inner.build()
    if (identityMapping) built
    else new RenamedScan(built, logicalOf)
  }

  // aggregate pushdown forwards to the parquet delegate (footer
  // MIN/MAX/COUNT, behind spark.sql.parquet.aggregatePushdown) — the
  // file list is already pruned by the time the planner asks, so the
  // delegate's footer aggregation runs over exactly the planned
  // subset. Disabled under a non-identity column mapping: the
  // aggregation references logical names the files don't have.
  override def pushAggregation(aggregation: Aggregation): Boolean =
    identityMapping && (inner match {
      case a: SupportsPushDownAggregates => a.pushAggregation(aggregation)
      case _ => false
    })

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    identityMapping && (inner match {
      case a: SupportsPushDownAggregates =>
        a.supportCompletePushDown(aggregation)
      case _ => false
    })
}
