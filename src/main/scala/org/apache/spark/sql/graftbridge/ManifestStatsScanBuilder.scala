package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.ManifestTableFormat
import graft.sink.ManifestTableFormat.{NullTest, NumRange, StatsProbe, StrRange, UrlIn}

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
  * Soundness: extraction here only emits a probe when the pushed
  * conjunct is an UNWRAPPED attribute compared to a literal OF THE
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
    with SupportsPushDownRequiredColumns {

  private def mk(files: Seq[String]): FileScanBuilder =
    ParquetTable(tableName, spark, options, files, Some(tableSchema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
      .asInstanceOf[FileScanBuilder]

  private var inner: FileScanBuilder = mk(paths)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val probes = filters.flatMap(split).flatMap(probe)
    if (probes.nonEmpty)
      pruner(probes).foreach { files => inner = mk(files) }
    inner.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def build(): Scan = inner.build()

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  private def isUrl(a: Attribute): Boolean =
    a.name.equalsIgnoreCase("document_url")

  /** The literal rendered EXACTLY as the stats write side renders the
    * column's values (`ManifestTableFormat.renderLo/statEncode`):
    * both sides of every later comparison go through the same
    * canonical-string mapping, which is what makes grid rounding
    * monotone and the prune sound. None = no sound rendering.
    */
  private def render(v: Any, t: DataType): Option[String] = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DateType | _: TimestampType =>
      Some(String.valueOf(v)) // Date = epoch days Int, Ts = micros Long
    case _: BooleanType =>
      Some(if (v.asInstanceOf[Boolean]) "1" else "0")
    case _: FloatType | _: DoubleType => Some(String.valueOf(v))
    case _: DecimalType =>
      Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toPlainString)
    case _: StringType => Some(v.toString)
    case _ => None
  }

  private def isNumKind(t: DataType): Boolean = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DateType | _: TimestampType | _: BooleanType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def range(a: Attribute, lo: Option[String], hi: Option[String])
      : Option[StatsProbe] =
    if (isNumKind(a.dataType)) Some(NumRange(a.name, lo, hi))
    else if (a.dataType.isInstanceOf[StringType])
      Some(StrRange(a.name, lo, hi))
    else None

  /** A typed (attribute, literal) pair this builder will probe: the
    * attribute bare and the literal's type EXACTLY the column's.
    */
  private def cmp(l: Expression, r: Expression)
      : Option[(Attribute, String)] = (l, r) match {
    case (a: Attribute, lit: Literal)
        if lit.value != null && lit.dataType == a.dataType =>
      render(lit.value, lit.dataType).map(s => (a, s))
    case _ => None
  }

  private def probe(e: Expression): Seq[StatsProbe] = e match {
    case EqualTo(l, r) => eqProbes(l, r) ++ eqProbes(r, l)
    case EqualNullSafe(l, r) => eqProbes(l, r) ++ eqProbes(r, l)
    case GreaterThan(l, r) =>
      cmp(l, r).toSeq.flatMap { case (a, v) => range(a, Some(v), None) } ++
        cmp(r, l).toSeq.flatMap { case (a, v) => range(a, None, Some(v)) }
    case GreaterThanOrEqual(l, r) =>
      cmp(l, r).toSeq.flatMap { case (a, v) => range(a, Some(v), None) } ++
        cmp(r, l).toSeq.flatMap { case (a, v) => range(a, None, Some(v)) }
    case LessThan(l, r) =>
      cmp(l, r).toSeq.flatMap { case (a, v) => range(a, None, Some(v)) } ++
        cmp(r, l).toSeq.flatMap { case (a, v) => range(a, Some(v), None) }
    case LessThanOrEqual(l, r) =>
      cmp(l, r).toSeq.flatMap { case (a, v) => range(a, None, Some(v)) } ++
        cmp(r, l).toSeq.flatMap { case (a, v) => range(a, Some(v), None) }
    case IsNull(a: Attribute) => Seq(NullTest(a.name, isNull = true))
    case IsNotNull(a: Attribute) => Seq(NullTest(a.name, isNull = false))
    case In(a: Attribute, vs) if isUrl(a) && vs.nonEmpty && vs.forall {
        case l: Literal => l.value != null &&
          l.dataType.isInstanceOf[StringType]
        case _ => false
      } =>
      Seq(UrlIn(vs.collect { case l: Literal => l.value.toString }))
    case InSet(a: Attribute, hset) if isUrl(a) && hset.nonEmpty &&
        !hset.contains(null) =>
      Seq(UrlIn(hset.toSeq.map(String.valueOf)))
    case In(a: Attribute, vs) if intIn(a, vs) =>
      val nums = vs.collect { case l: Literal =>
        l.value.asInstanceOf[Number].longValue }
      Seq(NumRange(a.name,
        Some(nums.min.toString), Some(nums.max.toString)))
    case _ => Seq.empty
  }

  /** Both sides of an equality, orientation-normalized: the (attr,
    * literal) orientation yields a degenerate range probe, and a url
    * equality additionally a bloom probe.
    */
  private def eqProbes(l: Expression, r: Expression): Seq[StatsProbe] =
    cmp(l, r).toSeq.flatMap { case (a, v) =>
      range(a, Some(v), Some(v)).toSeq ++
        (if (isUrl(a)) Seq(UrlIn(Seq(v))) else Nil)
    }

  /** IN over an integral-typed column with literals of the column's
    * exact type — min/max of the value set is a sound superset range
    * (integral ordering matches the canonical-string-decimal grid).
    */
  private def intIn(a: Attribute, vs: Seq[Expression]): Boolean =
    (a.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
      case _ => false
    }) && vs.nonEmpty && vs.forall {
      case l: Literal => l.value != null && l.dataType == a.dataType
      case _ => false
    }
}
