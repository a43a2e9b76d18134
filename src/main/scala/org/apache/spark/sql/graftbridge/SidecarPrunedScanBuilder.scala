package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{NumericType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A parquet ScanBuilder that consults layout sidecars (`_hulls`
  * min/max hulls, `_keybloom` per-file key blooms) to shrink the FILE
  * list before delegating to Spark's own parquet scan — the SQL twin
  * of `Layout.prunedScan`/`prunedScanByKey`, driven by the predicates
  * Catalyst pushes instead of API arguments. Lives in the
  * `org.apache.spark.sql` tree because the pushdown rule speaks the
  * `private[sql]` `SupportsPushDownCatalystFilters` interface (the
  * same one Spark's own file sources implement), which is the only
  * hook that sees predicates BEFORE the scan's file list is fixed.
  *
  * Soundness: pruning only ever DROPS files whose manifest stats
  * prove they cannot match a conjunct (closed-interval hull overlap —
  * strict bounds widen to non-strict; bloom membership has no false
  * negatives), unknown files are always read (`Layout.readSet`), all
  * original predicates still reach the parquet scan for row-group
  * pruning AND remain as residual filters per the usual pushdown
  * contract — so results equal the unpruned scan's on any manifest
  * state. Everything else (column pruning, vectorization, codegen) is
  * the delegate's.
  */
class SidecarPrunedScanBuilder(
    spark: SparkSession,
    tableName: String,
    dir: String,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private def mk(paths: Seq[String]): FileScanBuilder =
    ParquetTable(tableName, spark, options, paths, Some(tableSchema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
      .asInstanceOf[FileScanBuilder]

  private var inner: FileScanBuilder = mk(Seq(dir))

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val conjuncts = filters.flatMap(split)
    val intervals = conjuncts.flatMap(interval)
    val keyEqs = conjuncts.flatMap(keyEquality)
      .groupBy(_._1).map { case (k, vs) =>
        // conjunctive equality sets INTERSECT; any single conjunct's
        // value list alone is a sound (superset) probe — use the
        // smallest for the tightest prune
        k -> vs.map(_._2).minBy(_.size)
      }
    graft.ops.Layout.pruneFilesForScan(spark, dir, intervals, keyEqs)
      .foreach { files => inner = mk(files) }
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

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  /** The literal as a DIRECTION-AWARE double pair (lo ≤ exact value ≤
    * hi): Long/Decimal values beyond 2^53 are not exactly
    * representable, and nearest-rounding a LOWER bound UP (or an
    * upper bound down) would prune a file that holds matching rows —
    * silently wrong results, the exact hazard `Layout.typedBounds`'s
    * own comment warns about. Rounding outward instead only widens
    * the interval: at worst one extra file is read.
    */
  private def num(v: Any): Option[(Double, Double)] = {
    def outward(bd: scala.math.BigDecimal): (Double, Double) = {
      val d = bd.toDouble
      val back = scala.math.BigDecimal(d)
      val lo = if (back > bd) Math.nextDown(d) else d
      val hi = if (back < bd) Math.nextUp(d) else d
      (lo, hi)
    }
    v match {
      case n: java.lang.Long => Some(outward(scala.math.BigDecimal(n.longValue())))
      case n: java.lang.Integer => Some((n.doubleValue(), n.doubleValue()))
      case n: java.lang.Short => Some((n.doubleValue(), n.doubleValue()))
      case n: java.lang.Byte => Some((n.doubleValue(), n.doubleValue()))
      case n: java.lang.Double => Some((n.doubleValue(), n.doubleValue()))
      case n: java.lang.Float => Some((n.doubleValue(), n.doubleValue()))
      case d: java.math.BigDecimal => Some(outward(scala.math.BigDecimal(d)))
      case d: scala.math.BigDecimal => Some(outward(d))
      case d: org.apache.spark.sql.types.Decimal =>
        Some(outward(d.toBigDecimal))
      case n: Number => Some(outward(scala.math.BigDecimal(n.toString)))
      case _ => None
    }
  }

  /** A one-sided/closed interval a `_hulls` manifest can test. Strict
    * bounds widen to non-strict, and inexact literals widen outward
    * (both sound: may read one extra file, never skip a matching one).
    */
  private def interval(e: Expression): Option[(String, Double, Double)] =
    e match {
      case GreaterThanOrEqual(a: Attribute, Literal(v, _: NumericType)) =>
        num(v).map { case (lo, _) => (a.name, lo, Double.MaxValue) }
      case GreaterThan(a: Attribute, Literal(v, _: NumericType)) =>
        num(v).map { case (lo, _) => (a.name, lo, Double.MaxValue) }
      case LessThanOrEqual(a: Attribute, Literal(v, _: NumericType)) =>
        num(v).map { case (_, hi) => (a.name, -Double.MaxValue, hi) }
      case LessThan(a: Attribute, Literal(v, _: NumericType)) =>
        num(v).map { case (_, hi) => (a.name, -Double.MaxValue, hi) }
      case EqualTo(a: Attribute, Literal(v, _: NumericType)) =>
        num(v).map { case (lo, hi) => (a.name, lo, hi) }
      // literal-on-the-left mirrors
      case GreaterThanOrEqual(Literal(v, _: NumericType), a: Attribute) =>
        num(v).map { case (_, hi) => (a.name, -Double.MaxValue, hi) }
      case GreaterThan(Literal(v, _: NumericType), a: Attribute) =>
        num(v).map { case (_, hi) => (a.name, -Double.MaxValue, hi) }
      case LessThanOrEqual(Literal(v, _: NumericType), a: Attribute) =>
        num(v).map { case (lo, _) => (a.name, lo, Double.MaxValue) }
      case LessThan(Literal(v, _: NumericType), a: Attribute) =>
        num(v).map { case (lo, _) => (a.name, lo, Double.MaxValue) }
      case EqualTo(Literal(v, _: NumericType), a: Attribute) =>
        num(v).map { case (lo, hi) => (a.name, lo, hi) }
      case _ => None
    }

  /** An equality/IN probe a `_keybloom` manifest can test. Values
    * render as strings; the probe side re-casts to the manifest's
    * recorded key type before hashing (Layout.keyedSurvivors).
    */
  private def keyEquality(e: Expression): Option[(String, Seq[String])] =
    e match {
      case EqualTo(a: Attribute, l: Literal) if l.value != null =>
        Some((a.name, Seq(String.valueOf(l.value))))
      case EqualTo(l: Literal, a: Attribute) if l.value != null =>
        Some((a.name, Seq(String.valueOf(l.value))))
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall {
          case l: Literal => l.value != null
          case _ => false
        } =>
        Some((a.name, vs.collect { case l: Literal =>
          String.valueOf(l.value) }))
      case InSet(a: Attribute, hset) if hset.nonEmpty &&
          !hset.contains(null) =>
        Some((a.name, hset.toSeq.map(String.valueOf)))
      case _ => None
    }
}
