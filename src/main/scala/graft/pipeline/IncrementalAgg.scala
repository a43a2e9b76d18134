package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.{ChunkStore, GraftMergeDelete, GraftMergeInsert, GraftMergeUpdate, ManifestTableFormat}

/** INCREMENTAL AGGREGATE MAINTENANCE off the change feed (B13) — the
  * materialized-view story at 100 TB: a derived manifest table
  * holding `GROUP BY <groupCols>` aggregates of a source manifest
  * table advances to the source's head in O(churn), never by
  * re-aggregating the corpus.
  *
  * Maintained aggregates are the DECOMPOSABLE ones — the ones a
  * row-level delta can update without re-reading the group:
  *  - `cnt`     = COUNT(*)
  *  - `sum_<c>` = SUM(c)   (exact SQL semantics: NULL when the group
  *                          has no non-null c)
  *  - `nn_<c>`  = COUNT(c) (the non-null count that makes the SUM
  *                          NULL rule maintainable; AVG(c) is
  *                          `sum_<c> / nn_<c>` at read time)
  * MIN/MAX are NOT incrementally maintainable under deletes (losing
  * the current extremum needs a group re-scan) and are refused
  * loudly, as is any non-numeric sum column.
  *
  * How one [[catchUp]] advances:
  *  1. `from` = the agg table's recorded high-water marker for this
  *     source (a v4 streaming-txn marker — see exactly-once below);
  *     `head` = the source's current version.
  *  2. `changesBetween(from, head)` (reads churn-touched files only)
  *     signs every changed row (+1 insert / −1 delete) and folds to
  *     ONE delta row per touched group: `(Δcnt, Δnn_c, Δsum_c)`.
  *  3. The delta MERGEs into the agg table — matched groups add the
  *     deltas (a group whose count reaches 0 DELETEs its row),
  *     unmatched groups with positive count INSERT. Affected-file
  *     selection is the merge's own pre-scan, so only agg files
  *     holding touched groups rewrite: the whole step is O(churn) +
  *     O(touched agg files).
  *
  * EXACTLY-ONCE: the merge commit carries an `(appId, head)`
  * transaction marker ATOMICALLY with its file actions (the same v4
  * machinery as exactly-once streaming appends). A crash between
  * commit and anything else replays the span, finds the marker at or
  * above `head`, and no-ops — deltas can never double-apply, which a
  * sidecar-after-commit design could not guarantee for
  * non-idempotent aggregate addition.
  *
  * Retention contract: `from` must stay reconstructable at the
  * source (the [[ManifestTableFormat.changesBetween]] rule) — sync at
  * least as often as the source's checkpoint+vacuum cadence.
  */
object IncrementalAgg {

  /** Outcome of one catch-up: the span applied and groups touched. */
  final case class Stats(fromVersion: Long, toVersion: Long, groups: Long)

  /** Run the maintenance CONTINUOUSLY: a `graft-cdf` stream on the
    * source is the wake signal, each micro-batch tick runs one
    * [[catchUp]]. The agg's own version-keyed txn marker — not the
    * stream checkpoint — is the exactly-once state, so the runner
    * converges from ANY checkpoint state (fresh, stale, deleted):
    * the stream only decides WHEN to look, never what was applied.
    * Caller owns the query lifecycle (same contract as
    * [[ChangeFeedSync.start]]).
    */
  def start(
      spark: SparkSession,
      srcPath: String,
      aggPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-cdf")
      .option("path", srcPath)
      .load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        catchUp(spark, srcPath, aggPath, groupCols, sumCols)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Drain everything currently committed and return — the
    * maintenance-cadence entry point.
    */
  def syncOnce(
      spark: SparkSession,
      srcPath: String,
      aggPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      checkpointDir: String): Unit =
    start(spark, srcPath, aggPath, groupCols, sumCols, checkpointDir)
      .awaitTermination()

  /** The marker app id recorded in the AGG table's log for `src`. */
  def appId(srcPath: String): String = s"graft-incr-agg:$srcPath"

  private def sumKinds(t: DataType): Boolean = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Advance the aggregate table at `aggPath` to the head of the
    * manifest table at `srcPath`. Creates the agg table (with its
    * derived schema) on first call. Returns the span applied.
    */
  def catchUp(
      spark: SparkSession,
      srcPath: String,
      aggPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String]): Stats = {
    require(groupCols.nonEmpty, "incremental agg needs group columns")
    require(groupCols.intersect(sumCols).isEmpty,
      s"a column cannot be both group and sum: ${
        groupCols.intersect(sumCols).mkString(", ")}")
    val srcStore = new ChunkStore(spark, srcPath,
      format = ManifestTableFormat.factory)
    val srcMtf = new ManifestTableFormat(spark, srcPath, srcStore.schema)
    val srcSchema = srcMtf.currentSchema
    def fieldOf(n: String): StructField = srcSchema.fields
      .find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"incremental agg at $aggPath: column '$n' is not in " +
            s"$srcPath's schema (${srcSchema.fieldNames.mkString(", ")})"))
    val gFields = groupCols.map(fieldOf)
    val sFields = sumCols.map(fieldOf)
    sFields.foreach(f => require(sumKinds(f.dataType),
      s"incremental agg at $aggPath: SUM over ${f.name}: " +
        s"${f.dataType.simpleString} is not maintainable — supported " +
        "aggregates are COUNT(*) + SUM/COUNT of numeric columns " +
        "(AVG = sum/nn at read time; MIN/MAX need a group re-scan " +
        "under deletes and are deliberately not offered)"))
    // SUM result types via Spark's own typing (one empty-frame probe)
    val sumTypes: Map[String, DataType] =
      if (sumCols.isEmpty) Map.empty
      else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], srcSchema)
        .agg(sum(col(sFields.head.name)).as("0"),
          sFields.tail.zipWithIndex.map { case (f, i) =>
            sum(col(f.name)).as(s"${i + 1}") }: _*)
        .schema.fields.zipWithIndex
        .map { case (f, i) => sFields(i).name -> f.dataType }.toMap
    val aggSchema = StructType(
      gFields.map(f => StructField(f.name, f.dataType, nullable = true)) ++
        Seq(StructField("cnt", LongType, nullable = false)) ++
        sFields.flatMap(f => Seq(
          StructField(s"sum_${f.name}", sumTypes(f.name), nullable = true),
          StructField(s"nn_${f.name}", LongType, nullable = false))))

    val fs = new Path(aggPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aggStore = new ChunkStore(spark, aggPath,
      format = ManifestTableFormat.factory)
    val aggMtf = new ManifestTableFormat(spark, aggPath, aggStore.schema)
    if (!fs.exists(new Path(aggPath, "_log")))
      aggMtf.initializeTable(Some(aggSchema), Nil)
    else require(
      aggMtf.currentSchema.fieldNames.toSeq == aggSchema.fieldNames.toSeq,
      s"agg table at $aggPath has columns ${
        aggMtf.currentSchema.fieldNames.mkString(", ")} but this spec " +
        s"derives ${aggSchema.fieldNames.mkString(", ")} — one agg " +
        "table maintains one (groupCols, sumCols) spec")

    val app = appId(srcPath)
    val head = srcMtf.version
    require(head >= 0, s"no commits at $srcPath")
    val from = aggMtf.streamTransactions.toMap.getOrElse(app, -1L)
    if (from >= head) return Stats(from, head, 0L)

    val delta = srcMtf.changesBetween(from, head)
    val sign = when(col("_change_type") === lit("insert"), 1L)
      .otherwise(-1L)
    val aggExprs =
      sum(sign).as("__dcnt") +:
      sFields.flatMap(f => Seq(
        coalesce(sum(when(col(f.name).isNotNull,
            sign * col(f.name)).otherwise(lit(0))), lit(0))
          .cast(sumTypes(f.name)).as(s"__dsum_${f.name}"),
        sum(when(col(f.name).isNotNull, sign).otherwise(lit(0L)))
          .as(s"__dnn_${f.name}")))
    val groupDelta = delta
      .groupBy(gFields.map(f => col(f.name)): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .persist()
    try {
      val groups = groupDelta.count()
      if (groups == 0L) {
        // nothing changed row-wise across the span (e.g. compaction
        // commits): advance the marker alone, atomically
        aggMtf.appendStream(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          aggSchema), app, head)
        return Stats(from, head, 0L)
      }
      val t = "__graft_t"
      val s = "__graft_s"
      val onCond = gFields.map(f =>
        col(s"$t.${f.name}") <=> col(s"$s.${f.name}")).reduce(_ && _)
      val newCnt = col(s"$t.cnt") + col(s"$s.__dcnt")
      def newNn(c: String) = col(s"$t.nn_$c") + col(s"$s.__dnn_$c")
      def newSum(c: String) =
        when(newNn(c) === 0L, lit(null))
          .otherwise(coalesce(col(s"$t.sum_$c"), lit(0)) +
            col(s"$s.__dsum_$c"))
      val matched = Seq(
        GraftMergeDelete(Some(newCnt <= 0L)),
        GraftMergeUpdate(None,
          ("cnt" -> (newCnt: Column)) +: sumCols.flatMap(c => Seq(
            s"sum_$c" -> (newSum(c): Column),
            s"nn_$c" -> (newNn(c): Column)))))
      val notMatched = Seq(
        GraftMergeInsert(Some(col(s"$s.__dcnt") > 0L),
          groupCols.map(g => g -> (col(s"$s.$g"): Column)) ++
            Seq("cnt" -> (col(s"$s.__dcnt"): Column)) ++
            sumCols.flatMap(c => Seq(
              s"sum_$c" -> (when(col(s"$s.__dnn_$c") === 0L, lit(null))
                .otherwise(col(s"$s.__dsum_$c")): Column),
              s"nn_$c" -> (col(s"$s.__dnn_$c"): Column)))))
      aggMtf.mergeInto(groupDelta, onCond, matched, notMatched, Nil,
        urlProbe = None, txn = Some((app, head)))
      Stats(from, head, groups)
    } finally groupDelta.unpersist()
  }
}
