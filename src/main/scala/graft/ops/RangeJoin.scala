package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-point range join via bin bucketing (SURVEY C8 at scale).
  *
  * Spark has no native range join: a raw `p.ts BETWEEN i.start AND
  * i.end` condition plans as BroadcastNestedLoopJoin (or a cartesian
  * product) — O(|points|·|intervals|) and a non-starter at 100 TB.
  * Bucketing both sides into fixed-width bins turns it into an
  * EQUI-join: each interval explodes to the bins it overlaps
  * (`len/binWidth + 1` rows — bounded when binWidth is chosen near
  * the typical interval length), each point lands in exactly one bin,
  * and the exact predicate filters the per-bin candidates. One
  * shuffle on (keys, bin), no nested loop, skew-free when bins are
  * sized sanely.
  */
object RangeJoin {

  /** Pairs (point, interval) with `points(pointCol)` in
    * `[intervals(startCol), intervals(endCol)]`, equi-matched on
    * `keys` first. Column names of the two frames must otherwise be
    * disjoint; each qualifying pair appears exactly once (a point has
    * one bin; an interval covers that bin once).
    *
    * `maxBinsPerInterval` bounds the explode fan-out: a single
    * pathological interval (an open-ended sentinel end-time, a
    * mis-chosen binWidth) would otherwise emit millions of bin rows
    * and OOM the stage. The guard FAILS LOUDLY at runtime rather than
    * silently truncating matches — fix the data or widen the bins.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    require(maxBinsPerInterval > 0, s"maxBinsPerInterval=$maxBinsPerInterval")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by pointInInterval")
    val pb = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val startBin = floor(col(startCol) / binWidth).cast("long")
    val endBin = floor(col(endCol) / binWidth).cast("long")
    // the guard lives INSIDE the sequence's end expression so column
    // pruning can never optimize it away
    val guardedEnd = when(
      endBin - startBin >= lit(maxBinsPerInterval.toLong),
      raise_error(concat(
        lit("pointInInterval: interval spans "),
        (endBin - startBin + 1).cast("string"),
        lit(s" bins > maxBinsPerInterval=$maxBinsPerInterval " +
          s"(binWidth=$binWidth) — widen binWidth or cap sentinel " +
          "end-times upstream"))).cast("long"))
      .otherwise(endBin)
    val ib = intervals.withColumn("__bin",
      explode(sequence(startBin, guardedEnd)))
    pb.join(ib, (keys :+ "__bin").toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
