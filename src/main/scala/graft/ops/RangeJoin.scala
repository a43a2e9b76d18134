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
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by pointInInterval")
    val pb = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    pb.join(ib, (keys :+ "__bin").toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
