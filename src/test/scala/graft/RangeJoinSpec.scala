package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Binned interval join (C8b): exactness vs a brute-force inequality
  * join, including intervals spanning many bins and bin-boundary
  * points.
  */
class RangeJoinSpec extends SparkSpec {

  test("matches the brute-force inequality join exactly") {
    import spark.implicits._
    val points = Seq((1L, 0L), (1L, 5L), (1L, 10L), (1L, 99L), (2L, 5L))
      .toDF("k", "t")
    // intervals deliberately longer than one bin (width 4)
    val intervals = Seq((1L, 0L, 9L, "a"), (1L, 4L, 97L, "b"), (2L, 6L, 8L, "c"))
      .toDF("k", "s", "e", "tag")

    val binned = RangeJoin
      .pointInInterval(points, intervals, "t", "s", "e", binWidth = 4L,
        keys = Seq("k"))
      .select("k", "t", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val brute = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") &&
          col("p.t") >= col("i.s") && col("p.t") <= col("i.e"))
      .select(col("p.k"), col("p.t"), col("i.tag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    assert(binned == brute)
    assert(brute.contains((1L, 0L, "a"))) // boundary: t == s
    assert(brute.contains((1L, 5L, "b"))) // interior of a 24-bin interval
    assert(!brute.exists(_ == ((2L, 5L, "c")))) // below interval, same key
  }

  test("each qualifying pair appears exactly once (no bin duplicates)") {
    import spark.implicits._
    val points = Seq((1L, 50L)).toDF("k", "t")
    val intervals = Seq((1L, 0L, 100L, "wide")).toDF("k", "s", "e", "tag")
    val n = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      binWidth = 7L, keys = Seq("k")).count()
    assert(n == 1L)
  }

  test("a pathological open-ended interval fails loudly, not by OOM") {
    import spark.implicits._
    val points = Seq((1L, 50L)).toDF("k", "t")
    // a sentinel end-time (Long.MaxValue-ish) would explode to ~10^15
    // bin rows without the guard
    val intervals = Seq((1L, 0L, Long.MaxValue / 2, "sentinel"))
      .toDF("k", "s", "e", "tag")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
        binWidth = 4L, keys = Seq("k")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxBinsPerInterval")))
  }

  test("maxBinsPerInterval is a bound, not a behavior change below it") {
    import spark.implicits._
    val points = Seq((1L, 50L), (1L, 150L)).toDF("k", "t")
    val intervals = Seq((1L, 0L, 160L, "wide")).toDF("k", "s", "e", "tag")
    val n = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      binWidth = 4L, keys = Seq("k"), maxBinsPerInterval = 41).count()
    assert(n == 2L) // 41 bins exactly — at the cap, still fine
  }
}
