package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** Keyed as-of join: exactness vs brute force, strict vs non-strict
  * at equal timestamps, missing-key and no-predecessor nulls.
  */
class AsOfJoinSpec extends SparkSpec {

  test("matches brute-force latest-at-or-before per key") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 30L, 99.0),
      (2L, 15L, 50.0)).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, 5L, "t1"), (1L, 20L, "t2"), (1L, 25L, "t3"), (1L, 35L, "t4"),
      (2L, 14L, "t5"), (3L, 40L, "t6")).toDF("k", "ts", "trade")

    val got = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", "qts",
        Seq("price"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq

    assert(got == Seq(
      (1L, 5L, "t1", None),          // no quote yet
      (1L, 20L, "t2", Some(101.0)),  // equal ts visible (non-strict)
      (1L, 25L, "t3", Some(101.0)),
      (1L, 35L, "t4", Some(99.0)),
      (2L, 14L, "t5", None),
      (3L, 40L, "t6", None)))        // key absent on the right
  }

  test("strict mode excludes the equal-timestamp right row") {
    import spark.implicits._
    val quotes = Seq((1L, 20L, 101.0), (1L, 10L, 100.0))
      .toDF("k", "qts", "price")
    val trades = Seq((1L, 20L, "t")).toDF("k", "ts", "trade")
    val v = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", "qts",
        Seq("price"), strict = true)
      .collect().head.getDouble(3)
    assert(v == 100.0)
  }
}
