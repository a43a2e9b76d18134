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

  test("tied right timestamps resolve deterministically across layouts") {
    import spark.implicits._
    // three right rows at the SAME (key, ts) — without a tiebreak the
    // carried payload depends on partition-internal order
    val quotes = Seq((1L, 10L, 100.0), (1L, 10L, 101.0), (1L, 10L, 99.0))
      .toDF("k", "qts", "price")
    val trades = Seq((1L, 20L, "t")).toDF("k", "ts", "trade")
    val picked = (1 to 4).map { n =>
      AsOfJoin.asOf(trades, quotes.repartition(n), Seq("k"), "ts", "qts",
        Seq("price")).collect().head.getDouble(3)
    }
    assert(picked.distinct.size == 1,
      s"tied-timestamp winner varied across partitionings: $picked")
  }

  test("left/payload column collisions are rejected, not clobbered") {
    import spark.implicits._
    val quotes = Seq((1L, 10L, 100.0)).toDF("k", "qts", "price")
    val trades = Seq((1L, 20L, 7.0)).toDF("k", "ts", "price")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", "qts", Seq("price"))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("reserved internal names are rejected") {
    import spark.implicits._
    val quotes = Seq((1L, 10L, 100.0)).toDF("k", "qts", "__p")
    val trades = Seq((1L, 20L, "t")).toDF("k", "ts", "trade")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", "qts", Seq("__p"))
    }
  }
}
