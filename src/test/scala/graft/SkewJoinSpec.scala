package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def lineitem = Tables(spark, sf(), "lineitem")
  private def part = Tables(spark, sf(), "part")
    .select("p_partkey", "p_name", "p_retailprice")

  test("salted join is row-identical to the plain inner join") {
    val l = lineitem
    val p = part
    val plain = l.join(p, l("l_partkey") === p("p_partkey")).drop("p_partkey")
    val salted = SkewJoin.salted(l, "l_partkey", p, "p_partkey", 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === plain.count())
  }

  test("salted join survives a skewed fact side (hot key)") {
    // every 3rd lineitem row remapped to one hot part key — the shape
    // salting exists for; result must still match the plain join
    val skewed = lineitem.withColumn("l_partkey",
      when(col("l_orderkey") % 3 === 0, lit(1L)).otherwise(col("l_partkey")))
    val p = part
    val plain = skewed.join(p, skewed("l_partkey") === p("p_partkey"))
      .drop("p_partkey")
    val salted = SkewJoin.salted(skewed, "l_partkey", p, "p_partkey", 16)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("physical plan: shuffled join keyed on (key, __salt), no broadcast") {
    val salted = SkewJoin.salted(lineitem, "l_partkey", part, "p_partkey", 8)
    salted.collect()
    val plan = salted.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("SortMergeJoin"), s"want SortMergeJoin in:\n$s")
    assert(!s.contains("BroadcastHashJoin"), "salting must not broadcast")
    assert(s.contains("__salt"), "join keys must include the salt bucket")
    // both sides shuffle (that is the join); no EXTRA exchange beyond
    // the two join inputs
    val shuffles = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 2, s"expected ≤2 exchanges, got ${shuffles.size}")
  }

  test("hotKeys reports top keys with shares, exact against a reference") {
    val hk = SkewJoin.hotKeys(lineitem, "l_returnflag", 2).collect()
    assert(hk.length === 2)
    assert(hk(0).getLong(1) >= hk(1).getLong(1))
    // shares are n/total for the TRUE grand total (all keys, not top-k)
    val total = lineitem.count().toDouble
    hk.foreach { r =>
      assert(r.getDouble(2) ===
        BigDecimal(r.getLong(1) / total)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("hotKeys scans the input once (the grand total comes from a " +
      "window over the aggregate, not a second count pass)") {
    val df = SkewJoin.hotKeys(lineitem, "l_returnflag", 2)
    df.collect()
    // final AQE plan only (toString appends the initial plan too)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n${plan.take(3000)}")
    // and the scan reads ONLY the key column (count needs nothing else)
    assert(plan.contains("ReadSchema: struct<l_returnflag:string>"),
      plan.take(3000))
  }

  test("reserved column name rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.salted(lineitem.withColumn("__salt", lit(1)), "l_partkey",
        part, "p_partkey", 4)
    }
  }
}
