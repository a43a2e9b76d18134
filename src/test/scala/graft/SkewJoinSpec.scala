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

  test("hotKeys reports top keys with shares") {
    val hk = SkewJoin.hotKeys(lineitem, "l_returnflag", 2).collect()
    assert(hk.length === 2)
    assert(hk(0).getLong(1) >= hk(1).getLong(1))
    val share = hk(0).getDouble(2)
    assert(share > 0.0 && share <= 1.0)
  }

  test("reserved column name rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.salted(lineitem.withColumn("__salt", lit(1)), "l_partkey",
        part, "p_partkey", 4)
    }
  }
}
