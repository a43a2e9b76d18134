package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic hash sampling (D7): reproducibility, rate accuracy,
  * and salt independence.
  */
class SamplingSpec extends SparkSpec {

  test("sample is deterministic and hits the target fraction") {
    val events = Tables(spark, sf("sf0.01"), "events")
    val n = events.count()
    val s1 = Sampling.deterministicSample(events, "event_id", 0.2)
    val s2 = Sampling.deterministicSample(events, "event_id", 0.2)
    val c1 = s1.count()
    assert(c1 == s2.count())
    // 16-bit threshold → binomial; allow ±4 sigma around 0.2
    val sigma = math.sqrt(n * 0.2 * 0.8)
    assert(math.abs(c1 - 0.2 * n) < 4 * sigma, s"$c1 of $n")
    // membership is identical across repartitionings (layout-free)
    val ids1 = s1.select("event_id").collect().map(_.getLong(0)).toSet
    val ids3 = Sampling
      .deterministicSample(events.repartition(13), "event_id", 0.2)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids3)
  }

  test("boundary fractions: 1.0 keeps everything, 0.0 keeps nothing") {
    val events = Tables(spark, sf(), "events")
    val n = events.count()
    assert(Sampling.deterministicSample(events, "event_id", 1.0).count() == n)
    assert(Sampling.deterministicSample(events, "event_id", 0.0).count() == 0)
  }

  test("different salts give near-independent samples; fractions nest") {
    val events = Tables(spark, sf("sf0.01"), "events")
    val a = Sampling.deterministicSample(events, "event_id", 0.2, salt = "a")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(events, "event_id", 0.2, salt = "b")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val n = events.count().toDouble
    // independence: |a ∩ b| ≈ 0.04 n, loosely bounded
    assert(math.abs(a.intersect(b).size - 0.04 * n) < 0.03 * n)
    // nesting: a smaller fraction with the SAME salt is a subset
    val small = Sampling.deterministicSample(events, "event_id", 0.05, salt = "a")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
  }
}
