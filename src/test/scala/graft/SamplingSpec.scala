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

  test("stratified sample: exactly n per stratum, layout-independent (D7b)") {
    val events = Tables(spark, sf("sf0.01"), "events")
    val s = Sampling.stratifiedSample(events, "event_id", "event_type", 7)
    val perStratum = s.groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perStratum.values.forall(_ == 7L), perStratum.toString)
    // membership identical under repartitioning
    val ids1 = s.select("event_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling
      .stratifiedSample(events.repartition(13), "event_id", "event_type", 7)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // a larger n with the same salt is a superset (consistent prefix)
    val bigger = Sampling.stratifiedSample(events, "event_id", "event_type", 12)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(bigger))
  }

  test("vector_avg centroid: distributed == sequential, SQL-registered (D9)") {
    import spark.implicits._
    import graft.functions.VectorAggregates.vector_avg
    val vecs = Seq(
      (0L, Seq(1f, 2f, 3f)), (0L, Seq(3f, 2f, 1f)), (0L, Seq(2f, 2f, 2f)),
      (1L, Seq(10f, 0f, 0f))).toDF("g", "v")
    val got = vecs.repartition(7).groupBy("g")
      .agg(vector_avg(col("v")).as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(got(0L) == Seq(2.0, 2.0, 2.0))
    assert(got(1L) == Seq(10.0, 0.0, 0.0))
    // SQL registration path
    GraftSession.install(spark)
    vecs.createOrReplaceTempView("va_in")
    val viaSql = spark.sql(
      "SELECT g, vector_avg(v) AS c FROM va_in GROUP BY g ORDER BY g")
      .collect().map(_.getSeq[Double](1)).head
    assert(viaSql == Seq(2.0, 2.0, 2.0))
  }

  test("minhash_agg folds row signatures into the group-union signature") {
    import spark.implicits._
    import graft.functions.GraftFunctions.minhash_signature
    import graft.functions.VectorAggregates.minhash_agg
    val docs = Tables(spark, sf(), "documents").limit(40)
      .select((col("doc_id") % 4).as("g"),
        minhash_signature(col("text"), lit(64), lit(3)).as("sig"))
    val viaAgg = docs.groupBy("g").agg(minhash_agg(col("sig")).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    // cross-implementation check: explode + per-position min
    val viaExplode = docs
      .select(col("g"), posexplode(col("sig")).as(Seq("i", "h")))
      .groupBy("g", "i").agg(min("h").as("h"))
      .groupBy("g").agg(array_sort(collect_list(struct(col("i"), col("h"))))
        .as("sh"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)))).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.keySet.foreach(g => assert(viaAgg(g) == viaExplode(g), s"group $g"))
    // identical groups → identical signatures (union property)
    val dup = docs.withColumn("g", col("g") + 100)
    val both = docs.unionByName(dup).groupBy("g")
      .agg(minhash_agg(col("sig")).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    (0L until 4L).foreach(g => assert(both(g) == both(g + 100)))
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

  test("mixtureSample honors per-source fractions; unlisted sources " +
      "drop (D7c)") {
    import spark.implicits._
    val docs = (0 until 4000).map(i =>
      (i.toLong, s"src${i % 4}")).toDF("id", "source")
    val out = Sampling.mixtureSample(docs, "id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 1000L)                    // f=1.0: everything
    assert(math.abs(bySrc("src1") - 500L) < 100)       // f=0.5 ± noise
    assert(!bySrc.contains("src2"))                    // f=0.0
    assert(!bySrc.contains("src3"))                    // unlisted
    // deterministic: same call, same rows
    val again = Sampling.mixtureSample(docs.repartition(13), "id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
    // the per-source sample is the SAME rows the plain fraction picks
    // (mixture = union of per-source hash samples, by construction)
    val plain = Sampling.deterministicSample(
        docs.filter($"source" === "src1"), "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.filter($"source" === "src1").select("id")
      .collect().map(_.getLong(0)).toSet == plain)
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "id", "source", Map("x" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "id", "source", Map.empty)
    }
  }

  test("temperatureMixture flattens the source distribution (D7d)") {
    import spark.implicits._
    // 800 rows of 'big', 100 of 'mid', 25 of 'rare'
    val docs = ((0 until 800).map(i => (i.toLong, "big"))
      ++ (800 until 900).map(i => (i.toLong, "mid"))
      ++ (900 until 925).map(i => (i.toLong, "rare")))
      .toDF("id", "source")

    // τ = 1: identity — every row kept
    assert(Sampling.temperatureMixture(docs, "id", "source", 1.0).count()
      === 925)

    // τ = 0.5: the rarest source keeps EVERYTHING (acceptance 1.0);
    // bigger sources subsample at (p_rare/p_s)^0.5
    val out = Sampling.temperatureMixture(docs, "id", "source", 0.5)
    val kept = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") === 25)
    // expected acceptance: (25/800)^0.5 ≈ 0.177, (25/100)^0.5 = 0.5
    assert(math.abs(kept("big") - 800 * math.sqrt(25.0 / 800)) < 40,
      s"big kept ${kept("big")}")
    assert(math.abs(kept("mid") - 100 * 0.5) < 20, s"mid kept ${kept("mid")}")

    // deterministic and layout-independent
    val again = Sampling.temperatureMixture(
      docs.repartition(17), "id", "source", 0.5)
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      again.select("id").collect().map(_.getLong(0)).toSet)

    // output distribution is FLATTER than the input: big/rare ratio
    // shrinks from 32× toward √32 ≈ 5.7×
    val ratio = kept("big").toDouble / kept("rare")
    assert(ratio < 10.0, s"ratio=$ratio")

    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(docs, "id", "source", 0.0)
    }
  }

  test("clusterSample: n per cell, deterministic, dense cells don't dominate") {
    import spark.implicits._
    // cell 0 along e1 (30 members), cell 1 along e2 (5 members)
    val mk = (base: Int, n: Int, dim: Int) => (0 until n).map { i =>
      val v = Array.fill(4)(0.001f * (i + 1)); v(dim) = 1f
      (base + i.toLong, v.toSeq)
    }
    val emb = (mk(0, 30, 0) ++ mk(100, 5, 1)).toDF("id", "v")
    val cents = Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))
    val got = Sampling.clusterSample(emb, "id", "v", cents, nPerCell = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // 5 from each cell despite the 6× density difference
    assert(got.count(_._1 == 0) == 5 && got.count(_._1 == 1) == 5)
    assert(got.filter(_._1 == 0).forall(_._2 < 100) &&
      got.filter(_._1 == 1).forall(_._2 >= 100))
    // deterministic
    val again = Sampling.clusterSample(emb, "id", "v", cents, nPerCell = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSet == again.toSet)
    intercept[IllegalArgumentException] {
      Sampling.clusterSample(emb, "id", "v", cents, 0)
    }
  }

  test("splitBySource: whole sources land on one side; salts are independent (D7e)") {
    import spark.implicits._
    val docs = (0 until 400)
      .map(i => (i.toLong, s"src-${i % 40}")).toDF("doc_id", "source")
    val split = Sampling.splitBySource(docs, "source", 0.3, "s1")
    // group atomicity: no source appears in both splits
    assert(split.groupBy("source")
      .agg(org.apache.spark.sql.functions.count_distinct(
        org.apache.spark.sql.functions.col("split")).as("k"))
      .filter(org.apache.spark.sql.functions.col("k") =!= 1)
      .count() == 0)
    // the val share is near the requested fraction at the SOURCE level
    val valSources = split.filter(org.apache.spark.sql.functions
        .col("split") === "val")
      .select("source").distinct().count()
    assert(valSources >= 4 && valSources <= 20,
      s"0.3 split chose $valSources of 40 sources")
    // a different salt reshuffles the assignment
    val other = Sampling.splitBySource(docs, "source", 0.3, "s2")
    val a = split.filter(org.apache.spark.sql.functions
      .col("split") === "val").select("source").distinct()
    val b = other.filter(org.apache.spark.sql.functions
      .col("split") === "val").select("source").distinct()
    assert(a.exceptAll(b).count() + b.exceptAll(a).count() > 0)
    intercept[IllegalArgumentException] {
      Sampling.splitBySource(split, "source", 0.5)
    }
  }
}
