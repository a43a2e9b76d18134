package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity search semantics (SURVEY B2/D3/D6). */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf(), "embeddings").cache()

  test("knnJoinBrute: self is its own nearest neighbor at distance 0") {
    val out = Similarity.knnJoinBrute(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", k = 3).cache()
    assert(out.groupBy("probe_id").count()
      .filter(col("count") =!= 3).count() == 0)
    val self = out.filter(col("probe_id") === col("nn_id"))
    assert(self.count() == 20)
    assert(self.filter(col("dist") =!= 0.0).count() == 0)
    out.unpersist()
  }

  test("knnJoinBrute: topk_agg form ≡ the ranking-window form, bit-exact") {
    // the r14 rewrite replaced row_number().over(partitionBy(probe_id)
    // .orderBy(dist, nn_id)) <= k with the bounded topk_agg aggregate
    // in every Similarity top-k stage; this pins the equivalence —
    // same rows, same tie-breaks, and bit-identical dist values
    // (double negation is a sign-bit flip) on the shared helper all
    // call sites go through
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.cosine_distance
    val probes = emb.filter(col("vec_id") < 15)
    val agg = Similarity.knnJoinBrute(emb, probes, "vec_id", "embedding",
      k = 7)
    val b = emb.select(col("vec_id").as("nn_id"), col("embedding").as("bv"))
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("pv"))
    val win = b.crossJoin(broadcast(p))
      .select(col("probe_id"), col("nn_id"),
        round(cosine_distance(col("bv"), col("pv")), 6).as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("dist"), col("nn_id"))))
      .filter(col("rn") <= 7)
      .drop("rn")
    val toSet = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSet
    assert(agg.columns.toSeq == Seq("probe_id", "nn_id", "dist"))
    assert(toSet(agg) == toSet(win))
  }

  test("lshAnnJoin finds perturbed copies of base vectors (near-dup recall)") {
    import spark.implicits._
    // probes = base vectors + small deterministic noise: they must
    // land in the source vector's bucket and find it as top-1
    val rnd = new java.util.Random(7)
    val probes = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id + 100000L, v.map(x => x + (rnd.nextGaussian() * 0.005).toFloat))
      }
      .toDF("vec_id", "embedding")
    val ann = Similarity.lshAnnJoin(emb, probes, "vec_id", "embedding",
      k = 1, dim = 64)
    val hits = ann.filter(col("nn_id") === col("probe_id") - 100000L).count()
    assert(hits >= 90, s"LSH near-dup recall too low: $hits/100")
  }

  test("lshAnnJoin: more hash tables → more true-kNN recall (L knob)") {
    val probes = emb.filter(col("vec_id") < 25)
    val brute = Similarity.knnJoinBrute(emb, probes, "vec_id", "embedding",
      k = 5).select("probe_id", "nn_id").cache()
    val total = brute.count()
    def recall(tables: Int): Long = brute
      .join(Similarity.lshAnnJoin(emb, probes, "vec_id", "embedding",
          k = 5, dim = 64, numTables = tables)
        .select("probe_id", "nn_id"), Seq("probe_id", "nn_id"), "left_semi")
      .count()
    val r1 = recall(1)
    val r4 = recall(4)
    info(s"recall@5: L=1 $r1/$total, L=4 $r4/$total")
    assert(r4 > r1, s"multi-table recall $r4 not above single-table $r1")
    assert(r4 * 2 >= total, s"L=4 recall below 50%: $r4/$total")
    brute.unpersist()
  }

  test("ivfPqAnnJoin: codes-only coarse stage still recalls (IVF-PQ)") {
    val probes = emb.filter(col("vec_id") < 25)
    val brute = Similarity.knnJoinBrute(emb, probes, "vec_id", "embedding",
      k = 5).select("probe_id", "nn_id").cache()
    val total = brute.count()
    val ivfpq = Similarity.ivfPqAnnJoin(emb, probes, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4, rerankPerProbe = 64)
    assert(ivfpq.groupBy("probe_id").count()
      .filter(col("count") =!= 5).count() == 0)
    val hits = brute.join(ivfpq.select("probe_id", "nn_id"),
      Seq("probe_id", "nn_id"), "left_semi").count()
    info(s"IVF-PQ recall@5: $hits/$total")
    // bounded below by the IVF cell recall (nprobe/nlist) minus PQ
    // coarse error recovered by the rerank — floor with margin
    assert(hits * 2 >= total, s"IVF-PQ recall below 50%: $hits/$total")
    brute.unpersist()
  }

  test("ivfAnnJoin: near-dup probes find their source; decent true-kNN recall") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val probes = emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id + 100000L, v.map(x => x + (rnd.nextGaussian() * 0.005).toFloat))
      }
      .toDF("vec_id", "embedding")
    val ann = Similarity.ivfAnnJoin(emb, probes, "vec_id", "embedding",
      k = 1, nlist = 16, nprobe = 4)
    val hits = ann.filter(col("nn_id") === col("probe_id") - 100000L).count()
    assert(hits >= 45, s"IVF near-dup recall too low: $hits/50")

    // true-kNN recall@5 vs brute force for a handful of probes
    val p5 = emb.filter(col("vec_id") < 10)
    val brute = Similarity.knnJoinBrute(emb, p5, "vec_id", "embedding", 5)
      .select("probe_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfAnnJoin(emb, p5, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 8)
      .select("probe_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }

  test("cosineNearDupPairs is symmetric-free and thresholded") {
    val pairs = Similarity.cosineNearDupPairs(
      emb.filter(col("vec_id") < 100), "vec_id", "embedding", 0.8).cache()
    assert(pairs.filter(col("id1") >= col("id2")).count() == 0)
    assert(pairs.filter(col("dist") > 0.8).count() == 0)
    pairs.unpersist()
  }

  test("cosineNearDupPairsApprox finds planted near-identical pairs") {
    import spark.implicits._
    val rnd = new java.util.Random(23)
    val noisy = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id + 100000L, v.map(x => x + (rnd.nextGaussian() * 0.002).toFloat))
      }
      .toDF("vec_id", "embedding")
    val both = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")).unionAll(noisy)
    val pairs = Similarity.cosineNearDupPairsApprox(
      both, "vec_id", "embedding", maxDistance = 0.01, dim = 64)
    val planted = pairs
      .filter(col("id2") === col("id1") + 100000L).count()
    assert(planted >= 90, s"approx near-dup recall too low: $planted/100")
    // every returned pair really is within the threshold
    assert(pairs.filter(col("dist") > 0.01).count() == 0)
  }

  test("VectorSearch.topK: self-match, metric dispatch, filtered search") {
    import graft.ops.VectorSearch
    val q = emb.filter(col("vec_id") === 5)
      .select("embedding").collect().head.getSeq[Float](0).toSeq

    val top = VectorSearch.topK(emb, q, 3).collect()
    assert(top.head.getAs[Long]("vec_id") == 5)
    assert(top.head.getAs[Double]("dist") == 0.0)

    val l2 = VectorSearch.topK(emb, q, 3, metric = "l2").collect()
    assert(l2.head.getAs[Long]("vec_id") == 5)

    val filtered = VectorSearch.topKWhere(emb, col("label") < 3, q, 5)
    assert(filtered.count() == 5)
    assert(filtered.filter(col("label") >= 3).count() == 0)

    intercept[IllegalArgumentException] {
      VectorSearch.topK(emb, q, 1, metric = "hamming")
    }
  }

  test("hardNegatives: window equivalence, label exclusion, minDist guard") {
    import org.apache.spark.sql.expressions.Window
    val labeled = emb.select(col("vec_id"), col("embedding"),
      pmod(col("vec_id"), lit(4)).as("label"))
    val anchors = labeled.filter(col("vec_id") < 6)

    // equivalence with the window formulation (same order, same ties)
    val got = Similarity.hardNegatives(labeled, anchors,
      "vec_id", "embedding", "label", k = 4).cache()
    val b = labeled.select(col("vec_id").as("neg_id"),
      col("embedding").as("bv"), col("label").as("bl"))
    val p = anchors.select(col("vec_id").as("anchor_id"),
      col("embedding").as("pv"), col("label").as("pl"))
    val ref = b.join(broadcast(p), col("bl") =!= col("pl"))
      .select(col("anchor_id"), col("neg_id"),
        round(graft.functions.GraftFunctions.cosine_distance(
          col("bv"), col("pv")), 6).as("dist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("dist"), col("neg_id"))))
      .filter(col("rnk") <= 4)
      .select(col("anchor_id"), col("rnk").cast("long"),
        col("neg_id"), col("dist"))
    assert(got.exceptAll(ref).count() == 0 &&
      ref.exceptAll(got).count() == 0)

    // no same-label negative ever appears
    val lbl = labeled.select(col("vec_id").as("neg_id"),
      col("label").as("neg_label"))
    assert(got.join(lbl, "neg_id")
      .filter(col("neg_label") === pmod(col("anchor_id"), lit(4)))
      .count() == 0)
    got.unpersist()

    // minDist: an exact copy with a different label (unlabeled
    // positive) is top-1 without the guard, excluded with it
    val planted = anchors.select((col("vec_id") + 1000L).as("vec_id"),
      col("embedding"), pmod(col("vec_id") + 1, lit(4)).as("label"))
    val base = labeled.unionByName(planted)
    val unguarded = Similarity.hardNegatives(base, anchors,
      "vec_id", "embedding", "label", k = 1)
    assert(unguarded.filter(col("rnk") === 1 &&
      col("neg_id") === col("anchor_id") + 1000L && col("dist") === 0.0)
      .count() == 6)
    val guarded = Similarity.hardNegatives(base, anchors,
      "vec_id", "embedding", "label", k = 4, minDist = 0.05)
    assert(guarded.filter(col("neg_id") === col("anchor_id") + 1000L)
      .count() == 0)
  }

  test("lsh bucket is deterministic across evaluations") {
    val b1 = emb.select(Similarity.lshBucket(col("embedding"), 64, 8, 42L)
      .as("b")).collect().map(_.getInt(0)).toSeq
    val b2 = emb.select(Similarity.lshBucket(col("embedding"), 64, 8, 42L)
      .as("b")).collect().map(_.getInt(0)).toSeq
    assert(b1 == b2)
    assert(b1.distinct.length > 1) // actually spreads across buckets
  }
}
