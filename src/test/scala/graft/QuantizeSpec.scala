package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantize

/** Int8 scalar quantization (D8): code range, error bound, round trip,
  * degenerate constant vectors.
  */
class QuantizeSpec extends SparkSpec {

  test("codes are in 0..255 and error is within scale/2") {
    val e = Tables(spark, sf(), "embeddings").limit(100)
    val checked = e.select(
      array_min(Quantize.int8Codes(col("embedding"))).as("cmin"),
      array_max(Quantize.int8Codes(col("embedding"))).as("cmax"),
      (Quantize.maxRoundTripError(col("embedding")) <=
        Quantize.quantScale(col("embedding")) / 2 + lit(1e-12)).as("ok"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(1) <= 255,
        s"codes out of range: ${r.getInt(0)}..${r.getInt(1)}")
      assert(r.getBoolean(2))
    }
  }

  test("dequantize reconstructs within the bound") {
    import spark.implicits._
    val df = Seq(Seq(0.1f, -0.5f, 0.9f, 0.0f)).toDF("v")
    val row = df.select(
      Quantize.dequantize(Quantize.int8Codes(col("v")),
        array_min(col("v")).cast("double"),
        Quantize.quantScale(col("v"))).as("rt"),
      col("v"), Quantize.quantScale(col("v")).as("s")).collect().head
    val rt = row.getSeq[Double](0)
    val orig = row.getSeq[Float](1)
    val bound = row.getDouble(2) / 2 + 1e-12
    rt.zip(orig).foreach { case (a, b) =>
      assert(math.abs(a - b) <= bound, s"$a vs $b (bound $bound)")
    }
  }

  test("q8 distance over packed codes tracks exact cosine closely") {
    import graft.functions.GraftFunctions._
    val e = Tables(spark, sf(), "embeddings").limit(100)
    val probe = e.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    val diffs = Quantize.withIndexColumns(e, "embedding")
      .select(abs(
        q8_cosine_distance(col("q8_codes"), col("q8_mn"), col("q8_scale"),
          typedlit(probe)) -
        cosine_distance(col("embedding"), typedlit(probe))).as("d"))
      .agg(max("d")).head().getDouble(0)
    // per-element error ≤ scale/2 ≈ (range/255)/2 → distance error ≪ 0.05
    assert(diffs < 0.05, s"max |q8 - exact| = $diffs")
  }

  test("two-stage quantized top-k recalls the exact top-k") {
    val e = Tables(spark, sf(), "embeddings")
    val probe = e.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    val exact = graft.ops.VectorSearch.topK(e, probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Quantize.topKQuantized(
        Quantize.withIndexColumns(e, "embedding"), probe,
        k = 10, idCol = "vec_id", rerank = 40)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact & quant).size >= 9, s"recall ${(exact & quant).size}/10")
  }

  test("PQ: codes in range, ADC tracks exact distance, top-k recalls (D8c)") {
    val e = Tables(spark, sf(), "embeddings")
    val model = Quantize.trainPq(e, "vec_id", "embedding", m = 8, ks = 16)
    assert(model.codebook.size == 8)
    assert(model.codebook.forall(_.size == 16))
    assert(model.codebook.forall(_.forall(_.size == 8)))

    val coded = Quantize.withPqCodes(e, "embedding", model).cache()
    val codes = coded.select("pq_codes").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.size == 8 && c.forall(x => x >= 0 && x < 16)))

    val probe = e.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    val exact = graft.ops.VectorSearch.topK(e, probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val viaPq = Quantize.topKPq(coded, model, probe,
        k = 10, idCol = "vec_id", rerank = 60)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    info(s"PQ recall@10 (rerank 60): ${(exact & viaPq).size}/10")
    assert(viaPq.contains(1L), "self vector must survive the ADC cut")
    assert((exact & viaPq).size >= 5, s"recall ${(exact & viaPq).size}/10")
    coded.unpersist()
  }

  test("constant vector quantizes to all-zero codes with zero error") {
    import spark.implicits._
    val df = Seq(Seq(0.25f, 0.25f, 0.25f)).toDF("v")
    val r = df.select(Quantize.int8Codes(col("v")).as("c"),
      Quantize.maxRoundTripError(col("v")).as("e")).collect().head
    assert(r.getSeq[Int](0).forall(_ == 0))
    assert(r.getDouble(1) == 0.0)
  }

  test("BQ: distributed codes bit-agree with the driver encoder (D8d)") {
    val e = Tables(spark, sf(), "embeddings")
    val model = Quantize.trainBq(e, "vec_id", "embedding")
    assert(model.center.length === 64 && model.words === 1)
    val rows = Quantize.withBqCodes(e, "embedding", model)
      .select("vec_id", "embedding", "bq_codes").collect()
    rows.foreach { r =>
      val expected = Quantize.bqEncode(r.getSeq[Float](1), model)
      assert(r.getSeq[Long](2) === expected, s"vec_id=${r.getLong(0)}")
    }
  }

  test("BQ: Hamming distance is symmetric, zero on self, counts bits") {
    import spark.implicits._
    val df = Seq((Seq(0L), Seq(0L), 0L),
      (Seq(-1L), Seq(0L), 64L),
      (Seq(5L), Seq(6L), 2L), // 101 vs 110 → 2 differing bits
      (Seq(1L, 3L), Seq(0L, 0L), 3L)).toDF("a", "b", "want")
    val got = df.select(
      Quantize.hammingDistance(col("a"), col("b")).as("ab"),
      Quantize.hammingDistance(col("b"), col("a")).as("ba"),
      col("want")).collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(2))
      assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("BQ: two-stage binary top-k recalls the exact top-k (D8d)") {
    val e = Tables(spark, sf(), "embeddings")
    val model = Quantize.trainBq(e, "vec_id", "embedding")
    val probe = e.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    val rerank = math.max(100L, e.count() / 10).toInt
    val bq = Quantize.topKBinary(Quantize.withBqCodes(e, "embedding", model),
      model, probe, k = 10, idCol = "vec_id", rerank = rerank)
    val got = bq.select("vec_id").collect().map(_.getLong(0))
    assert(got.length === 10)
    assert(got.head === 7L, "self must rank first (exact rerank)")
    val exact = graft.ops.VectorSearch.topK(e, probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.count(exact.contains) >= 5, s"recall ${got.count(exact.contains)}/10")
  }

  test("prefix top-k: self first, recalls the exact top-k (D8e)") {
    val e = Tables(spark, sf(), "embeddings")
    val probe = e.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    val got = Quantize.topKPrefix(
        Quantize.withPrefixColumn(e, "embedding", 16), probe,
        k = 10, idCol = "vec_id", prefixDim = 16,
        rerank = math.max(100L, e.count() / 10).toInt)
      .select("vec_id").collect().map(_.getLong(0))
    assert(got.length === 10)
    assert(got.head === 7L, "self must rank first (exact rerank)")
    val exact = graft.ops.VectorSearch.topK(e, probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.count(exact.contains) >= 5, s"recall ${got.count(exact.contains)}/10")
  }

  test("prefix top-k with prefixDim = dim equals exact brute force (D8e)") {
    val e = Tables(spark, sf(), "embeddings")
    val probe = e.filter(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0)
    val dim = probe.length
    val got = Quantize.topKPrefix(
        Quantize.withPrefixColumn(e, "embedding", dim), probe,
        k = 10, idCol = "vec_id", prefixDim = dim, rerank = 40)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = graft.ops.VectorSearch.topK(e, probe, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }
}
