package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** D12 — deterministic token-budget shard packing. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, 50L + (i * 37) % 400)).toDF("id", "tc")

  test("every shard's token total stays under budget + max document") {
    val budget = 1000L
    val in = docs(400)
    val maxDoc = in.agg(max("tc")).as[Long].head()
    val sums = Packing.packShards(in, "id", "tc", budget, numGroups = 8)
      .groupBy("grp", "shard").agg(sum("tc").as("total"))
    assert(sums.filter(col("total") >= budget + maxDoc).count() == 0)
    // greedy fill: every shard except a group's LAST is full past the
    // budget boundary's predecessor, i.e. adding its successor's first
    // doc would overflow — equivalently every non-final shard total
    // plus any later doc's tokens would exceed budget is hard to state
    // cheaply; assert the useful weaker form: mean fill ≥ 50% of budget
    val stats = sums.agg(avg("total")).as[Double].head()
    assert(stats >= budget * 0.5, s"mean shard fill $stats too low")
  }

  test("assignment is a pure function of the data (layout-independent)") {
    val a = Packing.packShards(docs(300), "id", "tc", 777L, numGroups = 4)
      .select("id", "grp", "shard").collect().toSet
    val b = Packing.packShards(
        docs(300).repartition(7).sortWithinPartitions(desc("id")),
        "id", "tc", 777L, numGroups = 4)
      .select("id", "grp", "shard").collect().toSet
    assert(a == b)
  }

  test("salt yields an independent shuffle") {
    val base = docs(300)
    val a = Packing.packShards(base, "id", "tc", 777L, 4, salt = "")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val b = Packing.packShards(base, "id", "tc", 777L, 4, salt = "epoch2")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(a != b, "salted packing must differ")
  }

  test("an oversized document claims a shard without breaking neighbors") {
    val in = Seq((1L, 10L), (2L, 5000L), (3L, 10L), (4L, 10L))
      .toDF("id", "tc")
    val out = Packing.packShards(in, "id", "tc", budget = 100L, numGroups = 1)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // all docs assigned; the docs after the giant land in later shards
    assert(out.size == 4)
    assert(out.values.toSet.size >= 2)
  }

  test("reserved columns and bad params are rejected") {
    val in = Seq((1L, 2L, 3L)).toDF("id", "tc", "shard")
    intercept[IllegalArgumentException] {
      Packing.packShards(in, "id", "tc", 100L)
    }
    intercept[IllegalArgumentException] {
      Packing.packShards(docs(2), "id", "tc", 0L)
    }
    intercept[IllegalArgumentException] {
      Packing.packShards(docs(2), "id", "tc", 10L, numGroups = 257)
    }
  }

  test("sequence packing tiles every sequence and every document exactly") {
    val seqLen = 128L
    val in = docs(300) // token counts 50..449: many docs straddle cuts
    val total = in.agg(sum("tc")).as[Long].head()
    val spans = Packing.packSequences(in, "id", "tc", seqLen).cache()
    // global conservation: spans sum to the tape length
    assert(spans.agg(sum("span_tokens")).as[Long].head() == total)
    // per document: spans tile [0, tc) contiguously
    val perDoc = spans.groupBy("id").agg(
      sum("span_tokens").as("s"), max("tc").as("tc"),
      min("doc_offset").as("lo"),
      max(col("doc_offset") + col("span_tokens")).as("hi"))
    assert(perDoc.filter(col("s") =!= col("tc") || col("lo") =!= 0 ||
      col("hi") =!= col("tc")).count() == 0)
    // per sequence: spans tile [0, seqLen) exactly (last may be short)
    val lastSeq = spans.agg(max("seq_id")).as[Long].head()
    val perSeq = spans.groupBy("seq_id").agg(
      sum("span_tokens").as("s"), min("seq_offset").as("lo"),
      max(col("seq_offset") + col("span_tokens")).as("hi"))
    assert(perSeq.filter(col("seq_id") < lastSeq &&
      (col("s") =!= seqLen || col("lo") =!= 0 ||
        col("hi") =!= seqLen)).count() == 0)
    assert(lastSeq == (total - 1) / seqLen)
    spans.unpersist()
  }

  test("sequence packing never plans a global window (no single-partition exchange)") {
    val plan = Packing.packSequences(docs(100), "id", "tc", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"the tape cumsum must be the two-level prefix sum, not a " +
        s"global window:\n${plan.take(2000)}")
    assert(plan.contains("hashpartitioning(__bkt"), plan.take(2000))
  }

  test("sequence packing of an empty / all-zero input is an empty span frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "tc")
    val out = Packing.packSequences(empty, "id", "tc", 64L)
    assert(out.columns.toSeq == Seq(
      "seq_id", "id", "tc", "seq_offset", "doc_offset", "span_tokens"))
    assert(out.count() == 0L)
    // all token counts <= 0 filter to nothing — same empty contract
    val zeros = Seq((1L, 0L), (2L, -3L)).toDF("id", "tc")
    assert(Packing.packSequences(zeros, "id", "tc", 64L).count() == 0L)
  }

  test("manifest checksum is order-immune and detects any membership change") {
    import spark.implicits._
    val in = (1L to 40L).map(i => (i, 10L + i % 7)).toDF("id", "tc")
    val packed = Packing.packShards(in, "id", "tc", budget = 50L,
      numGroups = 4)
    val m1 = Packing.manifest(packed, "id", "tc")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // layout-independent: a different partitioning gives the same rows
    val m2 = Packing.manifest(packed.repartition(7), "id", "tc")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m1 == m2)
    // totals reconcile with the input
    assert(m1.values.map(_._1).sum == 40L)
    assert(m1.values.map(_._2).sum ==
      in.agg(sum("tc")).head().getLong(0))
    // dropping one document changes exactly its shard's checksum
    val dropped = Packing.manifest(packed.filter(col("id") =!= 17L),
        "id", "tc")
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val changed = m1.keySet.filter(k =>
      dropped.get(k) != m1.get(k))
    assert(changed.size == 1)
    // and a token-count change flips a checksum even at equal counts
    val tweaked = Packing.manifest(
        packed.withColumn("tc",
          when(col("id") === 5L, col("tc") + 1).otherwise(col("tc"))),
        "id", "tc")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(m1.map { case (k, v) => k -> v._3 } != tweaked)
  }
}
