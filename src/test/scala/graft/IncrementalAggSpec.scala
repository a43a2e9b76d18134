package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.IncrementalAgg
import graft.sink.{ChunkStore, ManifestTableFormat}

/** Incremental aggregate maintenance off the change feed
  * (`pipeline.IncrementalAgg`) — the derived GROUP BY table advances
  * in O(churn) and must equal a full recomputation after EVERY kind
  * of source change. The oracle gate (p12) pins the relational
  * outcome; these tests pin the mechanics: bootstrap, convergence
  * through upsert/delete/append, SQL SUM null semantics, vanished
  * groups, exactly-once markers (replay no-ops, empty spans advance),
  * and the refusals.
  */
class IncrementalAggSpec extends SparkSpec {

  private def fresh(): (String, String) = {
    val d = Files.createTempDirectory("graft-iagg").toString
    (s"$d/src", s"$d/agg")
  }

  /** (category, measure) rows under the chunk schema: chunk_text is
    * the GROUP, chunk_id the summed measure (nullable via -1 → NULL).
    */
  private def rows(data: Seq[(String, Integer, String)]): DataFrame = {
    import spark.implicits._
    data.map { case (cat, m, url) =>
      (Option(m).map(_.intValue), cat, Seq(1f), 0, url)
    }.toDF("chunk_id", "chunk_text", "embedding", "page_number",
      "document_url")
      .withColumn("chunk_id", col("chunk_id").cast("int"))
  }

  private def aggState(aggPath: String): Set[(String, Long, Any, Long)] =
    new ChunkStore(spark, aggPath, format = ManifestTableFormat.factory)
      .read().select("chunk_text", "cnt", "sum_chunk_id", "nn_chunk_id")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toSet

  private def recompute(srcPath: String): Set[(String, Long, Any, Long)] =
    new ChunkStore(spark, srcPath, format = ManifestTableFormat.factory)
      .read().groupBy("chunk_text")
      .agg(count(lit(1)).as("cnt"), sum("chunk_id").as("s"),
        count("chunk_id").as("nn"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toSet

  test("bootstrap + convergence through upsert/delete/append, " +
      "with SQL SUM null semantics and vanishing groups") {
    val (src, agg) = fresh()
    val store = new ChunkStore(spark, src,
      format = ManifestTableFormat.factory)
    store.append(rows(Seq(
      ("a", 10, "doc://1"), ("a", 20, "doc://2"), ("b", 5, "doc://3"),
      ("b", null, "doc://4"), // null measure: nn < cnt
      ("c", null, "doc://5"), // all-null group: SUM must be NULL
      (null, 7, "doc://6")))) // NULL group value

    val st1 = IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    assert(st1.fromVersion == -1L && st1.groups == 4)
    assert(aggState(agg) == recompute(src))
    assert(aggState(agg).contains(("c", 1L, null, 0L)),
      "all-null group must expose SUM = NULL (SQL semantics)")

    // upsert moves a doc across groups; delete kills group b's rows;
    // append adds a new group
    store.upsert(rows(Seq(("a", 99, "doc://5"))))  // c → a (c vanishes)
    store.deleteWhere(col("chunk_text") === "b")
    store.append(rows(Seq(("d", 1, "doc://7"), ("d", null, "doc://8"))))
    val st2 = IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    assert(st2.fromVersion == st1.toVersion)
    assert(aggState(agg) == recompute(src))
    assert(!aggState(agg).exists(_._1 == "b"),
      "a group whose count reached 0 must drop its row")
    assert(!aggState(agg).exists(_._1 == "c"))

    // a re-run at the same head is a pure no-op (marker check)
    val vBefore = new ManifestTableFormat(spark, agg,
      new ChunkStore(spark, agg,
        format = ManifestTableFormat.factory).schema).version
    val st3 = IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    assert(st3.groups == 0 && st3.fromVersion >= st3.toVersion)
    assert(new ManifestTableFormat(spark, agg,
      new ChunkStore(spark, agg,
        format = ManifestTableFormat.factory).schema).version == vBefore)
  }

  test("a row-neutral source commit (compaction) advances the marker " +
      "without touching aggregates") {
    val (src, agg) = fresh()
    val store = new ChunkStore(spark, src,
      format = ManifestTableFormat.factory)
    store.append(rows(Seq(("a", 1, "doc://1"), ("a", 2, "doc://2"))))
    store.append(rows(Seq(("b", 3, "doc://3"))))
    IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    val mtf = new ManifestTableFormat(spark, src, store.schema)
    mtf.compact() // rows unchanged, version advances
    val st = IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    assert(st.groups == 0 && st.toVersion == mtf.version)
    assert(aggState(agg) == recompute(src))
    // the marker advanced: a further catch-up is a version-check no-op
    val st2 = IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    assert(st2.fromVersion == mtf.version)
  }

  test("deletion-vector source commits feed the same delta stream") {
    val (src, agg) = fresh()
    val store = new ChunkStore(spark, src,
      format = ManifestTableFormat.factory)
    store.append(rows(Seq(
      ("a", 1, "doc://1"), ("a", 2, "doc://2"), ("b", 3, "doc://3"))))
    IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    val mtf = new ManifestTableFormat(spark, src, store.schema)
    mtf.deleteWhereDv(col("chunk_id") === 2) // merge-on-read delete
    IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    assert(aggState(agg) == recompute(src))
    assert(aggState(agg).contains(("a", 1L, 1L, 1L)))
  }

  test("CALL sync_agg: the SQL surface maintains the same agg table, " +
      "and the result is itself a queryable manifest table") {
    val (src, agg) = fresh()
    val wh = src.stripSuffix("/src")
    val store = new ChunkStore(spark, src,
      format = ManifestTableFormat.factory)
    store.append(rows(Seq(
      ("a", 1, "doc://1"), ("a", 2, "doc://2"), ("b", 3, "doc://3"))))
    val cat = "iaggcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val row = spark.sql(
      s"CALL $cat.sync_agg('src', 'agg', 'chunk_text', 'chunk_id')")
      .head()
    assert(row.getLong(0) == -1L && row.getLong(2) == 2L)
    assert(aggState(agg) == recompute(src))
    // the derived table is a first-class catalog table
    assert(spark.sql(s"SELECT cnt FROM $cat.agg " +
      "WHERE chunk_text = 'a'").head().getLong(0) == 2L)
    store.deleteWhere(col("chunk_text") === "a")
    spark.sql(s"CALL $cat.sync_agg('src', 'agg', 'chunk_text', 'chunk_id')")
    assert(aggState(agg) == recompute(src))
  }

  test("streaming runner: the cdf stream schedules catch-ups; the " +
      "version-keyed marker — not the checkpoint — carries the state") {
    val (src, agg) = fresh()
    val ckpt = Files.createTempDirectory("graft-iagg-ckpt").toString
    val store = new ChunkStore(spark, src,
      format = ManifestTableFormat.factory)
    store.append(rows(Seq(("a", 1, "doc://1"), ("b", 2, "doc://2"))))
    IncrementalAgg.syncOnce(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"), ckpt)
    assert(aggState(agg) == recompute(src))

    store.append(rows(Seq(("a", 5, "doc://3"))))
    store.deleteWhere(col("chunk_text") === "b")
    IncrementalAgg.syncOnce(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"), ckpt)
    assert(aggState(agg) == recompute(src))
    assert(aggState(agg) == Set(("a", 2L, 6L, 2L)))

    // a FRESH checkpoint replays the cdf stream from scratch; the
    // marker makes every replayed tick a no-op — still convergent
    val ckpt2 = Files.createTempDirectory("graft-iagg-ckpt2").toString
    IncrementalAgg.syncOnce(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"), ckpt2)
    assert(aggState(agg) == Set(("a", 2L, 6L, 2L)))
  }

  test("MIN/MAX maintenance: delta-applied inserts, bounded recompute " +
      "on extremum deletes, null groups, vanished extrema") {
    val (src, agg) = fresh()
    val store = new ChunkStore(spark, src,
      format = ManifestTableFormat.factory)
    def sync() = IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"),
      minCols = Seq("chunk_id"), maxCols = Seq("chunk_id"))
    def state(): Set[(String, Long, Any, Any)] =
      new ChunkStore(spark, agg, format = ManifestTableFormat.factory)
        .read()
        .select("chunk_text", "cnt", "min_chunk_id", "max_chunk_id")
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getInt(2),
          if (r.isNullAt(3)) null else r.getInt(3))).toSet
    def full(): Set[(String, Long, Any, Any)] =
      new ChunkStore(spark, src, format = ManifestTableFormat.factory)
        .read().groupBy("chunk_text")
        .agg(count(lit(1)).as("cnt"), min("chunk_id").as("mn"),
          max("chunk_id").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getInt(2),
          if (r.isNullAt(3)) null else r.getInt(3))).toSet

    store.append(rows(Seq(
      ("a", 10, "doc://1"), ("a", 30, "doc://2"), ("a", 20, "doc://3"),
      ("b", null, "doc://4"), // all-null group: MIN/MAX NULL, cnt 1
      ("c", 5, "doc://5"))))
    sync() // bootstrap: extrema from the insert-only delta
    assert(state() == full())
    assert(state().contains(("b", 1L, null, null)))

    // pure inserts: new extremum on one side — delta path, no rescan
    store.append(rows(Seq(("a", 99, "doc://6"), ("a", 15, "doc://7"))))
    sync()
    assert(state() == full())
    assert(state().contains(("a", 5L, 10, 99)))

    // delete the current max AND the current min of group a — the
    // feed proves endangerment, only group a re-derives
    store.deleteWhere(col("document_url").isin("doc://6", "doc://1"))
    sync()
    assert(state() == full())
    assert(state().contains(("a", 3L, 15, 30)))

    // delete every non-null row of c: group survives nowhere (cnt 0)
    // — row drops; delete a's remaining extremes one more time via
    // upsert (replace doc://2's measure) to catch update-shaped churn
    store.deleteWhere(col("chunk_text") === "c")
    store.upsert(rows(Seq(("a", 7, "doc://2")))) // 30 → 7: new min
    sync()
    assert(state() == full())
    assert(!state().exists(_._1 == "c"))
    assert(state().contains(("a", 3L, 7, 20)))

    // null-measure inserts never disturb held extrema
    store.append(rows(Seq(("a", null, "doc://8"))))
    sync()
    assert(state() == full())
    assert(state().contains(("a", 4L, 7, 20)))
  }

  test("refusals: non-numeric sum, group∩sum overlap, spec drift on " +
      "an existing agg table") {
    val (src, agg) = fresh()
    val store = new ChunkStore(spark, src,
      format = ManifestTableFormat.factory)
    store.append(rows(Seq(("a", 1, "doc://1"))))
    intercept[IllegalArgumentException] {
      IncrementalAgg.catchUp(spark, src, agg,
        Seq("chunk_text"), Seq("document_url")) // string sum
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.catchUp(spark, src, agg,
        Seq("chunk_id"), Seq("chunk_id")) // overlap
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.catchUp(spark, src, agg,
        Seq("chunk_text"), Nil,
        minCols = Seq("embedding")) // array MIN: not orderable
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.catchUp(spark, src, agg,
        Seq("chunk_text"), Nil,
        maxCols = Seq("chunk_text")) // group∩max overlap
    }
    IncrementalAgg.catchUp(spark, src, agg,
      Seq("chunk_text"), Seq("chunk_id"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.catchUp(spark, src, agg,
        Seq("chunk_text"), Seq("page_number")) // different spec
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.catchUp(spark, src, agg,
        Seq("chunk_text"), Seq("chunk_id"),
        minCols = Seq("chunk_id")) // extrema added to an existing spec
    }
  }
}
