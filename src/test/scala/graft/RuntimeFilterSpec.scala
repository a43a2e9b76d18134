package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.graftbridge.ManifestRuntimeFilterScan

import graft.sink.{ChunkStore, ManifestTableFormat}

/** Runtime (join-driven) file pruning on manifest tables — the
  * DPP-analog path: Spark's `PartitionPruning` rule plants a dynamic
  * IN-filter on the manifest scan from a broadcast join's build side,
  * and `ManifestRuntimeFilterScan.filter` re-prunes the FILE list
  * through the log's stats (url lo/hi + bloom, per-column min/max)
  * before input partitions are planned. Correctness is unconditional
  * (pruning is fail-open and the join re-checks every key); these
  * tests pin that the pruning actually HAPPENS and actually SHRINKS.
  */
class RuntimeFilterSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"rfcat$n"
    val wh = Files.createTempDirectory(s"graft-rf-$n").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def batch(ids: Range, page: Int): DataFrame = {
    import spark.implicits._
    ids.map(i => (0, s"t-$i", Seq(1f), page, f"doc://$i%04d"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url").repartition(1)
  }

  /** A PARQUET-backed dim view: a LocalRelation dim gets its filter
    * constant-folded away and `PartitionPruning` then sees no
    * selective predicate on the build side — a file-backed dim is
    * both the realistic shape and the one the rule fires on.
    */
  private def parquetView(name: String, df: DataFrame): Unit = {
    val dir = Files.createTempDirectory(s"graft-rf-dim-$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView(name)
  }

  /** The manifest scan of the executed plan (subqueries included —
    * under AQE the scan sits below an exchange the DPP filter reuses).
    */
  private def manifestScan(q: DataFrame): ManifestRuntimeFilterScan = {
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case b: BatchScanExec
          if b.scan.isInstanceOf[ManifestRuntimeFilterScan] => b
    }
    assert(scans.nonEmpty, "no manifest scan in plan:\n" +
      q.queryExecution.executedPlan)
    scans.head.scan.asInstanceOf[ManifestRuntimeFilterScan]
  }

  private def runtimeFiltered(q: DataFrame): Boolean =
    collectWithSubqueries(q.queryExecution.executedPlan) {
      case b: BatchScanExec if b.runtimeFilters.nonEmpty => b
    }.nonEmpty

  test("broadcast join on document_url: the build side's key set " +
      "prunes manifest files at runtime (url lo/hi + bloom)") {
    val (cat, wh) = freshCatalog()
    val store = new ChunkStore(spark, s"$wh/t",
      format = ManifestTableFormat.factory)
    store.append(batch(0 until 20, 5))    // file 1: doc://0000-0019
    store.append(batch(20 until 40, 15))  // file 2: doc://0020-0039
    store.append(batch(40 until 60, 25))  // file 3: doc://0040-0059
    import spark.implicits._
    parquetView("rf_dim",
      Seq(("doc://0042", "x"), ("doc://0050", "x"), ("doc://0001", "y"))
        .toDF("document_url", "tag"))

    val q = spark.sql(
      s"""SELECT t.document_url, t.chunk_text
         |FROM $cat.t t JOIN rf_dim d ON t.document_url = d.document_url
         |WHERE d.tag = 'x'""".stripMargin)
    val rows = q.collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
    assert(rows == Seq(("doc://0042", "t-42"), ("doc://0050", "t-50")))

    assert(runtimeFiltered(q),
      "no DynamicPruning filter was planted on the scan:\n" +
        q.queryExecution.executedPlan)
    val scan = manifestScan(q)
    assert(scan.currentFiles.size == 1,
      s"runtime filter should keep 1 of 3 files, kept " +
        s"${scan.currentFiles.size}: ${scan.currentFiles}")
  }

  /** A padded fact batch: now that the scan wrappers REPORT real
    * statistics, DPP's benefit heuristic correctly skips trivially
    * small probe sides — the fact side must look like a fact side.
    */
  private def fatBatch(ids: Range, page: Int): DataFrame = {
    import spark.implicits._
    ids.map(i => (0, s"t-$i-" + ("x" * 200), Seq(1f), page,
        f"doc://$i%06d"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url").repartition(1)
  }

  test("broadcast join on a numeric column: runtime IN lowers to a " +
      "min/max superset probe and prunes files") {
    val (cat, wh) = freshCatalog()
    val store = new ChunkStore(spark, s"$wh/t",
      format = ManifestTableFormat.factory)
    store.append(fatBatch(0 until 2000, 5))
    store.append(fatBatch(2000 until 4000, 15))
    store.append(fatBatch(4000 until 6000, 25))
    import spark.implicits._
    parquetView("rf_pages",
      Seq((25, "x"), (999, "x"), (5, "y")).toDF("page_number", "tag"))

    val q = spark.sql(
      s"""SELECT count(*) AS c
         |FROM $cat.t t JOIN rf_pages d ON t.page_number = d.page_number
         |WHERE d.tag = 'x'""".stripMargin)
    // collect(), not head(): head() executes a separate limit(1)
    // QueryExecution whose scan instance is not the one inspected here
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2000L))
    assert(runtimeFiltered(q),
      "no DynamicPruning filter was planted on the scan:\n" +
        q.queryExecution.executedPlan)
    val scan = manifestScan(q)
    // IN {25, 999} → [25, 999] superset range → only the page-25 file
    assert(scan.currentFiles.size == 1,
      s"runtime filter should keep 1 of 3 files, kept " +
        s"${scan.currentFiles.size}; received=${scan.lastRuntimeFilter}")
  }

  test("runtime pruning composes with static skipping: intersection, " +
      "never undoing the pushed-predicate subset") {
    val (cat, wh) = freshCatalog()
    val store = new ChunkStore(spark, s"$wh/t",
      format = ManifestTableFormat.factory)
    store.append(batch(0 until 20, 5))
    store.append(batch(20 until 40, 15))
    store.append(batch(40 until 60, 25))
    import spark.implicits._
    parquetView("rf_dim2",
      Seq(("doc://0042", "x"), ("doc://0001", "x"))
        .toDF("document_url", "tag"))

    // static: page_number >= 10 drops file 1; runtime: urls {0042,
    // 0001} admit files 1 and 3 → intersection = file 3 only
    val q = spark.sql(
      s"""SELECT t.document_url
         |FROM $cat.t t JOIN rf_dim2 d ON t.document_url = d.document_url
         |WHERE d.tag = 'x' AND t.page_number >= 10""".stripMargin)
    assert(q.collect().map(_.getString(0)).toSeq == Seq("doc://0042"))
    val scan = manifestScan(q)
    assert(scan.currentFiles.size == 1,
      s"static+runtime intersection should keep 1 file, kept " +
        s"${scan.currentFiles.size}: ${scan.currentFiles}")
  }

  test("results are identical with runtime pruning disabled " +
      "(optimization only, never semantics)") {
    val (cat, wh) = freshCatalog()
    val store = new ChunkStore(spark, s"$wh/t",
      format = ManifestTableFormat.factory)
    store.append(batch(0 until 30, 5))
    store.append(batch(30 until 60, 15))
    import spark.implicits._
    parquetView("rf_dim3",
      (0 until 60 by 7).map(i => (f"doc://$i%04d", "x"))
        .toDF("document_url", "tag"))
    val sql =
      s"""SELECT t.document_url, t.page_number
         |FROM $cat.t t JOIN rf_dim3 d ON t.document_url = d.document_url
         |WHERE d.tag = 'x'""".stripMargin
    val on = spark.sql(sql).collect().map(_.toString).sorted.toSeq
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try {
      val off = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      assert(on == off && on.size == 9)
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("manifest scans report real statistics through the wrappers: " +
      "a small manifest dim STATIC-broadcasts (no AQE rescue needed)") {
    val (cat, wh) = freshCatalog()
    val dim = new ChunkStore(spark, s"$wh/dim",
      format = ManifestTableFormat.factory)
    dim.append(batch(0 until 10, 1)) // a few KB — far under the
                                     // broadcast threshold IF reported
    val fact = new ChunkStore(spark, s"$wh/fact",
      format = ManifestTableFormat.factory)
    fact.append(batch(0 until 60, 2))
    // disable AQE for the assertion: the STATIC planner must already
    // pick broadcast from the scan's estimateStatistics — before the
    // wrappers forwarded SupportsReportStatistics they reported the
    // default (maximal) size and this planned as a sort-merge join
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = spark.sql(
        s"""SELECT f.document_url FROM $cat.fact f
           |JOIN $cat.dim d ON f.document_url = d.document_url""".stripMargin)
      val bhj = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins
          .BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty,
        "small manifest dim did not static-broadcast:\n" +
          q.queryExecution.executedPlan)
      assert(q.count() == 10)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    // and the scan reports ROW counts from the log (FileScan alone
    // only knows bytes) — the CBO's row estimate for join planning
    val scan = manifestScan(spark.sql(s"SELECT * FROM $cat.dim"))
    val st = scan.estimateStatistics()
    assert(st.numRows().isPresent && st.numRows().getAsLong == 10L,
      s"expected numRows=10 from the log, got ${st.numRows()}")
    assert(st.sizeInBytes().isPresent && st.sizeInBytes().getAsLong > 0)
  }
}
