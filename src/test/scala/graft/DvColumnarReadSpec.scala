package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sink.{ChunkStore, ManifestTableFormat}

/** Plan pins for [[graft.plans.DvColumnarRead]] — the round-11 fix for
  * the DELETION-VECTOR read tax. A DV'd snapshot read through SQL or
  * the path source must plan as Spark's own vectorized parquet scan
  * plus a broadcast anti-join on `_metadata.row_index`, NOT the DSv2
  * V1 row fallback: pushed filters reach the parquet scan, manifest
  * stats still skip files, and results stay bit-identical to the
  * fallback (which DeletionVectorSpec pins and rule-less sessions
  * still use).
  */
class DvColumnarReadSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def freshWh(): String =
    Files.createTempDirectory("graft-dvcol").toString

  private def rows(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (0, s"text-$i", Seq(1f), i % 10, f"doc://$i%04d"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url")
  }

  private def catFor(wh: String, name: String): String = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    name
  }

  /** All FileSourceScanExec leaves, through AQE wrappers AND query
    * stages (the helper trait descends into materialized stages —
    * `SparkPlan.collectWithSubqueries` alone stops at stage borders).
    */
  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    collectWithSubqueries(plan) { case f: FileSourceScanExec => f }
  }

  /** A DV'd store: 40 docs appended in several files, pages 3 and 4
    * deleted merge-on-read (data files untouched, two DV commits).
    */
  private def dvTable(wh: String): ChunkStore = {
    val store = new ChunkStore(spark, s"$wh/t",
      format = ManifestTableFormat.factory)
    store.append(rows(0 until 20))
    store.append(rows(20 until 40))
    val mtf = new ManifestTableFormat(spark, s"$wh/t", store.schema)
    assert(mtf.deleteWhereDv(col("page_number") === 3)._2 > 0)
    assert(mtf.deleteWhereDv(col("page_number") === 4)._2 > 0)
    store
  }

  test("DV'd catalog read plans as vectorized parquet scans with the " +
      "predicate pushed — no V1 row fallback") {
    val wh = freshWh()
    dvTable(wh)
    val cat = catFor(wh, "dvcol1")
    // page 2 lives in the SAME files as the deleted pages 3/4, so the
    // DV'd branch must survive pruning: plan = vectorized parquet scan
    // + broadcast LeftAnti on _metadata.row_index, predicate pushed
    val q = spark.sql(
      s"SELECT document_url FROM $cat.t WHERE page_number = 2")

    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("RowDataSourceScan"),
      s"DV read took the V1 fallback:\n$plan")
    val scans = fileScans(q)
    assert(scans.nonEmpty, s"no parquet FileSourceScan in:\n$plan")
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("page_number"))),
      "predicate did not reach any parquet scan: " +
        scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString("; "))
    // the DV'd branch scans row positions and anti-joins them
    assert(plan.contains("row_index"),
      s"no position column in the DV branch:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"no position anti-join in the DV branch:\n$plan")

    // exactness vs the store read (which DeletionVectorSpec pins)
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      (0 until 40).filter(_ % 10 == 2).map(i => f"doc://$i%04d"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 32)

    // a predicate whose rows live only in CLEAN files prunes the
    // DV'd branch away entirely — no join at all, one parquet scan
    val clean = spark.sql(
      s"SELECT document_url FROM $cat.t WHERE page_number = 7")
    val cleanPlan = clean.queryExecution.executedPlan.toString
    assert(!cleanPlan.contains("LeftAnti") &&
        !cleanPlan.contains("RowDataSourceScan"),
      s"stats pruning should have dropped every DV'd file:\n$cleanPlan")
    assert(clean.count() == 4)
  }

  test("path source (spark.read.format graft) gets the same columnar " +
      "DV read") {
    val wh = freshWh()
    dvTable(wh)
    val q = spark.read.format("graft").load(s"$wh/t")
      .filter(col("page_number") === 7).select("document_url")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("RowDataSourceScan"),
      s"path-source DV read took the V1 fallback:\n$plan")
    assert(fileScans(q).nonEmpty)
    assert(q.count() == 4)
  }

  test("manifest stats still skip files on a DV'd snapshot: a " +
      "url-bloom point probe reads a strict file subset") {
    val wh = freshWh()
    val store = dvTable(wh)
    val cat = catFor(wh, "dvcol2")
    val all = spark.sql(s"SELECT * FROM $cat.t")
    val probed = spark.sql(
      s"SELECT chunk_text FROM $cat.t WHERE document_url = 'doc://0007'")
    val allFiles = fileScans(all)
      .flatMap(_.relation.location.inputFiles).distinct.size
    val probedFiles = fileScans(probed)
      .flatMap(_.relation.location.inputFiles).distinct.size
    assert(allFiles >= 2, s"need a multi-file table, got $allFiles")
    assert(probedFiles < allFiles,
      s"url probe read $probedFiles of $allFiles files — no skipping")
    assert(probed.collect().map(_.getString(0)).toSeq == Seq("text-7"))
    // deleted rows stay deleted under the pruned read
    assert(spark.sql(s"SELECT * FROM $cat.t WHERE document_url = " +
      "'doc://0003'").isEmpty)
    store.read() // keep the store referenced (API parity with DV spec)
  }

  test("TopN and LIMIT on a DV'd snapshot prune the pair list: head " +
      "queries read a strict file subset, results exact vs full sort") {
    import spark.implicits._
    val wh = freshWh()
    val store = new ChunkStore(spark, s"$wh/t",
      format = ManifestTableFormat.factory)
    // three value-contiguous files on page_number: 0-9 | 10-19 | 20-29
    def batch(ids: Range): DataFrame =
      ids.map(i => (0, s"text-$i", Seq(1f), i, f"doc://$i%04d"))
        .toDF("chunk_id", "chunk_text", "embedding", "page_number",
          "document_url").repartition(1)
    store.append(batch(0 until 10))
    store.append(batch(10 until 20))
    store.append(batch(20 until 30))
    val mtf = new ManifestTableFormat(spark, s"$wh/t", store.schema)
    // DV-delete a head row so the snapshot is DV'd AND the top-k
    // answer depends on applying the vector (page 0 is deleted)
    assert(mtf.deleteWhereDv(col("page_number") === 0)._2 > 0)
    val cat = catFor(wh, "dvcoltopn")

    // ORDER BY ASC LIMIT 3: only the head file can hold the top 3
    val q = spark.sql(s"SELECT page_number FROM $cat.t " +
      "ORDER BY page_number LIMIT 3")
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3),
      "DV must apply under the pruned TopN read")
    def dataFiles(df: DataFrame): Int = fileScans(df)
      .flatMap(_.relation.location.inputFiles)
      .filterNot(_.contains("/dv-")).distinct.size // not the DV sidecars
    val topNFiles = dataFiles(q)
    assert(topNFiles == 1,
      s"ASC LIMIT 3 must plan only the head file, planned $topNFiles")

    // DESC LIMIT 5: only the tail file
    val qd = spark.sql(s"SELECT page_number FROM $cat.t " +
      "ORDER BY page_number DESC LIMIT 5")
    assert(qd.collect().map(_.getInt(0)).toSeq ==
      Seq(29, 28, 27, 26, 25))
    assert(dataFiles(qd) == 1)

    // bare LIMIT: a prefix of the pair list covers n live rows
    val ql = spark.sql(s"SELECT page_number FROM $cat.t LIMIT 4")
    assert(ql.collect().length == 4)
    val limFiles = dataFiles(ql)
    assert(limFiles == 1,
      s"LIMIT 4 must plan one file (9 live rows there), got $limFiles")

    // a LIMIT past the live total keeps everything and stays exact
    assert(spark.sql(s"SELECT count(*) FROM (SELECT * FROM $cat.t " +
      "LIMIT 1000)").head().getLong(0) == 29)
  }

  test("vanilla session + GraftSession.install: the extraOptimizations " +
      "fallback seat (DataSourceV2ScanRelation branch) is columnar and " +
      "exact") {
    val wh = freshWh()
    dvTable(wh)
    // a session with NO extensions over the shared context — the shape
    // an external caller has before GraftSession.install. Its optimizer
    // runs every default batch, converts the relation to a
    // DataSourceV2ScanRelation (V1 fallback scan), and ONLY then hits
    // the installed extraOptimizations seat — the branch at
    // DvColumnarRead.rewrite's ScanRelation cases, which no
    // GraftSession.builder-built session ever reaches (the extension
    // seat substitutes pre-pushdown).
    val vanilla = org.apache.spark.sql.graftbridge.TestSessions
      .vanilla(spark)
    try {
      GraftSession.install(vanilla)
      vanilla.conf.set("spark.sql.catalog.dvcolv",
        classOf[graft.catalog.GraftCatalog].getName)
      vanilla.conf.set("spark.sql.catalog.dvcolv.warehouse", wh)

      val q = vanilla.sql(
        "SELECT document_url FROM dvcolv.t WHERE page_number = 2")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("RowDataSourceScan"),
        s"fallback-seat DV read took the V1 row path:\n$plan")
      assert(plan.contains("LeftAnti") && plan.contains("row_index"),
        s"no DV anti-join branch in the fallback-seat plan:\n$plan")
      // exactness: pages 3/4 deleted, page 2 intact
      assert(q.collect().map(_.getString(0)).sorted.toSeq ==
        (0 until 40).filter(_ % 10 == 2).map(i => f"doc://$i%04d"))
      assert(vanilla.sql("SELECT count(*) FROM dvcolv.t")
        .head().getLong(0) == 32)
      // and a failure inside the substituted subtree must fall back to
      // the exact V1 path, not kill the query: deleted rows stay deleted
      assert(vanilla.sql("SELECT * FROM dvcolv.t " +
        "WHERE document_url = 'doc://0003'").isEmpty)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }

  test("WRITE-side reads of a DV'd table are columnar too: a write's " +
      "re-planned query (Command root) must not drop to the V1 row " +
      "fallback (round-12 regression class)") {
    val wh = freshWh()
    dvTable(wh)
    val cat = catFor(wh, "dvcol5")
    // capture the plan the WRITE actually executes — df.write re-plans
    // under a Command root, the exact shape the old blanket
    // `case c: Command => c` guard silently sent to the V1 fallback
    @volatile var captured: Option[String] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.analyzed.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.plans
              .logical.Command]))
          captured = Some(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.sql(s"SELECT document_url FROM $cat.t WHERE page_number = 2")
        .write.format("noop").mode("overwrite").save()
      // listener delivery is async — bounded wait
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (captured.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val plan = captured.getOrElse(fail("write plan not captured"))
      assert(!plan.contains("RowDataSourceScan"),
        s"a WRITE of a DV'd read executed the V1 row fallback:\n$plan")
      assert(plan.contains("LeftAnti"),
        s"no DV anti-join in the write's executed plan:\n$plan")
    } finally spark.listenerManager.unregister(listener)

    // and the DML lanes still route: a DELETE on the same table works
    // (the command TARGET stayed a relation for the strategies)
    spark.sql(s"DELETE FROM $cat.t WHERE document_url = 'doc://0022'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 31)
  }

  test("COUNT(*) on a DV'd table is metadata-only: one LocalScan row " +
      "from rows − dv_card, no files read; filters and time travel " +
      "keep the scanning paths") {
    val wh = freshWh()
    dvTable(wh)
    val cat = catFor(wh, "dvcol6")

    val q = spark.sql(s"SELECT count(*) AS n FROM $cat.t")
    assert(q.head().getLong(0) == 32)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") ||
      plan.contains("GraftDvCountScan"),
      s"DV count(*) must plan a LocalScan:\n$plan")
    assert(!plan.contains("FileScan") &&
      !plan.contains("RowDataSourceScan"),
      s"DV count(*) must read NO files:\n$plan")

    // count moves with further DV deletes (live = rows − dv_card)
    val mtf = new ManifestTableFormat(spark, s"$wh/t",
      new ChunkStore(spark, s"$wh/t",
        format = ManifestTableFormat.factory).schema)
    mtf.deleteWhereDv(col("page_number") === 5)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 28)

    // a FILTER keeps the real (columnar) read; results exact
    val qf = spark.sql(
      s"SELECT count(*) FROM $cat.t WHERE page_number = 2")
    assert(qf.head().getLong(0) == 4)
    assert(!qf.queryExecution.executedPlan.toString
      .contains("GraftDvCountScan"))

    // time travel never counts from head stats (vectors drifted since)
    val vBefore = mtf.version - 1
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.t VERSION AS OF $vBefore")
      .head().getLong(0) == 32)
  }

  test("time-travel to a DV'd version takes the columnar path and " +
      "applies exactly that version's vectors") {
    val wh = freshWh()
    dvTable(wh)
    val cat = catFor(wh, "dvcol3")
    val mtf = new ManifestTableFormat(spark, s"$wh/t",
      new ChunkStore(spark, s"$wh/t",
        format = ManifestTableFormat.factory).schema)
    val vAfterFirstDelete = mtf.version - 1
    val q = spark.sql(s"SELECT count(*) FROM $cat.t " +
      s"VERSION AS OF $vAfterFirstDelete")
    assert(!q.queryExecution.executedPlan.toString
        .contains("RowDataSourceScan"))
    assert(q.head().getLong(0) == 36, "first DV delete only (4 rows)")
  }
}
