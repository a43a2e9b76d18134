package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ANALYZE + NDV sketches (the Iceberg Puffin idea): one DV-aware
  * scan records an HLL sketch per column in a version-stamped
  * sidecar; estimates serve the planner's DSv2 column statistics and
  * `CALL ndv`. Pins: estimate quality, supersession + vacuum of old
  * sidecars, DV-aware re-analysis, the columnStats path through the
  * scan, and refusals.
  */
class NdvSpec extends SparkSpec {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-ndv").toString + "/t"

  private def chunkRows(ids: Range) = {
    import spark.implicits._
    ids.map(i => (0, s"t$i", Seq(1f), i % 7, f"doc://$i%05d"))
      .toDF("chunk_id", "chunk_text", "embedding", "page_number",
        "document_url").coalesce(1)
  }

  test("analyze records estimates within tolerance; re-analyze " +
      "supersedes and vacuum reclaims the old sidecar") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 500))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    val (v1, est1) = mtf.analyzeNdv(Seq("document_url", "page_number"))
    assert(v1 == mtf.version)
    assert(math.abs(est1("document_url") - 500L) <= 25,
      s"url NDV ${est1("document_url")} off by >5%")
    assert(est1("page_number") == 7L, "tiny cardinality must be exact")
    // churn + re-analyze: the new sidecar wins…
    store.append(chunkRows(501 to 600))
    val (v2, est2) = mtf.analyzeNdv(Seq("document_url"))
    assert(v2 > v1)
    assert(mtf.ndvInfo.exists(_._1 == v2))
    assert(math.abs(est2("document_url") - 600L) <= 30)
    // …and vacuum reclaims the superseded one
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ndvFiles = () => fs.listStatus(
        new org.apache.hadoop.fs.Path(path, "_log")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".ndv.json"))
    assert(ndvFiles().size == 2)
    mtf.vacuum()
    assert(ndvFiles().size == 1)
    assert(mtf.ndvInfo.exists(_._1 == v2), "newest analysis survives")
  }

  test("analyze is DV-aware: deleted rows leave the estimate") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 400))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    spark.conf.set("spark.graft.deletionVectors", "true")
    try mtf.deleteWhere(col("document_url") <= "doc://00200")
    finally spark.conf.unset("spark.graft.deletionVectors")
    val (_, est) = mtf.analyzeNdv(Seq("document_url"))
    assert(math.abs(est("document_url") - 200L) <= 10,
      s"DV'd rows must not count: ${est("document_url")}")
  }

  test("the scan serves analyze estimates as DSv2 column statistics") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-ndvscan").toString
    val cat = s"ndvcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, g INT) " +
      "TBLPROPERTIES ('format'='manifest')")
    spark.range(1000).selectExpr("id AS k", "CAST(id % 10 AS INT) AS g")
      .createOrReplaceTempView("ndv_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM ndv_src")
    // before analyze: no column statistics
    def colStats() = {
      val scans = spark.table(s"$cat.t").queryExecution.optimizedPlan
        .collect {
          case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.scan
        }
      assert(scans.nonEmpty, "expected a DSv2 scan")
      scans.head match {
        case s: org.apache.spark.sql.connector.read
            .SupportsReportStatistics =>
          s.estimateStatistics().columnStats()
        case other => fail(s"scan reports no statistics: $other")
      }
    }
    assert(colStats().isEmpty)
    spark.sql(s"CALL $cat.analyze('t', 'k,g')")
    val stats = colStats()
    assert(!stats.isEmpty, "analyze estimates must reach the scan")
    val byName = {
      import scala.jdk.CollectionConverters._
      stats.asScala.map { case (ref, cs) =>
        ref.fieldNames().mkString(".") -> cs.distinctCount() }
    }
    assert(byName("g").getAsLong == 10L)
    assert(math.abs(byName("k").getAsLong - 1000L) <= 50)
  }

  test("refusals: unknown column, never-analyzed ndv read") {
    val path = freshPath()
    val store = new ChunkStore(spark, path,
      format = ManifestTableFormat.factory)
    store.append(chunkRows(1 to 10))
    val mtf = new ManifestTableFormat(spark, path, store.schema)
    intercept[IllegalArgumentException] { mtf.analyzeNdv(Seq("nope")) }
    assert(mtf.ndvInfo.isEmpty)
  }
}
