package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every conformance query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and
  * total wall-clock seconds.
  *
  * Measurement notes:
  *  - results are written to the `noop` sink — forcing complete
  *    execution of every operator (a bare `count()` lets the optimizer
  *    drop sorts/projections and under-measures);
  *  - one tiny warmup pass at sf0.001 JIT-compiles the codegen and
  *    shuffle paths so per-query numbers reflect steady-state cost,
  *    not first-query JVM warmup.
  */
object Bench {

  private def runOne(
      spark: SparkSession,
      name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      dir: String): Double = {
    val t0 = System.nanoTime()
    try fn(spark, dir).write.format("noop").mode("overwrite").save()
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
    }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // dev-only: comma-separated name prefixes to bench a subset
    // (unset in the driver harness → full suite)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").toSeq).getOrElse(Nil)
    def selected(name: String): Boolean =
      filter.isEmpty || filter.exists(name.startsWith)
    val spark = GraftSession.install(GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // warmup at the smallest SF (JIT + codegen + shuffle machinery)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
      .map { case (name, fn) =>
        name -> runOne(spark, name, fn, sfDir)
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum

    // Ingest throughput (BASELINE.md's one enforceable envelope is
    // chunks/s): the p2-shaped batch ingest — extract → chunk →
    // deterministic embed → rows — timed end-to-end at this SF, so
    // the round-over-round 2x ingest gate is numeric, not inferred.
    val ingest =
      if (filter.isEmpty || filter.exists("p2_ingest_throughput".startsWith)) {
        try {
          val docs = Tables(spark, sfDir, "documents")
          val nDocs = docs.count()
          val m = new graft.pipeline.IngestMetrics(spark.sparkContext)
          val t0 = System.nanoTime()
          val out = graft.pipeline.IngestPipeline.ingestDocumentsTable(
            spark, docs, graft.embed.DeterministicEmbedder(64),
            metrics = Some(m))
          val nChunks = out.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val ms = m.snapshot
          f""","ingest":{"secs":$secs%.3f,"docs":$nDocs,"chunks":$nChunks,"docs_per_sec":${nDocs / secs}%.1f,"chunks_per_sec":${nChunks / secs}%.1f,"embed_batches":${ms("embed_batches")},"embed_texts":${ms("embed_texts")},"embed_retries":${ms("embed_retries")},"embed_millis":${ms("embed_millis")}}"""
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ingest throughput failed: ${e.getMessage}")
            ""
        }
      } else ""

    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$ingest,"sf":"$sfDir"}"""
    println(line)
    // Durability: the driver captures only the stdout TAIL, which has
    // truncated the per-query map two rounds running (a/b/c families
    // invisible cross-round). Also write the full JSON to a file in-repo
    // so every round's complete per-query map survives on disk.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_full_latest.json") // relative to the working directory
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] full-json write failed: ${e.getMessage}")
    }
    // The full line above is ~5 KB at 198 queries and the driver keeps
    // only a 2000-char stdout tail, which has cut it mid-map two rounds
    // running (PERF_r12/r13 `parsed: null`, empty per_query). Print a
    // FINAL compact totals line — always under the tail window — so the
    // last stdout line parses: total/ingest summary + a pointer to the
    // on-disk full map. Additions only; the full line and its file copy
    // are unchanged.
    val ingestCompact =
      if (ingest.nonEmpty) ingest.replaceFirst(",\"ingest\":", "\"ingest\":")
      else ""
    val sep = if (ingestCompact.nonEmpty) "," else ""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries_file":"$out",$ingestCompact$sep"sf":"$sfDir"}""")
    spark.stop()
  }
}
