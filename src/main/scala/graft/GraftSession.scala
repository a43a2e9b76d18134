package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.GraftFunctions

/** Session factory: one place for the scale-aware defaults.
  *
  * Tuned for local[N] testing but written for cluster scale: AQE on
  * (runtime shuffle-partition coalescing + skew-join splitting),
  * modest broadcast threshold so dimension tables broadcast, UTC
  * session timezone to match the DuckDB oracle.
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-engine")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom filters push a selective join side's key set into
      // the other side's shuffle scan (fact-fact joins after selective
      // filters) — default-on in recent Spark, pinned so plans don't
      // shift across versions. NOTE: does not fire for broadcast joins
      // over bare scans (Spark injects only when the application side
      // probably shuffles).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // let the planner pick SHUFFLED HASH over sort-merge when its
      // own size conditions hold (build side locally hashable and 3x
      // smaller — guide §3.1): skips two whole-side sorts. Explicit
      // `merge` hints (SkewJoin) still force SMJ, and oversized build
      // sides still fall back to SMJ via the planner's guard, so this
      // is a preference, not a local-scale tune.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
      // extension rules get the operator-optimization seat (the
      // extraOptimizations fallback in install() runs post-pushdown)
      .withExtensions(new GraftExtensions)

  /** Create (or reuse) a session with all graft functions and
    * optimizer rules registered.
    */
  def getOrCreate(master: String = "local[32]"): SparkSession =
    install(builder(master).getOrCreate())

  /** Register graft functions and optimizer rules on an externally
    * created session (idempotent).
    */
  def install(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    graft.functions.VectorAggregates.register(spark)
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.PrenormalizeCosine))
      spark.experimental.extraOptimizations =
        extra :+ graft.plans.PrenormalizeCosine
    // DV columnar read on externally-created sessions: this seat runs
    // after scan pushdown, so the rule matches the already-built scan
    // relation (still vectorized + codegen'd; sessions built via
    // GraftSession.builder get the early extension seat instead, and
    // the substitution there is a no-op here by idempotence)
    val extraMc = spark.experimental.extraOptimizations
    if (!extraMc.contains(graft.plans.MetadataFilteredCount))
      spark.experimental.extraOptimizations =
        extraMc :+ graft.plans.MetadataFilteredCount
    val extra2 = spark.experimental.extraOptimizations
    if (!extra2.contains(graft.plans.DvColumnarRead))
      spark.experimental.extraOptimizations =
        extra2 :+ graft.plans.DvColumnarRead
    // SQL UPDATE on graft catalog tables: extra strategies run before
    // the built-ins, claiming UpdateTable before BasicOperators
    // rejects it (see graft.plans.GraftDmlStrategy)
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(graft.plans.GraftDmlStrategy))
      spark.experimental.extraStrategies =
        strategies :+ graft.plans.GraftDmlStrategy
    spark
  }
}

/** Harness-table loader (TESTDATA.md layout: one parquet per table). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memo of the LAZY DataFrame handle per (session, dir, table): each
  // `spark.read.parquet` fires a file-listing/footer job at plan-build
  // time, and the conformance queries re-open the same handful of
  // immutable input tables hundreds of times per run (measured ~13
  // such jobs in one gate alone). The memo caches only the UNRESOLVED
  // PLAN — every action on it still scans the parquet inputs, so no
  // result or data is ever reused across queries. Keyed weakly by
  // session so test sessions don't pin plans after they stop.
  private val memo =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(String, String), DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.synchronized {
      memo.computeIfAbsent(spark,
          _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate((dir, name), load(spark, dir, name))
    }

  private def load(spark: SparkSession, dir: String, name: String)
      : DataFrame =
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
      // drops and TIMESTAMP(MICROS, ntz) in others — normalize both to
      // session-local TimestampType (session tz is pinned UTC, so the
      // NTZ→LTZ cast is value-preserving).
      //  - NANOS: Spark 4 can't map it to TimestampType directly
      //    (PARQUET_TYPE_ILLEGAL). Read nanos as LONG and convert with
      //    integer division: the raw value (~1.7e18) exceeds 2^53, so a
      //    double-typed `/` would silently lose microseconds; `div`
      //    keeps it exact.
      //  - MICROS (no tz): arrives as TIMESTAMP_NTZ; plain cast.
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every harness table as a temp view on the session. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
