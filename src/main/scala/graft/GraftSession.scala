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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  /** Create (or reuse) a session with all graft functions registered. */
  def getOrCreate(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    GraftFunctions.register(spark)
    spark
  }

  /** Register graft functions on an externally created session. */
  def install(spark: SparkSession): SparkSession = {
    GraftFunctions.register(spark)
    spark
  }
}

/** Harness-table loader (TESTDATA.md layout: one parquet per table). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
