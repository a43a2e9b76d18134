package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All conformance queries, keyed by SURVEY §2 inventory id. */
  lazy val all: Map[String, QueryDef] =
    VectorQueries.defs ++ RelationalQueries.defs ++
      RelationalExtraQueries.defs ++ ChunkQueries.defs ++
      PipelineQueries.defs ++ LlmOpsQueries.defs ++
      RetrievalQueries.defs ++ CorpusQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Slice 0: exact vector top-k via the custom cosine_distance expression.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.install(spark)
    all("b2_vector_topk").fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) =>
      k -> { (s: SparkSession, dir: String) =>
        GraftSession.install(s)
        d.fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
