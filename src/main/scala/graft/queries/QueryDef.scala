package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One conformance query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL
  * the driver hash-compares against. Column names/aliases MUST match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)

  /** Register a FRESH GraftCatalog under an invocation-unique name
    * pointing at `warehouse`, returning the name. Needed because
    * Spark caches catalog INSTANCES by name per session with the
    * warehouse they were initialized with — a gate re-invoked on the
    * same session (the bench's warmup pass + timed pass) would
    * otherwise hit the PREVIOUS invocation's warehouse through the
    * cached instance (observed: c37g's second ALTER failing with
    * FIELD_ALREADY_EXISTS against the warmup run's table).
    */
  def freshCatalog(s: SparkSession, prefix: String,
      warehouse: String): String = {
    val cat = s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    cat
  }
}
