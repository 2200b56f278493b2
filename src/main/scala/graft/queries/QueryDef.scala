package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession

/**
 * One declared capability: a Spark query over the fixture tables plus (when
 * SQL-expressible) an equivalent DuckDB oracle query. The driver hash-
 * compares both result sets — column NAMES must match, value types should
 * be hash-stable across engines (bigint/string/date; no raw double sums).
 */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  // which sfDir each session currently has registered — view registration
  // re-reads 10 parquet footers per call, which must not land inside a
  // benchmark's timed region. Keyed by the session REFERENCE (identity
  // equality — identityHashCode can collide across live objects); stopped
  // sessions are evicted on the next call so the map stays bounded.
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Registers the fixture tables of `sfDir` as temp views (idempotent,
    * cached per session so repeated query invocations skip the re-read). */
  def views(spark: SparkSession, sfDir: String): Unit = {
    registered.keySet().removeIf(_.sparkContext.isStopped)
    if (registered.get(spark) != sfDir) {
      // mark registered only AFTER a successful load: a throwing load
      // (e.g. a session-config precondition) must stay retryable, not
      // leave the session marked loaded with half its views missing
      GraftSession.loadTables(spark, sfDir)
      registered.put(spark, sfDir)
    }
  }

  /** Same SQL text runs on both engines. */
  def common(name: String, sql: String): QueryDef =
    QueryDef(name,
      (spark, sfDir) => { views(spark, sfDir); spark.sql(sql) },
      Some(sql))

  /** Different dialects, same semantics. */
  def dialect(name: String, sparkSql: String, duckSql: String): QueryDef =
    QueryDef(name,
      (spark, sfDir) => { views(spark, sfDir); spark.sql(sparkSql) },
      Some(duckSql))

  /** No SQL oracle (driver records a weaker rows-only check). */
  def sparkOnly(name: String,
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, (spark, sfDir) => { views(spark, sfDir); fn(spark, sfDir) },
      None)
}
