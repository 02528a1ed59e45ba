package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{BatchQueries, Q}
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY §2.9 + LLM-pipeline extensions) is a named
  * [[graft.queries.Q]]; this object flattens the registry into the driver's
  * `queries` / `oracleSql` maps.
  */
object SparkEntry {

  /** Full declared-query registry (batch + streaming-batch-equivalent + LLM
    * + coverage extensions). */
  def allQueries: Seq[Q] =
    BatchQueries.all ++ StreamingQueries.all ++ graft.llm.LlmQueries.all ++
      graft.queries.ExtendedQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BatchQueries.q03.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
