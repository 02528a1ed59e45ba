package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a named DataFrame program plus (when SQL-expressible)
  * the equivalent ANSI SQL the DuckDB oracle runs over the same parquet
  * fixtures (SURVEY §2.9). Queries with no oracle get a weaker rows-only
  * check from the driver (seeded-model ops like LSH).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = true) {
  def run(spark: SparkSession, sfDir: String): DataFrame = fn(spark, sfDir)
}

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Composite of individually-timed operators: registered for correctness,
    * excluded from the default bench headline set. */
  def composite(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, headline = false)

  /** Oracle-checked but excluded from the bench timing set — for queries
    * with side effects (e.g. q49's CSV staging write) that must not run
    * outside the Verify single-writer protocol. */
  def offBench(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle), headline = false)
}
