package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table access (TESTDATA.md / FIXTURES.md).
  *
  * All engine queries read the driver-generated parquet fixtures through this
  * single entry point so schema expectations live in one place. Reads are plain
  * `spark.read.parquet` — Spark's vectorized reader + Catalyst column pruning /
  * predicate pushdown do the heavy lifting (SURVEY §4.2).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is ns-precision parquet; Spark has no ns timestamp, so read
      // the raw int64 and truncate to µs (matching DuckDB's ns→µs truncation).
      // The nanos flag is a session-build concern (GraftSession) — asserting
      // here instead of setting it keeps a table read free of session-global
      // side effects a concurrent reader would silently inherit.
      require(
        spark.conf.getOption(GraftSession.NanosFlag).contains("true"),
        s"events.parquet carries ns-precision timestamps: build the session " +
          s"via GraftSession.builder (or set ${GraftSession.NanosFlag}=true " +
          "on your own builder) before reading it")
      normalizeEvents(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** ns-int64 `ts` → µs TimestampType (floor division, exact on int64 —
    * going through double would lose precision above 2^53 ns). */
  def normalizeEvents(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df

  /** Register every fixture as a temp view (for spark.sql users / tests). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
