package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    if (name == "events") normalizeEvents(spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize `events.ts` to µs TimestampType whatever layout the fixture
    * generator produced:
    *   - ns-int64 (r1–r5 fixtures read under `nanosAsLong`): floor-divide to
    *     µs — exact on int64; going through double would lose precision
    *     above 2^53 ns.
    *   - µs TIMESTAMP_NTZ (r6+ fixtures, `isAdjustedToUTC=0`): cast to
    *     TIMESTAMP — a value-identity ONLY under a UTC session timezone
    *     (asserted here; [[GraftSession.builder]] pins it), and required
    *     because `withWatermark` and the `unix_micros`-based operators
    *     reject NTZ. A non-UTC session would silently shift every event
    *     instant, so the NTZ branch refuses to proceed instead.
    *   - plain TIMESTAMP: already the target type, passed through.
    * Every engine read of `events` (batch and streaming) flows through this
    * one point, so a future fixture-layout change lands here — any OTHER
    * `ts` layout throws immediately, naming the column and type, and
    * [[graft.FixtureSchemaSpec]] pins the on-disk schema of every fixture
    * table at every local SF so drift is caught at test time too. */
  def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ and the NTZ->TIMESTAMP cast is only " +
            s"value-preserving under a UTC session timezone, got '$tz' — " +
            "build the session via GraftSession.builder")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType    => df
      case other            => throw new IllegalStateException(
        s"unrecognized events.ts layout: $other — known layouts are ns-int64 " +
          "(legacy nanosAsLong), TIMESTAMP_NTZ, and TIMESTAMP; teach " +
          "Tables.normalizeEvents the new layout before using this fixture")
    }

  /** Register every fixture as a temp view (for spark.sql users / tests). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
