package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift guard (the spec [[Tables.normalizeEvents]]'s scaladoc
  * promises): pins the ENGINE-VISIBLE schema — what `Tables(...)` hands
  * every query after normalization — of every fixture table at every local
  * SF, and pins [[Tables.normalizeEvents]]'s per-layout behavior including
  * its refusal paths. The r6 five-component breakage happened exactly here:
  * the driver regenerated `events` from ns-int64 to µs TIMESTAMP_NTZ and
  * the old silent pass-through let the drift surface as five unrelated
  * analysis errors. A drifted column now fails THIS suite first, named.
  */
class FixtureSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  /** Engine contract: field name → dataType AFTER Tables normalization
    * (events.ts arrives as µs TIMESTAMP whatever the fixture layout). */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every fixture table at every local SF matches the engine schema contract") {
    assert(sfDirs.nonEmpty, "no local fixture dirs found under /root/testdata")
    assert(expected.keySet == Tables.names.toSet,
      "spec's table list drifted from Tables.names")
    for (dir <- sfDirs; name <- Tables.names) {
      val got = Tables(spark, dir, name).schema
        .map(f => f.name -> f.dataType)
      FixtureSchemaSpec.firstDrift(expected(name), got).foreach(d =>
        fail(s"$dir/$name.parquet drifted at $d — if the fixture layout " +
          "legitimately changed, teach Tables/this spec the new layout"))
    }
  }

  test("drift detection names the drifted column, not just 'schemas differ'") {
    // the r6 failure mode in miniature: a re-typed, a renamed, a dropped,
    // and an extra column must each produce a message naming the culprit
    val want = Seq("a" -> LongType, "ts" -> TimestampType)
    def drift(got: Seq[(String, DataType)]): String =
      FixtureSchemaSpec.firstDrift(want, got).getOrElse(fail("drift missed"))
    assert(FixtureSchemaSpec.firstDrift(want, want).isEmpty)
    assert(drift(Seq("a" -> LongType, "ts" -> TimestampNTZType))
      .contains("expected ts:TIMESTAMP, read ts:TIMESTAMP_NTZ"))
    assert(drift(Seq("a" -> LongType, "t2" -> TimestampType)).contains("t2"))
    assert(drift(Seq("a" -> LongType)).contains("column-missing-from-fixture"))
    assert(drift(want :+ ("x" -> StringType)).contains("no-column-expected-here"))
  }

  // (companion holds the drift helper so the message format is unit-tested)

  test("normalizeEvents: ns-int64 layout floor-divides to exact µs") {
    val df = Seq((1L, 1_500_000_001_999L)).toDF("event_id", "ts")
    val out = Tables.normalizeEvents(df)
    assert(out.schema("ts").dataType == TimestampType)
    // 1_500_000_001_999 ns -> 1_500_000_001 µs, truncated not rounded
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == 1_500_000_001L)
  }

  test("normalizeEvents: NTZ layout casts value-identically under the UTC session") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", lit("2024-03-01 12:34:56.789").cast(TimestampNTZType))
    val out = Tables.normalizeEvents(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .head.getString(0) == "2024-03-01 12:34:56.789")
  }

  test("normalizeEvents: NTZ layout refuses a non-UTC session timezone") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", current_timestamp().cast(TimestampNTZType))
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException](Tables.normalizeEvents(df))
      assert(e.getMessage.contains("America/New_York") &&
        e.getMessage.contains("GraftSession.builder"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("normalizeEvents: TIMESTAMP layout passes through unchanged") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(42L)))
    assert(Tables.normalizeEvents(df) eq df)
  }

  test("normalizeEvents: an unrecognized ts layout throws, naming the type") {
    val df = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEvents(df))
    assert(e.getMessage.contains("events.ts") &&
      e.getMessage.toLowerCase.contains("string"))
  }
}

object FixtureSchemaSpec {
  import org.apache.spark.sql.types.{DataType, NullType}

  /** First drifted column between the expected and read layouts, rendered
    * with the column and both types named; None when identical. The
    * placeholders label length mismatches (fixture grew / lost a column). */
  def firstDrift(want: Seq[(String, DataType)],
      got: Seq[(String, DataType)]): Option[String] =
    want.zipAll(got,
      "«no-column-expected-here»" -> NullType,
      "«column-missing-from-fixture»" -> NullType)
      .collectFirst { case (w, g) if w != g =>
        s"column ${g._1}: expected ${w._1}:${w._2.sql}, read ${g._1}:${g._2.sql}"
      }
}
