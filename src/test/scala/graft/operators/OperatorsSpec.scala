package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:02"), 101.0),
    (1L, ts("2024-01-01 10:00:04"), 102.0),
    (2L, ts("2024-01-01 10:00:01"), 200.0)
  ).toDF("key", "qts", "price")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:02"), "t1"), // equal-ts boundary
    (1L, ts("2024-01-01 10:00:03"), "t2"),
    (2L, ts("2024-01-01 10:00:00"), "t3"), // before any quote
    (3L, ts("2024-01-01 10:00:00"), "t4")  // key with no quotes
  ).toDF("key", "tts", "trade")

  test("asof join: inclusive takes the equal-ts row, strict takes the earlier one") {
    def run(strict: Boolean) =
      AsOf.join(trades, quotes, "key", "tts", "qts", Seq("price"), strict)
        .select("trade", "asof_price").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    val incl = run(strict = false)
    assert(incl("t1") == 101.0)  // equal ts matches
    assert(incl("t2") == 101.0)
    assert(incl("t3") == null)   // no earlier quote
    assert(incl("t4") == null)   // unseen key

    val strictRes = run(strict = true)
    assert(strictRes("t1") == 100.0)  // equal ts excluded
    assert(strictRes("t2") == 101.0)
  }

  test("asof join: tied right timestamps resolve deterministically to the greatest payload") {
    val dupQuotes = Seq(
      (1L, ts("2024-01-01 10:00:02"), 101.0),
      (1L, ts("2024-01-01 10:00:02"), 99.0),
      (1L, ts("2024-01-01 10:00:02"), 103.0)
    ).toDF("key", "qts", "price")
    val oneTrade = Seq((1L, ts("2024-01-01 10:00:03"), "t")).toDF("key", "tts", "trade")
    // repeated runs under different partitionings must agree: the window's
    // tertiary ordering makes the greatest payload struct the carried row
    (1 to 3).foreach { n =>
      val got = AsOf.join(
        oneTrade.repartition(n), dupQuotes.repartition(4 - n),
        "key", "tts", "qts", Seq("price"))
        .select("asof_price").head().getDouble(0)
      assert(got == 103.0, s"partitioning variant $n carried $got")
    }
  }

  test("asof join matches a per-row subquery oracle on fixture data") {
    val events = Tables(spark, sf0001, "events").limit(200).cache()
    val res = AsOf.join(
      events.select("event_id", "user_id", "ts"),
      events.select("user_id", "ts", "value"),
      "user_id", "ts", "ts", Seq("value"), strict = true)
    // oracle: max-ts strictly-earlier row via window
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, -1)
    val oracle = events
      .withColumn("prev_ts", last("ts", ignoreNulls = true).over(w))
      .select("event_id", "prev_ts")
    val joined = res.select(col("event_id"), col("asof_ts"))
      .join(oracle, "event_id")
    assert(joined.filter(!(col("asof_ts") <=> col("prev_ts"))).count() == 0)
  }

  test("salted join result set equals the plain join") {
    val orders = Tables(spark, sf0001, "orders").select("o_orderkey", "o_custkey")
    val lineitem = Tables(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val plain = lineitem.join(orders, "o_orderkey")
    val salted = SkewJoin.saltedInnerJoin(lineitem, orders, "o_orderkey", factor = 8)
    assert(salted.count() == plain.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col).toIndexedSeq: _*)).count() == 0)
  }

  test("salted join handles an extremely hot key") {
    val hot = Seq.fill(5000)((1L, "x")).toDF("k", "payload")
      .union(Seq((2L, "y")).toDF("k", "payload"))
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(hot, dim, "k", factor = 4)
    assert(out.count() == 5001)
    assert(out.filter(col("k") === 2L).select("name").head().getString(0) == "two")
  }
}
