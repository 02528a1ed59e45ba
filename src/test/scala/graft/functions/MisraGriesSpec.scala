package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int = 8) = {
    GraftFunctions.register(spark)
    items.toDF("item").repartition(parts)
      .agg(call_function(GraftFunctions.MisraGriesName,
        col("item"), lit(k)).as("sk"))
      .head().getMap[String, Long](0)
  }

  test("MG guarantee: true − n/(k+1) ≤ est ≤ true, heavy hitters present") {
    // skewed stream: zipf-ish counts over 40 items, n = 40+39+...+1 = 820
    val items = (1 to 40).flatMap(i => Seq.fill(41 - i)(s"t$i"))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    for (k <- Seq(5, 10, 20)) {
      val sk = sketch(items, k)
      assert(sk.size <= k, s"k=$k size=${sk.size}")
      val bound = n.toDouble / (k + 1)
      sk.foreach { case (item, est) =>
        val t = truth(item)
        assert(est <= t, s"k=$k $item over-estimates: $est > $t")
        assert(est >= t - bound, s"k=$k $item est $est < $t − $bound")
      }
      // soundness of the screen: every item with freq > n/(k+1) is present
      truth.filter(_._2 > bound).keys.foreach { item =>
        assert(sk.contains(item), s"k=$k heavy hitter $item absent")
      }
    }
  }

  test("merge guarantee holds across partition counts (merge-tree shapes)") {
    val items = (1 to 25).flatMap(i => Seq.fill(26 - i)(s"w$i")) ++
      Seq.fill(200)("dominant")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    val k = 8
    for (parts <- Seq(1, 3, 16)) {
      val sk = sketch(items, k, parts)
      val bound = n.toDouble / (k + 1)
      sk.foreach { case (item, est) =>
        assert(est <= truth(item) && est >= truth(item) - bound,
          s"parts=$parts $item est=$est true=${truth(item)}")
      }
      assert(sk.contains("dominant"), s"parts=$parts dominant absent")
    }
  }

  test("null items are skipped; empty input yields an empty map, not null") {
    GraftFunctions.register(spark)
    val sk = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .agg(call_function(GraftFunctions.MisraGriesName,
        col("item"), lit(4)).as("sk"))
      .head().getMap[String, Long](0)
    assert(sk.toMap == Map("a" -> 2L))
    val empty = Seq.empty[String].toDF("item")
      .agg(call_function(GraftFunctions.MisraGriesName,
        col("item"), lit(4)).as("sk"))
      .head()
    assert(!empty.isNullAt(0) && empty.getMap[String, Long](0).isEmpty)
  }

  test("capacity is validated: non-positive and over-ceiling rejected") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      Seq("a").toDF("item")
        .agg(call_function(GraftFunctions.MisraGriesName,
          col("item"), lit(0)).as("sk")).head()
    }
    intercept[Exception] {
      Seq("a").toDF("item")
        .agg(call_function(GraftFunctions.MisraGriesName,
          col("item"), lit((1 << 20) + 1)).as("sk")).head()
    }
  }

  test("within-capacity input is exact and keys render in sorted order") {
    val sk = sketch(Seq("c", "a", "b", "a", "c", "a"), k = 10, parts = 2)
    assert(sk.toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 2L))
    // GetMapValue preserves the buffer's render order — sorted by key
    assert(sk.keys.toSeq == sk.keys.toSeq.sorted)
  }
}
