package graft.operators

import graft.SparkSpec

class ZCurveSpec extends SparkSpec {

  // zColumn resolves through the registered morton_interleave expression
  graft.functions.GraftFunctions.register(spark)

  test("spread/compact round-trip and interleave landmarks") {
    for (v <- Seq(0L, 1L, 2L, 0xffL, 0x1234L, 0xffffL)) {
      assert(ZCurve.compact(ZCurve.spread(v)) == v)
    }
    assert(ZCurve.zValue(0, 0) == 0L)
    assert(ZCurve.zValue(1, 0) == 1L)
    assert(ZCurve.zValue(0, 1) == 2L)
    assert(ZCurve.zValue(1, 1) == 3L)
    assert(ZCurve.zValue(0xffff, 0xffff) == 0xffffffffL)
    // full 8-bit round trip, and z is a bijection on the grid
    val zs = for (x <- 0L until 16L; y <- 0L until 16L) yield {
      val z = ZCurve.zValue(x, y)
      assert(ZCurve.unzValue(z) == ((x, y)))
      z
    }
    assert(zs.toSet == (0L until 256L).toSet)
  }

  test("zColumn ≡ zValue (codegen twin of the driver arithmetic)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZCurve.zColumn(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((xy, z) <- got) assert(z == ZCurve.zValue(xy._1, xy._2))
  }

  test("intervals: exact cover under a generous budget (exhaustive 6-bit)") {
    val bits = 6
    val boxes = Seq((0L, 63L, 0L, 63L), (5L, 17L, 9L, 40L), (7L, 7L, 3L, 3L),
      (0L, 0L, 0L, 63L), (31L, 32L, 31L, 32L), (60L, 63L, 0L, 2L))
    for ((x0, x1, y0, y1) <- boxes) {
      val rs = ZCurve.intervals(x0, x1, y0, y1, bits, budget = 100000)
      // disjoint, sorted, non-adjacent after merging
      for (i <- 1 until rs.size) assert(rs(i)._1 > rs(i - 1)._2 + 1)
      val covered = rs.flatMap { case (lo, hi) => lo to hi }.toSet
      val expect = (for (x <- x0 to x1; y <- y0 to y1)
        yield ZCurve.zValue(x, y)).toSet
      assert(covered == expect, s"box [$x0,$x1]x[$y0,$y1] not exact")
    }
  }

  test("intervals: budget bounds the count; union stays a superset") {
    val (x0, x1, y0, y1) = (5L, 200L, 9L, 140L)
    val exact = (for (x <- x0 to x1; y <- y0 to y1)
      yield ZCurve.zValue(x, y)).toSet
    for (budget <- Seq(1, 4, 16, 64)) {
      val rs = ZCurve.intervals(x0, x1, y0, y1, bits = 8, budget = budget)
      assert(rs.size <= budget, s"budget $budget exceeded: ${rs.size}")
      val covered = rs.flatMap { case (lo, hi) => lo to hi }.toSet
      assert(exact.subsetOf(covered), s"budget $budget lost box cells")
    }
    // tighter budget → never a SMALLER cover
    val c16 = ZCurve.intervals(x0, x1, y0, y1, 8, 16)
      .map { case (l, h) => h - l + 1 }.sum
    val c64 = ZCurve.intervals(x0, x1, y0, y1, 8, 64)
      .map { case (l, h) => h - l + 1 }.sum
    assert(c64 <= c16)
  }

  test("boxFilter ≡ brute box at every budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0L until 4096L).map(i => (i, i % 64L, (i * 7L) % 64L))
      .toDF("id", "x", "y")
      .withColumn("z", ZCurve.zColumn(col("x"), col("y")))
    val brute = df.filter(col("x").between(10L, 30L) &&
      col("y").between(20L, 55L)).select("id").collect().map(_.getLong(0)).toSet
    for (budget <- Seq(1, 8, 64, 1024)) {
      val got = ZCurve.boxFilter(df, col("x"), col("y"), col("z"),
        10L, 30L, 20L, 55L, bits = 6, budget = budget)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == brute, s"budget $budget diverged")
    }
  }
}
