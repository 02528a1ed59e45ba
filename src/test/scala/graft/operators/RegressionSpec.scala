package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class RegressionSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]): Map[String, Seq[Long]] =
    Regression.olsFractions(rows.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect()
      .map(r => r.getString(0) -> (1 to 8).map(r.getLong(_)).toSeq)
      .toMap

  test("exact line: y = 2x + 3 recovers slope 2 and intercept 3") {
    val got = run(Seq(("a", 0L, 3L), ("a", 1L, 5L), ("a", 2L, 7L),
      ("a", 3L, 9L)))
    val Seq(n, sx, sy, sxx, sxy, sNum, sDen, iNum) = got("a")
    assert((n, sx, sy, sxx, sxy) == ((4L, 6L, 24L, 14L, 46L)))
    assert(sNum == sDen * 2, s"slope should be exactly 2: $sNum/$sDen")
    assert(iNum == sDen * 3, s"intercept should be exactly 3: $iNum/$sDen")
  }

  test("negative trend: the sign is decidable on the integers") {
    val got = run(Seq(("d", 0L, 10L), ("d", 1L, 8L), ("d", 2L, 5L)))
    val Seq(_, _, _, _, _, sNum, sDen, _) = got("d")
    assert(sDen > 0 && sNum < 0, s"downward slope expected: $sNum/$sDen")
  }

  test("degenerate x spread emits den 0 instead of dividing") {
    val got = run(Seq(("z", 5L, 1L), ("z", 5L, 9L)))
    val Seq(_, _, _, _, _, _, sDen, _) = got("z")
    assert(sDen == 0L)
  }

  test("groups aggregate independently") {
    val got = run(Seq(("a", 0L, 0L), ("a", 1L, 1L),
      ("b", 0L, 0L), ("b", 1L, 2L)))
    assert(got("a")(5) == got("a")(6), "slope 1 in a") // num == den
    assert(got("b")(5) == 2 * got("b")(6), "slope 2 in b")
  }
}
