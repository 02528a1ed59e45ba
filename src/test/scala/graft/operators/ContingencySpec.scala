package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ContingencySpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Boolean, Boolean)])
      : Map[String, (Long, Long, Long, Long, Long, Long, Boolean)] =
    Contingency.chiSquare2x2(rows.toDF("g", "t", "h"),
        col("g"), col("t"), col("h"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))))
      .toMap

  test("a perfectly associated table maxes the statistic: chi2 = N") {
    // a=2,d=2,b=c=0: chi2 = 4*(4)^2/(2*2*2*2) = 4 = N → sig false (4>3.84 ✓ true!)
    val rows = Seq(("x", true, true), ("x", true, true),
      ("x", false, false), ("x", false, false))
    val (a, b, c, d, num, den, sig) = run(rows)("x")
    assert((a, b, c, d) == ((2L, 0L, 0L, 2L)))
    assert(num == 4L * 16L && den == 16L)
    assert(sig, "chi2 = 4.0 > 3.84 must flag")
  }

  test("an independent table scores zero and never flags") {
    // equal rates in both arms: ad = bc
    val rows = Seq(("y", true, true), ("y", true, false),
      ("y", false, true), ("y", false, false))
    val (_, _, _, _, num, den, sig) = run(rows)("y")
    assert(num == 0L && den > 0L && !sig)
  }

  test("degenerate margins emit den 0, not-testable, never divide") {
    // all rows treated: control column empty
    val rows = Seq(("z", true, true), ("z", true, false))
    val (_, _, _, _, _, den, sig) = run(rows)("z")
    assert(den == 0L && !sig)
  }

  test("the 3.84 boundary decides on integers") {
    // chi2 exactly 3.84 would flag (>=); build chi2 = 3.6 < 3.84:
    // a=9,b=1,c=5,d=5: det=40, N=20, num=20*1600=32000,
    // den=10*10*14*6=8400 → chi2≈3.81 → 100*32000=3.2e6 ≥ 384*8400=3.2256e6? no
    val rows = Seq.fill(9)(("w", true, true)) ++ Seq(("w", true, false)) ++
      Seq.fill(5)(("w", false, true)) ++ Seq.fill(5)(("w", false, false))
    val (_, _, _, _, num, den, sig) = run(rows)("w")
    assert(num == 32000L && den == 8400L)
    assert(!sig, "chi2 = 3.81 sits just under the 3.84 line")
  }
}
