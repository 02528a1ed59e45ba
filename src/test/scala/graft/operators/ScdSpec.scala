package graft.operators

import graft.SparkSpec

class ScdSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Int, String)]): Seq[(Long, Int, Option[Int], String)] =
    Scd.type2History(rows.toDF("k", "g", "st"), "k", "g", Seq("st"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)), r.getString(3)))
      .sortBy(t => (t._1, t._2))

  test("consecutive equal generations collapse into one interval") {
    val got = run(Seq((1L, 0, "a"), (1L, 1, "a"), (1L, 2, "b"), (1L, 3, "b")))
    assert(got == Seq((1L, 0, Some(2), "a"), (1L, 2, None, "b")))
  }

  test("a constant key yields a single open interval") {
    val got = run(Seq((2L, 0, "x"), (2L, 1, "x"), (2L, 2, "x")))
    assert(got == Seq((2L, 0, None, "x")))
  }

  test("flip-flopping attributes open a new version each time") {
    val got = run(Seq((3L, 0, "a"), (3L, 1, "b"), (3L, 2, "a")))
    assert(got == Seq((3L, 0, Some(1), "a"), (3L, 1, Some(2), "b"),
      (3L, 2, None, "a")))
  }

  test("null attributes compare null-safely (null→value is a boundary)") {
    val got = run(Seq((4L, 0, null), (4L, 1, null), (4L, 2, "v")))
    assert(got == Seq((4L, 0, Some(2), null), (4L, 2, None, "v")))
  }

  test("a generation gap extends the run when attributes are unchanged") {
    val got = run(Seq((5L, 0, "a"), (5L, 3, "a"), (5L, 5, "b")))
    assert(got == Seq((5L, 0, Some(5), "a"), (5L, 5, None, "b")))
  }
}
