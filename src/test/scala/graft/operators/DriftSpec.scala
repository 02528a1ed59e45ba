package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  import spark.implicits._

  test("added / removed / changed with exact column attribution") {
    val before = Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("k", "s", "n")
    val after = Seq(
      (1L, "a", 10),  // unchanged → omitted
      (2L, "B", 20),  // s changed
      (3L, "C", 31),  // both changed
      (5L, "e", 50))  // added; 4 removed
      .toDF("k", "s", "n")
    val got = Drift.changedColumns(before, after, "k", Seq("s", "n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (2L, "changed", Seq("s")),
      (3L, "changed", Seq("n", "s")),
      (4L, "removed", Seq()),
      (5L, "added", Seq())))
  }

  test("null-safe comparison: null→value changes, null→null does not") {
    val before = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("x"))).toDF("k", "s")
    val after = Seq((1L, Option.empty[String]), (2L, Some("v")),
      (3L, Option.empty[String])).toDF("k", "s")
    val got = Drift.changedColumns(before, after, "k", Seq("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((2L, "changed"), (3L, "changed")))
    // a row whose payload is entirely null still counts as PRESENT:
    // removing it reports "removed", not nothing
    val gone = Drift.changedColumns(before, before.filter($"k" =!= 1L), "k", Seq("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(gone == Seq((1L, "removed")))
  }
}
