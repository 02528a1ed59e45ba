package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class PathRollupSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long)]): Map[String, (Int, Long, Long)] =
    PathRollup.prefixRollup(rows.toDF("p", "w"), col("p"), col("w"))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("every ancestor directory accumulates counts and bytes") {
    val got = run(Seq(("a/b/f1", 10L), ("a/b/f2", 5L), ("a/c/f3", 1L)))
    assert(got == Map(
      "a" -> ((1, 3L, 16L)),
      "a/b" -> ((2, 2L, 15L)),
      "a/c" -> ((2, 1L, 1L))))
  }

  test("the leaf itself is not a directory") {
    val got = run(Seq(("x/y", 7L)))
    assert(got.contains("x") && !got.contains("x/y"))
  }

  test("slash-less paths contribute nothing (no phantom prefixes)") {
    assert(run(Seq(("lonefile", 3L))).isEmpty)
  }
}
