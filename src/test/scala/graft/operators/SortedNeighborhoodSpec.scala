package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, String)], w: Int) =
    SortedNeighborhood.pairs(rows.toDF("id", "name"), "id", "name",
        substring(col("name"), 1, 1), w)
      .select("id1", "id2", "gap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("pairs = exactly the rank-window pairs, once each (vs brute)") {
    val rows = Seq(11L -> "apple", 12L -> "apply", 13L -> "angle",
      14L -> "ample", 15L -> "amble", 16L -> "axiom", 17L -> "azure")
    for (w <- Seq(2, 3, 4, 7)) {
      // brute replay of the definition: rank by (key, id), all pairs
      // with 1 <= gap <= w-1
      val ranked = rows.sortBy { case (id, name) => (name, id) }
        .map(_._1).zipWithIndex
      val brute = (for {
        (i1, r1) <- ranked; (i2, r2) <- ranked
        g = r2 - r1 if g >= 1 && g <= w - 1
      } yield (i1, i2, g)).sortBy(t => (t._1, t._2))
      assert(pairsOf(rows, w) == brute, s"w=$w")
    }
  }

  test("blocking bounds the neighborhood: cross-block pairs never form") {
    val rows = Seq(1L -> "bolt", 2L -> "bolts", 3L -> "colt")
    // "colt" is 1 edit from "bolt" but sorts into block 'c' — the
    // documented sorted-neighborhood blind spot (first-character typo)
    assert(pairsOf(rows, 4) == Seq((1L, 2L, 1)))
  }

  test("rank ties break by id: deterministic pairs under equal keys") {
    val rows = Seq(5L -> "same", 3L -> "same", 4L -> "same")
    assert(pairsOf(rows, 2) == Seq((3L, 4L, 1), (4L, 5L, 1)))
  }

  test("w must cover at least a pair") {
    intercept[IllegalArgumentException] {
      SortedNeighborhood.pairs(Seq(1L -> "a").toDF("id", "name"),
        "id", "name", lit("b"), 1)
    }
  }
}
