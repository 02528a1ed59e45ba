package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = Triangles.canonical(edges.toDF("s", "d"), "s", "d")
    Triangles.perNode(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hand graphs: triangle, square, square+diagonal, K4") {
    // a plain triangle: each node closes exactly 1
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a 4-cycle has none
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
    // add one diagonal: two triangles sharing it
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))) ==
      Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
    // K4: 4 triangles, each node in 3
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicates, reversed edges, and self-loops do not change counts") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = base ++ Seq((2L, 1L), (3L, 2L), (1L, 1L), (2L, 2L), (1L, 2L))
    assert(tri(noisy) == tri(base))
  }

  test("star hub closes nothing; orientation bounds its wedge fan-out") {
    // hub 0 connected to 1..10, no edges among leaves: zero triangles —
    // and with degree orientation the hub is everyone's HEAD, so it
    // contributes zero wedges as a center (the O(√m) bound in action)
    val star = (1L to 10L).map(i => (0L, i))
    assert(tri(star).isEmpty)
    // add one leaf edge: exactly one triangle through the hub
    assert(tri(star :+ (3L, 7L)) == Map(0L -> 1L, 3L -> 1L, 7L -> 1L))
  }

  test("matches the brute 3-way join on a pseudo-random graph") {
    val edges = (0 until 400).map { i =>
      ((i * 7919L) % 30L, (i * 104729L + 3) % 30L)
    }.filter(e => e._1 != e._2)
    val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val brute = (for {
      (a, b) <- canon; (b2, c) <- canon if b2 == b
      if canon.contains((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(tri(edges) == brute)
  }
}
