package graft.llm

import graft.SparkSpec

class SetSimJoinSpec extends SparkSpec {

  import spark.implicits._

  private def join(sets: Seq[(Long, String)], tNum: Int,
      tDen: Int): Seq[(Long, Long, Long, Long, Long)] =
    SetSimJoin.jaccardJoin(sets.toDF("doc_id", "s"), tNum, tDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2))

  private def sets(m: (Long, Seq[String])*): Seq[(Long, String)] =
    m.flatMap { case (id, ss) => ss.map(id -> _) }

  test("finds exactly the pairs meeting the threshold, intersection exact") {
    // A={a,b,c,d}, B={a,b,c,e}: J = 3/5 ≥ 1/2 ✓; C={x,y}: no pair
    val got = join(sets(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("x", "y")), 1, 2)
    assert(got == Seq((1L, 2L, 3L, 4L, 4L)))
  }

  test("boundary: J exactly at the threshold is INCLUDED") {
    // A={a,b}, B={a,c}: J = 1/3 — threshold 1/3 keeps it, 1/2 drops it
    val s = sets(1L -> Seq("a", "b"), 2L -> Seq("a", "c"))
    assert(join(s, 1, 3).map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(join(s, 1, 2).isEmpty)
  }

  test("prefix completeness: a rare-token-disjoint prefix still finds the pair") {
    // Both sets share only their COMMON tokens; the global rarity
    // order must place shared tokens into at least one prefix.
    // A={p,q,r,s,t,u}, B={p,q,r,s,t,v}: J = 5/7 ≥ 1/2
    val got = join(sets(
      1L -> Seq("p", "q", "r", "s", "t", "u"),
      2L -> Seq("p", "q", "r", "s", "t", "v")), 1, 2)
    assert(got == Seq((1L, 2L, 5L, 6L, 6L)))
  }

  test("identical sets: J = 1 passes any threshold") {
    val got = join(sets(
      1L -> Seq("a", "b"), 2L -> Seq("a", "b")), 1, 1)
    assert(got == Seq((1L, 2L, 2L, 2L, 2L)))
  }

  test("hot shared token alone does not fake a pair") {
    // 'z' is in every set (hot, sorts LAST in rarity order) but the
    // sets are otherwise disjoint: J = 1/5 < 1/2 for every pair
    val got = join(sets(
      1L -> Seq("z", "a", "b"), 2L -> Seq("z", "c", "d"),
      3L -> Seq("z", "e", "f")), 1, 2)
    assert(got.isEmpty)
  }

  test("shingles are distinct per doc and skip short docs") {
    val sh = SetSimJoin.shingles(
      Seq((1L, "abcabc"), (2L, "ab")).toDF("doc_id", "text"), "doc_id",
      "text", 3).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sh.count(_._1 == 2L) == 0, "doc 2 is shorter than k")
    // "abcabc" 3-grams: abc, bca, cab, abc → distinct {abc, bca, cab}
    assert(sh.filter(_._1 == 1L).map(_._2).sorted.toSeq ==
      Seq("abc", "bca", "cab"))
  }
}
