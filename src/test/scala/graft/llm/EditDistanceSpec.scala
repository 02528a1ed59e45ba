package graft.llm

import graft.SparkSpec

class EditDistanceSpec extends SparkSpec {

  /** Independent reference: plain full-matrix DP (no banding, no Spark). */
  private def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0) // dp[i-1][j-1]
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(
          math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def brute(corpus: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
      d = levenshtein(ta, tb) if d <= k
    } yield (ia, ib, d)).toSet

  private def engine(corpus: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    EditDistance.passJoin(corpus.toDF("id", "text"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  // word pool shared with the fixtures' vocabulary flavor
  private val words = Seq("scan", "join", "agg", "row", "key", "hash", "sort")

  /** Deterministic pseudo-random corpus with planted near-dups: base
    * strings plus single-char deletes/substitutions/inserts and a few
    * two-edit variants — every pair class the join must find. */
  private def corpus(n: Int): Seq[(Long, String)] = {
    def base(i: Int): String =
      (0 until 4 + i % 5).map(j => words((i * 7 + j * 3) % words.length))
        .mkString(" ")
    (0 until n).flatMap { i =>
      val t = base(i)
      val id = i.toLong * 10
      val variants = Seq.newBuilder[(Long, String)]
      variants += ((id, t))
      if (i % 3 == 0) // delete
        variants += ((id + 1, t.substring(0, i % t.length) + t.substring(i % t.length + 1)))
      if (i % 4 == 0) // substitute
        variants += ((id + 2, t.updated((i * 5) % t.length, '#')))
      if (i % 5 == 0) // insert
        variants += ((id + 3, t.substring(0, (i * 3) % t.length) + "@" + t.substring((i * 3) % t.length)))
      if (i % 6 == 0) // two edits
        variants += ((id + 4, ("!" + t).updated(t.length / 2, '%')))
      variants.result()
    }
  }

  test("passJoin ≡ brute force on a planted corpus, k = 1 and 2") {
    val c = corpus(40)
    for (k <- Seq(1, 2)) {
      val expected = brute(c, k)
      val got = engine(c, k)
      assert(got == expected,
        s"k=$k diverged: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(expected.nonEmpty, s"vacuous fixture at k=$k")
    }
  }

  test("short strings (symmetric-delete path) ≡ brute force, k = 2") {
    // every length from empty through just-past the pigeonhole boundary,
    // including repeated-char strings (many equal segments) and ties
    val c: Seq[(Long, String)] = Seq(
      0L -> "", 1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "ba", 5L -> "aa",
      6L -> "aaa", 7L -> "aab", 8L -> "abc", 9L -> "abcd", 10L -> "axcd",
      11L -> "abcde", 12L -> "abde", 13L -> "aaaaaaaa", 14L -> "aaaabaaa",
      15L -> "xyzxyzxyz", 16L -> "xyzxyzxy", 17L -> "zzzz")
    val expected = brute(c, 2)
    val got = engine(c, 2)
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // the fixture must actually cross the short/pigeonhole boundary
    assert(expected.exists { case (a, b, _) => a <= 5 && b >= 9 } ||
      expected.exists { case (a, b, _) => a <= 9 && b <= 9 })
  }

  test("k = 3 on a mixed corpus ≡ brute force") {
    val c = corpus(15) ++ Seq(900L -> "ab", 901L -> "abc", 902L -> "a")
    val expected = brute(c, 3)
    val got = engine(c, 3)
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("exact duplicates surface as dist 0") {
    val c = Seq(1L -> "scan join agg", 2L -> "scan join agg", 3L -> "scan join agx")
    assert(engine(c, 1) == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("deletionNeighborhood: exact membership at small sizes") {
    assert(EditDistance.deletionNeighborhood("", 2) == Set(""))
    assert(EditDistance.deletionNeighborhood("ab", 1) == Set("ab", "a", "b"))
    assert(EditDistance.deletionNeighborhood("abc", 2) ==
      Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    // C(4,≤2)-bounded: 1 + 4 + 6 distinct results for distinct chars
    assert(EditDistance.deletionNeighborhood("abcd", 2).size == 11)
  }

  test("candidate path is an equi-join: no cartesian/BNL nodes") {
    import spark.implicits._
    val df = EditDistance.passJoin(corpus(20).toDF("id", "text"), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in candidate path")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNL in candidate path")
  }
}
