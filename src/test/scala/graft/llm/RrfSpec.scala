package graft.llm

import graft.SparkSpec

/** q272's reciprocal-rank fusion — structural properties on the
  * registered query itself (the value check is the DuckDB oracle). */
class RrfSpec extends SparkSpec {

  test("fusion structure: quantized RRF orders and merges membership") {
    val rows = LlmQueries.q272.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        r.getLong(5)))
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    for ((q, rs) <- byQ) {
      val sorted = rs.sortBy(_._2)
      // ranks contiguous from 1, scores non-increasing in rank
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._6 >= b._6
        case _ => true
      }, s"q=$q: fused score not monotone in rank")
      // every fused row is a member of at least one source list
      assert(rs.forall(r => r._4.isDefined || r._5.isDefined))
      // the quantized score is exactly the sum of its reciprocals
      for (r <- rs) {
        val expect = r._4.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
          r._5.map(x => 1000000000L / (60 + x)).getOrElse(0L)
        assert(r._6 == expect)
      }
    }
    // the asymmetric-membership case is real on this fixture: BM25
    // ranks the query doc itself while cosine excludes it
    assert(rows.exists(r => r._4.isDefined && r._5.isEmpty))
    assert(rows.exists(r => r._4.isDefined && r._5.isDefined),
      "no doc appeared in both lists — fusion vacuous")
    // a doc present in BOTH lists at moderate ranks must outrank a doc
    // present in one list at rank 1: 10^9/61 < 10^9/70 + 10^9/70
    assert(1000000000L / 61 < 2 * (1000000000L / 70))
  }
}
