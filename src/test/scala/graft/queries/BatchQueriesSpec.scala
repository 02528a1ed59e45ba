package graft.queries

import graft.SparkSpec

/** Shape/sanity checks per declared query on sf0.001. Exact-value correctness
  * is the DuckDB oracle gate (scripts/oracle_check.py / driver t2); these
  * specs catch regressions fast without the oracle in the loop.
  */
class BatchQueriesSpec extends SparkSpec {

  test("every declared query runs and yields its declared columns") {
    for (q <- graft.SparkEntry.allQueries) {
      val df = q.run(spark, sf0001)
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to run")
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
    }
  }

  test("q01 filters and computes net price") {
    val rows = BatchQueries.q01.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0))
  }

  test("q02 pricing summary has one row per (returnflag, linestatus)") {
    val rows = BatchQueries.q02.run(spark, sf0001).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    assert(rows.nonEmpty && rows.length <= 9)
  }

  test("q03 revenue ordered descending") {
    val rev = BatchQueries.q03.run(spark, sf0001).collect().map(_.getDouble(1))
    assert(rev.nonEmpty && rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("q07 rollup includes grand total matching orders count") {
    val rows = BatchQueries.q07.run(spark, sf0001).collect()
    val grand = rows.filter(r => r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(grand.length == 1)
    val total = graft.Tables(spark, sf0001, "orders").count()
    assert(grand.head.getLong(2) == total)
  }

  test("q09 emits at most 3 rows per priority, ranks 1..k") {
    val rows = BatchQueries.q09.run(spark, sf0001).collect()
    val byPri = rows.groupBy(_.getString(0))
    assert(byPri.values.forall(g => g.length <= 3 && g.map(_.getInt(1)).sorted.sameElements(1 to g.length)))
  }

  test("q17 norms: unit embeddings have sq_norm ~ 1") {
    val rows = BatchQueries.q17.run(spark, sf0001).collect()
    assert(rows.forall(r => math.abs(r.getDouble(2) - 1.0) < 0.01))
    assert(rows.forall(_.getLong(1) == 64))
  }
}
