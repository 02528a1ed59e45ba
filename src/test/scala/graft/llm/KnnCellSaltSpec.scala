package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** r19: the same-cell pair join's salt is AUTO-SIZED from the centroid
  * count (the r18 verdict's "unconditional default" gap — S =
  * partitions/4 replicated the dst side S× even when distinct cells ≫
  * parallelism, where salting is pure overhead). Pins the sizing rule
  * and the plan shapes on both sides of it. */
class KnnCellSaltSpec extends SparkSpec {

  test("cellSaltFor: capped for few cells, 1 for many, override wins") {
    // pinned bench fixture (12 cells, 32 partitions): the exact r18
    // default — plan unchanged where the records were minted
    assert(KnnGraph.cellSaltFor(None, 32, 12) == 8)
    // unknown cell count: conservative cap (the r18 behavior)
    assert(KnnGraph.cellSaltFor(None, 32, 0) == 8)
    // target ~16 distinct (cell, salt) keys per partition, capped
    assert(KnnGraph.cellSaltFor(None, 32, 64) == 8)
    assert(KnnGraph.cellSaltFor(None, 32, 128) == 4)
    assert(KnnGraph.cellSaltFor(None, 32, 256) == 2)
    // cells ≥ 16× partitions: salting is pure dst replication — off
    assert(KnnGraph.cellSaltFor(None, 32, 512) == 1)
    assert(KnnGraph.cellSaltFor(None, 32, 100000) == 1)
    // explicit conf wins either way
    assert(KnnGraph.cellSaltFor(Some(3), 32, 12) == 3)
    assert(KnnGraph.cellSaltFor(Some(1), 32, 12) == 1)
    // degenerate parallelism never yields S < 1
    assert(KnnGraph.cellSaltFor(None, 1, 1) == 1)
  }

  test("many cells: the pair join plans replication-free (no salt at all)") {
    val emb = Tables(spark, sf0001, "embeddings")
    def planOf(nCells: Int): String = {
      val cs = emb.filter(col("vec_id") < nCells).orderBy("vec_id")
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      KnnGraph.build(emb, cs, degree = 4, nProbe = 2)
        .queryExecution.optimizedPlan.toString
    }
    // test session: 4 shuffle partitions → auto-S is 1 here for ANY cell
    // count (cap = p/4 = 1), so the default plan must carry NO salt
    // column and NO dst-side replication join…
    val many = planOf(64)
    assert(!many.contains("salt"), s"many-cells plan still salted:\n$many")
    // …while a forced S>1 (the conf override, standing in for the
    // few-cells/many-cores production shape) still salts
    spark.conf.set("spark.graft.knn.cellSalt", "2")
    try {
      val few = planOf(12)
      assert(few.contains("salt"), s"forced-salt plan lost its salt:\n$few")
    } finally spark.conf.unset("spark.graft.knn.cellSalt")
  }
}
