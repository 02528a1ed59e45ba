package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.streaming.StreamingKnnIndex

/** r19: the maintainer's entry-medoid table is merged incrementally —
  * min(stored medoid, touched rows' assignments) per cell — instead of a
  * full-corpus probeAssign+window per micro-batch; batches that delete a
  * stored medoid fall back to the full recompute. The law pinned here:
  * after ANY batch, the persisted (node, cell, d) table equals
  * entryMedoids over the surviving corpus, bit for bit. */
class KnnEntryMaintSpec extends SparkSpec {

  private def entriesOf(name: String): Set[(Long, Int, Double)] =
    spark.table(s"${name}_entries")
      .select(col("node"), col("cell").cast("int"), col("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

  private def fullOf(emb: org.apache.spark.sql.DataFrame,
      cs: Array[Array[Float]]): Set[(Long, Int, Double)] =
    KnnGraph.entryMedoids(emb, cs)
      .select(col("node"), col("cell").cast("int"), col("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

  test("entry merge ≡ full recompute across insert, delete, medoid-delete") {
    val emb = Tables(spark, sf0001, "embeddings").select("vec_id", "embedding")
    val cs = emb.filter(col("vec_id") < 12).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val name = "knn_entmaint_spec"
    val base = emb.filter(col("vec_id") >= 30)
    KnnGraph.saveIndex(KnnGraph.build(base, cs, degree = 12, nProbe = 3),
      base, cs, name, buckets = 8)
    try {
      assert(entriesOf(name) == fullOf(base, cs), "base save diverged")
      // 1. insert-only batch: the merge path (no medoid can be deleted)
      StreamingKnnIndex.ingestBatch(emb.filter(col("vec_id") < 30),
        name, cs, degree = 12, nProbe = 3, buckets = 8)
      assert(entriesOf(name) == fullOf(emb, cs), "insert merge diverged")
      val medoids = entriesOf(name).map(_._1)
      // 2. delete a batch of NON-medoids: stored minima stay valid, the
      // merge path must still match the full recompute over survivors
      val dl1 = emb.filter(col("vec_id") >= 40 &&
        pmod(col("vec_id"), lit(7L)) === 3 &&
        !col("vec_id").isin(medoids.toSeq.map(x => x: Any): _*))
      assert(dl1.count() > 0, "vacuous non-medoid delete")
      StreamingKnnIndex.applyChangelog(dl1.withColumn("op", lit("D")),
        name, cs, degree = 12, nProbe = 3, buckets = 8)
      val emb1 = emb.join(dl1.select("vec_id"), Seq("vec_id"), "left_anti")
        .localCheckpoint(true)
      assert(entriesOf(name) == fullOf(emb1, cs), "non-medoid delete diverged")
      // 3. delete a current MEDOID: the fallback full recompute must fire
      // and the table must still equal the recompute over survivors
      val m0 = entriesOf(name).map(_._1).min
      val dl2 = emb1.filter(col("vec_id") === m0)
      StreamingKnnIndex.applyChangelog(dl2.withColumn("op", lit("D")),
        name, cs, degree = 12, nProbe = 3, buckets = 8)
      val emb2 = emb1.filter(col("vec_id") =!= m0).localCheckpoint(true)
      val after = entriesOf(name)
      assert(after == fullOf(emb2, cs), "medoid delete diverged")
      assert(!after.map(_._1).contains(m0), "deleted medoid survived")
    } finally {
      for (t <- Seq(s"${name}_nodes", s"${name}_entries"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
