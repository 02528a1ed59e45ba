package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IvfSpec extends SparkSpec {

  // nProbe is 3/4 of k here: the fixture embeddings are *uniform random*
  // unit vectors — the no-cluster-structure worst case for IVF. Real
  // embedding corpora cluster, buying the same recall at far lower probe
  // fractions; the contract being pinned is probe-correctness, not the
  // uniform-data recall curve.
  test("IVF search recalls >= 90% of exact top-5 with nProbe=9 of k=12") {
    val emb = Tables(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, k = 5)
      .select("q_id", "vec_id")
    val model = Ivf.fit(emb, k = 12, seed = 42L)
    val approx = Ivf.search(model, queries, topK = 5, nProbe = 9)
      .select("q_id", "vec_id")
    val n = exact.count()
    val found = exact.intersect(approx).count()
    assert(n == 50)
    assert(found.toDouble / n >= 0.9, s"IVF recall ${found.toDouble / n} ($found/$n)")
  }

  test("full probe (nProbe = k) equals exact brute force") {
    val emb = Tables(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(emb, queries, k = 3)
      .select("q_id", "rk", "vec_id", "sim").collect().toSet
    val model = Ivf.fit(emb, k = 8, seed = 42L)
    val full = Ivf.search(model, queries, topK = 3, nProbe = 8)
      .collect().toSet
    assert(full == exact)
  }

  test("columnar k-means IVF matches the MLlib-fit recall bar and is deterministic") {
    val emb = Tables(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, k = 5)
      .select("q_id", "vec_id")
    val model = Ivf.fitColumnar(emb, k = 12, seed = 42L)
    val approx = Ivf.search(model, queries, topK = 5, nProbe = 9)
      .select("q_id", "vec_id")
    val n = exact.count()
    val found = exact.intersect(approx).count()
    assert(found.toDouble / n >= 0.9,
      s"columnar IVF recall ${found.toDouble / n} ($found/$n)")
    // fixed seed -> identical index and identical search results
    val again = Ivf.search(Ivf.fitColumnar(emb, k = 12, seed = 42L),
      queries, topK = 5, nProbe = 9).select("q_id", "vec_id")
    assert(approx.exceptAll(again).count() == 0 && again.exceptAll(approx).count() == 0)
  }

  test("columnar full probe (nProbe = k) equals exact brute force") {
    val emb = Tables(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(emb, queries, k = 3)
      .select("q_id", "rk", "vec_id", "sim").collect().toSet
    val full = Ivf.search(Ivf.fitColumnar(emb, k = 8, seed = 42L),
      queries, topK = 3, nProbe = 8).collect().toSet
    assert(full == exact)
  }

  test("tfidf pipeline yields a vector per doc; stopwords carry no weight") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the spark catalyst optimizer rewrites plans"),
      (2L, "the the the the")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs)
    assert(out.columns.contains("tfidf") && out.count() == 2)
    val vecs = out.orderBy("doc_id").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector]("tfidf"))
    assert(vecs(0).numNonzeros > 0)
    assert(vecs(1).numNonzeros == 0) // all-stopword doc
  }
}
