package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication via embedding clusters (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"): partition the embedding space with k-means, then prune
  * near-duplicate pairs ONLY within each cluster. The pair space collapses
  * from N² to Σ|cellᵢ|² — the clustering is the blocking key, exactly the
  * role LSH bands play for [[Rp]]; the trade is recall at cluster
  * boundaries (a dup pair split across cells is never compared), which the
  * paper accepts by construction and [[SemDedupSpec]] measures against the
  * brute oracle.
  *
  * Keep rule: within a cluster, a vector is dropped when a near-duplicate
  * with a SMALLER vec_id exists (the exact-dedup keep-first convention —
  * deterministic, idempotent: survivors re-deduped are a fixed point).
  *
  * Scale shape: assignment is [[Ivf.fitColumnar]]'s codegen argmin (k
  * seeded deterministic Lloyd steps, stabilized centroids); the
  * within-cell pairing is an equi-join on `cell` with `id_a < id_b` and a
  * codegen cosine rerank — one shuffle on the cell key. Cell population is
  * the lever: k ∝ N keeps E[|cell|] constant so Σ|cellᵢ|² grows linearly,
  * and a hot cell (embedding-space skew) is the AQE skew-join case, same
  * as the salted LSH joins. Nothing here is all-pairs at corpus scope.
  */
object SemDedup {

  /** Near-duplicate pairs within shared cells: (id_a < id_b, cos ≥
    * minCosine). The candidate-generation half — callers wanting the
    * pruned corpus use [[survivors]].
    *
    * `centroids`: when supplied, the k-means fit is skipped and vectors
    * are assigned to the GIVEN cells (codegen argmin, identical tie rule
    * to the fit path) — the production move when an IVF index already
    * exists (dedup reuses its clustering instead of fitting a second
    * one), and the hook that makes the assignment+prune machinery
    * deterministic for the q104a oracle. */
  def pairs(embeddings: DataFrame, k: Int = 16, minCosine: Double = 0.95,
      iters: Int = 3, seed: Long = 42L,
      centroids: Option[Array[Array[Float]]] = None): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val idx = centroids match {
      case Some(cs) =>
        embeddings.withColumn("cell",
          call_function(graft.functions.GraftFunctions.NearestCentroidName,
            col("embedding"), typedlit(cs)))
          .select("vec_id", "embedding", "cell")
      case None =>
        Ivf.fitColumnar(embeddings, k = k, iters = iters, seed = seed).indexed
    }
    val a = idx.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = idx.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosineFast(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= minCosine)
      .select("id_a", "id_b", "cos")
  }

  /** The semantically-deduplicated corpus: every vector without a
    * near-duplicate of smaller id in its cluster. Survivor set is
    * deterministic given (k, iters, seed) and idempotent. */
  def survivors(embeddings: DataFrame, k: Int = 16, minCosine: Double = 0.95,
      iters: Int = 3, seed: Long = 42L,
      centroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val drop = pairs(embeddings, k, minCosine, iters, seed, centroids)
      .select(col("id_b").as("vec_id")).distinct()
    embeddings.join(drop, Seq("vec_id"), "left_anti")
  }
}
