package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over a crawled corpus — the page-quality side of
  * crawl curation: harvested `<a href>` edges ([[Html.links]]) feed
  * centrality signals (PageRank here) that corpus filters weight
  * documents by, the same role the reference corpus-curation literature
  * assigns link-based quality scores next to text-level ones.
  *
  * Scale design: the edge list is the 100 TB-class input. Per-edge
  * weights (1/outdeg) are computed ONCE with a single groupBy+join and
  * cached; each iteration is then one shuffle (contribs groupBy dst) +
  * one broadcast-free left join back to the vertex set, and every
  * iterate is eagerly `localCheckpoint`ed so the plan stays
  * constant-depth across rounds (the [[Components.connected]] pattern —
  * without it the lineage doubles per iteration and the optimizer
  * re-derives the whole prefix each round).
  */
object LinkGraph {

  /** Damped PageRank with constant restart, UNNORMALIZED form:
    *
    *   r₀(v) = 1;  rₜ₊₁(v) = (1−d) + d·Σ_{(u,v)∈E} rₜ(u)/outdeg(u)
    *
    * (the classic formulation without the 1/N scaling — identical
    * ranking, and with d a NEGATIVE POWER OF TWO and power-of-two
    * out-degrees every value is an exactly-representable dyadic
    * rational, so results are bit-identical regardless of partition
    * count or summation order — what lets q155 hash-check an ITERATIVE
    * distributed computation against a SQL oracle with no rounding).
    * Vertices with no out-links contribute nothing (dangling mass is
    * dropped, not redistributed); vertices with no in-links settle at
    * 1−d.
    *
    * @param nodes single-column `v` vertex set
    * @param edges `src`/`dst` directed edge list (multi-edges count
    *              per-occurrence, as a SQL UNION ALL oracle does)
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      damping: Double): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val weighted = edges.join(outdeg, "src")
      .select(col("src"), col("dst"),
        (lit(1.0) / col("outdeg").cast("double")).as("wt"))
      .cache()
    var ranks = nodes.select(col("v"), lit(1.0).as("r")).localCheckpoint(true)
    try {
      var t = 0
      while (t < iters) {
        val contribs = weighted.join(ranks, weighted("src") === ranks("v"))
          .groupBy(col("dst")).agg(sum(col("r") * col("wt")).as("c"))
        val prev = ranks
        ranks = nodes.join(contribs, nodes("v") === contribs("dst"), "left")
          .select(col("v"),
            (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
          .localCheckpoint(true) // constant-depth plan per round
        // the new iterate is MATERIALIZED (eager checkpoint), so the
        // superseded one's blocks can be dropped deterministically —
        // leaving reclaim to the ContextCleaner keeps O(iters) iterates
        // in storage on a long run (100-iteration cluster jobs)
        unpersistCheckpoint(prev)
        t += 1
      }
      ranks.select(col("v"), col("r").as("pr"))
    } finally weighted.unpersist()
  }

  /** Drop the persisted blocks behind an eagerly-checkpointed iterate.
    * A `localCheckpoint(true)` DataFrame's plan is a `LogicalRDD` over
    * the persisted internal RDD — `Dataset.unpersist` does NOT reach it
    * (checkpoint storage bypasses the CacheManager), so the RDD handle
    * is taken from the plan. Blocking=false: reclaim may overlap the
    * next iteration's compute. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false): Unit
      case _ => () // not a checkpointed plan: nothing persisted to drop
    }
}
