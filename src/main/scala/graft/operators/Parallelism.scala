package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}

/** Guard against compute-starved scans (bench r9 metrics finding): a small
  * parquet input arrives as ONE split — parquet is range-splittable, but a
  * few-MB file is a single split regardless — and every codegen-heavy
  * projection downstream (LSH signature matmuls, MinHash shingle folds,
  * per-pair dot products) inherits that parallelism. On a 32-core session
  * the whole operator then runs effectively serial: the planted near-dup
  * fixture measured 6 tasks / cpu ≈ wall for the O(n²) scorer, and the
  * bucketed path's signature cache filled on 1–2 tasks.
  *
  * [[spread]] repartitions such an input to the session's shuffle
  * parallelism — one narrow round-robin exchange of a by-definition-small
  * input. At cluster scale (inputs of thousands of splits) the partition
  * check makes it a no-op, so operators can apply it unconditionally.
  *
  * The check runs ONLY when the frame is a pure scan (leaf / project /
  * filter chain): deciding it needs `df.rdd`'s partition count, and under
  * AQE materializing the RDD of a plan that CONTAINS exchanges executes
  * those stages at plan-build time — work that the real job would then
  * repeat, since adaptive stage reuse does not span executions. Composed
  * inputs (join/agg outputs, checkpointed intermediates) keep their
  * existing partitioning, which is what a pipeline wants anyway.
  */
object Parallelism {

  @annotation.tailrec
  private def isNarrowScan(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case p: Project => isNarrowScan(p.child)
    case f: Filter => isNarrowScan(f.child)
    case _ => false
  }

  /** `df`, repartitioned to the session's shuffle parallelism when it is a
    * pure scan whose split count would starve downstream compute; `df`
    * unchanged otherwise. */
  def spread(df: DataFrame): DataFrame = {
    if (!isNarrowScan(df.queryExecution.analyzed)) df
    else {
      val target = df.sparkSession.sessionState.conf.numShufflePartitions
      // repartition only below HALF the target: at ≥ target/2 splits the
      // worst-case stage wall is already ≤ 2× ideal — under the exchange's
      // own cost for the small inputs this guards — while a tighter
      // (`< target`) check would pay the shuffle to fix mere remainder
      // imbalance (e.g. 20 splits on 32 cores)
      if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
    }
  }
}
