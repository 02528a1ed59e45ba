package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession settings for the engine's mains, specs, and any
  * embedding application.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` lives HERE, declared at session
  * build time, because the events fixture carries ns-precision timestamps:
  * round 1 set it inside [[Tables.apply]] as a read side effect, which a
  * concurrent reader of ns-parquet on the shared session would silently
  * inherit. [[Tables]] now asserts the flag instead of mutating it.
  */
object GraftSession {

  val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  /** Builder with the engine's shared config; `cores` drives both the
    * local-mode parallelism and the shuffle-partition count (local[32] in
    * the driver harness — on a real cluster, set master/partitions from the
    * deployment instead and keep only the semantic flags). */
  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config(NanosFlag, "true")
      .config("spark.ui.enabled", "false")
}
