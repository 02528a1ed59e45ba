package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession settings for the engine's mains, specs, and any
  * embedding application.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` lives HERE, declared at session
  * build time, because legacy (r1–r5) events fixtures carried ns-precision
  * timestamps: round 1 set it inside [[Tables.apply]] as a read side
  * effect, which a concurrent reader of ns-parquet on the shared session
  * would silently inherit. Current contract: the flag is set at build
  * time, [[Tables.normalizeEvents]] normalizes whichever recognized `ts`
  * layout it reads (ns-int64 / TIMESTAMP_NTZ / TIMESTAMP) and THROWS on
  * anything else; the NTZ branch additionally requires the UTC session
  * timezone pinned below, because the NTZ→TIMESTAMP cast is only
  * value-preserving under UTC.
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
