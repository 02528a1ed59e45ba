package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Directory-prefix rollup — "how many files / how many bytes under
  * every directory at every depth": the storage-analytics staple (du
  * over a manifest, partition-size audits, hot-prefix detection for
  * object-store sharding). One codegen'd HOF explode of each path's
  * ancestor chain + one hash aggregate — no per-depth self-union, no
  * UDF, and the fan-out equals path depth (bounded by the namespace
  * design, not the corpus).
  *
  * Prefixes exclude the leaf itself (a file is not a directory); a
  * path with no '/' contributes nothing. Weights fold as BIGINT.
  *
  * Scale shape: explode is row-local (depth ≈ 2–6 rows per file);
  * the single aggregate shuffles on prefix with map-side combine —
  * hot top-level prefixes combine away before the exchange. */
object PathRollup {

  /** (prefix, depth, n_files, total_bytes) per ancestor directory. */
  def prefixRollup(df: DataFrame, path: Column, weight: Column): DataFrame =
    df.select(path.as("__p"), weight.cast("long").as("__w"))
      // sequence(1, 0) is DESCENDING in Spark, not empty — a slash-less
      // path must drop before the HOF, not explode a phantom prefix
      .filter(instr(col("__p"), "/") >= 1)
      .select(explode(expr(
        "transform(sequence(1, size(split(__p, '/')) - 1), " +
          "i -> array_join(slice(split(__p, '/'), 1, i), '/'))")).as("prefix"),
        col("__w"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_files"), sum("__w").as("total_bytes"))
      .withColumn("depth",
        (size(split(col("prefix"), "/"))).cast("int"))
      .select(col("prefix"), col("depth"), col("n_files"), col("total_bytes"))
}
