package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, StructField, StructType}

/** Spark rendering of the reference's example concepts.
  *
  * `CandidateConcept` ≙ `MinimalConcept` (examples/trainer/concepts/
  * minimal_concept.py): raw CSV `"123,m"` → `candidate_id: float` +
  * `gender: float` via a lookup map with an NA default. The dict lookup
  * (`GENDER_MAP`, minimal_concept.py:17-28) becomes a `when`-chain — a pure
  * Column expression, broadcast-free and codegen'd (operator A10).
  */
final case class CandidateConcept(
    override val target: Boolean = false,
    override val checkpointPath: Option[String] = None)
  extends Concept {

  val version = "1"

  val featdef: StructType = StructType(Seq(
    StructField("candidate_id", FloatType, nullable = false),
    StructField("gender", FloatType, nullable = false)))

  /** minimal_concept.py:33-43: split on ',', cast id, map gender
    * {m/M/male/Male→0, f/F/female/Female→1, else NA (-1, SURVEY §3.4)}. */
  def preprocess(raw: Column): Seq[(String, Column)] = {
    val parts = split(raw, ",")
    val sex = lower(trim(element_at(parts, 2)))
    Seq(
      "candidate_id" -> trim(element_at(parts, 1)).cast(FloatType),
      "gender" -> when(sex.isin("m", "male"), 0f)
        .when(sex.isin("f", "female"), 1f)
        .otherwise(lit(Concept.NaInteger).cast(FloatType)))
  }

  /** minimal_concept.py:30-31. */
  val testInput: String = "123,m"
}

object MinimalNetwork {
  /** minimal_network.py:15-18: same concept as origin + target. */
  def apply(): Network = new Network(Seq(
    "origin" -> CandidateConcept(),
    "target" -> CandidateConcept(target = true)))
}
