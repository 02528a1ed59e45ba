package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.StructType

/** A Concept: the reference's unit of composition, re-expressed Spark-first.
  *
  * Mirrors `conceptnetwork/concept.py:11-58` — a Concept (a) encodes a raw
  * heterogeneous input into named typed features (`preprocess`,
  * concept.py:34-39), (b) declares their schema (`featdef`, concept.py:41-46),
  * (c) optionally transforms them (`feature_engineering`, concept.py:48-51),
  * and (d) embeds them into a vector (`inference`, concept.py:53-58).
  *
  * Differences by design (SURVEY §3.4 — reference defects are not spec):
  *  - `version` is an abstract member (the reference reads an undeclared
  *    subclass field, concept.py:20);
  *  - abstractness is a real Scala trait (the reference's `__metaclass__`
  *    assignment in `__init__` has no effect);
  *  - `preprocess` returns named pure-`Column` expressions, so encoding is
  *    declarative: Catalyst fuses it into the scan (whole-stage codegen)
  *    instead of running a per-row Python/UDF boundary — the property that
  *    makes the same encode graph run unchanged on a 1000-executor cluster.
  */
trait Concept {

  /** Experiment-identity version, part of the run fingerprint
    * (concept.py:19-25). */
  def version: String

  /** Declared feature schema — "the interface between encode and model"
    * (concept.py:41-46). Field names are unprefixed; the Network namespaces
    * them (network.py:89-100). */
  def featdef: StructType

  /** Encode one raw input column into named feature expressions
    * (concept.py:34-39; e.g. minimal_concept.py:33-43). Keys must match
    * `featdef` field names. */
  def preprocess(raw: Column): Seq[(String, Column)]

  /** Identity-default per-concept transform (concept.py:48-51). `inputCols`
    * are this concept's columns under their *network-prefixed* names in
    * `featdef` order (same convention as [[inference]]) — overrides address
    * their columns through it and must not touch other columns. */
  def featureEngineering(df: DataFrame, inputCols: Seq[String]): DataFrame = df

  /** Embed this concept's engineered columns into one vector column named
    * `outputCol` (concept.py:53-58). `inputCols` are the concept's columns in
    * `featdef` order under their *network-prefixed* names — the frame stays
    * whole (row alignment is structural; no split/rejoin shuffle). Default =
    * cast-to-double + stack (minimal_concept.py:51-55). */
  def inference(df: DataFrame, inputCols: Seq[String], outputCol: String): DataFrame =
    df.withColumn(outputCol,
      org.apache.spark.ml.functions.array_to_vector(
        org.apache.spark.sql.functions.array(
          inputCols.map(c => org.apache.spark.sql.functions.col(c).cast("double")): _*)))

  /** Embedded per-class test input for the self-test roundtrip protocol
    * (`_get_test_input`, concept.py:27-32). */
  def testInput: String

  /** Target concepts supply labels, not features (concept.py:11-17). */
  def target: Boolean = false

  /** Restore-from-checkpoint path — mutually exclusive with `target`
    * (concept.py:13-15); enforced at Network construction. */
  def checkpointPath: Option[String] = None

  /** A23 restore side: load this concept's fitted inference transformer
    * from `checkpointPath`. [[Network.inferenceVectors]] calls this INSTEAD
    * of [[inference]] when the path is set (the reference's
    * warm-start-from-checkpoint semantics: weights load, the graph ahead of
    * them — [[featureEngineering]] — still runs). The artifact contract: a
    * saved `PipelineModel` that appends this concept's `<name>_vec` column;
    * produce one with [[graft.pipeline.Train.saveConceptCheckpoint]]. */
  def restoreInference(path: String): org.apache.spark.ml.Transformer =
    org.apache.spark.ml.PipelineModel.load(path)

  /** Short repr used in run fingerprints (concept.py:22-25). */
  final def shortRepr: String = s"${getClass.getSimpleName.stripSuffix("$")}$version"

  /** NA policy for categorical lookups: the reference references an undefined
    * `Concept.NA_INTEGER` (minimal_concept.py:18); we define it (SURVEY §3.4). */
}

object Concept {
  /** Explicit NA default for failed categorical lookups. */
  val NaInteger: Long = -1L
}
