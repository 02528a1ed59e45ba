package graft.core

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** A Network composes named Concepts (conceptnetwork/network.py).
  *
  * Semantics reproduced from the reference:
  *  - schema union with name-prefixing: `features_def[cname + '_' + k] = v`
  *    (network.py:89-100); data rows built with the same rule
  *    (network.py:80-87);
  *  - prefix-filtered selection + strip (`_select_features`,
  *    network.py:37-43);
  *  - feature/target column partition by the concept `target` flag
  *    (network.py:18-35, 204-214);
  *  - per-concept feature-engineering hook wiring (network.py:45-59,116-122);
  *  - repr-as-version: network identity string concatenating concept
  *    short-reprs (network.py:61-65), used for run/output naming.
  *
  * Spark rendering: the prefix union is a single wide `select` over pure
  * Column expressions — column pruning then guarantees a downstream query
  * touching one concept reads only that concept's columns from Parquet
  * (SURVEY §4.2: A11/A12 are pure projection, free under Catalyst).
  */
final class Network(
    val concepts: Seq[(String, Concept)],
    val version: String = "1") {

  require(concepts.nonEmpty, "a Network needs at least one concept")
  require(concepts.map(_._1).distinct.size == concepts.size,
    "concept names must be unique")
  concepts.foreach { case (n, c) =>
    require(!(c.target && c.checkpointPath.nonEmpty),
      s"concept '$n': target and checkpointPath are mutually exclusive (concept.py:13-15)")
  }

  /** network repr — experiment identity (network.py:61-65). */
  def repr: String =
    s"Network$version${concepts.map { case (n, c) => s"_${n}-${c.shortRepr}" }.mkString}"

  /** Prefixed schema union (network.py:89-100). */
  def featdef: StructType =
    StructType(concepts.flatMap { case (cname, c) =>
      c.featdef.fields.map(f => StructField(s"${cname}_${f.name}", f.dataType, f.nullable))
    })

  /** Encode a raw input column into the full prefixed feature row
    * (network.py:80-87; minimal_network.py:28-36). */
  def preprocess(raw: DataFrame, rawCol: String = "value"): DataFrame = {
    val cols: Seq[Column] = concepts.flatMap { case (cname, c) =>
      c.preprocess(col(rawCol)).map { case (k, expr) => expr.as(s"${cname}_$k") }
    }
    raw.select(cols: _*)
  }

  /** Prefix-filtered selection with prefix stripped (network.py:37-43).
    * Matches against the concept's declared featdef names exactly — a bare
    * string-prefix filter would also catch another concept whose name
    * extends this one (e.g. "a" vs "a_b"). */
  def selectConcept(df: DataFrame, conceptKey: String): DataFrame = {
    val c = concepts.collectFirst { case (n, cc) if n == conceptKey => cc }
      .getOrElse(throw new IllegalArgumentException(s"unknown concept '$conceptKey'"))
    val cols = c.featdef.fieldNames.toSeq
    df.select(cols.map(f => col(s"${conceptKey}_$f").as(f)): _*)
  }

  /** Feature/target name partition (network.py:18-35). */
  def featureNames: Seq[String] =
    concepts.filterNot(_._2.target).flatMap { case (n, c) =>
      c.featdef.fieldNames.map(f => s"${n}_$f")
    }
  def targetNames: Seq[String] =
    concepts.filter(_._2.target).flatMap { case (n, c) =>
      c.featdef.fieldNames.map(f => s"${n}_$f")
    }

  /** Split an encoded frame into (features, targets) (network.py:204-214);
    * None when no target concept exists (network.py:210-214). */
  def split(df: DataFrame): (DataFrame, Option[DataFrame]) = {
    val f = df.select(featureNames.map(col).toIndexedSeq: _*)
    val t = targetNames match {
      case Seq() => None
      case names => Some(df.select(names.map(col).toIndexedSeq: _*))
    }
    (f, t)
  }

  /** Apply each concept's featureEngineering to its namespace and produce one
    * embedding column per concept via its `inference` (network.py:45-59,
    * 102-107): encoded frame → per-concept vectors, prefixed back. */
  def inferenceVectors(df: DataFrame, includeTargets: Boolean = false): DataFrame = {
    val active = concepts.filter { case (_, c) => includeTargets || !c.target }
    active.foldLeft(df) { case (acc, (cname, c)) =>
      val inputCols = c.featdef.fieldNames.map(f => s"${cname}_$f").toSeq
      val engineered = c.featureEngineering(acc, inputCols)
      c.checkpointPath match {
        // A23: a checkpointed concept restores its fitted transformer
        // instead of re-deriving (or re-fitting) its inference — the
        // feature-engineering stage ahead of the weights still runs, as a
        // TF checkpoint restore replays the graph with loaded variables
        case Some(p) =>
          val restored = c.restoreInference(p).transform(engineered)
          require(restored.columns.contains(s"${cname}_vec"),
            s"checkpoint at $p did not produce ${cname}_vec — the saved " +
              "pipeline must append the concept's vector column")
          restored
        case None =>
          c.inference(engineered, inputCols, s"${cname}_vec")
      }
    }
  }

  /** MLlib pipeline: per-concept inference vectors → one assembled `features`
    * vector (+ `label` from the target concept when present) → estimator.
    * This is the Estimator-protocol rendering (network.py:135-163 →
    * Pipeline.fit / Model.transform / Evaluator.evaluate). */
  def assembler(outputCol: String = "features"): VectorAssembler =
    new VectorAssembler()
      .setInputCols(concepts.filterNot(_._2.target).map { case (n, _) => s"${n}_vec" }.toArray)
      .setOutputCol(outputCol)

  def pipeline(estimator: org.apache.spark.ml.PipelineStage*): Pipeline =
    new Pipeline().setStages((Seq(assembler()) ++ estimator).toArray)
}
