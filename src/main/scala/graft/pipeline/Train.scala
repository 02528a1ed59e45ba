package graft.pipeline

import org.apache.spark.ml.{PipelineModel, PipelineStage}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Network

/** Estimator-protocol lifecycle (A18–A23) on MLlib.
  *
  * The reference's `model_fn(features, labels, mode)` mode-switch
  * (network.py:135-163) maps onto MLlib's split protocol:
  * TRAIN → `Pipeline.fit`, INFER → `Model.transform` (no loss),
  * EVAL → `Evaluator.evaluate` (no train op). The dense→MSE example network
  * (minimal_network.py:38-48) becomes a linear regression on the assembled
  * concept vectors; checkpoint save/restore (A23) is `MLWritable` save/load.
  */
object Train {

  /** Default estimator standing in for the example's dense regressor.
    * For shape-exact parity with the reference's dense(100, relu) → dense(1)
    * network (minimal_network.py:38-43), pass
    * `new MlpRegressor().setHidden(100)` as [[fit]]'s `estimator` instead. */
  def defaultEstimator(maxIter: Int = 20): LinearRegression =
    new LinearRegression()
      .setFeaturesCol("features").setLabelCol("label").setMaxIter(maxIter)

  /** Per-concept vectors + `label` column from the target concept's first
    * feature (the label-column variant, network_old.py:164-167). */
  def prepare(net: Network, encoded: DataFrame): DataFrame = {
    val vecs = net.inferenceVectors(encoded)
    net.targetNames.headOption match {
      case Some(tn) => vecs.withColumn("label", col(tn).cast("double"))
      case None     => vecs
    }
  }

  /** TRAIN: fit the per-concept → assembler → estimator pipeline. */
  def fit(net: Network, encoded: DataFrame,
      estimator: PipelineStage = defaultEstimator()): PipelineModel =
    net.pipeline(estimator).fit(prepare(net, encoded))

  /** INFER: transform without loss. */
  def infer(model: PipelineModel, net: Network, encoded: DataFrame): DataFrame =
    model.transform(prepare(net, encoded))

  /** EVAL: MSE, the reference's loss (minimal_network.py:45-48 → A20). */
  def evaluateMse(model: PipelineModel, net: Network, encoded: DataFrame): Double =
    new RegressionEvaluator()
      .setMetricName("mse").setLabelCol("label").setPredictionCol("prediction")
      .evaluate(infer(model, net, encoded))

  /** A23: checkpoint persistence. */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)
  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** A23 save side for PER-CONCEPT checkpoints (concept.py:13-15): persist a
    * fitted inference chain as the PipelineModel artifact that
    * [[graft.core.Concept.restoreInference]] loads. Fitting a Pipeline of
    * already-fitted transformers is a no-op wrap — `df` only anchors the
    * schema. The stages must append the concept's `<name>_vec` column. */
  def saveConceptCheckpoint(
      df: DataFrame, path: String,
      stages: org.apache.spark.ml.PipelineStage*): Unit =
    new org.apache.spark.ml.Pipeline().setStages(stages.toArray)
      .fit(df).write.overwrite().save(path)
}
