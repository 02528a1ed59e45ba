package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.core.Network

/** Experiment driver (A26: examples/trainer/runner.py:12-114) — one
  * SparkSession instead of subprocess/Dataflow/CloudML hops: the reference's
  * process boundaries become job boundaries inside one application
  * (SURVEY §3.1). Stages: self-test gate → runId stamp (repr-as-version; the
  * reference commits `str(network)` to git, runner.py:52-57) → preprocess →
  * train → eval. Each stage is skippable like the reference's
  * --notest/--notf flags.
  */
object Experiment {

  final case class Result(runId: String, encodedPath: String, mse: Double)

  def run(
      spark: SparkSession,
      net: Network,
      rawInputPath: String,
      workDir: String,
      selfTest: Boolean = true,
      train: Boolean = true): Result = {
    if (selfTest) SelfTest.runAll(spark, net)

    val runId = net.repr
    val raw = Preprocess.readText(spark, rawInputPath)
    val encodedPath = Preprocess.run(net, raw, s"$workDir/preprocess")

    val mse = if (train && net.targetNames.nonEmpty) {
      val encoded = Preprocess.readEncoded(spark, net, encodedPath)
      val model = Train.fit(net, encoded)
      Train.save(model, s"$workDir/models/$runId")
      Train.evaluateMse(model, net, encoded)
    } else Double.NaN

    Result(runId, encodedPath, mse)
  }
}
