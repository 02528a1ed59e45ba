package graft.pipeline

import java.nio.file.Files

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** A19 shape parity: the reference example network is dense(100, relu) →
  * dense(1) with MSE loss (minimal_network.py:38-48). [[MlpRegressor]] is
  * that network as an MLlib Estimator; these tests pin (1) it actually
  * learns a non-linear surface a GLM cannot, (2) seeded determinism,
  * (3) checkpoint save/load, standalone and inside the A23 PipelineModel
  * lifecycle. */
class MlpRegressorSpec extends SparkSpec {
  import spark.implicits._

  /** y = |x| — representable exactly by two relu units, hopeless for a
    * linear fit (best line on symmetric x is the constant mean). */
  private def absData: DataFrame =
    Seq.tabulate(256) { i =>
      val x = -1.0 + 2.0 * i / 255.0
      (Vectors.dense(x), math.abs(x))
    }.toDF("features", "label")

  private def mse(pred: DataFrame): Double = {
    import org.apache.spark.sql.functions._
    pred.select(avg(pow(col("prediction") - col("label"), 2))).head.getDouble(0)
  }

  test("learns |x| where a linear fit cannot") {
    val df = absData.cache()
    try {
      val mlp = new MlpRegressor().setHidden(32).setMaxIter(150).setStepSize(0.3)
        .fit(df)
      val lin = new LinearRegression().setMaxIter(20).fit(df)
      val mlpMse = mse(mlp.transform(df))
      val linMse = mse(lin.transform(df))
      assert(mlpMse < 0.3 * linMse,
        s"mlp $mlpMse should be well under linear $linMse")
    } finally df.unpersist()
  }

  test("scoring a null features row yields a null prediction, not a crash") {
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    import spark.implicits._
    val model = new MlpRegressor().setHidden(4).setMaxIter(10).fit(absData)
    val scored = model.transform(Seq(
        (1L, Vectors.dense(0.5), 0.5),
        (2L, null.asInstanceOf[Vector], 0.0)
      ).toDF("id", "features", "label"))
      .orderBy("id").select("prediction").collect()
    assert(!scored(0).isNullAt(0))
    assert(scored(1).isNullAt(0))
  }

  test("same seed is bit-deterministic; different seed diverges") {
    val df = absData.repartition(4).cache()
    try {
      def fitPreds(seed: Long): Array[Double] = {
        val m = new MlpRegressor().setHidden(8).setMaxIter(20).setSeed(seed).fit(df)
        m.transform(df).select("prediction").collect().map(_.getDouble(0))
      }
      val a = fitPreds(7L)
      val b = fitPreds(7L)
      val c = fitPreds(8L)
      assert(a.sameElements(b), "same-seed fits must be bit-identical")
      assert(!a.sameElements(c), "different seeds should give different nets")
    } finally df.unpersist()
  }

  test("model save/load roundtrip preserves predictions and columns") {
    val df = absData
    val m = new MlpRegressor().setHidden(8).setMaxIter(20)
      .setPredictionCol("yhat").fit(df)
    val dir = Files.createTempDirectory("graft-mlp-").toString
    m.write.overwrite().save(s"$dir/mlp")
    val back = MlpRegressorModel.load(s"$dir/mlp")
    assert(back.getOrDefault(back.predictionCol) == "yhat")
    val orig = m.transform(df).select("yhat").collect().map(_.getDouble(0))
    val rest = back.transform(df).select("yhat").collect().map(_.getDouble(0))
    assert(orig.sameElements(rest))
  }

  test("train lifecycle with the MLP stage: fit, eval, save, load, infer") {
    val net = graft.core.MinimalNetwork()
    val raw = Seq.tabulate(64)(i => s"$i,${if (i % 2 == 0) "m" else "f"}").toDF("value")
    val dir = Files.createTempDirectory("graft-mlp-train-").toString
    val out = Preprocess.run(net, raw, dir)
    val encoded = Preprocess.readEncoded(spark, net, out)

    val model = Train.fit(net, encoded,
      estimator = new MlpRegressor().setHidden(16).setMaxIter(30))
    val m = Train.evaluateMse(model, net, encoded)
    assert(!m.isNaN && m >= 0)
    Train.save(model, s"$dir/model")
    val back = Train.load(s"$dir/model")
    val predsA = Train.infer(model, net, encoded)
      .select("prediction").collect().map(_.getDouble(0))
    val predsB = Train.infer(back, net, encoded)
      .select("prediction").collect().map(_.getDouble(0))
    assert(predsA.length == 64 && predsA.sameElements(predsB),
      "PipelineModel reload must reproduce MLP predictions exactly")
  }
}
