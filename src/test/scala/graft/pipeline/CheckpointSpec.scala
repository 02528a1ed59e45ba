package graft.pipeline

import java.nio.file.Files

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, StructField, StructType}

import graft.SparkSpec
import graft.core.{Concept, Network}

/** A23: per-concept checkpoint restore — a concept with `checkpointPath`
  * loads its fitted inference transformer instead of refitting, and yields
  * identical vectors (concept.py:13-15 warm-start semantics). */
object CheckpointSpec {
  /** Counts genuine fits so the restore path can assert it never refit. */
  var fitCount = 0
  var lastStages: Seq[Transformer] = Nil
}

final case class ScaledConcept(
    override val checkpointPath: Option[String] = None) extends Concept {
  val version = "1"
  val featdef: StructType =
    StructType(Seq(StructField("x", FloatType, nullable = false)))
  def preprocess(raw: Column): Seq[(String, Column)] =
    Seq("x" -> trim(element_at(split(raw, ","), 1)).cast(FloatType))
  val testInput = "7,m"

  /** A genuinely FITTED inference (standardization stats learned from the
    * data) — the case where checkpoint restore is worth something. */
  override def inference(
      df: DataFrame, inputCols: Seq[String], outputCol: String): DataFrame = {
    CheckpointSpec.fitCount += 1
    val assembler = new VectorAssembler()
      .setInputCols(inputCols.toArray).setOutputCol(s"${outputCol}_raw")
    val assembled = assembler.transform(df)
    val scaler = new StandardScaler()
      .setInputCol(s"${outputCol}_raw").setOutputCol(outputCol)
      .setWithMean(true).fit(assembled)
    CheckpointSpec.lastStages = Seq(assembler, scaler)
    scaler.transform(assembled)
  }
}

class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed concept restores identical vectors without refitting") {
    val raw = Seq("1,m", "2,f", "3,x", "10,m").toDF("value")
    val fresh = new Network(Seq("s" -> ScaledConcept()))
    val enc = fresh.preprocess(raw)

    CheckpointSpec.fitCount = 0
    val vecs1 = fresh.inferenceVectors(enc)
      .select(col("s_x"), col("s_vec"))
      .collect().map(r => r.getFloat(0) -> r.get(1).toString).toMap
    assert(CheckpointSpec.fitCount == 1)

    // persist the fitted chain as the concept's checkpoint artifact
    val path = Files.createTempDirectory("graft-ckpt-").toString + "/s"
    Train.saveConceptCheckpoint(enc, path, CheckpointSpec.lastStages: _*)

    // rebuild the network pointing at the checkpoint: no refit, same vectors
    val restoredNet = new Network(Seq("s" -> ScaledConcept(Some(path))))
    CheckpointSpec.fitCount = 0
    val vecs2 = restoredNet.inferenceVectors(enc)
      .select(col("s_x"), col("s_vec"))
      .collect().map(r => r.getFloat(0) -> r.get(1).toString).toMap
    assert(CheckpointSpec.fitCount == 0, "restore path must not refit")
    assert(vecs1 == vecs2, "restored vectors diverge from the trained run")
  }

  test("a checkpoint that fails to produce the vec column is rejected") {
    val raw = Seq("1,m").toDF("value")
    val net0 = new Network(Seq("s" -> ScaledConcept()))
    val enc = net0.preprocess(raw)
    // a pipeline that appends the WRONG column name
    val path = Files.createTempDirectory("graft-ckpt-bad-").toString + "/s"
    Train.saveConceptCheckpoint(enc, path,
      new VectorAssembler().setInputCols(Array("s_x")).setOutputCol("wrong"))
    val bad = new Network(Seq("s" -> ScaledConcept(Some(path))))
    val e = intercept[IllegalArgumentException](bad.inferenceVectors(enc))
    assert(e.getMessage.contains("s_vec"))
  }
}
