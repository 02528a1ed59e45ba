package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.core.MinimalNetwork

/** CLI driver for the experiment lifecycle (A26: runner.py as `__main__`).
  *
  * Usage: ExperimentMain <rawInputPath> <workDir> [--notest] [--notrain]
  * (the reference's --notest/--notf stage skips, runner.py:17,41,92).
  */
object ExperimentMain {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.length == 2,
      "usage: ExperimentMain <rawInputPath> <workDir> [--notest] [--notrain]")
    val Array(input, workDir) = positional

    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val res = Experiment.run(spark, MinimalNetwork(), input, workDir,
      selfTest = !args.contains("--notest"),
      train = !args.contains("--notrain"))
    println(s"""{"runId":"${res.runId}","encodedPath":"${res.encodedPath}","mse":${res.mse}}""")
    spark.stop()
  }
}
