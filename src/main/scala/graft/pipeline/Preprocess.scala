package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode}

import graft.core.Network

/** The reference's Beam preprocess pipeline re-expressed as one declarative
  * DataFrame job (examples/trainer/networks/preprocess.py:27-70):
  *
  *   ReadFromText → FlatMap(parse) → Map(network.preprocess) → sharded sink
  *
  * becomes scan → (optional flatMap parse) → prefix-union select → parquet
  * write. The whole chain is one pipelined stage under whole-stage codegen —
  * the same fusion the Dataflow runner applied to the linear ParDo chain
  * (SURVEY §3.2), but decided by Catalyst, and the sink is splittable
  * columnar Parquet instead of row-wise TFRecord (SURVEY §1.4).
  */
object Preprocess {

  /** Line-oriented source (A1: beam.io.ReadFromText). */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** A7: the FlatMap-parse stage (`beam.FlatMap(parse_example)`,
    * preprocess.py:47-55 — one raw element yields 0..n records).
    *
    * `splitter` maps the raw column to an ARRAY of records; `explode` then
    * reproduces FlatMap's generator contract exactly — an empty array emits
    * zero rows, an n-element array emits n. Declarative on purpose: the
    * split + explode fuse into the scan stage under whole-stage codegen, so
    * the 0..n fan-out never materializes an intermediate collection the way
    * a per-row parse function would. Non-raw columns (e.g. a source id) are
    * carried through unchanged, as Beam's FlatMap passes whole elements.
    */
  def flatMapParse(
      raw: DataFrame,
      splitter: Column => Column,
      rawCol: String = "value"): DataFrame = {
    val others = raw.columns.filterNot(_ == rawCol).map(col).toSeq
    raw.select(others :+ explode(splitter(col(rawCol))).as(rawCol): _*)
  }

  /** Run the encode job; returns the output path (keyed by network repr, as
    * the reference keys Dataflow output by `str(network)`, runner.py:78-80).
    *
    * `shards` maps the reference's `num_shards` (preprocess.py:63) to output
    * partition count — at scale leave it 0 (let the cluster's parallelism
    * decide) rather than forcing a repartition shuffle.
    */
  /** `parse` is the A7 hook — plug [[flatMapParse]] (or any 0..n record
    * stage) between the raw source and the encode, mirroring the reference's
    * ReadFromText → FlatMap(parse) → Map(preprocess) chain. Default
    * identity = the reference's stub parse (preprocess.py:47-49). */
  def run(
      net: Network,
      raw: DataFrame,
      outDir: String,
      rawCol: String = "value",
      shards: Int = 0,
      parse: DataFrame => DataFrame = identity): String = {
    val encoded = net.preprocess(parse(raw), rawCol)
    val out = s"$outDir/${net.repr}"
    val shaped = if (shards > 0) encoded.repartition(shards) else encoded
    shaped.write.mode("overwrite").parquet(out)
    out
  }

  /** Read encoded records back with the declared schema (A3/A6:
    * read_batch_features + parse against featdef, network.py:184-203). */
  def readEncoded(spark: SparkSession, net: Network, dir: String): DataFrame =
    spark.read.schema(net.featdef).parquet(dir)
}
