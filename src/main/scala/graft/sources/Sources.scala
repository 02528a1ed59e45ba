package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{from_csv, from_json}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond Parquet (B2/B3).
  *
  * Schemas are always *declared*, never inferred — inference is a full extra
  * pass over the data (a non-starter at 100 TB) and nondeterministic under
  * sampling. This mirrors the reference's stance: `featdef` declares the
  * schema, parse validates against it (SURVEY A6).
  */
object Sources {

  def readCsv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString).option("sep", sep)
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Embedded-CSV column parse (A6's `parse_example` analogue). */
  def parseCsv(c: Column, schema: StructType, sep: String = ","): Column =
    from_csv(c, schema, Map("sep" -> sep))

  /** Embedded-JSON column parse. */
  def parseJson(c: Column, schema: StructType): Column =
    from_json(c, schema)

  /** Corrupt-tolerant JSON-lines read: malformed rows land in
    * `_corrupt_record` instead of failing the job — at ingest scale some
    * fraction of a 100 TB drop is always malformed, and a pipeline that
    * dies on row 40-billion is not a pipeline. Callers split on
    * `_corrupt_record IS NULL` into clean/quarantine sinks. */
  def readJsonPermissive(
      spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // Spark requires caching/materializing before filtering on the
      // corrupt-record column alone; select it alongside data columns
  }

  /** Hive-style partitioned write — the layout that makes partition pruning
    * work: a reader filtering on a partition column must only open that
    * partition's files (asserted in SourcesSpec). */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      format: String = "parquet"): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .format(format)
      .option("header", "true") // no-op for parquet, needed for csv
      .save(path)
}
