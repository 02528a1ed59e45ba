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

  /** The executable form of the permissive-read contract: split a
    * [[readJsonPermissive]] frame into (clean, quarantine). Clean rows drop
    * the corrupt column; quarantined rows keep ONLY the raw record (that is
    * all PERMISSIVE mode guarantees for them — data columns are null or
    * partial) plus the source path for triage.
    *
    * Spark refuses queries that reference only the corrupt-record column
    * straight off a raw reader (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    * RECORD_COLUMN): the parse must be materialized first, so the source
    * path is captured per-row and the frame checkpointed eagerly (lineage
    * cut; blocks self-release — same lifecycle as the LSH operators). At
    * real ingest scale, materialize to a staging TABLE instead of block
    * storage and split from there; either way the posture is "count and
    * park the bad 0.01%", never "die on row 40-billion", never silently
    * drop. */
  def cleanAndQuarantine(permissive: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val parsed = permissive
      .withColumn("_source_file", input_file_name())
      .localCheckpoint(true)
    val clean = parsed
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record", "_source_file")
    val quarantine = parsed
      .filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"),
        col("_source_file").as("source_file"))
    (clean, quarantine)
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
