package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SourcesSpec extends SparkSpec {

  private lazy val orders = Tables(spark, sf0001, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  test("csv roundtrip with declared schema preserves values") {
    val dir = Files.createTempDirectory("graft-csv-").toString
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Sources.readCsv(spark, dir, orders.schema)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
  }

  test("json-lines roundtrip with declared schema preserves values") {
    val dir = Files.createTempDirectory("graft-json-").toString
    orders.write.mode("overwrite").json(dir)
    val back = Sources.readJsonLines(spark, dir, orders.schema)
    assert(back.exceptAll(orders).count() == 0)
  }

  test("embedded csv/json column parse against a declared schema") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType)))
    val csv = Seq("7,alpha").toDF("raw")
      .select(Sources.parseCsv(col("raw"), schema).as("p")).select("p.id", "p.tag")
    assert(csv.head() == org.apache.spark.sql.Row(7L, "alpha"))
    val json = Seq("""{"id": 9, "tag": "beta"}""").toDF("raw")
      .select(Sources.parseJson(col("raw"), schema).as("p")).select("p.id", "p.tag")
    assert(json.head() == org.apache.spark.sql.Row(9L, "beta"))
  }

  test("partitioned write enables partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft-part-").toString
    Sources.writePartitioned(orders, dir, Seq("o_orderstatus"))
    val all = spark.read.parquet(dir)
    val one = all.filter(col("o_orderstatus") === "F")
    // pruning: the partition predicate must land in PartitionFilters (list
    // only the o_orderstatus=F directory), not in the data filters
    val planText = one.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters") && planText.contains("o_orderstatus"),
      s"partition filter missing from scan:\n$planText")
    // and values survive the partition-column roundtrip
    assert(one.count() == orders.filter(col("o_orderstatus") === "F").count())
    assert(all.count() == orders.count())
  }

  test("schema evolution: mergeSchema unions column sets across file batches") {
    import spark.implicits._
    // batch 1 written before a column existed; batch 2 adds `score` —
    // the additive-evolution shape every long-lived ingest dataset hits
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", true).parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.select("id", "score").orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    // old-batch rows surface the new column as NULL, new-batch rows carry it
    assert(rows.toSeq == Seq(
      (1L, None), (2L, None), (3L, Some(0.5)), (4L, Some(0.9))))
  }
}
