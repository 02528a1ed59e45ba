package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans with zero shuffle exchanges and equals the plain join") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val os = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "b_lineitem", "k", buckets = 8)
    Bucketing.writeBucketed(os, "b_orders", "k", buckets = 8)
    // force the non-broadcast path so the assertion is about bucketing, not
    // about the small fixture fitting under the broadcast threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", "k")
      joined.count() // let AQE finalize
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle; plan:\n$plan")
      val plain = li.join(os, "k")
      assert(joined.count() == plain.count())
      assert(plain.exceptAll(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("orc sink/source roundtrip preserves schema and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-").toString
    val slice = Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    slice.write.mode("overwrite").orc(dir)
    // UNFORCED read: the schema must come back from ORC's own file
    // metadata (a declared-schema read would make the assertion
    // tautological); compare names+types — file-format read-back relaxes
    // nullability, same as the parquet self-test roundtrip
    val back = spark.read.orc(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      slice.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == slice.count())
    assert(slice.exceptAll(back).count() == 0 && back.exceptAll(slice).count() == 0)
  }
}
