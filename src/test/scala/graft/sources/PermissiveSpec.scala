package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

class PermissiveSpec extends SparkSpec {

  test("permissive json read quarantines malformed rows instead of failing") {
    val dir = Files.createTempDirectory("graft-perm-").toString
    Files.write(Paths.get(s"$dir/data.json"),
      ("""{"id": 1, "tag": "ok"}""" + "\n" +
        """{"id": broken not json""" + "\n" +
        """{"id": 3, "tag": "fine"}""" + "\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType)))
    val df = Sources.readJsonPermissive(spark, dir, schema).cache()
    assert(df.count() == 3)
    val clean = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt_record").contains("broken"))
    assert(clean.select("id").collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 3L)))
  }

  test("cleanAndQuarantine splits the permissive frame by contract") {
    val dir = Files.createTempDirectory("graft-perm2-").toString
    Files.write(Paths.get(s"$dir/data.json"),
      ("""{"id": 1, "tag": "ok"}""" + "\n" +
        """not json at all""" + "\n" +
        """{"id": 3, "tag": "fine"}""" + "\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType)))
    val (clean, quarantine) =
      Sources.cleanAndQuarantine(Sources.readJsonPermissive(spark, dir, schema))
    // clean side: data columns only, corrupt column gone
    assert(clean.columns.toSeq == Seq("id", "tag"))
    assert(clean.count() == 2)
    // quarantine side: the raw record + its source file, nothing else
    assert(quarantine.columns.toSeq == Seq("raw", "source_file"))
    val q = quarantine.collect()
    assert(q.length == 1)
    assert(q.head.getString(0).contains("not json"))
    assert(q.head.getString(1).contains("data.json"))
  }
}
