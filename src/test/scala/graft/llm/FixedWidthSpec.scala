package graft.llm

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class FixedWidthSpec extends SparkSpec {

  import spark.implicits._
  import FixedWidth.Field

  private val layout = Seq(Field("id", 1, 4), Field("name", 5, 6),
    Field("amt", 11, 5))

  test("fields slice at exact byte ranges, padding preserved") {
    val rows = FixedWidth.project(
      Seq("0042alice 00100", "0007bob   00250").toDF("line"),
      col("line"), layout).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq == Seq(("0042", "alice ", "00100"), ("0007", "bob   ", "00250")))
  }

  test("wrong-length records quarantine whole, never shift-corrupt") {
    val rows = FixedWidth.project(
      Seq("0042alice 00100", "0042alice 001", "0042alice 0010000").toDF("line"),
      col("line"), layout).collect()
    assert(rows.length == 1)
  }

  test("layouts with gaps or overlaps are rejected at build time") {
    intercept[IllegalArgumentException] {
      FixedWidth.recordLength(Seq(Field("a", 1, 4), Field("b", 6, 2)))
    }
    intercept[IllegalArgumentException] {
      FixedWidth.recordLength(Seq(Field("a", 1, 4), Field("b", 3, 2)))
    }
    intercept[IllegalArgumentException] {
      FixedWidth.recordLength(Seq(Field("a", 2, 4)))
    }
    assert(FixedWidth.recordLength(layout) == 15)
  }
}
