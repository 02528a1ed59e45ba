package graft.llm

import graft.SparkSpec

class CsvSniffSpec extends SparkSpec {

  test("quote-aware split: embedded delims, escaped quotes") {
    assert(CsvSniff.fields("a,b,c", ',') == Seq("a", "b", "c"))
    assert(CsvSniff.fields("\"x, y\",z", ',') == Seq("x, y", "z"))
    assert(CsvSniff.fields("\"he said \"\"hi\"\"\",2", ',') ==
      Seq("he said \"hi\"", "2"))
    assert(CsvSniff.fields("", ',') == Seq(""))
    assert(CsvSniff.fields("a,,c", ',') == Seq("a", "", "c"))
  }

  test("numeric detection for header voting") {
    assert(CsvSniff.isNumeric("42") && CsvSniff.isNumeric("-3.5") &&
      CsvSniff.isNumeric(" +7 ") && CsvSniff.isNumeric(".5"))
    assert(!CsvSniff.isNumeric("") && !CsvSniff.isNumeric("x") &&
      !CsvSniff.isNumeric("1.2.3") && !CsvSniff.isNumeric("-") &&
      !CsvSniff.isNumeric("3h"))
  }

  test("dialect: winner by uniformity then column count, then preference") {
    assert(CsvSniff.sniff("name,score\nalpha,1\nbeta,2") ==
      CsvSniff.Dialect(",", 2, header = true))
    assert(CsvSniff.sniff("a;1;x\nb;2;y") ==
      CsvSniff.Dialect(";", 3, header = false))
    // embedded commas inside quotes: tab wins with more columns
    assert(CsvSniff.sniff("x\t\"v, w\"\t2\ny\t\"p, q\"\t3") ==
      CsvSniff.Dialect("\t", 3, header = false))
    // ragged comma counts disqualify comma; pipe is uniform
    assert(CsvSniff.sniff("a|b,c\nd|e").delim == "|")
    // not a csv at all
    assert(CsvSniff.sniff("just plain prose here") ==
      CsvSniff.Dialect("", 1, header = false))
    assert(CsvSniff.sniff("") == CsvSniff.Dialect("", 1, header = false))
    assert(CsvSniff.sniff(null) == CsvSniff.Dialect("", 1, header = false))
    // all-text rows: header stays false (indistinguishable from data)
    assert(CsvSniff.sniff("a,b\nc,d").header == false)
    // single line with delimiters: dialect yes, header no (no data row)
    assert(CsvSniff.sniff("a,b,c") == CsvSniff.Dialect(",", 3, header = false))
  }

  test("sniffAll row shape") {
    import spark.implicits._
    val rows = CsvSniff.sniffAll(Seq(
      1L -> "h1,h2\n1,2", 2L -> "prose").toDS())
      .collect().sortBy(_.doc_id).toSeq
    assert(rows == Seq(
      CsvSniff.DialectRow(1L, ",", 2, header = true),
      CsvSniff.DialectRow(2L, "", 1, header = false)))
  }
}
