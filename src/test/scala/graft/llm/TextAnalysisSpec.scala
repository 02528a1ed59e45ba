package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/shingles handle short and degenerate inputs") {
    val df = Seq("one two three four", "one two", "solo").toDF("text")
      .select(
        TextAnalysis.tokenCount(col("text")).as("n"),
        size(TextAnalysis.shingles(col("text"))).as("nsh"))
    assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((4L, 2), (2L, 0), (1L, 0)))
  }

  test("bpe pre-tokenizer counts letter/digit/punct runs with leading spaces") {
    // "hello world 123!?" -> "hello", " world", " 123", "!?"
    val df = Seq("hello world 123!?", "a1b2", "").toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(4L, 4L, 0L))
  }

  test("langId picks the dominant profile, unk on ties") {
    val df = Seq(
      "the cat and the hat",      // en
      "el gato y los perros de",  // es
      "le chat et la souris",     // fr
      "xyzzy plugh",              // no markers
      "the el"                    // tie -> unk
    ).toDF("text").select(TextAnalysis.langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("en", "es", "fr", "unk", "unk"))
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val df = Seq("Hello  World", "hello world", "HELLO\tWORLD ").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(df.collect().map(_.getString(0)).distinct.length == 1)
  }

  test("stopword ratio bounded in [0,1]") {
    val df = Seq("the the the", "no markers here").toDF("text")
      .select(TextAnalysis.stopwordRatio(col("text"), Seq("the")).as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0))
  }
}
