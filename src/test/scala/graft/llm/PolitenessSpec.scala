package graft.llm

import graft.SparkSpec

class PolitenessSpec extends SparkSpec {
  import spark.implicits._

  test("per-host slots spaced by delay; absent host falls back to default") {
    val frontier = Seq(
      ("a.com", "https://a.com/1"),
      ("a.com", "https://a.com/2"),
      ("a.com", "https://a.com/3"),
      ("b.com", "https://b.com/x"),
      ("b.com", "https://b.com/y"),
      ("c.com", "https://c.com/only")).toDF("host", "url")
    val delays = Seq(("a.com", 5), ("b.com", 2)).toDF("host", "delay_sec")
    val out = Politeness.schedule(frontier, delays, start = 1000L)
      .collect().map(r => (r.getAs[String]("url"), r.getAs[Long]("fetch_at")))
      .toMap
    // a.com: slots 0,1,2 spaced 5s — url order is binary string order
    assert(out("https://a.com/1") == 1000L)
    assert(out("https://a.com/2") == 1005L)
    assert(out("https://a.com/3") == 1010L)
    // b.com independent, spaced 2s
    assert(out("https://b.com/x") == 1000L)
    assert(out("https://b.com/y") == 1002L)
    // c.com not in the delay table: defaultDelay=1 (slot 0 anyway)
    assert(out("https://c.com/only") == 1000L)
  }

  test("schema: frontier columns preserved, delay_sec dropped") {
    val frontier = Seq((1L, "a.com", "https://a.com/1")).toDF("doc_id", "host", "url")
    val delays = Seq(("a.com", 3)).toDF("host", "delay_sec")
    val out = Politeness.schedule(frontier, delays, start = 0L)
    assert(out.columns.toSeq == Seq("host", "doc_id", "url", "fetch_at"))
    assert(out.collect().head.getAs[Long]("fetch_at") == 0L)
  }
}
