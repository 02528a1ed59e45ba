package graft.llm

import graft.SparkSpec

class FeedSpec extends SparkSpec {

  test("rfc1123: zones, weekday optional, malformed -> -1") {
    // 2020-01-02 15:04:05 UTC = 1577977445
    assert(Feed.parseRfc1123("Thu, 02 Jan 2020 15:04:05 GMT") == 1577977445L)
    assert(Feed.parseRfc1123("02 Jan 2020 15:04:05 UTC") == 1577977445L)
    assert(Feed.parseRfc1123("Thu, 02 Jan 2020 15:04:05 +0200") ==
      1577977445L - 7200)
    assert(Feed.parseRfc1123("Thu, 02 Jan 2020 15:04:05 -0530") ==
      1577977445L + 5 * 3600 + 30 * 60)
    assert(Feed.parseRfc1123("Thu, 02 Jan 2020 15:04:05 EST") == -1L) // named zone
    assert(Feed.parseRfc1123("Thu, 02 Foo 2020 15:04:05 GMT") == -1L)
    assert(Feed.parseRfc1123("Thu, 02 Jan 20 15:04:05 GMT") == -1L) // 2-digit year
    assert(Feed.parseRfc1123("") == -1L && Feed.parseRfc1123(null) == -1L)
    // epoch day zero and leap day
    assert(Feed.parseRfc1123("Thu, 01 Jan 1970 00:00:00 GMT") == 0L)
    assert(Feed.parseRfc1123("Sat, 29 Feb 2020 00:00:00 GMT") == 1582934400L)
  }

  test("iso8601: Z, offsets, fractional seconds; zone-less -> -1") {
    assert(Feed.parseIso8601("2020-01-02T15:04:05Z") == 1577977445L)
    assert(Feed.parseIso8601("2020-01-02T15:04:05.123Z") == 1577977445L)
    assert(Feed.parseIso8601("2020-01-02T15:04:05+02:00") == 1577977445L - 7200)
    assert(Feed.parseIso8601("2020-01-02T15:04:05-0530") ==
      1577977445L + 5 * 3600 + 30 * 60)
    assert(Feed.parseIso8601("2020-01-02T15:04:05") == -1L) // Atom requires zone
    assert(Feed.parseIso8601("2020-13-02T15:04:05Z") == -1L)
    assert(Feed.parseIso8601("garbage") == -1L && Feed.parseIso8601(null) == -1L)
  }

  test("rss: element-text links, CDATA/entity titles, linkless drop, decoys") {
    val (fmt, es) = Feed.parse(
      """<?xml version="1.0"?>
        |<rss version="2.0"><channel>
        |<title>Channel title must not leak</title>
        |<link>https://ex.com/channel-link-must-not-leak</link>
        |<item>
        |  <title><![CDATA[Raw & title]]></title>
        |  <link>https://ex.com/a</link>
        |  <description>decoy &lt;title&gt; and <title>nested decoy</title></description>
        |  <pubDate>Thu, 02 Jan 2020 15:04:05 GMT</pubDate>
        |</item>
        |<item><title>B &amp; C</title><link>https://ex.com/b</link>
        |  <pubDate>Thu, 02 Jan 2020 15:04:05 +0200</pubDate></item>
        |<item><title>linkless drops</title></item>
        |</channel></rss>""".stripMargin)
    assert(fmt == "rss")
    assert(es.map(_.url) == Seq("https://ex.com/a", "https://ex.com/b"))
    assert(es(0).title == "Raw & title") // CDATA verbatim
    assert(es(1).title == "B & C")       // entity-decoded
    assert(es(0).tsEpoch == 1577977445L)
    assert(es(1).tsEpoch == 1577977445L - 7200)
  }

  test("atom: attribute links with rel dispatch; namespace prefixes") {
    val (fmt, es) = Feed.parse(
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<title>Feed title must not leak</title>
        |<link rel="self" href="https://ex.com/feed.xml"/>
        |<entry>
        |  <link rel="self" href="https://ex.com/entry-self"/>
        |  <link href="https://ex.com/e1"/>
        |  <link href="https://ex.com/second-loses"/>
        |  <a:title xmlns:a="x">Prefixed</a:title>
        |  <updated>2020-01-02T15:04:05Z</updated>
        |</entry>
        |<entry><title>Alt</title><link rel="alternate" href="/alt"/>
        |  <updated>2020-01-02T15:04:05-05:00</updated></entry>
        |<entry><title>no link drops</title><updated>2020-01-02T15:04:05Z</updated></entry>
        |</feed>""".stripMargin)
    assert(fmt == "atom")
    assert(es.map(_.url) == Seq("https://ex.com/e1", "/alt"))
    assert(es(0).title == "Prefixed") // local-name match
    assert(es(0).tsEpoch == 1577977445L)
    assert(es(1).tsEpoch == 1577977445L + 5 * 3600)
  }

  test("non-feed and edge documents are total") {
    assert(Feed.parse("not xml at all") == ("", Nil))
    assert(Feed.parse("") == ("", Nil) && Feed.parse(null) == ("", Nil))
    // items before any recognized root do not emit (format unknown)
    assert(Feed.parse("<item><link>https://x</link></item>") == ("", Nil))
    // unclosed entry at EOF: best effort
    val (_, es) = Feed.parse("<rss><channel><item><link>https://ex.com/tail</link>")
    assert(es.map(_.url) == Seq("https://ex.com/tail"))
    assert(es(0).tsEpoch == -1L) // no date
  }

  test("entries dataset explode row shape") {
    import spark.implicits._
    val rows = Feed.entries(Seq(
      1L -> "<rss><channel><item><title>T</title><link>https://a/1</link></item></channel></rss>",
      2L -> "junk").toDS()).collect().sortBy(r => (r.doc_id, r.seq)).toSeq
    assert(rows == Seq(Feed.FeedRow(1L, 0, "rss", "T", "https://a/1", -1L)))
  }
}
