package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class SitemapSpec extends AnyFunSuite {

  test("plain urlset: all four fields captured, trimmed") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://ex.com/a </loc>
        |    <lastmod>2024-03-05</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |</urlset>""".stripMargin
    assert(Sitemap.parse(xml) ==
      Seq(Sitemap.Entry("https://ex.com/a", "2024-03-05", "daily", 0.8, index = false)))
  }

  test("optional fields default: lastmod/changefreq empty, priority 0.5") {
    val xml = "<urlset><url><loc>https://ex.com/b</loc></url></urlset>"
    assert(Sitemap.parse(xml) ==
      Seq(Sitemap.Entry("https://ex.com/b", "", "", 0.5, index = false)))
  }

  test("sitemapindex entries carry index=true") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>https://ex.com/map1.xml.gz</loc><lastmod>2024-01-02</lastmod></sitemap>
        |  <sitemap><loc>https://ex.com/map2.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemap.parse(xml) == Seq(
      Sitemap.Entry("https://ex.com/map1.xml.gz", "2024-01-02", "", 0.5, index = true),
      Sitemap.Entry("https://ex.com/map2.xml.gz", "", "", 0.5, index = true)))
  }

  test("namespace prefixes are matched by local name, case-insensitively") {
    val xml =
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sm:url><sm:LOC>https://ex.com/ns</sm:LOC><sm:priority>0.3</sm:priority></sm:url>
        |</sm:urlset>""".stripMargin
    assert(Sitemap.parse(xml) ==
      Seq(Sitemap.Entry("https://ex.com/ns", "", "", 0.3, index = false)))
  }

  test("loc is entity-decoded; CDATA passes through verbatim (no decode)") {
    val a = "<urlset><url><loc>https://ex.com/p?a=1&amp;b=2</loc></url></urlset>"
    assert(Sitemap.parse(a).head.loc == "https://ex.com/p?a=1&b=2")
    val b = "<urlset><url><loc><![CDATA[https://ex.com/p?a=1&amp;b=2]]></loc></url></urlset>"
    assert(Sitemap.parse(b).head.loc == "https://ex.com/p?a=1&amp;b=2")
  }

  test("entry with no loc is dropped; later entries still parse") {
    val xml =
      """<urlset>
        |<url><lastmod>2020-01-01</lastmod></url>
        |<url><loc>https://ex.com/kept</loc></url>
        |</urlset>""".stripMargin
    assert(Sitemap.parse(xml).map(_.loc) == Seq("https://ex.com/kept"))
  }

  test("extension blocks are skipped whole: an image:loc never leaks") {
    val xml =
      """<urlset><url>
        |<loc>https://ex.com/page</loc>
        |<image:image><image:loc>https://ex.com/pic.png</image:loc></image:image>
        |<priority>0.9</priority>
        |</url></urlset>""".stripMargin
    assert(Sitemap.parse(xml) ==
      Seq(Sitemap.Entry("https://ex.com/page", "", "", 0.9, index = false)))
  }

  test("comments vanish; unterminated comment drops the rest") {
    val xml = "<urlset><!-- note --><url><loc>https://ex.com/x</loc></url></urlset>"
    assert(Sitemap.parse(xml).map(_.loc) == Seq("https://ex.com/x"))
    val cut = "<urlset><url><loc>https://ex.com/x</loc></url><!-- oops <url><loc>https://ex.com/y</loc></url>"
    assert(Sitemap.parse(cut).map(_.loc) == Seq("https://ex.com/x"))
  }

  test("unparseable priority falls back to the protocol default 0.5") {
    val xml = "<urlset><url><loc>https://ex.com/x</loc><priority>high</priority></url></urlset>"
    assert(Sitemap.parse(xml).head.priority == 0.5)
  }

  test("tag soup is total: unclosed entry at EOF is dropped, junk tolerated") {
    assert(Sitemap.parse("") == Nil)
    assert(Sitemap.parse(null) == Nil)
    assert(Sitemap.parse("not xml at all & < >") == Nil)
    // unclosed <url> never emits (no closing tag → no entry boundary)
    assert(Sitemap.parse("<urlset><url><loc>https://ex.com/x</loc>") == Nil)
    // DOCTYPE and processing instructions are skipped
    val xml = "<!DOCTYPE x><?pi junk?><urlset><url><loc>https://ex.com/x</loc></url></urlset>"
    assert(Sitemap.parse(xml).map(_.loc) == Seq("https://ex.com/x"))
  }
}
