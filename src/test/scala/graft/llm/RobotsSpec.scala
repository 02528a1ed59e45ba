package graft.llm

import graft.SparkSpec

class RobotsSpec extends SparkSpec {

  private val robots =
    """# example robots
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow: /*.json$
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  private val rules = Robots.rulesFor(robots, "GraftBot")

  test("named group wins over *; matching is longest-pattern with Allow ties") {
    assert(Robots.decide(rules, "/public/page") == (true, ""))
    assert(Robots.decide(rules, "/private/secret") == (false, "/private/"))
    assert(Robots.decide(rules, "/private/ok/sub") == (true, "/private/ok"))
    assert(Robots.decide(rules, "/data/file.json") == (false, "/*.json$"))
    assert(Robots.decide(rules, "/data/file.jsonl") == (true, "")) // $ anchors
    // an unknown agent falls to the * group: everything disallowed
    val star = Robots.rulesFor(robots, "otherbot")
    assert(Robots.decide(star, "/public/page") == (false, "/"))
  }

  test("wildcard matcher: prefix semantics, backtracking, anchors") {
    assert(Robots.matches("/a", "/abc"))
    assert(Robots.matches("/a$", "/a") && !Robots.matches("/a$", "/ab"))
    assert(Robots.matches("/a*b", "/axxbyy")) // prefix after wildcard
    assert(Robots.matches("/a*b$", "/axxb") && !Robots.matches("/a*b$", "/axxbyy"))
    assert(Robots.matches("/*x*y", "/axbxy")) // needs backtrack
    assert(!Robots.matches("/q", "/p"))
    assert(Robots.matches("*", "/anything"))
  }

  test("tolerant parse: junk lines ignored; empty/missing robots allows all") {
    val messy = "garbage line\nUser-agent: x\nDisallow: /a\n:::\nNOISE\n"
    assert(Robots.decide(Robots.rulesFor(messy, "x"), "/a") == (false, "/a"))
    assert(Robots.decide(Robots.rulesFor("", "x"), "/a") == (true, ""))
    assert(Robots.decide(Robots.rulesFor(null, "x"), "/a") == (true, ""))
    // empty Disallow is the historical allow-all idiom, not a rule
    val open = "User-agent: *\nDisallow:\n"
    assert(Robots.decide(Robots.rulesFor(open, "x"), "/a") == (true, ""))
  }

  test("consecutive User-agent lines share one rule block") {
    val multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert(Robots.decide(Robots.rulesFor(multi, "b"), "/x/1") == (false, "/x"))
    assert(Robots.decide(Robots.rulesFor(multi, "a"), "/x/1") == (false, "/x"))
  }

  test("filter dataset: per-host join + decision rows, null robots allows") {
    import spark.implicits._
    val urls = Seq((1L, "h1", "/private/x"), (2L, "h1", "/public/y"),
      (3L, "h2", "/anything")).toDF("doc_id", "host", "path")
    val bots = Seq(("h1", robots)).toDF("host", "robots_txt") // h2 has none
    val rows = Robots.filter(urls, bots, "graftbot")
      .collect().sortBy(_.doc_id)
    assert(rows.map(r => (r.doc_id, r.allowed, r.rule)).toSeq ==
      Seq((1L, false, "/private/"), (2L, true, ""), (3L, true, "")))
  }
}
