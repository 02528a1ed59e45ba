package graft.llm

/** robots.txt (RFC 9309) rule evaluation — the crawl-politeness filter
  * that decides which of a corpus's URLs were even fetchable: a crawl
  * pipeline joins its URL frontier to per-host robots rules before
  * anything else runs. Spec behaviors honored (RobotsSpec):
  *
  *   - groups: consecutive `User-agent:` lines share the rules that
  *     follow; a crawler uses the group(s) naming it EXACTLY
  *     (case-insensitive) if any exist, else the `*` groups — an
  *     evaluator that falls through to `*` despite a named group
  *     flips every decision (the fixture forces this)
  *   - `Allow:` / `Disallow:` patterns with `*` wildcards and the `$`
  *     end anchor; empty Disallow = allow-all (historical idiom)
  *   - most-specific match wins = LONGEST pattern (octet length);
  *     equal length → Allow wins; no match → allowed (the default)
  *   - comments (`#` to end of line) and blank lines; unknown
  *     directives (Crawl-delay, Sitemap) ignored
  *
  * Total, not quarantining: a malformed robots.txt line is ignored
  * (the RFC's error tolerance — crawlers must not die on them), and an
  * EMPTY or missing robots.txt allows everything.
  */
object Robots {

  final case class Rule(pattern: String, allow: Boolean)

  /** Rules applying to `agent` (exact ci match preferred over '*'). */
  def rulesFor(robots: String, agent: String): Seq[Rule] = {
    if (robots == null) return Nil
    final case class Group(agents: List[String], rules: List[Rule])
    var groups = List.empty[Group]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var inAgents = true
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups = Group(curAgents, curRules.reverse) :: groups
      curAgents = Nil; curRules = Nil
    }
    robots.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgents) { flush(); inAgents = true }
              curAgents = value :: curAgents
            case "allow" | "disallow" if curAgents.nonEmpty =>
              inAgents = false
              // empty Disallow: the historical allow-all idiom — no rule
              if (value.nonEmpty) curRules = Rule(value, key == "allow") :: curRules
            case _ => () // Crawl-delay, Sitemap, junk: ignored
          }
        }
      }
    }
    flush()
    val lcAgent = agent.toLowerCase
    val named = groups.filter(_.agents.exists(_.toLowerCase == lcAgent))
    val chosen = if (named.nonEmpty) named else groups.filter(_.agents.contains("*"))
    chosen.reverse.flatMap(_.rules)
  }

  /** `*`-wildcard / `$`-anchored pattern match against a path. */
  private[llm] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    if (p.isEmpty) return !anchored || path.isEmpty
    // classic greedy wildcard match with single backtrack point
    var pi = 0; var si = 0
    var star = -1; var mark = 0
    while (si < path.length) {
      if (pi < p.length && (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') { star = pi; mark = si; pi += 1 }
      else if (star >= 0) { pi = star + 1; mark += 1; si = mark }
      else return false
      if (pi == p.length && !anchored) return true // prefix semantics
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** RFC decision: longest matching pattern; ties → Allow; default allow.
    * Returns (allowed, matched pattern or "" for the default). */
  def decide(rules: Seq[Rule], path: String): (Boolean, String) = {
    var best: Rule = null
    var bestLen = -1
    rules.foreach { r =>
      if (matches(r.pattern, path)) {
        val better = r.pattern.length > bestLen ||
          (r.pattern.length == bestLen && r.allow && best != null && !best.allow)
        if (better) { best = r; bestLen = r.pattern.length }
      }
    }
    if (best == null) (true, "") else (best.allow, best.pattern)
  }

  /** Frontier filter: (doc_id, host, path) × per-host robots → decision
    * rows. Robots are parsed once per distinct text per partition (the
    * per-host join delivers runs of equal texts). */
  final case class Decision(doc_id: Long, host: String, path: String,
      allowed: Boolean, rule: String)

  def filter(urls: org.apache.spark.sql.DataFrame, robots: org.apache.spark.sql.DataFrame,
      agent: String): org.apache.spark.sql.Dataset[Decision] = {
    val spark = urls.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    urls.select(col("doc_id"), col("host"), col("path"))
      .join(robots.select(col("host"), col("robots_txt")), Seq("host"), "left")
      .select(col("doc_id"), col("host"), col("path"), col("robots_txt"))
      .as[(Long, String, String, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, Seq[Rule]]
        it.map { case (id, host, path, txt) =>
          val rules = cache.getOrElseUpdate(if (txt == null) "" else txt,
            rulesFor(if (txt == null) "" else txt, agent))
          val (ok, rule) = decide(rules, path)
          Decision(id, host, path, ok, rule)
        }
      }
  }
}
