package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** robots.txt crawl governance (RFC 9309) — the compliance gate between
  * the crawl frontier ([[Html.extractLinks]] → [[Urls]]) and the fetch:
  * at corpus scale this runs as one broadcast of the parsed per-host
  * rule groups against the frontier (hosts are few next to URLs), so
  * the decision is a map-side lookup, never a shuffle of the URL table.
  *
  * Parsing per the RFC: groups of `User-agent:` lines followed by
  * `Allow:`/`Disallow:` rules; the most specific matching group wins
  * (exact product token beats `*`); within the group the LONGEST
  * matching rule path decides, allow winning ties; `$` anchors
  * end-of-path, `*` is a wildcard; unknown directives and comments
  * (`#`) are ignored; an empty `Disallow:` allows everything; a URL
  * with no matching rule is allowed. Lenient like [[Html]] (a crawler
  * must make SOME decision for every robots.txt it meets): malformed
  * lines are skipped, matching is case-sensitive on paths and
  * case-insensitive on directive names and agent tokens.
  */
object Robots {

  /** One rule: allow/disallow + the path pattern. RFC 9309 §2.2.2
    * matching (prefix match, `*` wildcard, trailing `$` end-anchor) is
    * compiled ONCE to a quoted regex — a hand-rolled in-order segment
    * scan gets the anchored case wrong (greedy first-occurrence vs the
    * backtracking `/a*b$` needs), so the engine does the backtracking.
    */
  final case class Rule(allow: Boolean, pattern: String) {
    private val anchored = pattern.endsWith("$")
    private val rx = {
      val core = if (anchored) pattern.dropRight(1) else pattern
      val sb = new StringBuilder
      core.split("\\*", -1).zipWithIndex.foreach { case (seg, i) =>
        if (i > 0) sb.append(".*")
        if (seg.nonEmpty) sb.append(java.util.regex.Pattern.quote(seg))
      }
      if (!anchored) sb.append(".*")
      java.util.regex.Pattern.compile(sb.toString,
        java.util.regex.Pattern.DOTALL)
    }
    def matches(path: String): Boolean = rx.matcher(path).matches()

    /** Specificity = pattern length (the RFC's longest-match key). */
    def specificity: Int = pattern.length
  }

  final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Parse a robots.txt body into user-agent groups. */
  def parse(body: String): Seq[Group] = {
    if (body == null) return Seq.empty
    var groups = Vector.empty[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups = groups :+ Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
    }
    for (raw <- body.split("\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim.stripSuffix("\r").trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            agents = agents :+ value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inRules = true
            if (value.isEmpty) {
              // "Disallow:" (empty) = allow all — an empty-pattern
              // ALLOW rule of specificity 0 (matches everything,
              // loses every tie), which is also a no-op for Allow
              if (key == "disallow") rules = rules :+ Rule(allow = true, "")
            } else rules = rules :+ Rule(key == "allow", value)
          case _ => if (agents.nonEmpty) inRules = true // crawl-delay etc.
        }
      }
    }
    flush()
    groups
  }

  /** The group governing `agent`: exact token match beats `*`; among
    * exact matches the first group wins; no match → None (allowed).
    */
  def groupFor(groups: Seq[Group], agent: String): Option[Group] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    groups.find(_.agents.contains(a))
      .orElse(groups.find(_.agents.contains("*")))
  }

  /** RFC 9309 decision for a URL path under a robots body: longest
    * matching rule wins, allow wins ties, no match = allowed.
    */
  def allowed(body: String, agent: String, path: String): Boolean =
    groupFor(parse(body), agent) match {
      case None => true
      case Some(g) =>
        val hits = g.rules.filter(_.matches(path))
        if (hits.isEmpty) true
        else {
          val best = hits.maxBy(r => (r.specificity, r.allow))
          best.allow
        }
    }

  // ---- Column surface ----

  private val allowedUdf =
    udf((body: String, agent: String, path: String) =>
      allowed(body, agent, if (path == null) "/" else path))

  /** Column form of [[allowed]] — pair with a broadcast join of the
    * per-host robots table against the frontier's host column.
    */
  def robotsAllowed(body: Column, agent: Column, path: Column): Column =
    allowedUdf(body, agent, path)
}
