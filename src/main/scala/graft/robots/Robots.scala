package graft.robots

/**
 * RFC 9309 robots.txt parsing + matching.
 *
 * Model: a parsed body is a flat list of [[RobotRule]]s, each tagged with the
 * user-agent token of its group. Matching (RFC 9309 §2.2.2 / §2.2.3):
 *   - pick the group with the most specific user-agent match (exact product
 *     token beats "*"); if no group matches, everything is allowed;
 *   - within the group, the rule with the longest octet-length pattern wins;
 *     tie → allow wins;
 *   - patterns support `*` (any char run) and a trailing `$` anchor;
 *   - no rules matched → allowed. Missing robots.txt → allowed.
 */
final case class RobotRule(agent: String, allow: Boolean, path: String)

/** One pass over a robots body: grouped Allow/Disallow rules, grouped
  * Crawl-delay declarations (unresolved — [[Robots.delayFor]] binds a UA),
  * and the group-independent Sitemap directives, in file order. */
final case class ParsedRobots(
    rules: Array[RobotRule],
    delays: Array[(String, Long)],
    sitemaps: Array[String])

object Robots {

  /** Single-pass scanner — the one place that knows the line grammar and the
    * group-continuation state machine. [[parse]]/[[crawlDelayMs]]/[[sitemaps]]
    * are views over its output; the crawl paths that need several facets of
    * the same body call this once instead of re-scanning per facet. */
  def scan(body: String): ParsedRobots = {
    if (body == null) return ParsedRobots(Array.empty, Array.empty, Array.empty)
    val rules = new scala.collection.mutable.ArrayBuffer[RobotRule]()
    val delays = new scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val maps = new scala.collection.mutable.ArrayBuffer[String]()
    var agents = List.empty[String]
    var inGroupRules = false
    body.linesIterator.foreach { lineRaw =>
      val line = {
        val h = lineRaw.indexOf('#')
        (if (h >= 0) lineRaw.substring(0, h) else lineRaw).trim
      }
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (inGroupRules) { agents = Nil; inGroupRules = false }
              agents = value.toLowerCase(java.util.Locale.ROOT) :: agents
            case "allow" | "disallow" =>
              inGroupRules = true
              val allow = key == "allow"
              // empty Disallow: == allow everything (record nothing)
              if (value.nonEmpty) {
                val ags = if (agents.isEmpty) List("*") else agents
                ags.foreach(a => rules += RobotRule(a, allow, value))
              }
            case "crawl-delay" =>
              inGroupRules = true
              // fractional seconds accepted; non-numeric / negative /
              // non-finite values ignored
              value.toDoubleOption
                .filter(s => s >= 0.0 && !s.isInfinite && !s.isNaN).foreach { s =>
                  val ms = math.ceil(s * 1000.0).toLong
                  val ags = if (agents.isEmpty) List("*") else agents
                  ags.foreach(a => delays += a -> ms)
                }
            case "sitemap" =>
              // GROUP-INDEPENDENT per sitemaps.org (applies regardless of the
              // user-agent sections it appears among) — but the line still
              // terminates a UA run like any other non-UA directive. The
              // protocol requires absolute URLs: relative/non-http dropped.
              inGroupRules = true
              val lower = value.toLowerCase(java.util.Locale.ROOT)
              if (lower.startsWith("http://") || lower.startsWith("https://")) maps += value
            case _ => // unknown keys: ignored, but they end a UA run too
              inGroupRules = true
          }
        }
      }
    }
    ParsedRobots(rules.toArray, delays.toArray, maps.toArray)
  }

  /** Parse a robots.txt body into rules (group structure flattened into the
    * per-rule `agent` tag; consecutive UA lines share the following rules). */
  def parse(body: String): Array[RobotRule] = scan(body).rules

  /** Resolve scanned Crawl-delay declarations for `ua`, in milliseconds.
    * Group selection mirrors [[allows]]/[[groupFor]]: entries from matching
    * exact-UA groups beat `*` groups; within the selected tier the MAX delay
    * wins (the conservative read of a self-contradictory file). */
  def delayFor(delays: Array[(String, Long)], ua: String): Option[Long] = {
    val u = if (ua == null) "*" else ua.toLowerCase(java.util.Locale.ROOT)
    val exact = delays.collect { case (a, ms) if a != "*" && u.contains(a) => ms }
    val tier = if (exact.nonEmpty) exact.toSeq
               else delays.collect { case ("*", ms) => ms }.toSeq
    if (tier.isEmpty) None else Some(tier.max)
  }

  /** `Crawl-delay` for `ua`, in milliseconds. The directive is non-standard
    * (absent from RFC 9309; Google ignores it, Bing/Yandex honor it) —
    * honoring it is strictly more polite, so the engine does. Absent or
    * unparseable directives → None. */
  def crawlDelayMs(body: String, ua: String): Option[Long] =
    delayFor(scan(body).delays, ua)

  /** `Sitemap:` directive values, in file order (see [[scan]]). */
  def sitemaps(body: String): Array[String] = scan(body).sitemaps

  /** True if `pattern` (with `*` wildcards, optional trailing `$`) matches a
    * prefix of `path`. Returns match specificity = pattern length, or -1. */
  def matchLen(pattern: String, path: String): Int = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    if (matches(pat, path, anchored)) pattern.length else -1
  }

  /** Iterative greedy star-matching (the classic two-pointer wildcard
    * algorithm): O(|pat|·|path|) worst case, no recursion. Robots bodies are
    * adversarial input by definition — the naive try-every-suffix recursion
    * is exponential on many-star patterns (star-a repeated, `$`-anchored)
    * and could pin a task.
    * An un-anchored robots pattern matches a PREFIX of the path, which is
    * exactly full-match semantics with a `*` appended. */
  private def matches(pat0: String, path: String, anchored: Boolean): Boolean = {
    val pat = if (anchored) pat0 else pat0 + "*"
    var pi = 0; var si = 0
    var starPi = -1; var starSi = 0
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (pi < pat.length && pat.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (starPi >= 0) { pi = starPi + 1; starSi += 1; si = starSi }
      else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** Select the applicable group for `ua` among rule agents. */
  def groupFor(rules: Array[RobotRule], ua: String): Array[RobotRule] = {
    val u = if (ua == null) "*" else ua.toLowerCase(java.util.Locale.ROOT)
    val exact = rules.filter(r => r.agent != "*" && u.contains(r.agent))
    if (exact.nonEmpty) exact else rules.filter(_.agent == "*")
  }

  /** RFC 9309 longest-match-wins verdict for (rules, ua, path). */
  def allows(rules: Array[RobotRule], ua: String, path: String): Boolean = {
    if (rules == null || rules.isEmpty) return true
    val p = if (path == null || path.isEmpty) "/" else path
    val group = groupFor(rules, ua)
    var bestLen = -1
    var bestAllow = true
    group.foreach { r =>
      val ml = matchLen(r.path, p)
      if (ml > bestLen || (ml == bestLen && r.allow && !bestAllow)) {
        if (ml >= 0) { bestLen = ml; bestAllow = r.allow }
      }
    }
    if (bestLen < 0) true else bestAllow
  }
}
