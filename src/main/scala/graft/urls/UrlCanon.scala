package graft.urls

/**
 * RFC 3986 URL canonicalization — pure JVM-side string machinery, no
 * `java.net.URI` (it rejects too many real-world URLs) and no network.
 *
 * Implements the syntax-based normalization of RFC 3986 §6.2.2 and the
 * scheme-based normalization of §6.2.3:
 *   - lowercase scheme and host                        (§6.2.2.1)
 *   - percent-encoding: decode unreserved, upcase hex  (§6.2.2.2)
 *   - remove dot-segments from the path                (§6.2.2.3 / §5.2.4)
 *   - drop default port (http:80, https:443)           (§6.2.3)
 *   - empty path → "/"                                 (§6.2.3)
 *   - strip fragment (a crawler never fetches fragments)
 *
 * Reference behavior note: the reference tree is empty in this sandbox
 * (SURVEY.md §0.1), so this spec is frozen by FIXTURES.md §F1.1 — the
 * fixture URL universe exercises exactly these equivalence classes
 * (case, default port, dot-segments, fragment).
 *
 * All methods are static and deterministic so the Catalyst expressions in
 * [[graft.functions]] can call them from generated code.
 */
object UrlCanon {

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode %XX when the octet is unreserved; otherwise uppercase the hex.
    * Invalid escapes (bad/missing hex) pass through untouched. */
  def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h1 = hexVal(s.charAt(i + 1)); val h2 = hexVal(s.charAt(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = (h1 << 4) | h2
          val ch = v.toChar
          if (v < 128 && isUnreserved(ch)) sb.append(ch)
          else {
            sb.append('%')
            sb.append(java.lang.Character.toUpperCase(s.charAt(i + 1)))
            sb.append(java.lang.Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        // move first segment (incl. leading '/') to output
        val start = if (in.charAt(0) == '/') 1 else 0
        val slash = in.indexOf('/', start)
        if (slash < 0) { out += in; in = "" }
        else { out += in.substring(0, slash); in = in.substring(slash) }
      }
    }
    out.mkString
  }

  /** Split `s` after "scheme:" into (authority, path, queryWithQmark). */
  private def splitAfterScheme(rest: String): (String, String, String) = {
    // rest starts with "//" for hierarchical URLs
    if (!rest.startsWith("//")) {
      // opaque (mailto:, javascript:) — treat everything as path
      val q = rest.indexOf('?')
      if (q < 0) ("", rest, "") else ("", rest.substring(0, q), rest.substring(q))
    } else {
      val body = rest.substring(2)
      var end = body.length
      val slash = body.indexOf('/'); val qm = body.indexOf('?')
      if (slash >= 0) end = slash
      if (qm >= 0 && qm < end) end = qm
      val auth = body.substring(0, end)
      val tail = body.substring(end)
      val q = tail.indexOf('?')
      if (q < 0) (auth, tail, "") else (auth, tail.substring(0, q), tail.substring(q))
    }
  }

  /** Canonical form of an absolute URL. Non-http(s) schemes are returned with
    * a lowercased scheme only (they get filtered by the scheme predicate).
    * Null/empty input → null. */
  def canonicalize(raw: String): String = {
    if (raw == null) return null
    var s = raw.trim
    if (s.isEmpty) return ""
    // strip fragment first — never part of the fetch identity
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    if (s.isEmpty) return ""
    val colon = s.indexOf(':')
    if (colon <= 0) return s // no scheme: leave as-is (caller filters)
    val schemeRaw = s.substring(0, colon)
    if (!schemeRaw.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') ||
        !schemeRaw.charAt(0).isLetter) return s
    val scheme = schemeRaw.toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(colon + 1)
    if (scheme != "http" && scheme != "https") return scheme + ":" + rest
    val (authRaw, pathRaw, queryRaw) = splitAfterScheme(rest)
    // authority: [userinfo@]host[:port]
    var userinfo = ""
    var hostPort = authRaw
    val at = authRaw.lastIndexOf('@')
    if (at >= 0) { userinfo = authRaw.substring(0, at + 1); hostPort = authRaw.substring(at + 1) }
    var host = hostPort
    var port = ""
    // IPv6 literal [::1]:8080
    if (hostPort.startsWith("[")) {
      val close = hostPort.indexOf(']')
      if (close >= 0) {
        host = hostPort.substring(0, close + 1)
        val after = hostPort.substring(close + 1)
        if (after.startsWith(":")) port = after.substring(1)
      }
    } else {
      val pc = hostPort.lastIndexOf(':')
      if (pc >= 0) { host = hostPort.substring(0, pc); port = hostPort.substring(pc + 1) }
    }
    host = host.toLowerCase(java.util.Locale.ROOT)
    val defaultPort = if (scheme == "http") "80" else "443"
    val portPart = if (port.isEmpty || port == defaultPort) "" else ":" + port
    var path = removeDotSegments(normalizePercent(pathRaw))
    if (path.isEmpty) path = "/"
    val query = {
      val qn = normalizePercent(queryRaw)
      if (qn == "?") "" else qn // drop a bare trailing '?'
    }
    scheme + "://" + userinfo + host + portPart + path + query
  }

  /** Lowercased host of an absolute URL; "" when there is none. */
  def hostOf(url: String): String = {
    if (url == null) return null
    val c = canonicalize(url)
    if (c == null) return null
    val i = c.indexOf("://")
    if (i < 0) return ""
    val body = c.substring(i + 3)
    var end = body.length
    val slash = body.indexOf('/'); val qm = body.indexOf('?')
    if (slash >= 0) end = slash
    if (qm >= 0 && qm < end) end = qm
    var hp = body.substring(0, end)
    val at = hp.lastIndexOf('@')
    if (at >= 0) hp = hp.substring(at + 1)
    if (hp.startsWith("[")) return hp.substring(0, hp.indexOf(']') + 1)
    val pc = hp.lastIndexOf(':')
    if (pc >= 0) hp.substring(0, pc) else hp
  }

  /** "www.example.com" → "com.example.www" — the sort key that clusters a
    * registered domain's subdomains together in ordered storage. */
  def hostRev(host: String): String = {
    if (host == null) return null
    val parts = host.split('.')
    var i = 0; var j = parts.length - 1
    while (i < j) { val t = parts(i); parts(i) = parts(j); parts(j) = t; i += 1; j -= 1 }
    parts.mkString(".")
  }

  /** RFC 3986 §5.2.2 reference resolution: resolve `ref` against absolute
    * `base`. Returns null for unusable refs (empty, fragment-only). The
    * result is NOT canonicalized — feed it to [[canonicalize]]. */
  def resolve(base: String, ref: String): String = {
    if (ref == null || base == null) return null
    val r = ref.trim
    if (r.isEmpty || r.startsWith("#")) return null
    val colon = r.indexOf(':')
    val looksAbsolute = colon > 0 &&
      r.substring(0, colon).forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') &&
      r.charAt(0).isLetter
    if (looksAbsolute) return r
    // decompose base
    val bColon = base.indexOf(':')
    if (bColon <= 0) return null
    val scheme = base.substring(0, bColon)
    val (bAuth, bPath, bQuery) = splitAfterScheme(base.substring(bColon + 1))
    if (r.startsWith("//")) return scheme + ":" + r
    if (r.startsWith("/")) return scheme + "://" + bAuth + r
    if (r.startsWith("?")) return scheme + "://" + bAuth + bPath + r
    // relative path: merge (RFC 3986 §5.2.3)
    val mergedDir = {
      val slash = bPath.lastIndexOf('/')
      if (slash < 0) "/" else bPath.substring(0, slash + 1)
    }
    scheme + "://" + bAuth + removeDotSegments(mergedDir + r)
  }
}
