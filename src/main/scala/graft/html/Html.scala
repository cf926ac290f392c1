package graft.html

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern
import graft.urls.UrlCanon

/**
 * Hand-written HTML extraction — no DOM library exists in this sandbox, and
 * the byte-identical-text oracle (BASELINE.json input_hint) is frozen by the
 * FIXTURES.md §F3 spec, which this object implements normatively:
 *
 *   1. remove script/style/comment blocks (non-greedy, case-insensitive)
 *   2. every remaining tag → single space
 *   3. decode &amp; &lt; &gt; &quot; &apos; &nbsp; and numeric &#N; / &#xH;
 *   4. collapse Unicode whitespace runs to one ASCII space; trim
 *
 * Link extraction pulls every <a ... href="..."> (any quoting), resolves
 * relative references against the page URL (RFC 3986 §5.2), and returns the
 * raw resolved form — canonicalization happens downstream so the frontier
 * keeps both raw and canonical forms.
 */
object Html {

  private val ScriptStyleComment: Pattern = Pattern.compile(
    "(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>|<!--.*?-->")
  private val AnyTag: Pattern = Pattern.compile("<[^>]*>")
  private val Entity: Pattern = Pattern.compile(
    "&(amp|lt|gt|quot|apos|nbsp);|&#(\\d+);|&#[xX]([0-9a-fA-F]+);")
  private val Href: Pattern = Pattern.compile(
    "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = Entity.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      if (m.group(1) != null) {
        sb.append(m.group(1) match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
        })
      } else if (m.group(2) != null) {
        sb.appendCodePoint(java.lang.Integer.parseInt(m.group(2)))
      } else {
        sb.appendCodePoint(java.lang.Integer.parseInt(m.group(3), 16))
      }
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Collapse runs of Unicode whitespace to one ASCII space and trim. */
  def collapseWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var inWs = true // leading ws is dropped
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '\u00a0') {
        if (!inWs) sb.append(' ')
        inWs = true
      } else { sb.append(c); inWs = false }
      i += 1
    }
    // drop single trailing space
    val n = sb.length
    if (n > 0 && sb.charAt(n - 1) == ' ') sb.setLength(n - 1)
    sb.toString
  }

  /** FIXTURES.md §F3 visible-text extraction over UTF-8 bytes. */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return null
    extractTextStr(new String(html, StandardCharsets.UTF_8))
  }

  def extractTextStr(html: String): String = {
    if (html == null) return null
    val noBlocks = ScriptStyleComment.matcher(html).replaceAll(" ")
    val noTags = AnyTag.matcher(noBlocks).replaceAll(" ")
    collapseWhitespace(decodeEntities(noTags))
  }

  /** All href targets of anchor tags, resolved against `baseUrl`; raw
    * (non-canonical) absolute forms, in document order, nulls dropped. */
  def extractLinks(html: Array[Byte], baseUrl: String): Array[String] = {
    if (html == null) return Array.empty
    extractLinksStr(new String(html, StandardCharsets.UTF_8), baseUrl)
  }

  def extractLinksStr(html: String, baseUrl: String): Array[String] = {
    if (html == null) return Array.empty
    val m = Href.matcher(html)
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) {
      val raw =
        if (m.group(2) != null) m.group(2)
        else if (m.group(3) != null) m.group(3)
        else m.group(4)
      val href = decodeEntities(raw).trim
      val abs = UrlCanon.resolve(baseUrl, href)
      if (abs != null) out += abs
    }
    out.toArray
  }
}
