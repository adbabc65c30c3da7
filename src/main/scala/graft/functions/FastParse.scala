package graft.functions

import scala.collection.mutable.ArrayBuffer

/**
 * Single-pass, allocation-lean extraction of (text, outlinks) — the crawl hot
 * path (SURVEY.md §2.8 U1). Produces output byte-identical to
 * TextExtract.extractText / extractOutlinks (asserted by FastParseSpec over
 * the full generated corpus), but:
 *
 *  - one scan instead of two full DOM parses per page;
 *  - no DOM: text runs and anchor hrefs are collected directly;
 *  - entity decoding only when a '&' is present in the run;
 *
 * At 32 cores the DOM path saturates allocation/GC bandwidth before it
 * saturates CPU — this scanner is what lets parse throughput scale with
 * cores. The DOM-based TextExtract remains the reference implementation and
 * serves the structure-dependent extractors (topics, at-users, location).
 */
object FastParse {

  final class Result(val text: String, val outlinks: Array[String])

  private def isSpacePy(s: String): Boolean =
    s.nonEmpty && s.forall(Character.isWhitespace)

  def parse(html: String): Result = {
    if (html == null) return new Result(null, Array.empty)
    if (isSpacePy(html)) return new Result(html.replace("​", ""), Array.empty)

    val links = ArrayBuffer.empty[String]
    val n = html.length
    val sb = new java.lang.StringBuilder(n)
    var first = true
    var prevStarts = false

    // streaming text-run emitter implementing the reference merge rule
    // (weibo.py:1313-1319): no per-node substring unless the run holds a
    // character reference (then it must be decoded before the first-char
    // check — '&#64;' decodes to '@').
    def emit(start: Int, end: Int): Unit = {
      if (end <= start) return
      var hasAmp = false
      var j = start
      while (j < end && !hasAmp) { if (html.charAt(j) == '&') hasAmp = true; j += 1 }
      if (hasAmp) {
        val decoded = HtmlDom.decodeEntities(html.substring(start, end))
        if (decoded.isEmpty) return
        val starts = decoded.charAt(0) == '@' || decoded.charAt(0) == '#'
        if (!first && !(prevStarts || starts)) sb.append('\n')
        sb.append(decoded)
        prevStarts = starts; first = false
      } else {
        val c0 = html.charAt(start)
        val starts = c0 == '@' || c0 == '#'
        if (!first && !(prevStarts || starts)) sb.append('\n')
        sb.append(html, start, end)
        prevStarts = starts; first = false
      }
    }

    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        emit(i, n)
        i = n
      } else {
        emit(i, lt)
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else {
          val gt = HtmlDom.tagEnd(html, lt + 1)
          if (gt < 0) i = n
          else {
            // anchor href extraction without building attribute maps
            if (gt - lt > 2 && (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A')
              && Character.isWhitespace(html.charAt(lt + 2))) {
              val href = extractHref(html, lt + 2, gt)
              if (href != null && (href.startsWith("http://") || href.startsWith("https://")))
                links += href
            }
            i = gt + 1
          }
        }
      }
    }

    val out = sb.toString
    new Result(if (out.indexOf('​') >= 0) out.replace("​", "") else out, links.toArray)
  }

  /** find the href attribute value inside tag body [from, to).
    *
    * Walks attributes left-to-right, skipping other attributes' quoted
    * values, so 'href' occurring INSIDE a value never matches —
    * `<a title="see href=http://evil" href="http://real">` yields the real
    * link. Semantics mirror HtmlDom.parseTag exactly (duplicate attrs: last
    * wins; quoted/bare values; entity decode), keeping the fast path
    * byte-identical to the DOM-based extractOutlinks. */
  private def extractHref(s: String, from: Int, to: Int): String = {
    var i = from
    var href: String = null
    while (i < to) {
      while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < to) {
        val nameStart = i
        while (i < to && s.charAt(i) != '=' && !Character.isWhitespace(s.charAt(i))) i += 1
        val nameEnd = i
        while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
        var value: String = null
        if (i < to && s.charAt(i) == '=') {
          i += 1
          while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
          if (i < to && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            val close = s.indexOf(q, i + 1)
            val vEnd = if (close >= 0 && close < to) close else to
            value = s.substring(i + 1, vEnd)
            i = if (close >= 0 && close < to) close + 1 else to
          } else {
            val vStart = i
            while (i < to && !Character.isWhitespace(s.charAt(i))) i += 1
            value = s.substring(vStart, i)
          }
        } else if (nameEnd > nameStart) value = "" // bare attribute, parseTag: ""
        if (nameEnd - nameStart == 4 && s.regionMatches(true, nameStart, "href", 0, 4)
          && value != null)
          href = value
      }
    }
    if (href == null) null else HtmlDom.decodeEntities(href)
  }
}
