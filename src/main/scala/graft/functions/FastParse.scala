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

  // ------------------------------------------------------------------
  // Byte-level path — the crawl hot path proper. html arrives as a BINARY
  // parquet column; parsing the UTF-8 bytes directly skips the full-page
  // String decode (≈3× the page size in char[] allocations), which is the
  // dominant memory-bandwidth term at high core counts. ASCII structural
  // bytes ('<', '>', quotes, '&', '@', '#') never occur inside UTF-8
  // multi-byte sequences, so scanning is byte-exact; text runs are copied as
  // raw bytes and the output is decoded ONCE per page. Byte-identical to
  // parse(String) — asserted over the full corpus by FastParseSpec.
  // ------------------------------------------------------------------

  /** Python str.isspace() byte set for ASCII (0x09-0x0D, 0x1C-0x1F, 0x20). */
  @inline private def isWsByte(c: Int): Boolean =
    (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x20)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Zwsp = Array[Byte](0xe2.toByte, 0x80.toByte, 0x8b.toByte)

  def parseBytes(b: Array[Byte]): Result = {
    if (b == null) return new Result(null, Array.empty)
    // classify: all-ASCII-whitespace page (the <hr> fixture branch), or a
    // page with non-ASCII bytes and NO ASCII non-ws byte (could be unicode
    // whitespace-only — rare; delegate to the String path for exactness)
    var i = 0
    var asciiNonWs = false
    var hasNonAscii = false
    while (i < b.length && !asciiNonWs) {
      val c = b(i) & 0xff
      if (c >= 0x80) hasNonAscii = true
      else if (!isWsByte(c)) asciiNonWs = true
      i += 1
    }
    if (!asciiNonWs) {
      if (b.length == 0) return new Result("", Array.empty)
      return if (hasNonAscii) parse(new String(b, Utf8))
      else new Result(new String(b, Utf8), Array.empty) // pure ws, no zwsp possible
    }

    val n = b.length
    val links = ArrayBuffer.empty[String]
    // plain growable byte buffer (r6): ByteArrayOutputStream's writes are
    // synchronized methods the JIT cannot always elide across the non-inlined
    // emit path — pure overhead on the hottest per-byte loop in the engine.
    // Text output is bounded by the page size in practice (entity decodes
    // shrink, separators replace tags), so the initial capacity rarely grows.
    var outBuf = new Array[Byte](math.max(n, 16))
    var outLen = 0
    def outEnsure(extra: Int): Unit = {
      if (outLen + extra > outBuf.length) {
        var cap = outBuf.length * 2
        while (cap < outLen + extra) cap *= 2
        outBuf = java.util.Arrays.copyOf(outBuf, cap)
      }
    }
    def outByte(c: Byte): Unit = { outEnsure(1); outBuf(outLen) = c; outLen += 1 }
    def outBytes(src: Array[Byte], off: Int, len: Int): Unit = {
      outEnsure(len); System.arraycopy(src, off, outBuf, outLen, len); outLen += len
    }
    var first = true
    var prevStarts = false
    var sawZwsp = false

    def indexOfByte(ch: Byte, from: Int): Int = {
      var j = from
      while (j < n && b(j) != ch) j += 1
      if (j < n) j else -1
    }

    def startsWithAscii(s: String, at: Int): Boolean = {
      if (at + s.length > n) return false
      var j = 0
      while (j < s.length) { if (b(at + j) != s.charAt(j).toByte) return false; j += 1 }
      true
    }

    // streaming text-run emitter — byte twin of emit() above. The merge-rule
    // first-char test works on raw bytes ('@'/'#' are ASCII; a multi-byte
    // first char can never equal them), except entity-bearing runs which are
    // decoded first ('&#64;' → '@').
    def emitB(start: Int, end: Int): Unit = {
      if (end <= start) return
      var hasAmp = false
      var j = start
      while (j < end) {
        val c = b(j)
        if (c == '&') hasAmp = true
        else if (c == Zwsp(0) && j + 2 < end && b(j + 1) == Zwsp(1) && b(j + 2) == Zwsp(2))
          sawZwsp = true
        j += 1
      }
      if (hasAmp) {
        val decoded = HtmlDom.decodeEntities(new String(b, start, end - start, Utf8))
        if (decoded.isEmpty) return
        val c0 = decoded.charAt(0)
        val starts = c0 == '@' || c0 == '#'
        if (!first && !(prevStarts || starts)) outByte('\n')
        val enc = decoded.getBytes(Utf8)
        outBytes(enc, 0, enc.length)
        if (decoded.indexOf('​') >= 0) sawZwsp = true
        prevStarts = starts; first = false
      } else {
        val c0 = b(start)
        val starts = c0 == '@' || c0 == '#'
        if (!first && !(prevStarts || starts)) outByte('\n')
        outBytes(b, start, end - start)
        prevStarts = starts; first = false
      }
    }

    i = 0
    while (i < n) {
      val lt = indexOfByte('<', i)
      if (lt < 0) {
        emitB(i, n)
        i = n
      } else {
        emitB(i, lt)
        if (startsWithAscii("<!--", lt)) {
          var e = lt + 4
          while (e + 2 < n && !(b(e) == '-' && b(e + 1) == '-' && b(e + 2) == '>')) e += 1
          i = if (e + 2 < n) e + 3 else n
        } else if (lt + 1 < n && (b(lt + 1) == '!' || b(lt + 1) == '?')) {
          val e = indexOfByte('>', lt + 1)
          i = if (e < 0) n else e + 1
        } else {
          val gt = tagEndBytes(b, lt + 1)
          if (gt < 0) i = n
          else {
            if (gt - lt > 2 && (b(lt + 1) == 'a' || b(lt + 1) == 'A')
              && isWsByte(b(lt + 2) & 0xff)) {
              val href = extractHrefBytes(b, lt + 2, gt)
              if (href != null && (href.startsWith("http://") || href.startsWith("https://")))
                links += href
            }
            i = gt + 1
          }
        }
      }
    }

    if (sawZwsp) {
      val stripped = stripZwsp(java.util.Arrays.copyOf(outBuf, outLen))
      new Result(new String(stripped, Utf8), links.toArray)
    } else new Result(new String(outBuf, 0, outLen, Utf8), links.toArray)
  }

  /** remove every E2 80 8B (zero-width space) sequence. */
  private def stripZwsp(a: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(a.length)
    var j = 0
    while (j < a.length) {
      if (j + 2 < a.length && a(j) == Zwsp(0) && a(j + 1) == Zwsp(1) && a(j + 2) == Zwsp(2)) j += 3
      else { o.write(a(j)); j += 1 }
    }
    o.toByteArray
  }

  /** byte twin of HtmlDom.tagEnd: '>' terminates, quoted values skipped. */
  private def tagEndBytes(b: Array[Byte], from: Int): Int = {
    var j = from
    val n = b.length
    while (j < n) {
      val c = b(j)
      if (c == '>') return j
      if (c == '"' || c == '\'') {
        var k = j + 1
        while (k < n && b(k) != c) k += 1
        if (k >= n) return -1
        j = k + 1
      } else j += 1
    }
    -1
  }

  /** byte twin of extractHref: attribute walk, quote-aware, last href wins. */
  private def extractHrefBytes(b: Array[Byte], from: Int, to: Int): String = {
    var j = from
    var hrefStart = -1
    var hrefEnd = -1
    var hasHref = false
    while (j < to) {
      while (j < to && isWsByte(b(j) & 0xff)) j += 1
      if (j < to) {
        val nameStart = j
        while (j < to && b(j) != '=' && !isWsByte(b(j) & 0xff)) j += 1
        val nameEnd = j
        while (j < to && isWsByte(b(j) & 0xff)) j += 1
        var vStart = -1
        var vEnd = -1
        if (j < to && b(j) == '=') {
          j += 1
          while (j < to && isWsByte(b(j) & 0xff)) j += 1
          if (j < to && (b(j) == '"' || b(j) == '\'')) {
            val q = b(j)
            var k = j + 1
            while (k < to && b(k) != q) k += 1
            vStart = j + 1; vEnd = k
            j = if (k < to) k + 1 else to
          } else {
            vStart = j
            while (j < to && !isWsByte(b(j) & 0xff)) j += 1
            vEnd = j
          }
        } else if (nameEnd > nameStart) { vStart = nameEnd; vEnd = nameEnd } // bare: ""
        if (nameEnd - nameStart == 4 && vStart >= 0 &&
          (b(nameStart) | 0x20) == 'h' && (b(nameStart + 1) | 0x20) == 'r' &&
          (b(nameStart + 2) | 0x20) == 'e' && (b(nameStart + 3) | 0x20) == 'f') {
          hrefStart = vStart; hrefEnd = vEnd; hasHref = true
        }
      }
    }
    if (!hasHref) null
    else HtmlDom.decodeEntities(new String(b, hrefStart, hrefEnd - hrefStart, Utf8))
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
