package graft.functions

import scala.collection.mutable.ArrayBuffer

/**
 * Deterministic text/structure extraction from snippet HTML — the engine's
 * per-row invariant (`BASELINE.json.input_hint`: extracted text must be
 * byte-identical per url to the reference parser's output).
 *
 * The algorithm is a faithful re-expression of the reference's
 * `parse_weibo` text walk and xpath helpers:
 *   - text walk + merge rule:      /root/reference/weibo.py:1309-1320
 *   - whitespace-only `<hr>` rule: /root/reference/weibo.py:1310
 *   - zero-width-space strip:      /root/reference/weibo.py:1270-1284 (standardize_info)
 *   - topics:                      /root/reference/weibo.py:1210-1221
 *   - at-users:                    /root/reference/weibo.py:1223-1233
 *   - article url:                 /root/reference/weibo.py:1200-1208
 *   - location:                    /root/reference/weibo.py:1188-1198
 *   - truncation hint:             /root/reference/weibo.py:1286-1297
 *
 * All functions are pure (no clock, no locale, no network) so they are safe
 * inside codegen'd Catalyst expressions and replayable across cluster sizes.
 */
object TextExtract {

  /** Python str.isspace(): non-empty and every char is whitespace.
    * (Character.isWhitespace matches Python's for the ASCII + unicode spaces
    * the generator emits; U+200B is NOT whitespace in either.) */
  private def isSpacePy(s: String): Boolean =
    s.nonEmpty && s.forall(Character.isWhitespace)

  /**
   * Extract plain text from snippet HTML.
   *
   * Reference algorithm (weibo.py:1309-1320):
   *  1. if the body is pure whitespace, parse `body + "<hr>"` (keeps the
   *     whitespace text node alive — lxml returns None on whitespace-only);
   *  2. collect all text nodes in document order (`//text()`);
   *  3. merge a node into its predecessor when EITHER the previous ORIGINAL
   *     node OR the current node starts with '@' or '#' (avoids spurious
   *     newlines around mention/topic anchors);
   *  4. join survivors with '\n';
   *  5. strip zero-width spaces (standardize_info, weibo.py:1279-1283).
   */
  def extractText(html: String): String = {
    if (html == null) return null
    val effective = if (isSpacePy(html)) html + "<hr>" else html
    val nodes = HtmlDom.parse(effective).textNodes
    if (nodes.isEmpty) return ""
    val merged = ArrayBuffer.empty[String]
    var i = 0
    while (i < nodes.length) {
      val cur = nodes(i)
      val startsAtHash =
        i > 0 && (startsWithAtOrHash(nodes(i - 1)) || startsWithAtOrHash(cur))
      if (startsAtHash && merged.nonEmpty) merged(merged.length - 1) += cur
      else merged += cur
      i += 1
    }
    merged.mkString("\n").replace("​", "")
  }

  private def startsWithAtOrHash(s: String): Boolean =
    s.nonEmpty && (s.charAt(0) == '@' || s.charAt(0) == '#')

  /** Topics: `//span[@class='surl-text']` whose string(.) is `#…#` with inner
    * length > 0 (reference requires len(text) > 2), inner text, ','-joined.
    * (weibo.py:1210-1221) */
  def extractTopics(html: String): Seq[String] = {
    if (html == null) return Nil
    val root = HtmlDom.parse(html)
    root.descendants.iterator
      .filter(e => e.tag == "span" && e.attrs.get("class").contains("surl-text"))
      .map(_.innerText)
      .filter(t => t.length > 2 && t.head == '#' && t.last == '#')
      .map(t => t.substring(1, t.length - 1))
      .toSeq
  }

  /** At-users: anchors where `"@" + href.drop(3) == string(.)`; the '@' is
    * stripped from the emitted name. (weibo.py:1223-1233) */
  def extractAtUsers(html: String): Seq[String] = {
    if (html == null) return Nil
    val root = HtmlDom.parse(html)
    root.descendants.iterator
      .filter(_.tag == "a")
      .flatMap { a =>
        a.attrs.get("href").collect {
          case href if "@" + href.drop(3) == a.innerText => a.innerText.drop(1)
        }
      }
      .toSeq
  }

  /** Headline-article url: doc text startswith 发布了头条文章 and the first
    * `//a/@data-url` starts with http://t.cn. (weibo.py:1200-1208) */
  def extractArticleUrl(html: String): String = {
    if (html == null) return ""
    val root = HtmlDom.parse(html)
    if (!root.innerText.startsWith("发布了头条文章")) return ""
    root.descendants.iterator
      .filter(_.tag == "a")
      .flatMap(_.attrs.get("data-url"))
      .find(_.startsWith("http://t.cn"))
      .getOrElse("")
  }

  private val LocationIcon = "timeline_card_small_location_default.png"

  /** Location: the span FOLLOWING (in //span document order) the span whose
    * img/@src contains the location icon. (weibo.py:1188-1198) */
  def extractLocation(html: String): String = {
    if (html == null) return ""
    val spans = HtmlDom.parse(html).descendants.filter(_.tag == "span")
    var i = 0
    while (i < spans.length) {
      val hasIcon = spans(i).children.exists {
        case e: HtmlDom.Elem =>
          e.tag == "img" && e.attrs.get("src").exists(_.contains(LocationIcon))
        case _ => false
      }
      if (hasIcon) {
        return if (i + 1 < spans.length) spans(i + 1).innerText else ""
      }
      i += 1
    }
    ""
  }

  /** All absolute http(s) hrefs — the frontier's outlink set (the at-user
    * anchors of weibo.py:1223-1233 generalized to crawl outlinks per
    * BASELINE.json.north_star "extracts outlinks and text from html"). */
  def extractOutlinks(html: String): Seq[String] = {
    if (html == null) return Nil
    HtmlDom.parse(html).descendants.iterator
      .filter(_.tag == "a")
      .flatMap(_.attrs.get("href"))
      .filter(h => h.startsWith("http://") || h.startsWith("https://"))
      .toSeq
  }

  /** Truncation-hint detector (weibo.py:1286-1297). */
  def hasTruncationHint(text: String): Boolean = {
    if (text == null || text.isEmpty) return false
    (text.contains("全文") || text.contains("全部")) && (
      text.contains("...全文") || text.contains("…全文") ||
      text.contains("...全部") || text.contains("…全部") ||
      text.contains(">全文<") || text.contains(">全部<"))
  }

  /** CJK-magnitude count coercion (weibo.py:1235-1245):
    * "28万+" → 280000, "3.5万" → 35000, "1.2亿" → 120000000, else toInt. */
  def stringToInt(s: String): Long = {
    if (s == null) return 0L
    val t = s.trim
    if (t.endsWith("万+")) (t.dropRight(2) + "0000").toLong
    else if (t.endsWith("万")) (t.dropRight(1).toDouble * 10000).toLong
    else if (t.endsWith("亿")) (t.dropRight(1).toDouble * 100000000L).toLong
    else t.toDouble.toLong
  }

  /** Repost text cleanup (weibo.py:2457-2462): take segment before "//";
    * empty or "Repost" → 转发微博. */
  def cleanRepostText(raw: String): String = {
    if (raw == null) return "转发微博"
    val head = raw.split("//", 2)(0)
    if (head.isEmpty || head == "Repost") "转发微博" else head
  }

  /** Safe filename (weibo.py:2291): replace windows-invalid chars with '_'. */
  def safeFilename(s: String): String =
    if (s == null) null else s.replaceAll("[\\\\/:*?\"<>|]", "_")
}
