package graft.functions

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal HTML DOM — a deterministic, dependency-free emulation of the subset of
 * lxml.etree.HTML semantics the reference parser relies on
 * (reference: /root/reference/weibo.py:1309-1320, util xpath helpers weibo.py:1188-1233).
 *
 * The reference feeds server-rendered snippet HTML through lxml and walks text
 * nodes (`//text()`), element text (`string(.)`), and attributes (`@href`,
 * `@data-url`, `img/@src`). We reproduce exactly those observable behaviors:
 *
 *  - text nodes are maximal character runs between tags, in document order,
 *    including whitespace-only runs (lxml keeps them);
 *  - comments and their content are excluded from `//text()`;
 *  - character references are decoded in text and attribute values;
 *  - `string(.)` of an element is the concatenation of descendant text nodes;
 *  - void elements (br, hr, img, …) never take children;
 *  - unmatched close tags are ignored; unclosed elements auto-close at EOF.
 *
 * This is NOT a general browser-grade parser: the engine's own page generator
 * (graft.crawl.PagesGen) emits well-formed markup, and for well-formed input
 * these semantics coincide with lxml's.
 */
object HtmlDom {

  sealed trait Node
  final case class Text(value: String) extends Node
  final case class Elem(
      tag: String,
      attrs: Map[String, String],
      children: ArrayBuffer[Node] = ArrayBuffer.empty
  ) extends Node {
    /** XPath `string(.)`: concatenated descendant text. */
    def innerText: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case Text(v)    => sb.append(v)
        case e: Elem    => e.children.foreach(walk)
      }
      children.foreach(walk)
      sb.toString
    }
    /** All descendant elements (document order), self excluded. */
    def descendants: Vector[Elem] = {
      val out = Vector.newBuilder[Elem]
      def walk(n: Node): Unit = n match {
        case e: Elem => out += e; e.children.foreach(walk)
        case _       =>
      }
      children.foreach(walk)
      out.result()
    }
    /** `//text()` under this element, document order. */
    def textNodes: Vector[String] = {
      val out = Vector.newBuilder[String]
      def walk(n: Node): Unit = n match {
        case Text(v) => out += v
        case e: Elem => e.children.foreach(walk)
      }
      children.foreach(walk)
      out.result()
    }
  }

  /** HTML void elements — never pushed on the open stack. */
  private val voidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Named character references the generator may emit. */
  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Find the index of the tag-closing '>' starting at `from` (the char
    * after '<'), skipping over single/double-quoted attribute values —
    * `<a href="x>y">` closes at the final '>', as lxml parses it. -1 if
    * unterminated. */
  def tagEnd(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '>') return i
      if (c == '"' || c == '\'') {
        val close = s.indexOf(c, i + 1)
        if (close < 0) return -1
        i = close + 1
      } else i += 1
    }
    -1
  }

  /** Decode character references ( &amp; &#64; &#x40; ). Unknown refs pass through verbatim. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(body.drop(2), 16))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(body.drop(1)))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else entities.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None      => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse an HTML fragment into a synthetic root element (analog of the
    * html/body wrapper lxml's HTML parser adds). */
  def parse(html: String): Elem = {
    val root = Elem("#root", Map.empty)
    var stack = List(root)
    var i = 0
    val n = html.length

    def top: Elem = stack.head

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) top.children += Text(decodeEntities(html.substring(i)))
        i = n
      } else {
        if (lt > i) top.children += Text(decodeEntities(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else {
          val gt = tagEnd(html, lt + 1)
          if (gt < 0) { // stray '<' at EOF: lxml treats as text loss; we drop it
            i = n
          } else {
            val raw = html.substring(lt + 1, gt)
            i = gt + 1
            if (raw.startsWith("/")) {
              val tag = raw.drop(1).trim.toLowerCase
              // pop to matching open tag; ignore if no match (lxml behavior)
              if (stack.exists(e => e.tag == tag)) {
                while (stack.head.tag != tag) stack = stack.tail
                if (stack.head.tag == tag && stack.tail.nonEmpty) stack = stack.tail
              }
            } else {
              val selfClose = raw.endsWith("/")
              val body = if (selfClose) raw.dropRight(1) else raw
              val (tag, attrs) = parseTag(body)
              val el = Elem(tag, attrs)
              top.children += el
              if (!selfClose && !voidTags.contains(tag)) stack = el :: stack
            }
          }
        }
      }
    }
    root
  }

  /** Parse `tag attr="v" attr2='v' bare` into (tag, attrs). */
  private def parseTag(body: String): (String, Map[String, String]) = {
    val trimmed = body.trim
    val sp = trimmed.indexWhere(Character.isWhitespace)
    if (sp < 0) return (trimmed.toLowerCase, Map.empty)
    val tag = trimmed.substring(0, sp).toLowerCase
    val attrs = Map.newBuilder[String, String]
    var i = sp
    val s = trimmed
    while (i < s.length) {
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < s.length) {
        val nameStart = i
        while (i < s.length && s.charAt(i) != '=' && !Character.isWhitespace(s.charAt(i))) i += 1
        val name = s.substring(nameStart, i).toLowerCase
        while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < s.length && s.charAt(i) == '=') {
          i += 1
          while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
          if (i < s.length && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val vStart = i
            while (i < s.length && s.charAt(i) != q) i += 1
            attrs += name -> decodeEntities(s.substring(vStart, i))
            if (i < s.length) i += 1
          } else {
            val vStart = i
            while (i < s.length && !Character.isWhitespace(s.charAt(i))) i += 1
            attrs += name -> decodeEntities(s.substring(vStart, i))
          }
        } else if (name.nonEmpty) attrs += name -> ""
      }
    }
    (tag, attrs.result())
  }
}
