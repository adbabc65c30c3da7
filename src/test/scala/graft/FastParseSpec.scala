package graft

import graft.crawl.PagesGen
import graft.functions.{FastParse, TextExtract}
import org.scalatest.funsuite.AnyFunSuite

/** FastParse must be byte-identical to the reference-faithful DOM path over
  * the entire generated corpus and the hand-built golden cases. */
class FastParseSpec extends AnyFunSuite {

  test("FastParse == TextExtract over the full generated corpus (all branches)") {
    (0L until 4000L).foreach { i =>
      val (html, _) = PagesGen.htmlOf(i, 4000L, crossLinks = true, bodyRepeat = (i % 7).toInt)
      val r = FastParse.parse(html)
      assert(r.text == TextExtract.extractText(html), s"text diverges at i=$i html=$html")
      assert(r.outlinks.toSeq == TextExtract.extractOutlinks(html), s"links diverge at i=$i")
      // the byte-level hot path must be byte-identical to both
      val rb = FastParse.parseBytes(html.getBytes("UTF-8"))
      assert(rb.text == r.text, s"byte-path text diverges at i=$i")
      assert(rb.outlinks.toSeq == r.outlinks.toSeq, s"byte-path links diverge at i=$i")
    }
  }

  test("parseBytes golden edge cases match parse(String)") {
    val cases = Seq(
      "  \t ", "", "​", "a​b", "＃全角", "x&#8203;y", "&#64;user tail",
      "<span>@名前</span>後", "#话题#<b>t</b>", "　　", " 　 ",
      """<a href="https://x.test/p?q=1&amp;r=2">l</a>""",
      """<a HREF='https://y.test/«utf8»'>m</a>""")
    cases.foreach { html =>
      val a = FastParse.parse(html)
      val c = FastParse.parseBytes(html.getBytes("UTF-8"))
      assert(c.text == a.text, s"text: [$html]")
      assert(c.outlinks.toSeq == a.outlinks.toSeq, s"links: [$html]")
    }
  }

  test("FastParse golden edge cases") {
    val cases = Seq(
      "hello", "a<br>b", "a<span>@user</span>b", "x<span>#t#</span>y<br>z",
      "  \t", " \n ", "a​b", "a<!-- hidden -->b",
      "x &amp; y &lt;z&gt; &#64;", "<div>a</div> <div>b</div>",
      """<a href="https://x.test/p">l</a><a href='/rel'>r</a><a href=https://y.test/q>b</a>""",
      """<a data-url="https://skip.me" href="https://keep.me/1">t</a>""",
      """<A HREF="https://upper.case/p">u</A>""",
      "", "<a>no href</a>", "<area href=\"https://not-anchor.test\">",
      // 'href' inside ANOTHER attribute's value must not match (quote-aware
      // attribute walk; ADVICE r1) — and duplicate href: last wins, as the
      // DOM's attribute map does
      """<a title="see href=http://evil.example.test/x" href="http://real.example.test/y">t</a>""",
      """<a href="http://first.test/a" href="http://second.test/b">t</a>""",
      """<a data-href=http://bare-evil.test href=http://bare-real.test/z x>t</a>""")
    cases.foreach { html =>
      val r = FastParse.parse(html)
      assert(r.text == TextExtract.extractText(html), s"text: [$html]")
      assert(r.outlinks.toSeq == TextExtract.extractOutlinks(html), s"links: [$html]")
    }
  }
}

/** quoted '>' inside attribute values must not end the tag (lxml behavior). */
class QuotedAttrSpec extends AnyFunSuite {
  test("tag end scan skips quoted '>'") {
    val html = """a<a href="https://x.test/q?a>b" title='p>q'>link</a>c"""
    assert(TextExtract.extractText(html) == "a\nlink\nc")
    assert(FastParse.parse(html).text == "a\nlink\nc")
    assert(FastParse.parse(html).outlinks.toSeq == Seq("https://x.test/q?a>b"))
    assert(TextExtract.extractOutlinks(html) == Seq("https://x.test/q?a>b"))
  }
}
