package graft

import graft.functions.TextExtract
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden tests for the byte-identical text-extraction invariant
 * (input_hint; algorithm = /root/reference/weibo.py:1309-1320 text-node walk
 * + '@'/'#' merge + '\n' join + zero-width strip weibo.py:1279-1283).
 * Expected values hand-derived from lxml `//text()` semantics.
 */
class TextExtractSpec extends AnyFunSuite {
  import TextExtract._

  test("plain text passes through") {
    assert(extractText("hello world") == "hello world")
  }

  test("tags split into newline-joined text nodes (weibo.py:1320)") {
    assert(extractText("a<br>b") == "a\nb")
    assert(extractText("<div>a<b>c</b>d</div>") == "a\nc\nd")
  }

  test("@-prefixed node merges into predecessor and swallows successor (weibo.py:1313-1319)") {
    // nodes: [a, @user, b] — '@user' merges into 'a'; then prev ORIGINAL
    // node '@user' startswith '@' so 'b' merges too (asymmetric rule).
    assert(extractText("""a<span>@user</span>b""") == "a@userb")
  }

  test("#-topic node merge then independent tail node") {
    // nodes: [x, #t#, y, z] → x#t#y, then z separate
    assert(extractText("x<span>#t#</span>y<br>z") == "x#t#y\nz")
  }

  test("leading @ node starts its own line when first") {
    // nodes: [@u, rest] → i=0 pushes '@u'; i=1 prev '@u' starts '@' → merge
    assert(extractText("<a href='/n/u'>@u</a>rest") == "@urest")
  }

  test("whitespace-only body keeps its whitespace (the <hr> rule, weibo.py:1310)") {
    assert(extractText("  \t") == "  \t")
    assert(extractText(" \n ") == " \n ")
  }

  test("zero-width spaces stripped (standardize_info, weibo.py:1279-1283)") {
    assert(extractText("a​b") == "ab")
    assert(extractText("<span>​</span>ok") == "\nok")
  }

  test("comments excluded from text nodes") {
    assert(extractText("a<!-- hidden secret -->b") == "a\nb")
  }

  test("entities decoded") {
    assert(extractText("x &amp; y &lt;z&gt; &#64; &#x40;") == "x & y <z> @ @")
  }

  test("whitespace-only interstitial text nodes are kept (lxml keeps them)") {
    assert(extractText("<div>a</div> <div>b</div>") == "a\n \nb")
  }

  test("CJK body with mixed mentions") {
    val html = """今天天气不错<span class="surl-text">#天气#</span>转发<a href="/n/小明">@小明</a>了"""
    // nodes: [今天天气不错, #天气#, 转发, @小明, 了]
    // i1 merge (#) → 今天天气不错#天气# ; i2 prev=#天气# → merge → …转发
    // i3 cur @小明 → merge ; i4 prev @小明 → merge  ⇒ single line
    assert(extractText(html) == "今天天气不错#天气#转发@小明了")
  }

  test("topics: surl-text spans with #…# inner text (weibo.py:1210-1221)") {
    val html = """<span class="surl-text">#foo#</span><span class="surl-text">bar</span>""" +
      """<span class="surl-text">#a#</span><span class="surl-text">##</span>"""
    assert(extractTopics(html) == Seq("foo", "a"))
  }

  test("at-users: anchors where @+href[3:] == text (weibo.py:1223-1233)") {
    val html = """<a href="/n/alice">@alice</a><a href="/n/bob">bob</a><a href="/n/碳酸">@碳酸</a>"""
    assert(extractAtUsers(html) == Seq("alice", "碳酸"))
  }

  test("article url: headline prefix + t.cn data-url (weibo.py:1200-1208)") {
    val hit = """发布了头条文章<a data-url="http://t.cn/abc" href="/x">链接</a>"""
    val missPrefix = """转发了<a data-url="http://t.cn/abc">x</a>"""
    val missUrl = """发布了头条文章<a data-url="https://example.com/abc">x</a>"""
    assert(extractArticleUrl(hit) == "http://t.cn/abc")
    assert(extractArticleUrl(missPrefix) == "")
    assert(extractArticleUrl(missUrl) == "")
  }

  test("location: span after the location-icon span (weibo.py:1188-1198)") {
    val html = """<span><img src="https://h5.sinaimg.cn/upload/2015/09/25/3/timeline_card_small_location_default.png"/></span><span>北京·三里屯</span>"""
    assert(extractLocation(html) == "北京·三里屯")
    assert(extractLocation("<span>no icon</span><span>x</span>") == "")
  }

  test("outlinks: absolute http(s) hrefs only") {
    val html = """<a href="https://h1.example.test/p/1">x</a><a href="/rel">y</a><a href="http://h2.example.test/p/2">z</a>"""
    assert(extractOutlinks(html) == Seq("https://h1.example.test/p/1", "http://h2.example.test/p/2"))
  }

  test("string_to_int CJK magnitudes (weibo.py:1235-1245)") {
    assert(stringToInt("28万+") == 280000L)
    assert(stringToInt("3.5万") == 35000L)
    assert(stringToInt("1.2亿") == 120000000L)
    assert(stringToInt("42") == 42L)
    assert(stringToInt("0") == 0L)
  }

  test("truncation hint (weibo.py:1286-1297)") {
    assert(hasTruncationHint("...全文"))
    assert(hasTruncationHint("点击查看…全部"))
    assert(hasTruncationHint(">全文<"))
    assert(!hasTruncationHint("全文"))       // has 全文 but no hint variant
    assert(!hasTruncationHint("...想看"))
    assert(!hasTruncationHint(""))
  }

  test("repost text cleanup (weibo.py:2457-2462)") {
    assert(cleanRepostText("nice //@a: original") == "nice ")
    assert(cleanRepostText("") == "转发微博")
    assert(cleanRepostText("Repost") == "转发微博")
    assert(cleanRepostText("plain") == "plain")
  }

  test("safe filename (weibo.py:2291)") {
    assert(safeFilename("""a/b\c:d*e?f"g<h>i|j""") == "a_b_c_d_e_f_g_h_i_j")
  }
}

/** Property tests (SURVEY.md §5.5). */
class CanonicalPropSpec extends AnyFunSuite {
  import graft.crawl.Canonical._
  import org.scalacheck.Prop.forAll
  import org.scalacheck.{Gen, Test => SCTest}

  private def check(p: org.scalacheck.Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
    host <- Gen.oneOf("Example.COM", "h3.example.test", "a.b.c")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a/b", "/a/./b", "/a/../b/c", "/p/x/",
      "/%7ea", "/%7Ea", "/a%2Fb", "/a%2fb", "/%41%5a", "/x%", "/x%G1", "/a/%2E%2E/b")
    query <- Gen.oneOf("", "?", "?q=1&r=2", "?q=%7e", "?q=%3d%3D")
    frag <- Gen.oneOf("", "#top", "#a/b")
  } yield s"$scheme://$host$port$path$query$frag"

  test("canonicalize is idempotent") {
    check(forAll(urlGen) { u => canonicalize(canonicalize(u)) == canonicalize(u) })
  }

  test("canonicalize strips fragments and lowercases host") {
    check(forAll(urlGen) { u =>
      val c = canonicalize(u)
      !c.contains("#") && host(c) == host(c).toLowerCase
    })
  }

  test("canonical examples") {
    assert(canonicalize("HTTP://Example.COM:80/a/./b/../c?q=1#frag") == "http://example.com/a/c?q=1")
    assert(canonicalize("https://h.test:443") == "https://h.test/")
    assert(canonicalize("https://h.test/p?") == "https://h.test/p")
    assert(host("https://H.Test:8080/x") == "h.test")
  }

  test("percent-encoding normalization (RFC 3986 §6.2.2, VERDICT r3)") {
    // unreserved decodes — all three spellings collapse to one seen-set key
    assert(canonicalize("https://h.test/%7Ea") == "https://h.test/~a")
    assert(canonicalize("https://h.test/%7ea") == "https://h.test/~a")
    assert(canonicalize("https://h.test/~a") == "https://h.test/~a")
    assert(canonicalize("https://h.test/%41%5A%30%2D%2E%5F") == "https://h.test/AZ0-._")
    // reserved encodings KEPT (an encoded slash is not a path separator) —
    // but their hex is uppercased
    assert(canonicalize("https://h.test/a%2Fb") == "https://h.test/a%2Fb")
    assert(canonicalize("https://h.test/a%2fb") == "https://h.test/a%2Fb")
    assert(canonicalize("https://h.test/a%2Fb") != canonicalize("https://h.test/a/b"))
    // decode precedes dot resolution: %2E%2E is an encoded dot-segment
    assert(canonicalize("https://h.test/a/%2E%2E/b") == "https://h.test/b")
    // malformed triplets pass through
    assert(canonicalize("https://h.test/x%") == "https://h.test/x%")
    assert(canonicalize("https://h.test/x%G1") == "https://h.test/x%G1")
    // query normalized too
    assert(canonicalize("https://h.test/p?q=%7e&r=%3d") == "https://h.test/p?q=~&r=%3D")
  }

  test("string_to_int magnitude law: n万 == n * 10000 for integral n") {
    check(forAll(Gen.choose(0, 99999)) { n =>
      TextExtract.stringToInt(s"${n}万") == n.toLong * 10000
    })
  }
}
