package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One Common-Crawl-style page row (BASELINE.json.input_hint shape). */
case class Page(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte], text: String, lang: String)

/**
 * Deterministic synthetic `pages` corpus — FIXTURES.md §1.
 *
 * Pure function of (index, total): identical bytes on every run, at every
 * parallelism level (no wall clock, no RNG state). The layout generalizes the
 * reference's data model (one weibo.cn timeline per user,
 * /root/reference/weibo.py:2743): each "seed" (user analog) lives on one
 * host and owns a newest-first sequence of posts; one deliberate mega-host
 * carries ~30% of all seeds (the "weibo.cn-style mega-domain" skew case in
 * BASELINE.json.north_star, exercised by salting + AQE).
 *
 * The html is rendered from logical fields so that every branch of the
 * reference parser (weibo.py:1299-1344) is exercised: mention anchors,
 * surl-text topic spans, comments, entities, zero-width spaces, a periodic
 * whitespace-only body, and absolute outlinks forming a known link graph.
 * The `text` column is defined as extractText(html) — the byte-identical
 * invariant is therefore checkable per row (input_hint).
 */
object PagesGen {

  val BaseTsMillis: Long = 1735689600000L // 2025-01-01T00:00:00Z — fixed anchor, no wall clock

  /** splitmix64 — deterministic per-index mixing. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def numSeeds(n: Long): Long = math.max(8L, n / 64)
  def numHosts(n: Long): Long = math.max(4L, numSeeds(n) / 16)

  /** Seed → host: ~30% of seeds on mega-host 0 (skew), rest spread uniformly. */
  def hostOfSeed(seedId: Long, n: Long): Long = {
    val h = numHosts(n)
    val m = Math.floorMod(mix(seedId * 31 + 7), 10L)
    if (m < 3) 0L else 1L + Math.floorMod(mix(seedId), h - 1)
  }

  def urlOf(seedId: Long, postId: Long, n: Long): String =
    s"https://h${hostOfSeed(seedId, n)}.example.test/u/$seedId/p/$postId"

  /** warc_ts strictly decreasing in postId per seed — the newest-first
    * timeline invariant the frontier's priority order is tested against
    * (weibo.py:2743, util/pdf_exporter.py:306-314). */
  def tsOf(seedId: Long, postId: Long): Long =
    BaseTsMillis - postId * 3600_000L - Math.floorMod(mix(seedId * 1009 + postId), 3000_000L)

  private val vocab = Array(
    "数据", "管道", "spark", "frontier", "crawl", "batch", "merge", "页面",
    "天气", "新闻", "视频", "音乐", "科技", "分享", "今天", "转发")

  /** Render the deterministic html body for page index → (html, lang).
    *
    * Link graph models the reference's fetch topology:
    *  - a same-seed "next page" link to the next-older post — the timeline
    *    paging cursor (weibo.py:2743-2763 `for page in range(...)`), always
    *    present, so per-seed crawl order is a testable golden;
    *  - optional cross-seed/cross-host links (repost/discovery analog,
    *    weibo.py:1430 retweets) — `crossLinks=false` yields the pure-paging
    *    corpus used by the ordering-equivalence test (FIXTURES.md §5.2). */
  def htmlOf(i: Long, n: Long, crossLinks: Boolean = true, bodyRepeat: Int = 0): (String, String) = {
    val s = numSeeds(n)
    val seedId = Math.floorMod(i, s)
    val postId = i / s
    val m = mix(i)
    val lang = if (Math.floorMod(m, 2L) == 0) "zh" else "en"

    if (Math.floorMod(i, 97L) == 41) return ("  \n\t ", lang) // whitespace-only body (weibo.py:1310 branch)

    val w1 = vocab(Math.floorMod(m, vocab.length.toLong).toInt)
    val w2 = vocab(Math.floorMod(m >>> 8, vocab.length.toLong).toInt)
    val w3 = vocab(Math.floorMod(m >>> 16, vocab.length.toLong).toInt)
    val sb = new StringBuilder
    sb.append(w1).append(w2)
    if (Math.floorMod(m >>> 3, 3L) == 0) { // topic span (weibo.py:1210-1221)
      sb.append(s"""<span class="surl-text">#$w3#</span>""")
    }
    sb.append("说")
    if (Math.floorMod(m >>> 5, 3L) == 0) { // at-user anchor (weibo.py:1223-1233)
      val name = s"user${Math.floorMod(m >>> 24, 50L)}"
      sb.append(s"""<a href="/n/$name">@$name</a>""")
    }
    if (Math.floorMod(m >>> 7, 5L) == 0) sb.append("<!-- hidden -->")
    sb.append(w2)
    if (Math.floorMod(m >>> 9, 7L) == 0) sb.append("​") // zero-width space (weibo.py:1279-1283)
    sb.append("<br>")
    sb.append(if (lang == "zh") "今天天气不错" else "plain tail text")
    // bodyRepeat: pad to realistic web-page sizes (real pages are tens of
    // KB; parse cost must dominate at bench scale like it does in production)
    var k = 0
    while (k < bodyRepeat) {
      val wv = vocab(Math.floorMod(m >>> (k % 48), vocab.length.toLong).toInt)
      sb.append(s"""<p>$wv section $k <b>${vocab(((k * 7) % vocab.length).abs)}</b> body text run</p>""")
      k += 1
    }
    // timeline paging link: next-older post of the same seed
    if (i + s < n) {
      val seedId = Math.floorMod(i, s); val postId = i / s
      sb.append(s"""<a href="${urlOf(seedId, postId + 1, n)}">更多</a>""")
    }
    // cross links: repost/discovery analog
    if (crossLinks && Math.floorMod(m >>> 11, 2L) == 0) {
      val t2 = Math.floorMod(mix(i) + i / 2 + 17, n)
      sb.append(s"""<a href="${urlOf(Math.floorMod(t2, s), t2 / s, n)}">next</a>""")
    }
    (sb.toString, lang)
  }

  /** Pure row constructor. text := extractText(html) — invariant by
    * construction. Computed via the single-pass scanner (r6): byte-identical
    * to TextExtract.extractText over this generator's html family
    * (FastParseSpec asserts equality across the full corpus), at a fraction
    * of the DOM path's cost — corpus generation is the cold bench's first
    * wall-clock term. */
  def page(i: Long, n: Long, crossLinks: Boolean = true, bodyRepeat: Int = 0): Page = {
    val s = numSeeds(n)
    val seedId = Math.floorMod(i, s)
    val postId = i / s
    val (html, lang) = htmlOf(i, n, crossLinks, bodyRepeat)
    Page(
      url = urlOf(seedId, postId, n),
      warc_ts = new java.sql.Timestamp(tsOf(seedId, postId)),
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = graft.functions.FastParse.parse(html).text,
      lang = lang)
  }

  /** Distributed generation: spark.range keeps it fully parallel and pure. */
  def pages(spark: SparkSession, n: Long, partitions: Int = 32,
      crossLinks: Boolean = true, bodyRepeat: Int = 0): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => page(i, n, crossLinks, bodyRepeat))
  }

  /** Materialize to parquet once (idempotent — skip if committed marker exists). */
  def materialize(spark: SparkSession, n: Long, path: String, partitions: Int = 32,
      bodyRepeat: Int = 0): DataFrame = {
    val marker = new java.io.File(path, "_GRAFT_DONE")
    if (!marker.exists()) {
      pages(spark, n, partitions, crossLinks = true, bodyRepeat = bodyRepeat)
        .write.mode("overwrite").parquet(path)
      marker.createNewFile()
    }
    spark.read.parquet(path)
  }

  /** The seed list fixture (FIXTURES.md §2; analog of config.json user_id_list,
    * weibo.py:144-166): first `k` seeds, root url = each seed's newest post.
    * since/end window bounds the crawl like since_date/end_date
    * (weibo.py:286-331). */
  def seedRows(n: Long, k: Int): Seq[(String, String, java.sql.Timestamp, java.sql.Timestamp)] = {
    (0L until math.min(k.toLong, numSeeds(n))).map { seedId =>
      (s"seed$seedId", urlOf(seedId, 0, n),
        new java.sql.Timestamp(BaseTsMillis - 400L * 3600_000L), // wide since
        new java.sql.Timestamp(BaseTsMillis))                    // end = anchor
    }
  }
}
