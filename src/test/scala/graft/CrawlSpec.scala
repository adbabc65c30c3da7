package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.crawl._
import graft.functions.TextExtract
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/**
 * End-to-end crawl-engine goldens (FIXTURES.md §5, SURVEY.md §5):
 * byte-identical parse invariant, reference crawl ordering, seen-set
 * membership, resume-from-checkpoint, robots gating, politeness budgets,
 * and determinism across partitioning levels.
 */
class CrawlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_crawl").toString

  val N = 512L
  lazy val pagesDF = PagesGen.pages(spark, N, partitions = 4).toDF.persist()
  lazy val pagesPure = PagesGen.pages(spark, N, partitions = 4, crossLinks = false).toDF.persist()

  def seeds(k: Int): Seq[Seed] = PagesGen.seedRows(N, k).map(Seed.tupled)

  test("invariant: extract_text(html) == text for every generated page (input_hint)") {
    import graft.functions.gf
    val bad = pagesDF
      .withColumn("t2", gf.extract_text_bin($"html"))
      .filter(!($"t2" <=> $"text"))
    assert(bad.count() == 0)
  }

  test("generated corpus: warc_ts strictly decreasing per seed (newest-first timeline)") {
    val s = PagesGen.numSeeds(N)
    (0L until 3L).foreach { seed =>
      val ts = (0L until N / s).map(p => PagesGen.tsOf(seed, p))
      assert(ts == ts.sortBy(-_), s"seed $seed not newest-first")
    }
  }

  test("one batch: fetches seed roots, respects budget, emits lineage") {
    val eng = new CrawlEngine(spark, pagesDF, tmp(),
      CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4))
    eng.initialize(seeds(6))
    val m = eng.runBatch()
    assert(m("invariant_violations") == 0)
    assert(m("fetched") > 0)
    val f = eng.fetched().get
    // per-host budget honored
    val over = f.groupBy("host", "batch_id").count().filter($"count" > 3).count()
    assert(over == 0)
    // lineage columns present and sane
    val row = f.select("batch_id", "partition_id", "fetch_ordinal", "sched_delay_ms").head()
    assert(row.getLong(0) == 0L && row.getInt(2) >= 1)
    // delay budget = (ordinal-1) * delay
    val badDelay = f.filter($"sched_delay_ms" =!= ($"fetch_ordinal" - 1) * 6000L).count()
    assert(badDelay == 0)
  }

  test("crawl ordering matches reference paging semantics (pure-paging corpus)") {
    // Reference model (weibo.py:2743-2763): each seed's timeline is walked
    // newest-first (post 0,1,2,…), budget-capped per batch, bounded by
    // [since, end]. With crossLinks=false the engine must reproduce exactly
    // that per-seed order.
    val eng = new CrawlEngine(spark, pagesPure, tmp(),
      CrawlConfig(defaultHostBudget = 2, maxDepth = 64, shufflePartitions = 4))
    eng.initialize(seeds(4))
    eng.run(5)
    val f = eng.fetched().get
      .withColumn("post_id", regexp_extract($"url_canon", "/p/(\\d+)$", 1).cast("long"))
    val seqs = f.orderBy($"batch_id", $"fetch_ordinal")
      .select($"seed_id", $"post_id")
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    seqs.foreach { case (seed, posts) =>
      // strictly increasing post ids == strictly decreasing warc_ts == newest-first
      assert(posts == posts.sorted && posts.distinct == posts,
        s"$seed fetched out of timeline order: $posts")
      // prefix property: no gaps — page k fetched before k+1 and all ≤ max present
      assert(posts == (posts.head to posts.last),
        s"$seed has gaps: $posts")
    }
  }

  test("seen-set: first occurrence wins, no url fetched twice") {
    val dir = tmp()
    val eng = new CrawlEngine(spark, pagesDF, dir,
      CrawlConfig(defaultHostBudget = 4, shufflePartitions = 4))
    eng.initialize(seeds(6))
    eng.run(4)
    val f = eng.fetched().get
    assert(f.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
    // seen ⊇ fetched
    val notSeen = f.select("url_hash").distinct()
      .join(eng.seen().select("url_hash"), Seq("url_hash"), "left_anti").count()
    assert(notSeen == 0)
    // frontier ∩ seen = ∅
    val overlap = eng.frontier().join(eng.seen(), Seq("url_hash"), "left_semi").count()
    assert(overlap == 0)
  }

  test("bloom prefilter never drops a never-seen url (no false negatives)") {
    // direct property on the aggregate + broadcast probe (snapshot tier)
    val hashes = spark.range(0, 2000).select(xxhash64($"id").as("h"))
    val blobs = hashes.groupBy(pmod($"h", lit(4L)).as("shard"))
      .agg(BloomSeen.bloom_build($"h", 1000, 0.01).as("blob"))
      .collect().sortBy(_.getLong(0)).map(_.getAs[Array[Byte]]("blob"))
    assert(blobs.length == 4)
    val bc = spark.sparkContext.broadcast(blobs)
    val misses = hashes.withColumn("c", BloomSeen.bloom_probe(bc, Nil, $"h"))
      .filter(!$"c").count()
    assert(misses == 0, "bloom claimed a present element absent")
    // recent-tier probe: keys only in a delta blob are still found
    val extra = spark.range(5000, 5200).select(xxhash64($"id").as("h"))
    val delta = extra.groupBy(pmod($"h", lit(4L)).as("shard"))
      .agg(BloomSeen.bloom_build($"h", 256, 0.01).as("blob"))
      .collect().sortBy(_.getLong(0)).map(_.getAs[Array[Byte]]("blob"))
    val misses2 = extra.withColumn("c",
        BloomSeen.bloom_probe(bc, Seq(spark.sparkContext.broadcast(delta)), $"h"))
      .filter(!$"c").count()
    assert(misses2 == 0, "recent-tier delta blob not probed")
  }

  test("bloom_merge folds snapshot blobs + delta keys executor-side with no false negatives") {
    // snapshot tier: keys 0..2000; delta keys 5000..5400; fold = blob rows
    // (shard, blob, null) ∪ key rows (shard, null, key) grouped per shard —
    // exactly the compaction fold's shape
    val cap = 1000L
    val hashes = spark.range(0, 2000).select(xxhash64($"id").as("h"))
    val snap = hashes.groupBy(pmod($"h", lit(4L)).as("shard"))
      .agg(BloomSeen.bloom_build($"h", cap, 0.01).as("blob"))
      .select($"shard", $"blob", lit(null).cast("long").as("h"))
    val extra = spark.range(5000, 5400).select(xxhash64($"id").as("h"))
    val deltas = extra.select(pmod($"h", lit(4L)).as("shard"),
      lit(null).cast("binary").as("blob"), $"h")
    val folded = snap.unionByName(deltas).groupBy("shard")
      .agg(BloomSeen.bloom_merge($"blob", $"h", cap, 0.01).as("blob"))
      .collect().sortBy(_.getLong(0)).map(_.getAs[Array[Byte]]("blob"))
    assert(folded.length == 4)
    val bc2 = spark.sparkContext.broadcast(folded)
    val all = hashes.unionByName(extra)
    val misses = all.withColumn("c", BloomSeen.bloom_probe(bc2, Nil, $"h"))
      .filter(!$"c").count()
    assert(misses == 0, "folded filter dropped a key from either tier")
  }

  test("resume: kill after k batches == uninterrupted run (MERGE checkpoint)") {
    val dirA = tmp(); val dirB = tmp()
    val cfg = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4)
    val engA = new CrawlEngine(spark, pagesDF, dirA, cfg)
    engA.initialize(seeds(5)); engA.run(3)

    val engB1 = new CrawlEngine(spark, pagesDF, dirB, cfg)
    engB1.initialize(seeds(5)); engB1.run(1)
    // "kill": discard the engine; a new instance must resume from _COMMITTED
    val engB2 = new CrawlEngine(spark, pagesDF, dirB, cfg)
    assert(engB2.store.committedBatch == 0L)
    engB2.run(2)

    def key(e: CrawlEngine) = e.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(key(engA) == key(engB2), "seen sets diverge after resume")
    def fkey(e: CrawlEngine) = e.fetched().get
      .select("url_hash", "batch_id", "fetch_ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(fkey(engA) == fkey(engB2), "fetched lineage diverges after resume")
    def frkey(e: CrawlEngine) = e.frontier().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(frkey(engA) == frkey(engB2), "frontier diverges after resume")
  }

  test("resume: kill right after a rotation == uninterrupted rotate+run (r5)") {
    // rotateWindows commits as its own versioned batch (state ROTATED); a
    // kill on that boundary must resume into the SAME phase-2 schedule as
    // an uninterrupted engine — both arms on the same config, so a
    // systemic resume drift can't cancel out (unlike the head-vs-full
    // rotation test, where both arms resume).
    val dirA = tmp(); val dirB = tmp()
    val cfg = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4, maxDepth = 16)
    val newEnd = new java.sql.Timestamp(PagesGen.BaseTsMillis + 3600_000L)
    val engA = new CrawlEngine(spark, pagesDF, dirA, cfg)
    engA.initialize(seeds(5)); engA.run(2); engA.rotateWindows(newEnd); engA.run(2)

    val engB1 = new CrawlEngine(spark, pagesDF, dirB, cfg)
    engB1.initialize(seeds(5)); engB1.run(2); engB1.rotateWindows(newEnd)
    // "kill" on the rotation commit; the fresh instance resumes past it
    val engB2 = new CrawlEngine(spark, pagesDF, dirB, cfg)
    assert(engB2.store.committedBatch == 2L, "rotation batch must be the committed state")
    engB2.run(2)

    def fkey(e: CrawlEngine) = e.fetched().get
      .select("url_hash", "batch_id", "fetch_ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(fkey(engA) == fkey(engB2), "post-rotation fetched lineage diverges after resume")
    def key(e: CrawlEngine) = e.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(key(engA) == key(engB2), "seen sets diverge after rotation resume")
    def frkey(e: CrawlEngine) = e.frontier().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(frkey(engA) == frkey(engB2), "frontier diverges after rotation resume")
  }

  test("determinism across partitioning levels (local[8]-vs-local[32] analog)") {
    // Same input, different shuffle fan-out + salt: final sets must be identical
    // (FIXTURES.md §5.3 — order compared per host only, sets globally).
    val e1 = new CrawlEngine(spark, pagesDF, tmp(),
      CrawlConfig(defaultHostBudget = 3, shufflePartitions = 3, saltBuckets = 2))
    val e2 = new CrawlEngine(spark, pagesDF, tmp(),
      CrawlConfig(defaultHostBudget = 3, shufflePartitions = 13, saltBuckets = 8))
    e1.initialize(seeds(5)); e1.run(3)
    e2.initialize(seeds(5)); e2.run(3)
    def seenKey(e: CrawlEngine) = e.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(seenKey(e1) == seenKey(e2))
    def ordKey(e: CrawlEngine) = e.fetched().get
      .select("host", "batch_id", "fetch_ordinal", "url_hash")
      .collect().map(r => ((r.getString(0), r.getLong(1), r.getInt(2)), r.getLong(3)))
      .sortBy(_._1).map(_._2).toSeq
    assert(ordKey(e1) == ordKey(e2), "per-host fetch order depends on partitioning")
  }

  test("rankMode direct == narrow: identical fetched sets and per-host ordinals (r5)") {
    // The two rank plans (narrow projection + key join-back vs one wide
    // window) must be drop-in interchangeable — same window spec, same
    // budget filter, url_hash tiebreak. Budget 2 binds (both plans' filters
    // do real work) and sharded ranking covers the effBudget split path.
    def runWith(mode: String): CrawlEngine = {
      val e = new CrawlEngine(spark, pagesDF, tmp(),
        CrawlConfig(defaultHostBudget = 2, shufflePartitions = 5,
          saltBuckets = 4, shardedRanking = true, rankMode = mode))
      e.initialize(seeds(5)); e.run(3); e
    }
    val (en, ed) = (runWith("narrow"), runWith("direct"))
    def key(e: CrawlEngine) = e.fetched().get
      .select("host", "batch_id", "fetch_ordinal", "url_hash", "sched_delay_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    assert(key(en) == key(ed), "rank plans disagree")
    assert(en.frontier().count() == ed.frontier().count())
  }

  test("addsDedup agg == window: identical frontier rows and fetched sets (r5)") {
    // The min_by aggregate and the row_number window must pick the same
    // first-wins winner per url_hash (same ordering key: priority_ts DESC,
    // seed_id, url_canon). Compare the surviving frontier ROWS, not counts —
    // the dedup's output is exactly what lands in the frontier delta.
    def runWith(mode: String): CrawlEngine = {
      val e = new CrawlEngine(spark, pagesDF, tmp(),
        CrawlConfig(defaultHostBudget = 2, shufflePartitions = 5,
          saltBuckets = 4, shardedRanking = true, addsDedup = mode))
      e.initialize(seeds(5)); e.run(3); e
    }
    val (ea, ew) = (runWith("agg"), runWith("window"))
    def frontierKey(e: CrawlEngine) = e.frontier()
      .select("url_hash", "url", "url_canon", "host", "depth", "priority_ts",
        "seed_id", "discovered_batch")
      .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq
    assert(frontierKey(ea) == frontierKey(ew), "adds dedup plans disagree on the frontier")
    def fetchedKey(e: CrawlEngine) = e.fetched().get
      .select("host", "batch_id", "fetch_ordinal", "url_hash")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq
    assert(fetchedKey(ea) == fetchedKey(ew), "adds dedup plans disagree on fetches")
  }

  test("logCodec=zstd writes zstd state files and an identical crawl (r5)") {
    // the codec is a pure storage knob (CodecProbe measured the tradeoff);
    // it must change the file encoding and NOTHING else
    def runWith(codec: String): (CrawlEngine, String) = {
      val dir = tmp()
      val e = new CrawlEngine(spark, pagesDF, dir,
        CrawlConfig(defaultHostBudget = 2, shufflePartitions = 4, logCodec = codec))
      e.initialize(seeds(5)); e.run(2); (e, dir)
    }
    val ((es, _), (ez, zdir)) = (runWith("snappy"), runWith("zstd"))
    def key(e: CrawlEngine) = e.fetched().get
      .select("host", "batch_id", "fetch_ordinal", "url_hash")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sorted.toSeq
    assert(key(es) == key(ez), "codec changed crawl results")
    val parsedFiles = Files.walk(java.nio.file.Paths.get(zdir, "parsed"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .iterator().asScala.toSeq
    assert(parsedFiles.nonEmpty)
    assert(parsedFiles.forall(_.getFileName.toString.contains(".zstd.")),
      s"expected zstd-encoded parsed log, got ${parsedFiles.head.getFileName}")
  }

  test("robots gating: disallowed prefixes never fetched and leave the frontier") {
    val megaHost = "h0.example.test"
    val eng = new CrawlEngine(spark, pagesDF, tmp(),
      CrawlConfig(defaultHostBudget = 4, shufflePartitions = 4,
        robotsDisallow = Seq((megaHost, "/u/"))))
    eng.initialize(seeds(8))
    val ms = eng.run(3)
    val fetchedMega = eng.fetched().get.filter($"host" === megaHost).count()
    assert(fetchedMega == 0, "robots-disallowed host was fetched")
    assert(ms.map(_("robots_blocked")).sum > 0)
    // blocked urls must not linger in the frontier
    assert(eng.frontier().filter($"host" === megaHost).count() == 0)
  }

  test("robots Allow carve-out: longer allow overrides host disallow end-to-end (RFC 9309 §2.2.2)") {
    val h = "rb.example.test"
    val base = PagesGen.BaseTsMillis
    def mk(url: String, ts: Long, links: Seq[String]) = {
      val html = links.map(l => s"""<a href="$l">x</a>""").mkString + "body"
      Page(url, new java.sql.Timestamp(ts), html.getBytes("UTF-8"),
        TextExtract.extractText(html), "en")
    }
    def u(uid: Int, p: Int) = s"https://$h/u/$uid/p/$p"
    // user 1 (carved out) pages chain; p0 also cross-links to user 2 (blocked)
    val pages = Seq(
      mk(u(1, 0), base - 1000, Seq(u(1, 1), u(2, 1))),
      mk(u(1, 1), base - 2000, Seq(u(1, 2))),
      mk(u(1, 2), base - 3000, Nil),
      mk(u(2, 0), base - 1500, Seq(u(2, 1))),
      mk(u(2, 1), base - 2500, Nil)).toDF
    val eng = new CrawlEngine(spark, pages, tmp(),
      CrawlConfig(defaultHostBudget = 8, maxDepth = 8, shufflePartitions = 2,
        robotsDisallow = Seq((h, "/u/")),
        robotsAllow = Seq((h, "/u/1/"))))
    val since = new java.sql.Timestamp(base - 86400_000L)
    val end = new java.sql.Timestamp(base)
    eng.initialize(Seq(Seed("s1", u(1, 0), since, end), Seed("s2", u(2, 0), since, end)))
    val ms = eng.run(4)
    val fetched = eng.fetched().get
    assert(fetched.count() == 3, "exactly user 1's three pages fetch")
    assert(fetched.filter(!$"url_canon".startsWith(s"https://$h/u/1/")).count() == 0,
      "a url outside the Allow carve-out was fetched")
    // the blocked seed root was gated at candidate time (counted), and the
    // cross-link to user 2 was gated at discovery (never enters the frontier)
    assert(ms.map(_("robots_blocked")).sum == 1)
    assert(eng.frontier().count() == 0)
  }

  test("per-link-class expansion caps bind per page in page order (VERDICT r4 item 5)") {
    val a = "ca.example.test"; val b = "cb.example.test"
    val base = PagesGen.BaseTsMillis
    def mk(url: String, ts: Long, links: Seq[String]) = {
      val html = links.map(l => s"""<a href="$l">x</a>""").mkString + "body"
      Page(url, new java.sql.Timestamp(ts), html.getBytes("UTF-8"),
        TextExtract.extractText(html), "en")
    }
    def pa(i: Int) = s"https://$a/u/1/c/$i" // same-host ⇒ "paging" class
    def px(i: Int) = s"https://$b/x/$i"     // cross-host ⇒ "cross" class
    val root = s"https://$a/u/1/p/0"
    // root interleaves the classes — caps must pick each class's FIRST links
    // in page order, not a prefix of the mixed array
    val pages = (Seq(mk(root, base - 1000, Seq(pa(1), px(1), pa(2), pa(3), px(2)))) ++
      (1 to 3).map(i => mk(pa(i), base - 1000 - i * 100, Nil)) ++
      (1 to 2).map(i => mk(px(i), base - 5000 - i * 100, Nil))).toDF
    val since = new java.sql.Timestamp(base - 86400_000L)
    val end = new java.sql.Timestamp(base)
    def run(caps: Map[String, Int]): Seq[String] = {
      val eng = new CrawlEngine(spark, pages, tmp(),
        CrawlConfig(defaultHostBudget = 8, maxDepth = 4, shufflePartitions = 2,
          expansionCaps = caps))
      eng.initialize(Seq(Seed("s", root, since, end)))
      eng.run(3)
      eng.fetched().get.select("url_canon").collect().map(_.getString(0)).sorted.toSeq
    }
    assert(run(Map.empty).size == 6, "premise: uncapped crawl reaches all 6 pages")
    // comment-cap 2 + repost-cap 1 analog: first 2 paging + first 1 cross
    assert(run(Map("paging" -> 2, "cross" -> 1)) ==
      Seq(root, pa(1), pa(2), px(1)).sorted)
    // cap 0 disables a class outright (the download_repost=0 analog)
    assert(run(Map("cross" -> 0)) == Seq(root, pa(1), pa(2), pa(3)).sorted)
    // an uncapped class is unlimited when only the other is capped
    assert(run(Map("cross" -> 1)) == Seq(root, pa(1), pa(2), pa(3), px(1)).sorted)
  }

  test("robots wildcard rules gate the crawl end-to-end (RFC 9309 §2.2.3)") {
    val h = "rw.example.test"
    val base = PagesGen.BaseTsMillis
    def mk(url: String, ts: Long, links: Seq[String]) = {
      val html = links.map(l => s"""<a href="$l">x</a>""").mkString + "body"
      Page(url, new java.sql.Timestamp(ts), html.getBytes("UTF-8"),
        TextExtract.extractText(html), "en")
    }
    def u(uid: Int, p: Int) = s"https://$h/u/$uid/p/$p"
    // disallow /u/*/p/1 (wildcard over the uid segment): p0 and p2 crawl,
    // every p1 is blocked for BOTH users — paging continues through links
    // found on p0 (p0 links p1 AND p2 directly here)
    val pages = Seq(
      mk(u(1, 0), base - 1000, Seq(u(1, 1), u(1, 2))),
      mk(u(1, 1), base - 2000, Nil),
      mk(u(1, 2), base - 3000, Nil),
      mk(u(2, 0), base - 1500, Seq(u(2, 1))),
      mk(u(2, 1), base - 2500, Nil)).toDF
    val eng = new CrawlEngine(spark, pages, tmp(),
      CrawlConfig(defaultHostBudget = 8, maxDepth = 8, shufflePartitions = 2,
        robotsDisallow = Seq((h, "/u/*/p/1$"))))
    val since = new java.sql.Timestamp(base - 86400_000L)
    val end = new java.sql.Timestamp(base)
    eng.initialize(Seq(Seed("s1", u(1, 0), since, end), Seed("s2", u(2, 0), since, end)))
    eng.run(4)
    val fetched = eng.fetched().get.select("url_canon").collect().map(_.getString(0)).toSet
    assert(fetched == Set(u(1, 0), u(1, 2), u(2, 0)),
      s"wildcard rule mis-gated: $fetched")
  }

  test("pre-canonicalized corpus (bucketed-table contract): crawl results identical to computed-canon path") {
    import graft.functions.gf
    val pagesCanon = pagesDF.withColumn("url_canon", gf.canonicalize_url($"url"))
    val cfg = CrawlConfig(defaultHostBudget = 4, shufflePartitions = 4)
    val a = new CrawlEngine(spark, pagesCanon, tmp(), cfg)
    val b = new CrawlEngine(spark, pagesDF, tmp(), cfg)
    a.initialize(seeds(6)); b.initialize(seeds(6))
    a.run(3); b.run(3)
    def k(e: CrawlEngine) = e.fetched().get.select("url_hash", "batch_id", "fetch_ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(k(a) == k(b), "pre-canonicalized corpus diverged from the computed-canon path")
    assert(a.seen().count() == b.seen().count())
  }

  test("seed window: since_ts in the future fetches nothing for that seed (weibo.py:2735-2737)") {
    val future = new java.sql.Timestamp(PagesGen.BaseTsMillis + 86400_000L)
    val farFuture = new java.sql.Timestamp(PagesGen.BaseTsMillis + 2 * 86400_000L)
    val s0 = seeds(2)
    val withFuture = s0 :+ Seed("seedF", PagesGen.urlOf(3, 0, N), future, farFuture)
    val eng = new CrawlEngine(spark, pagesDF, tmp(), CrawlConfig(shufflePartitions = 4))
    eng.initialize(withFuture)
    eng.run(2)
    assert(eng.fetched().get.filter($"seed_id" === "seedF").count() == 0)
  }

  test("stop command halts the run and writes a STOPPED ledger row (service.py:1419-1432)") {
    val eng = new CrawlEngine(spark, pagesDF, tmp(), CrawlConfig(shufflePartitions = 4))
    eng.initialize(seeds(3))
    eng.run(1)
    eng.requestStop()
    val more = eng.run(5)
    assert(more.isEmpty)
    val states = eng.store.readLog("ledger", Long.MaxValue).get
      .select("state").collect().map(_.getString(0)).toSet
    assert(states.contains("STOPPED"))
    eng.clearStop()
  }

  test("notifier: health anomalies alert once per condition (U6, weibo.py:436-450)") {
    // invariant violation: a corpus row whose text column lies about its html
    val base = PagesGen.BaseTsMillis
    val badHtml = "<b>real text</b>"
    val liar = Seq(Page("https://hn.example.test/u/0/p/0",
      new java.sql.Timestamp(base - 3600_000L), badHtml.getBytes("UTF-8"),
      "a different text entirely", "en")).toDF
    val n1 = new CapturingNotifier
    val e1 = new CrawlEngine(spark, liar, tmp(), CrawlConfig(shufflePartitions = 2), n1)
    e1.initialize(Seq(Seed("s", "https://hn.example.test/u/0/p/0",
      new java.sql.Timestamp(base - 86400_000L), new java.sql.Timestamp(base))))
    e1.run(3)
    assert(n1.messages.count(_.contains("invariant")) == 1,
      s"expected exactly one invariant alert, got ${n1.messages}")

    // cookie-invalid analog: EVERY scheduled fetch missing from the corpus
    val n2 = new CapturingNotifier
    val empty = Seq.empty[Page].toDF
    val e2 = new CrawlEngine(spark, empty, tmp(), CrawlConfig(shufflePartitions = 2), n2)
    e2.initialize(seeds(3))
    e2.run(3)
    assert(n2.messages.count(_.contains("missing from the corpus")) == 1)

    // stop command alerts too
    val n3 = new CapturingNotifier
    val e3 = new CrawlEngine(spark, pagesDF, tmp(), CrawlConfig(shufflePartitions = 4), n3)
    e3.initialize(seeds(2))
    e3.run(1)
    e3.requestStop(); e3.run(2); e3.clearStop()
    assert(n3.messages.exists(_.contains("stopped")))
  }

  test("typed Dataset views: frontierTyped/seenTyped mirror the DataFrame state") {
    val eng = new CrawlEngine(spark, pagesDF, tmp(), CrawlConfig(shufflePartitions = 4))
    eng.initialize(seeds(4))
    eng.run(2)
    val fe: Seq[FrontierEntry] = eng.frontierTyped().collect().toSeq
    assert(fe.size.toLong == eng.frontier().count())
    assert(fe.forall(e => e.url_hash != 0L && e.host.nonEmpty && e.depth >= 0))
    val se: Seq[SeenEntry] = eng.seenTyped().collect().toSeq
    assert(se.size.toLong == eng.seen().count())
    assert(se.forall(_.first_batch >= 0L))
  }

  test("ledger carries per-batch lineage metrics") {
    val eng = new CrawlEngine(spark, pagesDF, tmp(), CrawlConfig(shufflePartitions = 4))
    eng.initialize(seeds(4))
    eng.run(2)
    val led = eng.ledger().get.orderBy("batch_id").collect()
    assert(led.length == 2)
    val cols = eng.ledger().get.columns.toSet
    assert(Set("batch_id", "state", "candidates", "scheduled", "fetched",
      "invariant_violations", "frontier_size", "seen_size", "partitions_used").subsetOf(cols))
    assert(led.forall(_.getAs[String]("state") == "SUCCESS"))
    assert(led.forall(_.getAs[Long]("invariant_violations") == 0L))
    // arithmetic seen_size bookkeeping must equal the actual table
    assert(led.last.getAs[Long]("seen_size") == eng.seen().count())
  }
}

/** robots.txt parsing (north rule gating input). */
class RobotsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.crawl.Robots
  val txt =
    """# comment
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp
      |Disallow:
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /graft-only/
      |
      |User-agent: evilbot
      |Disallow: /
      |""".stripMargin

  test("wildcard group rules extracted; empty disallow dropped") {
    assert(Robots.disallowPrefixes(txt) == Seq("/private/", "/tmp"))
  }
  test("named agent gets its group (multi-agent group) plus nothing from others") {
    assert(Robots.disallowPrefixes(txt, "graftbot") == Seq("/private/", "/tmp", "/graft-only/"))
    assert(Robots.disallowPrefixes(txt, "otherbot") == Seq("/private/", "/tmp", "/graft-only/"))
    assert(Robots.disallowPrefixes(txt, "evilbot") == Seq("/private/", "/tmp", "/"))
  }
  test("toRules builds engine gating rows") {
    assert(Robots.toRules(Seq(("h0.example.test", "User-agent: *\nDisallow: /u/"))) ==
      Seq(("h0.example.test", "/u/")))
  }

  val txtAllow =
    """User-agent: *
      |Disallow: /u/
      |Allow: /u/pub/
      |Allow: /open
      |Disallow: /open
      |Allow:
      |""".stripMargin

  test("Allow rules parsed alongside Disallow; empty Allow dropped (RFC 9309)") {
    assert(Robots.rules(txtAllow) ==
      Seq(("/u/", false), ("/u/pub/", true), ("/open", true), ("/open", false)))
    assert(Robots.disallowPrefixes(txtAllow) == Seq("/u/", "/open"))
  }

  test("longest-match precedence: longer allow overrides disallow; allow wins equal-length tie (RFC 9309 §2.2.2)") {
    val rs = Robots.rules(txtAllow)
    assert(!Robots.isAllowed(rs, "/u/x"), "disallow prefix must block")
    assert(Robots.isAllowed(rs, "/u/pub/x"), "longer Allow carve-out must override /u/ disallow")
    assert(Robots.isAllowed(rs, "/open/x"), "equal-length allow/disallow tie goes to allow")
    assert(Robots.isAllowed(rs, "/other"), "unmatched path is allowed")
    // longest DISALLOW also overrides a shorter allow
    val rs2 = Seq(("/a/", true), ("/a/secret/", false))
    assert(Robots.isAllowed(rs2, "/a/x") && !Robots.isAllowed(rs2, "/a/secret/x"))
  }

  test("toRulePair splits per-host rule rows for CrawlConfig") {
    val (dis, allow) = Robots.toRulePair(Seq(("h.test", txtAllow)))
    assert(dis == Seq(("h.test", "/u/"), ("h.test", "/open")))
    assert(allow == Seq(("h.test", "/u/pub/"), ("h.test", "/open")))
  }

  test("wildcard * and end-anchor $ rules (RFC 9309 §2.2.3)") {
    // * matches any sequence
    val rs1 = Seq(("/u/*/secret", false))
    assert(!Robots.isAllowed(rs1, "/u/1/secret"))
    assert(!Robots.isAllowed(rs1, "/u/a/b/secret-file"))
    assert(Robots.isAllowed(rs1, "/u/1/open"))
    // trailing $ anchors the end
    val rs2 = Seq(("/*.pdf$", false))
    assert(!Robots.isAllowed(rs2, "/doc/x.pdf"))
    assert(Robots.isAllowed(rs2, "/doc/x.pdf.html"))
    // literal regex metacharacters in rules stay literal
    val rs3 = Seq(("/a+b(c)", false))
    assert(!Robots.isAllowed(rs3, "/a+b(c)/d"))
    assert(Robots.isAllowed(rs3, "/aab(c)"))
    // wildcard precedence by rule octet length: longer allow carve-out wins
    val rs4 = Seq(("/dl/*", false), ("/dl/*/free/", true))
    assert(!Robots.isAllowed(rs4, "/dl/x/paid/f"))
    assert(Robots.isAllowed(rs4, "/dl/x/free/f"))
  }

  test("rule paths percent-normalize like URLs (RFC 9309 §2.2.2 encoding-insensitive compare)") {
    // a rule spelled with an encoded unreserved char must match the
    // canonicalized (decoded) path — and vice versa
    assert(!Robots.isAllowed(Seq(("/%7Eadmin/", false)), "/~admin/x"))
    assert(!Robots.isAllowed(Seq(("/~admin/", false)), "/%7Eadmin/x"))
    // reserved encodings: hex case folds, the encoding itself is preserved
    assert(!Robots.isAllowed(Seq(("/a%2fb", false)), "/a%2Fb/x"))
    assert(Robots.isAllowed(Seq(("/a%2Fb", false)), "/a/b/x"),
      "an encoded slash rule must NOT match a literal slash path")
  }

  test("Crawl-delay parses per agent group: seconds (fractional ok), last wins, malformed ignored (VERDICT r4)") {
    val txt =
      """User-agent: *
        |Crawl-delay: 2
        |Disallow: /private/
        |
        |User-agent: fastbot
        |Crawl-delay: 0.5
        |
        |User-agent: brokenbot
        |Crawl-delay: soon
        |""".stripMargin
    assert(Robots.crawlDelayMs(txt) == Some(2000L))
    // fastbot sees the * group's 2s then its own 0.5s — last valid wins
    assert(Robots.crawlDelayMs(txt, "fastbot") == Some(500L))
    assert(Robots.crawlDelayMs(txt, "brokenbot") == Some(2000L),
      "a malformed agent-specific value must fall back to the * group's valid one")
    assert(Robots.crawlDelayMs("User-agent: *\nDisallow: /x") == None)
    // repeated directives in one group: last wins
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: 5\nCrawl-delay: 7") == Some(7000L))
    // last VALID wins (ADVICE r5): a parseable-but-invalid trailing value
    // (negative / infinite) must not silently discard an earlier valid one
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: 2\nCrawl-delay: -1") == Some(2000L))
    assert(Robots.crawlDelayMs("User-agent: *\nCrawl-delay: 3\nCrawl-delay: Infinity") == Some(3000L))
    assert(Robots.toDelays(Seq(("a.test", txt), ("b.test", "User-agent: *\nDisallow: /"))) ==
      Map("a.test" -> 2000L))
    // configure() folds gating + delay into a CrawlConfig in one call
    val cfg = Robots.configure(CrawlConfig(defaultDelayMs = 9999L), Seq(("a.test", txt)))
    assert(cfg.perHostDelayMs == Map("a.test" -> 2000L))
    assert(cfg.robotsDisallow == Seq(("a.test", "/private/")))
  }

  test("compiled rule sets evaluate identically to the one-shot path (ADVICE r4)") {
    val rs = Seq(("/u/", false), ("/u/pub/", true), ("/*.pdf$", false), ("/%7Ea/", false))
    val c = Robots.compile(rs)
    for (p <- Seq("/u/x", "/u/pub/x", "/doc/x.pdf", "/doc/x.pdf?y", "/~a/z", "/open"))
      assert(c.isAllowed(p) == Robots.isAllowed(rs, p), s"compiled diverged on $p")
  }

  test("rules match PATH?QUERY: $ anchors stop at queries; wildcard rules can target queries") {
    // RFC 9309 matches against path + optional query
    assert(!Robots.isAllowed(Seq(("/p$", false)), "/p"))
    assert(Robots.isAllowed(Seq(("/p$", false)), "/p?q=1"),
      "a \\$-anchored rule must not match a url that continues with a query")
    assert(!Robots.isAllowed(Seq(("/*?sessionid=", false)), "/x/y?sessionid=9"))
    assert(Robots.isAllowed(Seq(("/*?sessionid=", false)), "/x/y?sid=9"))
  }
}

/** Crash-resilience + skew-path determinism. */
class CrawlResilienceSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.crawl._
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_res").toString
  val N = 512L
  lazy val pagesDF = PagesGen.pages(spark, N, partitions = 4).toDF
  def seeds(k: Int) = PagesGen.seedRows(N, k).map(Seed.tupled)

  test("orphan uncommitted version from a crashed batch is invisible and overwritten on retry") {
    val dir = tmp()
    // compactEvery=1 ⇒ every batch also writes a base snapshot, so the crash
    // leaves BOTH orphan deltas and an orphan base — the retry must overwrite
    // all of them (a crashed compaction replays deterministically)
    val cfg = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4, compactEvery = 1)
    val eng = new CrawlEngine(spark, pagesDF, dir, cfg)
    eng.initialize(seeds(4)); eng.run(1)
    // simulate a crash mid-batch-1: partial garbage deltas + base at batch 1,
    // pointer still 0
    val garbage = eng.frontier().limit(1)
    eng.store.writeDeltaAdds("frontier", 1L, garbage)
    eng.store.writeDeltaDels("frontier", 1L, eng.frontier().limit(3).select("url_hash"))
    eng.store.writeBase("seen", 1L, eng.seen().limit(0))
    eng.store.appendLog("parsed", 1L, eng.fetched().get.limit(1))
    assert(eng.store.committedBatch == 0L)
    // reader sees only committed state
    assert(eng.frontier().count() > 1)
    // retry (fresh engine = fresh process) overwrites the orphans exactly
    val eng2 = new CrawlEngine(spark, pagesDF, dir, cfg)
    eng2.run(1)
    assert(eng2.store.committedBatch == 1L)
    // reference run without the crash must match
    val dirB = tmp()
    val ref = new CrawlEngine(spark, pagesDF, dirB, cfg)
    ref.initialize(seeds(4)); ref.run(2)
    def k(e: CrawlEngine) = e.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(k(eng2) == k(ref))
    def f(e: CrawlEngine) = e.fetched().get.select("url_hash", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(f(eng2) == f(ref), "retry after crash diverges from clean run")
  }

  test("sharded ranking (mega-host skew path): deterministic, budget-split per shard") {
    val cfg = CrawlConfig(defaultHostBudget = 8, saltBuckets = 4,
      shufflePartitions = 4, shardedRanking = true)
    val e1 = new CrawlEngine(spark, pagesDF, tmp(), cfg)
    val e2 = new CrawlEngine(spark, pagesDF, tmp(), cfg.copy(shufflePartitions = 7))
    e1.initialize(seeds(6)); e1.run(3)
    e2.initialize(seeds(6)); e2.run(3)
    def k(e: CrawlEngine) = e.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(k(e1) == k(e2), "sharded ranking not partitioning-deterministic")
    // per (host, salt-shard) budget = ceil(8/4) = 2
    val over = e1.fetched().get
      .withColumn("shard", pmod(col("url_hash"), lit(4)))
      .groupBy("host", "shard", "batch_id").count()
      .filter(col("count") > 2).count()
    assert(over == 0, "per-shard budget exceeded")
  }
}

/** Per-host head table — sublinear scheduling (VERDICT r3 item 3): batches
  * rank a bounded top-K-per-host head instead of scanning the full frontier,
  * with results EXACTLY equal to full-frontier scheduling. */
class HeadTableSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.crawl._
  import graft.functions.gf
  import spark.implicits._
  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_head").toString

  val N = 2048L
  lazy val pagesDF = PagesGen.pages(spark, N, partitions = 4).toDF.persist()

  /** Bench-style preloaded frontier: every page is already a frontier row
    * (the 10^10-frontier model), so scheduling cost is frontier-dominated. */
  private def preload = {
    val wideSince = new java.sql.Timestamp(0L)
    val wideEnd = new java.sql.Timestamp(PagesGen.BaseTsMillis + 86400000L)
    pagesDF.select($"url",
      gf.canonicalize_url($"url").as("url_canon"),
      xxhash64(gf.canonicalize_url($"url")).as("url_hash"),
      gf.url_host($"url").as("host"),
      lit(0).as("depth"),
      $"warc_ts".as("priority_ts"),
      lit("pre").as("seed_id"),
      lit(wideSince).as("since_ts"),
      lit(wideEnd).as("end_ts"),
      lit(-1L).as("discovered_batch"))
  }

  private def fetchKey(e: CrawlEngine) = e.fetched().get
    .select("url_hash", "batch_id", "fetch_ordinal")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
  private def seenKey(e: CrawlEngine) =
    e.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
  private def frontKey(e: CrawlEngine) =
    e.frontier().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq

  test("scheduling from the head == scheduling from the full frontier (order + ordinals exact)") {
    val cfgBase = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4,
      maxDepth = 8, compactEvery = 3, bloomMinSeen = 1)
    val a = new CrawlEngine(spark, pagesDF, tmp(), cfgBase.copy(headTable = true))
    val b = new CrawlEngine(spark, pagesDF, tmp(), cfgBase)
    a.initializeWithFrontier(preload); b.initializeWithFrontier(preload)
    val msA = a.run(7); val msB = b.run(7)
    assert(msA.map(_("scheduled")) == msB.map(_("scheduled")))
    assert(fetchKey(a) == fetchKey(b), "head-table scheduling diverged from full-frontier scheduling")
    assert(seenKey(a) == seenKey(b))
    assert(frontKey(a) == frontKey(b))
  }

  test("scheduling reads are bounded by budgets: head rows <= hosts × budget × (compactEvery+1), not O(|frontier|)") {
    val C = 3
    val budget = 3
    val dir = tmp()
    val eng = new CrawlEngine(spark, pagesDF, dir,
      CrawlConfig(defaultHostBudget = budget, shufflePartitions = 4,
        maxDepth = 8, compactEvery = C, bloomMinSeen = 1, headTable = true))
    eng.initializeWithFrontier(preload)
    val nHosts = PagesGen.numHosts(N)
    val bound = nHosts * budget * (C + 1)
    // the live in-memory head (the rank stage's scan input) is bounded after
    // EVERY batch — the r5 head is never persisted, so the hook counts it
    (1 to 5).foreach { i =>
      eng.runBatch()
      val rows = eng.headRows
      assert(rows >= 0, s"batch $i: no live head")
      assert(rows <= bound,
        s"batch $i: head has $rows rows — exceeds the Σ budgets bound $bound")
    }
    val frontierRows = eng.frontier().count()
    assert(frontierRows > 1000, s"test premise: a big frontier (got $frontierRows)")
    assert(eng.headRows <= bound && frontierRows > bound,
      "premise: the head bound must be genuinely smaller than the frontier")
  }

  test("sharded ranking variant: head == full under (host, salt) politeness shards") {
    val cfgBase = CrawlConfig(defaultHostBudget = 8, saltBuckets = 4,
      shufflePartitions = 4, maxDepth = 8, compactEvery = 3,
      bloomMinSeen = 1, shardedRanking = true)
    val a = new CrawlEngine(spark, pagesDF, tmp(), cfgBase.copy(headTable = true))
    val b = new CrawlEngine(spark, pagesDF, tmp(), cfgBase)
    a.initializeWithFrontier(preload); b.initializeWithFrontier(preload)
    a.run(5); b.run(5)
    assert(fetchKey(a) == fetchKey(b), "sharded head scheduling diverged")
    assert(frontKey(a) == frontKey(b))
  }

  test("rule change over pre-existing frontier: purgeRobotsBlocked restores head/full parity in one batch") {
    val mega = "h0.example.test"
    val cfgBase = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4,
      maxDepth = 8, compactEvery = 3, bloomMinSeen = 1,
      robotsDisallow = Seq((mega, "/u/")), robotsAllow = Seq((mega, "/u/1/")))
    val a = new CrawlEngine(spark, pagesDF, tmp(), cfgBase.copy(headTable = true))
    val b = new CrawlEngine(spark, pagesDF, tmp(), cfgBase)
    // preloaded frontier rows the new rules block (the rule-change scenario)
    a.initializeWithFrontier(preload); b.initializeWithFrontier(preload)
    val pa = a.purgeRobotsBlocked(); val pb = b.purgeRobotsBlocked()
    assert(pa > 0 && pa == pb, s"purge must drop the same blocked set ($pa vs $pb)")
    val msA = a.run(6); val msB = b.run(6)
    // steady state after the purge: no residual blocked candidates
    assert(msA.map(_("robots_blocked")).sum == 0)
    assert(msA.map(_("robots_blocked")) == msB.map(_("robots_blocked")))
    assert(fetchKey(a) == fetchKey(b), "head scheduling diverged after a robots purge")
    assert(frontKey(a) == frontKey(b))
    assert(seenKey(a) == seenKey(b))
    // the purge is idempotent
    assert(a.purgeRobotsBlocked() == 0L)
  }

  test("without the purge, head candidate gating still never fetches a blocked url (defense in depth)") {
    val mega = "h0.example.test"
    val eng = new CrawlEngine(spark, pagesDF, tmp(),
      CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4,
        maxDepth = 8, compactEvery = 3, bloomMinSeen = 1, headTable = true,
        robotsDisallow = Seq((mega, "/u/")), robotsAllow = Seq((mega, "/u/1/"))))
    eng.initializeWithFrontier(preload)
    val ms = eng.run(3)
    assert(ms.map(_("robots_blocked")).sum > 0, "head gating should purge incrementally")
    val badFetch = eng.fetched().get
      .filter($"host" === mega && !$"url_canon".startsWith(s"https://$mega/u/1/")).count()
    assert(badFetch == 0, "a blocked url was fetched")
  }

  test("rotation rebuilds the head; resume picks it up (crawl-grown frontier)") {
    def seeds(k: Int) = PagesGen.seedRows(N, k).map(Seed.tupled)
    val cfgBase = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4,
      maxDepth = 16, compactEvery = 3, bloomMinSeen = 1)
    val dirA = tmp(); val dirB = tmp()
    val a = new CrawlEngine(spark, pagesDF, dirA, cfgBase.copy(headTable = true))
    val b = new CrawlEngine(spark, pagesDF, dirB, cfgBase)
    a.initialize(seeds(6)); b.initialize(seeds(6))
    a.run(3); b.run(3)
    val newEnd = new java.sql.Timestamp(PagesGen.BaseTsMillis + 3600_000L)
    a.rotateWindows(newEnd); b.rotateWindows(newEnd)
    // resume in fresh engines (the in-memory head rebuilds from the frontier)
    val a2 = new CrawlEngine(spark, pagesDF, dirA, cfgBase.copy(headTable = true))
    val b2 = new CrawlEngine(spark, pagesDF, dirB, cfgBase)
    a2.run(3); b2.run(3)
    assert(fetchKey(a2) == fetchKey(b2), "post-rotation head scheduling diverged")
    assert(seenKey(a2) == seenKey(b2))
    assert(frontKey(a2) == frontKey(b2))
  }
}

/** Wall-clock politeness pacing (VERDICT r3 item 2: the one stage a real
  * crawl always runs had zero coverage). The reference's behavioral contract
  * is its inter-fetch sleep cadence (weibo.py:2769-2778); here the contract
  * is per-(host, salt-shard) inter-fetch spacing >= the delay budget, with
  * the actual fetch time stamped into paced_at_ms lineage. */
class PacingSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.crawl._
  import spark.implicits._
  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_pace").toString
  private def emptyPages = Seq.empty[Page].toDF

  test("pace(): per-host inter-fetch spacing >= delay budget; hosts run in parallel shards") {
    val delay = 200L
    val eng = new CrawlEngine(spark, emptyPages, tmp(),
      CrawlConfig(defaultDelayMs = delay, saltBuckets = 1, shufflePartitions = 2,
        realTimePacing = true))
    val rows = for (h <- Seq("a.test", "b.test"); o <- 1 to 4)
      yield (s"https://$h/p/$o", h, h.hashCode.toLong * 7 + o, o, Option.empty[Long])
    val df = rows.toDF("url_canon", "host", "url_hash", "fetch_ordinal", "paced_at_ms")
      // distributed source: a local relation would be constant-folded
      .repartition(2)
    val out = eng.pace(df)
      .select($"host", $"fetch_ordinal", $"paced_at_ms").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 8 && out.forall(_._3 > 0), "every row must carry a fetch stamp")
    out.groupBy(_._1).foreach { case (host, rs) =>
      val byOrd = rs.sortBy(_._2)
      // stamps follow ordinal order (newest-first schedule preserved)
      assert(byOrd.map(_._3).toSeq == rs.map(_._3).sorted.toSeq,
        s"$host stamps out of ordinal order")
      val diffs = byOrd.map(_._3).sliding(2).map(p => p(1) - p(0)).toSeq
      assert(diffs.forall(_ >= delay - 5),
        s"$host inter-fetch spacing violated the $delay ms budget: $diffs")
    }
  }

  test("pace(): residual-delay bookkeeping across host boundaries within one shard") {
    // two hosts sorted into ONE partition: spacing applies within each host's
    // contiguous run, not across the boundary (the next host starts fresh)
    val delay = 300L
    val eng = new CrawlEngine(spark, emptyPages, tmp(),
      CrawlConfig(defaultDelayMs = delay, saltBuckets = 1, shufflePartitions = 1,
        realTimePacing = true))
    val rows = for (h <- Seq("a.test", "b.test"); o <- 1 to 2)
      yield (s"https://$h/p/$o", h, h.hashCode.toLong * 7 + o, o, Option.empty[Long])
    val t0 = System.currentTimeMillis()
    val out = eng.pace(rows.toDF("url_canon", "host", "url_hash", "fetch_ordinal", "paced_at_ms")
        .repartition(1))
      .select($"host", $"fetch_ordinal", $"paced_at_ms").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val wall = System.currentTimeMillis() - t0
    out.groupBy(_._1).foreach { case (host, rs) =>
      val byOrd = rs.sortBy(_._2).map(_._3)
      assert(byOrd(1) - byOrd(0) >= delay - 5, s"$host spacing violated")
    }
    // 2 sleeps (one per host's second fetch) are required; 3+ would mean the
    // boundary wrongly inherited the previous host's residual delay
    assert(wall >= 2 * delay - 10, s"expected >= ${2 * delay} ms of sleeps, got $wall")
  }

  test("robots-derived Crawl-delay paces each host at ITS delay (VERDICT r4 item 4)") {
    val slowTxt = "User-agent: *\nCrawl-delay: 0.4"
    val cfg = Robots.configure(
      CrawlConfig(defaultDelayMs = 60L, saltBuckets = 1, shufflePartitions = 1,
        realTimePacing = true),
      Seq(("slow.test", slowTxt))) // fast.test declares nothing → default 60ms
    assert(cfg.perHostDelayMs == Map("slow.test" -> 400L))
    val eng = new CrawlEngine(spark, emptyPages, tmp(), cfg)
    val rows = for (h <- Seq("slow.test", "fast.test"); o <- 1 to 3)
      yield (s"https://$h/p/$o", h, h.hashCode.toLong * 7 + o, o, Option.empty[Long])
    val out = eng.pace(rows.toDF("url_canon", "host", "url_hash", "fetch_ordinal", "paced_at_ms")
        .repartition(1))
      .select($"host", $"fetch_ordinal", $"paced_at_ms").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    def spacings(h: String) = out.filter(_._1 == h).sortBy(_._2).map(_._3)
      .sliding(2).map(p => p(1) - p(0)).toSeq
    assert(spacings("slow.test").forall(_ >= 400 - 5),
      s"slow.test must pace at its robots delay: ${spacings("slow.test")}")
    assert(spacings("fast.test").forall(_ >= 60 - 5),
      s"fast.test must pace at the default delay: ${spacings("fast.test")}")
    // the fast host must NOT inherit the slow host's budget: its two gaps at
    // 400ms each would alone take >= 800ms — assert well under that
    assert(spacings("fast.test").sum < 700,
      s"fast.test was paced at the slow host's delay: ${spacings("fast.test")}")
  }

  test("e2e: realTimePacing batch matches unpaced results exactly and honors the budget") {
    val N = 512L
    val pagesDF = PagesGen.pages(spark, N, partitions = 4).toDF
    def seeds(k: Int) = PagesGen.seedRows(N, k).map(Seed.tupled)
    val delay = 150L
    val cfgBase = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4,
      saltBuckets = 1, defaultDelayMs = delay)
    val paced = new CrawlEngine(spark, pagesDF, tmp(), cfgBase.copy(realTimePacing = true))
    val plain = new CrawlEngine(spark, pagesDF, tmp(), cfgBase)
    paced.initialize(seeds(6)); plain.initialize(seeds(6))
    val t0 = System.nanoTime()
    paced.runBatch()
    val pacedSec = (System.nanoTime() - t0) / 1e9
    plain.runBatch()
    // identical crawl results — pacing is a wall-clock effect, not a data one
    def key(e: CrawlEngine) =
      e.fetched().get.select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(key(paced) == key(plain), "pacing changed the crawl's data results")
    // spacing evidence from the parsed-log lineage stamps
    val stamps = paced.store.readLog("parsed", 0L).get
      .filter($"found")
      .select($"host", $"fetch_ordinal", $"paced_at_ms").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(stamps.nonEmpty && stamps.forall(_._3 > 0))
    stamps.groupBy(_._1).foreach { case (host, rs) =>
      val diffs = rs.sortBy(_._2).map(_._3).sliding(2).filter(_.length == 2)
        .map(p => p(1) - p(0)).toSeq
      assert(diffs.forall(_ >= delay - 5), s"$host spacing violated: $diffs")
    }
    // a host fetched 3 pages ⇒ >= 2 enforced delays of wall time
    val maxFetches = stamps.groupBy(_._1).values.map(_.size).max
    assert(pacedSec * 1000 >= (maxFetches - 1) * delay - 10,
      f"paced batch finished in $pacedSec%.2f s — sleeps cannot have run")
    // unpaced batches carry a null stamp (schema stable either way)
    assert(plain.store.readLog("parsed", 0L).get.filter($"paced_at_ms".isNotNull).count() == 0)
  }
}

/** Round-2 scale properties (VERDICT r1 items 1-2): per-batch state writes
  * are O(batch) — never a rewrite of the full seen/frontier — and the bloom
  * prefilter is maintained incrementally (one full build, then per-batch
  * inserts; resume loads the persisted snapshot + replays deltas). */
class IncrementalStateSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.crawl._
  import spark.implicits._
  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_inc").toString
  val N = 512L
  lazy val pagesDF = PagesGen.pages(spark, N, partitions = 4).toDF
  def seeds(k: Int) = PagesGen.seedRows(N, k).map(Seed.tupled)

  test("state writes per batch are O(batch): delta rows == batch work, no base rewrite between compactions") {
    val dir = tmp()
    val eng = new CrawlEngine(spark, pagesDF, dir,
      CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4, compactEvery = 8))
    eng.initialize(seeds(6))
    val ms = eng.run(4)
    ms.foreach { m =>
      val b = m("batch_id")
      val seenAdds = spark.read.parquet(s"$dir/seen/delta_add/batch=$b").count()
      assert(seenAdds == m("scheduled") + m("robots_blocked"),
        s"batch $b wrote $seenAdds seen rows — state writes must be O(batch), not O(|seen|)")
    }
    // 4 batches below compactEvery: only the initial base exists — the full
    // state was never rewritten
    assert(new java.io.File(s"$dir/seen/base").list().toSeq == Seq("v=-1"))
    assert(new java.io.File(s"$dir/frontier/base").list().toSeq == Seq("v=-1"))
    // arithmetic size maintenance stays exact against the real views
    assert(ms.last("seen_size") == eng.seen().count())
    assert(ms.last("frontier_size") == eng.frontier().count())
  }

  test("compaction folds deltas: views identical with and without it") {
    val dirA = tmp(); val dirB = tmp()
    val cfgNo = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4, compactEvery = 0)
    val a = new CrawlEngine(spark, pagesDF, dirA, cfgNo); a.initialize(seeds(5)); a.run(5)
    val b = new CrawlEngine(spark, pagesDF, dirB, cfgNo.copy(compactEvery = 2))
    b.initialize(seeds(5)); b.run(5)
    def k(e: CrawlEngine) = e.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    def fr(e: CrawlEngine) = e.frontier().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    assert(k(a) == k(b), "seen view diverges under compaction")
    assert(fr(a) == fr(b), "frontier view diverges under compaction")
    assert(new java.io.File(s"$dirB/seen/base").list().length > 1, "compaction never ran")
  }

  test("expireOldState: superseded versions deleted; views and resume unaffected") {
    val dir = tmp()
    val cfg = CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4,
      bloomMinSeen = 1, compactEvery = 2)
    val eng = new CrawlEngine(spark, pagesDF, dir, cfg)
    eng.initialize(seeds(5))
    eng.run(5) // compactions at batch 1 and 3
    val seenBefore = eng.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    val frontBefore = eng.frontier().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq
    eng.expireOldState()
    // superseded files gone: only the latest base and post-base deltas remain
    val keep = eng.store.latestBase("seen", Long.MaxValue).get
    val bases = new java.io.File(s"$dir/seen/base").list().toSeq
    assert(bases == Seq(s"v=$keep"), s"expected only the latest base, got $bases")
    assert(!new java.io.File(s"$dir/seen/delta_add/batch=0").exists())
    // views identical after GC
    assert(eng.seen().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq == seenBefore)
    assert(eng.frontier().select("url_hash").collect().map(_.getLong(0)).sorted.toSeq == frontBefore)
    // a fresh engine resumes from the GC'd state with no duplicate fetches
    val eng2 = new CrawlEngine(spark, pagesDF, dir, cfg)
    eng2.run(2)
    assert(eng2.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
    assert(eng2.seen().count() ==
      eng2.ledger().get.orderBy($"batch_id".desc).select("seen_size").head.getLong(0))
  }

  test("keyed membership probe prunes the base scan to the touched buckets (files-read metric)") {
    import org.apache.spark.sql.graftbridge
    val dir = tmp()
    val store = new StateStore(spark, dir)
    val rows = spark.range(0, 50000)
      .select(xxhash64($"id").as("url_hash"), $"id".as("payload"))
    store.writeBase("t", 0L, rows, clusterPartitions = 8)
    val keys = rows.orderBy($"url_hash").limit(3).collect().map(_.getLong(0))
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        graftbridge.fileScans(df).map(_.metrics("numFiles").value).sum
      }
      val keyed = store.readViewKeyed("t", 0L, rows.limit(0), keys)
      // semantics: identical to the broadcast-semi membership resolve
      assert(keyed.select("url_hash").collect().map(_.getLong(0)).toSet == keys.toSet)
      val keyedFiles = filesRead(store.readViewKeyed("t", 0L, rows.limit(0), keys))
      val fullFiles = filesRead(store.readView("t", 0L, rows.limit(0)))
      assert(fullFiles >= 8, s"expected a multi-file clustered base, got $fullFiles")
      // 3 keys → ≤3 _hb buckets → a bounded handful of files, NOT the table
      assert(keyedFiles <= 6 && keyedFiles < fullFiles / 2,
        s"probe of 3 keys read $keyedFiles of $fullFiles base files — partition pruning missing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("bloom maintenance is executor-side: the driver collects blob rows, never the key set") {
    val dir = tmp()
    val cfg = CrawlConfig(defaultHostBudget = 4, shufflePartitions = 4,
      bloomMinSeen = 1, compactEvery = 2)
    val eng = new CrawlEngine(spark, pagesDF, dir, cfg)
    eng.initialize(seeds(6))
    val ms = eng.run(4)
    // every bloom job (fresh build, per-batch delta, compaction fold, resume
    // load) returns at most S=bloomShards blob rows; a driver that ever
    // materialized a key set would blow this bound by orders of magnitude
    val jobsUpperBound = cfg.bloomShards.toLong * (2L * ms.length + 3L)
    assert(eng.bloomBlobRowsCollected > 0 && eng.bloomBlobRowsCollected <= jobsUpperBound,
      s"driver collected ${eng.bloomBlobRowsCollected} rows for bloom maintenance — " +
        s"must be ≤ $jobsUpperBound blob rows (S per job), never O(keys)")
    // and the prefilter still never drops: no url fetched twice
    assert(eng.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
  }

  test("probe-pushdown conf raise is scoped to the batch, restored on exit (ADVICE r3)") {
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val before = spark.conf.get(key, "10")
    val eng = new CrawlEngine(spark, pagesDF, tmp(),
      CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4, probePushdownMaxKeys = 4096))
    eng.initialize(seeds(4))
    eng.runBatch()
    assert(spark.conf.get(key, "10") == before,
      "inFilterThreshold leaked past runBatch — unrelated session queries would " +
        "inherit OR-chain pushdown for every >10-element IN literal")
    // and nesting: a raise inside a raise restores to the outer saved value
    CrawlEngine.withProbeThreshold(spark, 100) {
      assert(spark.conf.get(key).toInt >= 100)
      CrawlEngine.withProbeThreshold(spark, 200)(assert(spark.conf.get(key).toInt >= 200))
      assert(spark.conf.get(key).toInt >= 100)
    }
    assert(spark.conf.get(key, "10") == before)
  }

  test("initializeWithFrontier recomputes url_hash: a stale caller hash cannot dead-letter fetches") {
    val eng0 = new CrawlEngine(spark, pagesDF, tmp(), CrawlConfig(shufflePartitions = 4))
    val good = eng0.frontierFromSeeds(seeds(4))
    val stale = good.withColumn("url_hash", lit(0L)) // caller-built, wrong hash
    val dir = tmp()
    val eng = new CrawlEngine(spark, pagesDF, dir,
      CrawlConfig(defaultHostBudget = 4, shufflePartitions = 4))
    eng.initializeWithFrontier(stale)
    val m = eng.runBatch()
    assert(m("not_found") == 0 && m("fetched") > 0,
      "stale url_hash rows were dead-lettered instead of fetched")
  }

  test("bloom snapshot records fpp/shards: resume under changed params rebuilds instead of mis-folding") {
    val dir = tmp()
    val cfg = CrawlConfig(defaultHostBudget = 4, shufflePartitions = 4,
      bloomMinSeen = 1, compactEvery = 2)
    val e1 = new CrawlEngine(spark, pagesDF, dir, cfg)
    e1.initialize(seeds(6))
    e1.run(2)
    assert(e1.bloomFullBuilds == 1)
    // resume with a DIFFERENT fpp: the persisted snapshot is incompatible
    // (fold would throw IncompatibleMergeException) — must rebuild fresh
    val e2 = new CrawlEngine(spark, pagesDF, dir, cfg.copy(bloomFpp = 0.001))
    e2.run(2)
    assert(e2.bloomFullBuilds == 1,
      "changed bloomFpp on resume must trigger exactly one fresh rebuild")
    assert(e2.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
    // and a changed shard count likewise
    val e3 = new CrawlEngine(spark, pagesDF, dir, cfg.copy(bloomShards = 4))
    val ran = e3.run(1)
    assert(ran.nonEmpty, "corpus exhausted before the shard-mismatch resume could run")
    assert(e3.bloomFullBuilds == 1,
      "changed bloomShards on resume must trigger exactly one fresh rebuild")
  }

  test("recent bloom tiers fold at the cap even with compaction off (ADVICE r3)") {
    val dir = tmp()
    val eng = new CrawlEngine(spark, pagesDF, dir,
      CrawlConfig(defaultHostBudget = 3, shufflePartitions = 4,
        bloomMinSeen = 1, compactEvery = 0, bloomRecentCap = 2))
    eng.initialize(seeds(6))
    val ms = eng.run(6)
    assert(ms.length == 6)
    assert(eng.bloomRecentTiers < 2 + 1,
      s"recent tier grew to ${eng.bloomRecentTiers} entries — cap fold never ran")
    // the fold persisted a newer snapshot (not just the initial build's)
    val snaps = new java.io.File(s"$dir/bloom").list().toSeq.sorted
    assert(snaps.length > 1, s"no folded snapshot persisted: $snaps")
    // correctness unchanged under cap folds
    assert(eng.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
    assert(eng.seen().count() ==
      eng.ledger().get.orderBy($"batch_id".desc).select("seen_size").head.getLong(0))
  }

  test("bloom probe closure is O(1) in batch size: recent tiers ride broadcasts, never the task closure (VERDICT r4)") {
    val sc = spark.sparkContext
    // 8 recent tiers of ~2 MB each: closure-embedded they'd serialize to
    // ~16 MB per task (the r4 bench's 3.5 MiB large-task warning, scaled);
    // as broadcast HANDLES the expression must stay tiny
    def blobs(): Array[Array[Byte]] = Array.fill(4)(Array.fill[Byte](512 * 1024)(7))
    val snap = sc.broadcast(blobs())
    val recents = (1 to 8).map(_ => sc.broadcast(blobs()))
    val expr = BloomProbeBroadcast(snap, recents,
      org.apache.spark.sql.graftbridge.toExpression(lit(42L)))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(expr); oos.close()
    assert(bos.size() < 64 * 1024,
      s"bloom probe expression serialized to ${bos.size()} bytes — " +
        "delta blobs are riding the task closure instead of broadcasts")
    (recents :+ snap).foreach(_.unpersist())
  }

  test("a robots purge folds the recent tier at the cap instead of exceeding it (ADVICE r4)") {
    import graft.functions.gf
    val mega = "h0.example.test"
    // head-bounded candidate gating leaves blocked rows in the frontier
    // (only head-K are gated per batch), so the purge has real work
    val eng = new CrawlEngine(spark, pagesDF, tmp(),
      CrawlConfig(defaultHostBudget = 2, shufflePartitions = 4,
        bloomMinSeen = 1, compactEvery = 8, headTable = true, bloomRecentCap = 2,
        robotsDisallow = Seq((mega, "/u/"))))
    val preload = pagesDF.select($"url",
      gf.canonicalize_url($"url").as("url_canon"),
      xxhash64(gf.canonicalize_url($"url")).as("url_hash"),
      gf.url_host($"url").as("host"),
      lit(0).as("depth"), $"warc_ts".as("priority_ts"), lit("pre").as("seed_id"),
      lit(new java.sql.Timestamp(0L)).as("since_ts"),
      lit(new java.sql.Timestamp(PagesGen.BaseTsMillis + 86400000L)).as("end_ts"),
      lit(-1L).as("discovered_batch"))
    eng.initializeWithFrontier(preload)
    eng.run(2) // batch 2 builds the bloom + appends one recent tier
    assert(eng.bloomRecentTiers == 1, s"premise: one live tier, got ${eng.bloomRecentTiers}")
    val purged = eng.purgeRobotsBlocked()
    assert(purged > 0, "premise: the purge must have blocked frontier rows to drop")
    // the purge's appended tier hit the cap (2) — it must FOLD, not exceed it
    assert(eng.bloomRecentTiers == 0,
      s"purge left ${eng.bloomRecentTiers} recent tiers — cap fold did not run")
  }

  test("bloom lifecycle: one full build, then incremental; resume loads snapshot + replays deltas") {
    val dir = tmp()
    val cfg = CrawlConfig(defaultHostBudget = 4, shufflePartitions = 4,
      bloomMinSeen = 1, compactEvery = 2)
    val e1 = new CrawlEngine(spark, pagesDF, dir, cfg)
    e1.initialize(seeds(6))
    e1.run(4)
    assert(e1.bloomFullBuilds == 1,
      s"bloom fully built ${e1.bloomFullBuilds} times — must be once, then per-batch inserts")
    // resume in a fresh engine: persisted snapshot + delta replay, never a rescan
    val e2 = new CrawlEngine(spark, pagesDF, dir, cfg)
    e2.run(3)
    assert(e2.bloomFullBuilds == 0, "resume re-scanned seen to rebuild the bloom")
    // correctness unchanged: no url fetched twice across crash+resume
    assert(e2.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
    assert(e2.seen().count() ==
      e2.ledger().get.orderBy($"batch_id".desc).select("seen_size").head.getLong(0))
  }
}

/** Round-2 semantics locks: half-open windows, BHJ open-corpus recovery,
  * exact politeness-budget split under sharded ranking. */
class WindowAndGuardSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.crawl._
  import spark.implicits._
  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_wg").toString

  test("half-open window: a page with warc_ts == end emits exactly once, in the NEXT window") {
    val base = PagesGen.BaseTsMillis
    def mk(url: String, ts: Long, html: String) =
      Page(url, new java.sql.Timestamp(ts), html.getBytes("UTF-8"),
        TextExtract.extractText(html), "en")
    val u0 = "https://hb.example.test/u/0/p/0" // newest (root — the timeline head)
    val u1 = "https://hb.example.test/u/0/p/1" // older; warc_ts == window A's end
    val endA = base - 3600_000L
    val pages = Seq(
      mk(u0, base, s"""<a href="$u1">next</a>root"""),
      mk(u1, endA, "boundary page")).toDF
    val eng = new CrawlEngine(spark, pages, tmp(),
      CrawlConfig(shufflePartitions = 2, maxDepth = 4))
    eng.initialize(Seq(Seed("s", u0,
      new java.sql.Timestamp(base - 7200_000L), new java.sql.Timestamp(endA))))
    eng.run(4)
    // window A [base-2h, base-1h): root is too new (deferred), the boundary
    // page's warc_ts == end is OUTSIDE the half-open window — also deferred.
    // Under the old inclusive-end semantics it would emit here AND again
    // after rotation (since := end) — the double-emission ADVICE r1 flags.
    assert(eng.fetched().get.count() == 0,
      "warc_ts == end must NOT emit in the half-open window")
    eng.rotateWindows(new java.sql.Timestamp(base + 3600_000L))
    eng.run(4)
    val all = eng.fetched().get
    assert(all.filter($"url_canon".endsWith("/p/1")).count() == 1,
      "boundary page emits exactly once, in window B (since := old end, inclusive)")
    assert(all.filter($"url_canon".endsWith("/p/0")).count() == 1)
    assert(all.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
  }

  test("broadcastScheduled on an OPEN corpus: missing urls dead-letter and leave the frontier") {
    val N = 256L
    val pages = PagesGen.pages(spark, N, 4).toDF
    val open = pages.filter(!col("url").endsWith("/p/2")) // break the chains
    val eng = new CrawlEngine(spark, open, tmp(),
      CrawlConfig(defaultHostBudget = 4, maxDepth = 32, shufflePartitions = 4,
        broadcastScheduled = true))
    eng.initialize(PagesGen.seedRows(N, 3).map(Seed.tupled))
    val ms = eng.run(6)
    assert(ms.map(_("not_found")).sum > 0, "missing urls must be detected")
    val errs = eng.store.readLog("errors", Long.MaxValue)
    assert(errs.isDefined && errs.get.filter($"error" === "NOT_FOUND").count() > 0,
      "BHJ-dropped urls must be recovered as dead-letter rows (ADVICE r1)")
    // none of them linger in the frontier (the silent-reschedule-forever bug)
    val lingering = eng.frontier()
      .join(errs.get.select("url_hash"), Seq("url_hash"), "left_semi").count()
    assert(lingering == 0)
    // arithmetic size maintenance stays exact with the recovery in play
    assert(ms.last("seen_size") == eng.seen().count())
    assert(ms.last("frontier_size") == eng.frontier().count())
  }

  test("duplicate url_canon rows in the corpus: emitted once, arithmetic exact (ADVICE r2)") {
    val base = PagesGen.BaseTsMillis
    def mk(url: String, ts: Long, html: String) =
      Page(url, new java.sql.Timestamp(ts), html.getBytes("UTF-8"),
        TextExtract.extractText(html), "en")
    val u0 = "https://hd.example.test/u/0/p/0"
    // same canonical form: uppercase scheme/host + explicit default port
    val u0dup = "HTTPS://HD.example.test:443/u/0/p/0"
    val u1 = "https://hd.example.test/u/0/p/1"
    val pages = Seq(
      mk(u0, base - 3600_000L, s"""newest<a href="$u1">next</a>"""),
      mk(u0dup, base - 7200_000L, "older duplicate, no links"),
      mk(u1, base - 7200_000L, "tail page")).toDF
    val eng = new CrawlEngine(spark, pages, tmp(),
      CrawlConfig(shufflePartitions = 2, maxDepth = 4))
    eng.initialize(Seq(Seed("s", u0,
      new java.sql.Timestamp(base - 86400_000L), new java.sql.Timestamp(base))))
    val ms = eng.run(3)
    val f = eng.fetched().get
    // latest-warc_ts wins: one emission, and it is the newer row (has the link)
    assert(f.filter($"url_canon" === u0).count() == 1)
    assert(f.filter($"url_canon" === u0).head.getAs[Int]("n_outlinks") == 1)
    assert(f.filter($"url_canon" === u1).count() == 1, "link from the kept row must expand")
    // seen delta carries no duplicate keys; arithmetic caches stay exact
    assert(eng.seen().groupBy("url_hash").count().filter($"count" > 1).count() == 0)
    assert(ms.last("seen_size") == eng.seen().count())
    assert(ms.last("frontier_size") == eng.frontier().count())
  }

  test("semi-filtered default fetch on an OPEN corpus: missing urls dead-letter via found=false") {
    // the round-3 default path (8-byte-key semi-filter + batch-sized outer
    // join) must keep the outer-join dead-letter semantics: a scheduled url
    // absent from the corpus yields found=false, leaves the frontier, and
    // the arithmetic size caches stay exact
    val N = 256L
    val pages = PagesGen.pages(spark, N, 4).toDF
    val open = pages.filter(!col("url").endsWith("/p/2")) // break the chains
    val eng = new CrawlEngine(spark, open, tmp(),
      CrawlConfig(defaultHostBudget = 4, maxDepth = 32, shufflePartitions = 4))
    eng.initialize(PagesGen.seedRows(N, 3).map(Seed.tupled))
    val ms = eng.run(6)
    assert(ms.map(_("not_found")).sum > 0, "missing urls must be detected")
    // not-found rows are in the parsed log with found=false and never emitted
    val parsedLog = eng.store.readLog("parsed", Long.MaxValue).get
    assert(parsedLog.filter(!col("found")).count() == ms.map(_("not_found")).sum)
    assert(eng.fetched().get.filter(col("url_canon").endsWith("/p/2")).count() == 0)
    // they do not linger in the frontier (no silent reschedule-forever)
    val lingering = eng.frontier()
      .join(parsedLog.filter(!col("found")).select("url_hash"), Seq("url_hash"), "left_semi")
      .count()
    assert(lingering == 0)
    assert(ms.last("seen_size") == eng.seen().count())
    assert(ms.last("frontier_size") == eng.frontier().count())
  }

  test("sharded ranking with budget % saltBuckets != 0: per-host total == host_budget, never over") {
    val N = 512L
    val pages = PagesGen.pages(spark, N, 4).toDF
    val eng = new CrawlEngine(spark, pages, tmp(),
      CrawlConfig(defaultHostBudget = 5, saltBuckets = 8, maxDepth = 16,
        shufflePartitions = 4, shardedRanking = true))
    eng.initialize(PagesGen.seedRows(N, 6).map(Seed.tupled))
    eng.run(3)
    // the parsed log carries exactly the scheduled rows (one per fetch
    // attempt) — the politeness cap governs its per-(host, batch) counts
    val sched = eng.store.readLog("parsed", Long.MaxValue).get
    val over = sched.groupBy($"host", $"batch").count().filter($"count" > 5).count()
    assert(over == 0, "per-host politeness budget exceeded (ceil-overshoot bug, ADVICE r1)")
  }
}

/** §3.2 — interval scheduler analog (service.py:1209-1306): ticks fire a
  * rotate+run child only when the interval has elapsed since the last run;
  * the clock is injected so the schedule is deterministic. */
class SchedulerSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.crawl._

  test("tickSchedule fires only after the interval elapses, rotating to the tick time") {
    val N = 128L
    val pages = PagesGen.pages(spark, N, 4, crossLinks = false).toDF
    val base = PagesGen.BaseTsMillis
    val dir = java.nio.file.Files.createTempDirectory("graft_sched").toString
    val eng = new CrawlEngine(spark, pages, dir,
      CrawlConfig(defaultHostBudget = 8, maxDepth = 32, shufflePartitions = 4))
    val end0 = new java.sql.Timestamp(base - 10L * 3600_000L)
    eng.initialize(Seq(0L, 2L).map(sid => Seed(s"seed$sid", PagesGen.urlOf(sid, 0, N),
      new java.sql.Timestamp(base - 200L * 3600_000L), end0)))
    eng.run(20)
    val hour = 3600_000L
    // too early: half an interval after the cursor — no child run
    assert(!eng.tickSchedule(new java.sql.Timestamp(end0.getTime + hour / 2), hour, 20))
    val before = eng.store.committedBatch
    assert(eng.store.committedBatch == before)
    // due: fires, rotates end_ts to the tick time, runs the child
    val t1 = new java.sql.Timestamp(end0.getTime + 2 * hour)
    assert(eng.tickSchedule(t1, hour, 20))
    assert(eng.store.committedBatch > before)
    // immediately re-ticking at the same time must NOT fire again
    assert(!eng.tickSchedule(t1, hour, 20))
    // and the next due tick fires from the new cursor
    assert(eng.tickSchedule(new java.sql.Timestamp(t1.getTime + hour), hour, 20))
    // across all scheduled children: no url emitted twice
    import spark.implicits._
    assert(eng.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
  }
}

/** M3 — cursor rotation (since := end, end := now; weibo.py:2814-2817) with
  * deferred too-new pages emitted exactly once in the next window. */
class RotationSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.crawl._
  import spark.implicits._

  test("two-window incremental crawl covers the full range exactly once") {
    val N = 128L // 8 seeds × 16 posts; the paging chain advances one post per batch
    val pages = PagesGen.pages(spark, N, 4, crossLinks = false).toDF
    val base = PagesGen.BaseTsMillis
    val endA = new java.sql.Timestamp(base - 8L * 3600_000L)
    val sinceA = new java.sql.Timestamp(base - 200L * 3600_000L)
    // seed 1 is excluded: its post 5 is the whitespace-only fixture page
    // (index 41), which legitimately has no outlinks and ends that timeline
    val seedIds = Seq(0L, 2L, 3L)
    val seeds = seedIds.map(sid =>
      Seed(s"seed$sid", PagesGen.urlOf(sid, 0, N), sinceA, endA))
    val dir = java.nio.file.Files.createTempDirectory("graft_rot").toString
    val eng = new CrawlEngine(spark, pages, dir,
      CrawlConfig(defaultHostBudget = 8, maxDepth = 32, shufflePartitions = 4))
    eng.initialize(seeds)
    eng.run(20) // drain window A (16-deep chains)
    val postOf = (df: org.apache.spark.sql.DataFrame) => df
      .withColumn("post", regexp_extract($"url_canon", "/p/(\\d+)$", 1).cast("long"))
      .select($"seed_id", $"post").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val a = postOf(eng.fetched().get)
    // window A emits only posts 8.. (older than endA); newest are deferred
    assert(a.nonEmpty && a.forall(_._2 >= 8), s"window A leaked too-new posts: ${a.filter(_._2 < 8)}")

    eng.rotateWindows(new java.sql.Timestamp(base))
    eng.run(20) // drain window B
    val all = postOf(eng.fetched().get)
    val b = all -- a
    // window B emits exactly the deferred newest posts 0..7 per seed
    assert(b.nonEmpty && b.forall(_._2 < 8), s"window B out of range: ${b.filter(_._2 >= 8)}")
    seedIds.foreach { sid =>
      val posts = all.filter(_._1 == s"seed$sid").map(_._2)
      assert(posts == (0L until 16L).toSet, s"seed$sid incomplete: ${posts.toSeq.sorted}")
    }
    // no url emitted twice across the two windows
    val dupes = eng.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count()
    assert(dupes == 0)
    // resume still works across the rotation boundary
    val eng2 = new CrawlEngine(spark, pages, dir,
      CrawlConfig(defaultHostBudget = 8, maxDepth = 32, shufflePartitions = 4))
    assert(eng2.store.committedBatch == eng.store.committedBatch)
    assert(eng2.run(2).isEmpty || eng2.fetched().get.groupBy("url_hash").count().filter($"count" > 1).count() == 0)
  }
}
