package graft.crawl

import graft.functions.gf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seed config row — analog of config.json user_id_list entries
  * (/root/reference/weibo.py:144-166): a root url plus a [since, end]
  * crawl window (weibo.py:286-331 normalization). */
case class Seed(seed_id: String, root_url: String,
    since_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

/**
 * Crawl policy — the reference's politeness constants generalized per host
 * (BASELINE.md table; weibo.py:2741,2769-2778 sleep cadence,
 * weibo.py:1819-1827 page budget).
 *
 * @param defaultHostBudget  max fetches per host per micro-batch (the
 *                           "pages per sleep window" analog)
 * @param defaultDelayMs     per-fetch token-bucket delay budget within a host
 * @param perHostBudget      overrides, e.g. a larger-but-bounded budget for
 *                           the mega-host
 * @param maxDepth           outlink expansion bound
 * @param saltBuckets        salt fan-out for mega-host partitions (north
 *                           rule: salted repartitioning on host-hash)
 * @param bloomShards        seen-set prefilter shards
 * @param robotsDisallow     (host, path-prefix) gating rules (north rule)
 * @param realTimePacing     enforce delays as wall-clock sleeps in the fetch
 *                           stage (tests keep this off: budgets are modeled
 *                           as data — fetch ordinals × delay — so runs are
 *                           replayable; SURVEY.md §7 hard-part 2)
 */
case class CrawlConfig(
    defaultHostBudget: Int = 5,
    defaultDelayMs: Long = 6000L,
    perHostBudget: Map[String, Int] = Map.empty,
    maxDepth: Int = 3,
    saltBuckets: Int = 8,
    bloomShards: Int = 8,
    bloomFpp: Double = 0.01,
    robotsDisallow: Seq[(String, String)] = Nil,
    realTimePacing: Boolean = false,
    shufflePartitions: Int = 32,
    bloomMinSeen: Long = 4096,
    cachePages: Boolean = false,
    detailedMetrics: Boolean = true,
    shardedRanking: Boolean = false,
    broadcastScheduled: Boolean = false)

/**
 * The URL-frontier + fetch-scheduler engine (BASELINE.json.north_rule).
 *
 * One micro-batch re-expresses the reference's crawl loop
 * (weibo.py:1663-1817 / SURVEY.md §3.1 step 4) as a declarative plan:
 *
 *   frontier ──bloom prefilter──► exact LEFT ANTI JOIN seen      (F2)
 *           ──robots gating──► per-host window rank (newest-first,
 *             budget-capped)                                      (W1/W3/F4)
 *           ──salted repartition on host-hash──► fetch (pages lookup)
 *           ──warc_ts ∈ [since,end]──► parse (extract_text/outlinks) (F3, U1)
 *           ──explode outlinks──► new frontier entries            (U5)
 *           ──MERGE seen/frontier + append fetched/ledger, one atomic
 *             commit──► resumable exactly at frontier state       (O4)
 *
 * All steps are Dataset/Catalyst operators — Catalyst pushes the filters,
 * AQE picks join strategies and splits skewed partitions; the only
 * imperative stage is the optional wall-clock pacing sink.
 */
class CrawlEngine(
    spark: SparkSession,
    pages: DataFrame,
    stateDir: String,
    cfg: CrawlConfig = CrawlConfig()) {

  import spark.implicits._

  val store = new StateStore(spark, stateDir)

  /** pages keyed by canonical url — at cluster scale this is the Iceberg
    * table BUCKETED by the join key so the per-batch fetch join never
    * shuffles the big side. cachePages simulates that locally: repartition
    * once by url_canon and persist — the cached relation keeps its
    * HashPartitioning, so every batch's join only shuffles the (much
    * smaller) scheduled side. */
  private lazy val pagesByCanon: DataFrame = {
    val df = pages
      .withColumn("url_canon", gf.canonicalize_url($"url"))
      .withColumnRenamed("url", "page_url")
    if (cfg.cachePages)
      df.repartition(cfg.shufflePartitions, $"url_canon")
        .sortWithinPartitions($"url_canon")
        .persist()
    else df
  }

  /** running |seen| — avoids a count job per batch; exact because every
    * scheduled/blocked url is frontier-unique and anti-joined against seen. */
  private var seenSizeCache: Long = -1L
  private def seenSize(committed: Long): Long = {
    if (seenSizeCache < 0) {
      seenSizeCache = ledger(committed) match {
        case Some(l) if committed >= 0 =>
          val rows = l.filter($"state".isin("SUCCESS", "ROTATED")).orderBy($"batch_id".desc)
            .select("seen_size").limit(1).collect()
          if (rows.nonEmpty) rows(0).getLong(0) else seen(committed).count()
        case _ => if (committed >= 0) seen(committed).count() else 0L
      }
    }
    seenSizeCache
  }

  private def emptyFrontier: DataFrame = Seq.empty[(String, String, Long, String, Int,
      java.sql.Timestamp, String, java.sql.Timestamp, java.sql.Timestamp, Long)]
    .toDF("url", "url_canon", "url_hash", "host", "depth", "priority_ts",
      "seed_id", "since_ts", "end_ts", "discovered_batch")

  private def emptySeen: DataFrame =
    Seq.empty[(Long, String, Long)].toDF("url_hash", "url_canon", "first_batch")

  /** Seed list → initial frontier (depth 0, priority = end of window so the
    * newest-first order starts at the seed's cursor, weibo.py:2743). */
  def frontierFromSeeds(seeds: Seq[Seed]): DataFrame =
    seeds.toDF("seed_id", "root_url", "since_ts", "end_ts")
      .withColumn("url", $"root_url")
      .withColumn("url_canon", gf.canonicalize_url($"url"))
      .withColumn("url_hash", xxhash64($"url_canon"))
      .withColumn("host", gf.url_host($"url_canon"))
      .withColumn("depth", lit(0))
      .withColumn("priority_ts", $"end_ts")
      .withColumn("discovered_batch", lit(-1L))
      .select(emptyFrontier.columns.map(col): _*)

  def initialize(seeds: Seq[Seed]): Unit = {
    store.write("seeds", -1L, seeds.toDF("seed_id", "root_url", "since_ts", "end_ts"))
    initializeWithFrontier(frontierFromSeeds(seeds))
  }

  /** Preload an arbitrary frontier (bench path: the 10^10-URL-frontier model
    * is "frontier already full", not "grown from 8 seeds"). */
  def initializeWithFrontier(frontier: DataFrame): Unit = {
    require(store.committedBatch < 0, s"state at $stateDir already initialized")
    store.write("frontier", -1L, frontier)
    store.write("seen", -1L, emptySeen)
    // version -1 is readable but the pointer still says -1 ⇒ batch 0 is next
    store.commit(-1L)
  }

  def frontier(v: Long = store.committedBatch): DataFrame = store.read("frontier", v, emptyFrontier)
  def seen(v: Long = store.committedBatch): DataFrame = store.read("seen", v, emptySeen)
  def fetched(upTo: Long = store.committedBatch): Option[DataFrame] = store.readLog("fetched", upTo)
  def ledger(upTo: Long = store.committedBatch): Option[DataFrame] = store.readLog("ledger", upTo)

  /** Request a stop — the `tasks.command = 'STOP'` analog
    * (service.py:1419-1432). Checked between batches. */
  def requestStop(): Unit =
    java.nio.file.Files.createFile(java.nio.file.Paths.get(stateDir, "_STOP"))
  def stopRequested: Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(stateDir, "_STOP"))
  def clearStop(): Unit =
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(stateDir, "_STOP"))

  /** Build the sharded bloom prefilter blobs from the committed seen set. */
  private def bloomBlobs(seenDf: DataFrame, seenCount: Long): Option[Seq[Array[Byte]]] = {
    if (seenCount == 0) return None
    val s = cfg.bloomShards
    val expectedPerShard = math.max(64L, seenCount / s + 1)
    val rows = seenDf
      .groupBy(pmod($"url_hash", lit(s.toLong)).as("shard"))
      .agg(BloomSeen.bloom_build($"url_hash", expectedPerShard, cfg.bloomFpp).as("blob"))
      .collect()
    val empty = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(64, cfg.bloomFpp)
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
    }
    val blobs = Array.fill[Array[Byte]](s)(empty)
    rows.foreach(r => blobs(r.getLong(0).toInt) = r.getAs[Array[Byte]]("blob"))
    Some(blobs.toSeq)
  }

  private val timing = sys.env.contains("GRAFT_TIMING")
  private def timed[T](label: String)(f: => T): T = {
    if (!timing) f else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[timing] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
  }

  /** Run one micro-batch; returns the ledger metrics row as a Map. */
  def runBatch(): Map[String, Long] = {
    val committed = store.committedBatch
    val batchId = committed + 1

    val front = frontier(committed)
    val seenDf = seen(committed)
    val seenCount = seenSize(committed)

    // ---- F2: seen-set dedup — bloom prefilter + authoritative anti-join.
    // !mightContain ⇒ definitely new (skips the join); mightContain ⇒ maybe
    // (false positives resolved by the exact anti-join, so a never-seen url
    // can never be dropped — FIXTURES.md §5.3).
    // below bloomMinSeen the filter build costs more than the anti-join saves
    val blobsOpt = timed("bloom_build")(if (seenCount >= cfg.bloomMinSeen) bloomBlobs(seenDf, seenCount) else None)
    val candidates = blobsOpt match {
      case Some(blobs) =>
        val probed = front.withColumn("_maybe_seen", BloomSeen.bloom_probe(blobs, $"url_hash"))
        val definitelyNew = probed.filter(!$"_maybe_seen").drop("_maybe_seen")
        val resolved = probed.filter($"_maybe_seen").drop("_maybe_seen")
          .join(seenDf.select("url_hash"), Seq("url_hash"), "left_anti")
        definitelyNew.unionByName(resolved)
      case None => front
    }

    // ---- robots gating (north rule). Small dim ⇒ broadcast; prefix match
    // is a theta join so Catalyst plans BroadcastNestedLoop — fine for a
    // dim of rule rows.
    val robotsBlocked = if (cfg.robotsDisallow.isEmpty) emptyFrontier else {
      val robots = broadcast(cfg.robotsDisallow.toDF("r_host", "r_prefix"))
      candidates.join(robots,
        candidates("host") === robots("r_host") &&
          expr("parse_url(url_canon, 'PATH')").startsWith(robots("r_prefix")))
        .select(candidates.columns.map(candidates(_)): _*)
        .dropDuplicates("url_hash")
        .persist()
    }
    val robotsBlockedCount = if (cfg.robotsDisallow.isEmpty) 0L else robotsBlocked.count()
    val allowed = if (cfg.robotsDisallow.isEmpty) candidates
      else candidates.join(robotsBlocked.select("url_hash"), Seq("url_hash"), "left_anti")

    // ---- W1/W3/F4: newest-first priority + per-host fetch budget.
    // The reference pages newest-first and stops at the budget
    // (weibo.py:2743,1819-1827); rows past the budget stay in the frontier
    // for the next batch — that IS the paging continuation.
    val budgetDf = broadcast(
      (cfg.perHostBudget.toSeq :+ ("" -> cfg.defaultHostBudget))
        .toDF("b_host", "b_budget"))
    // shardedRanking: the global per-host rank makes a mega-host one window
    // partition — a single sequential task no matter how many executors. At
    // scale each politeness shard (host, salt) owns budget/S and ranks
    // independently: newest-first is preserved per shard, the sort
    // parallelizes, and determinism is kept (salt = f(url_hash)). Tests use
    // the exact global rank (reference-order equivalence); benches shard.
    val w =
      if (cfg.shardedRanking)
        Window.partitionBy($"host", pmod($"url_hash", lit(cfg.saltBuckets.toLong)))
          .orderBy($"priority_ts".desc, $"url_canon".asc)
      else Window.partitionBy($"host").orderBy($"priority_ts".desc, $"url_canon".asc)
    val ranked = allowed
      .filter($"depth" <= cfg.maxDepth)
      .withColumn("fetch_ordinal", row_number().over(w))
      .join(budgetDf, $"host" === $"b_host", "left_outer")
      .withColumn("host_budget", coalesce($"b_budget", lit(cfg.defaultHostBudget)))
      .drop("b_host", "b_budget")
    val effBudget =
      if (cfg.shardedRanking) ceil($"host_budget" / lit(cfg.saltBuckets.toDouble)).cast("int")
      else $"host_budget"
    val scheduled = ranked
      .filter($"fetch_ordinal" <= effBudget)
      .withColumn("sched_delay_ms", ($"fetch_ordinal" - 1) * lit(cfg.defaultDelayMs))

    // ---- fetch = lookup into the pages corpus (S1 analog; in tests "fetch"
    // is this join per the driver instruction — no network). left join keeps
    // dangling outlinks as dead-letter rows (S8's not_downloaded.txt analog).
    // Only the scheduled side shuffles when pages are bucket-partitioned.
    //
    // broadcastScheduled: ship the scheduled batch to the corpus scan — a
    // BroadcastHashJoin where the pages side NEVER moves (scan → join →
    // parse in one codegen stage). This is the local analog of a bucketed
    // Iceberg scan + runtime-filter pushdown. Requires a closed corpus
    // (every scheduled url resolves): BHJ can't preserve unmatched build
    // rows, so dead-letter tracking needs the outer-join path.
    val pagesSel = pagesByCanon.select($"url_canon", $"page_url", $"warc_ts", $"html", $"text", $"lang")
    val fetchedRaw =
      if (cfg.broadcastScheduled)
        pagesSel.join(broadcast(scheduled), Seq("url_canon"))
          .withColumn("found", lit(true))
      else
        scheduled.join(pagesSel, Seq("url_canon"), "left_outer")
          .withColumn("found", $"page_url".isNotNull)

    // O7/O8 inverted (real fetches only): parallel across hosts, sequential
    // within a (host, salt) shard — pace() repartitions so one task owns each
    // shard's token-bucket. Data-only runs skip the extra shuffle entirely.
    val paced = if (cfg.realTimePacing) pace(fetchedRaw) else fetchedRaw

    // ---- F3 time window + U1 parse + invariant check + U5 outlinks.
    // The invariant flag is computed BEFORE persist so the cached projection
    // can drop html/text — the cache carries ~1KB/row instead of the full
    // page body (at bench scale the difference is whether it fits in memory).
    val parsed = paced
      .withColumn("in_range", $"found" && $"warc_ts".between($"since_ts", $"end_ts"))
      // fused single-pass parse: ONE scan yields text + outlinks (the DOM
      // pair of expressions parses the page twice and doubles allocation)
      .withColumn("_p", when($"found", gf.extract_parsed($"html")))
      .withColumn("text_extracted", $"_p.text")
      // expansion rule (weibo.py:1700-1718 vs 1764-1786): a page NEWER than
      // the window is skipped for emission but paging continues through it;
      // only pages OLDER than since stop the walk. So outlinks expand for
      // every found page with warc_ts >= since_ts.
      .withColumn("outlinks",
        when($"found" && $"warc_ts" >= $"since_ts", $"_p.outlinks").otherwise(array()))
      .withColumn("invariant_ok", !($"found" && !($"text_extracted" <=> $"text")))
      .withColumn("batch_id", lit(batchId))
      .withColumn("partition_id", spark_partition_id())
      .select($"url_canon", $"url_hash", $"host", $"seed_id", $"depth",
        $"since_ts", $"end_ts", $"warc_ts", $"lang", $"found", $"in_range",
        $"invariant_ok", $"text_extracted", $"outlinks",
        $"batch_id", $"partition_id", $"fetch_ordinal", $"sched_delay_ms")
      .persist()

    // single-pass batch metrics (one job, not four — per-batch fixed cost
    // is the scale killer at high batch rates)
    val mrow = timed("parse_agg")(parsed.agg(
      count(lit(1)).as("sched"),
      sum(when(!$"found", 1L).otherwise(0L)).as("not_found"),
      sum(when($"in_range", 1L).otherwise(0L)).as("in_range"),
      sum(when(!$"invariant_ok", 1L).otherwise(0L)).as("viol"),
      countDistinct($"partition_id").as("nparts")).collect()(0))
    if (sys.env.contains("GRAFT_EXPLAIN")) {
      println(s"==== batch $batchId: fetch+parse physical plan ====")
      println(org.apache.spark.sql.graftbridge.executedPlanString(parsed))
    }
    val schedCount = mrow.getLong(0)
    val notFound = mrow.getLong(1)
    val inRange = mrow.getLong(2)
    val invariantViolations = mrow.getLong(3)
    val nPartitions = mrow.getLong(4)

    // lineage per north rule: (partition id, batch id, fetch ordinal)
    val fetchedOut = parsed.filter($"in_range").select(
      $"url_canon", $"url_hash", $"host", $"seed_id", $"depth",
      $"warc_ts", $"lang", $"text_extracted".as("text"),
      size($"outlinks").as("n_outlinks"),
      $"batch_id", $"partition_id", $"fetch_ordinal", $"sched_delay_ms")

    // too-new pages: attempted this run, emitted next window after rotation
    val deferredOut = parsed.filter($"found" && $"warc_ts" > $"end_ts")
      .select($"url_canon", $"url_hash", $"host", $"seed_id", $"depth",
        $"warc_ts", $"since_ts", $"end_ts", $"batch_id")

    lazy val errorsOut = parsed.filter(!$"found").select(
      $"url_canon", $"url_hash", $"host", $"seed_id", $"depth",
      lit("NOT_FOUND").as("error"), $"batch_id", $"partition_id")

    // ---- U5: outlink expansion → next frontier entries. Children inherit
    // the seed window; priority = linking page's warc_ts (recency prior).
    // expansion source: every page whose outlinks were extracted (found and
    // not older than since — includes too-new deferred pages, weibo.py:1700-1718)
    val discovered = parsed.filter(size($"outlinks") > 0)
      .select($"seed_id", $"since_ts", $"end_ts", $"depth", $"warc_ts",
        explode($"outlinks").as("url"))
      .withColumn("url_canon", gf.canonicalize_url($"url"))
      .withColumn("url_hash", xxhash64($"url_canon"))
      .withColumn("host", gf.url_host($"url_canon"))
      .withColumn("child_depth", $"depth" + 1)
      .filter($"child_depth" <= cfg.maxDepth)
      .withColumn("priority_ts", $"warc_ts")
      .withColumn("discovered_batch", lit(batchId))
      .select($"url", $"url_canon", $"url_hash", $"host", $"child_depth".as("depth"),
        $"priority_ts", $"seed_id", $"since_ts", $"end_ts", $"discovered_batch")
      // first-wins dedup within the batch, deterministic tiebreak
      .withColumn("_rn", row_number().over(
        Window.partitionBy($"url_hash").orderBy($"priority_ts".desc, $"seed_id".asc, $"url_canon".asc)))
      .filter($"_rn" === 1).drop("_rn")
      // robots gating at discovery: a disallowed url never enters the
      // frontier (candidate-time gating above remains as defense for
      // pre-existing frontier state / rule changes)
      .transform(df => if (cfg.robotsDisallow.isEmpty) df else {
        val robots = broadcast(cfg.robotsDisallow.toDF("r_host", "r_prefix"))
        df.join(robots,
            df("host") === robots("r_host") &&
              expr("parse_url(url_canon, 'PATH')").startsWith(robots("r_prefix")),
            "left_anti")
      })

    // processed = attempted fetches + robots-blocked (neither returns to the
    // frontier; blocked urls are seen-equivalent: never fetch)
    val processedHashes = parsed.select("url_hash")
      .unionByName(robotsBlocked.select("url_hash")).distinct().persist()

    // processedHashes is bounded by the batch budget — broadcastable, so
    // the large frontier/seen sides never shuffle for these joins
    val newSeen = seenDf.unionByName(
        broadcast(processedHashes)
          .join(front.select($"url_hash", $"url_canon"), Seq("url_hash"))
          .dropDuplicates("url_hash")
          .withColumn("first_batch", lit(batchId))
          .select("url_hash", "url_canon", "first_batch"))
      .dropDuplicates("url_hash") // MERGE: first-occurrence wins (weibo.py:1698-1699)
      .persist() // consumed by the seen write AND two frontier anti-joins

    val newFrontier = front
      .join(broadcast(processedHashes), Seq("url_hash"), "left_anti")
      .unionByName(
        discovered
          .join(newSeen.select("url_hash"), Seq("url_hash"), "left_anti")
          .join(front.select("url_hash"), Seq("url_hash"), "left_anti"))

    // ---- atomic multi-table snapshot commit (Iceberg MERGE analog)
    timed("write_frontier")(store.write("frontier", batchId, newFrontier))
    timed("write_seen")(store.write("seen", batchId, newSeen))
    timed("write_fetched")(store.appendLog("fetched", batchId, fetchedOut))
    if (notFound > 0) store.appendLog("errors", batchId, errorsOut)
    store.appendLog("deferred", batchId, deferredOut)

    val frontierSize = timed("frontier_count")(frontier(batchId).count()) // metadata-only read-back
    // arithmetic |seen| update: scheduled + blocked are frontier-unique and
    // were anti-joined against seen, so every one is a first occurrence
    val newSeenSize = seenCount + schedCount + robotsBlockedCount
    val candidateCount = if (cfg.detailedMetrics) candidates.count() else -1L
    val metrics = Map(
      "batch_id" -> batchId, "candidates" -> candidateCount,
      "scheduled" -> schedCount, "fetched" -> inRange, "not_found" -> notFound,
      "robots_blocked" -> robotsBlockedCount,
      "invariant_violations" -> invariantViolations,
      "frontier_size" -> frontierSize, "seen_size" -> newSeenSize,
      "partitions_used" -> nPartitions)
    store.appendLog("ledger", batchId,
      Seq((batchId, "SUCCESS", candidateCount, schedCount, inRange, notFound,
        robotsBlockedCount, invariantViolations, frontierSize, newSeenSize, nPartitions))
        .toDF("batch_id", "state", "candidates", "scheduled", "fetched", "not_found",
          "robots_blocked", "invariant_violations", "frontier_size", "seen_size", "partitions_used"))
    store.commit(batchId)
    seenSizeCache = newSeenSize
    parsed.unpersist()
    newSeen.unpersist()
    processedHashes.unpersist()
    if (!cfg.robotsDisallow.isEmpty) robotsBlocked.unpersist()
    metrics
  }

  private def ledgerRow(batchId: Long, state: String, seenSizeNow: Long,
      candidates: Long = -1, scheduled: Long = -1, fetchedN: Long = -1,
      notFound: Long = -1, robotsBlocked: Long = -1, violations: Long = -1,
      frontierSize: Long = -1, nPartitions: Long = -1): DataFrame =
    Seq((batchId, state, candidates, scheduled, fetchedN, notFound,
      robotsBlocked, violations, frontierSize, seenSizeNow, nPartitions))
      .toDF("batch_id", "state", "candidates", "scheduled", "fetched", "not_found",
        "robots_blocked", "invariant_violations", "frontier_size", "seen_size", "partitions_used")

  /**
   * Cursor rotation — the reference's per-seed window advance after every
   * run: `since_date := run start; end_date := now`
   * (/root/reference/weibo.py:2814-2817, rotated again before each scheduled
   * child run service.py:1384-1398). Semantics for the incremental re-crawl:
   *
   *  1. every seed's window becomes [old end, newEnd] (seeds table MERGE);
   *  2. seed roots re-enter the frontier with the new window;
   *  3. pages that were traversed but DEFERRED as too-new (warc_ts > old end)
   *     are forgotten from the seen set, so the next run emits them — the
   *     analog of the reference re-walking the newest pages each run while
   *     the append-mode cutoff (F7) keeps already-emitted items unique.
   *
   * Runs at a batch boundary and commits as its own versioned state change
   * (ledger state = ROTATED), so kill/resume semantics are identical to a
   * normal batch.
   */
  def rotateWindows(newEnd: java.sql.Timestamp): Unit = {
    val committed = store.committedBatch
    val batchId = committed + 1
    val seedsDf = store.read("seeds", committedSeedsVersion(committed),
      sys.error("rotateWindows requires initialize(seeds) state"))
    val rotated = seedsDf
      .withColumn("since_ts", $"end_ts")
      .withColumn("end_ts", lit(newEnd))
    val roots = frontierFromSeeds2(rotated)
    val deferred = store.readLog("deferred", committed)
      .map(_.select("url_hash").distinct()).getOrElse(emptySeen.select("url_hash"))
    val forget = roots.select("url_hash").unionByName(deferred).distinct()
    val newSeen = seen(committed).join(forget, Seq("url_hash"), "left_anti")
    val newFrontier = frontier(committed)
      .join(broadcast(roots.select("url_hash")), Seq("url_hash"), "left_anti")
      .unionByName(roots)
    store.write("seeds", batchId, rotated)
    store.write("frontier", batchId, newFrontier)
    store.write("seen", batchId, newSeen)
    val seenNow = seen(batchId).count()
    store.appendLog("ledger", batchId, ledgerRow(batchId, "ROTATED", seenNow))
    store.commit(batchId)
    seenSizeCache = seenNow
  }

  /** latest committed version at which a seeds table exists (seeds are only
    * rewritten on rotation). */
  private def committedSeedsVersion(committed: Long): Long = {
    var v = committed
    while (v >= -1 && !store.exists("seeds", v)) v -= 1
    v
  }

  /** frontier rows from a seeds DataFrame (same shape as frontierFromSeeds). */
  private def frontierFromSeeds2(seedsDf: DataFrame): DataFrame =
    seedsDf
      .withColumn("url", $"root_url")
      .withColumn("url_canon", gf.canonicalize_url($"url"))
      .withColumn("url_hash", xxhash64($"url_canon"))
      .withColumn("host", gf.url_host($"url_canon"))
      .withColumn("depth", lit(0))
      .withColumn("priority_ts", $"end_ts")
      .withColumn("discovered_batch", lit(-1L))
      .select(emptyFrontier.columns.map(col): _*)

  /** Post-run materialized summary (S17 analog: the reference pre-builds
    * task/schedule result caches after each run, service.py:580-964,
    * 967-1024): per-host and per-seed rollups of everything fetched so far,
    * written as a queryable snapshot table. */
  def refreshSummary(): Option[DataFrame] = fetched().map { f =>
    val summary = f.groupBy($"host", $"seed_id")
      .agg(count(lit(1)).as("n_fetched"),
        min($"warc_ts").as("oldest_ts"), max($"warc_ts").as("newest_ts"),
        max($"depth").as("max_depth"), sum($"n_outlinks").as("total_outlinks"),
        countDistinct($"batch_id").as("n_batches"))
    store.write("summary", store.committedBatch, summary)
    store.read("summary", store.committedBatch, summary)
  }

  /** Wall-clock token-bucket pacing inside the fetch stage — only when
    * realTimePacing is on (real crawls). Partitions are sorted by
    * (host, fetch_ordinal); each task owns its host shards and sleeps the
    * residual delay budget between fetches of the same host
    * (weibo.py:2769-2778 analog). Data passes through unchanged. */
  private def pace(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge
    val salted = df
      .withColumn("host_salt", pmod(xxhash64($"host", pmod($"url_hash", lit(cfg.saltBuckets.toLong))),
        lit(cfg.shufflePartitions.toLong)))
      .repartition(cfg.shufflePartitions, $"host_salt")
    val schema = salted.schema
    val hostIdx = schema.fieldIndex("host")
    val delayMs = cfg.defaultDelayMs
    val sorted = salted.sortWithinPartitions($"host_salt", $"fetch_ordinal")
    val out = graftbridge.toInternalRdd(sorted).mapPartitions { rows =>
      var lastHost: String = null
      var lastAt = 0L
      rows.map { r =>
        val host = r.getUTF8String(hostIdx).toString
        val now = System.currentTimeMillis()
        if (host == lastHost) {
          val wait = delayMs - (now - lastAt)
          if (wait > 0) Thread.sleep(wait)
        }
        lastHost = host; lastAt = System.currentTimeMillis()
        r.copy()
      }
    }
    graftbridge.fromInternalRdd(spark, out, schema)
  }

  /** Run up to maxBatches (stop early on empty frontier or STOP command).
    * Resumes from the committed pointer — a killed run restarts at the exact
    * frontier state (north rule). */
  def run(maxBatches: Int): Seq[Map[String, Long]] = {
    val out = Seq.newBuilder[Map[String, Long]]
    var i = 0
    var continue = true
    while (i < maxBatches && continue) {
      if (stopRequested) {
        store.appendLog("ledger", store.committedBatch + 1,
          ledgerRow(store.committedBatch + 1, "STOPPED", seenSize(store.committedBatch)))
        continue = false
      } else if (frontier().isEmpty) {
        continue = false
      } else {
        out += runBatch()
        i += 1
      }
    }
    out.result()
  }
}
