package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Round-6 optimization probe (guide §1: measure first). Replicates the
 * driver bench's components in isolation so each optimization's effect can
 * be measured without paying a full bench run:
 *
 *   crawl [nPages] [batches]  — in-session crawlBench (broadcast shape) with
 *                               the per-phase wall decomposition printed
 *   crawlsemi [nPages]        — same, broadcastSched = false (semi-filter)
 *   head                      — the head_sched bounded-crawl pair (1 warmup
 *                               pair + 2 measured pairs) with phase totals
 *   pack [prefix]             — query-pack timings on SPARK_GRAFT_SF_DIR,
 *                               one line per query (optionally filtered by
 *                               name prefix), with per-query job/stage counts
 *   jobs <qname>              — run ONE query with a job listener printing
 *                               every job's wall time + description
 *
 * All output lines start with R6 for greppability. This main is additive:
 * Bench.scala / Verify.scala are frozen (driver contract).
 */
object R6Probe {

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "crawl"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.session(cpus)

    mode match {
      case "crawl" | "crawlsemi" =>
        val n = if (args.length > 1) args(1).toLong else 1500000L
        val batches = if (args.length > 2) args(2).toInt else 2
        val rep = 50
        graft.Bench.corpus(spark, n, rep).count()
        // warmup (JIT/codegen) exactly like ScalingProbe
        graft.Bench.crawlBench(spark, 50000L, cpus, 1, rep)
        val bcast = mode == "crawl"
        val (f, dt, phases) = graft.Bench.crawlBenchWith(
          spark, graft.Bench.corpus(spark, n, rep), cpus, batches,
          broadcastSched = bcast)
        println(f"R6 PROBE mode=$mode pages=$n fetched=$f sec=$dt%.2f tp=${f / dt}%.0f")
        println("R6 PHASES " + phases.toSeq.sortBy(-_._2)
          .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))

      case "head" =>
        val n = 1500000L
        val rep = 50
        val pages = graft.Bench.corpus(spark, n, rep)
        pages.count()
        def bounded(head: Boolean): (Double, Map[String, Double]) = {
          val preload = graft.Bench.preloadFrontier(pages)
          val stateDir = java.nio.file.Files.createTempDirectory(s"graft_r6h_$head").toString
          val eng = new graft.crawl.CrawlEngine(spark, pages, stateDir,
            graft.crawl.CrawlConfig(
              defaultHostBudget = 16, defaultDelayMs = 0L,
              maxDepth = 8, saltBuckets = 1, shufflePartitions = cpus * 2,
              bloomMinSeen = 100000, broadcastScheduled = true,
              detailedMetrics = false, corpusUnique = true,
              compactEvery = 4, headTable = head))
          eng.initializeWithFrontier(preload)
          val t0 = System.nanoTime()
          eng.run(6)
          val dt = (System.nanoTime() - t0) / 1e9
          val ph = eng.timingTotals
          try graft.crawl.StateStore.deleteRecursively(java.nio.file.Paths.get(stateDir))
          catch { case _: Throwable => }
          (dt, ph)
        }
        bounded(head = false); bounded(head = true) // warmups
        for (i <- 1 to 2; h <- Seq(false, true)) {
          val (dt, ph) = bounded(h)
          println(f"R6 HEAD pair=$i head=$h sec=$dt%.2f")
          println("R6 HEADPHASES head=" + h + " " + ph.toSeq.sortBy(-_._2)
            .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
        }

      case "headjob" =>
        // one bounded crawl with a per-job listener: where do the ~4 s/batch go?
        val pages = graft.Bench.corpus(spark, 1500000L, 50)
        pages.count()
        def engRun(): Unit = {
          val stateDir = java.nio.file.Files.createTempDirectory("graft_r6hj").toString
          val eng = new graft.crawl.CrawlEngine(spark, pages, stateDir,
            graft.crawl.CrawlConfig(
              defaultHostBudget = 16, defaultDelayMs = 0L,
              maxDepth = 8, saltBuckets = 1, shufflePartitions = cpus * 2,
              bloomMinSeen = 100000, broadcastScheduled = true,
              detailedMetrics = false, corpusUnique = true,
              compactEvery = 4, headTable = false))
          eng.initializeWithFrontier(graft.Bench.preloadFrontier(pages))
          eng.run(6)
          try graft.crawl.StateStore.deleteRecursively(java.nio.file.Paths.get(stateDir))
          catch { case _: Throwable => }
        }
        engRun() // warm
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            val nTasks = j.stageInfos.map(_.numTasks).sum
            starts.put(j.jobId, (System.nanoTime(), site, nTasks))
          }
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, site, nTasks) = Option(starts.get(j.jobId)).getOrElse((0L, "?", 0))
            println(f"R6 JOB wall=${(System.nanoTime() - t0) / 1e9}%7.3f tasks=$nTasks%4d $site")
          }
        })
        val t0 = System.nanoTime()
        engRun()
        println(f"R6 HEADJOB total=${(System.nanoTime() - t0) / 1e9}%.2f")

      case "parse" =>
        // PROBE3 twin: memory-resident parse throughput (200k x 30KB pages)
        import org.apache.spark.sql.functions._
        val big = graft.Bench.corpus(spark, 200000L, 250).select(col("html"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        big.count()
        val runs = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          big.select(graft.functions.gf.extract_parsed(col("html")).as("p"))
            .agg(sum(length(col("p.text")))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"R6 PARSE sec_min=${runs.min}%.2f tp=${200000L / runs.min}%.0f runs=${runs.map(r => f"$r%.2f").mkString(",")}")

      case "fetchparts" =>
        // decompose the fetch+parse+write stage (guide §1.4 noop isolation):
        // scan-only, scan+parse, scan+BHJ(sched)+parse, and the full write.
        import org.apache.spark.sql.functions._
        val n = if (args.length > 1) args(1).toLong else 1500000L
        val rep = 50
        val pages = graft.Bench.corpus(spark, n, rep)
        pages.count()
        val canon = pages.withColumn("url_canon", graft.functions.gf.canonicalize_url(col("url")))
        val sched = graft.Bench.preloadFrontier(pages)
          .withColumn("fetch_ordinal", lit(1)).withColumn("sched_delay_ms", lit(0L))
          .persist()
        sched.count()
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def t(label: String)(f: => Unit): Unit = {
          f // warm
          val t0 = System.nanoTime(); f
          println(f"R6 PART $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
        t("scan6col")(noop(canon.select("url_canon", "warc_ts", "html", "text", "lang")))
        t("scan_parse")(noop(canon.select(col("url_canon"),
          graft.functions.gf.extract_parsed(col("html")).as("p"))))
        val slim = sched.select("url_canon", "url_hash", "host", "seed_id",
          "depth", "since_ts", "end_ts", "fetch_ordinal", "sched_delay_ms")
        t("bhj_parse")(noop(canon.join(broadcast(slim), Seq("url_canon"))
          .select(col("url_canon"), col("seed_id"),
            graft.functions.gf.extract_parsed(col("html")).as("p"))))
        t("bhj_parse_proj")(noop {
          val j = canon.join(broadcast(slim), Seq("url_canon"))
          j.withColumn("_p", graft.functions.gf.extract_parsed(col("html")))
            .select(col("url_canon"), col("url_hash"), col("host"), col("seed_id"),
              col("depth"), col("since_ts"), col("end_ts"), col("warc_ts"), col("lang"),
              col("_p").getField("text").as("text_extracted"),
              col("_p").getField("outlinks").as("outlinks"),
              (col("_p").getField("text") <=> col("text")).as("invariant_ok"),
              col("fetch_ordinal"), col("sched_delay_ms"))
        })
        t("bhj_parse_write") {
          val j = canon.join(broadcast(slim), Seq("url_canon"))
          j.withColumn("_p", graft.functions.gf.extract_parsed(col("html")))
            .select(col("url_canon"), col("url_hash"), col("host"), col("seed_id"),
              col("depth"), col("since_ts"), col("end_ts"), col("warc_ts"), col("lang"),
              col("_p").getField("text").as("text_extracted"),
              col("_p").getField("outlinks").as("outlinks"),
              (col("_p").getField("text") <=> col("text")).as("invariant_ok"),
              col("fetch_ordinal"), col("sched_delay_ms"))
            .write.mode("overwrite").option("compression", "snappy")
            .parquet("/tmp/graft_r6_fetchparts")
        }

      case "pack" =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val prefix = if (args.length > 1) args(1) else ""
        val fixtureSec = graft.SparkEntry.prepareFixtures(spark, sfDir)
        println(f"R6 FIXTURE sec=$fixtureSec%.2f")
        val nJobs = new java.util.concurrent.atomic.AtomicInteger()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            nJobs.incrementAndGet()
        })
        var total = 0.0
        graft.SparkEntry.queries.toSeq.sortBy(_._1)
          .filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
            val j0 = nJobs.get()
            val t0 = System.nanoTime()
            try fn(spark, sfDir).count() catch { case e: Throwable =>
              println(s"R6 QERR $name ${e.getMessage.take(100)}") }
            val dt = (System.nanoTime() - t0) / 1e9
            total += dt
            println(f"R6 Q $name%-28s sec=$dt%7.2f jobs=${nJobs.get() - j0}%4d")
          }
        println(f"R6 PACKTOTAL sec=$total%.2f")

      case "jobs" =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val qname = args(1)
        graft.SparkEntry.prepareFixtures(spark, sfDir)
        val fn = graft.SparkEntry.queries(qname)
        fn(spark, sfDir).count() // warm run (codegen/JIT)
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            val nTasks = j.stageInfos.map(_.numTasks).sum
            starts.put(j.jobId, (System.nanoTime(), site, nTasks))
          }
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, site, nTasks) = Option(starts.get(j.jobId)).getOrElse((0L, "?", 0))
            println(f"R6 JOB id=${j.jobId}%4d wall=${(System.nanoTime() - t0) / 1e9}%6.3f tasks=$nTasks%3d $site")
          }
        })
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"R6 JOBTOTAL $qname sec=${(System.nanoTime() - t0) / 1e9}%.2f")

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
