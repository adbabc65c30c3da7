package graft.tools

import graft.crawl.{CrawlConfig, CrawlEngine, PagesGen}
import graft.functions.gf
import org.apache.spark.sql.SparkSession

/** Scratch smoke for Bench phase-3 extras (head probe / paced probe /
  * simhash64 line) at tiny scale — isolates failures the buffered bench
  * output hides. Not part of the bench contract. */
object Phase3Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    val benchPages = 60000L

    println("=== simhash64 line ===")
    graft.pipeline.Dedup.simhashNearDups64(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("doc_id") < 1000), maxDist = 3).count()
    println("simhash64 OK")

    println("=== paced probe ===")
    val (uf, ud, _) = graft.Bench.crawlBench(spark, benchPages, 8, 2, 8)
    val (pf, pd, _) = graft.Bench.crawlBench(spark, benchPages, 8, 2, 8, paced = true)
    println(s"paced OK unpaced=${uf / ud} paced=${pf / pd}")

    println("=== head probe ===")
    def boundedCrawl(head: Boolean): Double = {
      val pages = graft.Bench.corpus(spark, benchPages, 8)
      val preload = graft.Bench.preloadFrontier(pages)
      val stateDir = java.nio.file.Files.createTempDirectory(s"graft_head_$head").toString
      val eng = new CrawlEngine(spark, pages, stateDir, CrawlConfig(
        defaultHostBudget = 16, defaultDelayMs = 0L,
        maxDepth = 8, saltBuckets = 1, shufflePartitions = 16,
        bloomMinSeen = 100000, broadcastScheduled = true,
        detailedMetrics = false, corpusUnique = true,
        compactEvery = 4, headTable = head))
      eng.initializeWithFrontier(preload)
      val t0 = System.nanoTime()
      eng.run(6)
      val dt = (System.nanoTime() - t0) / 1e9
      try graft.crawl.StateStore.deleteRecursively(java.nio.file.Paths.get(stateDir))
      catch { case _: Throwable => }
      dt
    }
    val full = boundedCrawl(head = false)
    val headSec = boundedCrawl(head = true)
    println(s"head OK full=$full head=$headSec")
    spark.stop()
  }
}
