package graft.tools

import graft.Bench
import graft.crawl.{CrawlConfig, CrawlEngine}
import org.apache.spark.sql.SparkSession

/** A/B probe for the head-table scheduling path (VERDICT r4 item 1): the
  * politeness-bounded bench crawl with and without the head table, printing
  * wall seconds, the rank stage's scan-input rows, and the engine phase
  * decomposition. Args: [nPages] [cpus] [batches] [bodyRepeat]. */
object HeadProbe {
  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(400000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(16)
    val batches = args.lift(2).map(_.toInt).getOrElse(6)
    val bodyRepeat = args.lift(3).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-head-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(head: Boolean): (Double, Long) = {
      val pages = Bench.corpus(spark, nPages, bodyRepeat)
      val preload = Bench.preloadFrontier(pages)
      val stateDir = java.nio.file.Files.createTempDirectory(s"graft_hp_$head").toString
      val eng = new CrawlEngine(spark, pages, stateDir, CrawlConfig(
        defaultHostBudget = 16, defaultDelayMs = 0L,
        maxDepth = 8, saltBuckets = 1, shufflePartitions = cpus * 2,
        bloomMinSeen = 100000, broadcastScheduled = true,
        detailedMetrics = false, corpusUnique = true,
        compactEvery = 4, headTable = head))
      eng.initializeWithFrontier(preload)
      val t0 = System.nanoTime()
      eng.run(batches)
      val dt = (System.nanoTime() - t0) / 1e9
      val rankRows = if (head) eng.headRows else eng.frontier().count()
      println(s"[headprobe] head=$head sec=${math.round(dt * 10) / 10.0} rank_rows=$rankRows " +
        eng.timingTotals.map { case (k, v) => s"$k=${math.round(v * 10) / 10.0}" }.mkString(" "))
      try graft.crawl.StateStore.deleteRecursively(java.nio.file.Paths.get(stateDir))
      catch { case _: Throwable => }
      (dt, rankRows)
    }
    // interleave to share noise windows
    val f1 = run(head = false); val h1 = run(head = true)
    val h2 = run(head = true); val f2 = run(head = false)
    val (fs, hs) = (math.min(f1._1, f2._1), math.min(h1._1, h2._1))
    println(f"[headprobe] RESULT sec_full=$fs%.1f sec_head=$hs%.1f " +
      s"rank_rows_full=${f1._2} rank_rows_head=${h1._2}")
    spark.stop()
  }
}
