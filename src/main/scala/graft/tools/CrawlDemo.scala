package graft.tools

import graft.crawl._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end drive surface for the crawl engine: synthesizes the pages
 * corpus, runs N micro-batches (resumable — rerun with the same state dir to
 * continue), prints the ledger and a sample of fetched lineage.
 *
 * Usage: runMain graft.tools.CrawlDemo [nPages] [batches] [stateDir]
 */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2048L
    val batches = if (args.length > 1) args(1).toInt else 4
    val stateDir = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft_crawl_demo").toString

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-crawl-demo")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = PagesGen.pages(spark, n, 32).toDF().persist()
    val eng = new CrawlEngine(spark, pages, stateDir,
      CrawlConfig(defaultHostBudget = 8,
        perHostBudget = Map("h0.example.test" -> 32), // mega-host: bigger but bounded
        maxDepth = 16, shufflePartitions = 32))
    if (eng.store.committedBatch < 0) {
      eng.initialize(PagesGen.seedRows(n, 8).map(Seed.tupled))
      println(s"[crawl-demo] initialized state at $stateDir")
    } else {
      println(s"[crawl-demo] resuming at committed batch ${eng.store.committedBatch}")
    }
    val t0 = System.nanoTime()
    val ms = eng.run(batches)
    val dt = (System.nanoTime() - t0) / 1e9
    ms.foreach(m => println("[crawl-demo] " + m.toSeq.sortBy(_._1).mkString(", ")))
    val totalFetched = ms.map(_("fetched")).sum
    println(f"[crawl-demo] fetched $totalFetched urls in $dt%.1f s = ${totalFetched / dt}%.1f urls/s")
    eng.ledger().foreach(_.orderBy("batch_id").show(100, truncate = false))
    eng.fetched().foreach(_.orderBy(desc("batch_id"), asc("host"), asc("fetch_ordinal"))
      .select("batch_id", "partition_id", "fetch_ordinal", "host", "url_canon", "warc_ts")
      .show(10, truncate = false))
    spark.stop()
  }
}
