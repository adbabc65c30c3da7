package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused e2e lc-crawl pair over the BUCKETED corpus table (the production
  * fetch shape). Phase A writes the bucketed table once; phase B runs
  * interleaved 1x8/4x8 pairs. Usage: runMain graft.tools.LcBucketProbe [nPages] */
object LcBucketProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 6000000L
    val rep = 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.warehouse.dir", "/tmp/graft_wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.ensureBucketedCorpus(spark, n, rep)
    spark.stop()
    val runs = Seq(1, 4, 4, 1).map(nx => nx -> graft.Bench.lcCrawl(nx, n, rep, mode = "crawlb"))
    runs.foreach { case (nx, r) =>
      println(f"LCB nx=$nx tp=${r.tp}%.0f sec=${r.sec}%.1f phases=" +
        r.phases.toSeq.sortBy(-_._2).take(4).map { case (k, v) => f"$k=$v%.1f" }.mkString(","))
    }
    def best(nx: Int) = runs.collect { case (`nx`, r) => r.tp }.max
    println(f"LCB eff=${best(4) / (4 * best(1))}%.3f tp1=${best(1)}%.0f tp4=${best(4)}%.0f")
  }
}
