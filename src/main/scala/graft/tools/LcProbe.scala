package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused local-cluster probe: the scan+parse stage under real executor
  * JVMs at 1x8 vs 4x8 (no state writes, no sink) — run standalone to place
  * the e2e crawl's flat write_parsed phase without re-running the whole
  * bench. Usage: runMain graft.tools.LcProbe [nPages] [bodyRepeat] */
object LcProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 6000000L
    val rep = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.corpus(spark, n, rep).count()
    spark.stop()
    val runs = Seq(1, 4, 4, 1).map(nx => nx -> graft.Bench.lcStage(nx, n, rep))
    runs.foreach { case (nx, tp) => println(f"LCSTAGE nx=$nx tp=$tp%.0f") }
    def best(nx: Int) = runs.collect { case (`nx`, t) => t }.max
    println(f"LCSTAGE eff=${best(4) / (4 * best(1))}%.3f tp1=${best(1)}%.0f tp4=${best(4)}%.0f")
  }
}
