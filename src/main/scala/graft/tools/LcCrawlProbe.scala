package graft.tools

/** Focused e2e lc-crawl pair (1x8 vs 4x8) — A/B the fetch paths' scaling
  * without a full bench. Usage: runMain graft.tools.LcCrawlProbe [nPages] */
object LcCrawlProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 6000000L
    val runs = Seq(1, 4, 4, 1).map(nx => nx -> graft.Bench.lcCrawl(nx, n, 50))
    runs.foreach { case (nx, r) =>
      println(f"LCCRAWL nx=$nx tp=${r.tp}%.0f sec=${r.sec}%.1f phases=" +
        r.phases.toSeq.sortBy(-_._2).take(4).map { case (k, v) => f"$k=$v%.1f" }.mkString(","))
    }
    def best(nx: Int) = runs.collect { case (`nx`, r) => r.tp }.max
    println(f"LCCRAWL eff=${best(4) / (4 * best(1))}%.3f tp1=${best(1)}%.0f tp4=${best(4)}%.0f")
  }
}
