package graft.tools

import graft.Bench
import org.apache.spark.sql.SparkSession

/** A/B probe for the frontier-adds dedup plan (CrawlConfig.addsDedup):
  * "agg" (min_by hash aggregate, map-side combine before the dedup shuffle)
  * vs "window" (row_number — every duplicate rides the shuffle). Estimator
  * per BASELINE.md: one DISCARDED warmup per arm (each plan pays its own
  * codegen), then alternating adjacent (A,B) pairs sharing a noise window,
  * verdict = median of per-pair ratios. Reports the write_fr_adds phase and
  * the e2e crawl seconds per run. Args: [nPages] [cpus] [batches]
  * [bodyRepeat] [pairs]. */
object AddsDedupProbe {
  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(1500000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val batches = args.lift(2).map(_.toInt).getOrElse(4)
    val bodyRepeat = args.lift(3).map(_.toInt).getOrElse(50)
    val pairs = args.lift(4).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-adds-dedup-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = Bench.corpus(spark, nPages, bodyRepeat)
    def run(mode: String): (Double, Double) = {
      val (fetched, sec, phases) =
        Bench.crawlBenchWith(spark, pages, cpus, batches, addsDedup = mode)
      val adds = phases.getOrElse("write_fr_adds", 0.0)
      println(f"[addsprobe] mode=$mode sec=$sec%.1f write_fr_adds=$adds%.1f " +
        f"fetched=$fetched tp=${fetched / sec}%.0f")
      (sec, adds)
    }
    run("window"); run("agg") // discarded warmups (one per arm)
    val runs = (0 until pairs).flatMap { i =>
      val flip = i % 2 == 1 // alternate order within adjacent pairs
      val modes = if (flip) Seq("agg", "window") else Seq("window", "agg")
      modes.map(m => m -> run(m))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val ratiosSec = (0 until pairs).map { i =>
      val p = runs.slice(i * 2, i * 2 + 2).toMap
      p("agg")._1 / p("window")._1
    }
    val ratiosAdds = (0 until pairs).map { i =>
      val p = runs.slice(i * 2, i * 2 + 2).toMap
      p("agg")._2 / p("window")._2
    }
    println(f"[addsprobe] RESULT agg_over_window_sec=${med(ratiosSec)}%.3f " +
      f"agg_over_window_adds=${med(ratiosAdds)}%.3f " +
      s"sec_ratios=${ratiosSec.map(r => f"$r%.3f").mkString(",")} " +
      s"adds_ratios=${ratiosAdds.map(r => f"$r%.3f").mkString(",")}")
    spark.stop()
  }
}
