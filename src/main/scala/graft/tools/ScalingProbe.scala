package graft.tools
import org.apache.spark.sql.SparkSession
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val rep = args(2).toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // untimed warmup: a small crawl compiles the hot paths (whole-stage
    // codegen, parser JIT, parquet decode) so the timed run measures the
    // steady state, not cold-JVM compilation
    graft.Bench.crawlBench(s, 50000L, cpus, 1, rep)
    val (f, dt) = graft.Bench.crawlBench(s, n, cpus, 2, rep)
    println(f"PROBE cpus=$cpus fetched=$f sec=$dt%.2f tp=${f / dt}%.0f")

    // fetch+parse stage in isolation (corpus scan → fused parse → agg):
    // the per-page compute path without scheduling/commit orchestration
    import org.apache.spark.sql.functions._
    import s.implicits._
    val corpusDf = graft.Bench.corpus(s, n, rep)
    corpusDf.count() // warm file listing
    val t0 = System.nanoTime()
    val parsedChars = corpusDf
      .select(graft.functions.gf.extract_parsed($"html").as("p"))
      .agg(sum(length($"p.text")), sum(size($"p.outlinks"))).collect()(0)
    val pdt = (System.nanoTime() - t0) / 1e9
    println(f"PROBE2 cpus=$cpus pages=$n sec=$pdt%.2f tp=${n / pdt}%.0f chars=${parsedChars.getLong(0)}")

    // parse compute alone: realistic 30KB pages, memory-resident input
    // (no disk, no shuffle) — the per-core parser scaling ceiling
    val n3 = 200000L
    val big = graft.Bench.corpus(s, n3, 250).select($"html")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    big.count()
    val runs = (1 to 2).map { _ =>
      val t1 = System.nanoTime()
      big.select(graft.functions.gf.extract_parsed($"html").as("p"))
        .agg(sum(length($"p.text"))).collect()
      (System.nanoTime() - t1) / 1e9
    }
    val p3 = runs.min
    println(f"PROBE3 cpus=$cpus pages=$n3 sec=$p3%.2f tp=${n3 / p3}%.0f")
    s.stop()
  }
}
