package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.gf

/**
 * Measures the parsed-log write (the crawl's dominant phase, sink-bandwidth
 * bound per BENCH_LOCAL.json `sink_scaling`) under candidate parquet codecs.
 *
 * The written DataFrame is the REAL parsed-log projection: the bench corpus
 * pages pushed through the same fused `extract_parsed` expression and the
 * same column set `runBatch` writes (CrawlEngine.scala `write_parsed`),
 * cached in memory first so each timed run is the write alone — encode +
 * compress + disk, no parse CPU.
 *
 * Codecs run as adjacent interleaved rounds (snappy, zstd, lz4 per round)
 * so the VM's minute-scale drift cancels within a round; report per-codec
 * median sec and output bytes.
 *
 * Usage: CodecProbe [nPages] [cpus] [rounds]
 */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 1500000L
    val cpus = if (args.length > 1) args(1).toInt else 8
    val rounds = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-codec-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = graft.Bench.corpus(spark, 6000000L, 50)
      .limit(nPages.toInt)
    // the parsed-log projection from runBatch, with scheduling lineage
    // columns stamped as constants (they are small fixed-width columns;
    // the bytes live in text_extracted / outlinks / urls)
    val base = new java.sql.Timestamp(graft.crawl.PagesGen.BaseTsMillis)
    val parsed = corpus
      .withColumn("url_canon", gf.canonicalize_url($"url"))
      .withColumn("url_hash", xxhash64($"url_canon"))
      .withColumn("host", regexp_extract($"url_canon", "^https?://([^/]+)/", 1))
      .withColumn("seed_id", concat(lit("seed"), ($"url_hash" % 1024).cast("string")))
      .withColumn("depth", lit(1))
      .withColumn("since_ts", lit(base)).withColumn("end_ts", lit(base))
      .withColumn("found", lit(true)).withColumn("in_range", lit(true))
      .withColumn("_p", gf.extract_parsed($"html"))
      .withColumn("text_extracted", $"_p.text")
      .withColumn("outlinks", $"_p.outlinks")
      .withColumn("invariant_ok", lit(true))
      .withColumn("batch_id", lit(1L))
      .withColumn("partition_id", spark_partition_id())
      .withColumn("fetch_ordinal", lit(1L))
      .withColumn("sched_delay_ms", lit(0L))
      .withColumn("paced_at_ms", lit(null).cast("long"))
      .select($"url_canon", $"url_hash", $"host", $"seed_id", $"depth",
        $"since_ts", $"end_ts", $"warc_ts", $"lang", $"found", $"in_range",
        $"invariant_ok", $"text_extracted", $"outlinks",
        $"batch_id", $"partition_id", $"fetch_ordinal", $"sched_delay_ms",
        $"paced_at_ms")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = parsed.count()
    println(s"cached parsed rows=$n")

    val codecs = Seq("snappy", "zstd", "lz4")
    val out = "/tmp/graft_codec_probe_out"
    val secs = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    val bytes = scala.collection.mutable.Map[String, Long]()
    // one discarded warmup write (JIT for the write path)
    parsed.write.mode("overwrite").parquet(out)
    for (r <- 1 to rounds; c <- if (r % 2 == 0) codecs.reverse else codecs) {
      val t0 = System.nanoTime()
      parsed.write.mode("overwrite").option("compression", c).parquet(out)
      val sec = (System.nanoTime() - t0) / 1e9
      val sz = {
        val d = new java.io.File(out)
        d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      }
      secs(c) = secs(c) :+ sec
      bytes(c) = sz
      println(f"round=$r codec=$c sec=$sec%.1f bytes=${sz / 1e6}%.0fMB")
    }
    def med(xs: List[Double]) = { val s = xs.sorted; s(s.size / 2) }
    codecs.foreach { c =>
      println(f"""CODEC {"codec":"$c","median_sec":${med(secs(c))}%.2f,"bytes":${bytes(c)},"runs":[${secs(c).map(s => f"$s%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
