package graft.tools

import graft.crawl.StateStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: does a k-key pushdown probe survive parquet filter evaluation?
  * Binary-searches the stack-depth limit of the OR-chain translation. */
object KeyProbeSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_kps").toString
    val store = new StateStore(spark, dir)
    val rows = spark.range(0, 200000)
      .select(xxhash64(col("id")).as("url_hash"), col("id").as("payload"))
    store.writeBase("t", 0L, rows, clusterPartitions = 16)
    val allKeys = rows.select("url_hash").collect().map(_.getLong(0))
    for (k <- Seq(256, 1024, 2048, 4096)) {
      graft.crawl.CrawlEngine.withProbeThreshold(spark, k) {
        val t0 = System.nanoTime()
        try {
          val n = store.readViewKeyed("t", 0L, rows.limit(0), allKeys.take(k)).count()
          println(f"k=$k OK n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch {
          case e: Throwable => println(s"k=$k FAILED: ${e.getClass.getName} ${String.valueOf(e.getMessage).take(120)}")
        }
      }
    }
    spark.stop()
  }
}
