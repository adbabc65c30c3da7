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
    val (f, dt) = graft.Bench.crawlBench(s, n, cpus, 2, rep)
    println(f"PROBE cpus=$cpus fetched=$f sec=$dt%.2f tp=${f/dt}%.0f")
    s.stop()
  }
}
