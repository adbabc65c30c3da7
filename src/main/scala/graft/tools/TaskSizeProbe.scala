package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}

/** Hunt oversized task closures: run the bench's in-session crawl
  * (the regime where the 3.5 MiB large-task warning appears) with a
  * listener that records every stage's callsite, so a TaskSetManager
  * size warning can be mapped to the engine line that built the stage.
  * Usage: runMain graft.tools.TaskSizeProbe [nPages] [paced]
  */
object TaskSizeProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1500000L
    val paced = args.contains("paced")
    val spark = graft.Bench.session(32)
    val sites = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        sites.put(e.stageInfo.stageId, e.stageInfo.details.linesIterator
          .filter(_.contains("graft")).take(3).mkString(" <- "))
    })
    val (f, d, _) = graft.Bench.crawlBench(spark, n, 32, 2, 50, paced = paced)
    println(f"TASKPROBE fetched=$f sec=$d%.1f")
    // the TaskSetManager warning goes to the log; dump every stage callsite
    // so the warned stage id resolves to an engine line
    import scala.jdk.CollectionConverters._
    sites.asScala.toSeq.sortBy(_._1).foreach { case (id, site) =>
      println(s"STAGE $id :: $site")
    }
    spark.stop()
  }
}
