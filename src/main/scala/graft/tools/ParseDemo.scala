package graft.tools

import graft.functions.gf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Tiny CLI surface for the parser expressions: runs the custom Catalyst
 * expressions over a DataFrame (whole-stage codegen path) and prints the
 * extracted fields. Usage: runMain graft.tools.ParseDemo ["<html>"...]
 */
object ParseDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-parse-demo")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val htmls =
      if (args.nonEmpty) args.toSeq
      else Seq(
        """今天天气不错<span class="surl-text">#天气#</span>转发<a href="/n/小明">@小明</a>了""",
        """a<br>b<!-- hidden --><a href="https://h1.example.test/p/1">link</a>""",
        "  \t")

    val df = htmls.toDF("html")
      .withColumn("text", gf.extract_text($"html"))
      .withColumn("topics", gf.extract_topics($"html"))
      .withColumn("at_users", gf.extract_at_users($"html"))
      .withColumn("outlinks", gf.extract_outlinks(encode($"html", "UTF-8")))
      .withColumn("canon", gf.canonicalize_url(lit("HTTP://Example.COM:80/a/./b/../c?q=1#f")))
      .withColumn("counts", gf.string_to_int_cjk(lit("28万+")))
    df.explain("formatted")
    df.show(truncate = false)
    spark.stop()
  }
}
