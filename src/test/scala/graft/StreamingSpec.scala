package graft

import graft.operators.QueryPack
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessionization must agree with the batch operator. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("flatMapGroupsWithState sessionization == batch sessionize (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamOps.sessionizeStream(spark, dir)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val batch = QueryPack.sessionize(
        spark.read.parquet(s"$dir/events.parquet"), "user_id", "ts", "event_id", 1800)
      .groupBy("user_id")
      .agg((max("session_id") + 1).as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(streamed == batch)
  }

  test("update-mode windowed agg: watermark EVICTS state and drops late rows (VERDICT r2 #3)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_evict").toString
    val base = 1735689600000L // 2025-01-01T00:00:00Z
    def ts(h: Double) = new java.sql.Timestamp(base + (h * 3600_000L).toLong)
    // one parquet FILE per micro-batch, mtimes ordered so the file source
    // triggers them in sequence: hours 0-2, then hour 30 (advances the
    // watermark past 29), then LATE rows back at hour 1
    def addFile(name: String, rows: Seq[(Long, java.sql.Timestamp, String)], mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_evict_w").toString
      rows.toDF("event_id", "ts", "event_type").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(dir, name)
      Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    addFile("f1.parquet", Seq((1L, ts(0.5), "a"), (2L, ts(1.5), "a"), (3L, ts(2.5), "a")), 1000000L)
    addFile("f2.parquet", Seq((4L, ts(30.5), "a")), 2000000L)
    // f3 lands in the batch where the advanced watermark takes effect: state
    // eviction runs at that batch's END, so f3 still merges into the h1
    // window (documented update-mode semantics); f4 arrives after eviction
    // and is DROPPED by the watermark
    addFile("f3.parquet", Seq((5L, ts(1.2), "a")), 3000000L)
    addFile("f4.parquet", Seq((6L, ts(1.7), "a")), 4000000L)

    val schema = "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    spark.catalog.dropTempView("graft_evict_mem")
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"w.start".as("window_start"), $"event_type", $"cnt")
      .writeStream.format("memory").queryName("graft_evict_mem")
      .outputMode("update").start()
    q.processAllAvailable()
    val progress = q.recentProgress
    q.stop()
    val dropped = progress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    assert(dropped >= 1, "late rows past the watermark must be dropped, not aggregated")
    val finalState = progress.reverse.find(_.stateOperators.nonEmpty).get
      .stateOperators.map(_.numRowsTotal).sum
    assert(finalState < 4,
      s"watermark must evict closed windows — $finalState state rows retained of 4 windows seen")
    // latest-wins over the update emissions: 4 windows; h1 absorbed f3 (cnt 2,
    // pre-eviction) but NOT f4 (cnt stays < 3 — it was dropped)
    val emitted = spark.table("graft_evict_mem")
      .groupBy("window_start", "event_type").agg(max("cnt").as("cnt"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(2)).toMap
    assert(emitted.size == 4)
    assert(emitted(base + 3600_000L) == 2L, "f3 merges before eviction takes effect")
  }
}
