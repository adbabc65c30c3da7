package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A user's event for stateful sessionization. */
case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long)

/** Accumulated session state per user (the streaming analog of the
  * scheduler-interval bookkeeping, /root/reference/service.py:1279-1288). */
case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)

/** Emitted per user when the stream batch completes. */
case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)

/**
 * Structured Streaming surface (SURVEY.md §1.3): windowed watermark
 * aggregation lives in SparkEntry q60; this module adds the custom-state
 * path — `flatMapGroupsWithState` sessionization — for streams whose
 * semantics the built-in window operators can't express.
 *
 * Determinism note: within a micro-batch, group values arrive unordered, so
 * the update function sorts by (ts, event_id) before folding — identical
 * results at any parallelism (same contract as the batch
 * QueryPack.sessionize, asserted by StreamingSpec).
 */
object StreamOps {

  val GapSeconds = 1800L

  def updateSessions(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[SessionState]): Iterator[SessionSummary] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val t = e.ts.getTime / 1000
      st =
        if (st.lastTs == Long.MinValue) SessionState(t, 1L, st.nEvents + 1)
        else if (t - st.lastTs > GapSeconds) SessionState(t, st.nSessions + 1, st.nEvents + 1)
        else SessionState(t, st.nSessions, st.nEvents + 1)
    }
    state.update(st)
    Iterator(SessionSummary(userId, st.nSessions, st.nEvents))
  }

  /** Run gap-based sessionization over a parquet-backed stream of events and
    * return the final per-user summaries (memory sink, drained synchronously
    * — the hermetic-test harness shape from the Spark streaming guide). */
  def sessionizeStream(spark: SparkSession, dir: String, queryName: String = "graft_sessions"): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.catalog.dropTempView(queryName)
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id")
      .as[UserEvent]
    val q = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateSessions)
      .toDF()
      .writeStream.format("memory").queryName(queryName)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // update-mode memory sink may hold multiple emissions per key (one per
    // micro-batch); the latest wins — same MERGE semantics as everywhere else
    graft.operators.QueryPack.latestWins(
      spark.table(queryName), Seq("user_id"), Seq(col("n_events").desc))
  }
}
