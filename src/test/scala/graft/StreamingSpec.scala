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
}
