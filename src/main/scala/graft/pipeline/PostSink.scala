package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

/**
 * S15 — HTTP POST side-output sink (/root/reference/weibo.py:1998-2037:
 * `send_post_request_with_token` + `write_post`): the reference accumulates
 * crawled rows and POSTs them as one JSON payload to an api_url with an
 * api-token header, retrying with linear backoff and honoring the stop
 * checker between attempts.
 *
 * Spark-first shape: a `foreachPartition` sink — one client per partition
 * (connection amortized, same lifecycle discipline as Enrich/Multimodal),
 * rows serialized by Spark's own `toJSON`, shipped in `batchSize` payloads,
 * linear-backoff retries per payload. The container ships no network, so the
 * transport is a trait; the deterministic capture client stands in for HTTP
 * and lets the driver gate verify an exact round-trip (q67).
 */
trait PostClient extends AutoCloseable {
  /** deliver one JSON-lines payload; throw to trigger a retry. */
  def post(payload: Seq[String]): Unit
  def close(): Unit = ()
}

/** In-JVM capture transport (the "server"): payloads land in a static queue
  * so a local-mode test/driver gate can read back exactly what was posted.
  * A real deployment implements [[PostClient]] over HTTP with the api-token
  * header — no plan shape changes. */
class CapturePostClient(channel: String) extends PostClient {
  override def post(payload: Seq[String]): Unit =
    payload.foreach(CapturePostClient.queue(channel).add)
}

object CapturePostClient {
  private val channels =
    new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()
  private[graft] def queue(channel: String): ConcurrentLinkedQueue[String] =
    channels.computeIfAbsent(channel, _ => new ConcurrentLinkedQueue[String]())
  def drain(channel: String): Seq[String] = {
    val q = queue(channel)
    Iterator.continually(q.poll()).takeWhile(_ != null).toSeq
  }
}

/** Transport that fails the first `failures` calls per payload attempt —
  * exercises the retry/backoff path deterministically. */
class FlakyPostClient(channel: String, failures: Int) extends PostClient {
  private var remaining = failures
  override def post(payload: Seq[String]): Unit = {
    if (remaining > 0) { remaining -= 1; throw new java.io.IOException("synthetic 503") }
    payload.foreach(CapturePostClient.queue(channel).add)
  }
}

object PostSink {

  /**
   * POST every row of `df` as JSON, `batchSize` rows per payload, retrying
   * each payload up to `maxRetries` times with linear backoff
   * (weibo.py:2003-2023: `sleep(backoff_factor * (attempt + 1))`). Returns
   * the number of rows successfully posted (accumulator — exact under task
   * retries is NOT claimed, same as the reference's at-least-once POST).
   */
  def postJson(df: DataFrame, clientFactory: () => PostClient,
      batchSize: Int = 100, maxRetries: Int = 3, backoffMs: Long = 2000L): Long = {
    val acc: LongAccumulator = df.sparkSession.sparkContext.longAccumulator("rows_posted")
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      val client = clientFactory()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      rows.grouped(batchSize).foreach { payload =>
        var attempt = 0
        var done = false
        while (!done) {
          try { client.post(payload); acc.add(payload.size); done = true }
          catch {
            case _: Exception if attempt < maxRetries =>
              attempt += 1
              if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
            case e: Exception =>
              // exhausted: dropped, uncounted — but never silently (the
              // reference logs and moves on, weibo.py:2021-2023)
              System.err.println(s"[post-sink] dropping payload of " +
                s"${payload.size} rows after $maxRetries retries: ${e.getMessage}")
              done = true
          }
        }
      }
    }
    acc.value
  }
}
