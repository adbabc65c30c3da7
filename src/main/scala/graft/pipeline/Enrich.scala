package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

/** The enrichment result struct the reference merges into each row
  * (`llm_analysis`, /root/reference/util/llm_analyzer.py:89-111). */
case class LlmAnalysis(sentiment: String, summary: String, anomaly: Boolean)

case class EnrichInput(doc_id: Long, text: String)
case class Enriched(doc_id: Long, text: String, llm_analysis: LlmAnalysis)

/**
 * Per-row LLM enrichment as a batched partition-local stage (SURVEY.md §2.8
 * U2). The reference calls an HTTP LLM API once per row inside the parse loop
 * (weibo.py:1341-1343 → util/llm_analyzer.py:89-111) — a latency-bound N+1.
 * Here the client is created ONCE per partition and fed `batchSize`-row
 * batches, so a real HTTP/RPC client amortizes connection setup and can use
 * server-side batching; swapping the stub for a real client changes no plan
 * shape (same lifecycle as Multimodal.extractFeatures).
 */
trait LlmClient extends AutoCloseable {
  /** analyze a batch of texts; must return one result per input, in order. */
  def analyzeBatch(texts: Seq[String]): Seq[LlmAnalysis]
  def close(): Unit = ()
}

/**
 * Deterministic STUB client — pure functions of the text (no network, no
 * randomness) so results are replayable and the DuckDB oracle can recompute
 * them exactly:
 *   sentiment: word-count mod 3 → positive / neutral / negative;
 *   summary:   first 8 whitespace tokens re-joined;
 *   anomaly:   degenerate docs (< 5 or > 100 words).
 * A production client implements the same trait over HTTP.
 */
class StubLlmClient extends LlmClient {
  override def analyzeBatch(texts: Seq[String]): Seq[LlmAnalysis] = texts.map { t =>
    val words = if (t == null) Array.empty[String] else t.split(" ").filter(_.nonEmpty)
    val sentiment = (words.length % 3) match {
      case 0 => "positive"
      case 1 => "neutral"
      case _ => "negative"
    }
    LlmAnalysis(sentiment, words.take(8).mkString(" "),
      anomaly = words.length < 5 || words.length > 100)
  }
}

object Enrich {

  /**
   * Enrichment stage: adds an `llm_analysis struct<sentiment,summary,anomaly>`
   * column. `mapPartitions`, never a per-row UDF: one client per partition,
   * one RPC per `batchSize` rows — the only correct shape for a remote-model
   * stage at scale (10^10 rows × per-row HTTP would be the reference's N+1
   * at cluster size).
   */
  def enrich(docs: Dataset[EnrichInput],
      clientFactory: () => LlmClient = () => new StubLlmClient,
      batchSize: Int = 32): Dataset[Enriched] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { rows =>
      val client = clientFactory() // partition-local lifecycle
      // close via the task-completion listener, NOT an iterator-drain hook
      // (ADVICE r2): a downstream limit/take or a task failure mid-partition
      // never exhausts the iterator — a drain hook would leak one client
      // (connection pool) per such task. The listener fires on success,
      // failure, and cancellation alike.
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      rows.grouped(batchSize).flatMap { batch =>
        val results = client.analyzeBatch(batch.map(_.text))
        batch.iterator.zip(results.iterator).map { case (r, a) => Enriched(r.doc_id, r.text, a) }
      }
    }
  }

  /** DataFrame convenience over (idCol, textCol). */
  def enrichDf(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    enrich(df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[EnrichInput]).toDF()
  }
}
