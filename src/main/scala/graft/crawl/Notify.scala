package graft.crawl

/**
 * U6 — crawl-health notifier (/root/reference/util/notify.py:5-11 push_deer;
 * fired on anomalies: possible-invalid-cookie validation failures with
 * duplicate suppression, weibo.py:436-450, and the hard cookie-invalid exit,
 * weibo.py:1804). Driver-side side effect, exactly like the reference — the
 * transport is a trait (the container ships no network); a real deployment
 * implements it over the push HTTP API.
 */
trait Notifier {
  def notify(message: String): Unit
}

object Notifier {
  /** default: no-op (notifications disabled — the reference's enable flag). */
  val none: Notifier = (_: String) => ()
}

/** In-memory capture transport for tests and local runs. */
class CapturingNotifier extends Notifier {
  val messages = new scala.collection.mutable.ArrayBuffer[String]()
  override def notify(message: String): Unit = synchronized { messages += message }
}
