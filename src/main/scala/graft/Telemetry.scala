package graft

/** In-process telemetry events for the bench artifact. Operators that make
  * runtime tier/iteration decisions (the CC boundary resolve, the skew-join
  * gate) record one short event string per decision; Bench drains the queue
  * after each timed sample and files the events under that sample's key, so
  * a timing move can be read against WHAT the operator actually did in that
  * run (tier flapping, extra rounds, hot-key count) instead of guessed at.
  *
  * Concurrent-safe and allocation-light; a no-op cost when nothing drains
  * it (Verify and production callers just let events fall out on clear).
  */
object Telemetry {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def record(event: String): Unit = q.add(event)

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var e = q.poll()
    while (e != null) { out += e; e = q.poll() }
    out.result()
  }
}
