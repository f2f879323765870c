package graft

/** In-process telemetry events for the bench artifact. Operators that make
  * runtime tier/iteration decisions (the CC boundary resolve, the skew-join
  * gate) record one short event string per decision; Bench drains the queue
  * after each timed sample and files the events under that sample's key, so
  * a timing move can be read against WHAT the operator actually did in that
  * run (tier flapping, extra rounds, hot-key count) instead of guessed at.
  *
  * Concurrent-safe and allocation-light. Callers that never drain (Verify,
  * a long-lived production session) are protected by [[MaxEvents]]: past
  * the cap the OLDEST events are discarded, so the queue is a bounded ring
  * rather than a slow leak.
  */
object Telemetry {
  /** Bound on retained events — generous for a bench sample (tens of
    * events) while capping a never-drained process at a few MB worst case.
    */
  val MaxEvents = 8192

  private val q = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val size = new java.util.concurrent.atomic.AtomicInteger(0)

  def record(event: String): Unit = {
    q.add(event)
    if (size.incrementAndGet() > MaxEvents && q.poll() != null)
      size.decrementAndGet()
  }

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var e = q.poll()
    while (e != null) { out += e; size.decrementAndGet(); e = q.poll() }
    out.result()
  }
}
