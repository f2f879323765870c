package graft

import org.apache.spark.sql.Dataset

/** Operator-owned cache lifecycle.
  *
  * Operators cache intermediates that back multiple branches of one
  * returned plan (LSH signatures, shingle sets, normed embeddings). The
  * cache must outlive the operator CALL — the terminal action happens in
  * the caller — so the operator itself can never unpersist. This object
  * closes that gap: operators register caches via [[CacheScope.cache]],
  * and whoever runs the terminal action wraps it in [[CacheScope.run]],
  * which unpersists every cache registered on this thread inside the
  * scope once the body (and therefore the action) completes.
  *
  * With no active scope, [[cache]] degrades to a plain `df.cache()` —
  * existing callers (specs, ad-hoc shells) keep working and can fall back
  * to `spark.catalog.clearCache()`. Scopes nest: each `run` frees exactly
  * the caches registered within it. Registration is thread-local, matching
  * how plans are built (one thread composes the operator and runs the
  * action); `unpersist(blocking = false)` keeps scope exit cheap.
  */
object CacheScope {

  private val active = new ThreadLocal[List[scala.collection.mutable.ListBuffer[Dataset[_]]]] {
    override def initialValue: List[scala.collection.mutable.ListBuffer[Dataset[_]]] = Nil
  }

  /** Cache `ds` and register it with the innermost active scope (no-op
    * registration when no scope is active).
    */
  def cache[T](ds: Dataset[T]): Dataset[T] = {
    val cached = ds.cache()
    active.get.headOption.foreach(_ += cached)
    cached
  }

  /** Run `body` in a fresh scope whose caches SURVIVE on success — they
    * re-register with the enclosing scope (or stay plain-cached with
    * none), exactly as if [[cache]] had been called without the wrapper —
    * but are unpersisted immediately when `body` throws. The shape a
    * guard-then-retry operator needs: a refused attempt's cached frames
    * must not stay pinned alongside the retry's (the leak fires exactly
    * when the corpus is large enough to bust the guard's budget).
    */
  def attempt[A](body: => A): A = {
    val buf = scala.collection.mutable.ListBuffer.empty[Dataset[_]]
    active.set(buf :: active.get)
    var ok = false
    try { val r = body; ok = true; r }
    finally {
      active.set(active.get.tail)
      if (ok) active.get.headOption.foreach(_ ++= buf)
      else buf.foreach { ds =>
        try ds.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }

  /** Run `body` in a fresh scope; unpersist every cache registered inside
    * it afterwards, even on failure.
    */
  def run[A](body: => A): A = {
    val buf = scala.collection.mutable.ListBuffer.empty[Dataset[_]]
    active.set(buf :: active.get)
    try body
    finally {
      active.set(active.get.tail)
      buf.foreach { ds =>
        try ds.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }
}
