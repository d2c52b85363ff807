package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry of caches the library creates INSIDE
  * operators (e.g. the df-capped shingle index in
  * [[graft.dedup.Dedup.jaccardPairsFromShingles]]), so a long-lived
  * consumer session has an explicit release point instead of pinning
  * blocks until LRU eviction. One-shot mains (Verify/Bench) call
  * [[graft.queries.SessionMemo.release]], which drains this too.
  *
  * Lifecycle note: a Dataset strongly references its SparkSession, so
  * a WeakHashMap keyed on the session would never collect (the
  * value→key indirect-reference trap in the WeakHashMap javadoc), and
  * weak Dataset values would lose the unpersist handle the moment the
  * caller drops its reference — re-pinning blocks, the exact problem
  * this class exists to solve. So: strong references, plus a sweep
  * that forgets STOPPED sessions on every call (a stopped context's
  * blocks are already freed by Spark). A service that cycles sessions
  * through `session.stop()` therefore does not accumulate; dropping a
  * live session without stop() leaks the session itself regardless of
  * this registry.
  */
object CacheScope {
  private val tracked = new java.util.HashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  private def pruneStopped(): Unit =
    tracked.entrySet().removeIf(e => e.getKey.sparkContext.isStopped)

  /** Persist `df` (MEMORY_AND_DISK, `.cache()` semantics) and remember
    * it for [[releaseAll]]. */
  def track[T](df: Dataset[T]): Dataset[T] = {
    val q = tracked.synchronized {
      pruneStopped()
      var v = tracked.get(df.sparkSession)
      if (v == null) {
        v = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
        tracked.put(df.sparkSession, v)
      }
      v
    }
    q.add(df.cache())
    df
  }

  /** Unpersist every cache tracked for `s` (non-blocking) and forget
    * them. Safe to call at any time: operator results derived from a
    * released cache recompute instead of failing. */
  def releaseAll(s: SparkSession): Unit = {
    val q = tracked.synchronized { pruneStopped(); tracked.remove(s) }
    if (q != null) q.forEach(_.unpersist(false))
  }
}
