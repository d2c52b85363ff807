package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry of caches the library creates INSIDE
  * operators (e.g. the df-capped shingle index in
  * [[graft.dedup.Dedup.jaccardPairsFromShingles]]), so a long-lived
  * consumer session has an explicit release point instead of pinning
  * blocks until LRU eviction. One-shot mains (Verify/Bench) call
  * [[graft.queries.SessionMemo.release]], which drains this too.
  *
  * Weak on the session: a stopped-and-dropped session's entries become
  * collectable, so a service cycling sessions does not accumulate.
  */
object CacheScope {
  private val tracked = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  /** Persist `df` (MEMORY_AND_DISK, `.cache()` semantics) and remember
    * it for [[releaseAll]]. */
  def track[T](df: Dataset[T]): Dataset[T] = {
    val q = tracked.synchronized {
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
    val q = tracked.synchronized(tracked.remove(s))
    if (q != null) q.forEach(_.unpersist(false))
  }
}
