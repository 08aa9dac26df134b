package graft

import org.apache.spark.sql.Dataset

/** Deferred-unpersist registry for operator-internal caches.
  *
  * Several operators persist an intermediate frame that the RETURNED lazy
  * plan still references (robustTrend's monthly spine, assocRules' baskets
  * and edges, pagerank's edge graph, …): unpersisting before the caller's
  * action would defeat the cache, and the operator never sees the action.
  * Unlike `localCheckpoint` RDDs — which the ContextCleaner auto-unpersists
  * once the frame is garbage-collected — `Dataset.persist` pins an entry in
  * the session's CacheManager forever, so a long Verify/Bench session
  * accumulates MEMORY_AND_DISK blocks (ADVICE r6).
  *
  * The contract: operators wrap such persists in [[track]]; batch drivers
  * (Verify, Bench) call [[drain]] after each query's terminal action.
  * Dropping a cache entry is always safe — worst case a later reference
  * recomputes — so a caller that never drains is merely back to the old
  * behavior.
  */
object CacheScope {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  def track[T](ds: Dataset[T]): Dataset[T] = { reg.add(ds); ds }

  /** `df.persistTracked()` = MEMORY_AND_DISK persist + registry entry. */
  implicit class TrackedDataset[T](private val ds: Dataset[T]) {
    def persistTracked(): Dataset[T] =
      track(ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    /** persistTracked + immediate materialization. A persist dedups
      * STORAGE, not WORK: when the consuming plan references the cache
      * from several concurrent subplans (broadcast-build futures), every
      * future that arrives before the cache is built computes the full
      * child plan itself (measured 2-3× the corpus hash cost on the ngram
      * dedup pipeline). One count() builds the cache once, serially; all
      * consumers then read blocks.
      */
    def eagerTracked(): Dataset[T] = {
      val d = persistTracked()
      d.count(): Unit
      d
    }
  }

  /** Unpersist every tracked frame (non-blocking) and empty the registry. */
  def drain(): Unit = {
    var d = reg.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () }
      d = reg.poll()
    }
  }
}
