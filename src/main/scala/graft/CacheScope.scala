package graft

import org.apache.spark.sql.Dataset

/** Registry of QUERY-SCOPED caches (ADVICE r12 #1): the one-pass
  * discipline persists per-query tallies (posting tables, token tallies,
  * classifier features) that are only needed while their one composed
  * query materializes — but `persist` pins MEMORY_AND_DISK blocks for
  * the session lifetime, so a long-lived session (or a 3-pass bench
  * sweep over 210 queries) accumulates dead blocks without bound (disk
  * blocks are not LRU-evicted).
  *
  * Operators register such tallies here right after `persist`; the
  * harness (Verify between query dumps, Bench between timed runs) calls
  * [[releaseAll]] once the consuming action is done. MEMOIZED caches
  * shared ACROSS queries (the KG edge list, the minhash pair set, the
  * encoded KG) are deliberately NOT registered — releasing those would
  * undo the family memoization this registry must not touch. Queries
  * whose construction runs no eager actions use the finer-grained
  * `SimilaritySearch.unpersistAfterFirstAction` listener instead and
  * skip the registry; this is the coarse, always-safe backstop.
  *
  * Releasing is idempotent and never eager: a registered cache is only
  * unpersisted between queries, so it can never vanish mid-plan the way
  * a mistimed listener release can. Outside the harness (unit specs,
  * ad-hoc sessions) nothing calls releaseAll and behavior is unchanged.
  */
object CacheScope {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]

  /** Register a query-scoped cached Dataset; returns it unchanged. */
  def register[T](ds: Dataset[T]): Dataset[T] = { live.add(ds); ds }

  /** Unpersist (non-blocking) and forget every registered cache. */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false) catch { case _: Throwable => () }
      d = live.poll()
    }
  }
}
