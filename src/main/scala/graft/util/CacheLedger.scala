package graft.util

import org.apache.spark.sql.Dataset

/** Bounded registry for operator-scoped `persist()` calls.
  *
  * Several operators persist an intermediate that two subtrees of the SAME
  * query consume (the minHashLsh / sourceOverlap shingle tables, the
  * centroid table) — the cache is correct and measured-faster, but the
  * operator returns a lazy frame, so there is no in-operator point where
  * the cache is provably drained and an explicit `unpersist()` would be
  * safe. Before this ledger each call site pinned its table in executor
  * memory for the SESSION: a long-lived session re-running such queries
  * grew an unbounded cache footprint (r16 advice item 3).
  *
  * Policy: FIFO with a small live cap. A query needs at most two of these
  * caches live at once, so evicting the oldest entry once more than
  * `MaxLive` are registered can only touch frames from long-finished
  * queries. Eviction is non-blocking and affects performance only — an
  * unpersisted frame recomputes from its (deterministic) lineage, never
  * changes values.
  */
object CacheLedger {

  private val MaxLive = 8
  private val live = scala.collection.mutable.Queue.empty[Dataset[_]]

  /** `persist()` with session-bounded lifetime. */
  def persistBounded[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist()
    live.enqueue(ds)
    while (live.size > MaxLive) live.dequeue().unpersist(blocking = false)
    ds
  }

  /** `ds.persistBounded()` sugar, mirroring [[Checkpoints.CheckpointOps]]. */
  implicit class CacheOps[T](private val ds: Dataset[T]) extends AnyVal {
    def persistBounded(): Dataset[T] = CacheLedger.persistBounded(ds)
  }
}
