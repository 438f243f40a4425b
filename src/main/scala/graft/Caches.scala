package graft

import org.apache.spark.sql.DataFrame

/** Operator-scoped cache ownership.
  *
  * Similarity/search operators cache small derived tables (signature
  * tables, df tables, candidate sets) that are consumed by several
  * joins of the same plan. A bare `.cache()` leaks: Spark's
  * CacheManager holds the plan forever, so storage memory grows with
  * every operator call until someone calls `spark.catalog.clearCache()`
  * — acceptable in a benchmark harness, wrong for a library.
  *
  * Contract: internals register caches with [[cached]]; every PUBLIC
  * operator entry point calls [[fresh]] first, which releases the
  * caches of all PREVIOUS operator calls (their results, if still
  * held, silently recompute without the cache — correctness is
  * unaffected). Callers wanting to drop everything eagerly call
  * [[release]] themselves. Net effect: storage memory is bounded by
  * ONE operator's working set, with no reliance on a harness-level
  * clearCache.
  *
  * CONCURRENCY CONTRACT: the registry is process-global, so the
  * scope boundary is "one operator call at a time per JVM". Two
  * graft operators running concurrently on the same SparkSession
  * would have the later `fresh()` unpersist the earlier call's
  * still-in-use caches — never wrong (Spark recomputes the plan),
  * but a silent performance cliff. Applications that need
  * concurrent operator calls should serialize them, or call the
  * DataFrame-building internals and own caching themselves. The
  * methods themselves are thread-safe (synchronized registry); it is
  * the fresh()-scoping that assumes one live operator at a time.
  */
object Caches {
  private val live = scala.collection.mutable.Buffer[DataFrame]()

  /** Cache `df` and register it with the current operator scope. */
  def cached(df: DataFrame): DataFrame = synchronized {
    df.cache()
    live += df
    df
  }

  /** Cache `df`, register it, and MATERIALIZE it now. Use when the
    * table is consumed by several concurrent broadcast-subquery jobs:
    * Spark launches those on parallel threads, and a merely-lazy
    * cache makes every one of them recompute the full upstream plan
    * (the cache-race pathology — measured 8× recompute of the shingle
    * pipeline in d2 before this).
    */
  def materialized(df: DataFrame): DataFrame = {
    val c = cached(df)
    c.count()
    c
  }

  /** Unpersist ONE registered cache before the operator finishes —
    * for iterative operators (d6's label propagation) whose
    * superseded per-iteration frames would otherwise accumulate for
    * the whole loop, growing storage with iteration count instead of
    * staying bounded by one iteration's working set.
    */
  def drop(df: DataFrame): Unit = synchronized {
    df.unpersist(false)
    val i = live.indexWhere(_ eq df)
    if (i >= 0) live.remove(i)
  }

  /** Release every cache registered so far (non-blocking). */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }

  /** Start a new operator scope: release all previous operators'
    * caches. Called at public operator entry, never in shared
    * internals (a nested helper must not drop its caller's caches).
    */
  def fresh(): Unit = release()
}
