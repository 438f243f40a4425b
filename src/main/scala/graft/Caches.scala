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
