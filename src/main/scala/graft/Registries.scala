package graft

/** Shared FIRST-TOUCH counter for every in-JVM memoizing model
  * registry (Ann's codebook/PQ/SQ/BQ model maps, the stream-source
  * split staging, the on-disk quantization-tier mints). The bench's
  * best-of-2 outlier guard snapshots it exactly like
  * [[Staging.stagedKeys]]: a timed run whose generation moved did
  * one-time model/staging work a re-run would NOT repeat, so its
  * second timing measures different (warm) work and must not be
  * published as the query's cost — the round-15 s10 lesson, where a
  * warm `residBooks` re-encode benched a 19.6 s training query at
  * 0.3 s.
  *
  * Registries whose compute is driver-trivial (Dedup's hyperplane
  * matrices — a few thousand doubles from a seeded PRNG) deliberately
  * do NOT bump: they cannot bias a timing, and counting them would
  * spuriously veto legitimate re-runs.
  */
object Registries {
  private val gen0 = new java.util.concurrent.atomic.AtomicLong(0)

  /** Record one first-touch model/staging computation. Call INSIDE
    * the memoizing branch (the getOrElseUpdate/computeIfAbsent body
    * or the mint-once path), never on the warm path.
    */
  def bump(): Unit = { gen0.incrementAndGet(); () }

  /** Monotone count of first-touch computations this JVM has run. */
  def gen: Long = gen0.get
}
