package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Measured-count guards for FORCED broadcast hints.
  *
  * A forced `broadcast()` is allowed in this codebase only for sides
  * bounded BY CONSTRUCTION (1-row aggregates, fixed dims, probe/topK
  * rows). Any side whose size is merely *expected* small — eval-suite
  * shingle sets, per-doc stats — must earn the hint with a measured
  * count against a byte budget, so the "it's small" contract is
  * mechanical rather than assumed and the operator degrades to a
  * shuffle join (AQE-visible) past the cliff instead of OOMing the
  * driver.
  */
object Guards {

  /** Budget for a forced build side. A broadcast HashedRelation is
    * resident on EVERY executor plus one driver copy, so this is
    * deliberately small relative to executor memory (64 MB against
    * multi-GB executors); past it AQE still converts genuinely small
    * runtime sides on its own.
    */
  val bcastBudgetBytes: Long = 64L << 20

  /** Conservative bytes/row for the short-string / few-longs rows the
    * guarded sides carry: ~16-40 B of UnsafeRow payload plus
    * HashedRelation page + pointer overhead, erred HIGH (a 2M-row
    * "50 MB" estimate measured 100-200+ MB in practice).
    */
  val estBytesPerRow: Long = 128L

  /** Broadcast `df` only when its measured row count — call this on a
    * MATERIALIZED (cached) frame so the count comes off the cache,
    * not a plan recompute — times [[estBytesPerRow]] fits
    * [[bcastBudgetBytes]]; otherwise return it unhinted.
    */
  def sizedBroadcast(df: DataFrame,
      bytesPerRow: Long = estBytesPerRow): DataFrame =
    if (df.count() * bytesPerRow <= bcastBudgetBytes) broadcast(df) else df

  /** The row bound for a pre-counted side (the d2 pattern, where the
    * materializing count is already in hand).
    */
  def fitsBudget(rows: Long, bytesPerRow: Long = estBytesPerRow): Boolean =
    rows * bytesPerRow <= bcastBudgetBytes
}
