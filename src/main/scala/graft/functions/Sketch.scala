package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge

/** Sketch aggregates with engine-portable determinism (see
  * graft.expressions.Sketches).
  */
object Sketch {

  /** KMV distinct-count estimate over a 32-bit-hash long column:
    * mergeable bounded-state aggregate (k longs per group, map-side
    * partial). Exact below k distinct hashes; (k−1)·2³²/U(k) above.
    */
  def kmvDistinct(hash: Column, k: Int): Column =
    GraftExpressionBridge.column(
      graft.expressions.KmvDistinctAgg(
        GraftExpressionBridge.expression(hash), k).toAggregateExpression())

  /** Quantile estimates (one per prob) from the deterministic
    * bottom-k-by-hash uniform sample: bounded state, mergeable,
    * SQL-replayable (window + quantile_cont). `hash` must be a
    * 32-char md5 hex column and UNIQUE PER ROW (md5 of a row-unique
    * value): duplicate keys would collapse sample entries, so the
    * aggregate fails loud on a duplicate key carrying a different
    * value (same-value duplicates are tolerated as idempotent).
    */
  def bottomKQuantiles(hash: Column, value: Column, k: Int,
      probs: Seq[Double]): Column =
    GraftExpressionBridge.column(
      graft.expressions.BottomKQuantilesAgg(
        GraftExpressionBridge.expression(hash),
        GraftExpressionBridge.expression(value), k, probs)
        .toAggregateExpression())

  /** Count-Min frequency sketch (d rows × w buckets of longs) over an
    * item stream keyed by its md5-derived (h1, h2) longs: mergeable
    * (element-wise add), bounded state, SQL-replayable. Returns the
    * flat d·w sketch array; read estimates with
    * min over j of sketch[j·w + (h1 + (j+1)·h2) mod P mod w].
    */
  def countMin(h1: Column, h2: Column, d: Int, w: Int): Column =
    GraftExpressionBridge.column(
      graft.expressions.CountMinAgg(
        GraftExpressionBridge.expression(h1),
        GraftExpressionBridge.expression(h2), d, w)
        .toAggregateExpression())
}
