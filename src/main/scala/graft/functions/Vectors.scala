package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns as pure Catalyst
  * expressions (zip_with/aggregate folds — sequential IEEE sums, so
  * DuckDB's list_dot_product over the same doubles agrees). Embedding
  * columns are float32 in storage; cast to array<double> FIRST so both
  * engines do exact float→double widening then double math.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** HOF-fold cosine — reference twin of [[cosine]] for tests. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Compiled cosine (graft.expressions.CosineSim) — bit-equal to
    * [[cosineHof]], one tight loop per row; use on hot paths.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.CosineSim(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))

  /** Compiled Hamming distance between equal-length bit strings. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.HammingDist(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))

  /** Compiled per-dimension threshold sign bits ('0'/'1' string, one
    * char per threshold; strict `>`) — the BQ signature's hot form.
    */
  def thresholdBits(v: Column,
      thresholds: graft.expressions.PlaneMatrix): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.ThresholdBits(
        org.apache.spark.sql.GraftExpressionBridge.expression(v),
        thresholds))

  /** Compiled signed-random-projection bit signature ('0'/'1' string
    * of length nPlanes) against a constant plane matrix.
    */
  def hyperplaneBits(v: Column, planes: graft.expressions.PlaneMatrix,
      nPlanes: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.HyperplaneBits(
        org.apache.spark.sql.GraftExpressionBridge.expression(v),
        planes, nPlanes))

  /** Compiled banded bucket keys: one packed (band, bits) long per
    * band against a constant plane matrix.
    */
  def hyperplaneBandKeys(v: Column, planes: graft.expressions.PlaneMatrix,
      nBands: Int, bandBits: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.HyperplaneBandKeys(
        org.apache.spark.sql.GraftExpressionBridge.expression(v),
        planes, nBands, bandBits))

    /** Compiled one-pass sketch+band-keys struct (see
    * HyperplaneSketchKeys for why one expression matters under a
    * Generate).
    */
  def hyperplaneSketchKeys(v: Column, planes: graft.expressions.PlaneMatrix,
      sketchBits: Int, nBands: Int, bandBits: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.HyperplaneSketchKeys(
        org.apache.spark.sql.GraftExpressionBridge.expression(v),
        planes, sketchBits, nBands, bandBits))

    /** Compiled centroid ranking against a constant codebook: centroid
    * ids by descending cosine (ties by id).
    */
  def centroidRanks(v: Column, cents: graft.expressions.PlaneMatrix): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.CentroidRanks(
        org.apache.spark.sql.GraftExpressionBridge.expression(v), cents))

  /** Compiled IVF list ASSIGNMENT — `element_at(centroidRanks(v), 1)`
    * as a direct argmax (no per-row rank sort); bit-equal by the
    * CentroidTop1 spec. Use wherever only the nearest list is needed
    * (index build/maintain assignment, victim-list derivation).
    */
  def centroidTop1(v: Column, cents: graft.expressions.PlaneMatrix): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.CentroidTop1(
        org.apache.spark.sql.GraftExpressionBridge.expression(v), cents))

  /** Compiled multi-probe key set: a packed band key plus its
    * Hamming-1 neighbors in the low `bits` bits.
    */
  def bitFlipProbes(key: Column, bits: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.BitFlipProbes(
        org.apache.spark.sql.GraftExpressionBridge.expression(key), bits))
}
