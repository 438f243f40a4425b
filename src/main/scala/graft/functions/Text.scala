package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the ingest/search/dedup/text-analysis
  * operators. All are composed from codegen'd built-ins (no UDFs) and
  * have exact DuckDB equivalents (documented per function) so oracle
  * SQL can reproduce them bit-for-bit.
  */
object Text {

  /** Lowercase, split on non-alphanumeric runs, drop empties.
    * DuckDB twin: `regexp_split_to_array(lower(x), '[^a-z0-9]+')`
    * + `term <> ''` filter.
    */
  def tokenize(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Python-`str.strip()` equivalent (trims ALL whitespace, unlike
    * Spark `trim` which trims spaces only). `\z` (not `$`) because
    * Java `$` also matches before a final newline while RE2 `$`
    * doesn't — `\z` means end-of-text in both.
    */
  def stripWs(c: Column): Column =
    regexp_replace(regexp_replace(c, "^\\s+", ""), "\\s+\\z", "")

  /** Distinct word-k-gram shingles over an ALREADY-MATERIALIZED token
    * array column — the unit of the similarity/dedup family. Pure
    * array expressions (no shuffle).
    *
    * `toks` MUST be a plain column attribute (`.withColumn("tk",
    * tokenize(...))` first), NOT the tokenize expression itself: the
    * lambda references the array ~3k times per row, and an inlined
    * tokenize subtree would be re-evaluated at every reference in
    * interpreted higher-order-function evaluation (measured ~5×
    * slowdown). Catalyst's CollapseProject keeps a multiply-referenced
    * non-trivial alias materialized, which is what makes the
    * two-step select safe.
    *
    * DuckDB twin: `[array_to_string(toks[i:i+k-1],' ')
    * FOR i IN range(1, greatest(len(toks)-k+2, 1))]` + list_distinct.
    */
  def shingles(k: Int)(toks: Column): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        // slice+concat_ws, not k× element_at: higher-order lambdas are
        // interpreted, and one slice per iteration measured 3× faster
        // than k indexed lookups at sf0.1
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Compiled-loop twin of [[shingles]] (identical output) — use on
    * hot paths; see graft.expressions.TextExprs.
    */
  def shinglesFast(k: Int)(toks: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.ShingleArray(
        org.apache.spark.sql.GraftExpressionBridge.expression(toks), k))

  /** Compiled MinHash signature over a shingle array — identical math
    * to the conv/affine-perm HOF form; see TextExprs.
    */
  def minhashSig(sh: Column, nPerms: Int = 16,
      prime: Long = 4294967291L): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.MinHashSig(
        org.apache.spark.sql.GraftExpressionBridge.expression(sh),
        nPerms, prime))

  /** Compiled tf-weighted SimHash over a token array — identical math
    * to the hexVal/floor-power HOF form; see TextExprs.
    */
  def simhashSig(toks: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.SimHashSig(
        org.apache.spark.sql.GraftExpressionBridge.expression(toks)))

  /** Hex digit char → 0..15, via ascii codes ('0'-'9' → 48..57,
    * 'a'-'f' → 97..102). Identical CASE arithmetic in DuckDB; kept as
    * the Column-form documentation of the nibble math the d4/d5 oracle
    * SQL replicates (hot paths use the compiled expressions).
    */
  def hexVal(d: Column): Column =
    when(ascii(d) >= 97, ascii(d) - 87).otherwise(ascii(d) - 48)
}
