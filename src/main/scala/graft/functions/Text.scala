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

  /** Distinct word-k-gram shingles of a text column — the unit of the
    * similarity/dedup family. Pure array expressions (no shuffle).
    * DuckDB twin: `[array_to_string(toks[i:i+k-1],' ')
    * FOR i IN range(1, greatest(len(toks)-k+2, 1))]` + list_distinct.
    */
  def shingles(k: Int)(c: Column): Column = {
    val toks = tokenize(c)
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Hex digit char → 0..15, via ascii codes ('0'-'9' → 48..57,
    * 'a'-'f' → 97..102). Identical CASE arithmetic in DuckDB.
    */
  def hexVal(d: Column): Column =
    when(ascii(d) >= 97, ascii(d) - 87).otherwise(ascii(d) - 48)

  /** Bit b (0 = most significant) of the 64-bit value whose hex form
    * is the first 16 chars of md5 string `m`. floor/power arithmetic
    * (not shiftright) so the DuckDB twin is textually identical.
    */
  def md5Bit(m: Column, b: Column): Column =
    floor(hexVal(m.substr((floor(b / 4) + 1).cast("int"), lit(1))) /
      pow(lit(2.0), lit(3) - b % 4)).cast("long") % 2
}
