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
}
