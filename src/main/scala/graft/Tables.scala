package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-generated parquet tables at `dir`
  * (see TESTDATA.md). Reads are plain `spark.read.parquet` so Catalyst
  * owns column pruning + filter pushdown; callers `select` early.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts normalized to session-tz TimestampType whatever the
    * file encodes — see [[Tables.normalizeTs]].
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(t("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Normalize an `events`-shaped frame's `ts` to session-tz
    * TimestampType at µs precision, whatever the parquet file
    * encodes. Generators have shipped three encodings so far:
    * TIMESTAMP(NANOS) (surfaces as epoch-nanos LONG under the
    * `nanosAsLong` legacy conf — truncate to µs, the same truncation
    * DuckDB applies), TIMESTAMP(MICROS) without timezone (surfaces as
    * TIMESTAMP_NTZ — reinterpret in the UTC session zone, which
    * preserves the instant bit-for-bit), or an already-zoned
    * TIMESTAMP (passes through). Oracle comparisons see identical
    * instants in all three cases.
    */
  private[graft] def normalizeTs(df: DataFrame, col: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(col).dataType match {
      case LongType =>
        df.withColumn(col, timestamp_micros(expr(s"$col div 1000")))
      case TimestampNTZType =>
        df.withColumn(col, expr(s"cast($col as timestamp)"))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"unsupported $col type for events table: $other")
    }
  }
}
