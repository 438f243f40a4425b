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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its µs TimestampType. Read nanos as long (legacy conf) and
    * truncate to µs — the same truncation DuckDB applies, so oracle
    * comparisons see identical instants.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
