package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder for graft entry points.
  *
  * Local defaults mirror what a cluster deployment sets via
  * spark-submit: AQE on (runtime re-planning, skew-join splitting,
  * partition coalescing), shuffle partitions sized to cores (not the
  * 200 default — at cluster scale this is set to ~2-3× total executor
  * cores), UTC session time, parquet nanos handled for the events
  * table.
  */
object GraftSession {
  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
