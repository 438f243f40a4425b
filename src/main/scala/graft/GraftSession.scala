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
      // Post-shuffle partitions are sized by BYTES, not pinned to the
      // core count: parallelismFirst=false lets AQE coalesce every
      // shuffle down to advisory-sized partitions (guide §2.2 — "size
      // partitions to 100MB-1GB and let AQE coalesce", §9). With the
      // default (true), AQE only coalesces down to the default
      // parallelism, so a KB-sized shuffle still launches one task
      // per core — pure scheduling overhead at small scale, and at
      // cluster scale the same flag is what keeps reduce partitions
      // advisory-sized instead of core-count-sized. Both knobs are
      // env-overridable for deployments that want different targets.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
