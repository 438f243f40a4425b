package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: time + formatted-explain one or more queries.
  * Usage: runMain graft.Explain <sfDir> <queryName>[,<queryName>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $name: $n rows in $dt%.2f s ==")
      df.explain("formatted")
    }
    spark.stop()
  }
}
