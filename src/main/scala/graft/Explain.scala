package graft



/** Diagnostic: time + formatted-explain one or more queries.
  * Usage: runMain graft.Explain <sfDir> <queryName>[,<queryName>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
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
