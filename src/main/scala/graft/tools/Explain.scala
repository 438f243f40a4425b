package graft.tools

/** Plan evidence dumper: run each named query against `sfDir`, then
  * print its ADAPTIVE executed plan (post-AQE, the plan that actually
  * ran) with row count and wall time — the raw material for
  * PLANS.md's annotated entries.
  *
  * Usage: runMain graft.tools.Explain <sfDir> <q1,q2,...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = graft.GraftSession.build()
    names.split(',').foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"\n== $name: $n rows in ${secs.formatted("%.2f")} s == ($sfDir)")
      // executedPlan AFTER the count above: AQE has re-planned, so
      // this prints the shape that ran, not the initial estimate
      println(df.queryExecution.executedPlan.toString)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
