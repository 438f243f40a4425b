package graft.tools

/** Plan evidence dumper: run each named query against `sfDir`, then
  * print its ADAPTIVE executed plan (post-AQE, the plan that actually
  * ran) with row count and wall time — the raw material for
  * PLANS.md's annotated entries. `--formatted` switches to the
  * pre-execution formatted explain (codegen stage spans, pushed
  * filters) for the same queries.
  *
  * Usage: runMain graft.tools.Explain <sfDir> <q1,q2,...> [--formatted]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1)
    val formatted = args.contains("--formatted")
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    names.split(',').foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // materialize through the Dataset's OWN QueryExecution:
      // collect(), not count() — count() builds a NEW QueryExecution
      // for groupBy().count(), leaving df's plan unexecuted and its
      // AdaptiveSparkPlan stuck at the isFinalPlan=false estimate,
      // which is exactly NOT the evidence this tool exists to dump
      val n = df.collect().length
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"%n== $name: $n rows in $secs%.2f s == ($sfDir)")
      if (formatted) df.explain("formatted")
      else println(df.queryExecution.executedPlan.toString)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
