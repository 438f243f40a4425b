package graft.tools

import org.apache.spark.sql.functions._

/** Scale-up measurement harness (SURVEY §5 tables): replicates the
  * sf0.1 documents 10× with DISJOINT per-copy vocabularies (every
  * token suffixed with its copy index), so candidate structure and
  * true near-dup pairs replicate exactly — the output-explosion
  * confound of naive replication is removed and the measured curve
  * is the operator's own scaling.
  *
  * Usage: `sbt "runMain graft.tools.Probe d6"` (arg = which probe).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")

    def replicated(copies: Int) =
      (0 until copies).map { c =>
        docs.select((col("doc_id") + lit(c * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "([a-z0-9]+)", s"$$1x$c").as("text"))
      }.reduce(_ unionAll _)

    args.headOption.getOrElse("d6") match {
      case "d6" =>
        val t0 = System.nanoTime
        val n5k = graft.operators.Dedup.dedupGroupsFrom(docs, 0.5).count()
        val s5k = (System.nanoTime - t0) / 1e9
        val t1 = System.nanoTime
        val n50k = graft.operators.Dedup.dedupGroupsFrom(replicated(10), 0.5).count()
        val s50k = (System.nanoTime - t1) / 1e9
        println(f"PROBE d6: 5k docs $s5k%.1f s ($n5k rows, cold JVM); " +
          f"50k docs $s50k%.1f s ($n50k rows, warm)")
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
