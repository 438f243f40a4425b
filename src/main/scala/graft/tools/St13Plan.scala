package graft.tools

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

/** Plan-evidence dumper for st13's MAINTENANCE-STEP plans (the
  * per-micro-batch hot path, which `tools.Explain` cannot see — it
  * explains the RESULT frame, and st13's result is the compaction
  * output, not the step). Drives two waves over the sf corpus with a
  * QueryExecutionListener attached (the AnnStreamSpec lock's capture,
  * printed instead of asserted) and reports, for every scan of a
  * state table in the ACTUAL executed step plans: its
  * PartitionFilters (the bucket-pruning evidence) and whether any
  * ShuffleExchange consumed a raw state scan (it must not — registry
  * rows are probed in place, never shuffled).
  *
  * Usage: runMain graft.tools.St13Plan <sfDir>
  */
object St13Plan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val st = graft.streaming.Streams.st13State(spark, docs.limit(0))

    val captured =
      new java.util.concurrent.CopyOnWriteArrayList[SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = { captured.add(qe.executedPlan); () }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    val mm = docs.agg(min("doc_id"), max("doc_id")).collect()(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val mid = lo + (hi - lo) / 2
    graft.streaming.Streams.st13MaintainStep(st,
      docs.filter(col("doc_id") <= mid), 0.5)
    graft.streaming.Streams.st13MaintainStep(st,
      docs.filter(col("doc_id") > mid), 0.5)
    // the two bulk waves touch every bucket (a corpus-half hashes
    // into all 16) — the pruning is PRESENT but selects everything.
    // Wave 3 is the STREAMING regime: a handful of arrivals against
    // the full registry, where the bucket pruning actually bites.
    // The arrivals are docs KNOWN to sit in dup groups (re-arrivals
    // of group members), so the candidate path stays non-empty —
    // otherwise AQE's empty-relation propagation erases the state
    // scans from the final plans and there is nothing to show.
    val groupDocs = graft.streaming.Streams.st13Compact(st)
      .select("doc_id").limit(6).collect().map(_.getLong(0))
    Thread.sleep(3000)
    captured.clear()
    graft.streaming.Streams.st13MaintainStep(st,
      docs.filter(col("doc_id").isin(groupDocs.toIndexedSeq: _*)), 0.5)

    // listener delivery is async
    Thread.sleep(3000)

    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(m.relation.cachedPlan)
        case other                    => other.children
      }
      p +: kids.flatMap(flatten)
    }
    def dirOf(f: FileSourceScanExec): Option[String] =
      f.relation.location.rootPaths.map(_.toString).collectFirst {
        case p if p.contains(st.bandsDir)  => "bands"
        case p if p.contains(st.shDir)     => "sh"
        case p if p.contains(st.labelsDir) => "labels"
        case p if p.contains(st.edgesDir)  => "edges"
      }
    import scala.jdk.CollectionConverters._
    val all = captured.asScala.toSeq.flatMap(flatten)
    val stateScans = all.collect {
      case f: FileSourceScanExec if dirOf(f).isDefined => (dirOf(f).get, f)
    }
    println(s"\n== st13 step-plan evidence ($sfDir; wave 3 = " +
      s"${groupDocs.length}-doc arrival against the full registry) ==")
    println(s"query executions captured: ${captured.size()}; " +
      s"state-table scans in executed plans: ${stateScans.size}")
    stateScans.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (tag, fs) =>
      fs.take(2).foreach { case (_, f) =>
        println(s"\n[$tag] ${f.nodeName}")
        println(s"  PartitionFilters: ${f.partitionFilters.mkString(", ")}")
        println(s"  partitions read: ${f.relation.location
          .listFiles(f.partitionFilters, f.dataFilters).size} of 16")
      }
      if (fs.size > 2) println(s"  (+${fs.size - 2} more $tag scans, same shape)")
    }
    def scanUnderUnary(p: SparkPlan): Option[FileSourceScanExec] =
      p match {
        case f: FileSourceScanExec    => Some(f)
        case q: QueryStageExec        => scanUnderUnary(q.plan)
        case a: AdaptiveSparkPlanExec => scanUnderUnary(a.executedPlan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scanUnderUnary(m.relation.cachedPlan)
        case u if u.children.size == 1 => scanUnderUnary(u.children.head)
        case _ => None
      }
    val offending = all.collect {
      case e: ShuffleExchangeExec
        if scanUnderUnary(e.child).exists(f => dirOf(f).isDefined) => e
    }
    println(s"\nShuffleExchanges fed by a raw state scan: " +
      s"${offending.size} (must be 0)")
    if (args.contains("--debug")) {
      println("\n-- captured plan skeletons --")
      captured.asScala.toSeq.foreach { p =>
        println(flatten(p).map(_.nodeName).distinct.mkString(" | "))
      }
    }
    spark.listenerManager.unregister(listener)
    spark.stop()
  }
}
