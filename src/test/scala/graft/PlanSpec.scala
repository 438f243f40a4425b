package graft

/** Physical-plan assertions: the properties that make these operators
  * survive a 100 TB scale-up must be visible in `explain`, not just
  * intended. Guards against regressions that stay correct but lose
  * pushdown/broadcast/join shape.
  */
class PlanSpec extends SparkSpec {

  /** Flatten an executed plan through the AQE wrappers (adaptive
    * root, query stages, reused exchanges) — one definition for
    * every plan-shape test: a new wrapper exec gets added HERE or
    * every shape assertion silently stops seeing subtrees.
    */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: kids.flatMap(flatten)
  }

  private def plan(name: String): String = {
    val df = run(name)
    df.collect() // AQE: codegen/join shape only visible in the FINAL plan
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(400))
  }

  test("q1: scan is column-pruned to the 5 needed columns") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      readSchema)
  }

  test("q2: customer dimension joins via BroadcastHashJoin") {
    val p = plan("q2_top_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("q4/q5: semi/anti joins are real semi/anti joins") {
    assert(plan("q4_semi_join").contains("LeftSemi"))
    assert(plan("q5_anti_join").contains("LeftAnti"))
  }

  test("similarity family: no cartesian joins; pair joins are hash/merge") {
    for (name <- Seq("d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash",
        "d5_embedding_neardup", "r7_tfidf_search", "r8_bm25_search")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian join")
    }
    // candidate-pair generation must be an equi-join, never nested-loop
    // (scalar 1-row broadcasts, e.g. N/avgdl ride-alongs, are fine and
    // appear as BroadcastNestedLoopJoin with a 1-row build side)
    for (name <- Seq("d2_ngram_jaccard", "d4_simhash", "d5_embedding_neardup")) {
      assert(!plan(name).contains("BroadcastNestedLoopJoin"),
        s"$name has a nested-loop join")
    }
  }

  test("q11: scale-safe join — nothing data-sized broadcast, shuffle-hash holds") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val df = run("q11_scalar_subquery")
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    // a broadcast is not REQUIRED (the scale-safe plan has none keyed
    // on data-sized inputs), but any broadcast that does appear must
    // build an aggregate, never a raw scan
    all.collect { case b: BroadcastExchangeExec => b }.foreach { b =>
      assert(flatten(b).exists(_.isInstanceOf[BaseAggregateExec]),
        "a BroadcastExchange build side is a raw scan (fact-table " +
          "broadcast = OOM at scale); expected the per-partkey aggregate")
    }
    // the fact↔aggregate join stays a shuffle-hash join: partitions
    // both sides by l_partkey, builds on the aggregate per-partition
    assert(all.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "q11 lost its shuffle_hash join shape")
  }

  test("s3: list assignment is a projection — no Exchange keyed by vec_id") {
    val p = plan("s3_ann_ivf")
    assert(!p.contains("hashpartitioning(vec_id"),
      p.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n"))
  }

  test("s6: PQ serving is shuffle-free — no Exchange, TakeOrdered top-k") {
    val p = plan("s6_pq_search")
    assert(!p.contains("Exchange"), p.take(600))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("r15/t11: vocab cut is a distributed TakeOrdered — every window " +
      "sits ABOVE the K-row limit, never over the full vocabulary") {
    import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    for (name <- Seq("r15_vocab_build", "t11_tokenizer_encode")) {
      val df = run(name)
      df.collect()
      val all = flatten(df.queryExecution.executedPlan)
      val wins = all.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$name: expected the K-row rank window")
      // a WindowExec with no TakeOrdered beneath it would be the old
      // full-vocab single-partition sort — the 100 TB scale-killer
      wins.foreach { w =>
        assert(flatten(w).exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
          s"$name: WindowExec input is not bounded by a TakeOrdered cut\n" +
            w.toString.take(800))
      }
    }
  }

  test("s5: PQ encode path has no join and no corpus-keyed Exchange") {
    val p = plan("s5_pq_encode")
    assert(!p.contains("Join"), p.take(600))
    // the only Exchange is the cosmetic output orderBy(vec_id) (AQE's
    // toString repeats the plan as "Initial Plan" — count final only)
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, finalPlan.take(600))
  }

  test("s1: probe is broadcast (the corpus is never the broadcast side)") {
    val p = plan("s1_ann_bruteforce")
    // the only broadcast exchange carries the 1-row probe
    assert(p.contains("BroadcastExchange"))
  }

  test("d13: argmax is rank-limited (WindowGroupLimit), joins broadcast, " +
      "no corpus-keyed window shuffle") {
    val p = plan("d13_dedup_keep_best")
    // Spark's rank-limit pushdown must hold: only rank-1 rows survive
    // BEFORE the full window sort materializes
    assert(p.contains("WindowGroupLimit"), p.take(800))
    // the group registry and quality frames join broadcast — a
    // SortMergeJoin here would mean the registry went corpus-sized
    assert(!p.split("== Initial Plan ==").head.contains("SortMergeJoin"),
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("r19: query terms ride broadcast; per-query rank windows are " +
      "rank-limited") {
    val p = plan("r19_search_eval")
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.contains("BroadcastExchange"), p.take(800))
  }

  test("io10: the pruned range scan opens fewer input files than the " +
      "landed layout holds") {
    val t = Tables(spark, sf)
    val (files, total) = graft.sources.Io.io10PrunedFiles(t, 100L, 399L)
    val df = run("io10_stats_manifest")
    df.collect()
    // the executed scan's file sources are exactly the manifest's
    // admitted files — the plan never references the full directory
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan")).getOrElse("")
    assert(files.length < total)
    assert(!scanLine.contains("io_manifest_data]"),
      s"scan reads the whole landed dir: $scanLine")
  }

  test("s13: SQ8 serving is scan → fused projection → TakeOrdered, " +
      "zero Exchange") {
    val p = plan("s13_sq_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange"),
      "SQ8 flat serving should never shuffle:\n" + p.take(800))
    // the probe filter reaches the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(vec_id)"), p.take(600))
  }

  test("s14: IVF-SQ serving is a cid-pruned scan → fused projection " +
      "→ TakeOrdered, zero Exchange") {
    val p = plan("s14_ivfsq_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange"),
      "IVF-SQ serving should never shuffle:\n" + p.take(800))
  }

  test("s16: per-list IVF-SQ serving is a cid-pruned scan → fused " +
      "projection → TakeOrdered, zero Exchange") {
    val p = plan("s16_ivfsq_perlist_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange"),
      "per-list IVF-SQ serving should never shuffle:\n" + p.take(800))
  }

  test("s17: BQ serving is one scan → fused bit/Hamming projections " +
      "→ TakeOrdered shortlist → rerank, zero Exchange") {
    val p = plan("s17_bq_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange"),
      "BQ serving should never shuffle:\n" + p.take(800))
    // the probe filter reaches the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(vec_id)"), p.take(600))
  }

  test("s18: MRL serving is one scan → fused prefix-cosine " +
      "projection → TakeOrdered shortlist → rerank, zero Exchange") {
    val p = plan("s18_mrl_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange"),
      "MRL serving should never shuffle:\n" + p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(vec_id)"), p.take(600))
  }

  test("s19: filtered ANN serving is one scan — cid + label + cosine " +
      "fused, TakeOrdered, zero Exchange") {
    val p = plan("s19_filtered_ann")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange"),
      "filtered ANN serving should never shuffle:\n" + p.take(800))
    // the label predicate reaches the parquet scan
    assert(p.contains("EqualTo(label,"), p.take(800))
  }

  test("s20: the composed funnel serves from one scan — cid cut, bit " +
      "Hamming, shortlist, rerank all fused, zero Exchange") {
    val p = plan("s20_funnel_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("Exchange"),
      "the funnel should never shuffle:\n" + p.take(800))
  }

  test("s15: per-list SQ encode has no join; the only Exchanges are " +
      "the one-time cid assignment and the cosmetic output order") {
    val p = plan("s15_sq_perlist")
    assert(!p.contains("Join"),
      "per-list model lookup must be element_at, not a join:\n" +
        p.take(800))
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, finalPlan.take(800))
  }

  test("q25: grouping sets run as ONE Expand + one aggregate shuffle " +
      "serving all three reports") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val df = run("q25_grouping_sets")
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.ExpandExec]) == 1)
    val ex = nodes.collect { case e: ShuffleExchangeLike => e }
      .map(_.toString.linesIterator.next())
    // one hash exchange for the aggregate + the display-order range
    assert(ex.count(_.contains("hashpartitioning")) == 1, ex.mkString("\n"))
    assert(df.queryExecution.executedPlan.toString.contains("partial_sum"),
      "grouping-sets aggregate not map-side partial")
  }

  test("t18: the only FORCED broadcast is the 1-row totals; the " +
      "selection is a TakeOrdered, not a global sort") {
    val df = run("t18_dsir_select")
    // the vocabulary-sized model joins must reach the planner
    // unhinted — broadcast-vs-shuffle is AQE's call at runtime
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.length == 1,
      s"expected exactly the totals broadcast hint, saw ${hints.length}")
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "top-N selection fell back to a global sort")
  }

  test("whole-stage codegen covers the relational aggregates") {
    // compact plan strings mark WholeStageCodegen stages with "*(n)"
    assert(plan("q1_pricing_summary").contains("*(1)"))
    assert(plan("q8_running_window").contains("*(1)"))
  }

  test("q1 aggregate is map-side partial (partial_sum before shuffle)") {
    assert(plan("q1_pricing_summary").contains("partial_sum"))
  }

  test("q19: KMV sketch aggregates map-side partial (mergeable, k-long buffers shuffle)") {
    val p = plan("q19_kmv_sketch")
    assert(p.contains("partial_kmv_distinct"), p.take(600))
  }

  test("q20: salted join is keyed on (key, salt) and stays non-broadcast") {
    val p = plan("q20_salted_join")
    assert(p.contains("_salt"),
      "salt column missing from the executed plan")
    val joinLine = p.linesIterator
      .find(l => l.contains("HashJoin")).getOrElse("")
    assert(joinLine.contains("_salt"), joinLine)
    assert(!joinLine.contains("Broadcast"), joinLine)
  }

  test("d8: exactly the designed shuffles — spread, line agg + " +
      "verdict join (partial-combined, skew-splittable; NO window), " +
      "doc agg") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = run("d8_line_dedup")
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    // the skew-prone shape must be GONE: first-occurrence is a
    // map-side-combinable min-struct aggregate + equi-join, never a
    // row_number window (no partial agg, no AQE skew help)
    assert(!all.exists(_.isInstanceOf[WindowExec]),
      "d8 grew a window back — the hot-line skew hazard returns")
    val ex = all.collect { case e: ShuffleExchangeLike => e }
    // spread round-robin + line-agg partials + line join +
    // hashpartitioning(doc_id) agg + the final orderBy range — a new
    // exchange beyond these means an unplanned shuffle
    assert(ex.size <= 5, ex.map(_.toString.linesIterator.next()).mkString("\n"))
    val keys = ex.map(_.toString.linesIterator.next())
    assert(keys.exists(_.contains("hashpartitioning(line")),
      "line shuffle missing — first-occurrence no longer global")
  }

  test("io3: the operator's own partitioned read is partition-pruned") {
    val p = plan("io3_partitioned_prune")
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"), p)
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderpriority"), p)
  }

  test("io1/io2: round-trip reads carry explicit schemas (no inference scan)") {
    // writer schema == reader schema by construction; the query result
    // matching the pre-round-trip oracle is asserted by the driver
    // gate, so here just pin that both operators produce their rows
    assert(run("io1_jsonl_roundtrip").count() == 500)
    assert(run("io2_csv_roundtrip").count() == 5)
  }

  test("partition pruning: a type-partitioned layout reads one partition") {
    import org.apache.spark.sql.functions._
    val dir = "target/tmp/events_by_type"
    Tables(spark, sf).events
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p)
    // the type predicate must NOT appear as a data filter — it is
    // resolved entirely at the directory level
    assert(!p.contains("PushedFilters: [IsNotNull(event_type"), p)
  }

  test("unsorted facades: no terminal global sort (range Exchange); gate path keeps it") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf).documents
    // the facade default (sorted=false) must not pay a full
    // range-partition sort for presentation order the consumer
    // re-shuffles anyway; a mid-plan SMJ Sort is partition-local and
    // rides hashpartitioning, so rangepartitioning is the witness
    val vecs = Tables(spark, sf).embeddings
    val facades = Seq(
      graft.api.Graft.lineDedup(docs, "doc_id", "text"),
      graft.api.Graft.overlapScrub(docs, "doc_id", "text"),
      graft.api.Graft.groupSplit(docs, "doc_id", "text"),
      graft.api.Graft.perplexityScore(docs, "doc_id", "text"),
      graft.api.Graft.minhashLshPairs(docs, "doc_id", "text"),
      graft.api.Graft.knnJoin(vecs, "vec_id", "embedding"))
    facades.foreach { df =>
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("rangepartitioning("), p.take(400))
    }
    // the SparkEntry path keeps the deterministic presentation order
    // the driver's hash gate requires
    val gate = run("d8_line_dedup")
    gate.collect()
    assert(gate.queryExecution.executedPlan.toString
      .contains("rangepartitioning("))
  }

  test("e1 embed: the encode facade is one mapPartitions pass — zero " +
      "Exchange, no join, no aggregate (the billion-row backfill " +
      "shape)") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text")
    val df = graft.api.Graft.embed(docs, "doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(600))
    assert(!p.contains("Join"), p.take(600))
    assert(p.contains("MapPartitions"), p.take(600))
  }

  test("p3 dense tower: the quantized-dot scan is PRUNED to the " +
      "query's probe lists — the cid filter lands in the scan's " +
      "PartitionFilters; fused integer dot + TakeOrdered, no join, " +
      "no aggregate Exchange") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sf)
    val d = graft.operators.Pipeline.ragRoot(t)
    val tbl = graft.operators.Pipeline.ragTables(t)
    val qU16 = graft.operators.Embed.u16Of(
      graft.operators.Search.queryTerms.mkString(" "))
    val cb = graft.streaming.Streams.loadCodebook(d).get
    val probeCids = spark.range(1)
      .select(slice(graft.functions.Vectors.centroidRanks(
        typedlit(qU16.map(_.toDouble)), cb), 1, 8).as("pls"))
      .collect()(0).getSeq[Int](0)
    val dense = tbl("enc_ivf")
      .filter(col("cid").isin(probeCids.map(c => c: Any): _*))
      .select(col("vec_id").as("doc_id"),
        aggregate(
          zip_with(col("u16"), typedlit(qU16),
            (a, b) => a.cast("long") * b),
          lit(0L), (acc, x) => acc + x).as("iscore"))
      .orderBy(col("iscore").desc, col("doc_id")).limit(20)
    dense.collect()
    val p = dense.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Join"), p.take(600))
    assert(!p.contains("Exchange hashpartitioning"), p.take(600))
    // the pruning claim itself: cid IN (...) rides the scan's
    // PARTITION filters — non-probe list directories are never read
    val pf = p.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse(fail(s"no PartitionFilters line in:\n${p.take(1200)}"))
    assert(pf.contains("cid") && pf.contains(" IN ("), pf)
  }

  test("r19_staged_eval: ONE postings scan pruned to the UNION of " +
      "the eval set's term buckets — never a full scan per query") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = run("r19_staged_eval")
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    // the postings (tf_b) read: exactly ONE scan carrying a tb
    // partition filter — the whole eval set scores in one plan
    val pruned = all.collect {
      case s: FileSourceScanExec
          if s.partitionFilters.exists(_.references.exists(
            _.name == "tb")) => s
    }
    assert(pruned.size == 1,
      s"expected exactly ONE tb-pruned postings scan, got " +
        s"${pruned.size}:\n${all.map(_.nodeName).mkString("\n")}")
    assert(pruned.head.partitionFilters.mkString(",").contains("IN"),
      pruned.head.partitionFilters.mkString(","))
    // broadcast joins only — no per-query corpus shuffle join
    assert(!all.exists(_.isInstanceOf[SortMergeJoinExec]),
      all.map(_.nodeName).filter(_.contains("Join")).mkString("\n"))
  }

  test("p4_context_pack: ONE bucket-pruned postings scan for the " +
      "whole query set; every window is qid-partitioned") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = run("p4_context_pack")
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    val pruned = all.collect {
      case s: FileSourceScanExec
          if s.partitionFilters.exists(_.references.exists(
            _.name == "tb")) => s
    }
    assert(pruned.size == 1,
      s"expected exactly ONE tb-pruned postings scan, got " +
        s"${pruned.size}:\n${all.map(_.nodeName).mkString("\n")}")
    assert(!all.exists(_.isInstanceOf[SortMergeJoinExec]),
      all.map(_.nodeName).filter(_.contains("Join")).mkString("\n"))
    // the pack windows (candidate cut, diversity cap, rank, running
    // token sum) all partition by qid — a corpus-wide single-partition
    // window can never enter this plan
    val wins = all.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window stages in the pack plan")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty &&
        w.partitionSpec.exists(_.references.exists(_.name == "qid")),
        s"unpartitioned/non-qid window in p4 plan: $w")
    }
  }

  test("dense tiers (sq8/pq): serving is a cid-PRUNED scan of the " +
      "tier's own code layout — no join, TakeOrdered top-k") {
    for (name <- Seq("p3_dense_sq8", "p3_dense_pq")) {
      val df = run(name)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val pf = p.linesIterator.find(_.contains("PartitionFilters:"))
        .getOrElse(fail(s"$name: no PartitionFilters in\n${p.take(1200)}"))
      assert(pf.contains("cid") && pf.contains(" IN ("), s"$name: $pf")
      assert(p.contains("TakeOrderedAndProject"), s"$name: ${p.take(400)}")
      assert(!p.contains("Join"), s"$name has a join:\n${p.take(800)}")
    }
  }

  test("p3_dense_rerank: BOTH scans (sq8 shortlist + exact refetch) " +
      "are cid-pruned; the shortlist joins broadcast") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = run("p3_dense_rerank")
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    val scans = all.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "cid")),
        s"unpruned scan in rerank plan: ${s.toString.take(300)}")
    }
    assert(!all.exists(_.isInstanceOf[SortMergeJoinExec]),
      "rerank's shortlist join must broadcast, not shuffle")
  }

  test("p3 lexical tower: the staged BM25 serve is a term-bucket-" +
      "PRUNED postings scan (tb IN (...) in PartitionFilters) with " +
      "broadcast idf/stats — no corpus-side shuffle join, no " +
      "corpus-wide stats recompute") {
    val t = Tables(spark, sf)
    val d = graft.operators.Pipeline.ragRoot(t)
    val tbl = graft.operators.Pipeline.ragTablesAt(spark, d)
    val lex = graft.operators.Pipeline.bm25Staged(
      tbl, graft.operators.Search.queryTerms, 20,
      graft.operators.Pipeline.layoutOf(d)._2)
    lex.collect()
    val p = lex.queryExecution.executedPlan.toString
    val pf = p.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse(fail(s"no PartitionFilters line in:\n${p.take(1200)}"))
    assert(pf.contains("tb") && pf.contains(" IN ("), pf)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }
}
