package graft

import graft.operators.Search

/** Bucketed-index co-location: term-keyed joins between the bucketed
  * TF and IDF tables must not reshuffle on term.
  */
class BucketSpec extends SparkSpec {

  test("bucketed tf ⋈ idf on term is shuffle-free and bucket-pruned") {
    Search.buildBucketedIndex(Tables(spark, sf), db = "graft_idx_test")

    // natural plan: scans are bucket-aware and prune to the query's buckets
    val scored = Search.bucketedScore(spark, Search.queryTerms,
      db = "graft_idx_test")
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    assert(!plan.contains("Exchange hashpartitioning(term"), plan)
    assert(scored.count() > 0)

    // force the large-table shape (no broadcast): the sort-merge join
    // must still run without re-partitioning either bucketed side
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val smj = Search.bucketedScore(spark, Search.queryTerms,
        db = "graft_idx_test")
      smj.collect()
      val p = smj.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(term"), p)
    } finally spark.conf.set(key, old)
  }

  test("bucketed hyperplane band self-join is shuffle-free (embedding index path)") {
    import graft.operators.Dedup
    Dedup.buildBucketedBandKeys(Tables(spark, sf), db = "graft_emb_test")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // force the large-table (no-broadcast) shape
      val cand = Dedup.bucketedEmbeddingCandidates(spark,
        db = "graft_emb_test")
      cand.collect()
      val p = cand.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), p)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(bk"), p)
      // 256 bands over 16-bit buckets: band collisions (true + chance)
      // exist at any corpus size, so the candidate set is non-empty
      assert(cand.count() > 0)
      // same candidate semantics as the in-memory index at radius 0
      val mem = Dedup.embeddingCandidates(
        Tables(spark, sf).embeddings.select("vec_id", "embedding"),
        probeRadius = 0)
      assert(cand.collect().map(_.toSeq).toSet ==
        mem.collect().map(_.toSeq).toSet)
    } finally spark.conf.set(key, old)
  }

  test("bucketed minhash band self-join is shuffle-free (dedup index path)") {
    import graft.operators.Dedup
    Dedup.buildBucketedSignatures(Tables(spark, sf), db = "graft_sig_test")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // force the large-table (no-broadcast) shape
      val pairs = Dedup.bucketedBandPairs(spark, db = "graft_sig_test")
      pairs.collect()
      val p = pairs.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), p)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(band"), p)
      assert(pairs.count() > 0) // planted near-dups collide
    } finally spark.conf.set(key, old)
  }
}
