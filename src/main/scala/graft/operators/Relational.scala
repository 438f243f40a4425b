package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core: the substrate queries every pipeline runs on.
  *
  * Float-safety policy (oracle hash parity with DuckDB): money aggregates
  * are summed in DECIMAL(18,2) (exact, order-independent) and only the
  * final value is cast to DOUBLE — the same exact decimal converts to the
  * same IEEE double in any engine. Raw (non-aggregated) doubles pass
  * through untouched. Everything else is int/string/date.
  */
object Relational {

  private val Dec = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(Dec)
  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** q1: scan → pushdown filter → groupBy agg. TPC-H Q1 shape. */
  def q1PricingSummary(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q2: dim join + shuffle fact join + agg + deterministic top-k.
    * TPC-H Q3 shape. The customer side carries NO forced hint:
    * customer GROWS with scale factor (billions of rows at 100 TB,
    * unlike the constant 25/5-row nation/region dims) — AQE
    * broadcasts the filtered dim while it measures small and
    * sort-merges past that.
    */
  def q2TopRevenue(t: Tables): DataFrame = {
    val cust = t.customer
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t.orders
      .filter(col("o_orderdate") < ts("1998-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t.lineitem
      .filter(col("l_shipdate") > ts("1998-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Spark 4.1's DetectAmbiguousSelfJoin false-positives on any
    * rollup/cube whose grouping columns arrived through a join (no self
    * join involved). Analysis runs eagerly at Dataset construction, so
    * disabling the heuristic only while building the plan is safe and
    * scoped.
    */
  private def withoutSelfJoinCheck[A](t: Tables)(f: => A): A =
    // the conf toggle is session-global, so plan CONSTRUCTION is
    // serialized on the session (execution is unaffected): concurrent
    // builders on one SparkSession would otherwise race the
    // set/restore and could fail an unrelated thread's analysis
    t.spark.synchronized {
      val key = "spark.sql.analyzer.failAmbiguousSelfJoin"
      val old = t.spark.conf.get(key, "true")
      t.spark.conf.set(key, "false")
      try f finally t.spark.conf.set(key, old)
    }

  /** q3: ROLLUP over a broadcast dimension chain. */
  def q3RollupAcctbal(t: Tables): DataFrame = withoutSelfJoinCheck(t) {
    t.customer.select("c_nationkey", "c_acctbal")
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      .rollup("r_name", "n_name")
      .agg(
        sum(dec(col("c_acctbal"))).cast("double").as("total_bal"),
        count(lit(1)).as("n_cust"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** q4: left-semi join (EXISTS) with an extra non-equi predicate. */
  def q4SemiJoin(t: Tables): DataFrame = {
    val ord = t.orders
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1997-01-01"))
    val li = t.lineitem.select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** q5: left-anti join (NOT EXISTS) — customers with no recent orders. */
  def q5AntiJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders
          .filter(col("o_orderdate") >= ts("2000-01-01"))
          .select("o_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** q6: window top-N per group with a full deterministic tie-break. */
  def q6WindowTopN(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** q7: count-distinct per group across a two-hop dim join. The
    * nation hint stays (25 rows by construction); supplier grows with
    * scale factor, so its join is AQE's call.
    */
  def q7DistinctAgg(t: Tables): DataFrame =
    t.lineitem.select("l_suppkey")
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("n_name")

  /** q8: running (prefix) sum + lag over an ordered partition. Exact
    * decimal prefix sums — deterministic given the unique total order.
    */
  def q8RunningWindow(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t.orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_spend",
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("prev_order", lag("o_orderkey", 1).over(w))
      .drop("o_totalprice")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** q9: gap-and-islands sessionization (batch twin of st2): a new
    * session starts after a >30-minute silence per user.
    */
  def q9Sessionize(t: Tables): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t.events
      .select("user_id", "ts", "event_id")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  /** q10: semi-structured JSON column extraction + agg. */
  def q10JsonExtract(t: Tables): DataFrame =
    t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** q11: correlated scalar-aggregate filter (TPC-H Q17 shape):
    * lineitems with quantity below 20% of their part's average. The
    * threshold is rearranged to the decimal-exact integer inequality
    * 5·qty·cnt < sum(qty) so both engines make identical keep/drop
    * decisions (no double-avg epsilon at the boundary).
    *
    * The per-partkey aggregate (bounded by |part|) joins via a
    * SHUFFLE-HASH hint: left to its size estimates Spark picked the
    * raw fact scan as the broadcast build side (guaranteed OOM once
    * lineitem outgrows one executor), and broadcasting the aggregate
    * instead — the round-2 fix — still dies at the 8 GB broadcast /
    * driver-memory ceiling once |part| itself is large. Shuffle-hash
    * partitions both sides by l_partkey and builds the hash table on
    * the aggregate per-partition: no broadcast of anything
    * data-sized, scales with executors.
    */
  def q11ScalarSubquery(t: Tables): DataFrame = {
    val grp = t.lineitem.groupBy("l_partkey")
      .agg(sum(dec(col("l_quantity"))).as("sumq"), count(lit(1)).as("cnt"))
    t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
      .join(grp.hint("shuffle_hash"), "l_partkey")
      .filter(dec(col("l_quantity")) * 5 * col("cnt") < col("sumq"))
      .agg(
        (sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** q12: set operations — customers ordering in both 1995 and 1996
    * (INTERSECT) vs only 1995 (EXCEPT).
    */
  def q12SetOps(t: Tables): DataFrame = {
    def custs(year: Int) = t.orders
      .filter(col("o_orderdate") >= ts(s"$year-01-01") &&
              col("o_orderdate") < ts(s"${year + 1}-01-01"))
      .select("o_custkey").distinct()
    val both = custs(1995).intersect(custs(1996))
      .agg(count(lit(1)).as("n_both"))
    val only95 = custs(1995).except(custs(1996))
      .agg(count(lit(1)).as("n_only_1995"))
    both.crossJoin(only95)
  }

  /** q13: pivot — events per hour-of-day × event_type (fixed pivot
    * column list keeps the schema static and oracle-matchable).
    */
  def q13Pivot(t: Tables): DataFrame =
    t.events
      .select(hour(col("ts")).as("hr"), col("event_type"))
      .groupBy("hr")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("hr")

  /** q15: CUBE — all grouping-set combinations of (segment, priority)
    * with decimal-exact totals; the full grouping-sets surface beyond
    * q3's ROLLUP.
    */
  def q15Cube(t: Tables): DataFrame = withoutSelfJoinCheck(t) {
    t.orders.select("o_custkey", "o_orderpriority", "o_totalprice")
      // unhinted: customer grows with SF (see q2) — AQE decides
      .join(t.customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .cube("c_mktsegment", "o_orderpriority")
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("c_mktsegment"),
        asc_nulls_first("o_orderpriority"))
  }

  /** q14: exact quantiles (linear-interpolated median / p90) per
    * group. Spark `percentile` and DuckDB `quantile_cont` share the
    * definition (sort, index (n-1)·q, interpolate) so exact doubles
    * match; round(4) guards the interpolation arithmetic's last bit.
    * At scale, exact percentile is a full sort per group — `approx =
    * true` swaps in approx_percentile (mergeable QuantileSummaries,
    * constant memory per group) AT THIS CALL SITE and emits q16-style
    * error-bound flags next to the exact answer, so the swap is
    * oracle-gated (q14_quantiles_approx pins the flags to 1): a
    * sketch drifting out of its rank band breaks the hash like any
    * wrong answer. The exact aggregates feed the gate; the production
    * form at 100 TB is the sketch-only projection.
    */
  def q14Quantiles(t: Tables, approx: Boolean = false): DataFrame =
    if (!approx)
      t.orders
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("med"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    else
      t.orders
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("med"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("am"),
          expr("approx_percentile(o_totalprice, 0.9, 10000)").as("ap"),
          expr("percentile(o_totalprice, 0.49)").as("mlo"),
          expr("percentile(o_totalprice, 0.51)").as("mhi"),
          expr("percentile(o_totalprice, 0.89)").as("plo"),
          expr("percentile(o_totalprice, 0.91)").as("phi"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"), col("med"), col("p90"), col("n"),
          (col("am") >= col("mlo") && col("am") <= col("mhi"))
            .cast("int").as("med_ok"),
          (col("ap") >= col("plo") && col("ap") <= col("phi"))
            .cast("int").as("p90_ok"))
        .orderBy("o_orderpriority")

  /** q16: sketch aggregates under an ERROR-BOUND gate. The sketches
    * are the 100 TB swap-ins: approx_count_distinct is a mergeable
    * HyperLogLog++ (map-side partial, constant memory per group)
    * where COUNT(DISTINCT x) needs a full shuffle of distinct values;
    * approx_percentile is a mergeable QuantileSummaries sketch where
    * exact percentile sorts every group.
    *
    * Gate design: the register layouts are engine-private (DuckDB
    * cannot replay them), so the query emits the sketches' PUBLISHED
    * ERROR CONTRACT as data — per group, is the HLL estimate within
    * 3·rsd of the exact distinct count, and does each approx
    * percentile land inside the exact [p−δ, p+δ] rank band? δ=0.01:
    * the sketch's own contract is ε = 1/accuracy = 1e-4 of rank, but
    * the sketch emits a DISCRETE element while percentile()
    * interpolates, so at small test groups (n≈300 per group at
    * sf0.001) the band must cover at least a couple of order
    * statistics — δ is the noise floor of comparing the two forms at
    * test scale, not the sketch's accuracy. The oracle replays the
    * exact values and pins
    * every bound flag to 1, so a sketch drifting out of its contract
    * breaks the hash like any wrong answer. Both sketch estimates
    * are deterministic on fixed data (hash-based, no RNG), so the
    * flags cannot flake. The exact aggregates exist here to FEED the
    * gate; the production form is the sketch-only projection.
    */
  def q16Sketches(t: Tables): DataFrame =
    t.orders
      .groupBy("o_orderpriority")
      .agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("ac"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("am"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("ap"),
        countDistinct(col("o_custkey")).as("exact_custs"),
        expr("percentile(o_totalprice, 0.49)").as("mlo"),
        expr("percentile(o_totalprice, 0.51)").as("mhi"),
        expr("percentile(o_totalprice, 0.89)").as("plo"),
        expr("percentile(o_totalprice, 0.91)").as("phi"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"), col("n"), col("exact_custs"),
        (abs(col("ac") - col("exact_custs"))
          <= col("exact_custs") * lit(0.06)).cast("int").as("cd_ok"),
        (col("am") >= col("mlo") && col("am") <= col("mhi"))
          .cast("int").as("med_ok"),
        (col("ap") >= col("plo") && col("ap") <= col("phi"))
          .cast("int").as("p90_ok"))
      .orderBy("o_orderpriority")

  /** q19: DETERMINISTIC mergeable distinct sketch — KMV over an
    * explicit md5-derived hash column (graft.expressions
    * .KmvDistinctAgg), estimating distinct parts per return flag next
    * to the exact count. Unlike q16's HLL++ (whose registers are
    * engine-private → rows-only check), the k smallest hash values of
    * a group are a deterministic SET, so this sketch is hash-gated
    * against a DuckDB window replay while keeping the 100 TB sketch
    * properties: k-long bounded state per group, map-side partial
    * aggregation, associative merges (ObjectHashAggregate —
    * PlanSpec-locked).
    */
  def q19KmvSketch(t: Tables): DataFrame =
    t.lineitem
      .select(col("l_returnflag"),
        conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .groupBy("l_returnflag")
      .agg(
        floor(graft.functions.Sketch.kmvDistinct(col("h"), 64) * 10000 + 0.5)
          .divide(10000.0).as("est_parts"),
        countDistinct(col("h")).as("exact_hashes"))
      .orderBy("l_returnflag")

  /** q21: DETERMINISTIC quantile sketch — exact interpolated
    * median/p90 of the bottom-128-by-md5 uniform sample per order
    * priority (graft.expressions.BottomKQuantilesAgg). The
    * deterministic counterpart to q16's t-digest, hash-gated: the
    * oracle replays the identical sample with a hash-ordered window
    * and quantile_cont. Bounded state (128 entries/group), map-side
    * partial, associative merges — and the estimate converges as
    * 1/√k to q14's exact quantiles (spec-checked).
    */
  def q21BottomkQuantiles(t: Tables, k: Int = 128): DataFrame =
    t.orders
      .select(col("o_orderpriority"),
        md5(col("o_orderkey").cast("string")).as("h"),
        col("o_totalprice"))
      .groupBy("o_orderpriority")
      .agg(
        graft.functions.Sketch.bottomKQuantiles(
          col("h"), col("o_totalprice"), k, Seq(0.5, 0.9)).as("qs"),
        least(count(lit(1)), lit(k.toLong)).as("n_sample"))
      .select(col("o_orderpriority"),
        (floor(element_at(col("qs"), 1) * 10000 + 0.5) / 10000.0)
          .as("med_est"),
        (floor(element_at(col("qs"), 2) * 10000 + 0.5) / 10000.0)
          .as("p90_est"),
        col("n_sample"))
      .orderBy("o_orderpriority")

  /** q20: salted skew join (graft.api.Graft.saltedJoin) — events
    * joined to customers on user key with an 8-way salt, then a
    * segment rollup. The salt spreads any hot user across 8 reducers
    * (the hand fix for single-key skew beyond AQE's partition
    * splitting); the oracle is the PLAIN unsalted SQL join, proving
    * the rewrite changes the shuffle layout and nothing else.
    * PlanSpec asserts the join really is keyed on (key, salt) and
    * stays non-broadcast, since a broadcast join would defeat the
    * demonstration.
    */
  def q20SaltedJoin(t: Tables, nSalts: Int = 8): DataFrame = {
    val ev = t.events.select(col("event_id"), col("user_id"), col("value"))
    val cust = t.customer.select(col("c_custkey"), col("c_mktsegment"))
      // the dimension is broadcast-sized here; hint it to the shuffle
      // path so the plan demonstrates the big×big shape salting is for
      .hint("shuffle_hash")
    graft.api.Graft.saltedJoin(ev, cust, "user_id", "c_custkey",
        col("event_id"), nSalts)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /** q17: AS-OF join — for every event, the latest order of the same
    * customer at or before the event time, then a per-type rollup of
    * the recency gap. Spark has no asof operator; the SCALABLE
    * re-expression is the union-and-window pattern: tag both streams,
    * union, and take the running max of order-time per user over
    * (time, order-first-on-ties) order — ONE shuffle keyed by user,
    * no per-row range probe, no nested-loop join, works at any
    * fact×fact size. (DuckDB's native ASOF JOIN is the oracle.)
    */
  def q17AsofJoin(t: Tables): DataFrame = {
    val ev = t.events.select(col("user_id").as("uid"), col("ts").as("t"),
      col("event_type"), lit(0).as("is_order"))
    val ord = t.orders.select(col("o_custkey").as("uid"),
      col("o_orderdate").as("t"), lit(null).cast("string").as("event_type"),
      lit(1).as("is_order"))
    // orders sort BEFORE events at equal t (is_order desc) — the
    // at-or-before (inclusive) asof semantic
    val w = Window.partitionBy("uid")
      .orderBy(col("t"), col("is_order").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.unionAll(ord)
      .withColumn("last_order_t",
        max(when(col("is_order") === 1, col("t"))).over(w))
      .filter(col("is_order") === 0)
      .withColumn("gap_days",
        expr("(unix_micros(t) - unix_micros(last_order_t)) div 86400000000"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("last_order_t")).as("n_matched"),
        sum(col("gap_days")).as("sum_gap_days"))
      .orderBy("event_type")
  }

  /** q18: RANGE (interval-overlap) join with NO equi key — events
    * falling inside synthetic 2-hour maintenance windows (one per
    * order, placed by o_orderkey across the event month). The naive
    * plan is a nested-loop over the range predicate — O(|events|·
    * |windows|); the scale-safe re-expression BUCKETIZES time: each
    * window explodes into the hour buckets it covers (≤ 3 rows), each
    * event keys by its own hour, the join becomes an EQUI-join on
    * bucket with the exact range filter applied after. An event
    * matches a window in exactly one bucket (its own), so no
    * dedup step is needed. The window base derives from the data
    * (`date_trunc(day, min(ts))` as a 1-row broadcast), never a
    * timezone-sensitive literal.
    */
  def q18RangeJoin(t: Tables): DataFrame = {
    val hourUs = 3600000000L
    val base = t.events.agg(
      unix_micros(date_trunc("day", min(col("ts")))).as("base_us"))
    val win = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
      .crossJoin(broadcast(base))
      .withColumn("ws_us",
        col("base_us") + (col("o_orderkey") % 696) * hourUs)
      .withColumn("we_us", col("ws_us") + 2 * hourUs)
    val winBuckets = win.withColumn("bucket",
      explode(sequence(expr(s"ws_us div $hourUs"),
        expr(s"(we_us - 1) div $hourUs"))))
    val ev = t.events
      .select(unix_micros(col("ts")).as("ts_us"))
      .withColumn("bucket", expr(s"ts_us div $hourUs"))
    ev.join(winBuckets, "bucket")
      .filter(col("ts_us") >= col("ws_us") && col("ts_us") < col("we_us"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_windows_hit"))
      .orderBy("o_orderpriority")
  }

  /** Oracle SQL (DuckDB) — same shapes, same aliases, same float policy. */
  /** q22: DETERMINISTIC frequency sketch — Count-Min over the corpus
    * token stream, one sketch per lang (graft.expressions.CountMinAgg,
    * d=4 × w=1024 longs). Completes the mergeable-sketch family:
    * distinct (q19 KMV), quantiles (q21 bottom-k), frequencies (this).
    * Estimates for the five standard query terms are read out of the
    * sketch array and reported next to the exact counts — est ≥ exact
    * always (one-sided error), equality unless the term collides in
    * all d rows. HASH-GATED: element-wise-add merges make the sketch
    * bit-identical under any partitioning, so the DuckDB oracle
    * replays cells as (j, bucket) count sums and takes the same min.
    *
    * 100 TB shape: tokens never leave their scan except as d·w-long
    * partial buffers (map-side combine; one shuffle of 32 KB rows per
    * group); the estimate read-out is a projection over the tiny
    * sketch table.
    */
  def q22CmsFreq(t: Tables, d: Int = 4, w: Int = 1024): DataFrame =
    cmsFreqFrom(t.documents, d, w)

  /** DataFrame form of q22 (scale probe): any (lang, text) frame. */
  private[graft] def cmsFreqFrom(docsIn: DataFrame, d: Int,
      w: Int): DataFrame = {
    graft.Caches.fresh()
    val P = 4294967291L
    def h1of(m: Column) = conv(substring(m, 1, 8), 16, 10).cast("long")
    def h2of(m: Column) = conv(substring(m, 9, 8), 16, 10).cast("long")
    // materialized, not lazily cached: the exact-counts side reaches
    // this table through a BroadcastExchange, whose job launches on a
    // parallel thread — a lazy cache would be recomputed by it (the
    // cache-race pathology Caches.materialized documents)
    val toks = graft.Caches.materialized(
      docsIn
        .repartition(docsIn.sparkSession.sparkContext.defaultParallelism)
        .select(col("lang"),
          explode(graft.functions.Text.tokenize(col("text"))).as("term"))
        .withColumn("m", md5(col("term")))
        .select(col("lang"), col("term"),
          h1of(col("m")).as("h1"), h2of(col("m")).as("h2")))
    val sketches = toks.groupBy("lang")
      .agg(graft.functions.Sketch.countMin(col("h1"), col("h2"), d, w)
        .as("cms"))
    val exact = toks.filter(col("term").isin(Search.queryTerms: _*))
      .groupBy("lang", "term").agg(count(lit(1)).as("exact_n"))
    val qm = md5(col("term"))
    val est = least((0 until d).map { j =>
      element_at(col("cms"),
        (lit(j * w) + ((col("h1") + col("h2") * (j + 1)) % P) % w + 1)
          .cast("int"))
    }: _*)
    sketches
      .select(col("lang"), col("cms"),
        explode(array(Search.queryTerms.map(lit): _*)).as("term"))
      .withColumn("h1", h1of(qm)).withColumn("h2", h2of(qm))
      .withColumn("est", est)
      .join(exact, Seq("lang", "term"), "left")
      .select(col("lang"), col("term"), col("est"),
        coalesce(col("exact_n"), lit(0L)).as("exact_n"))
      .orderBy("lang", "term")
  }

  /** q23: TABLE PROFILING — the prelude pass every pipeline runs
    * before touching a new corpus: per column, row count, null count,
    * exact distinct count, and min/max (rendered as strings so one
    * tall schema covers every column type; doubles go through
    * DECIMAL(18,2) so both engines print identically). ONE aggregate
    * job over one scan (Spark expands the multi-column distinct
    * internally, map-side partial); the tall reshape is a projection
    * of the single result row. At 100 TB the exact countDistinct
    * swaps for approx_count_distinct: `approx = true` does that swap
    * AT THIS CALL SITE (HLL++, rsd 2%, mergeable map-side partial)
    * and emits a q16-style per-column `nd_ok` flag — |HLL − exact| ≤
    * 3·rsd·exact — that the q23_profile_approx oracle pins to 1, so
    * the swap stays inside its published error contract under the
    * same hash gate as an exact answer.
    */
  def q23TableProfile(t: Tables, approx: Boolean = false): DataFrame = {
    val df = t.orders
    val specs: Seq[(String, Column)] = Seq(
      "o_orderkey"      -> col("o_orderkey").cast("string"),
      "o_custkey"       -> col("o_custkey").cast("string"),
      "o_orderstatus"   -> col("o_orderstatus"),
      "o_totalprice"    -> col("o_totalprice").cast(Dec).cast("string"),
      "o_orderdate"     -> col("o_orderdate").cast("string"),
      "o_orderpriority" -> col("o_orderpriority"))
    val aggs = specs.flatMap { case (c, _) => Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd")) ++
      (if (approx)
        Seq(approx_count_distinct(col(c), rsd = 0.02).as(s"${c}__ad"))
      else Nil) } ++
      specs.map { case (c, s) => min(s).as(s"${c}__mn") } ++
      specs.map { case (c, s) => max(s).as(s"${c}__mx") }
    def profile(c: String) = {
      val base = Seq(
        lit(c).as("column"), col("__n").as("n"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_s"), col(s"${c}__mx").as("max_s"))
      if (approx) base :+ (abs(col(s"${c}__ad") - col(s"${c}__nd"))
        <= col(s"${c}__nd") * lit(0.06)).cast("int").as("nd_ok")
      else base
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(specs.map { case (c, _) =>
        struct(profile(c): _*) }: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  /** q25: GROUPING SETS — three heterogeneous reports in ONE pass:
    * revenue/count by (returnflag, linestatus), by linestatus ALONE,
    * and the grand total. Unlike q3's rollup / q15's cube, the sets
    * are not prefix- or powerset-shaped — exactly the case where
    * GROUPING SETS is the only one-pass form. Spark expands the sets
    * into one Expand + ONE hash aggregate (one shuffle serving all
    * three reports, vs three separate scans); null patterns identify
    * the set a row belongs to (grouping columns are non-null in the
    * data, pinned by the orderBy gate).
    */
  def q25GroupingSets(t: Tables): DataFrame =
    t.lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty[Column]),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  /** q24: TIME-SERIES GAP-FILL / RESAMPLE — regularize an event
    * stream onto a fixed grid, the prelude to any temporal feature
    * pipeline: per user, an hourly grid spans their first→last active
    * hour, gap hours land with n_events=0, and the last observed
    * event_type FORWARD-FILLS across gaps (`last(ignoreNulls)` — the
    * as-of read expressed as a window). The in-hour "last event" is
    * chosen by (ts, event_id) desc so both engines pick identically.
    *
    * Scale: the hourly rollup and the rank window share ONE exchange
    * (window and groupBy key on (user_id, hr)); grid generation is a
    * per-user `sequence` explode off the tiny span aggregate; the
    * fill window shuffles by user only. Grid size is span-bounded
    * (users × hours), never event-bounded — the operator's output is
    * the resampled series a feature store materializes.
    */
  def q24GapFill(t: Tables, maxUser: Long = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t.events.filter(col("user_id") < maxUser)
      .withColumn("hr", date_trunc("hour", col("ts")))
    val w1 = Window.partitionBy("user_id", "hr")
      .orderBy(col("ts").desc, col("event_id").desc)
    // consumed twice (span aggregate + grid join): materialize, or the
    // events scan + window + rollup subtree runs once per consumer
    graft.Caches.fresh()
    val hourly = graft.Caches.materialized(
      ev.withColumn("rn", row_number().over(w1))
        .groupBy("user_id", "hr")
        .agg(count(lit(1)).as("n"),
          max(when(col("rn") === 1, col("event_type"))).as("last_type")))
    val grid = hourly.groupBy("user_id")
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hr"))
    val w2 = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.cast("int").as("is_gap"),
        last(col("last_type"), ignoreNulls = true).over(w2)
          .as("ffill_type"))
      .orderBy("user_id", "hr")
  }

  /** md5-hex → int64 horner (same construction as the minhash oracle);
    * `m` must be a 32-hex column, `off` 0 for h1, 8 for h2.
    */
  private def hexHorner(off: Int): String =
    s"""list_sum([CAST((CASE WHEN ascii(substring(m, CAST(j AS INT) + $off, 1)) >= 97
       |  THEN ascii(substring(m, CAST(j AS INT) + $off, 1)) - 87
       |  ELSE ascii(substring(m, CAST(j AS INT) + $off, 1)) - 48 END) AS BIGINT)
       |  * CAST(power(16, 8 - j) AS BIGINT) FOR j IN range(1, 9)])""".stripMargin

  val oracle: Map[String, String] = Map(
    // grid via generate_series, in-hour last event by (ts, event_id)
    // desc rank, forward fill via last_value IGNORE NULLS
    "q24_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    date_trunc('hour', ts) AS hr
        |  FROM events WHERE user_id < 8),
        |r AS (
        |  SELECT user_id, hr, event_type,
        |    row_number() OVER (PARTITION BY user_id, hr
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev),
        |hourly AS (
        |  SELECT user_id, hr, count(*) AS n,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS last_type
        |  FROM r GROUP BY user_id, hr),
        |span AS (
        |  SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM span),
        |j AS (
        |  SELECT g.user_id, g.hr, coalesce(h.n, 0) AS n_events,
        |    CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS is_gap, h.last_type
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.user_id = g.user_id AND h.hr = g.hr)
        |SELECT user_id, hr, CAST(n_events AS BIGINT) AS n_events, is_gap,
        |  last_value(last_type IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS ffill_type
        |FROM j ORDER BY user_id, hr""".stripMargin,
    "q23_table_profile" -> {
      val cols = Seq(
        ("o_orderkey", "CAST(%s AS VARCHAR)"),
        ("o_custkey", "CAST(%s AS VARCHAR)"),
        ("o_orderstatus", "%s"),
        ("o_totalprice", "CAST(CAST(%s AS DECIMAL(18,2)) AS VARCHAR)"),
        ("o_orderdate", "CAST(%s AS VARCHAR)"),
        ("o_orderpriority", "%s"))
      val stats = cols.map { case (c, f) =>
        s"""SELECT '$c' AS "column", count(*) AS n,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min(${f.format(c)}) AS min_s, max(${f.format(c)}) AS max_s
           |FROM orders""".stripMargin }
      stats.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    // the HLL swap-in at q23's call site: exact profile replayed,
    // per-column 3·rsd contract flag pinned to 1
    "q23_profile_approx" -> {
      val cols = Seq(
        ("o_orderkey", "CAST(%s AS VARCHAR)"),
        ("o_custkey", "CAST(%s AS VARCHAR)"),
        ("o_orderstatus", "%s"),
        ("o_totalprice", "CAST(CAST(%s AS DECIMAL(18,2)) AS VARCHAR)"),
        ("o_orderdate", "CAST(%s AS VARCHAR)"),
        ("o_orderpriority", "%s"))
      val stats = cols.map { case (c, f) =>
        s"""SELECT '$c' AS "column", count(*) AS n,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  min(${f.format(c)}) AS min_s, max(${f.format(c)}) AS max_s,
           |  1 AS nd_ok
           |FROM orders""".stripMargin }
      stats.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    // full CMS replay: token (h1,h2) → d×w cell sums → per-query-term
    // min over rows — identical arithmetic to CountMinAgg.update
    "q22_cms_freq" ->
      s"""WITH tok AS (
         |  SELECT lang, t AS term FROM (
         |    SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
         |    FROM documents) u
         |  WHERE t <> ''),
         |tc AS (SELECT lang, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
         |hh AS (
         |  SELECT lang, term, cnt, ${hexHorner(0)} AS h1, ${hexHorner(8)} AS h2
         |  FROM (SELECT lang, term, cnt, md5(term) AS m FROM tc)),
         |cells AS (
         |  SELECT lang, jr, (h1 + (jr + 1) * h2) % 4294967291 % 1024 AS b,
         |    CAST(sum(cnt) AS BIGINT) AS c
         |  FROM hh, (SELECT unnest(range(0, 4)) AS jr) jj
         |  GROUP BY 1, 2, 3),
         |qhh AS (
         |  SELECT term, ${hexHorner(0)} AS h1, ${hexHorner(8)} AS h2
         |  FROM (SELECT term, md5(term) AS m FROM (
         |    SELECT unnest(['spark','filter','join','window','group']) AS term) q0)),
         |qb AS (
         |  SELECT l.lang, q.term, jr,
         |    (q.h1 + (jr + 1) * q.h2) % 4294967291 % 1024 AS b
         |  FROM qhh q, (SELECT DISTINCT lang FROM tok) l,
         |       (SELECT unnest(range(0, 4)) AS jr) jj),
         |est AS (
         |  SELECT qb.lang, qb.term, min(coalesce(c.c, 0)) AS est
         |  FROM qb LEFT JOIN cells c
         |    ON c.lang = qb.lang AND c.jr = qb.jr AND c.b = qb.b
         |  GROUP BY 1, 2)
         |SELECT e.lang, e.term, e.est, coalesce(x.cnt, 0) AS exact_n
         |FROM est e LEFT JOIN tc x ON x.lang = e.lang AND x.term = e.term
         |ORDER BY e.lang, e.term""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_revenue" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q3_rollup_acctbal" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        | COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q6_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q7_distinct_agg" ->
      """SELECT n_name,
        | COUNT(DISTINCT l_suppkey) AS n_suppliers,
        | COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q8_running_window" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
        | LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |                          ORDER BY o_orderdate, o_orderkey) AS prev_order
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q9_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM g),
        |s AS (
        |  SELECT user_id,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM b)
        |SELECT user_id, session_id, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q11_scalar_subquery" ->
      """WITH g AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sumq,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_items
        |FROM lineitem l JOIN g USING (l_partkey)
        |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * cnt < sumq""".stripMargin,
    "q12_set_ops" ->
      """WITH c95 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |c96 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT
        |  (SELECT COUNT(*) FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96) x) AS n_both,
        |  (SELECT COUNT(*) FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96) y) AS n_only_1995""".stripMargin,
    "q13_pivot" ->
      """SELECT CAST(hour(ts) AS INT) AS hr,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS "click",
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS "error",
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS "signup",
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY hour(ts) ORDER BY hr""".stripMargin,
    "q25_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q15_cube" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderpriority)
        |ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // the sketches themselves are engine-private; the oracle replays
    // the EXACT aggregates and pins the error-bound flags to 1 — the
    // hash gate thereby enforces the sketches' published contract
    // (HLL within 3·rsd, percentile within the ±0.01 rank band)
    "q16_sketches" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        |  1 AS cd_ok, 1 AS med_ok, 1 AS p90_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q14_quantiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS med,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the sketch swap-in at q14's call site: exact answers replayed,
    // rank-band flags pinned to 1 (q16's gate design)
    "q14_quantiles_approx" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS med,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  COUNT(*) AS n, 1 AS med_ok, 1 AS p90_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // replays the deterministic sample (hash-ordered window, k
    // smallest md5 keys) and interpolates with quantile_cont — the
    // identical doubles in the identical formula
    "q21_bottomk_quantiles" ->
      """WITH hh AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    md5(CAST(o_orderkey AS VARCHAR)) AS h
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
        |  FROM hh)
        |SELECT o_orderpriority,
        |  floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5) / 10000.0 AS med_est,
        |  floor(quantile_cont(o_totalprice, 0.9) * 10000 + 0.5) / 10000.0 AS p90_est,
        |  count(*) AS n_sample
        |FROM r WHERE rn <= 128
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the UNSALTED join: salting must be invisible in the result
    "q20_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // replays the KMV sketch exactly: same md5-hash domain, k-th
    // smallest via a window, same debiased estimator and portable
    // floor-rounding — a deterministic sketch is hash-gateable
    "q19_kmv_sketch" ->
      """WITH hh AS (
        |  SELECT DISTINCT l_returnflag AS flag,
        |    list_sum([CAST((CASE WHEN ascii(substring(md5(CAST(l_partkey AS VARCHAR)), CAST(j AS INT), 1)) >= 97
        |               THEN ascii(substring(md5(CAST(l_partkey AS VARCHAR)), CAST(j AS INT), 1)) - 87
        |               ELSE ascii(substring(md5(CAST(l_partkey AS VARCHAR)), CAST(j AS INT), 1)) - 48 END) AS BIGINT)
        |              * CAST(power(16, 8 - j) AS BIGINT) FOR j IN range(1, 9)]) AS h
        |  FROM lineitem),
        |r AS (
        |  SELECT flag, h,
        |    row_number() OVER (PARTITION BY flag ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS nd
        |  FROM hh)
        |SELECT flag AS l_returnflag,
        |  floor((CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
        |         ELSE 63 * 4294967296.0 / max(CASE WHEN rn = 64 THEN h END) END)
        |        * 10000 + 0.5) / 10000.0 AS est_parts,
        |  max(nd) AS exact_hashes
        |FROM r GROUP BY flag ORDER BY l_returnflag""".stripMargin,
    "q17_asof_join" ->
      """WITH j AS (
        |  SELECT e.event_type, e.ts, o.o_orderdate
        |  FROM events e ASOF LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
        |SELECT event_type, count(*) AS n_events,
        |  count(o_orderdate) AS n_matched,
        |  CAST(sum((epoch_us(ts) - epoch_us(o_orderdate)) // 86400000000)
        |       AS BIGINT) AS sum_gap_days
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    // plain inequality join — DuckDB's IEJoin handles the range
    // predicate natively, which is exactly the independent-engine
    // check the bucketized Spark form needs
    "q18_range_join" ->
      """WITH base AS (
        |  SELECT date_trunc('day', min(ts)) AS b FROM events),
        |win AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    b + (o_orderkey % 696) * INTERVAL 1 HOUR AS ws,
        |    b + ((o_orderkey % 696) + 2) * INTERVAL 1 HOUR AS we
        |  FROM orders, base)
        |SELECT o_orderpriority, count(*) AS n_pairs,
        |  count(DISTINCT o_orderkey) AS n_windows_hit
        |FROM events e JOIN win w ON e.ts >= w.ws AND e.ts < w.we
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}
