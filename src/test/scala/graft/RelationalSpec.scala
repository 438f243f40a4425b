package graft

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary: 6 flag/status groups, counts add up") {
    val rows = run("q1_pricing_summary").collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6005)
    // sums are positive and sum_disc_price <= sum_base_price
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q2 top revenue: at most 10 rows, sorted by revenue desc") {
    val rows = run("q2_top_revenue").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q3 rollup: has grand total row equal to customer count") {
    val rows = run("q3_rollup_acctbal").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(grand.head.getAs[Long]("n_cust") == nCust)
    // region subtotals sum to grand total
    val regionRows = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(regionRows.map(_.getAs[Long]("n_cust")).sum == nCust)
  }

  test("q4 semi join: priorities are the 5 known values") {
    val rows = run("q4_semi_join").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getAs[Long]("n_orders") > 0))
  }

  test("q5 anti join: counts customers with no recent orders") {
    import org.apache.spark.sql.functions._
    val rows = run("q5_anti_join").collect()
    val antiTotal = rows.map(_.getAs[Long]("n_customers")).sum
    val t = Tables(spark, sf)
    val withRecent = t.orders
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").distinct().count()
    val allCust = t.customer.count()
    assert(antiTotal == allCust - withRecent)
  }

  test("q6 window topn: rn in 1..3, strictly ranked per customer") {
    val rows = run("q6_window_topn").collect()
    assert(rows.forall(r => r.getAs[Int]("rn") >= 1 && r.getAs[Int]("rn") <= 3))
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Int]("rn"))
      assert(ranked.map(_.getAs[Int]("rn")).sameElements(1 to ranked.length))
      val prices = ranked.map(_.getAs[Double]("o_totalprice"))
      assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)) ||
        prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q7 distinct agg: supplier counts bounded by supplier table") {
    val rows = run("q7_distinct_agg").collect()
    val nSupp = spark.read.parquet(s"$sf/supplier.parquet").count()
    assert(rows.map(_.getAs[Long]("n_suppliers")).sum <= nSupp * rows.length)
    assert(rows.forall(r => r.getAs[Long]("n_suppliers") <= nSupp))
  }

  test("q8 running window: running_spend is non-decreasing per customer") {
    val rows = run("q8_running_window").collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val spends = rs.map(_.getAs[Double]("running_spend"))
      assert(spends.zip(spends.tail).forall { case (a, b) => b >= a })
    }
  }

  test("q9 sessionize: session event counts sum to total events") {
    val rows = run("q9_sessionize").collect()
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == nEvents)
    assert(rows.forall(_.getAs[Long]("session_id") >= 1))
  }

  test("q10 json extract: five event types, sums non-negative") {
    val rows = run("q10_json_extract").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Long]("sum_k") >= 0))
  }

  test("q11 scalar subquery: one row, positive yearly average") {
    val rows = run("q11_scalar_subquery").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("avg_yearly") > 0)
    assert(rows.head.getAs[Long]("n_items") > 0)
  }

  test("q12 set ops: intersect + except partition the 1995 customers") {
    import org.apache.spark.sql.functions._
    val r = run("q12_set_ops").collect().head
    val t = Tables(spark, sf)
    def custs(y: Int) = t.orders
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
              col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    val n95 = custs(1995).count()
    assert(r.getAs[Long]("n_both") + r.getAs[Long]("n_only_1995") == n95)
  }

  test("q13 pivot: 24 hours, row sums equal event count") {
    val rows = run("q13_pivot").collect()
    assert(rows.length == 24)
    val total = rows.map(r =>
      r.getAs[Long]("click") + r.getAs[Long]("error") +
        r.getAs[Long]("purchase") + r.getAs[Long]("signup") +
        r.getAs[Long]("view")).sum
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("q14 quantiles: med <= p90 per priority, n sums to order count") {
    val rows = run("q14_quantiles").collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Double]("med") <= r.getAs[Double]("p90")))
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders)
  }

  test("q15 cube: grand total present; 4 grouping-set strata") {
    val rows = run("q15_cube").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(grand.head.getAs[Long]("n") == nOrders)
    // segment-only subtotals also sum to the grand total
    val segOnly = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(segOnly.map(_.getAs[Long]("n")).sum == nOrders)
    val priOnly = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(priOnly.map(_.getAs[Long]("n")).sum == nOrders)
  }

  test("q25 grouping sets: exactly the three declared reports, each " +
      "internally consistent — no rollup/cube strata leak in") {
    val rows = run("q25_grouping_sets").collect()
    val nLi = spark.read.parquet(s"$sf/lineitem.parquet").count()
    // grand total: one all-null row carrying every lineitem
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == nLi)
    // status-only report sums to the total
    val statusOnly = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(statusOnly.nonEmpty &&
      statusOnly.map(_.getAs[Long]("n")).sum == nLi)
    // the (flag, status) report partitions the total too
    val both = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(both.nonEmpty && both.map(_.getAs[Long]("n")).sum == nLi)
    // and NO flag-only stratum exists — the sets are not a rollup
    assert(!rows.exists(r => !r.isNullAt(0) && r.isNullAt(1)))
  }

  test("q17 asof join: every event matches its user's latest prior order") {
    import org.apache.spark.sql.functions._
    val rows = run("q17_asof_join").collect()
    assert(rows.nonEmpty)
    // domain property: all orders precede all events and every event
    // user is a customer, so the asof LEFT join fully matches
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") == r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("sum_gap_days") > 0)
    }
    // point check: one user's latest order genuinely precedes their
    // first event (epoch micros sidestep the ts vs ntz value classes)
    val ev = Tables(spark, sf).events.filter(col("user_id") === 7L)
      .agg(min(unix_micros(col("ts")))).collect()(0).getLong(0)
    val latest = Tables(spark, sf).orders
      .filter(col("o_custkey") === 7L)
      .agg(max(unix_micros(col("o_orderdate").cast("timestamp"))))
      .collect()(0).getLong(0)
    assert(latest < ev)
  }

  test("q18 range join: bucketized interval join matches a direct range filter") {
    import org.apache.spark.sql.functions._
    val rows = run("q18_range_join").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    // independent recompute of the pair total via a raw range join on
    // a sampled window subset (cross-shape is fine in a test)
    val t = Tables(spark, sf)
    val base = t.events.agg(
      unix_micros(date_trunc("day", min(col("ts")))).as("b"))
      .collect()(0).getLong(0)
    val wins = t.orders.limit(200)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
      .map(k => (k, base + (k % 696) * 3600000000L))
    val evs = t.events.select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val samplePairs = wins.map { case (_, ws) =>
      evs.count(e => e >= ws && e < ws + 2 * 3600000000L).toLong
    }.sum
    assert(total > 0 && samplePairs > 0)
    // the sampled subset can't exceed the full result
    assert(samplePairs <= total)
    // plan shape: the range predicate must ride an equi-join, never a
    // data-sized nested loop
    val df = run("q18_range_join")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(500))
  }

  test("q16 sketches: bound flags all pass, and the bounds replay independently") {
    import org.apache.spark.sql.functions._
    val rows = run("q16_sketches").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("cd_ok") == 1 && r.getAs[Int]("med_ok") == 1 &&
        r.getAs[Int]("p90_ok") == 1, r.toString)
    }
    // independent replay of the contract the in-query flags encode:
    // sketch vs exact straight from the table, not via q16's columns
    Tables(spark, sf).orders.groupBy("o_orderpriority")
      .agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("ac"),
        countDistinct(col("o_custkey")).as("cd"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("am"),
        expr("percentile(o_totalprice, 0.5)").as("med"))
      .collect().foreach { r =>
        val cd = r.getAs[Long]("cd")
        val cdErr = math.abs(r.getAs[Long]("ac") - cd).toDouble / cd
        assert(cdErr <= 0.06, s"HLL err $cdErr")      // 3·rsd at rsd=0.02
        val med = r.getAs[Double]("med")
        val medErr = math.abs(r.getAs[Double]("am") - med) / med
        assert(medErr <= 0.02, s"percentile err $medErr")
      }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q23 profile: one row per column, counts consistent with the table") {
    val t = Tables(spark, sf)
    val nOrders = t.orders.count()
    val rows = run("q23_table_profile").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == nOrders)
      assert(r.getAs[Long]("n_null") == 0)   // synthetic orders: no nulls
      val nd = r.getAs[Long]("n_distinct")
      assert(nd >= 1 && nd <= nOrders)
      assert(r.getAs[String]("min_s") <= r.getAs[String]("max_s"))
    }
    val byCol = rows.map(r => r.getAs[String]("column") ->
      r.getAs[Long]("n_distinct")).toMap
    assert(byCol("o_orderkey") == nOrders)      // key column: all distinct
    assert(byCol("o_orderstatus") <= 3)
    assert(byCol("o_orderpriority") == 5)
  }

  test("q24 gap-fill: grid contiguous per user, gaps zeroed, fill carries") {
    val rows = run("q24_gap_fill").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val hrs = rs.map(_.getAs[java.sql.Timestamp]("hr").getTime).sorted
      // hourly grid with no holes: consecutive stamps differ by 3600s
      hrs.zip(hrs.tail).foreach { case (a, b) =>
        assert(b - a == 3600000L, s"user $u grid hole")
      }
      // endpoints are observed (span is min..max of ACTIVE hours)
      val byHr = rs.sortBy(_.getAs[java.sql.Timestamp]("hr").getTime)
      assert(byHr.head.getAs[Int]("is_gap") == 0)
      assert(byHr.last.getAs[Int]("is_gap") == 0)
      var lastSeen: String = null
      byHr.foreach { r =>
        val gap = r.getAs[Int]("is_gap")
        assert((r.getAs[Long]("n_events") == 0L) == (gap == 1))
        if (gap == 0) lastSeen = r.getAs[String]("ffill_type")
        else assert(r.getAs[String]("ffill_type") == lastSeen,
          s"user $u fill broke")
        assert(r.getAs[String]("ffill_type") != null)
      }
    }
  }

  test("events ts normalization: all generator encodings land on the " +
      "same TimestampType instants") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables(spark, sf).events
    assert(ev.schema("ts").dataType == TimestampType)
    // whatever the file encodes, normalization must preserve the
    // instant: against a long-encoded file (legacy nanos) compare
    // epoch-µs numerically; against a timestamp-encoded file compare
    // the zone-less wall-clock string (the session zone is UTC, so
    // instant-preservation == string equality; DuckDB renders the
    // same strings for the oracle)
    val rawDf = spark.read.parquet(s"$sf/events.parquet")
    val raw = (rawDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        rawDf.select(col("event_id"), expr("cast(ts div 1000 as string)"))
      case _ => rawDf.select(col("event_id"), expr("cast(ts as string)"))
    }).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val normalized = (rawDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.select(col("event_id"), unix_micros(col("ts")).cast("string"))
      case _ => ev.select(col("event_id"), col("ts").cast("string"))
    }).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(normalized.nonEmpty)
    normalized.foreach { case (id, s) => assert(raw(id) == s) }
  }
}
