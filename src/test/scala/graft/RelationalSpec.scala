package graft

import org.apache.spark.sql.functions._

/** Plan-shape + semantic checks for the relational core (SURVEY §6). */
class RelationalSpec extends SparkSpec {

  test("q1_agg: 6 (returnflag, linestatus) groups with positive sums") {
    val rows = run("q1_agg").collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getAs[Double]("sum_qty") > 0))
    assert(rows.forall(r => r.getAs[Long]("count_order") > 0))
  }

  test("q2_pushdown: both predicates and the 3-column projection reach the scan") {
    val df = run("q2_pushdown")
    df.collect()
    val p = plan(df)
    assert(p.contains("PushedFilters:"), "no pushed filters in scan")
    assert(p.contains("o_orderstatus"), "status predicate not pushed")
    // (plan toString truncates long metadata — match the prefix)
    assert(p.contains("GreaterThan(o_total"), "price predicate not pushed")
    val read = "ReadSchema:.*".r.findFirstIn(p).getOrElse("")
    assert(!read.contains("o_orderpriority"), s"unpruned column: $read")
  }

  test("q6_star_join: nation/region broadcast-hinted, customer NOT hinted") {
    val df = run("q6_star_join")
    val logical = df.queryExecution.logical.toString()
    val hints = "(?i)hint".r.findAllIn(logical).length
    assert(hints == 2, s"expected 2 broadcast hints (nation, region), got $hints")
    df.collect()
    assert(plan(df).contains("BroadcastHashJoin"), "dims not broadcast at runtime")
  }

  test("q3_join_agg: no forced broadcast hint (AQE decides the customer join)") {
    val logical = run("q3_join_agg").queryExecution.logical.toString()
    assert(!"(?i)hint".r.findFirstIn(logical).isDefined,
      "q3 must leave join strategy to AQE")
  }

  test("q10_topk compiles to TakeOrderedAndProject (no global sort)") {
    val df = run("q10_topk")
    df.collect()
    assert(plan(df).contains("TakeOrderedAndProject"))
  }

  test("q7b_topk_agg: identical rows to q7_window_topk, aggregate plan shape") {
    val viaWindow = run("q7_window_topk").collect().map(_.toSeq).toSeq
    val viaAgg = run("q7b_topk_agg").collect().map(_.toSeq).toSeq
    assert(viaAgg == viaWindow, "bounded-heap top-k must equal window top-k")
    val df = run("q7b_topk_agg")
    df.collect()
    val p = plan(df)
    assert(p.contains("topk_min"), "custom aggregate missing from plan")
    assert(p.contains("partial_topk_min") || p.contains("Partial"),
      "map-side partial aggregation missing — the whole point at scale")
    assert(!p.contains("Window"), "q7b must not plan a window")
  }

  test("q8b approx distinct within 5% of exact") {
    val exact = run("q8_distinct").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_supps"))).toMap
    run("q8b_approx_distinct").collect().foreach { r =>
      val (p, s) = exact(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Long]("n_parts_approx") - p) <= 0.05 * p)
      assert(math.abs(r.getAs[Long]("n_supps_approx") - s) <= 0.05 * s)
    }
  }

  test("q8c KMV sketch estimate within 20% of exact (3sigma at k=256)") {
    run("q8c_kmv_distinct").collect().foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("n_kmv")
      assert(math.abs(est - exact) <= 0.20 * exact + 1,
        s"${r.getAs[String]("l_returnflag")}: kmv $est vs exact $exact")
    }
  }

  test("topk_min edge cases: k exceeds rows, ties, null inputs skipped") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 3.0), (3L, 3.0)).toDF("id", "v")
    df.createOrReplaceTempView("tk_edge")
    // k > rows: returns all rows, sorted
    val all = spark.sql(
      "SELECT topk_min(struct(v, id), 10) AS t FROM tk_edge")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(all.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((3.0, 2L), (3.0, 3L), (5.0, 1L)), s"got $all")
    // k smaller: ties broken by the struct's later field
    val two = spark.sql(
      "SELECT topk_min(struct(v, id), 2) AS t FROM tk_edge")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(two.map(_.getLong(1)) == Seq(2L, 3L))
    // null structs are ignored like any SQL aggregate input
    val withNull = spark.sql("""
      SELECT topk_min(CASE WHEN id = 1 THEN NULL ELSE struct(v, id) END, 5)
        AS t FROM tk_edge""")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(withNull.map(_.getLong(1)) == Seq(2L, 3L))
  }

  test("q16_sessionize: session count bounded by event count, >=1 per active user") {
    run("q16_sessionize").collect().foreach { r =>
      val s = r.getAs[Long]("n_sessions")
      assert(s >= 1 && s <= r.getAs[Long]("n_events"))
    }
  }

  test("q22_percentile: sketch-bounded selection equals the exact window, no Window in plan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType

    def exactWindow(dir: String) = {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
      val ranked = Tables.orders(spark, dir)
        .select(col("o_orderpriority"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast(LongType))
      val sizes = Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      ranked.join(sizes, "o_orderpriority")
        .groupBy(col("o_orderpriority"), col("n"))
        .agg(
          min(when(col("rn") === expr("((n - 1) * 5) div 10 + 1"),
            col("o_totalprice"))).as("p50"),
          min(when(col("rn") === expr("((n - 1) * 9) div 10 + 1"),
            col("o_totalprice"))).as("p90"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n"),
        r.getAs[Double]("p50"), r.getAs[Double]("p90"))).sorted.toSeq

    // exact-value parity at two scale factors (different n per group,
    // so the rank arithmetic and bracket margins both get exercised)
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      assert(rows(run("q22_percentile", dir)) == rows(exactWindow(dir)),
        s"selection != exact window at $dir")
    }

    // the scale contract: no window (hence no per-priority global sort)
    // anywhere in the executed plan
    val df = run("q22_percentile")
    df.collect()
    assert(!plan(df).contains("Window"),
      "q22 must not window on the 5-value priority key")
  }

  test("q22_percentile: degenerate groups (min == max, single row) yield exact values") {
    import spark.implicits._
    // width_bucket(v, mn, mx, n) is NULL when mn == mx — constant-price
    // and single-row groups must still select the exact value
    val tmp = java.nio.file.Files.createTempDirectory("q22const").toString
    val data =
      Seq.fill(7)(("CONST", 42.5)) ++
      (0 to 10).map(i => ("VARIED", 10.0 + i)) ++
      Seq(("SINGLE", 7.25))
    data.toDF("o_orderpriority", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = run("q22_percentile", tmp).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n"),
        r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toSeq.sortBy(_._1)
    // VARIED: n=11 over 10.0..20.0 → k50=6 → 15.0, k90=10 → 19.0
    assert(got == Seq(
      ("CONST", 7L, 42.5, 42.5),
      ("SINGLE", 1L, 7.25, 7.25),
      ("VARIED", 11L, 15.0, 19.0)))
  }

  test("q24_profile: one consistent summary row") {
    val r = run("q24_profile").collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_rows")
    assert(n > 0 && row.getAs[Long]("custkey_nonnull") <= n)
    assert(row.getAs[Long]("custkey_distinct") <= row.getAs[Long]("custkey_nonnull"))
    assert(row.getAs[Double]("price_min") <= row.getAs[Double]("price_max"))
    assert(row.getAs[String]("date_min") <= row.getAs[String]("date_max"))
  }

  test("q22_percentile: distinct-value skew resolved by the hit-bucket re-split") {
    import spark.implicits._
    // 10k DISTINCT values packed into <0.001% of the value range (all
    // land in coarse bucket 1) plus one far outlier stretching [mn, mx]
    // — the pathological case where the coarse histogram alone would
    // walk every packed entry; the re-split re-buckets them 1000× finer
    val vals = (0 until 10000).map(i => 1000.0 + i * 0.001) :+ 9.0e9
    val tmp = java.nio.file.Files.createTempDirectory("q22skew").toString
    vals.map(v => ("SKEW", v)).toDF("o_orderpriority", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val n = vals.length
    val sorted = vals.sorted
    def rank(mult: Int) = sorted(((n - 1) * mult / 10 + 1) - 1)
    val r = run("q22_percentile", tmp).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n") == n)
    assert(r.head.getAs[Double]("p50") == rank(5), "p50 under value skew")
    assert(r.head.getAs[Double]("p90") == rank(9), "p90 under value skew")
  }

  test("q25_setops: set algebra consistent with distinct cohort counts") {
    import org.apache.spark.sql.functions._
    val r = run("q25_setops").collect()
      .map(x => x.getAs[String]("set_op") -> x.getAs[Long]("n_custs")).toMap
    assert(r.keySet == Set("except_95_not_96", "except_96_not_95",
      "intersect_95_96"))
    val o = Tables.orders(spark, sf)
    def cohort(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct().count()
    // |A| = |A\B| + |A∩B| and symmetrically — the set identity the three
    // operators must jointly satisfy
    assert(cohort(1995) == r("except_95_not_96") + r("intersect_95_96"))
    assert(cohort(1996) == r("except_96_not_95") + r("intersect_95_96"))
    assert(r("intersect_95_96") > 0, "sf0.001 has year-over-year repeaters")
  }

  test("q26_grouping_sets: gid bit semantics, every set internally " +
      "consistent with the grand total") {
    val rows = run("q26_grouping_sets").collect()
      .map(r => (r.getAs[String]("status"), r.getAs[String]("priority"),
        r.getAs[Long]("gid"), r.getAs[Long]("n_orders")))
    val total = rows.filter(_._3 == 3L)
    assert(total.length == 1 && total.head._1 == "ALL" &&
      total.head._2 == "ALL", "gid=3 is the () set")
    val n = total.head._4
    // each grouping set partitions the same input: counts re-add to the
    // grand total, and the gid bits track which column is aggregated
    // (MSB = status, the leftmost group column)
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(rows.filter(_._3 == gid).map(_._4).sum == n, s"gid=$gid sum")
    }
    rows.foreach { case (st, pr, gid, _) =>
      assert((st == "ALL") == ((gid & 2L) != 0L), s"status bit at $gid")
      assert((pr == "ALL") == ((gid & 1L) != 0L), s"priority bit at $gid")
    }
  }

  test("q27_time_range_agg: frame equals the brute-force inequality join; " +
      "one keyed shuffle, no cartesian") {
    val rows = run("q27_time_range_agg").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_last_hour"), r.getAs[Double]("value_last_hour")))
      .toMap
    assert(rows.nonEmpty && rows.values.forall(_._1 >= 1L),
      "every frame contains at least the current row")
    // independent definition: the O(n²)-per-user inequality self-join the
    // RANGE frame replaces — counts and exact sums must agree row-for-row
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
    val brute = e.as("a").join(e.as("b"), col("a.user_id") === col("b.user_id"))
      .filter(col("b.us") >= col("a.us") - lit(3600L * 1000000L) &&
        col("b.us") <= col("a.us"))
      .groupBy(col("a.event_id"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("b.value") * 1000000)
          .cast("long")) / 1000000.0).as("v"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n"), r.getAs[Double]("v"))).toMap
    assert(rows == brute, "RANGE frame diverges from inequality-join truth")
    val df = run("q27_time_range_agg")
    df.collect()
    val p = plan(df)
    assert(p.contains("Window"), "must plan a window, not a join")
    assert(p.contains("hashpartitioning(user_id"),
      "window must shuffle once on user_id")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "the whole point: no join at all")
  }

  test("q28_correlated: decorrelates to key-joined aggregates, matches " +
      "the DataFrame-computed truth") {
    val got = run("q28_correlated").collect()
      .map(r => r.getAs[Long]("custkey") -> r.getAs[Long]("n_above")).toMap
    // independent truth: group-side computation with the same integer
    // comparison
    val byCust = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 1000000).cast("long").as("p"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("p")))
      .groupBy(_._1)
    val expect = byCust.flatMap { case (ck, rows) =>
      val n = rows.size.toLong
      val sum = rows.map(_._2).sum
      val c = rows.count(r => r._2 * n * 2 > sum * 3).toLong
      if (c > 0) Some(ck -> c) else None
    }
    assert(got == expect, s"q28 diverges: ${got.size} vs ${expect.size}")
    assert(got.nonEmpty, "sf0.001 has self-relative outliers")
    val df = run("q28_correlated")
    df.collect()
    val p = plan(df)
    // decorrelation contract: the correlated subqueries become key
    // equi-joins — never a nested-loop per outer row
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      "correlated subqueries must decorrelate to equi-joins")
  }

  test("q29_lateral: the lateral LIMIT decorrelates to a rank plan and " +
      "matches the window-computed top-2 per nation") {
    val got = run("q29_lateral").collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("custkey"),
        r.getAs[Long]("bal_micros"))).toSeq
    // independent truth: per-nation top-2 via plain collections
    val nat = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Long]("n_nationkey") -> r.getAs[String]("n_name"))
      .toMap
    val expect = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey"),
        round(col("c_acctbal") * 1000000).cast("long").as("p"))
      .collect()
      .map(r => (nat(r.getAs[Long]("c_nationkey")), r.getAs[Long]("c_custkey"),
        r.getAs[Long]("p")))
      .groupBy(_._1)
      .flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(2).toSeq
      }.toSeq.sortBy(t => (t._1, -t._3, t._2))
    assert(got == expect, s"q29 diverges (${got.size} vs ${expect.size})")
    assert(got.nonEmpty && got.size == nat.size * 2)
    val df = run("q29_lateral")
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      "the lateral limit must decorrelate — never a per-outer-row loop")
  }

  test("q30_full_outer: one SMJ full outer on the key — no BNLJ " +
      "fallback — and the segments partition the key universe") {
    val df = run("q30_full_outer")
    val rows = df.collect()
    val p = plan(df)
    assert(p.contains("FullOuter"), s"expected a full outer join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      "full outer must plan as a key-shuffled join, never a nested loop")
    // segment counts partition the union of both key sets exactly
    val seg = rows.map(r =>
      r.getAs[String]("segment") -> r.getAs[Long]("n_keys")).toMap
    val buyers = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    val cohort = Tables.customer(spark, sf)
      .filter(col("c_acctbal") >= 5000.0).count()
    assert(seg.getOrElse("both", 0L) + seg.getOrElse("orders_only", 0L)
      == buyers, "order-side keys must split across both/orders_only")
    assert(seg.getOrElse("both", 0L) + seg.getOrElse("cohort_only", 0L)
      == cohort, "cohort-side keys must split across both/cohort_only")
    assert(seg.getOrElse("cohort_only", 0L) > 0 &&
      seg.getOrElse("orders_only", 0L) > 0,
      "both dangling sides must be non-empty — otherwise the full outer " +
        "degenerates to a one-sided join and proves nothing")
    Caches.releaseScope()
  }
}
