package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Checkpoints, Op, Tables}
import graft.Op.{xhash32, xsum}
import graft.functions.Portable._

/** Relational analytics core (SURVEY.md §2 part B).
  *
  * Declarative DataFrame plans: Catalyst pushes filters/projections into
  * the parquet scans, broadcasts the dimension sides of star joins, and
  * keeps every aggregate map-side-combining. All money aggregates use the
  * portable exact-sum idiom so results are identical under any partitioning
  * (and identical to the DuckDB oracle).
  */
object RelationalOps {

  /** TPC-H Q1 shape: scan → filter → groupBy → multi-aggregate.
    * One shuffle on the (low-cardinality) grouping key; partial aggregation
    * happens map-side, so at 100 TB the shuffle carries only
    * |groups| × |partitions| rows.
    */
  val q1Agg: Op = Op(
    "q1_agg",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1999-12-31"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${xsum("l_quantity")} AS sum_qty,
        ${xsum("l_extendedprice")} AS sum_base_price,
        ${xsum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
        ${xsum("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-12-31'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Projection + predicate pushdown: the scan must read only 3 columns and
    * receive both pushed filters (verified in RelationalSpec via explain).
    */
  val q2Pushdown: Op = Op(
    "q2_pushdown",
    (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0)
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             o_totalprice
      FROM orders
      WHERE o_orderstatus = 'F' AND o_totalprice > 100000
      ORDER BY o_orderkey"""))

  /** TPC-H Q3 shape: 3-way join + agg + top-k. customer scales with SF so
    * it is NOT broadcast-hinted — AQE picks the join strategy at runtime
    * (broadcast at small SF, shuffle-hash at 100 TB). Top-k via
    * orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
    * no global sort).
    */
  val q3JoinAgg: Op = Op(
    "q3_join_agg",
    (s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             ${xsum("l_extendedprice*(1-l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""))

  /** EXISTS → left-semi join (no row multiplication, build side streams). */
  val q4Semijoin: Op = Op(
    "q4_semijoin",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).filter(col("l_quantity") > 45.0)
        .select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** NOT EXISTS → left-anti join (the reference's retirement-delete shape). */
  val q5Antijoin: Op = Op(
    "q5_antijoin",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      ORDER BY c_custkey"""))

  /** 4-way star join: region/nation are bounded dims → broadcast; customer
    * scales with SF → un-hinted (AQE decides), so orders⋈customer shuffles
    * on custkey at scale instead of OOMing a forced broadcast.
    */
  val q6StarJoin: Op = Op(
    "q6_star_join",
    (s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""
      SELECT r_name, n_name, count(*) AS n_orders,
             ${xsum("o_totalprice")} AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  /** Rank-per-group window: partitions by the group key, so at scale the
    * sort is per-key-partition, never global.
    */
  val q7WindowTopk: Op = Op(
    "q7_window_topk",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    },
    Some("""
      SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_orderpriority, rn"""))

  /** B7b — the same per-group top-3 as q7_window_topk, computed with the
    * engine's bounded-heap aggregate
    * ([[graft.functions.TopKMinAgg topk_min]]) instead of a window: the
    * window plan shuffles EVERY order row to its group and sorts it;
    * this plan partial-aggregates map-side, so the shuffle carries at
    * most 3 rows per (group, input partition) — the difference between
    * "sort 100 TB" and "merge a few heaps" at scale. Ordering struct:
    * (-price, orderkey) = price DESC with a unique ASC tie-break, price
    * carried alongside for the output. Identical rows to q7 (same
    * oracle), proving result parity between the two plans.
    */
  val q7bTopkAgg: Op = Op(
    "q7b_topk_agg",
    (s, d) => {
      val ord = struct(
        (-col("o_totalprice")).as("np"),
        col("o_orderkey"),
        col("o_totalprice"))
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(topkMin(ord, 3).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast(LongType).as("rn"),
          col("col.o_orderkey").as("o_orderkey"),
          col("col.o_totalprice").as("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    },
    Some("""
      SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_orderpriority, rn"""))

  /** Exact distinct counts (expand-based in Spark; two-level shuffle). */
  val q8Distinct: Op = Op(
    "q8_distinct",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Approximate distinct counts (HyperLogLog++): one shuffle carrying a
    * fixed-size sketch per group instead of the expand + two-level shuffle
    * of exact countDistinct — the variant users run first at 100 TB.
    * No SQL oracle: Spark's HLL++ and DuckDB's HLL produce different
    * estimates by construction, so the driver does a rows-only check; the
    * ScalaTest suite asserts the estimates land within 5% of exact.
    */
  val q8bApproxDistinct: Op = Op(
    "q8b_approx_distinct",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("n_parts_approx"),
          approx_count_distinct(col("l_suppkey")).as("n_supps_approx"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")),
    None)

  private val KMV_K = 256

  /** B8c — KMV (k-minimum-values) distinct-count sketch: the
    * approximate-distinct path that, unlike HLL (whose registers differ
    * across implementations), is BIT-IDENTICAL in any engine — so it
    * gets a real oracle where q8b is rows-only. Estimator: with h_k the
    * k-th smallest 32-bit hash of the distinct values,
    * n̂ = (k-1)·2³²/h_k; error ~1/√k (≈6% at k=256). The k smallest
    * hashes per group ride the engine's own bounded-heap aggregate
    * ([[graft.functions.TopKMinAgg topk_min]]) — map-side partial, the
    * shuffle carries ≤k hashes per group per partition; the sketch is
    * also mergeable across partitions/time by construction (union the
    * heaps), which is what makes it the 100 TB pre-aggregation path.
    * Values are deduped per group first (KMV is defined on the distinct
    * hash set; duplicate inputs would repeat a hash inside the k-set).
    */
  val q8cKmvDistinct: Op = Op(
    "q8c_kmv_distinct",
    (s, d) => {
      // distinct on (group, HASH) — KMV is defined on the distinct hash
      // set, and dedup-by-hash (not by value) keeps a 32-bit collision
      // from diverging between engines
      val distinctHashes = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          hash32(concat(lit("kmv|"), col("l_partkey"))).as("h"))
        .distinct()
      distinctHashes
        .groupBy(col("l_returnflag"))
        .agg(topkMin(struct(col("h")), KMV_K).as("ks"),
          count(lit(1)).as("n_exact"))
        .select(col("l_returnflag"), col("n_exact"),
          element_at(col("ks"), least(size(col("ks")), lit(KMV_K)))
            .getField("h").as("h_k"),
          when(size(col("ks")) < KMV_K, col("n_exact").cast("double"))
            .otherwise(lit((KMV_K - 1).toDouble) * lit(4294967296.0) /
              element_at(col("ks"), KMV_K).getField("h"))
            .as("n_kmv"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      SELECT l_returnflag, n_exact, h_k,
             CASE WHEN n_exact < $KMV_K THEN CAST(n_exact AS DOUBLE)
                  ELSE ${KMV_K - 1} * 4294967296.0 / h_k END AS n_kmv
      FROM (
        SELECT l_returnflag, count(*) AS n_exact,
               max(CASE WHEN rn = least($KMV_K, cnt) THEN h END) AS h_k
        FROM (
          SELECT l_returnflag, h,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY h)
                   AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS cnt
          FROM (
            SELECT DISTINCT l_returnflag,
                   ${xhash32("concat('kmv|', l_partkey)")} AS h
            FROM lineitem) t0) t1
        GROUP BY l_returnflag) t2
      ORDER BY l_returnflag"""))

  /** ROLLUP multi-level aggregation (grouping-sets expansion). */
  val q9Rollup: Op = Op(
    "q9_rollup",
    (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("revenue"))
        .orderBy(col("status"), col("priority")),
    Some(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n_orders,
             ${xsum("o_totalprice")} AS revenue
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  /** Global top-k: TakeOrderedAndProject — per-partition heap + merge,
    * no full sort at any scale.
    */
  val q10Topk: Op = Op(
    "q10_topk",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast(LongType)
          .as("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(20),
    Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 20"""))

  /** Conditional aggregation (pivot shape) — one pass, no joins. */
  val q11CaseAgg: Op = Op(
    "q11_case_agg",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
        .orderBy(col("o_orderpriority")),
    Some("""
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Date bucketing aggregation. */
  val q12DateAgg: Op = Op(
    "q12_date_agg",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
        .orderBy(col("month")),
    Some(s"""
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n_orders,
             ${xsum("o_totalprice")} AS revenue
      FROM orders
      GROUP BY strftime(o_orderdate, '%Y-%m')
      ORDER BY month"""))

  /** String functions + LIKE predicate. */
  val q13StringFuncs: Op = Op(
    "q13_string_funcs",
    (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%gear%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          length(col("p_name")).cast(LongType).as("name_len"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey, upper(p_brand) AS brand_uc,
             substr(p_type, 1, 5) AS type_pfx,
             CAST(length(p_name) AS BIGINT) AS name_len
      FROM part
      WHERE p_name LIKE '%gear%'
      ORDER BY p_partkey"""))

  /** UNION + distinct. */
  val q14Union: Op = Op(
    "q14_union",
    (s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") < 0.0)
        .select(col("c_custkey").as("id"))
      val b = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("id"))
      a.union(b).distinct().orderBy(col("id"))
    },
    Some("""
      SELECT c_custkey AS id FROM customer WHERE c_acctbal < 0
      UNION
      SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'P'
      ORDER BY id"""))

  /** Scalar subquery: stays in-plan as a broadcast cross join (one row),
    * never a driver-side collect.
    */
  val q15ScalarSubquery: Op = Op(
    "q15_scalar_subquery",
    (s, d) => {
      val c = Tables.customer(s, d)
      val avgBal = c.agg(
        (exactSum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""
      SELECT c_custkey, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT ${xsum("c_acctbal")}/count(*) FROM customer)
      ORDER BY c_custkey"""))

  /** Sessionization: 30-minute inactivity gap. Partitioned by user — the
    * window sort is per-user, so the op scales with keys, not data volume.
    * Gap math in exact integer microseconds (portable).
    */
  val q16Sessionize: Op = Op(
    "q16_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
             CAST(sum(is_new) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM (
        SELECT user_id,
               CASE WHEN prev IS NULL OR us - prev > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM (
          SELECT user_id, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev
          FROM events) t1) t2
      GROUP BY user_id
      ORDER BY user_id"""))

  /** JSON field extraction (regexp-based so the oracle needs no JSON
    * extension) + aggregation.
    */
  val q17JsonExtract: Op = Op(
    "q17_json_extract",
    (s, d) =>
      Tables.events(s, d)
        // try_cast: a props row without "k" extracts '' — ANSI cast would
        // throw; NULL matches the oracle's TRY_CAST
        .select(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
          .try_cast(LongType).as("k"))
        .withColumn("bucket", col("k") % 10)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("bucket")),
    Some("""
      SELECT bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
      FROM (
        SELECT TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k,
               TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 10 AS bucket
        FROM events) t
      GROUP BY bucket
      ORDER BY bucket"""))

  /** Running/cumulative window aggregate (exact integer micros inside the
    * frame so the running values are portable).
    */
  val q18RunningSum: Op = Op(
    "q18_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running",
          sum(round(col("o_totalprice") * lit(1000000.0)).cast(LongType))
            .over(w) / lit(1000000.0))
        .select(col("o_custkey"), col("o_orderkey"), col("running"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(round(o_totalprice*1000000) AS BIGINT))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT)/1000000.0 AS running
      FROM orders
      ORDER BY o_custkey, o_orderkey"""))

  /** B19 — left outer join + null-aware aggregation: orders with no
    * matching lineitem survive with NULL line stats (the classic
    * "entities without children" report). The child side pre-aggregates
    * before the join (map-side combined), so the outer join carries one
    * row per order key, not one per line.
    */
  val q19OuterJoin: Op = Op(
    "q19_outer_join",
    (s, d) => {
      val lines = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"), exactSum(col("l_quantity")).as("qty"))
      Tables.orders(s, d)
        .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("n_lines").isNull, 1L).otherwise(0L)).as("n_no_lines"),
          sum(coalesce(col("n_lines"), lit(0L))).as("n_lines_total"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CASE WHEN n_lines IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_no_lines,
             CAST(sum(coalesce(n_lines, 0)) AS BIGINT) AS n_lines_total
      FROM orders
      LEFT JOIN (SELECT l_orderkey, count(*) AS n_lines
                 FROM lineitem GROUP BY l_orderkey) l
        ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** B20 — CUBE: all 2^k grouping-set combinations in one pass
    * (grouping-sets expansion; each set partial-aggregates map-side).
    */
  val q20Cube: Op = Op(
    "q20_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("revenue"))
        .orderBy(col("status"), col("priority")),
    Some(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n_orders,
             ${xsum("o_totalprice")} AS revenue
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  /** B21 — pivot: per-priority revenue pivoted by order status. The value
    * set is declared (F/O/P), so the plan is a single conditional
    * aggregation pass — no second pivot shuffle and no driver-side
    * distinct-values collection.
    */
  val q21Pivot: Op = Op(
    "q21_pivot",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(exactSum(col("o_totalprice")))
        .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o", "P" -> "rev_p"))
        .orderBy(col("o_orderpriority")),
    Some(s"""
      SELECT o_orderpriority,
             ${xsum("CASE WHEN o_orderstatus='F' THEN o_totalprice END")} AS rev_f,
             ${xsum("CASE WHEN o_orderstatus='O' THEN o_totalprice END")} AS rev_o,
             ${xsum("CASE WHEN o_orderstatus='P' THEN o_totalprice END")} AS rev_p
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** B22 — discrete percentiles (p50/p90 of order value per priority),
    * formulated as rank-at-position so the result is an ACTUAL data
    * value, bit-identical in any engine: interpolating percentile
    * implementations differ in FP evaluation order across engines, but
    * "the value at row_number floor((n-1)·q)+1 in sort order" is exact.
    * (The DuckDB oracle keeps that window formulation verbatim.)
    *
    * Plan: exact selection WITHOUT a per-priority sort. A window
    * partitioned by the 5-value priority key would sort 20% of the
    * table on one task — the textbook constant-cardinality skew killer
    * at 100 TB. Instead, distributed bucketed (histogram) selection on
    * ONE composite (coarse, fine) bucket key (r8 — the r6/r7 re-split
    * round computed the same bound with a second width_bucket pass and
    * a 10x-larger plan):
    *   1. the ONLY full-data pass: ties collapse into a (priority,
    *      value, cnt) histogram — one scan + one shuffle — checkpointed
    *      so the bounded locate stages below re-read histogram-sized
    *      data through a lineage-truncated leaf instead of re-embedding
    *      the scan per consumer;
    *   2. per-priority stats (n, min, max, both rank targets) aggregate
    *      FROM the histogram and broadcast back onto it; every entry
    *      gets ONE `width_bucket` over 1000² uniform value cells
    *      (`fb`), whose `div 1000` is its coarse cell (`cb`) — both
    *      locate levels priced by a single codegen'd expression;
    *   3. coarse locate: exact per-cell counts (≤ 1000 rows/priority),
    *      one cumulative HOF walk finds BOTH ranks' coarse cells and
    *      the exact count below each (the two ranks then ride one
    *      tag-exploded frame, all frames ≤ 2 rows/priority →
    *      broadcast);
    *   4. fine locate: the hit coarse cell's entries re-aggregate per
    *      fine cell (≤ 1000 rows/priority/rank) and the same walk finds
    *      the hit fine cell + remaining rank;
    *   5. the walk collects ONLY the hit fine cell's histogram entries
    *      — n/10⁶ of the distinct values under near-uniform data, and
    *      value skew only helps: ties collapse into single histogram
    *      entries, so a heavily-tied cell DEGENERATES toward one row.
    * Every stage is an aggregate; no window, no global sort, per-group
    * state bounded by the 1000-cell arrays + one fine cell's entries.
    */
  val q22Percentile: Op = Op(
    "q22_percentile",
    (s, d) => {
      val coarse = 1000 // coarse cells; fine cells = coarse² composite
      val hist0 = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"))
        .groupBy(col("o_orderpriority"), col("o_totalprice"))
        .agg(count(lit(1)).as("cnt"))
      val stats = hist0.groupBy(col("o_orderpriority"))
        .agg(sum(col("cnt")).as("n"),
          min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        .select(col("o_orderpriority"), col("n"), col("mn"), col("mx"),
          // `div` (integer division), matching the oracle's `//`
          expr("((n - 1) * 5) div 10 + 1").as("k50"),
          expr("((n - 1) * 9) div 10 + 1").as("k90"))
      // fb ∈ [1, coarse²+1] (mx lands in coarse²+1 — still the last
      // sorted cell); mn == mx (constant-price group) makes
      // width_bucket NULL → pin to cell 1, placement is irrelevant.
      // The checkpoint job is the ONLY full-data pass: both sides of
      // the broadcast join share the scan→groupBy(p,v) exchange
      // (ReuseExchange materializes it once); n/k50/k90 ride along
      // (functionally dependent on the priority) so nothing downstream
      // ever touches the orders table again.
      val hist = Checkpoints.checkpoint(
        hist0.join(broadcast(stats), "o_orderpriority")
          .withColumn("fb", expr(
            s"coalesce(width_bucket(o_totalprice, mn, mx, ${coarse.toLong * coarse}), 1L)"))
          .withColumn("cb", expr(s"(fb - 1) div $coarse"))
          .select(col("o_orderpriority"), col("o_totalprice"), col("cnt"),
            col("fb"), col("cb"), col("n"), col("k50"), col("k90")))
      // cumulative walk over the sorted (cell, count) array → the cell
      // holding rank k and the exact row count below it
      def locate(bCol: String, k: String) = expr(s"""
        aggregate(sort_array(collect_list(named_struct('b', $bCol, 'bc', bc))),
          named_struct('cum', 0L, 'hit', -1L, 'below', 0L),
          (acc, e) -> IF(acc.hit >= 0, acc,
            IF(acc.cum + e.bc >= $k,
               named_struct('cum', acc.cum + e.bc, 'hit', e.b,
                 'below', acc.cum),
               named_struct('cum', acc.cum + e.bc, 'hit', -1L,
                 'below', 0L))))""")
      val loc1 = hist
        .groupBy(col("o_orderpriority"), col("k50"), col("k90"), col("cb"))
        .agg(sum(col("cnt")).as("bc"))
        .groupBy(col("o_orderpriority"), col("k50"), col("k90"))
        .agg(locate("cb", "k50").as("l50"), locate("cb", "k90").as("l90"))
        .select(col("o_orderpriority"), explode(array(
          struct(lit("p50").as("tag"), col("k50").as("k"),
            col("l50.hit").as("cb1"), col("l50.below").as("below1")),
          struct(lit("p90").as("tag"), col("k90").as("k"),
            col("l90.hit").as("cb1"), col("l90.below").as("below1")))).as("t"))
        .select(col("o_orderpriority"), col("t.*"))
      val loc2 = hist.join(broadcast(loc1), "o_orderpriority")
        .filter(col("cb") === col("cb1"))
        .groupBy(col("o_orderpriority"), col("tag"), col("k"),
          col("below1"), col("fb"))
        .agg(sum(col("cnt")).as("bc"))
        .groupBy(col("o_orderpriority"), col("tag"), col("k"), col("below1"))
        .agg(locate("fb", "k - below1").as("l"))
        .select(col("o_orderpriority"), col("tag"),
          (col("k") - col("below1") - col("l.below")).as("krem"),
          col("l.hit").as("fb2"))
      hist.join(broadcast(loc2), "o_orderpriority")
        .filter(col("fb") === col("fb2"))
        .groupBy(col("o_orderpriority"), col("n"), col("tag"), col("krem"))
        .agg(sort_array(collect_list(struct(
          col("o_totalprice").as("v"), col("cnt").as("c")))).as("cand"))
        .select(col("o_orderpriority"), col("n"), col("tag"), expr("""
          aggregate(cand,
            named_struct('rem', krem, 'found', CAST(NULL AS DOUBLE)),
            (acc, e) -> IF(acc.found IS NOT NULL, acc,
              IF(acc.rem <= e.c,
                 named_struct('rem', acc.rem, 'found', e.v),
                 named_struct('rem', acc.rem - e.c,
                   'found', CAST(NULL AS DOUBLE)))),
            acc -> acc.found)""").as("v"))
        .groupBy(col("o_orderpriority"), col("n"))
        .agg(min(when(col("tag") === "p50", col("v"))).as("p50"),
          min(when(col("tag") === "p90", col("v"))).as("p90"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT r.o_orderpriority, n,
             min(CASE WHEN rn = (n-1)*5//10 + 1 THEN o_totalprice END) AS p50,
             min(CASE WHEN rn = (n-1)*9//10 + 1 THEN o_totalprice END) AS p90
      FROM (
        SELECT o_orderpriority, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice) AS BIGINT) AS rn
        FROM orders) r
      JOIN (SELECT o_orderpriority, count(*) AS n
            FROM orders GROUP BY o_orderpriority) s
        ON r.o_orderpriority = s.o_orderpriority
      GROUP BY r.o_orderpriority, n
      ORDER BY r.o_orderpriority"""))

  /** B23 — 7-day moving average of daily revenue: the sliding-frame
    * window shape. The window runs over the DAILY pre-aggregate (one row
    * per day — thousands of rows at any corpus scale), never the raw
    * orders, so the global ordering is a non-issue; the frame sum is in
    * exact integer micros (daily revenue is a multiple of 1e-6 by
    * construction, so round() recovers the integer exactly) — identical
    * across engines regardless of frame evaluation order.
    */
  val q23MovingAvg: Op = Op(
    "q23_moving_avg",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(exactSum(col("o_totalprice")).as("rev"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("rev_ma7",
          sum(round(col("rev") * 1000000).cast(LongType)).over(w) / 1000000.0)
        .withColumn("n_days_in_frame", count(lit(1)).over(w))
        .orderBy(col("day"))
    },
    Some(s"""
      SELECT day, rev, n_orders,
             CAST(sum(CAST(round(rev*1000000) AS BIGINT))
               OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS BIGINT) / 1000000.0 AS rev_ma7,
             count(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND
               CURRENT ROW) AS n_days_in_frame
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               ${xsum("o_totalprice")} AS rev,
               count(*) AS n_orders
        FROM orders GROUP BY day) t
      ORDER BY day"""))

  /** B24 — one-pass dataset profile: the data-quality summary a lake
    * pipeline computes on every ingest (row count, per-column null
    * counts, exact distincts, value ranges, an exact checksum-style
    * total). ONE aggregate over one scan — every statistic is a
    * declarative agg with map-side partials; the exact distincts expand
    * the aggregate (Spark's expand operator), still a single shuffle.
    * Timestamps render as strings so the profile row hashes identically
    * on any engine.
    */
  val q24Profile: Op = Op(
    "q24_profile",
    (s, d) =>
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        count(col("o_custkey")).as("custkey_nonnull"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        countDistinct(col("o_orderpriority")).as("priority_distinct"),
        min(col("o_totalprice")).as("price_min"),
        max(col("o_totalprice")).as("price_max"),
        exactSum(col("o_totalprice")).as("price_sum"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("date_min"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("date_max")),
    Some(s"""
      SELECT count(*) AS n_rows,
             count(o_custkey) AS custkey_nonnull,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT)
               AS priority_distinct,
             min(o_totalprice) AS price_min,
             max(o_totalprice) AS price_max,
             ${xsum("o_totalprice")} AS price_sum,
             strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS date_min,
             strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS date_max
      FROM orders"""))

  /** B25 — set operators: INTERSECT / EXCEPT between derived key sets
    * (customers active in 1995 vs 1996) — the remaining ANSI set
    * surface after B14's UNION. Spark's `intersect`/`except` plan as
    * left-semi/left-anti joins over pre-distincted sides — exactly the
    * shuffle shape B4/B5 pin — so the scale behavior is the semijoin
    * story, not a new one; the oracle runs the literal SQL set
    * operators. Cohort retention/churn counting is the pipeline use.
    */
  val q25SetOps: Op = Op(
    "q25_setops",
    (s, d) => {
      val o = Tables.orders(s, d)
      def active(yr: Int) =
        o.filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
      val a = active(1995)
      val b = active(1996)
      def tag(name: String, ds: org.apache.spark.sql.DataFrame) =
        ds.agg(count(lit(1)).as("n_custs"))
          .select(lit(name).as("set_op"), col("n_custs"))
      tag("except_95_not_96", a.except(b))
        .unionAll(tag("except_96_not_95", b.except(a)))
        .unionAll(tag("intersect_95_96", a.intersect(b)))
        .orderBy(col("set_op"))
    },
    Some("""
      WITH a AS (SELECT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1995),
      b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      SELECT set_op, n_custs FROM (
        SELECT 'except_95_not_96' AS set_op, count(*) AS n_custs
        FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b) x
        UNION ALL
        SELECT 'except_96_not_95', count(*)
        FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a) y
        UNION ALL
        SELECT 'intersect_95_96', count(*)
        FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b) z) t
      ORDER BY set_op"""))

  /** B26 — explicit GROUPING SETS with grouping_id: the remaining ANSI
    * grouping surface after ROLLUP (B9, a prefix chain) and CUBE (B20,
    * the full lattice) — an ARBITRARY set list, here
    * {(status, priority), (status), (priority), ()}, which neither
    * shorthand can express (CUBE emits the same four sets here, but
    * the general form prunes the lattice; the op pins the surface and
    * the grouping_id bit semantics, MSB = leftmost group column —
    * verified identical in DuckDB's GROUPING()). Plans as one Expand +
    * hash aggregate: each input row replicates once per grouping set
    * BEFORE the shuffle with map-side combine, so the exchange carries
    * one partial per (set, group) — same scale shape as B9/B20.
    */
  val q26GroupingSets: Op = Op(
    "q26_grouping_sets",
    (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
            Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n_orders"), col("revenue"))
        .orderBy(col("gid"), col("status"), col("priority")),
    Some(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
               AS gid,
             count(*) AS n_orders,
             ${xsum("o_totalprice")} AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        (o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, status, priority"""))

  /** B27 — time-interval RANGE window frame: per event, the count and
    * exact value total of the SAME USER's events inside the trailing
    * hour (`RANGE BETWEEN 1 HOUR PRECEDING AND CURRENT ROW`) — the
    * rate/velocity feature behind burst detection, rate limiting and
    * fraud scoring, and the one ANSI window-frame surface the board
    * lacked (B18 is an unbounded running frame, B23 a ROWS frame; a
    * RANGE frame bounds by ORDER-BY VALUE distance, so frame width
    * varies per row and equal-timestamp peers always share a frame —
    * which also makes the result order-deterministic under ties, where
    * a ROWS frame would tie-break arbitrarily).
    *
    * Both engines order by integer epoch micros (Spark's rangeBetween
    * needs a numeric ordering column; DuckDB gets the identical frame
    * from the same integer), so the frame boundary arithmetic is exact
    * integer comparison — no interval-type coercion divergence. ONE
    * shuffle on user_id; Spark evaluates sliding range frames with an
    * amortized-linear moving lower bound per partition, so a 100 TB
    * event log costs one keyed exchange plus a per-user linear pass
    * (per-user row counts are bounded; planted-hot-key behavior is
    * SkewSpec's pinned story).
    */
  val q27TimeRangeAgg: Op = Op(
    "q27_time_range_agg",
    (s, d) => {
      val hourMicros = 3600L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-hourMicros, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .withColumn("value_last_hour",
          sum(round(col("value") * 1000000).cast(LongType)).over(w) /
            1000000.0)
        .select(col("event_id"), col("user_id"), col("n_last_hour"),
          col("value_last_hour"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             count(*) OVER w AS n_last_hour,
             CAST(sum(CAST(round(value*1000000) AS BIGINT)) OVER w
               AS BIGINT) / 1000000.0 AS value_last_hour
      FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
            FROM events) e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** B28 — CORRELATED scalar subqueries, through the SQL entry path:
    * per customer, how many of their orders run above 1.5× their own
    * average order value (the self-relative outlier count — "which
    * purchases were unusually large FOR THIS customer"). q15's scalar
    * subquery is uncorrelated (one global value); this is the remaining
    * ANSI subquery surface, where the inner query references the outer
    * row and Catalyst must DECORRELATE: both correlated aggregates
    * rewrite to one `GROUP BY o_custkey` aggregate joined back on the
    * key — the q3 equi-join shuffle shape, NOT a per-row re-execution
    * (which is what a naive nested-loop interpretation would do and
    * what the plan spec forbids). Issued via `spark.sql` over
    * [[Tables.registerViews]] — the one board query exercising the
    * engine's full SQL-text path end-to-end.
    *
    * The 1.5× comparison is exact integer math (price micros · n · 2 >
    * 3 · Σ price micros, n ≥ 1 since the row itself is in its group),
    * so both engines compare identical longs.
    */
  private val q28Sql: String = """
      SELECT o.o_custkey AS custkey, count(*) AS n_above
      FROM orders o
      WHERE CAST(round(o.o_totalprice*1000000) AS BIGINT)
              * (SELECT count(*) FROM orders i
                 WHERE i.o_custkey = o.o_custkey) * 2
            > (SELECT CAST(sum(CAST(round(i.o_totalprice*1000000) AS BIGINT))
                 AS BIGINT) FROM orders i
               WHERE i.o_custkey = o.o_custkey) * 3
      GROUP BY o.o_custkey
      ORDER BY custkey"""

  val q28Correlated: Op = Op(
    "q28_correlated",
    (s, d) => {
      Tables.registerViews(s, d)
      s.sql(q28Sql)
    },
    Some(q28Sql))

  /** B29 — LATERAL correlated derived table (q28's sibling on the SQL
    * text path): per-nation top-2 customers by account balance through
    * `FROM nation, LATERAL (SELECT ... ORDER BY ... LIMIT 2)` — the
    * per-row-subquery idiom analysts reach for before they learn window
    * functions, and the second standard decorrelation shape after
    * q28's scalar subqueries. Spark's DecorrelateInnerQuery rewrites
    * the lateral limit to a rank-per-join-key plan (no per-outer-row
    * re-execution, no nested loop over customer); balances compare as
    * exact round-micros longs (the q22/q28 convention).
    */
  private val q29Sql: String = """
      SELECT n.n_name AS nation, t.custkey, t.bal_micros
      FROM nation n, LATERAL (
        SELECT c.c_custkey AS custkey,
               CAST(round(c.c_acctbal*1000000) AS BIGINT) AS bal_micros
        FROM customer c WHERE c.c_nationkey = n.n_nationkey
        ORDER BY bal_micros DESC, c.c_custkey LIMIT 2) t
      ORDER BY nation, bal_micros DESC, custkey"""

  val q29Lateral: Op = Op(
    "q29_lateral",
    (s, d) => {
      Tables.registerViews(s, d)
      s.sql(q29Sql)
    },
    Some(q29Sql))

  /** B30 — FULL OUTER JOIN (r16: the one ANSI join type with no board
    * row — B19 covers left outer): the per-customer URGENT-order
    * aggregate full-outer-joined with a high-balance customer COHORT,
    * so BOTH sides dangle — cohort members with no urgent orders
    * (order side null; every customer in the synthetic corpus has SOME
    * order, so the priority slice is what makes this side genuinely
    * dangle) and urgent buyers outside the cohort (cohort side null) —
    * and the output aggregates null-aware per segment (both /
    * cohort_only / orders_only), counting keys and summing each side's
    * measure with the other side absent.
    *
    * Scale shape: the child side pre-aggregates to one row per custkey
    * before the join (map-side combined — the B19 discipline), both
    * sides shuffle ONCE on the join key into a sort-merge full outer
    * (full outer cannot broadcast: both sides must observe all keys;
    * a BNLJ fallback would be quadratic — spec-forbidden), and the
    * 3-group segment aggregate is a trivial final exchange. Balances
    * and revenue sum as exact round-micros longs (the q22/q28
    * convention).
    */
  val q30FullOuter: Op = Op(
    "q30_full_outer",
    (s, d) => {
      val orderAgg = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
      val cohort = Tables.customer(s, d)
        .filter(col("c_acctbal") >= 5000.0)
        .select(col("c_custkey"),
          expr("CAST(round(c_acctbal*1000000) AS BIGINT)").as("bal_micros"))
      orderAgg
        .join(cohort, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          when(col("o_custkey").isNotNull && col("c_custkey").isNotNull,
            lit("both"))
            .when(col("o_custkey").isNull, lit("cohort_only"))
            .otherwise(lit("orders_only")).as("segment"),
          col("n_orders"), col("revenue"), col("bal_micros"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_keys"),
          sum(coalesce(col("n_orders"), lit(0L))).as("n_orders"),
          (sum(coalesce(
            expr("CAST(round(revenue*1000000) AS BIGINT)"), lit(0L)))
            / lit(1000000.0)).as("revenue"),
          sum(coalesce(col("bal_micros"), lit(0L))).as("bal_micros_sum"))
        .orderBy(col("segment"))
    },
    Some(s"""
      SELECT segment, count(*) AS n_keys,
             CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS n_orders,
             CAST(sum(coalesce(CAST(round(revenue*1000000) AS BIGINT), 0))
               AS BIGINT)/1000000.0 AS revenue,
             CAST(sum(coalesce(bal_micros, 0)) AS BIGINT) AS bal_micros_sum
      FROM (
        SELECT CASE WHEN o.o_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
                    THEN 'both'
                    WHEN o.o_custkey IS NULL THEN 'cohort_only'
                    ELSE 'orders_only' END AS segment,
               o.n_orders, o.revenue, c.bal_micros
        FROM (SELECT o_custkey, count(*) AS n_orders,
                     ${xsum("o_totalprice")} AS revenue
              FROM orders WHERE o_orderpriority = '1-URGENT'
              GROUP BY o_custkey) o
        FULL OUTER JOIN
             (SELECT c_custkey,
                     CAST(round(c_acctbal*1000000) AS BIGINT) AS bal_micros
              FROM customer WHERE c_acctbal >= 5000.0) c
          ON o.o_custkey = c.c_custkey) t
      GROUP BY segment
      ORDER BY segment"""))

  val all: Seq[Op] = Seq(
    q1Agg, q2Pushdown, q3JoinAgg, q4Semijoin, q5Antijoin, q6StarJoin,
    q7WindowTopk, q7bTopkAgg, q8Distinct, q8bApproxDistinct, q8cKmvDistinct,
    q9Rollup, q10Topk,
    q11CaseAgg, q12DateAgg, q13StringFuncs, q14Union, q15ScalarSubquery,
    q16Sessionize, q17JsonExtract, q18RunningSum, q19OuterJoin, q20Cube,
    q21Pivot, q22Percentile, q23MovingAvg, q24Profile, q25SetOps,
    q26GroupingSets, q27TimeRangeAgg, q28Correlated, q29Lateral,
    q30FullOuter)
}
