package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Op, Tables}
import graft.Op.xsum
import graft.functions.Portable._

/** Sink / ETL semantics (SURVEY.md §2 part A) — the reference's heart,
  * re-expressed as declarative Spark plans over the test tables.
  *
  * Table mapping (SURVEY §3): `orders` plays the modeled source rows
  * (pk = o_orderkey, modified-at = o_orderdate), `events` plays the sink's
  * append-only dump log / event stream, `customer` plays users (PII),
  * `nation`/`region` play the bounded dimension types.
  *
  * Scale notes are per-op; the common rules: state joins partition on the
  * sink key (one shuffle, reusable), bounded dims broadcast, retirement
  * sets broadcast (retirement batches are small by nature), and nothing
  * ever collects to the driver.
  */
object SinkOps {

  /** A1 — latest-row-per-key view of an append-only sink log: the Spark
    * twin of ClickHouse ReplacingMergeTree FINAL /
    * `get_last_dumped_timestamp` (reference sinks/base_sink.py:314-335,
    * `SELECT max(ts) ... WHERE unique_key = ?`), generalized to all keys
    * at once. `max_by` over the (ts, event_id) ordering struct keeps the
    * whole latest row as a HASH aggregate — one shuffle on the key with
    * map-side combine (each map task forwards at most one row per key),
    * no per-key sort; at 100 TB that beats the window formulation on
    * both shuffle volume and the sort it skips. The (us, event_id) pair
    * is unique, so the max is deterministic.
    */
  val sinkLatestState: Op = Op(
    "sink_latest_state",
    (s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("us"))
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("us"), col("event_id"), col("event_type"),
            col("value")),
          struct(col("us"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.us").as("last_ts_us"),
          col("m.event_id").as("last_event_id"),
          col("m.event_type").as("last_event_type"),
          col("m.value").as("last_value"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, us AS last_ts_us, event_id AS last_event_id,
             event_type AS last_event_type, value AS last_value
      FROM (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id"""))

  /** A2 — incremental dump gate: the reference's `should_dump_item`
    * (sinks/course_published.py:154-198): dump iff the sink has never seen
    * the item (`last_dump_time IS NULL`) or the source was modified after
    * the last dump (`last_dump_time < last_published`). Source state =
    * orders (modified-at = o_orderdate); sink state = per-order max
    * shipdate from the lineitem dump log. Left join on the pk — both
    * sides partition on o_orderkey, the dump-log max is a map-side-combined
    * pre-aggregate, so at 100 TB this is one co-partitioned shuffle each.
    */
  val sinkShouldDump: Op = Op(
    "sink_should_dump",
    (s, d) => {
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
      val sinkState = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("dumped_at"))
      src.join(sinkState, col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          col("o_orderkey"),
          (col("dumped_at").isNull || col("dumped_at") < col("o_orderdate"))
            .as("should_dump"),
          when(col("dumped_at").isNull, "Item is not present in sink")
            .when(col("dumped_at") < col("o_orderdate"),
              "Item has been modified since last dump")
            .otherwise("Item has NOT been modified since last dump")
            .as("reason"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             (dumped_at IS NULL OR dumped_at < o_orderdate) AS should_dump,
             CASE WHEN dumped_at IS NULL
                    THEN 'Item is not present in sink'
                  WHEN dumped_at < o_orderdate
                    THEN 'Item has been modified since last dump'
                  ELSE 'Item has NOT been modified since last dump'
             END AS reason
      FROM orders
      LEFT JOIN (SELECT l_orderkey, max(l_shipdate) AS dumped_at
                 FROM lineitem GROUP BY l_orderkey) sink
        ON o_orderkey = l_orderkey
      ORDER BY o_orderkey"""))

  /** A11 — related-item dump cascade: the reference's `dump_related`
    * (sinks/base_sink.py:169-203 → course_published.py:39-46): when a
    * parent passes the dump gate, every related child row is dumped in
    * the same sweep, STAMPED WITH THE PARENT'S dump_id and
    * time_last_dumped (child versions track parent dumps — that is what
    * makes the course→xblocks cascade replace-consistent in the sink).
    * Spark twin: A2's gate filters the parents, one co-partitioned
    * join on the parent key fans out to children, and the parent's
    * dump metadata (a deterministic md5-derived dump id standing in for
    * the reference's uuid, plus the modified-at timestamp) rides onto
    * every child row. Both sides shuffle once on the parent key; the
    * gate's pre-aggregate is map-side combined.
    */
  val sinkDumpRelated: Op = Op(
    "sink_dump_related",
    (s, d) => {
      val sinkState = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("dumped_at"))
      val parents = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
        .join(sinkState, col("o_orderkey") === col("l_orderkey"), "left")
        .filter(col("dumped_at").isNull || col("dumped_at") < col("o_orderdate"))
        .select(col("o_orderkey"),
          concat(lit("dump-"),
            hash32(concat(lit("d|"), col("o_orderkey"))).cast("string"))
            .as("dump_id"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
            .as("time_last_dumped"))
      parents.join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber").cast(LongType)
            .as("l_linenumber"),
          col("l_quantity"), col("dump_id"), col("time_last_dumped"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some(s"""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             l_quantity,
             concat('dump-', CAST(${Op.xhash32("concat('d|', o_orderkey)")}
               AS VARCHAR)) AS dump_id,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS time_last_dumped
      FROM (
        SELECT o_orderkey, o_orderdate
        FROM orders
        LEFT JOIN (SELECT l_orderkey AS sk, max(l_shipdate) AS dumped_at
                   FROM lineitem GROUP BY 1) sink
          ON o_orderkey = sk
        WHERE dumped_at IS NULL OR dumped_at < o_orderdate) p
      JOIN lineitem ON l_orderkey = o_orderkey
      ORDER BY l_orderkey, l_linenumber"""))

  /** A3 — PII retirement: the reference's `UserRetirementSink.send_item`
    * (sinks/user_retire.py:23-49) issues `DELETE WHERE user_id IN (set)`
    * against every configured PII table. The Spark rewrite is an anti-join
    * of each PII table against the retired-user set; here we report the
    * per-table before/after/deleted audit in one pass per table via a
    * left join + flag (no second scan). The retired set is a retirement
    * batch — small by nature — so it broadcasts; the PII tables never
    * shuffle at all.
    */
  val sinkRetireUsers: Op = Op(
    "sink_retire_users",
    (s, d) => {
      val retired = Tables.customer(s, d)
        .filter(col("c_acctbal") < 0.0)
        .select(col("c_custkey").as("uid"))
        .withColumn("is_retired", lit(1L))
      def audit(df: org.apache.spark.sql.DataFrame, key: String, name: String) =
        df.join(broadcast(retired), col(key) === col("uid"), "left")
          .agg(count(lit(1)).as("n_before"),
            coalesce(sum(col("is_retired")), lit(0L)).as("n_deleted"))
          .select(lit(name).as("table_name"), col("n_before"),
            (col("n_before") - col("n_deleted")).as("n_after"),
            col("n_deleted"))
      audit(Tables.events(s, d), "user_id", "events")
        .unionAll(audit(Tables.orders(s, d), "o_custkey", "orders"))
        .orderBy(col("table_name"))
    },
    Some("""
      WITH retired AS (SELECT c_custkey AS uid FROM customer
                       WHERE c_acctbal < 0)
      SELECT 'events' AS table_name, count(*) AS n_before,
             count(*) - CAST(sum(CASE WHEN user_id IN (SELECT uid FROM retired)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
             CAST(sum(CASE WHEN user_id IN (SELECT uid FROM retired)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
      FROM events
      UNION ALL
      SELECT 'orders' AS table_name, count(*) AS n_before,
             count(*) - CAST(sum(CASE WHEN o_custkey IN (SELECT uid FROM retired)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
             CAST(sum(CASE WHEN o_custkey IN (SELECT uid FROM retired)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
      FROM orders
      ORDER BY table_name"""))

  /** A3b — PII pseudonymization: the data-minimizing sibling of A3's
    * retirement DELETE (reference sinks/user_retire.py:23-49). A
    * retirement request does not always mean losing the row — analytics
    * stores commonly keep it but strip identity: the name is replaced
    * with a deterministic md5 pseudonym (stable across tables and dumps,
    * so retired rows still join to each other, but never back to the
    * identity), the quasi-identifying balance is suppressed to NULL, and
    * the aggregate-bearing segment column survives. Non-retired rows
    * pass through byte-identical. Same scale shape as A3: the
    * retirement batch is small by nature → broadcast; the PII table
    * never shuffles and the rewrite runs at scan speed.
    */
  val sinkPseudonymize: Op = Op(
    "sink_pseudonymize",
    (s, d) => {
      val retired = Tables.customer(s, d)
        .filter(col("c_acctbal") < 0.0)
        .select(col("c_custkey").as("uid"))
        .withColumn("is_retired", lit(1L))
      Tables.customer(s, d)
        .join(broadcast(retired), col("c_custkey") === col("uid"), "left")
        .select(col("c_custkey"),
          when(col("is_retired").isNotNull,
            md5(concat_ws("|", lit("pseud"), col("c_custkey"))))
            .otherwise(col("c_name")).as("c_name"),
          when(col("is_retired").isNull, col("c_acctbal")).as("c_acctbal"),
          col("c_mktsegment"),
          col("is_retired").isNotNull.as("masked"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH retired AS (SELECT c_custkey AS uid FROM customer
                       WHERE c_acctbal < 0)
      SELECT c_custkey,
             CASE WHEN c_custkey IN (SELECT uid FROM retired)
               THEN md5(concat_ws('|', 'pseud', c_custkey))
               ELSE c_name END AS c_name,
             CASE WHEN c_custkey IN (SELECT uid FROM retired)
               THEN NULL ELSE c_acctbal END AS c_acctbal,
             c_mktsegment,
             c_custkey IN (SELECT uid FROM retired) AS masked
      FROM customer
      ORDER BY c_custkey"""))

  /** A4 — keyset-paginated backfill batch: the reference's
    * `fetch_target_items` (sinks/base_sink.py:284-306) pages
    * `pk > start_pk ORDER BY pk` with optional include/skip id sets
    * (management command --ids/--skip_ids). One batch: start_pk=500,
    * batch_size=200, skip ids ≡ 3 (mod 10). orderBy+limit compiles to
    * TakeOrderedAndProject — per-partition top-k + merge, no global sort
    * at any scale; the pk predicate is pushed into the parquet scan.
    */
  val sinkPagination: Op = Op(
    "sink_pagination",
    (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") > 500 && col("o_orderkey") % 10 =!= 3)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .limit(200),
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE o_orderkey > 500 AND o_orderkey % 10 != 3
      ORDER BY o_orderkey
      LIMIT 200"""))

  /** A4b — full backfill plan: the reference's `dump_data_to_clickhouse`
    * management command (management/commands/dump_data_to_clickhouse.py)
    * pages through EVERY batch, asking the A2 gate per item. The Spark
    * twin summarizes the whole backfill in one pass: items are
    * range-batched by pk (`pk div batch_size` — deterministic and
    * scan-parallel, unlike a global row_number which would serialize on
    * one partition), and each batch reports its bounds, size, and how
    * many items the gate would dump. A scheduler consumes this to submit
    * per-batch jobs with failure tolerance.
    */
  val sinkBackfillPlan: Op = Op(
    "sink_backfill_plan",
    (s, d) => {
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
      val sinkState = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("dumped_at"))
      src.join(sinkState, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"),
          expr("o_orderkey div 200").as("batch_id"),
          (col("dumped_at").isNull || col("dumped_at") < col("o_orderdate"))
            .cast("long").as("dump"))
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("n_items"),
          min(col("o_orderkey")).as("min_pk"),
          max(col("o_orderkey")).as("max_pk"),
          sum(col("dump")).as("n_to_dump"))
        .orderBy(col("batch_id"))
    },
    Some("""
      SELECT CAST(o_orderkey // 200 AS BIGINT) AS batch_id,
             count(*) AS n_items,
             min(o_orderkey) AS min_pk,
             max(o_orderkey) AS max_pk,
             CAST(sum(CASE WHEN dumped_at IS NULL OR dumped_at < o_orderdate
               THEN 1 ELSE 0 END) AS BIGINT) AS n_to_dump
      FROM orders
      LEFT JOIN (SELECT l_orderkey, max(l_shipdate) AS dumped_at
                 FROM lineitem GROUP BY l_orderkey) sink
        ON o_orderkey = l_orderkey
      GROUP BY 1
      ORDER BY batch_id"""))

  /** A5 — serializer projection + JSON payload: the reference's
    * `CourseOverviewSerializer` (serializers.py:103-153): rename/cast
    * (`start`→`course_start`), stringified dates, a nested JSON field
    * (`course_data_json` via json.dumps), and synthetic `dump_id` /
    * `time_last_dumped`. dump_id is a deterministic md5 of the key (the
    * reference uses uuid4; determinism is required for idempotent re-dumps
    * and for the oracle). Pure narrow projection — no shuffle at all.
    */
  val sinkSerializeOverview: Op = Op(
    "sink_serialize_overview",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          concat(lit("course-v1:Org+O"), col("o_orderkey")).as("course_key"),
          concat(lit("Order "), col("o_orderkey")).as("display_name"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
            .as("course_start"),
          to_json(struct(
            col("o_orderpriority").as("priority"),
            col("o_orderstatus").as("status"),
            round(col("o_totalprice") * 100).cast(LongType).as("total_cents")))
            .as("course_data_json"),
          md5(concat(lit("dump|"), col("o_orderkey"))).as("dump_id"),
          lit("2026-01-01 00:00:00").as("time_last_dumped"))
        .orderBy(col("course_key")),
    Some("""
      SELECT concat('course-v1:Org+O', o_orderkey) AS course_key,
             concat('Order ', o_orderkey) AS display_name,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS course_start,
             CAST(to_json(struct_pack(
               priority := o_orderpriority,
               status := o_orderstatus,
               total_cents := CAST(round(o_totalprice*100) AS BIGINT)))
               AS VARCHAR) AS course_data_json,
             md5(concat('dump|', o_orderkey)) AS dump_id,
             '2026-01-01 00:00:00' AS time_last_dumped
      FROM orders
      ORDER BY course_key"""))

  /** A5b — user-profile serializer: the reference's
    * `UserProfileSerializer` (serializers.py:34-66) — the PII-table
    * projection with one 1:1 select_related join (`user.email`). customer
    * plays user_profile, nation plays the joined auth_user attribute.
    * This is the table the A3 retirement op later deletes from. Bounded
    * dim broadcast; no other shuffle.
    */
  val sinkSerializeProfile: Op = Op(
    "sink_serialize_profile",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(
          col("c_custkey").as("user_id"),
          col("c_name").as("name"),
          concat(lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", ".")),
            lit("@"), lower(col("n_name")), lit(".example")).as("email"),
          col("c_mktsegment").as("level_of_education"),
          col("n_name").as("country"),
          col("c_acctbal").as("account_balance"),
          md5(concat(lit("profile|"), col("c_custkey"))).as("dump_id"),
          lit("2026-01-01 00:00:00").as("time_last_dumped"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT c_custkey AS user_id,
             c_name AS name,
             concat(lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g')),
               '@', lower(n_name), '.example') AS email,
             c_mktsegment AS level_of_education,
             n_name AS country,
             c_acctbal AS account_balance,
             md5(concat('profile|', c_custkey)) AS dump_id,
             '2026-01-01 00:00:00' AS time_last_dumped
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY user_id"""))

  /** A6 — XBlock hierarchy counters: the reference's `serialize_item`
    * (sinks/course_published.py:47-94) walks a course's blocks in order,
    * keeping an ordinal `order` plus section/subsection/unit counters that
    * increment on chapter/sequential/vertical and reset below the level
    * that changed. Event mapping: signup→chapter, purchase→sequential,
    * click→vertical, view→static_tab, error→course_info, per user_id
    * ordered by (ts, event_id).
    *
    * The imperative loop becomes three stacked running-sum windows: the
    * reset-on-parent-change is exactly "count within the parent's group",
    * so subsection partitions by (user, section) and unit by (user,
    * section, subsection). Each window partitions on a user-prefixed key —
    * per-key sorts, never a global sort, scales with keys.
    *
    * `serialize_xblock` also stamps each block with `detached: 1/0` by
    * membership in `get_detached_xblock_types()` (course_published.py:53,
    * :109; utils.py:50-59 — {static_tab, about, course_info} per the
    * reference's test fixture). The set is a handful of constants, so the
    * membership test is an `isin` literal — constant-folded into codegen,
    * the degenerate (and optimal) form of a broadcast set.
    */
  val sinkXblockHierarchy: Op = Op(
    "sink_xblock_hierarchy",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bySection = Window
        .partitionBy(col("user_id"), col("section"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bySubsection = Window
        .partitionBy(col("user_id"), col("section"), col("subsection"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val detachedTypes = Seq("static_tab", "about", "course_info")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("ord", row_number().over(byUser).cast(LongType))
        .withColumn("section",
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).over(run))
        .withColumn("subsection",
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(bySection))
        .withColumn("unit",
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .over(bySubsection))
        .withColumn("block_type",
          when(col("event_type") === "signup", "chapter")
            .when(col("event_type") === "purchase", "sequential")
            .when(col("event_type") === "click", "vertical")
            .when(col("event_type") === "view", "static_tab")
            .otherwise("course_info"))
        .withColumn("detached",
          when(col("block_type").isin(detachedTypes: _*), 1L).otherwise(0L))
        .select(col("user_id"), col("event_id"), col("ord"),
          col("section"), col("subsection"), col("unit"),
          col("block_type"), col("detached"))
        .orderBy(col("user_id"), col("ord"))
    },
    Some("""
      SELECT user_id, event_id, ord, section, subsection, unit,
             CASE event_type WHEN 'signup' THEN 'chapter'
                  WHEN 'purchase' THEN 'sequential'
                  WHEN 'click' THEN 'vertical'
                  WHEN 'view' THEN 'static_tab'
                  ELSE 'course_info' END AS block_type,
             CAST(CASE WHEN (CASE event_type WHEN 'signup' THEN 'chapter'
                  WHEN 'purchase' THEN 'sequential'
                  WHEN 'click' THEN 'vertical'
                  WHEN 'view' THEN 'static_tab'
                  ELSE 'course_info' END)
                IN ('static_tab', 'about', 'course_info')
                THEN 1 ELSE 0 END AS BIGINT) AS detached
      FROM (
        SELECT *, CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id, section, subsection
                       ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS unit
        FROM (
          SELECT *, CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, section
                         ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS subsection
          FROM (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   CAST(row_number() OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id) AS BIGINT) AS ord,
                   CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS section
            FROM events) t1) t2) t3
      ORDER BY user_id, ord"""))

  /** A6b — the full XBlock serializer unit: hierarchy counters over the
    * RAW block iteration + branch/version key normalization +
    * location-keyed LAST-WINS dedup, the three steps
    * `XBlockSink.serialize_item` chains (course_published.py:55-94: the
    * loop increments index/section_idx/subsection_idx/unit_idx over
    * EVERY raw block and stamps them into that block's fields BEFORE the
    * `location_to_node` dict overwrite keeps the last occurrence per
    * stripped location — so a surviving duplicate keeps counters that
    * include contributions from the blocks it overwrote; :129-137
    * `strip_branch_and_version` normalizes the dedup key).
    *
    * Locations are synthesized from events WITH planted duplicates:
    * `pmod(event_id, 40)` gives each user ~2-3 raw blocks per normalized
    * location, and each raw location carries a distinct
    * `:branch@…:version@…` suffix, so the dedup only collapses AFTER the
    * strip — both reference behaviors are load-bearing in the result,
    * and so is the counters-over-raw order (a deduped-first counter
    * would renumber the survivors).
    *
    * Scale shape: the stacked counter windows partition on user-prefixed
    * keys exactly as A6 (per-key sorts, never a global sort), then one
    * shuffle on (user, location) for the last-wins max_by (map-side
    * combined — at most one row per key per map task, carrying only the
    * id-and-counter struct).
    */
  val sinkXblockDedup: Op = Op(
    "sink_xblock_dedup",
    (s, d) => {
      val raw = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          concat(lit("lb:org:c"), col("user_id"), lit(":b"),
            pmod(col("event_id"), lit(40)), lit(":branch@"),
            col("event_type"), lit(":version@"), col("event_id"))
            .as("raw_location"))
        // strip_branch_and_version: the dedup key drops branch+version
        .withColumn("location",
          regexp_replace(col("raw_location"), ":branch@.*$", ""))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bySection = Window.partitionBy(col("user_id"), col("section"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bySubsection = Window
        .partitionBy(col("user_id"), col("section"), col("subsection"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // counters over the RAW pre-dedup sequence (the reference's loop)
      val counted = raw
        .withColumn("ord", row_number().over(byUser).cast(LongType))
        .withColumn("section",
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).over(run))
        .withColumn("subsection",
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(bySection))
        .withColumn("unit",
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .over(bySubsection))
        .withColumn("block_type",
          when(col("event_type") === "signup", "chapter")
            .when(col("event_type") === "purchase", "sequential")
            .when(col("event_type") === "click", "vertical")
            .when(col("event_type") === "view", "static_tab")
            .otherwise("course_info"))
        .withColumn("detached",
          when(col("block_type").isin("static_tab", "about", "course_info"), 1L)
            .otherwise(0L))
      // dict-overwrite twin: last raw occurrence wins, KEEPING its raw
      // counters (max_by on (us, event_id) = the reference's iteration
      // order, which is also the counters' order)
      counted
        .groupBy(col("user_id"), col("location"))
        .agg(max_by(
          struct(col("event_id"), col("ord"), col("section"),
            col("subsection"), col("unit"), col("block_type"),
            col("detached")),
          struct(col("us"), col("event_id"))).as("m"))
        .select(col("user_id"), col("location"),
          col("m.event_id").as("event_id"), col("m.ord").as("ord"),
          col("m.section").as("section"),
          col("m.subsection").as("subsection"), col("m.unit").as("unit"),
          col("m.block_type").as("block_type"),
          col("m.detached").as("detached"))
        .orderBy(col("user_id"), col("ord"))
    },
    Some("""
      SELECT user_id, location, event_id, ord, section, subsection, unit,
             block_type,
             CAST(CASE WHEN block_type
                IN ('static_tab', 'about', 'course_info')
                THEN 1 ELSE 0 END AS BIGINT) AS detached
      FROM (
        SELECT *,
               CASE event_type WHEN 'signup' THEN 'chapter'
                    WHEN 'purchase' THEN 'sequential'
                    WHEN 'click' THEN 'vertical'
                    WHEN 'view' THEN 'static_tab'
                    ELSE 'course_info' END AS block_type,
               row_number() OVER (PARTITION BY user_id, location
                 ORDER BY us DESC, event_id DESC) AS rn
        FROM (
          SELECT *, CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, section, subsection
                         ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS unit
          FROM (
            SELECT *, CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id, section
                           ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS subsection
            FROM (
              SELECT user_id, location, event_id, event_type, us,
                     CAST(row_number() OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS BIGINT) AS ord,
                     CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS section
              FROM (
                SELECT user_id,
                       regexp_replace(concat('lb:org:c', user_id, ':b',
                         event_id % 40, ':branch@', event_type,
                         ':version@', event_id), ':branch@.*$', '')
                         AS location,
                       epoch_us(ts) AS us, event_id, event_type
                FROM events) t0) t1) t2) t3) t4
      WHERE rn = 1
      ORDER BY user_id, ord"""))

  /** A7 — select_related serializer: the reference's
    * `UserExternalIDSerializer` (serializers.py:69-86) projects the
    * external-id row plus two 1:1 joined attributes (`user.username`,
    * `external_id_type.name`). nation (the type table) is a bounded dim →
    * broadcast; customer scales with users → un-hinted equi-join on the
    * pk (AQE broadcasts it while small, shuffles it at 100 TB).
    */
  val sinkExternalId: Op = Op(
    "sink_external_id",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(
          col("o_orderkey").as("external_user_id"),
          col("n_name").as("external_id_type"),
          col("c_name").as("username"),
          col("o_custkey").as("user_id"),
          md5(concat(lit("xid|"), col("o_orderkey"))).as("dump_id"))
        .orderBy(col("external_user_id"))
    },
    Some("""
      SELECT o_orderkey AS external_user_id,
             n_name AS external_id_type,
             c_name AS username,
             o_custkey AS user_id,
             md5(concat('xid|', o_orderkey)) AS dump_id
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY external_user_id"""))

  /** A8 — CSV row rendering, QUOTE_NONNUMERIC: the reference's `send_item`
    * (sinks/base_sink.py:251-282) serializes each row as CSV with
    * csv.QUOTE_NONNUMERIC (strings quoted, internal quotes doubled,
    * numbers bare) for ClickHouse `FORMAT CSV` bulk inserts. Money is
    * rendered via exact integer cents (never %.2f on a double — Java
    * HALF_UP vs C half-even diverge on representable halves). Narrow
    * projection, no shuffle; the expression is whole-stage-codegen'd.
    */
  val sinkCsvFormat: Op = Op(
    "sink_csv_format",
    (s, d) => {
      def q(c: org.apache.spark.sql.Column) =
        concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\""))
      val cents = round(col("o_totalprice") * 100).cast(LongType)
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          concat_ws(",",
            col("o_orderkey").cast("string"),
            q(col("o_orderstatus")),
            q(col("o_orderpriority")),
            concat(expr("cast(cast(round(o_totalprice*100) as bigint) div 100 as string)"),
              lit("."), lpad((cents % 100).cast("string"), 2, "0")),
            q(date_format(col("o_orderdate"), "yyyy-MM-dd"))).as("csv_row"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             concat_ws(',',
               CAST(o_orderkey AS VARCHAR),
               concat('"', replace(o_orderstatus, '"', '""'), '"'),
               concat('"', replace(o_orderpriority, '"', '""'), '"'),
               concat(CAST(CAST(round(o_totalprice*100) AS BIGINT) // 100
                        AS VARCHAR),
                 '.', lpad(CAST(CAST(round(o_totalprice*100) AS BIGINT) % 100
                        AS VARCHAR), 2, '0')),
               concat('"', strftime(o_orderdate, '%Y-%m-%d'), '"')) AS csv_row
      FROM orders
      ORDER BY o_orderkey"""))

  /** A12 — config-gated CCX course expansion: the reference's
    * `get_ccx_courses` (utils.py:62-68) — iff
    * `settings.FEATURES["CUSTOM_COURSES_EDX"]` is on, each published
    * course additionally fans out to its CCX child courses
    * (`custom_course_edx.objects.filter(course_id=...)`), each of which
    * is fed through the SAME sink dump as its own course (signals.py
    * `receive_course_publish` loops `dump_data_to_clickhouse` over
    * them). Twin: A2's gate filters the parents; when the flag is on, a
    * sparse child model (lineitems with `l_partkey % 5 = 0` standing in
    * for the CCX registry) expands 1:N via one co-partitioned join on
    * the parent key, and every row — parent or CCX — carries its OWN
    * deterministic dump id (CCX courses are dumped as courses, not as
    * related children: contrast A11, where children ride the parent's
    * dump metadata).
    *
    * The flag is a BUILD-TIME parameter: `sink_ccx_expand_off` shares
    * this builder with the expansion compiled out — the off-plan
    * contains no child-table scan at all, which is what a config gate
    * means operationally at 100 TB.
    */
  private def ccxExpand(enabled: Boolean) =
    (s: org.apache.spark.sql.SparkSession, d: String) => {
      val sinkState = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("dumped_at"))
      val parents = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
        .join(sinkState, col("o_orderkey") === col("l_orderkey"), "left")
        .filter(col("dumped_at").isNull || col("dumped_at") < col("o_orderdate"))
        .select(col("o_orderkey").as("course_id"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
            .as("time_last_dumped"))
      val parentRows = parents.select(
        col("course_id"),
        concat(lit("course-v1:c"), col("course_id")).as("course_key"),
        lit(0L).as("is_ccx"),
        concat(lit("dump-"),
          hash32(concat(lit("crs|"), col("course_id"))).cast("string"))
          .as("dump_id"),
        col("time_last_dumped"))
      val rows =
        if (!enabled) parentRows
        else {
          // distinct: the registry has one row per CCX id (the synthetic
          // lineitem repeats (orderkey, linenumber) pairs; a real
          // custom_course_edx table is pk-unique)
          val ccx = parents.join(Tables.lineitem(s, d)
                .filter(col("l_partkey") % 5 === 0)
                .select(col("l_orderkey"), col("l_linenumber"))
                .distinct(),
              col("course_id") === col("l_orderkey"))
            .select(
              col("course_id"),
              concat(lit("ccx-v1:c"), col("course_id"), lit(":ccx@"),
                col("l_linenumber")).as("course_key"),
              lit(1L).as("is_ccx"),
              concat(lit("dump-"),
                hash32(concat(lit("ccx|"), col("course_id"), lit("|"),
                  col("l_linenumber"))).cast("string")).as("dump_id"),
              col("time_last_dumped"))
          parentRows.union(ccx)
        }
      rows.orderBy(col("course_id"), col("is_ccx"), col("course_key"))
    }

  private def ccxSql(enabled: Boolean): String = {
    val parents = s"""
        SELECT o_orderkey AS course_id,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS time_last_dumped
        FROM orders
        LEFT JOIN (SELECT l_orderkey AS sk, max(l_shipdate) AS dumped_at
                   FROM lineitem GROUP BY 1) sink
          ON o_orderkey = sk
        WHERE dumped_at IS NULL OR dumped_at < o_orderdate"""
    val parentRows = s"""
      SELECT course_id, concat('course-v1:c', course_id) AS course_key,
             CAST(0 AS BIGINT) AS is_ccx,
             concat('dump-', CAST(${Op.xhash32("concat('crs|', course_id)")}
               AS VARCHAR)) AS dump_id,
             time_last_dumped
      FROM p"""
    val ccxRows = s"""
      SELECT course_id,
             concat('ccx-v1:c', course_id, ':ccx@', l_linenumber)
               AS course_key,
             CAST(1 AS BIGINT) AS is_ccx,
             concat('dump-', CAST(${Op.xhash32(
               "concat('ccx|', course_id, '|', l_linenumber)")}
               AS VARCHAR)) AS dump_id,
             time_last_dumped
      FROM p JOIN (SELECT DISTINCT l_orderkey, l_linenumber
                   FROM lineitem WHERE l_partkey % 5 = 0) ccx_reg
        ON course_id = l_orderkey"""
    val body = if (enabled) s"$parentRows UNION ALL $ccxRows" else parentRows
    s"""
      WITH p AS ($parents)
      SELECT * FROM ($body) u
      ORDER BY course_id, is_ccx, course_key"""
  }

  val sinkCcxExpand: Op =
    Op("sink_ccx_expand", ccxExpand(enabled = true), Some(ccxSql(true)))

  /** A12-off — the same builder with CUSTOM_COURSES_EDX off: parents
    * only, no child scan in the plan.
    */
  val sinkCcxExpandOff: Op =
    Op("sink_ccx_expand_off", ccxExpand(enabled = false), Some(ccxSql(false)))

  /** A13 — per-sink enable/disable gating: `ModelBaseSink.is_enabled`
    * (base_sink.py:338-359) returns `settings flag OR waffle flag` per
    * sink model, and a disabled sink's `dump` is simply never invoked.
    * Twin over a literal flag fixture (two boolean sources per model,
    * like the settings + WaffleFlag pair): the report lists each model
    * with both flags, the OR, and the rows it would dump — and for a
    * DISABLED model the Spark plan contains NO scan of that table at
    * all (the count is a compile-time literal 0), which is the
    * operational meaning of the gate: a disabled sink costs zero reads
    * at any scale.
    */
  val sinkGating: Op = Op(
    "sink_gating",
    (s, d) => {
      // (model, settings flag, waffle flag) — the gating fixture
      val flags = Seq(
        ("customer", false, true),
        ("events", false, false),
        ("orders", true, false),
        ("part", true, true),
        ("supplier", false, false))
      val perModel = flags.map { case (name, setting, waffle) =>
        val enabled = setting || waffle
        val base = s.range(1).select(
          lit(name).as("model"),
          lit(setting).as("setting_enabled"),
          lit(waffle).as("waffle_enabled"),
          lit(enabled).as("is_enabled"))
        if (enabled)
          base.crossJoin(
            Tables.load(s, d, name).agg(count(lit(1)).as("n_dumped")))
        else base.withColumn("n_dumped", lit(0L))
      }
      perModel.reduce(_.unionByName(_)).orderBy(col("model"))
    },
    Some("""
      SELECT * FROM (
        SELECT 'customer' AS model, false AS setting_enabled,
               true AS waffle_enabled, true AS is_enabled,
               (SELECT count(*) FROM customer) AS n_dumped
        UNION ALL
        SELECT 'events', false, false, false, 0
        UNION ALL
        SELECT 'orders', true, false, true,
               (SELECT count(*) FROM orders)
        UNION ALL
        SELECT 'part', true, true, true,
               (SELECT count(*) FROM part)
        UNION ALL
        SELECT 'supplier', false, false, false, 0) g
      ORDER BY model"""))

  /** A9 — tumbling time-window aggregation: the batch twin of the
    * streaming ingest job (reference signals.py + tasks.py; Spark twin in
    * [[graft.streaming.EventIngest]]). Uses the Structured-Streaming
    * `window()` function so the exact same plan fragment runs under
    * readStream with a watermark. One shuffle on (window, event_type),
    * partial-aggregated map-side.
    */
  val eventsWindowedAgg: Op = Op(
    "events_windowed_agg",
    (s, d) =>
      graft.streaming.EventIngest.windowedAgg(Tables.events(s, d))
        .orderBy(col("hour_start"), col("event_type")),
    Some(s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type, count(*) AS n_events,
             ${xsum("value")} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_start, event_type"""))

  /** A14 — SCD2 validity intervals over the per-key event history: the
    * reference's sinks keep EVERY dumped version of an item (each
    * publish inserts a fresh row stamped `time_last_dumped` —
    * course_published.py's append-only model; A1's latest-row view is
    * one consumer of it); the other standard consumer is "state as of
    * T", which needs each version's validity window. This is the
    * type-2 slowly-changing-dimension reconstruction every warehouse
    * runs over append-only history: per key, order versions by
    * (ts, event_id) and close each interval at the next version's
    * open — `lead()` over the key partition; the last interval stays
    * open (`valid_to_us` NULL, `is_current` true).
    *
    * Scale shape: ONE window over the key partition (co-partitioned
    * with A1's shuffle — at 100 TB the same keyed exchange serves
    * both), no joins; zero-width intervals (same-ts versions) are kept
    * and deterministic via the event_id tie-break, matching how a
    * rapid double-publish reads in the reference's history.
    */
  /** The ONE interval-chain definition: versions (user_id, event_id,
    * event_type, value, us) → SCD2 intervals. Shared by the batch op
    * and [[graft.streaming.Scd2Stream]]'s per-key incremental rebuild,
    * so the stream can never drift from the batch semantics.
    */
  private[graft] def scd2Intervals(versions: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    versions
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  val sinkScd2: Op = Op(
    "sink_scd2",
    (s, d) => scd2Intervals(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), unix_micros(col("ts")).as("us")))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id")),
    Some("""
      SELECT user_id, event_id, event_type, value,
             us AS valid_from_us,
             lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS valid_to_us,
             lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               IS NULL AS is_current
      FROM (SELECT user_id, event_id, event_type, value,
                   epoch_us(ts) AS us
            FROM events) t
      ORDER BY user_id, valid_from_us, event_id"""))

  /** A14b — POINT-IN-TIME state reconstruction, the consumer side of
    * A14's intervals and the question SCD2 histories exist to answer:
    * "what was every key's state as of T?". T is the corpus midpoint
    * ((min+max)/2 event micros — a 1-row broadcast, so the query is
    * parameter-free and data-dependent at every SF), and the answer is
    * each key's interval containing T: valid_from ≤ T < valid_to (open
    * intervals absorb T at the top). Intervals tile gaplessly per key
    * (the A14 spec), so each key with any version at or before T yields
    * EXACTLY one row; later-starting keys yield none.
    *
    * Scale shape: A14's one keyed window + a predicate — no join
    * against the history (the naive "max version ≤ T per key" re-sorts
    * or re-aggregates the log; the interval form makes as-of lookup a
    * filter). At 100 TB the same plan serves any T, and a persisted
    * interval table (A15's stream output) turns it into a pure scan.
    */
  val sinkAsofState: Op = Op(
    "sink_asof_state",
    (s, d) => {
      val tf = Tables.events(s, d)
        .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")
          .as("t_us"))
      scd2Intervals(
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), unix_micros(col("ts")).as("us")))
        .crossJoin(broadcast(tf))
        .filter(col("valid_from_us") <= col("t_us") &&
          (col("valid_to_us").isNull || col("t_us") < col("valid_to_us")))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("valid_from_us"), col("t_us"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH iv AS (
        SELECT user_id, event_id, event_type, value,
               us AS valid_from_us,
               lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                 AS valid_to_us
        FROM (SELECT user_id, event_id, event_type, value,
                     epoch_us(ts) AS us
              FROM events) t),
      tf AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS t_us
             FROM events)
      SELECT user_id, event_id, event_type, value, valid_from_us, t_us
      FROM iv CROSS JOIN tf
      WHERE valid_from_us <= t_us
        AND (valid_to_us IS NULL OR t_us < valid_to_us)
      ORDER BY user_id"""))

  val all: Seq[Op] = Seq(
    sinkLatestState, sinkShouldDump, sinkRetireUsers, sinkPseudonymize,
    sinkPagination, sinkBackfillPlan, sinkSerializeOverview,
    sinkSerializeProfile, sinkXblockHierarchy, sinkXblockDedup,
    sinkExternalId, sinkCsvFormat, eventsWindowedAgg, sinkDumpRelated,
    sinkCcxExpand, sinkCcxExpandOff, sinkGating, sinkScd2, sinkAsofState)
}
