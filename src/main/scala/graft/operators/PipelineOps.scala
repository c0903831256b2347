package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Caches, Op, Tables}
import graft.Op.{xhash32, xsum}
import graft.functions.Portable._

/** Cross-cutting pipeline operators (SURVEY.md §2 part G): the temporal
  * joins, sampling and filtering passes a large-scale training-data /
  * analytics pipeline runs around the core relational + dedup surface.
  *
  * Scale notes per op in their scaladocs; the common theme: every join
  * here is either an equi-join on a natural key or a union+window
  * re-expression of an inequality join, so nothing degenerates to a
  * cartesian/broadcast-range plan at 100 TB.
  */
object PipelineOps {

  /** G1 — as-of join: each `purchase` event is attributed to the latest
    * `click` event of the same user at or before it (classic
    * last-touch attribution; the same shape joins trades to quotes or
    * metrics to deploy events).
    *
    * Spark lacks a native as-of join. The scalable re-expression: tag
    * both sides, UNION them into one stream, and take
    * `last_value(click_id) IGNORE NULLS` over a window partitioned by
    * user and ordered by (ts, side) — clicks sort before an
    * equal-timestamp purchase, giving inclusive `click.ts <= purchase.ts`
    * semantics. ONE shuffle on user_id, linear in rows, no inequality
    * join (a naive range join is O(clicks × purchases) per user and a
    * skew bomb at scale).
    *
    * Clicks are first deduped to one per (user, ts) — max event_id
    * wins — so as-of ties are deterministic in both engines (DuckDB's
    * ASOF JOIN picks an arbitrary row among equal timestamps otherwise).
    */
  val joinAsof: Op = Op(
    "join_asof",
    (s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val tagged = clicks
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("click_id"), lit(null).cast(LongType).as("event_id"),
          lit(null).cast("double").as("value"))
        .unionByName(purchases
          .select(col("user_id"), col("ts"), lit(1).as("side"),
            lit(null).cast(LongType).as("click_id"), col("event_id"),
            col("value")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_click_id",
          last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("value"),
          col("last_click_id"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id, p.value, c.click_id AS last_click_id
      FROM (SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase') p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  /** Bucket width for [[joinRange]]'s compound bucketing, in seconds.
    * Equal to the 24 h window length so every window overlaps at most
    * TWO buckets (the one holding its start and, if it crosses a bucket
    * boundary, the next). Like DedupOps.MAX_DF / MAX_BUCKET this is the
    * named scale knob: shrinking the window shrinks the bucket with it —
    * the ≤2-bucket invariant only needs width ≥ window length.
    */
  private[graft] val RANGE_BUCKET_SECONDS: Long = 24L * 3600L

  /** G2 — range (interval) join: per `signup` event, activity of the
    * same user inside the 24 h window after signup. A plain equi-join on
    * user_id with the window as a residual predicate costs
    * Σ_user (signups × events) — a skew bomb once one user (a bot, a
    * service account) holds millions of events. The engine path is
    * compound bucketing: time is cut into [[RANGE_BUCKET_SECONDS]]
    * buckets (width = window length), each signup is exploded to the
    * ≤2 buckets its window overlaps, each event maps to exactly ONE
    * bucket, and the join is a hash equi-join on (user_id, bucket) with
    * the exact range predicate evaluated as a residual. Per-key fanout
    * is bounded by one bucket's occupancy, not a user's lifetime; an
    * event can match at most one exploded row of a given signup (its own
    * bucket), so no dedup pass is needed. Bucket ids derive from
    * second-truncated epochs on BOTH sides, so the residual range check
    * on the full-precision timestamps never sees a pair the buckets
    * missed. LEFT join keeps zero-activity signups (n_follow = 0).
    */
  val joinRange: Op = Op(
    "join_range",
    (s, d) => {
      val W = RANGE_BUCKET_SECONDS
      val e = Tables.events(s, d)
      val signups = e.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts").as("t0"))
        // window (t0, t0+W] ⇒ buckets t0s div W and (t0s+W) div W;
        // array_distinct keeps the explode at 1 row when they coincide
        .withColumn("bkt", explode(array_distinct(array(
          expr(s"cast(t0 as long) div $W"),
          expr(s"(cast(t0 as long) + $W) div $W")))))
      val follow = e.select(col("user_id").as("f_user"), col("ts"),
        col("event_id").as("f_id"), col("value"))
        .withColumn("f_bkt", expr(s"cast(ts as long) div $W"))
      signups.join(follow,
          col("user_id") === col("f_user") &&
            col("bkt") === col("f_bkt") &&
            col("ts") > col("t0") &&
            col("ts") <= col("t0") + expr("INTERVAL 24 HOURS"),
          "left")
        .groupBy(col("signup_id"), col("user_id"))
        .agg(count(col("f_id")).as("n_follow"),
          coalesce(exactSum(col("value")), lit(0.0)).as("follow_value"))
        .orderBy(col("signup_id"))
    },
    Some(s"""
      SELECT s.event_id AS signup_id, s.user_id,
             count(f.event_id) AS n_follow,
             coalesce(${xsum("f.value")}, 0.0) AS follow_value
      FROM (SELECT * FROM events WHERE event_type = 'signup') s
      LEFT JOIN events f
        ON f.user_id = s.user_id
          AND f.ts > s.ts AND f.ts <= s.ts + INTERVAL 24 HOURS
      GROUP BY s.event_id, s.user_id
      ORDER BY signup_id"""))

  private val SAMPLE_K = 3

  /** G3 — deterministic stratified sampling: k documents per
    * (lang, source) stratum, ranked by a uniform md5 hash of the doc id —
    * the reproducible corpus-subsampling pass every training-data
    * pipeline needs (same inputs ⇒ same sample, on any engine, any
    * partitioning; no RNG state). Implemented as the bounded-heap
    * `topk_min` aggregate (r6, was a window): one shuffle on the stratum
    * key whose map-side partials each carry ≤ k rows per stratum, so a
    * pathologically heavy stratum costs k heap slots per task instead of
    * a full per-stratum window sort.
    */
  val sampleStratified: Op = Op(
    "sample_stratified",
    (s, d) => {
      // bounded-heap topk_min aggregate, not a window: map-side partials
      // carry ≤ k rows per stratum and no per-stratum sort runs — the
      // heavy-stratum refinement the r3 scaladoc promised, same rows
      val ord = struct(
        hash32(concat_ws("|", col("lang"), col("doc_id"))).as("h"),
        col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"))
        .groupBy(col("lang"), col("source"))
        .agg(topkMin(ord, SAMPLE_K).as("top"))
        .select(col("lang"), col("source"), posexplode(col("top")))
        .select(col("col.doc_id").as("doc_id"), col("lang"), col("source"),
          (col("pos") + 1).cast(LongType).as("rk"))
        .orderBy(col("lang"), col("source"), col("rk"))
    },
    Some(s"""
      SELECT doc_id, lang, source, rk FROM (
        SELECT doc_id, lang, source,
               CAST(row_number() OVER (PARTITION BY lang, source
                 ORDER BY ${xhash32("concat_ws('|', lang, doc_id)")}, doc_id)
                 AS BIGINT) AS rk
        FROM documents) t
      WHERE rk <= $SAMPLE_K
      ORDER BY lang, source, rk"""))

  /** G4 — composed quality filter: the fineweb-style keep/drop gate over
    * the C2 text metrics, reporting the FIRST failing rule (cheap rules
    * first, so short-circuit evaluation skips the expensive ones for
    * most dropped docs). Narrow projection — runs at scan speed; the
    * `kept` subset is what flows into dedup/tokenization downstream.
    */
  /** G4's verdict cascade over an arbitrary text column — shared with
    * G4b, which runs the same gate on C16-extracted content (one
    * definition, so the standalone gate and the composed pipeline stage
    * can never drift apart).
    */
  private def g4Verdict(c: Column): Column = {
    val len = length(c)
    val nTok = size(tokens(lower(c)))
    val punct = (len - length(regexp_replace(c, "\\p{Punct}", ""))) /
      greatest(len, lit(1)).cast("double")
    val stop = size(filter(tokens(lower(c)),
      t => t.isin("the", "a", "of", "to", "and", "is", "in", "it"))) /
      nTok.cast("double")
    when(nTok < 20, "too_short")
      .when(punct > lit(0.10), "too_much_punct")
      .when(stop < lit(0.01), "low_stopword")
      .otherwise("keep")
  }

  /** DuckDB twin of [[g4Verdict]] over the column expression `src`. */
  private def sqlG4Verdict(src: String): String = s"""CASE
                 WHEN len(regexp_split_to_array(trim(lower($src), ' '), '\\s+')) < 20
                   THEN 'too_short'
                 WHEN (length($src) - length(regexp_replace($src,
                     '[[:punct:]]', '', 'g'))) /
                     CAST(greatest(length($src), 1) AS DOUBLE) > 0.10
                   THEN 'too_much_punct'
                 WHEN len(list_filter(regexp_split_to_array(trim(lower($src), ' '),
                     '\\s+'), t -> t IN ('the','a','of','to','and','is','in','it')))
                     / CAST(len(regexp_split_to_array(trim(lower($src), ' '), '\\s+'))
                     AS DOUBLE) < 0.01
                   THEN 'low_stopword'
                 ELSE 'keep'
               END"""

  val qualityFilter: Op = Op(
    "quality_filter",
    (s, d) => {
      val verdict = g4Verdict(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), verdict.as("verdict"),
          (verdict === "keep").as("kept"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id, verdict, verdict = 'keep' AS kept FROM (
        SELECT doc_id, ${sqlG4Verdict("text")} AS verdict
        FROM documents) t
      ORDER BY doc_id"""))

  /** G4b — the quality gate consuming C16's extractor output: the
    * composed pipeline stage a real curation stack runs (crawl →
    * extract main content → gate on the EXTRACTED text, never the raw
    * page). Shares the extractor columns/CTEs with C16 and the verdict
    * cascade with G4, so the composition is definitionally the two
    * oracle-checked stages chained; still one narrow codegen projection
    * per document, no shuffle beyond the output ordering. Verdicts move
    * vs G4's raw-text run exactly where extraction matters: nav/promo
    * boilerplate no longer inflates length or link-punctuation, and
    * short extracted cores gate as too_short.
    */
  val qualityFilterExtracted: Op = Op(
    "quality_filter_extracted",
    (s, d) => {
      val (_, kept) = TextOps.extractBlocks
      val verdict = g4Verdict(col("content"))
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.extractContent(kept).as("content"))
        .select(col("doc_id"), verdict.as("verdict"),
          (verdict === "keep").as("kept"),
          length(col("content")).cast(LongType).as("n_chars_extracted"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${TextOps.sqlExtractKpCtes},
      x AS (SELECT doc_id,
              coalesce(array_to_string(list_transform(ks, c -> c.txt),
                chr(10)), '') AS content
            FROM kp)
      SELECT doc_id, verdict, verdict = 'keep' AS kept, n_chars_extracted
      FROM (SELECT doc_id, ${sqlG4Verdict("content")} AS verdict,
              CAST(length(content) AS BIGINT) AS n_chars_extracted
            FROM x) t
      ORDER BY doc_id"""))

  /** G5 — cohort retention: users cohorted by first-activity day; the
    * retention matrix counts distinct users active at each day offset.
    * Two shuffles (per-user min, then per-cell distinct count) — the
    * user⋈cohort join shuffles on user_id, and the distinct count
    * partial-aggregates map-side. The classic product-analytics read
    * over the sunk events table.
    */
  val eventsRetention: Op = Op(
    "events_retention",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohorts = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      e.join(cohorts, "user_id")
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast(LongType)
            .as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      cohorts AS (SELECT user_id, min(day) AS cohort_day
                  FROM e GROUP BY user_id)
      SELECT c.cohort_day,
             CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT)
               AS day_offset,
             count(DISTINCT e.user_id) AS n_users
      FROM e JOIN cohorts c ON e.user_id = c.user_id
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  /** G6 — ordered conversion funnel: signup → first subsequent click →
    * first subsequent purchase, per user, strictly time-ordered (a
    * purchase before the click doesn't count — the stage must happen
    * AFTER the previous stage's first completion). Three per-user
    * stage times computed in two user-co-partitioned join+agg phases
    * (each one shuffle on user_id; the user⋈stage-time joins reuse the
    * same partitioning), then one global count. Timestamps compare as
    * unix micros in both engines.
    */
  val eventsFunnel: Op = Op(
    "events_funnel",
    (s, d) => {
      // persist(): e feeds all three stages and ts/tc are each both
      // joined and counted — without persistence the final cross-join
      // recomputes the event scan five times (each deeper stage embeds
      // the shallower ones)
      val e = Caches.persist(Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us")))
      val ts = Caches.persist(e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("us"))).as("t_s"))
        .filter(col("t_s").isNotNull))
      val tc = Caches.persist(e.join(ts, "user_id")
        .groupBy(col("user_id"), col("t_s"))
        .agg(min(when(col("event_type") === "click" && col("us") > col("t_s"),
          col("us"))).as("t_c"))
        .filter(col("t_c").isNotNull))
      val tp = e.join(tc, "user_id")
        .groupBy(col("user_id"), col("t_c"))
        .agg(min(when(col("event_type") === "purchase" && col("us") > col("t_c"),
          col("us"))).as("t_p"))
        .filter(col("t_p").isNotNull)
      ts.agg(count(lit(1)).as("n_signup"))
        .crossJoin(tc.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(tp.agg(count(lit(1)).as("n_purchase_after")))
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      ts AS (SELECT user_id,
                    min(CASE WHEN event_type = 'signup' THEN us END) AS t_s
             FROM e GROUP BY user_id HAVING t_s IS NOT NULL),
      tc AS (SELECT e.user_id, t_s,
                    min(CASE WHEN event_type = 'click' AND us > t_s
                        THEN us END) AS t_c
             FROM e JOIN ts ON e.user_id = ts.user_id
             GROUP BY e.user_id, t_s HAVING t_c IS NOT NULL),
      tp AS (SELECT e.user_id, t_c,
                    min(CASE WHEN event_type = 'purchase' AND us > t_c
                        THEN us END) AS t_p
             FROM e JOIN tc ON e.user_id = tc.user_id
             GROUP BY e.user_id, t_c HAVING t_p IS NOT NULL)
      SELECT (SELECT count(*) FROM ts) AS n_signup,
             (SELECT count(*) FROM tc) AS n_click_after,
             (SELECT count(*) FROM tp) AS n_purchase_after"""))

  private val WSAMPLE_K = 20

  /** G7 — deterministic weighted sampling: k documents per language,
    * selection probability increasing with document weight (n_chars) —
    * the dataset-mixing pass that upsamples long/high-value documents
    * when composing a training corpus. Priority-sampling formulation:
    * each doc draws a deterministic uniform (the md5-derived hash32) and
    * its priority key is `hash / weight`; the k SMALLEST keys per
    * stratum win, so doubling a doc's weight halves its key (Efraimidis-
    * Spirakis uses u^(1/w), but its transcendentals differ by ULPs
    * across engines; one IEEE division of two exact integers is
    * bit-identical everywhere, and keeps the same
    * probability-increases-with-weight contract).
    *
    * Same scale shape as G3: the bounded-heap `topk_min` aggregate, one
    * shuffle on the stratum key, map-side partials carry ≤ k rows per
    * stratum per task — no per-stratum sort, no window, heavy strata
    * cost k heap slots.
    */
  val sampleWeighted: Op = Op(
    "sample_weighted",
    (s, d) => {
      // greatest(w, 1): a zero-length document must not divide by zero —
      // engines disagree on double x/0 (NULL vs Inf), so the Spark and
      // oracle row sets could diverge on corpora with empty docs. The
      // clamp (mirrored in the SQL) gives empty docs the minimum weight
      // instead of undefined behavior.
      val pri = (hash32(concat_ws("|", lit("w"), col("doc_id"))).cast("double") /
        greatest(col("n_chars"), lit(1L)).cast("double")).as("pri")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .groupBy(col("lang"))
        .agg(topkMin(struct(pri, col("doc_id"), col("n_chars")), WSAMPLE_K)
          .as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), col("col.doc_id").as("doc_id"),
          col("col.n_chars").as("weight"),
          (col("pos") + 1).cast(LongType).as("rk"))
        .orderBy(col("lang"), col("rk"))
    },
    Some(s"""
      SELECT lang, doc_id, weight, rk FROM (
        SELECT lang, doc_id, n_chars AS weight,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY CAST(${xhash32("concat_ws('|', 'w', doc_id)")} AS DOUBLE)
                   / CAST(greatest(n_chars, 1) AS DOUBLE), doc_id) AS BIGINT) AS rk
        FROM documents) t
      WHERE rk <= $WSAMPLE_K
      ORDER BY lang, rk"""))

  /** G8 — daily-volume anomaly detection per event type: a day is
    * flagged when its event count deviates from the type's mean daily
    * count by more than 3 sample standard deviations — the data-quality
    * monitor a pipeline runs over its ingest volumes (a collapsed source
    * or a runaway producer shows up here first).
    *
    * The flag is computed in INTEGER-exact cross-multiplied form —
    * `(c·n − S)²·(n−1) > 9·n·(n·Q − S²)` with S = Σc, Q = Σc² — i.e.
    * (c − μ)² > (3σ)² with every division cleared, so no engine's
    * stddev implementation (Welford vs sum-of-squares, FP order) can
    * flip a flag: both sides are exact BIGINTs. Bounds: safe while
    * n·Q < 2⁶³ (≈ daily counts up to ~10⁸ over ~10³ days); a deployment
    * beyond that lifts the same expressions to DECIMAL(38,0) unchanged.
    *
    * Two shuffles, both tiny after the first: the daily count is
    * map-side combined on (type, day); the per-type moments (n, S, Q —
    * one row per type) broadcast back onto the daily frame.
    */
  val eventsAnomaly: Op = Op(
    "events_anomaly",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("s"),
          sum(col("cnt") * col("cnt")).as("q"))
      daily.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("day"), col("cnt"), col("n_days"),
          (col("n_days") > 1 &&
            expr("""(cnt*n_days - s)*(cnt*n_days - s)*(n_days-1)
                    > 9*n_days*(n_days*q - s*s)""")).as("is_anomaly"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      stats AS (
        SELECT event_type, count(*) AS n_days,
               CAST(sum(cnt) AS BIGINT) AS s,
               CAST(sum(cnt*cnt) AS BIGINT) AS q
        FROM daily GROUP BY 1)
      SELECT d.event_type, d.day, d.cnt, st.n_days,
             st.n_days > 1 AND
               (d.cnt*st.n_days - st.s)*(d.cnt*st.n_days - st.s)*(st.n_days-1)
               > 9*st.n_days*(st.n_days*st.q - st.s*st.s) AS is_anomaly
      FROM daily d JOIN stats st ON d.event_type = st.event_type
      ORDER BY d.event_type, d.day"""))

  /** Packed training-sequence length in tokens, and docs per prefix-sum
    * block (the intra-block window bound).
    */
  private[graft] val SEQ_TOKENS = 512L
  private[graft] val PACK_BLOCK = 1000L

  /** G9 — sequence packing: lay the corpus out, in deterministic doc_id
    * order with one EOS separator per document, into fixed-length
    * training sequences of [[SEQ_TOKENS]] tokens (the concat-and-chunk
    * packing every autoregressive pre-training run performs). Each doc
    * gets the sequence index and offset where its first token lands,
    * how many sequences it spans, and a split flag — the manifest a
    * loader needs to materialize any packed sequence independently.
    *
    * The running token total is the F5-style DISTRIBUTED PREFIX SUM
    * (MultimodalOps.scala:206) over one GLOBAL stream, THREE levels
    * deep since r15: (1) token sums per [[PACK_BLOCK]]-doc block;
    * (2) block sums roll up into superblocks of PACK_BLOCK blocks,
    * whose bases come from a running sum over corpus/B² rows (the only
    * unpartitioned window left — 10 rows at 1e10 docs and B=1000,
    * where the r14 two-level form put 1e7 rows on one task); (3) each
    * block's base = its superblock base + an intra-superblock running
    * sum over ≤ B block rows; (4) the intra-block running total,
    * bounded by B rows. Every window partition is therefore ≤ B rows
    * for any corpus up to B³ = 1e9·B tokens of docs, and every offset
    * is the exact integer the sequential concat would produce
    * (PipelineSpec pins three-level ≡ sequential at a mini block size
    * that forces multiple superblocks).
    */
  /** The packing plan shared by G9/G9b: `ntCol` is the per-doc token
    * count INCLUDING the EOS token (whitespace for doc_pack, real BPE
    * for doc_pack_bpe — same manifest arithmetic either way).
    */
  private def packManifest(s: SparkSession, d: String, ntCol: Column): DataFrame =
    packManifestFromCounts(
      Tables.documents(s, d).select(col("doc_id"), ntCol.as("nt")))

  /** The same manifest over a PRECOMPUTED (doc_id, nt) frame — the
    * artifact-consumption path: a corpus priced once under a learned
    * [[TokenizerIndex]] ([[TokenizerIndex.priceDocuments]] + 1 EOS)
    * packs here without re-tokenizing, so the tokenizer trains once
    * per corpus however many packing/mixture runs consume it
    * (TokenizerIndexSpec pins the manifest invariants on that path).
    */
  /** The two-level prefix sum both the manifest and the emit path build
    * on: per doc its GLOBAL start offset in the concatenated token
    * stream — (doc_id, nt, start).
    */
  private[graft] def packStarts(
      counts: DataFrame, block: Long = PACK_BLOCK): DataFrame = {
    // persist(): the narrow (doc_id, blk, nt) frame feeds both the
    // block-sum aggregate and the join — one tokenizing scan, not two
    val docs = Caches.persist(counts
      .select(col("doc_id"), col("nt"),
        expr(s"doc_id div $block").as("blk")))
    val blockSums = docs.groupBy(col("blk")).agg(sum(col("nt")).as("bsum"))
      .withColumn("sblk", expr(s"blk div $block"))
    // level 2b (r15): superblock bases from the only unpartitioned
    // window — corpus/block² rows
    val superSums = blockSums.groupBy(col("sblk"))
      .agg(sum(col("bsum")).as("ssum"))
    val wSuper = Window.orderBy(col("sblk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val superBases = superSums
      .select(col("sblk"), (sum(col("ssum")).over(wSuper) - col("ssum"))
        .as("super_base"))
    // level 2a: block bases inside each superblock — ≤ block rows per
    // partition
    val wIntraS = Window.partitionBy(col("sblk")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blockBases = blockSums.join(broadcast(superBases), "sblk")
      .withColumn("block_base",
        col("super_base") + sum(col("bsum")).over(wIntraS) - col("bsum"))
      .select(col("blk"), col("block_base"))
    val wIntra = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(blockBases), "blk")
      .withColumn("start",
        col("block_base") + sum(col("nt")).over(wIntra) - col("nt"))
      .select(col("doc_id"), col("nt"), col("start"))
  }

  private[graft] def packManifestFromCounts(counts: DataFrame): DataFrame =
    packStarts(counts)
      .select(col("doc_id"), (col("nt") - 1).as("n_tokens"),
        expr(s"start div $SEQ_TOKENS").as("seq_idx"),
        (col("start") % SEQ_TOKENS).as("offset_in_seq"),
        (expr(s"(start + nt - 1) div $SEQ_TOKENS")
          - expr(s"start div $SEQ_TOKENS") + 1L).as("n_seqs_spanned"),
        (expr(s"(start + nt - 1) div $SEQ_TOKENS")
          =!= expr(s"start div $SEQ_TOKENS")).as("is_split"))
      .orderBy(col("doc_id"))

  val docPack: Op = Op(
    "doc_pack",
    (s, d) => packManifest(s, d,
      // +1 = EOS
      (size(split(trim(lower(col("text"))), "\\s+")) + 1).cast(LongType)),
    Some(s"""
      SELECT doc_id, nt - 1 AS n_tokens,
             (cum - nt) // $SEQ_TOKENS AS seq_idx,
             (cum - nt) % $SEQ_TOKENS AS offset_in_seq,
             (cum - 1) // $SEQ_TOKENS - (cum - nt) // $SEQ_TOKENS + 1
               AS n_seqs_spanned,
             (cum - 1) // $SEQ_TOKENS != (cum - nt) // $SEQ_TOKENS
               AS is_split
      FROM (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(lower(text), ' '), '\\s+')) + 1
                 AS BIGINT) AS nt,
               CAST(sum(len(regexp_split_to_array(trim(lower(text), ' '), '\\s+'))
                 + 1) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM documents) t
      ORDER BY doc_id"""))

  /** G9b — packing manifest budgeted in REAL BPE tokens
    * ([[graft.functions.Portable.bpeCount]]): identical manifest
    * arithmetic to G9, but sequence boundaries land where a real
    * tokenizer would put them — whitespace counts under-fill sequences
    * by whatever the corpus' chars-per-token ratio is. The oracle
    * replays the merge table with the C12 recursive CTE, then the same
    * running-sum arithmetic.
    */
  val docPackBpe: Op = Op(
    "doc_pack_bpe",
    (s, d) => packManifest(s, d, bpeCount(col("text")) + 1L), // +1 = EOS
    Some(s"""
      WITH RECURSIVE
      ${graft.functions.Bpe.sqlWordLenCte("documents", "lower(text)")},
      ${graft.functions.Bpe.sqlDocCountCtes("documents", "lower(text)")}
      SELECT doc_id, nt - 1 AS n_tokens,
             (cum - nt) // $SEQ_TOKENS AS seq_idx,
             (cum - nt) % $SEQ_TOKENS AS offset_in_seq,
             (cum - 1) // $SEQ_TOKENS - (cum - nt) // $SEQ_TOKENS + 1
               AS n_seqs_spanned,
             (cum - 1) // $SEQ_TOKENS != (cum - nt) // $SEQ_TOKENS
               AS is_split
      FROM (
        SELECT doc_id, n_bpe + 1 AS nt,
               CAST(sum(n_bpe + 1) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM bpe_doc) t
      ORDER BY doc_id"""))

  /** The span stream behind [[docPackEmit]], over a precomputed
    * (doc_id, nt) frame — one row per (sequence, contiguous doc span).
    */
  private[graft] def packEmitFromCounts(counts: DataFrame): DataFrame = {
    val spanStart = greatest(col("start"), col("seq_idx") * SEQ_TOKENS)
    packStarts(counts)
      .select(col("doc_id"), col("nt"), col("start"),
        explode(sequence(expr(s"start div $SEQ_TOKENS"),
          expr(s"(start + nt - 1) div $SEQ_TOKENS"))).as("seq_idx"))
      .select(col("seq_idx"),
        (spanStart - col("seq_idx") * SEQ_TOKENS).as("offset_in_seq"),
        col("doc_id"),
        (spanStart - col("start")).as("tok_start"),
        (least(col("start") + col("nt"), (col("seq_idx") + 1) * SEQ_TOKENS)
          - spanStart).as("tok_len"))
      .orderBy(col("seq_idx"), col("offset_in_seq"))
  }

  /** G9c — pack EXECUTION: materialize the packed sequences the G9b
    * manifest describes, as SPAN REFERENCES — one row per (seq_idx,
    * contiguous doc span): which doc, which slice of its BPE token
    * stream ([tok_start, tok_start+tok_len) under the same
    * [[graft.functions.Portable.bpeCount]] budget, EOS last), and where
    * in the sequence it lands (offset_in_seq). A loader joins a span
    * row to its document and cuts the slice — the reference layout
    * every packed-corpus format uses (spans, not inlined token arrays:
    * inlining would rewrite the whole corpus through a
    * sequence-partitioned shuffle; spans are id-width rows and the
    * corpus text never moves).
    *
    * Same two-level prefix sum as the manifest (shared [[packStarts]] —
    * the G16-over-G10 move applied to G9: plan and execution derive
    * from ONE start-offset computation, so they cannot drift; the spec
    * pins the reconciliation identities), then each doc explodes into
    * its n_seqs_spanned rows — no corpus sort, no per-sequence window.
    * Every sequence's spans tile [0, SEQ_TOKENS) exactly (the last
    * sequence ends at the corpus' total token count).
    */
  val docPackEmit: Op = Op(
    "doc_pack_emit",
    (s, d) => packEmitFromCounts(Tables.documents(s, d)
      .select(col("doc_id"), (bpeCount(col("text")) + 1L).as("nt"))),
    Some(s"""
      WITH RECURSIVE
      ${graft.functions.Bpe.sqlWordLenCte("documents", "lower(text)")},
      ${graft.functions.Bpe.sqlDocCountCtes("documents", "lower(text)")},
      pe_doc AS (
        SELECT doc_id, n_bpe + 1 AS nt,
               CAST(sum(n_bpe + 1) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) - (n_bpe + 1) AS start
        FROM bpe_doc),
      pe_span AS (
        SELECT doc_id, nt, start,
               unnest(generate_series(start // $SEQ_TOKENS,
                 (start + nt - 1) // $SEQ_TOKENS)) AS seq_idx
        FROM pe_doc)
      SELECT seq_idx,
             greatest(start, seq_idx * $SEQ_TOKENS) - seq_idx * $SEQ_TOKENS
               AS offset_in_seq,
             doc_id,
             greatest(start, seq_idx * $SEQ_TOKENS) - start AS tok_start,
             least(start + nt, (seq_idx + 1) * $SEQ_TOKENS)
               - greatest(start, seq_idx * $SEQ_TOKENS) AS tok_len
      FROM pe_span
      ORDER BY seq_idx, offset_in_seq"""))

  /** G10 — dataset-mixture planning: given per-source token counts and
    * declared mixture weights, the per-source token budget and how many
    * epochs (passes) of each source the mixture demands — the
    * composition arithmetic every multi-source training run does before
    * sampling (the weights here derive deterministically from the
    * source name, standing in for a config table; the math is the
    * product). Sources needing >1 epoch are upsampled — the flag that
    * warns a mixture over-stretches a small source.
    *
    * Epochs are exact integer MILLI-epochs via two-step long division
    * (quotient·1000 + scaled remainder), so nothing overflows below
    * ~9e15 total tokens and both engines agree bit-for-bit. One
    * per-source aggregate + a 1-row broadcast total — nothing about the
    * corpus shuffles twice.
    */
  /** The mixture-budget plan shared by G10/G10b: `ntCol` is the per-doc
    * token count (whitespace or real BPE).
    */
  private def mixturePlanFor(s: SparkSession, d: String, ntCol: Column): DataFrame =
    mixturePlanFromCounts(
      Tables.documents(s, d).select(col("source"), ntCol.as("nt")))

  /** The same mixture plan over a PRECOMPUTED (source, nt) frame — the
    * [[TokenizerIndex]] artifact-consumption path, as with
    * [[packManifestFromCounts]].
    */
  private[graft] def mixturePlanFromCounts(counts: DataFrame): DataFrame = {
      val perSrc = counts
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .withColumn("weight", hash32(col("source")) % 9 + 1)
      val tot = perSrc.agg(sum(col("n_tokens")).as("tot_tokens"),
        sum(col("weight")).as("tot_weight"))
      // greatest(n_tokens, 1): a source of empty docs has 0 BPE tokens,
      // and integer division by zero is engine-DEPENDENT (Spark div →
      // NULL, DuckDB // → error) — same guard class as sample_weighted
      perSrc.crossJoin(broadcast(tot))
        .withColumn("target_tokens",
          expr("tot_tokens * weight div tot_weight"))
        .withColumn("epochs_milli",
          expr("(target_tokens div greatest(n_tokens, 1)) * 1000 + " +
            "((target_tokens % greatest(n_tokens, 1)) * 1000) " +
            "div greatest(n_tokens, 1)"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
          col("target_tokens"), col("epochs_milli"),
          (col("epochs_milli") > 1000L).as("is_upsampled"))
        .orderBy(col("source"))
  }

  /** G10/G10b shared oracle: per-source (n_docs, n_tokens) arrive from
    * `perSrcSql`, the budget arithmetic is identical.
    */
  private def mixtureSql(perSrcSql: String, prefix: String = ""): String = s"""
      $prefix
      per_src AS ($perSrcSql),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                     CAST(sum(weight) AS BIGINT) AS tot_weight
              FROM per_src)
      SELECT source, n_docs, n_tokens, weight, target_tokens,
             epochs_milli, epochs_milli > 1000 AS is_upsampled
      FROM (
        SELECT source, n_docs, n_tokens, weight, target_tokens,
               (target_tokens // greatest(n_tokens, 1)) * 1000 +
                 ((target_tokens % greatest(n_tokens, 1)) * 1000)
                 // greatest(n_tokens, 1)
                 AS epochs_milli
        FROM (
          SELECT source, n_docs, n_tokens, weight,
                 tot_tokens * weight // tot_weight AS target_tokens
          FROM per_src CROSS JOIN tot) t1) t2
      ORDER BY source"""

  val mixturePlan: Op = Op(
    "mixture_plan",
    (s, d) => mixturePlanFor(s, d,
      size(split(trim(lower(col("text"))), "\\s+")).cast(LongType)),
    Some(mixtureSql(
      s"""SELECT source, count(*) AS n_docs,
               CAST(sum(len(regexp_split_to_array(trim(lower(text), ' '),
                 '\\s+'))) AS BIGINT) AS n_tokens,
               ${xhash32("source")} % 9 + 1 AS weight
        FROM documents GROUP BY source""",
      prefix = "WITH")))

  /** G10b — mixture budgets in REAL BPE tokens: the same composition
    * arithmetic, but epochs/targets are denominated in the currency the
    * training run actually spends. Whitespace counts overstate this
    * corpus' budgets by the corpus' tokens-per-word ratio, which shifts
    * milli-epoch counts and can flip upsampling flags.
    */
  val mixturePlanBpe: Op = Op(
    "mixture_plan_bpe",
    (s, d) => mixturePlanFor(s, d, bpeCount(col("text"))),
    Some(mixtureSql(
      s"""SELECT source, count(*) AS n_docs,
               CAST(sum(n_bpe) AS BIGINT) AS n_tokens,
               ${xhash32("source")} % 9 + 1 AS weight
        FROM documents d JOIN bpe_doc b ON d.doc_id = b.doc_id
        GROUP BY source""",
      prefix = s"""WITH RECURSIVE
      ${graft.functions.Bpe.sqlWordLenCte("documents", "lower(text)")},
      ${graft.functions.Bpe.sqlDocCountCtes("documents", "lower(text)")},""")))

  /** G10c — TEMPERATURE-scaled mixture planning: the weights derive
    * from the corpus itself as n_tokens^(1/T) with T = 2 — the
    * standard multilingual/multi-source temperature trick (sampling
    * ∝ size flattens nothing, T → ∞ is uniform; T = 2 is the common
    * compromise that keeps small sources visible without drowning the
    * head). T = 2 is also the one temperature with an ENGINE-EXACT
    * portable form: n^(1/2) is IEEE sqrt (correctly rounded, unlike
    * pow/exp), floored to an integer weight, after which the budget
    * arithmetic is G10's exact milli-epoch integer division
    * unchanged. The is_upsampled flag is the point: under temperature
    * the tail sources systematically exceed one epoch — the
    * over-stretch warning a proportional mixture never trips.
    */
  val mixturePlanTemp: Op = Op(
    "mixture_plan_temp",
    (s, d) => {
      val perSrc = Tables.documents(s, d)
        .select(col("source"),
          size(split(trim(lower(col("text"))), "\\s+")).cast(LongType)
            .as("nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .withColumn("weight",
          greatest(floor(sqrt(col("n_tokens").cast("double")))
            .cast(LongType), lit(1L)))
      val tot = perSrc.agg(sum(col("n_tokens")).as("tot_tokens"),
        sum(col("weight")).as("tot_weight"))
      perSrc.crossJoin(broadcast(tot))
        .withColumn("target_tokens",
          expr("tot_tokens * weight div tot_weight"))
        .withColumn("epochs_milli",
          expr("(target_tokens div greatest(n_tokens, 1)) * 1000 + " +
            "((target_tokens % greatest(n_tokens, 1)) * 1000) " +
            "div greatest(n_tokens, 1)"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
          col("target_tokens"), col("epochs_milli"),
          (col("epochs_milli") > 1000L).as("is_upsampled"))
        .orderBy(col("source"))
    },
    Some(mixtureSql(
      """SELECT source, count(*) AS n_docs,
               CAST(sum(len(regexp_split_to_array(trim(lower(text), ' '),
                 '\s+'))) AS BIGINT) AS n_tokens,
               greatest(CAST(floor(sqrt(CAST(sum(len(
                 regexp_split_to_array(trim(lower(text), ' '), '\s+')))
                 AS DOUBLE))) AS BIGINT), 1) AS weight
        FROM documents
        GROUP BY source""",
      prefix = "WITH")))

  /** G16 — mixture EXECUTION: materialize G10's epoch plan as an actual
    * per-document selection. G10/G10b/G10c stop at budgets
    * (target_tokens per source); this op decides WHICH documents fill
    * each budget: within a source, documents are ordered by the
    * deterministic hash priority (hash60(source || '|' || doc_id),
    * doc_id — G11's priority, so reruns and engines agree), and a
    * document is selected iff the token mass of the documents BEFORE it
    * is still under the source's target — the classic
    * hash-threshold sample, landing within one document of the budget
    * (|selected − target| ≤ max doc length by construction; a source
    * whose target meets or exceeds its mass selects everything, and the
    * shortfall is exactly what G10's epochs_milli > 1000 upsampling
    * flag already prices).
    *
    * Scale shape: NO per-source window over the corpus (the G11
    * argument — sources are Zipf-skewed). The selection threshold
    * resolves in two phases: a (source, bucket)-histogram of token
    * sums, bucket = the priority's top 12 bits (≤ 4096 id-width rows
    * per source, map-side combined — the only corpus-sized shuffle),
    * whose small-frame running sum finds each source's BOUNDARY bucket;
    * buckets strictly below it are kept wholesale, above dropped
    * wholesale, and only the boundary bucket's ~1/4096 slice of each
    * source pays the exact ordered prefix-sum window. Bucket = the
    * hash's high bits, so (bucket, h, doc_id) order IS (h, doc_id)
    * order and the two-phase split is exactly the oracle's one-window
    * semantics.
    */
  /** G16's selection body over an explicit documents frame and a
    * (source, target_tokens) budget frame — the seam G24 points the
    * DoReMi-derived budgets through (and a deployment points any
    * budget source through). The budget side joins as a broadcast;
    * sources absent from it are out of the mixture and emit no rows
    * (both engines drop them through the same inner join).
    */
  private[graft] def mixtureSelect(docsTbl: DataFrame, tgt: DataFrame)
      : DataFrame = {
      val ntCol = size(split(trim(lower(col("text"))), "\\s+"))
        .cast(LongType)
      val docs = Caches.persist(docsTbl
        .select(col("doc_id"), col("source"), ntCol.as("nt"),
          hash60(concat(col("source"), lit("|"), col("doc_id"))).as("h"))
        .withColumn("bucket", shiftright(col("h"), 48)))
      val wB = Window.partitionBy(col("source")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hist = docs.groupBy(col("source"), col("bucket"))
        .agg(sum(col("nt")).as("bt"))
        .withColumn("cum_before", coalesce(sum(col("bt")).over(wB), lit(0L)))
        .join(broadcast(tgt), "source")
      val marked = docs.join(hist, Seq("source", "bucket"))
      val easy = marked
        .filter(col("cum_before") + col("bt") <= col("target_tokens") ||
          col("cum_before") >= col("target_tokens"))
        .select(col("doc_id"), col("source"), col("nt"),
          (col("cum_before") + col("bt") <= col("target_tokens"))
            .as("kept"))
      val wIn = Window.partitionBy(col("source"), col("bucket"))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val boundary = marked
        .filter(col("cum_before") < col("target_tokens") &&
          col("cum_before") + col("bt") > col("target_tokens"))
        .withColumn("cum_in", coalesce(sum(col("nt")).over(wIn), lit(0L)))
        .select(col("doc_id"), col("source"), col("nt"),
          (col("cum_before") + col("cum_in") < col("target_tokens"))
            .as("kept"))
      easy.unionAll(boundary).orderBy(col("doc_id"))
  }

  val sampleMixture: Op = Op(
    "sample_mixture",
    (s, d) => {
      val ntCol = size(split(trim(lower(col("text"))), "\\s+"))
        .cast(LongType)
      mixtureSelect(Tables.documents(s, d),
        mixturePlanFor(s, d, ntCol)
          .select(col("source"), col("target_tokens")))
    },
    Some(s"""
      WITH per_src AS (
        SELECT source,
               CAST(sum(len(regexp_split_to_array(trim(lower(text), ' '),
                 '\\s+'))) AS BIGINT) AS n_tokens,
               ${xhash32("source")} % 9 + 1 AS weight
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                     CAST(sum(weight) AS BIGINT) AS tot_weight
              FROM per_src),
      tgt AS (SELECT source, tot_tokens * weight // tot_weight
                       AS target_tokens
              FROM per_src CROSS JOIN tot),
      docs AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(lower(text), ' '),
                 '\\s+')) AS BIGINT) AS nt,
               ${graft.Op.xhash60("concat(source, '|', doc_id)")} AS h
        FROM documents),
      r AS (SELECT docs.*,
                   coalesce(sum(nt) OVER (PARTITION BY source
                     ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cum
            FROM docs)
      SELECT r.doc_id, r.source, r.nt, r.cum < t.target_tokens AS kept
      FROM r JOIN tgt t USING (source)
      ORDER BY doc_id"""))

  /** G24 — DoReMi-weighted mixture EXECUTION: close the loop from
    * G23's LEARNED domain weights to an actual per-document
    * selection. G16 executes G10's hash-derived plan; this op derives
    * each source's token budget from the DoReMi weights instead —
    * target_tokens(source) = tot_tokens · weight_milli div
    * Σ weight_milli — and runs the identical boundary-bucket
    * hash-threshold selection ([[mixtureSelect]], the shared body),
    * so the paper's intended deployment (reweight the big run's
    * mixture by the proxy's DRO weights) is a two-frame composition.
    * Sources the weight frame lacks (no scorable candidate docs) are
    * out of the mixture — both engines drop them through the same
    * inner budget join.
    *
    * Scale shape: G23's one corpus-sized docbg build + G16's one
    * (source, bucket)-histogram shuffle; the budget frame is
    * |domains| rows crossed with two 1-row broadcasts. Nothing new
    * touches the corpus.
    */
  val sampleMixtureDoremi: Op = Op(
    "sample_mixture_doremi",
    (s, d) => {
      val ntCol = size(split(trim(lower(col("text"))), "\\s+"))
        .cast(LongType)
      val dw = TextOps.doremiWeights(Tables.documents(s, d))
        .select(col("source"), col("weight_milli"))
      val tot = Tables.documents(s, d)
        .agg(sum(ntCol).as("tot_tokens"))
      val totM = dw.agg(sum(col("weight_milli")).as("tot_milli"))
      val tgt = dw.crossJoin(broadcast(tot)).crossJoin(broadcast(totM))
        .select(col("source"),
          expr("tot_tokens * weight_milli div tot_milli")
            .as("target_tokens"))
      mixtureSelect(Tables.documents(s, d), tgt)
    },
    Some(s"""
      WITH ${TextOps.sqlDoremiCtes},
      totx AS (SELECT CAST(sum(len(regexp_split_to_array(
                 trim(lower(text), ' '), '\\s+'))) AS BIGINT)
                 AS tot_tokens
               FROM documents),
      totm AS (SELECT CAST(sum(weight_milli) AS BIGINT) AS tot_milli
               FROM dw),
      tgt AS (SELECT source,
                     tot_tokens * weight_milli // tot_milli
                       AS target_tokens
              FROM dw, totx, totm),
      mdocs AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(lower(text), ' '),
                 '\\s+')) AS BIGINT) AS nt,
               ${graft.Op.xhash60("concat(source, '|', doc_id)")} AS h
        FROM documents),
      mr AS (SELECT mdocs.*,
                    coalesce(sum(nt) OVER (PARTITION BY source
                      ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum
             FROM mdocs)
      SELECT mr.doc_id, mr.source, mr.nt,
             mr.cum < t.target_tokens AS kept
      FROM mr JOIN tgt t USING (source)
      ORDER BY doc_id"""))

  /** G9d's dials: epochs to materialize and shard fan-out. Two epochs
    * demonstrate the property that matters (the orders differ yet each
    * is independently reproducible); 8 shards keep the gate corpus'
    * shards non-trivial. A deployment dials both up freely — the plan
    * never materializes an epoch×corpus blowup beyond the (epoch,
    * seq_idx) id-width rows themselves.
    */
  private val SHUF_EPOCHS = 2
  private val SHUF_SHARDS = 8L

  /** G9d — the data-loader SHUFFLE: a deterministic, epoch-seeded
    * global order and shard assignment for the packed sequences
    * G9/G9c define — (epoch, seq_idx) → (rank, shard, pos_in_shard).
    * Every training run reshuffles its packed corpus per epoch; at
    * 100 TB "shuffle the data" cannot mean a random-key global sort,
    * and restartability means the order must be a pure function of
    * (epoch, seq_idx) — the hash-rank shuffle (hash60('shuf' || epoch
    * || '|' || seq_idx), ties by seq_idx), the same determinism
    * discipline as G3/G11/G16.
    *
    * Scale shape: the global DENSE rank resolves without a corpus
    * sort — G16's boundary-bucket argument applied to ranking: bucket
    * = the hash's top 12 bits, a ≤ 4096-row per-epoch histogram's
    * running sum gives each bucket's global base, and only WITHIN a
    * bucket (~1/4096 of the sequences) does a row_number window sort;
    * (bucket, h, seq_idx) order IS (h, seq_idx) order, so the composed
    * rank is exactly the oracle's one-window row_number. The sequence
    * universe derives from the corpus (the distinct seq_idx set of the
    * shared [[packStarts]] span explode — sequences are contiguous by
    * construction, so this is 0..S−1 without any driver-side count),
    * and the shard arithmetic (seqs_per_shard = ceil(S / shards))
    * rides a 1-row broadcast. Shards are balanced within one sequence
    * (|shard| ∈ {⌊S/shards⌋, ⌈S/shards⌉}) and a loader resumes epoch e
    * shard s by recomputing exactly this frame filtered to (e, s).
    */
  val packShuffle: Op = Op(
    "pack_shuffle",
    (s, d) => {
      val seqs = Caches.persist(
        packStarts(Tables.documents(s, d)
          .select(col("doc_id"),
            (size(split(trim(lower(col("text"))), "\\s+")) + 1)
              .cast(LongType).as("nt")))
          .select(explode(sequence(expr(s"start div $SEQ_TOKENS"),
            expr(s"(start + nt - 1) div $SEQ_TOKENS"))).as("seq_idx"))
          .distinct()
          .select(explode(sequence(lit(0L),
            lit(SHUF_EPOCHS - 1L))).as("epoch"), col("seq_idx"))
          .withColumn("h", hash60(concat(lit("shuf"),
            col("epoch").cast("string"), lit("|"),
            col("seq_idx").cast("string"))))
          .withColumn("bucket", shiftright(col("h"), 48)))
      val sTot = seqs.filter(col("epoch") === 0L)
        .agg(count(lit(1)).as("n_seqs"))
        .select(col("n_seqs"),
          expr(s"(n_seqs + $SHUF_SHARDS - 1) div $SHUF_SHARDS").as("sps"))
      val wB = Window.partitionBy(col("epoch")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hist = seqs.groupBy(col("epoch"), col("bucket"))
        .agg(count(lit(1)).as("bc"))
        .withColumn("cum_before", coalesce(sum(col("bc")).over(wB), lit(0L)))
        .select(col("epoch"), col("bucket"), col("cum_before"))
      val wIn = Window.partitionBy(col("epoch"), col("bucket"))
        .orderBy(col("h"), col("seq_idx"))
      seqs.join(hist, Seq("epoch", "bucket"))
        .withColumn("rk",
          col("cum_before") + row_number().over(wIn).cast(LongType) - 1L)
        .crossJoin(broadcast(sTot))
        .select(col("epoch"), col("seq_idx"), col("rk").as("rank"),
          expr("rk div sps").as("shard"),
          (col("rk") % col("sps")).as("pos_in_shard"))
        .orderBy(col("epoch"), col("rank"))
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(lower(text), ' '), '\\s+')) + 1
                 AS BIGINT) AS nt,
               CAST(sum(len(regexp_split_to_array(trim(lower(text), ' '), '\\s+'))
                 + 1) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM documents),
      sq AS (
        SELECT DISTINCT unnest(generate_series((cum - nt) // $SEQ_TOKENS,
          (cum - 1) // $SEQ_TOKENS)) AS seq_idx
        FROM d),
      stot AS (SELECT CAST(count(*) AS BIGINT) AS n_seqs,
                      (CAST(count(*) AS BIGINT) + $SHUF_SHARDS - 1)
                        // $SHUF_SHARDS AS sps
               FROM sq),
      e AS (
        SELECT ep.epoch, sq.seq_idx,
               ${graft.Op.xhash60("'shuf' || CAST(ep.epoch AS VARCHAR) " +
      "|| '|' || CAST(sq.seq_idx AS VARCHAR)")} AS h
        FROM sq CROSS JOIN (VALUES ${(0 until SHUF_EPOCHS)
      .map(e => s"(CAST($e AS BIGINT))").mkString(", ")}) ep(epoch)),
      r AS (
        SELECT epoch, seq_idx,
               CAST(row_number() OVER (PARTITION BY epoch
                 ORDER BY h, seq_idx) AS BIGINT) - 1 AS rank
        FROM e)
      SELECT r.epoch, r.seq_idx, r.rank,
             r.rank // s.sps AS shard,
             r.rank % s.sps AS pos_in_shard
      FROM r CROSS JOIN stot s
      ORDER BY epoch, rank"""))

  /** G20 — deterministic stratified holdout SPLIT: partition the corpus
    * into train/val/test with EXACT per-source counts (test = n_s div
    * 10, val = n_s div 10, train = the rest) by the hash-rank
    * discipline — assignment is a pure function of (source, doc_id), so
    * reruns, engines, and resumed pipelines agree on membership, and
    * per-source stratification keeps every source represented in every
    * split at its corpus share (the eval-set construction every
    * training pipeline needs; a global 10% hash-mod split would let a
    * small source's val set round to zero and would drift with corpus
    * composition).
    *
    * Scale shape: the per-source dense rank behind the two cut points
    * resolves with the boundary-bucket technique (G16/G9d): a (source,
    * bucket = hash top 12 bits) count histogram, its small running sum,
    * and wholesale bucket classification against the cuts — a bucket
    * strictly inside one split assigns without ordering anything, and
    * only the ≤ 2 straddling buckets per source (~2/4096 of the
    * stratum) pay the in-bucket row_number sort. No per-source window
    * over the corpus, Zipf-skewed sources included.
    */
  /** G20's assignment over any (doc_id, source) frame — factored so the
    * spec can drive the boundary-bucket path with a dense synthetic
    * stratum (at gate SFs the 4096-bucket histogram holds ≤ 1 doc per
    * bucket, so no bucket can straddle a cut and the easy path assigns
    * everything; the straddle logic first engages around 10k+ docs per
    * source — sf10 exercises it for real, the spec pins it exactly).
    */
  private[graft] def holdoutAssign(input: DataFrame): DataFrame = {
      val docs = Caches.persist(input
        .select(col("doc_id"), col("source"),
          hash60(concat(lit("split|"), col("source"), lit("|"),
            col("doc_id").cast("string"))).as("h"))
        .withColumn("bucket", shiftright(col("h"), 48)))
      val cuts = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
        .select(col("source"), expr("n div 10").as("t1"),
          expr("2 * (n div 10)").as("t2"))
      val wB = Window.partitionBy(col("source")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hist = docs.groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("bc"))
        .withColumn("lo", coalesce(sum(col("bc")).over(wB), lit(0L)))
        .join(broadcast(cuts), "source")
      val marked = docs.join(hist, Seq("source", "bucket"))
      def splitOf(rk: Column) =
        when(rk < col("t1"), lit("test"))
          .when(rk < col("t2"), lit("val"))
          .otherwise(lit("train"))
      val easy = marked
        .filter(col("lo") + col("bc") <= col("t1") ||
          (col("lo") >= col("t1") && col("lo") + col("bc") <= col("t2")) ||
          col("lo") >= col("t2"))
        .select(col("doc_id"), col("source"), splitOf(col("lo")).as("split"))
      val wIn = Window.partitionBy(col("source"), col("bucket"))
        .orderBy(col("h"), col("doc_id"))
      val boundary = marked
        .filter(!(col("lo") + col("bc") <= col("t1") ||
          (col("lo") >= col("t1") && col("lo") + col("bc") <= col("t2")) ||
          col("lo") >= col("t2")))
        .withColumn("rk",
          col("lo") + row_number().over(wIn).cast(LongType) - 1L)
        .select(col("doc_id"), col("source"), splitOf(col("rk")).as("split"))
      easy.unionAll(boundary).orderBy(col("doc_id"))
  }

  val sampleHoldout: Op = Op(
    "sample_holdout",
    (s, d) => holdoutAssign(
      Tables.documents(s, d).select(col("doc_id"), col("source"))),
    Some(s"""
      WITH d AS (
        SELECT doc_id, source,
               ${graft.Op.xhash60(
      "'split|' || source || '|' || CAST(doc_id AS VARCHAR)")} AS h
        FROM documents),
      ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             FROM d GROUP BY source),
      r AS (SELECT d.*,
                   CAST(row_number() OVER (PARTITION BY source
                     ORDER BY h, doc_id) AS BIGINT) - 1 AS rk
            FROM d)
      SELECT r.doc_id, r.source,
             CASE WHEN rk < n // 10 THEN 'test'
                  WHEN rk < 2 * (n // 10) THEN 'val'
                  ELSE 'train' END AS split
      FROM r JOIN ns USING (source)
      ORDER BY doc_id"""))

  /** The DSIR dials: the target domain (the sources whose distribution
    * the selected subset should match), the hashed-feature bucket
    * count, and the kept corpus fraction.
    */
  private[graft] val DSIR_TARGET = Seq("src1", "src2")
  private[graft] val DSIR_B = 1024
  private[graft] val DSIR_KEEP_PCT = 25

  /** G21 — DSIR-style importance resampling (the public Data Selection
    * via Importance Resampling recipe, Xie et al. 2023): select the
    * corpus subset that looks most like a TARGET domain by scoring
    * every document's hashed-n-gram likelihood ratio between a target
    * feature distribution and the corpus feature distribution, then
    * keeping the top fraction. This is the standard way a pretraining
    * pipeline tilts a web-scale corpus toward a curated domain
    * (Wikipedia+books in the paper; here the [[DSIR_TARGET]] sources)
    * without training a classifier.
    *
    * Engine recipe, exact end to end:
    * - features: whitespace tokens ([[TextOps.toks]], the C1-C6
    *   convention) hashed into [[DSIR_B]] buckets by the md5-substring
    *   convention D12 uses (both engines compute the identical md5 hex,
    *   so buckets agree by construction);
    * - per-bucket weight: the add-one-smoothed log likelihood ratio
    *   log2((cnt_t+1)/(ttot+B) / ((cnt_c+1)/(ctot+B))) in Q16 fixed
    *   point via the [[graft.functions.FixedLog]] integer recipe —
    *   signed by flipping num/den through GREATEST/LEAST (the kernel
    *   contract needs num ≥ den; log2(a/b) = −log2(b/a) is DEFINED
    *   into the score, deterministic on both sides). Counts ride as
    *   64-bit products; the documented bound is tokens-per-side
    *   < 2³¹ (pre-scale both counts by 2^k above that — same recipe,
    *   same bits);
    * - per-doc weight: Σ_buckets c_doc(b)·s(b) — a broadcast join
    *   against the ≤ B-row score table, map-side;
    * - selection: keep the top [[DSIR_KEEP_PCT]]% by weight through
    *   the F7/C20 boundary-bucket histogram (bin = floor(w/2¹⁶), the
    *   integer bits of the log-weight; all-or-nothing at bin
    *   granularity ≈ 1 bit of log-ratio) — NO corpus sort.
    *
    * Scale shape: corpus text is tokenized ONCE; the only corpus-sized
    * shuffles carry id-width (doc_id, bucket, count) rows; the bucket
    * table (≤ B rows), totals (1 row), score table (≤ B rows),
    * histogram (≤ a few thousand bins) and threshold (1 row) all
    * broadcast. At 100 TB this is two scans' worth of work regardless
    * of target size — the target distribution is O(B) state, not a
    * model.
    */
  /** G21's body over an explicit (doc_id, source, text) frame — the
    * holdoutAssign-style seam, so the spec can plant a corpus with a
    * distinctive target vocabulary.
    */
  /** A token's hashed DSIR feature bucket — the md5-substring
    * convention (D12's), shared verbatim by the batch selector and the
    * streaming gate ([[graft.streaming.DocIngest.dsirGate]]) so an
    * edge-priced document lands in the same buckets the policy was
    * trained on.
    */
  private[graft] def dsirBucket(t: Column): Column =
    pmod(conv(substring(md5(t), 1, 8), 16, 10).cast(LongType),
      lit(DSIR_B.toLong))

  private[graft] def dsirSelect(input: DataFrame): DataFrame = {
      val (_, _, wts, th) = dsirFrames(input)
      wts.crossJoin(broadcast(th))
        .select(col("doc_id"), col("is_target"), col("w_q16"), col("bin"),
          (col("bin") > col("t")).as("kept"))
        .orderBy(col("doc_id"))
  }

  /** G21's internal frames — (sc: per-bucket signed scores,
    * tots: 1-row corpus/target token totals, wts: per-doc weights,
    * th: 1-row bin threshold) — shared by the batch selector and
    * [[dsirPolicy]].
    */
  private def dsirFrames(
      input: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
      val docs = input.transform(graft.Tables.spreadBy(col("doc_id")))
      val tok = docs
        .select(col("doc_id"),
          col("source").isin(DSIR_TARGET.map(x => x: Any): _*).as("is_t"),
          explode(TextOps.toks(col("text"))).as("tok"))
        .select(col("doc_id"), col("is_t"), dsirBucket(col("tok")).as("bucket"))
      // per-doc bucket counts: the one corpus-sized aggregate (id-width
      // keys); feeds BOTH the corpus/target totals and the doc weights
      val db = Caches.persist(tok
        .groupBy(col("doc_id"), col("is_t"), col("bucket"))
        .agg(count(lit(1)).as("c")))
      val bt = db.groupBy(col("bucket"))
        .agg(sum(col("c")).as("cnt_c"),
          coalesce(sum(when(col("is_t"), col("c"))), lit(0L)).as("cnt_t"))
      // exact-arithmetic bound made a RUNTIME check (r16, the r15
      // advisory): (cnt+1)·(tot+B) must fit int64, i.e. tokens-per-side
      // < 2³¹ — beyond it the products would silently overflow into
      // wrong importance weights. ttot ≤ ctot by construction (the
      // target is a corpus subset), so guarding ctot covers both; the
      // documented escape is pre-scaling both counts by 2^k.
      val tots = bt.agg(sum(col("cnt_c")).as("ctot"),
        sum(col("cnt_t")).as("ttot"))
        .select(
          when(col("ctot") + lit(DSIR_B.toLong) >= lit(1L << 31),
            raise_error(concat(
              lit("sample_dsir: corpus token total "), col("ctot"),
              lit(" exceeds the 2^31 exact-arithmetic bound - " +
                "pre-scale bucket counts by 2^k (see scaladoc)"))))
            .otherwise(col("ctot")).as("ctot"),
          col("ttot"))
      val sc = bt.crossJoin(broadcast(tots))
        .select(col("bucket"),
          ((col("cnt_t") + lit(1L)) * (col("ctot") + lit(DSIR_B.toLong)))
            .as("num"),
          ((col("cnt_c") + lit(1L)) * (col("ttot") + lit(DSIR_B.toLong)))
            .as("den"))
        .select(col("bucket"),
          (when(col("num") >= col("den"), lit(1L)).otherwise(lit(-1L)) *
            graft.functions.FixedLog.bitsQ16(
              greatest(col("num"), col("den")),
              least(col("num"), col("den")))).as("s"))
      val wts = Caches.persist(db.join(broadcast(sc), "bucket")
        .groupBy(col("doc_id"))
        .agg(max(col("is_t")).as("is_target"),
          sum(col("c") * col("s")).as("w_q16"))
        .withColumn("bin",
          expr("(w_q16 - pmod(w_q16, 65536)) div 65536")))
      val hist = wts.groupBy(col("bin")).agg(count(lit(1)).as("mass"))
      // bounded global window: ≤ a few thousand log-weight bins
      val wb = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumh = hist.withColumn("cum", sum(col("mass")).over(wb))
      val tot = hist.agg(sum(col("mass")).as("total"))
      val th = cumh.crossJoin(broadcast(tot))
        .agg(min(when(
          col("cum") * 100 >= col("total") * (100 - DSIR_KEEP_PCT),
          col("bin"))).as("t"))
      (sc, tots, wts, th)
  }

  /** Freeze a batch G21 run into the edge-deployable POLICY: the dense
    * [[DSIR_B]]-long per-bucket score array (buckets no corpus token
    * ever hashed to — which a NOVEL streaming token can still hit —
    * fill with the smoothing PRIOR score, the same signed-Q16 recipe at
    * cnt_t = cnt_c = 0, computed through the engine kernel so the fill
    * is bit-identical to what the batch would have scored) and the bin
    * threshold. O(B) state: this is what rides into
    * [[graft.streaming.DocIngest.dsirGate]] as a literal — importance
    * weights retrain offline, the edge only prices.
    */
  private[graft] def dsirPolicy(input: DataFrame): (Array[Long], Long) = {
    val (sc, tots, _, th) = dsirFrames(input)
    val prior = tots
      .select(
        ((lit(1L)) * (col("ctot") + lit(DSIR_B.toLong))).as("num"),
        ((lit(1L)) * (col("ttot") + lit(DSIR_B.toLong))).as("den"))
      .select(
        (when(col("num") >= col("den"), lit(1L)).otherwise(lit(-1L)) *
          graft.functions.FixedLog.bitsQ16(
            greatest(col("num"), col("den")),
            least(col("num"), col("den")))).as("s"))
      .collect().head.getLong(0)
    val arr = Array.fill(DSIR_B)(prior)
    sc.collect().foreach { r =>
      arr(r.getAs[Long]("bucket").toInt) = r.getAs[Long]("s")
    }
    (arr, th.collect().head.getAs[Long]("t"))
  }

  val sampleDsir: Op = Op(
    "sample_dsir",
    (s, d) => dsirSelect(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        col("text"))),
    Some(s"""
      WITH toksrc AS (
        SELECT doc_id,
               source IN (${DSIR_TARGET.map(t => s"'$t'").mkString(",")})
                 AS is_t,
               unnest(regexp_split_to_array(trim(lower(text), ' '), '\\s+'))
                 AS tok
        FROM documents),
      db AS (
        SELECT doc_id, is_t,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % $DSIR_B
                 AS bucket,
               CAST(count(*) AS BIGINT) AS c
        FROM toksrc GROUP BY 1, 2, 3),
      bt AS (
        SELECT bucket, CAST(sum(c) AS BIGINT) AS cnt_c,
               CAST(coalesce(sum(CASE WHEN is_t THEN c END), 0) AS BIGINT)
                 AS cnt_t
        FROM db GROUP BY bucket),
      tots AS (SELECT CAST(sum(cnt_c) AS BIGINT) AS ctot,
                      CAST(sum(cnt_t) AS BIGINT) AS ttot FROM bt),
      btx AS (
        SELECT bucket, CASE WHEN num >= den THEN 1 ELSE -1 END AS sgn,
               GREATEST(num, den) AS gnum, LEAST(num, den) AS gden
        FROM (SELECT bucket, (cnt_t + 1) * (ctot + $DSIR_B) AS num,
                     (cnt_c + 1) * (ttot + $DSIR_B) AS den
              FROM bt, tots) x),
      ${graft.functions.FixedLog.sqlRounds(
        "btx", Seq("bucket", "sgn"), "gnum", "gden", "bsc")},
      sc AS (SELECT bucket, CAST(sgn * bits_q16 AS BIGINT) AS s FROM bsc),
      wb AS (
        SELECT doc_id, is_target, w_q16,
               CAST((w_q16 - ((w_q16 % 65536 + 65536) % 65536)) // 65536
                 AS BIGINT) AS bin
        FROM (SELECT db.doc_id, max(db.is_t) AS is_target,
                     CAST(sum(db.c * sc.s) AS BIGINT) AS w_q16
              FROM db JOIN sc USING (bucket) GROUP BY db.doc_id) dw),
      hist AS (SELECT bin, CAST(count(*) AS BIGINT) AS mass
               FROM wb GROUP BY bin),
      cumh AS (SELECT bin,
                      CAST(sum(mass) OVER (ORDER BY bin) AS BIGINT) AS cum
               FROM hist),
      tot AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM hist),
      th AS (SELECT min(CASE WHEN cum * 100 >= total * ${100 - DSIR_KEEP_PCT}
                             THEN bin END) AS t
             FROM cumh, tot)
      SELECT w.doc_id, w.is_target, w.w_q16, w.bin, w.bin > th.t AS kept
      FROM wb w, th
      ORDER BY w.doc_id"""))

  /** G26 — SEMANTIC packing: the G9 manifest arithmetic laid out
    * per-CLUSTER instead of in global doc_id order — related documents
    * (same trained-[[CentroidIndex]] cell, the D11/E14/G25 notion of
    * "related") land in the same training sequences, the In-Context
    * Pretraining recipe (Shi et al. 2023: packing semantically related
    * docs into one context window instead of random concatenation).
    * Each cell packs its own independent sequence stream in
    * deterministic doc_id order; a sequence is addressed (cell,
    * seq_idx). Only documents WITH an embedding pack (inner join on
    * doc_id = vec_id — the embedded-corpus contract D11 documents).
    *
    * Scale shape: the G9 prefix-sum discipline with the cluster as a
    * free extra partition key — per-(cell, block) token sums, block
    * bases from a window over ≤ cellsize/block rows PER CELL (the
    * global stream's superblock level is unnecessary: the cell key
    * already partitions the base window, so no unpartitioned window
    * anywhere), intra-block running totals over ≤ block rows. Cell
    * assignment is the map-side cell_argmax kernel over the broadcast
    * packed centroids; corpus text never shuffles (token counts ride
    * id-width rows).
    */
  /** G26's body at an explicit cell count — the GeometryCheck seam. */
  private[graft] def packSemanticAt(
      s: SparkSession, d: String, cells: Int): DataFrame = {
      val cent = CentroidIndex.forCorpus(s, d, cells)
      val assign = AnnOps.withNorm(s, d)
        .crossJoin(broadcast(AnnOps.packedCents(cent)))
        .select(col("vec_id"), AnnOps.cellCol.as("cell"))
      val counts = Tables.documents(s, d)
        .select(col("doc_id"),
          // +1 = EOS, the G9 convention
          (size(split(trim(lower(col("text"))), "\\s+")) + 1)
            .cast(LongType).as("nt"))
      val docs = Caches.persist(counts
        .join(assign, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("cell"), col("nt"),
          expr(s"doc_id div $PACK_BLOCK").as("blk")))
      val blockSums = docs.groupBy(col("cell"), col("blk"))
        .agg(sum(col("nt")).as("bsum"))
      val wBlocks = Window.partitionBy(col("cell")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val blockBases = blockSums
        .withColumn("block_base",
          sum(col("bsum")).over(wBlocks) - col("bsum"))
        .select(col("cell"), col("blk"), col("block_base"))
      val wIntra = Window.partitionBy(col("cell"), col("blk"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(blockBases), Seq("cell", "blk"))
        .withColumn("start",
          col("block_base") + sum(col("nt")).over(wIntra) - col("nt"))
        .select(col("doc_id"), col("cell"), (col("nt") - 1).as("n_tokens"),
          expr(s"start div $SEQ_TOKENS").as("seq_idx"),
          (col("start") % SEQ_TOKENS).as("offset_in_seq"),
          (expr(s"(start + nt - 1) div $SEQ_TOKENS")
            - expr(s"start div $SEQ_TOKENS") + 1L).as("n_seqs_spanned"),
          (expr(s"(start + nt - 1) div $SEQ_TOKENS")
            =!= expr(s"start div $SEQ_TOKENS")).as("is_split"))
        .orderBy(col("doc_id"))
  }

  /** G26's DuckDB twin at an arbitrary cell count (board oracle at the
    * pinned 16 cells; GeometryCheck replays at the corpus-derived
    * count).
    */
  private[graft] def sqlPackSemanticAt(cells: Int): String = s"""
      WITH ${AnnOps.sqlNormCte},
      ${AnnOps.sqlIvfTrainCtes(cells, AnnOps.IVF_ROUNDS)},
      ${AnnOps.sqlIvfAssignAggCte(AnnOps.IVF_ROUNDS)},
      dn AS (
        SELECT d.doc_id, a.cell,
               CAST(len(regexp_split_to_array(trim(lower(d.text), ' '),
                 '\\s+')) + 1 AS BIGINT) AS nt
        FROM documents d JOIN assign a ON a.vec_id = d.doc_id),
      cc AS (
        SELECT doc_id, cell, nt,
               CAST(sum(nt) OVER (PARTITION BY cell ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM dn)
      SELECT doc_id, cell, nt - 1 AS n_tokens,
             (cum - nt) // $SEQ_TOKENS AS seq_idx,
             (cum - nt) % $SEQ_TOKENS AS offset_in_seq,
             (cum - 1) // $SEQ_TOKENS - (cum - nt) // $SEQ_TOKENS + 1
               AS n_seqs_spanned,
             (cum - 1) // $SEQ_TOKENS != (cum - nt) // $SEQ_TOKENS
               AS is_split
      FROM cc
      ORDER BY doc_id"""

  val docPackSemantic: Op = Op(
    "doc_pack_semantic",
    (s, d) => {
      val cells = AnnOps.ivfCellsFor(Tables.embeddings(s, d).count())
      AnnOps.logGeometryDivergence("doc_pack_semantic",
        s"$cells cells", s"${AnnOps.CENTROIDS} cells")
      packSemanticAt(s, d, cells)
    },
    Some(sqlPackSemanticAt(AnnOps.CENTROIDS)))

  /** G25's dials: the kept corpus fraction and the histogram bin width
    * in cosine micros (~0.008 cosine per bin — the all-or-nothing
    * selection granularity, the G21 convention).
    */
  private[graft] val PROTO_KEEP_PCT = 25
  private val PROTO_BIN = 8192L

  /** G25 — prototype-based data pruning (the SSL-prototypes metric of
    * Sorscher et al. 2022, "Beyond neural scaling laws": example
    * difficulty = cosine to the nearest k-means prototype; with
    * abundant data, PRUNE the easy examples — those closest to their
    * cluster centroid — and keep the hard ones). D11 (SemDeDup) drops
    * pairwise near-duplicates within a cell; this op ranks EVERY vector
    * by prototypicality and keeps the [[PROTO_KEEP_PCT]]% hardest, the
    * companion pass the paper composes after dedup. Centroids are the
    * per-corpus trained [[CentroidIndex]] artifact — the same cells
    * ann_ivf/D11/E14 score against, so "prototype" means one thing
    * across the whole engine.
    *
    * Scale shape: assignment is the map-side cell_argmax kernel over
    * the broadcast packed centroids (no corpus×cells stream, no
    * shuffle); the winning cell's cosine re-attaches with ONE broadcast
    * join against the cells-row centroid frame; selection is the
    * G21/F7 boundary-free bin histogram (threshold = first bin whose
    * ascending cumulative mass clears the keep target; all-or-nothing
    * at [[PROTO_BIN]]-micro granularity) — no corpus sort, and the only
    * corpus-sized exchange is the id-width histogram aggregate's
    * partials.
    */
  /** G25's body at an explicit cell count — the GeometryCheck seam. */
  private[graft] def prototypesAt(
      s: SparkSession, d: String, cells: Int): DataFrame = {
    val e = AnnOps.withNorm(s, d)
    val cent = CentroidIndex.forCorpus(s, d, cells)
    val assign = e.crossJoin(broadcast(AnnOps.packedCents(cent)))
      .select(col("vec_id"), col("embedding"), col("nm"),
        AnnOps.cellCol.as("cell"))
    // wts persists: it feeds the bin histogram AND the verdict join
    val wts = Caches.persist(assign
      .join(broadcast(cent), col("cell") === col("c_id"))
      .select(col("vec_id"), col("cell"),
        cosineFromMicros(dotMicros(col("embedding"), col("c_emb")),
          col("nm"), col("c_nm")).as("pcos"))
      .withColumn("wv", -floor(col("pcos") * lit(1e6)))
      .withColumn("bin",
        expr(s"(wv - pmod(wv, $PROTO_BIN)) div $PROTO_BIN")))
    val hist = wts.groupBy(col("bin")).agg(count(lit(1)).as("mass"))
    // bounded global window: ≤ 2e6/PROTO_BIN ≈ 245 cosine bins
    val wb = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumh = hist.withColumn("cum", sum(col("mass")).over(wb))
    val tot = hist.agg(sum(col("mass")).as("total"))
    val th = cumh.crossJoin(broadcast(tot))
      .agg(min(when(
        col("cum") * 100 >= col("total") * (100 - PROTO_KEEP_PCT),
        col("bin"))).as("t"))
    wts.crossJoin(broadcast(th))
      .select(col("vec_id"), col("cell"), col("pcos"), col("bin"),
        (col("bin") > col("t")).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** G25's DuckDB twin at an arbitrary cell count (the board oracle is
    * this at the pinned 16-cell geometry; GeometryCheck replays it at
    * the corpus-derived cells above gate scale).
    */
  private[graft] def sqlPrototypesAt(cells: Int): String = s"""
      WITH ${AnnOps.sqlNormCte},
      ${AnnOps.sqlIvfTrainCtes(cells, AnnOps.IVF_ROUNDS)},
      ${AnnOps.sqlIvfAssignAggCte(AnnOps.IVF_ROUNDS)},
      pw AS (
        SELECT a.vec_id, a.cell, s.ccos AS pcos,
               -CAST(floor(s.ccos * 1000000) AS BIGINT) AS wv
        FROM assign a
        JOIN iscoreF s ON s.vec_id = a.vec_id AND s.c_id = a.cell),
      pb AS (SELECT vec_id, cell, pcos,
                    CAST((wv - ((wv % $PROTO_BIN + $PROTO_BIN) % $PROTO_BIN))
                      // $PROTO_BIN AS BIGINT) AS bin
             FROM pw),
      phist AS (SELECT bin, CAST(count(*) AS BIGINT) AS mass
                FROM pb GROUP BY bin),
      pcum AS (SELECT bin,
                      CAST(sum(mass) OVER (ORDER BY bin) AS BIGINT) AS cum
               FROM phist),
      ptot AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM phist),
      pth AS (SELECT min(CASE WHEN cum * 100 >= total * ${100 - PROTO_KEEP_PCT}
                              THEN bin END) AS t
              FROM pcum, ptot)
      SELECT b.vec_id, b.cell, b.pcos, b.bin, b.bin > pth.t AS kept
      FROM pb b, pth
      ORDER BY b.vec_id"""

  val samplePrototypes: Op = Op(
    "sample_prototypes",
    (s, d) => {
      val cells = AnnOps.ivfCellsFor(Tables.embeddings(s, d).count())
      AnnOps.logGeometryDivergence("sample_prototypes",
        s"$cells cells", s"${AnnOps.CENTROIDS} cells")
      prototypesAt(s, d, cells)
    },
    Some(sqlPrototypesAt(AnnOps.CENTROIDS)))

  /** G27's dials: the assembled dataset's token budget as a percentage
    * of the corpus token mass, and the score-micros histogram bin width
    * (~0.004 score per bin — the all-or-nothing selection granularity,
    * the G21/G25 convention).
    */
  private[graft] val BUDGET_PCT = 40
  private val BUDGET_BIN = 4096L

  /** G27 — TOKEN-BUDGET dataset assembly: keep the highest-quality
    * documents whose cumulative token mass first clears a target budget
    * (here [[BUDGET_PCT]]% of the corpus token mass) — the "assemble
    * the best B tokens" selection every budgeted pretraining run ends
    * with (the FineWeb-Edu deployment shape: score with the learned
    * quality classifier, then take the top of the score distribution
    * until the token target is met). Scores are the per-corpus trained
    * [[QualityIndex]] artifact — the same model C18/D16/G12b consume,
    * never retrained here.
    *
    * Scale shape: the G25 histogram gate with TOKEN-WEIGHTED mass — the
    * row-count histograms answer "keep k documents", a budget is a
    * token constraint, so each score bin aggregates Σ n_tokens instead
    * of a row count. Still no corpus sort anywhere: one map-side score
    * + token-count projection, one ≤ ~245-bin histogram aggregate, a
    * broadcast 1-row threshold, and the verdict join. kept is
    * all-or-nothing at [[BUDGET_BIN]]-micro granularity — the kept mass
    * overshoots the budget by less than one bin's mass (the first bin
    * CLEARING the target is included, so the budget is a floor, never
    * silently under-filled).
    */
  val sampleBudget: Op = Op(
    "sample_budget",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // base persists: it feeds the bin histogram AND the verdict join.
      // r20: n_tokens is a scoreWith pass-through — the former second
      // documents scan + doc_id shuffle join is gone (guide §2.4)
      val base = Caches.persist(QualityIndex
        .scoreWith(docs, QualityIndex.forCorpus(s, d),
          Seq("n_tokens" -> size(TextOps.toks(col("text"))).cast(LongType)))
        .select(col("doc_id"), col("n_tokens"), col("score_micros"))
        .withColumn("wv", -col("score_micros"))
        .withColumn("bin",
          expr(s"(wv - pmod(wv, $BUDGET_BIN)) div $BUDGET_BIN")))
      val hist = base.groupBy(col("bin"))
        .agg(sum(col("n_tokens")).as("mass"))
      // bounded global window: ≤ 2e6/BUDGET_BIN ≈ 489 score bins
      val wb = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumh = hist.withColumn("cum", sum(col("mass")).over(wb))
      val tot = hist.agg(sum(col("mass")).as("total"))
      val th = cumh.crossJoin(broadcast(tot))
        .agg(min(when(
          col("cum") * 100 >= col("total") * BUDGET_PCT,
          col("bin"))).as("t"))
      base.crossJoin(broadcast(th))
        .select(col("doc_id"), col("n_tokens"), col("score_micros"),
          col("bin"), (col("bin") <= col("t")).as("kept"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${TextOps.sqlQualityCtes},
      bq AS (
        SELECT d.doc_id,
               CAST(len(regexp_split_to_array(trim(lower(d.text), ' '),
                 '\\s+')) AS BIGINT) AS n_tokens,
               p.p AS score_micros
        FROM documents d
        JOIN ${TextOps.sqlQualityScoreTable} p ON d.doc_id = p.doc_id),
      bb AS (SELECT doc_id, n_tokens, score_micros,
                    CAST((wv - ((wv % $BUDGET_BIN + $BUDGET_BIN)
                      % $BUDGET_BIN)) // $BUDGET_BIN AS BIGINT) AS bin
             FROM (SELECT bq.*, -score_micros AS wv FROM bq) t),
      bh AS (SELECT bin, CAST(sum(n_tokens) AS BIGINT) AS mass
             FROM bb GROUP BY bin),
      bc AS (SELECT bin, CAST(sum(mass) OVER (ORDER BY bin) AS BIGINT) AS cum
             FROM bh),
      bt AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM bh),
      bth AS (SELECT min(CASE WHEN cum * 100 >= total * $BUDGET_PCT
                              THEN bin END) AS t
              FROM bc, bt)
      SELECT b.doc_id, b.n_tokens, b.score_micros, b.bin,
             b.bin <= bth.t AS kept
      FROM bb b, bth
      ORDER BY b.doc_id"""))

  /** G11 — per-domain frequency capping: keep at most ceil(√n_s)
    * documents from each source s, chosen by a deterministic hash
    * priority — the RefinedWeb/FineWeb-style guard against any single
    * domain (SEO farms, mirror sites, boilerplate-heavy hosts)
    * dominating the training mixture, with the square-root schedule
    * that keeps large domains represented sub-linearly instead of
    * cutting a hard constant.
    *
    * Scale shape: NO per-source window over the corpus (rank-by-window
    * exchanges-and-sorts every row, and web domains are maximally
    * Zipf-skewed). Instead the per-source SELECTION THRESHOLD is
    * computed: a bounded-heap [[graft.functions.TopKMinAgg topk_min]]
    * collects each source's cap-smallest (hash, doc_id) priorities —
    * map-side partials carry ≤ maxCap rows per source — and a document
    * is kept iff its priority struct is ≤ the cap-th smallest
    * (lexicographic struct compare, identical in both engines). The
    * heap width is the one corpus-derived dial (max cap = ceil(√ of
    * the largest domain), the same count-then-plan shape as the D5/E2
    * geometry dials); the domain-stats frame is |domains|-sized and
    * joins back by source (AQE broadcasts it when small). Verdict ≡
    * rank ≤ cap, proven by the oracle's row_number formulation.
    */
  val sampleDomainCap: Op = Op(
    "sample_domain_cap",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
      val caps = Caches.persist(docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_source"))
        .select(col("source"), col("n_source"),
          ceil(sqrt(col("n_source").cast("double"))).cast(LongType)
            .as("cap")))
      // the heap-width dial: one |domains|-row aggregate, collected
      // like the geometry dials (caps is persisted — this is its
      // materializing action, the threshold + verdict joins reuse it)
      // coalesce(1): an empty survivor set yields a null max — the heap
      // width must still be a valid literal (every frame downstream is
      // empty anyway, so the value is inert)
      val maxCap = caps.agg(coalesce(max(col("cap")), lit(1L)))
        .collect()(0).getLong(0).toInt
      val pri = docs.select(col("source"),
        struct(hash60(concat(col("source"), lit("|"), col("doc_id")))
          .as("h"), col("doc_id")).as("p"))
      val th = pri.groupBy(col("source"))
        .agg(topkMin(col("p"), maxCap).as("tops"))
        .join(caps, "source")
        .select(col("source"), element_at(col("tops"), col("cap").cast("int"))
          .as("th"))
      docs.join(caps, "source").join(th, "source")
        .select(col("doc_id"), col("source"), col("n_source"), col("cap"),
          (struct(hash60(concat(col("source"), lit("|"), col("doc_id")))
            .as("h"), col("doc_id")) <= col("th")).as("kept"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH c AS (SELECT source, count(*) AS n_source,
                        CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
                          AS cap
                 FROM documents GROUP BY source),
      r AS (SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                     ORDER BY ${graft.Op.xhash60(
                       "concat(source, '|', doc_id)")}, doc_id) AS rn
            FROM documents)
      SELECT r.doc_id, r.source, c.n_source, c.cap, r.rn <= c.cap AS kept
      FROM r JOIN c USING (source)
      ORDER BY r.doc_id"""))

  /** G12 — the CURATION FUNNEL report: one row per pipeline stage
    * (raw → G4 quality gate → D1 exact dedup → G11 domain caps) with
    * docs in/out and surviving token mass — the attrition audit every
    * curation run publishes, composed from the SAME stage definitions
    * the standalone ops check (g4Verdict, the normText fingerprint
    * min-id survivor rule, the √n cap with hash priority), so the
    * funnel can never drift from its parts.
    *
    * Scale shape: ONE corpus scan projects everything downstream needs
    * (verdict, fingerprint, token count — persisted, four consumers);
    * exact dedup is the D1 min_by aggregate (never a window); domain
    * caps run the G11 bounded-heap threshold on the survivor set; the
    * four stage aggregates are 1-row frames stitched by broadcast cross
    * joins (the dedup_report precedent).
    */
  /** G12's funnel body over a prepared base frame (doc_id, source, nt,
    * kept_q, fp, ...) and a pluggable exact-dedup SURVIVOR rule — the
    * seam G12b swaps the quality-aware rule through without duplicating
    * the funnel arithmetic.
    */
  private def curationFunnel(
      base: DataFrame,
      survivor: DataFrame => DataFrame,
      stage3: String = "3_exact_dedup"): DataFrame = {
      val q = base.filter(col("kept_q"))
      val dd = Caches.persist(survivor(q))
      val caps = Caches.persist(dd.groupBy(col("source"))
        .agg(count(lit(1)).as("n_source"))
        .select(col("source"),
          ceil(sqrt(col("n_source").cast("double"))).cast(LongType)
            .as("cap")))
      // coalesce(1): an empty survivor set yields a null max — the heap
      // width must still be a valid literal (every frame downstream is
      // empty anyway, so the value is inert)
      val maxCap = caps.agg(coalesce(max(col("cap")), lit(1L)))
        .collect()(0).getLong(0).toInt
      def pri = struct(
        hash60(concat(col("source"), lit("|"), col("doc_id"))).as("h"),
        col("doc_id"))
      val th = dd.select(col("source"), pri.as("p"))
        .groupBy(col("source"))
        .agg(topkMin(col("p"), maxCap).as("tops"))
        .join(caps, "source")
        .select(col("source"),
          element_at(col("tops"), col("cap").cast("int")).as("th"))
      // r20 (guide §1.2/§2.4): the four stage aggregates collapse to
      // TWO single-pass aggregates — stages 1+2 are conditional
      // aggregates over ONE base pass (q = base WHERE kept_q, so
      // count/sum over q ≡ count/sum of the kept_q rows), and stages
      // 3+4 over ONE dd⋈th pass (kept = dd rows with pri <= th; th is
      // per-source and source-total on dd's sources, so the inner join
      // preserves every dd row). The 4 one-row frames then stitch via
      // one explode instead of a 4-branch union that re-planned each
      // aggregate subtree.
      val a01 = base.agg(
        count(lit(1)).as("n0"), sum(col("nt")).as("t0"),
        count(when(col("kept_q"), lit(1))).as("n1"),
        sum(when(col("kept_q"), col("nt"))).as("t1"))
      val a23 = dd.join(broadcast(th), "source").agg(
        count(lit(1)).as("n2"), sum(col("nt")).as("t2"),
        count(when(pri <= col("th"), lit(1))).as("n3"),
        sum(when(pri <= col("th"), col("nt"))).as("t3"))
      def stageRow(stage: Column, in: Column, out: Column, tok: Column) =
        struct(stage.as("stage"), in.as("docs_in"), out.as("docs_out"),
          tok.as("tokens_out"))
      a01.crossJoin(broadcast(a23))
        .select(explode(array(
          stageRow(lit("1_raw"), col("n0"), col("n0"), col("t0")),
          stageRow(lit("2_quality"), col("n0"), col("n1"), col("t1")),
          stageRow(lit(stage3), col("n1"), col("n2"), col("t2")),
          stageRow(lit("4_domain_cap"), col("n2"), col("n3"), col("t3"))))
          .as("r"))
        .select(col("r.stage").as("stage"), col("r.docs_in").as("docs_in"),
          col("r.docs_out").as("docs_out"),
          col("r.tokens_out").as("tokens_out"))
        .orderBy(col("stage"))
  }

  /** The shared base projection of the G12 funnel — one corpus scan
    * with everything downstream needs.
    */
  private def curationBase(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokens(lower(col("text")))).cast(LongType).as("nt"),
        (g4Verdict(col("text")) === "keep").as("kept_q"),
        hash60(normText(col("text"))).as("fp"))

  val curationReport: Op = Op(
    "curation_report",
    (s, d) => curationFunnel(
      Caches.persist(curationBase(s, d)),
      q => q.groupBy(col("fp"))
        .agg(min_by(struct(col("doc_id"), col("source"), col("nt")),
          col("doc_id")).as("s"))
        .select(col("s.doc_id").as("doc_id"), col("s.source").as("source"),
          col("s.nt").as("nt"))),
    Some(s"""
      WITH base AS MATERIALIZED (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(lower(text), ' '),
                 '\\s+')) AS BIGINT) AS nt,
               ${sqlG4Verdict("text")} = 'keep' AS kept_q,
               ${graft.Op.xhash60(
                 "lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '))")}
                 AS fp
        FROM documents),
      q AS (SELECT * FROM base WHERE kept_q),
      dd AS MATERIALIZED (
        SELECT doc_id, source, nt FROM (
          SELECT q.*, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
            AS rn FROM q) x
        WHERE rn = 1),
      caps AS (SELECT source,
                      CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
                        AS cap
               FROM dd GROUP BY source),
      rk AS (SELECT dd.*,
                    row_number() OVER (PARTITION BY source
                      ORDER BY ${graft.Op.xhash60(
                        "concat(source, '|', doc_id)")}, doc_id) AS rn
             FROM dd),
      kept AS (SELECT rk.doc_id, rk.source, rk.nt
               FROM rk JOIN caps USING (source) WHERE rn <= cap),
      a0 AS (SELECT count(*) AS n0, CAST(sum(nt) AS BIGINT) AS t0 FROM base),
      a1 AS (SELECT count(*) AS n1, CAST(sum(nt) AS BIGINT) AS t1 FROM q),
      a2 AS (SELECT count(*) AS n2, CAST(sum(nt) AS BIGINT) AS t2 FROM dd),
      a3 AS (SELECT count(*) AS n3, CAST(sum(nt) AS BIGINT) AS t3 FROM kept)
      SELECT stage, docs_in, docs_out, tokens_out FROM (
        SELECT '1_raw' AS stage, n0 AS docs_in, n0 AS docs_out,
               t0 AS tokens_out FROM a0
        UNION ALL SELECT '2_quality', n0, n1, t1 FROM a0, a1
        UNION ALL SELECT '3_exact_dedup', n1, n2, t2 FROM a1, a2
        UNION ALL SELECT '4_domain_cap', n2, n3, t3 FROM a2, a3) t
      ORDER BY stage"""))

  /** G12b — the funnel with the QUALITY-AWARE NEAR-dup dedup stage: the
    * D16 survivor rule wired into the stage pipeline. An exact-dedup
    * quality rule would be provably inert — same normalized-text
    * fingerprint means the same lowercased token sequence, hence the
    * same C18 features and score, so the argmax always ties back to the
    * min doc_id. Near-dup CLUSTERS are where copies genuinely differ
    * (truncations, appended boilerplate, dialect edits), so stage 3
    * here clusters the quality survivors with D3/D6's MinHash-LSH
    * pipeline and keeps each cluster's argmax-C18-score member (ties →
    * min doc_id; unclustered docs survive trivially) — dedup is the
    * moment the pipeline chooses which copy it trains on, and the
    * surviving member's token mass and source flow into stages 3 and 4,
    * so the funnels diverge wherever a cluster spans quality levels.
    *
    * Composition is drift-free by construction: pairs + components are
    * [[DedupOps.minhashPairs]]∘[[DedupOps.clusterPairs]] (D6's bodies)
    * restricted to the stage input, the scores are
    * [[QualityIndex.score]] under the corpus' one trained model
    * ([[QualityIndex.forCorpus]] — C18's artifact), and the survivor rule is D16's
    * max_by struct. Scale shape: the cluster side inherits D3's banded
    * occupancy-capped candidates; the survivor selection is an
    * id-width max_by aggregate per cluster, never a window.
    */
  val curationReportQuality: Op = Op(
    "curation_report_quality",
    (s, d) => {
      // r20: the funnel columns (source, nt, kept_q) are scoreWith
      // pass-throughs computed in the SAME scan as the quality score —
      // the former separate curationBase scan + doc_id shuffle join is
      // gone (guide §2.4; fp was never consumed by the quality funnel)
      val base = QualityIndex
        .scoreWith(Tables.documents(s, d), QualityIndex.forCorpus(s, d),
          Seq("source" -> col("source"),
            "nt" -> size(tokens(lower(col("text")))).cast(LongType).as("nt"),
            "kept_q" -> (g4Verdict(col("text")) === "keep")))
        .select(col("doc_id"), col("source"), col("nt"), col("kept_q"),
          col("score_micros"))
      curationFunnel(
        Caches.persist(base),
        q => {
          val qq = Caches.persist(q)
          val pairsQ = DedupOps.minhashPairs(s, d).select(col("i"), col("j"))
            .join(qq.select(col("doc_id").as("i")), Seq("i"), "left_semi")
            .join(qq.select(col("doc_id").as("j")), Seq("j"), "left_semi")
          val clusters = DedupOps.clusterPairs(
            graft.Checkpoints.checkpoint(pairsQ))
          val keep = clusters.join(qq, "doc_id")
            .groupBy(col("cluster_id"))
            .agg(max_by(struct(col("doc_id"), col("source"), col("nt")),
              struct(col("score_micros"), (-col("doc_id")).as("nd")))
              .as("s"))
            .select(col("s.doc_id").as("doc_id"),
              col("s.source").as("source"), col("s.nt").as("nt"))
          qq.join(clusters, Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("source"), col("nt"))
            .unionAll(keep)
        },
        stage3 = "3_near_dedup")
    },
    Some(s"""
      WITH RECURSIVE ${DedupOps.sqlMinhashPairsCtes},
      ${TextOps.sqlQualityCtes},
      base AS MATERIALIZED (
        SELECT d.doc_id, d.source,
               CAST(len(regexp_split_to_array(trim(lower(d.text), ' '),
                 '\\s+')) AS BIGINT) AS nt,
               ${sqlG4Verdict("d.text")} = 'keep' AS kept_q,
               p.p AS score
        FROM documents d
        JOIN ${TextOps.sqlQualityScoreTable} p ON d.doc_id = p.doc_id),
      q AS (SELECT * FROM base WHERE kept_q),
      pq AS (SELECT i, j FROM mh_pairs
             WHERE i IN (SELECT doc_id FROM q)
               AND j IN (SELECT doc_id FROM q)),
      und AS (SELECT i AS src, j AS dst FROM pq
              UNION ALL SELECT j, i FROM pq),
      reach(v, r) AS (
        SELECT src, dst FROM und
        UNION
        SELECT w.v, u.dst FROM reach w JOIN und u ON w.r = u.src),
      cl AS (SELECT v AS doc_id, least(v, min(r)) AS cluster_id
             FROM reach GROUP BY v),
      mem AS (SELECT cl.cluster_id, q.doc_id, q.source, q.nt, q.score
              FROM cl JOIN q USING (doc_id)),
      keepc AS (SELECT doc_id, source, nt FROM (
                  SELECT mem.*, row_number() OVER (PARTITION BY cluster_id
                    ORDER BY score DESC, doc_id) AS rn FROM mem) x
                WHERE rn = 1),
      dd AS MATERIALIZED (
        SELECT doc_id, source, nt FROM q
        WHERE doc_id NOT IN (SELECT doc_id FROM cl)
        UNION ALL
        SELECT doc_id, source, nt FROM keepc),
      caps AS (SELECT source,
                      CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
                        AS cap
               FROM dd GROUP BY source),
      rk AS (SELECT dd.*,
                    row_number() OVER (PARTITION BY source
                      ORDER BY ${graft.Op.xhash60(
                        "concat(source, '|', doc_id)")}, doc_id) AS rn
             FROM dd),
      kept AS (SELECT rk.doc_id, rk.source, rk.nt
               FROM rk JOIN caps USING (source) WHERE rn <= cap),
      a0 AS (SELECT count(*) AS n0, CAST(sum(nt) AS BIGINT) AS t0 FROM base),
      a1 AS (SELECT count(*) AS n1, CAST(sum(nt) AS BIGINT) AS t1 FROM q),
      a2 AS (SELECT count(*) AS n2, CAST(sum(nt) AS BIGINT) AS t2 FROM dd),
      a3 AS (SELECT count(*) AS n3, CAST(sum(nt) AS BIGINT) AS t3 FROM kept)
      SELECT stage, docs_in, docs_out, tokens_out FROM (
        SELECT '1_raw' AS stage, n0 AS docs_in, n0 AS docs_out,
               t0 AS tokens_out FROM a0
        UNION ALL SELECT '2_quality', n0, n1, t1 FROM a0, a1
        UNION ALL SELECT '3_near_dedup', n1, n2, t2 FROM a1, a2
        UNION ALL SELECT '4_domain_cap', n2, n3, t3 FROM a2, a3) t
      ORDER BY stage"""))

  /** G19 — per-document FATE attribution through the curation funnel:
    * G12 reports the stages' aggregate attrition; this answers the
    * question an operator actually debugs with — "why did THIS document
    * drop?": each doc labeled with the FIRST stage that removed it
    * (2_quality, 3_exact_dedup, 4_domain_cap) or `kept`. Same stage
    * definitions as G12 (shared [[curationBase]]; min-id fingerprint
    * survivor; the G11 bounded-heap cap threshold, whose ≤-threshold
    * verdict ≡ rank ≤ cap — the sample_domain_cap proof), so fates
    * always reconcile with the funnel's counts.
    *
    * Scale shape: one persisted corpus projection; the dedup survivor
    * flag is a |fp-groups| aggregate joined back; the cap verdict joins
    * the |sources|-row threshold frame; fate is a codegen'd CASE — the
    * corpus text never shuffles, and every join key is id-width.
    */
  val curationFate: Op = Op(
    "curation_fate",
    (s, d) => {
      val base = Caches.persist(curationBase(s, d))
      val q = base.filter(col("kept_q"))
      val keepIds = q.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      val dd = Caches.persist(q.join(keepIds, "fp")
        .filter(col("doc_id") === col("keep_id"))
        .select(col("doc_id"), col("source"), col("nt")))
      val caps = Caches.persist(dd.groupBy(col("source"))
        .agg(count(lit(1)).as("n_source"))
        .select(col("source"),
          ceil(sqrt(col("n_source").cast("double"))).cast(LongType)
            .as("cap")))
      // coalesce(1): an empty survivor set yields a null max — the heap
      // width must still be a valid literal (every frame downstream is
      // empty anyway, so the value is inert)
      val maxCap = caps.agg(coalesce(max(col("cap")), lit(1L)))
        .collect()(0).getLong(0).toInt
      def pri = struct(
        hash60(concat(col("source"), lit("|"), col("doc_id"))).as("h"),
        col("doc_id"))
      val th = dd.select(col("source"), pri.as("p"))
        .groupBy(col("source"))
        .agg(topkMin(col("p"), maxCap).as("tops"))
        .join(caps, "source")
        .select(col("source"),
          element_at(col("tops"), col("cap").cast("int")).as("th"))
      base
        .join(keepIds, Seq("fp"), "left")
        .join(th, Seq("source"), "left")
        .select(col("doc_id"), col("source"), col("nt"),
          when(!col("kept_q"), lit("2_quality"))
            .when(col("doc_id") =!= col("keep_id"), lit("3_exact_dedup"))
            .when(pri > col("th"), lit("4_domain_cap"))
            .otherwise(lit("kept")).as("fate"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH base AS MATERIALIZED (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(lower(text), ' '),
                 '\\s+')) AS BIGINT) AS nt,
               ${sqlG4Verdict("text")} = 'keep' AS kept_q,
               ${graft.Op.xhash60(
                 "lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '))")}
                 AS fp
        FROM documents),
      q AS (SELECT * FROM base WHERE kept_q),
      keep AS (SELECT fp, min(doc_id) AS keep_id FROM q GROUP BY fp),
      dd AS MATERIALIZED (
        SELECT q.doc_id, q.source, q.nt
        FROM q JOIN keep ON q.fp = keep.fp AND q.doc_id = keep.keep_id),
      caps AS (SELECT source,
                      CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
                        AS cap
               FROM dd GROUP BY source),
      rk AS (SELECT dd.doc_id, dd.source,
                    row_number() OVER (PARTITION BY source
                      ORDER BY ${graft.Op.xhash60(
                        "concat(source, '|', doc_id)")}, doc_id) AS rn
             FROM dd)
      SELECT b.doc_id, b.source, b.nt,
             CASE WHEN NOT b.kept_q THEN '2_quality'
                  WHEN b.doc_id != k.keep_id THEN '3_exact_dedup'
                  WHEN r.rn > c.cap THEN '4_domain_cap'
                  ELSE 'kept' END AS fate
      FROM base b
      LEFT JOIN keep k ON b.fp = k.fp
      LEFT JOIN rk r ON b.doc_id = r.doc_id
      LEFT JOIN caps c ON b.source = c.source
      ORDER BY b.doc_id"""))

  /** PageRank dials (G13): 4 synthesized outlinks per document, 6 power
    * iterations, damping 0.85 in exact integer micros (teleport
    * 150,000 = 0.15·1e6 per node). Six rounds reach ~0.85⁶ ≈ 0.38
    * residual — rank ORDER is stable well before the values converge,
    * and the round count is a latency dial, not a correctness one (every
    * round replays exactly in both engines).
    */
  private val PR_LINKS = 4
  private val PR_ROUNDS = 6

  /** G13 — link-graph centrality by PageRank power iteration: the
    * source-quality signal crawl-based curation stacks weight documents
    * by (Brin/Page 1998; Common Crawl publishes harmonic-centrality/
    * PageRank host rankings for exactly this use). The corpus has no
    * real hyperlinks, so a deterministic outlink set is synthesized per
    * document from the portable hash (the C16/mm fake-payload pattern —
    * the GRAPH ITERATION is what's oracle-checked; targets are hash mod
    * n, so in-degrees vary and the stationary ranks genuinely spread).
    *
    * This is the one iterative-graph shape on the board beyond D6's
    * connected components: K rounds of (edges ⋈ ranks → groupBy target)
    * expressed relationally — the Pregel message-passing step as a join
    * + map-side-combined aggregate. Scale shape: ranks and
    * contributions are id-width rows (never the document payload); the
    * edge frame is built once, persisted, and partitioned by src so
    * every round's join reuses its layout (at 100 TB you'd bucket edges
    * and ranks on the same key and each round shuffles only O(V) rank
    * rows); the contribution aggregate combines map-side, so the
    * per-target shuffle carries one partial per (partition, target),
    * bounding hub-page skew. All arithmetic is exact
    * integer micros with truncating division (DuckDB `//` ≡ JVM `div`
    * on non-negative operands), so all K rounds replay bit-identically
    * in the oracle's unrolled CTEs (the C14/C18/E8 pattern).
    */
  val graphPagerank: Op = Op(
    "graph_pagerank",
    (s, d) => {
      val docs = Caches.persist(
        Tables.documents(s, d).select(col("doc_id")))
      val n = docs.count()
      val edges = Caches.persist(docs
        .transform(graft.Tables.spreadBy(col("doc_id")))
        .select(col("doc_id").as("src"),
          explode(transform(sequence(lit(0), lit(PR_LINKS - 1)), j =>
            pmod(hash60(concat(lit("pr"), col("doc_id").cast("string"),
              lit(":"), j.cast("string"))), lit(n)))).as("tgt")))
      var ranks = docs.select(col("doc_id"), lit(1000000L).as("rank"))
      for (_ <- 1 to PR_ROUNDS) {
        val contrib = edges.join(ranks, col("src") === col("doc_id"))
          .select(col("tgt"), expr(s"rank div $PR_LINKS").as("share"))
          .groupBy(col("tgt"))
          .agg(sum(col("share")).as("contrib"))
        ranks = docs.join(contrib, col("doc_id") === col("tgt"), "left")
          .select(col("doc_id"),
            (lit(150000L) + expr(
              s"(85 * coalesce(contrib, cast(0 as bigint))) div 100"))
              .as("rank"))
      }
      val indeg = edges.groupBy(col("tgt")).agg(count(lit(1)).as("in_deg"))
      ranks.join(indeg, col("doc_id") === col("tgt"), "left")
        .select(col("doc_id"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"),
          col("rank").as("rank_micros"))
        .orderBy(col("doc_id"))
    },
    Some {
      val rounds = (1 to PR_ROUNDS).map { i =>
        s"""
      c$i AS (
        SELECT ed.tgt AS doc_id,
               CAST(sum(r.rank // $PR_LINKS) AS BIGINT) AS contrib
        FROM ed JOIN r${i - 1} r ON ed.src = r.doc_id
        GROUP BY 1),
      r$i AS (
        SELECT d.doc_id,
               CAST(150000 + (85 * coalesce(c.contrib, 0)) // 100
                 AS BIGINT) AS rank
        FROM documents d LEFT JOIN c$i c ON d.doc_id = c.doc_id)"""
      }.mkString(",\n")
      s"""
      WITH ed AS MATERIALIZED (
        SELECT d.doc_id AS src,
               ${Op.xhash60(
          "'pr' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
                 % (SELECT count(*) FROM documents) AS tgt
        FROM documents d, generate_series(0, ${PR_LINKS - 1}) t(j)),
      r0 AS (
        SELECT doc_id, CAST(1000000 AS BIGINT) AS rank FROM documents),
      $rounds,
      ind AS (SELECT tgt, CAST(count(*) AS BIGINT) AS in_deg
              FROM ed GROUP BY tgt)
      SELECT r.doc_id,
             CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
             r.rank AS rank_micros
      FROM r$PR_ROUNDS r LEFT JOIN ind i ON r.doc_id = i.tgt
      ORDER BY doc_id"""
    })

  /** G14 — exact heavy hitters in two phases: which keys carry more
    * than 1/128 of all events (the hot users/domains/IPs a pipeline
    * must know about for skew handling, rate limiting and abuse
    * triage), with exact counts and ppm shares.
    *
    * The naive `GROUP BY key HAVING count > n/128` is correct but
    * builds hash-aggregate state proportional to the DISTINCT key count
    * — billions of tail keys at 100 TB, all shuffled as partials only
    * to be discarded by the HAVING. Phase 1 instead runs the
    * [[graft.functions.MgSketchAgg]] Misra-Gries summary: fixed
    * 128-entry state per partition regardless of cardinality, fixed
    * shuffle volume, and the classic guarantee that every ≥ n/129 key
    * survives — a SUPERSET of the answer. Phase 2 broadcast-semi-joins
    * the ≤ 128 candidates back over the events and counts exactly, so
    * the aggregate state is candidate-sized and the final filter +
    * share arithmetic is pure integer math (identical in the oracle,
    * which states the naive definition — the sketch is an optimization
    * with a proof, not an approximation of the answer).
    */
  val eventsHeavyHitters: Op = Op(
    "events_heavy_hitters",
    (s, d) => {
      val e = Caches.persist(Tables.events(s, d).select(col("user_id")))
      val nFrame = e.agg(count(lit(1)).as("n_total"))
      val cands = e
        .agg(call_function("mg_sketch", col("user_id"), lit(128)).as("ks"))
        .select(explode(col("ks")).as("user_id"))
      e.join(broadcast(cands), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .crossJoin(broadcast(nFrame))
        .filter(col("n_events") * lit(128L) > col("n_total"))
        .select(col("user_id"), col("n_events"), col("n_total"),
          expr("n_events * 1000000 div n_total").as("share_ppm"))
        .orderBy(col("n_events").desc, col("user_id"))
    },
    Some("""
      SELECT user_id, count(*) AS n_events,
             (SELECT count(*) FROM events) AS n_total,
             count(*) * 1000000 // (SELECT count(*) FROM events)
               AS share_ppm
      FROM events
      GROUP BY user_id
      HAVING count(*) * 128 > (SELECT count(*) FROM events)
      ORDER BY n_events DESC, user_id"""))

  /** G15 — exact heavy-hitter DOMAINS: G14's two-phase Misra-Gries
    * shape generalized from a native long key (user_id) to a STRING key
    * through the portable hash — the skew-triage pass a crawl pipeline
    * runs on its URL stream before D13/G11 decide what to keep. Each
    * document synthesizes a decorated URL over a quadratically-skewed
    * host family (host index floor(√(doc_id mod 4096)) → 64 domains
    * whose shares grow linearly, so the 1/128 cut genuinely separates a
    * head from a tail at every SF), and the domain is recovered with
    * D13's canonicalization rules (lowercase, strip :443, strip www.,
    * drop the fragment) — the decorations guarantee the heavy-hitter
    * count is over the CANONICAL domain, not the raw host string.
    *
    * Phase 1 sketches `hash60(domain)`: the summary state stays 256
    * longs per partition whatever the domain cardinality, and the
    * survival guarantee transfers through the hash — a ≥ n/129-frequent
    * domain is a ≥ n/129-frequent hash, so its hash is in the candidate
    * set (a hash collision can only ADD a candidate, never evict one:
    * colliding keys pool their counts). Phase 2 broadcast-semi-joins
    * the candidate hashes and counts the DOMAIN STRING exactly, so
    * collisions cannot merge two domains in the answer. cap = 256 keeps
    * 2× margin over the 1/128 threshold's minimum capacity of 128.
    */
  val domainsHeavyHitters: Op = Op(
    "domains_heavy_hitters",
    (s, d) => {
      val j = floor(sqrt(pmod(col("doc_id"), lit(4096)).cast("double")))
        .cast(LongType).cast("string")
      val ds = col("doc_id").cast("string")
      val url = when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("https://h"), j, lit(".example.com/p/"), ds))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit("https://WWW.h"), j, lit(".EXAMPLE.com:443/p/"), ds,
            lit("#frag")))
        .otherwise(
          concat(lit("https://h"), j, lit(".example.com/p/"), ds,
            lit("?utm_source=x")))
      val host = regexp_replace(regexp_replace(
        lower(regexp_extract(regexp_replace(col("url"), "#.*$", ""),
          "^[A-Za-z]+://([^/?#]+)", 1)), ":(80|443)$", ""), "^www\\.", "")
      val doms = Caches.persist(Tables.documents(s, d)
        .select(col("doc_id"), url.as("url"))
        .select(host.as("domain")))
      val nFrame = doms.agg(count(lit(1)).as("n_total"))
      val cands = doms
        .agg(call_function("mg_sketch", hash60(col("domain")), lit(256))
          .as("ks"))
        .select(explode(col("ks")).as("kh"))
      doms.join(broadcast(cands), hash60(col("domain")) === col("kh"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(nFrame))
        .filter(col("n_docs") * lit(128L) > col("n_total"))
        .select(col("domain"), col("n_docs"), col("n_total"),
          expr("n_docs * 1000000 div n_total").as("share_ppm"))
        .orderBy(col("n_docs").desc, col("domain"))
    },
    Some("""
      WITH u AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT)
                 WHEN 0 THEN 'https://h' ||
                   CAST(floor(sqrt(CAST(doc_id % 4096 AS DOUBLE))) AS BIGINT)
                   || '.example.com/p/' || doc_id
                 WHEN 1 THEN 'https://WWW.h' ||
                   CAST(floor(sqrt(CAST(doc_id % 4096 AS DOUBLE))) AS BIGINT)
                   || '.EXAMPLE.com:443/p/' || doc_id || '#frag'
                 ELSE 'https://h' ||
                   CAST(floor(sqrt(CAST(doc_id % 4096 AS DOUBLE))) AS BIGINT)
                   || '.example.com/p/' || doc_id || '?utm_source=x'
               END AS url
        FROM documents),
      dom AS (
        SELECT regexp_replace(regexp_replace(
                 lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                   '^[A-Za-z]+://([^/?#]+)', 1)),
                 ':(80|443)$', ''), '^www\.', '') AS domain
        FROM u)
      SELECT domain, count(*) AS n_docs,
             (SELECT count(*) FROM dom) AS n_total,
             count(*) * 1000000 // (SELECT count(*) FROM dom) AS share_ppm
      FROM dom
      GROUP BY domain
      HAVING count(*) * 128 > (SELECT count(*) FROM dom)
      ORDER BY n_docs DESC, domain"""))

  /** G17 — EXACT grouped percentiles without a corpus sort: p50/p90/p99
    * of `value` per event_type, each defined as the value at 0-based
    * global rank floor(q·(n−1)) under (value, event_id) order — the
    * discrete "lower" quantile, stated plainly by the oracle's
    * row_number formulation.
    *
    * The naive plan (q22's shape, or any percentile_disc) SORTS every
    * group's rows — at 100 TB that is the full-data sort-exchange that
    * dominates the job. This op resolves each quantile in two phases
    * (the sample_mixture boundary-bucket technique, pointed at ranks
    * instead of token budgets): a (group, bucket)-histogram over the
    * value-monotone key floor(value·1000) — one map-side-combined
    * id-width shuffle, the ONLY corpus-sized exchange — finds, from a
    * small-frame running sum, the single bucket containing each
    * target rank and the within-bucket offset; then ONLY the boundary
    * buckets' rows (a broadcast semi-join against the ≤ 3·groups-row
    * bounds frame) are sorted, per (group, quantile), to pick the
    * offset row. Bucketing is monotone in value and equal values share
    * a bucket, so within-bucket (value, event_id) order extends the
    * cross-bucket order exactly — the two-phase pick IS the global-sort
    * answer, row for row.
    */
  val eventsQuantiles: Op = {
    val targets = Seq(("p50", 50), ("p90", 90), ("p99", 99))
    Op(
      "events_quantiles",
      (s, d) => {
        val ev = Caches.persist(Tables.events(s, d)
          .select(col("event_type"), col("event_id"), col("value"),
            floor(col("value") * lit(1000.0)).cast(LongType).as("b")))
        val wB = Window.partitionBy(col("event_type")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val hist = ev.groupBy(col("event_type"), col("b"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", coalesce(sum(col("c")).over(wB), lit(0L)))
          .withColumn("n", sum(col("c")).over(
            Window.partitionBy(col("event_type"))))
        // r20 (guide §2.4): the three quantile targets resolve in ONE
        // pass over the histogram via an exploded target list — the
        // per-target filter+union spelling re-planned (and re-ran) the
        // groupBy+window hist subtree once per quantile. The per-type
        // total n rides along in bounds (every bounds row of a type
        // carries the same window-total), so the separate ns count pass
        // and its join are gone too.
        val idxT = expr("(n - 1) * pct div 100")
        val bounds = hist
          .select(col("event_type"), col("b"), col("c"), col("cum"),
            col("n"),
            explode(array(targets.map { case (name, q) =>
              struct(lit(name).as("q"), lit(q).as("pct")) }: _*)).as("t"))
          .select(col("event_type"), col("b"), col("c"), col("cum"),
            col("n"), col("t.q").as("q"), col("t.pct").as("pct"))
          .filter(col("cum") <= idxT && idxT < col("cum") + col("c"))
          .select(col("event_type"), col("b"), col("q"),
            (idxT - col("cum")).as("off"), col("n").as("n_events"))
        val wIn = Window.partitionBy(col("event_type"), col("q"))
          .orderBy(col("value"), col("event_id"))
        val qvals = ev.join(broadcast(bounds), Seq("event_type", "b"))
          .withColumn("rn", row_number().over(wIn).cast(LongType) - 1)
          .filter(col("rn") === col("off"))
        val aggCols = targets.map { case (name, _) =>
          max(when(col("q") === name, col("value"))).as(name) }
        qvals.groupBy(col("event_type"))
          .agg(max(col("n_events")).as("n_events"), aggCols: _*)
          .select(col("event_type") +: col("n_events") +:
            targets.map(t => col(t._1)): _*)
          .orderBy(col("event_type"))
      },
      Some(s"""
      WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY value, event_id) - 1 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type,
             CAST(max(n) AS BIGINT) AS n_events,
             ${targets.map { case (name, q) =>
               s"max(CASE WHEN rn = (n-1)*$q//100 THEN value END) AS $name"
             }.mkString(",\n             ")}
      FROM r GROUP BY event_type ORDER BY event_type"""))
  }

  /** G18 — the event-type TRANSITION MATRIX (first-order Markov
    * estimate): counts of consecutive (prev → cur) event-type pairs
    * within each user's time-ordered stream, with the conditional
    * probability in exact ppm (n(prev→cur)·1e6 div n(prev→·)) — the
    * behavioral model behind funnel mining, next-action prediction
    * features and bot detection (a scripted client's transition rows
    * are near-deterministic where organic ones spread). The lm_bigram
    * idea applied to the events stream.
    *
    * Scale shape: ONE shuffle on user_id for the lag window (the q16
    * sessionize exchange — co-partitioned with every other per-user
    * window in the engine), then the transition counts aggregate
    * map-side into ≤ |types|² groups; the row-conditional divide is a
    * broadcast of the |types|-row margin frame. Determinism: the lag
    * order is (ts, event_id), the same total order every per-user
    * window in the engine uses.
    */
  val eventsMarkov: Op = Op(
    "events_markov",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("cur_type"))
        .agg(count(lit(1)).as("n_trans"))
      val margin = trans.groupBy(col("prev_type"))
        .agg(sum(col("n_trans")).as("n_from"))
      trans.join(broadcast(margin), "prev_type")
        .select(col("prev_type"), col("cur_type"), col("n_trans"),
          col("n_from"),
          expr("n_trans * 1000000 div n_from").as("p_ppm"))
        .orderBy(col("prev_type"), col("cur_type"))
    },
    Some("""
      WITH tr AS (
        SELECT prev_type, event_type AS cur_type, count(*) AS n_trans
        FROM (SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_type
              FROM events) t
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type),
      mg AS (SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS n_from
             FROM tr GROUP BY prev_type)
      SELECT tr.prev_type, tr.cur_type,
             CAST(tr.n_trans AS BIGINT) AS n_trans, mg.n_from,
             tr.n_trans * 1000000 // mg.n_from AS p_ppm
      FROM tr JOIN mg USING (prev_type)
      ORDER BY prev_type, cur_type"""))

  val all: Seq[Op] = Seq(
    joinAsof, joinRange, sampleStratified, qualityFilter,
    qualityFilterExtracted, eventsRetention, eventsFunnel, sampleWeighted,
    eventsAnomaly, docPack, docPackBpe, docPackEmit, docPackSemantic,
    packShuffle,
    sampleHoldout, sampleDsir, samplePrototypes, sampleBudget, mixturePlan,
    mixturePlanBpe,
    mixturePlanTemp, sampleMixture, sampleMixtureDoremi, sampleDomainCap,
    curationReport,
    curationReportQuality, curationFate,
    graphPagerank,
    eventsHeavyHitters, domainsHeavyHitters, eventsQuantiles, eventsMarkov)
}
