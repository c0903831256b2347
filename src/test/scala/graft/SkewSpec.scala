package graft

import org.apache.spark.sql.functions._

/** SURVEY §5's skew claim, proven at runtime: AQE detects a hot join key
  * and splits its partition, so one pathological key (the 100 TB
  * reality: a null-ish user, a viral document) cannot serialize a join
  * on a single task. Thresholds are lowered so the tiny test data
  * triggers the same code path production data would.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the skewed side of a shuffle join") {
    val setConfs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      // thresholds are on COMPRESSED map-output sizes, and runs of one
      // hot key compress hard — keep them tiny so the test data trips
      // the same detection production sizes would
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = setConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    setConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // left side: one hot key (0) carrying 50k wide-ish rows, 50 cold keys
      val left = spark.range(50000)
        .select((col("id") % 51).as("k"), col("id").as("lv"))
        .withColumn("k", when(col("k") < 1, 0L).otherwise(col("k")))
        .union(spark.range(50000).select(lit(0L).as("k"), col("id").as("lv")))
        .withColumn("pad", lpad(col("lv").cast("string"), 64, "x"))
      val right = spark.range(51).select(col("id").as("k"), col("id").as("rv"))
      // global agg only: a groupBy on the join key would REQUIRE the
      // join's hash distribution downstream, and AQE (correctly)
      // refuses to skew-split a join whose output partitioning is still
      // needed — that's the documented forceOptimizeSkewedJoin tradeoff
      // summing pad lengths keeps the wide column flowing through the
      // shuffle (column pruning would otherwise strip it to bare keys)
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("padsum"))
      assert(joined.collect().head.getAs[Long]("n") == 100000L,
        "every left row must join exactly once")
      val p = plan(joined)
      assert(p.contains("skewed"),
        s"expected an AQEShuffleRead skew split in:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("planted hot user: temporal-join task inputs bound by bucket occupancy") {
    import spark.implicits._
    // (event_id, tsSec, user_id, event_type, value) — a nested case
    // class can't get an encoder inside a suite, tuples can
    case class Ev(event_id: Long, tsSec: Long, user_id: Long,
        event_type: String, value: Double)
    val dir = java.nio.file.Files.createTempDirectory("graft_hot").toString
    val base = 1700000000L
    // hot user 0: 100 daily bursts of 200 events 60s apart (20k events,
    // a bot/service account); a signup opens every 4th day's burst
    val hot = for (d <- 0 until 100; i <- 0 until 200) yield {
      val tpe =
        if (i == 0 && d % 4 == 0) "signup"
        else if (i % 2 == 0) "click" else "purchase"
      Ev((d * 200 + i).toLong, base + d * 86400L + i * 60L, 0L, tpe, 1.0)
    }
    // cold users 1..50: 40 events each, one per day
    val cold = for (u <- 1 to 50; i <- 0 until 40) yield
      Ev(100000L + u * 100L + i, base + u * 17L + i * 86400L, u.toLong,
        "click", 1.0)
    val rows = hot ++ cold
    rows.map(e => (e.event_id, e.tsSec, e.user_id, e.event_type, e.value))
      .toDF("event_id", "tsSec", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("tsSec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .repartition(8).write.mode("overwrite").parquet(s"$dir/events.parquet")

    // 1. THE design claim of RANGE_BUCKET_SECONDS: join_range's hash key
    // is (user, day-bucket), so the biggest join-key group — what any
    // one task ingests for one key — is one bucket's occupancy (200),
    // 100x below the hot user's lifetime volume (20000). Without the
    // bucket in the key, the hot user's group IS the lifetime volume.
    val W = 24L * 3600L
    val maxKeyGroup = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"cast(ts as long) div $W").as("bkt"))
      .groupBy(col("user_id"), col("bkt")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxKeyGroup <= 200L,
      s"per-(user,bucket) occupancy $maxKeyGroup must stay at burst size")

    // 2. join_range stays EXACT under the hot key: every signup's
    // follow-up count matches a driver-side brute force
    val gotRange = run("join_range", dir).collect()
      .map(r => r.getAs[Long]("signup_id") -> r.getAs[Long]("n_follow"))
      .toMap
    val signups = rows.filter(_.event_type == "signup")
    assert(gotRange.keySet == signups.map(_.event_id).toSet)
    signups.foreach { sg =>
      val want = rows.count(r => r.user_id == sg.user_id &&
        r.tsSec > sg.tsSec && r.tsSec <= sg.tsSec + 86400L).toLong
      assert(gotRange(sg.event_id) == want,
        s"signup ${sg.event_id}: got ${gotRange(sg.event_id)}, want $want")
    }

    // 3. join_asof stays exact: each hot purchase attributes to the
    // latest click at-or-before it (none before the first click → null)
    val gotAsof = run("join_asof", dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("last_click_id"))) None
         else Some(r.getAs[Long]("last_click_id")))).toMap
    val clicks = rows.filter(_.event_type == "click")
    rows.filter(r => r.event_type == "purchase" && r.user_id == 0L)
      .foreach { p =>
        val want = clicks.filter(c => c.user_id == 0L && c.tsSec <= p.tsSec)
          .sortBy(c => (c.tsSec, c.event_id)).lastOption.map(_.event_id)
        assert(gotAsof(p.event_id) == want, s"purchase ${p.event_id}")
      }

    // 4. sessionize counts the bursts: 100 sessions for the hot user
    // (daily gaps close each 30-min-gap session), 40 for every cold one
    val sess = run("q16_sessionize", dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions"))
      .toMap
    assert(sess(0L) == 100L, s"hot user sessions: ${sess(0L)}")
    assert((1L to 50L).forall(sess(_) == 40L))
  }
}
