package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the A-series sink/ETL ops against independently
  * computed expectations at sf0.001.
  */
class SinkSpec extends SparkSpec {

  test("sink_latest_state: exactly one row per user, carrying the max ts") {
    val out = run("sink_latest_state")
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.count() == users)
    // the reported last_ts_us must equal the true per-user max
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(max(unix_micros(col("ts"))).as("m"))
    val joined = out.join(expected, "user_id")
      .filter(col("last_ts_us") =!= col("m")).count()
    assert(joined == 0, "latest-state ts != max ts for some user")
  }

  test("sink_should_dump: flag and reason are mutually consistent") {
    val rows = run("sink_should_dump").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dump = r.getAs[Boolean]("should_dump")
      val reason = r.getAs[String]("reason")
      if (reason.contains("NOT")) assert(!dump)
      else assert(dump, s"reason '$reason' but should_dump=false")
    }
    // the gate must exercise all three branches on this data
    val reasons = rows.map(_.getAs[String]("reason")).distinct
    assert(reasons.length == 3, s"gate branches hit: ${reasons.toSeq}")
  }

  test("sink_retire_users: n_before - n_deleted = n_after, deletions occur") {
    val rows = run("sink_retire_users").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_before") - r.getAs[Long]("n_deleted")
        == r.getAs[Long]("n_after"))
    }
    assert(rows.map(_.getAs[Long]("n_deleted")).sum > 0, "no PII rows deleted")
  }

  test("sink_pagination: batch respects start_pk, skip set, size and order") {
    val keys = run("sink_pagination").collect().map(_.getAs[Long]("o_orderkey"))
    assert(keys.length <= 200)
    assert(keys.forall(k => k > 500 && k % 10 != 3))
    assert(keys.sameElements(keys.sorted), "batch not in pk order")
  }

  test("sink_xblock_hierarchy: counters mirror the reference's loop") {
    // replay the reference's imperative counters (course_published.py:47-94)
    // per user and compare row-for-row.
    val rows = run("sink_xblock_hierarchy").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ord"),
        r.getAs[Long]("section"), r.getAs[Long]("subsection"),
        r.getAs[Long]("unit")))
    val types = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("us"), r.getAs[Long]("event_id")),
        r.getAs[String]("event_type")))
      .groupBy(_._1)
    val expected = types.toSeq.flatMap { case (uid, evs) =>
      var (sec, sub, unit) = (0L, 0L, 0L)
      evs.sortBy(_._2).zipWithIndex.map { case ((_, _, t), i) =>
        t match {
          case "signup"   => sec += 1; sub = 0; unit = 0
          case "purchase" => sub += 1; unit = 0
          case "click"    => unit += 1
          case _          =>
        }
        (uid, i + 1L, sec, sub, unit)
      }
    }.toSet
    assert(rows.toSet == expected, "hierarchy counters diverge from reference loop")
  }

  test("sink_csv_format: QUOTE_NONNUMERIC shape") {
    val rows = run("sink_csv_format").limit(50).collect()
    rows.foreach { r =>
      val csv = r.getAs[String]("csv_row")
      val parts = csv.split(",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)")
      assert(parts.length == 5, s"bad csv: $csv")
      assert(!parts(0).startsWith("\""), "numeric pk must be unquoted")
      assert(parts(1).startsWith("\"") && parts(2).startsWith("\""),
        "strings must be quoted")
      assert(parts(3).matches("""-?\d+\.\d\d"""), s"money not d.dd: ${parts(3)}")
    }
  }
}
