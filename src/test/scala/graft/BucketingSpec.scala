package graft

import org.apache.spark.sql.functions._

/** SURVEY §5's bucketing claim, proven: writing both fact tables
  * bucketed on the join key lets the orders⋈lineitem join run with ZERO
  * exchanges — the one-time bucketing shuffle is amortized across every
  * subsequent co-located join, the big-fact-join play at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no Exchange") {
    // force the shuffle-join path (tiny sf0.001 tables would broadcast,
    // and a BroadcastExchange would muddy the no-Exchange assertion)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("partitioned layout prunes whole directories at the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    Tables.events(spark, sf)
      .write.partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)).as("n"))
    val n = df.collect().head.getAs[Long]("n")
    assert(n > 0)
    val p = plan(df)
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      "partition predicate must prune at the file index, not post-scan")
    // the pruned scan must read only the one partition directory
    val files = "file:[^\\]\\,\\s]*".r.findAllIn(p).toSeq
    assert(p.contains("event_type=click") || files.forall(_.contains("click")) ||
      !p.contains("event_type=view"),
      s"scan location should cover only the click partition")
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString + "/orders"
    Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("c_nationkey").as("nkey"))
      .write.partitionBy("nkey").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Tables.nation(spark, sf).filter(col("n_name") === "JAPAN")
    val joined = fact.join(dim, col("nkey") === col("n_nationkey"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val p = plan(joined)
    assert(p.toLowerCase.contains("dynamicpruning") ||
      p.contains("dynamicpruningexpression"),
      s"expected runtime partition pruning in:\n${p.take(1500)}")
  }

  private def bucketedJoinBody(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.lineitem(spark, sf).count(), "join must cover all lineitems")

    val p = plan(joined)
    // the JOIN itself must be exchange-free: the only allowed exchange
    // is the one for the final small groupBy
    val joinPart = p.split("HashAggregate").last
    assert(!joinPart.contains("Exchange"),
      s"bucketed join still shuffles:\n$joinPart")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
