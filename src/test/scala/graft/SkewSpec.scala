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
}
