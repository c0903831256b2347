package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-checked loaders for the driver-generated test tables.
  *
  * Every operator takes the scale-factor directory as a parameter so the
  * same plan runs unchanged from sf0.001 smoke tests to a 100 TB lake —
  * the parquet scans are plain `spark.read.parquet`, so partition pruning,
  * predicate pushdown and column pruning all apply.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever parquet flavor the generator used:
    * TIMESTAMP(NANOS) (reads as a raw long under
    * spark.sql.legacy.parquet.nanosAsLong=true, set in [[GraftSession]])
    * or TIMESTAMP(MICROS) without UTC adjustment (reads as
    * TIMESTAMP_NTZ). Normalize both to a session-TZ TimestampType so
    * every downstream operator (unix_micros, windows, watermarks) sees
    * one type. The session TZ is UTC, so the NTZ cast is
    * instant-preserving and matches the DuckDB oracle's naive reading.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Hash-spread a frame across the session's shuffle-partition count
    * WITHOUT letting AQE's byte-based coalescing undo it (r19): the
    * CPU-heavy text/vector kernels sit downstream of these exchanges,
    * and a small corpus (one input split, a few MB shuffled) gets
    * coalesced back to ONE task by
    * spark.sql.adaptive.coalescePartitions — which prices partitions by
    * BYTES and cannot see per-row kernel cost — serializing the whole
    * pass (measured: the 0.9 s single-task featurize behind
    * quality_calibration). An EXPLICIT partition count pins the
    * exchange against coalescing; taking it from the session conf keeps
    * it scale-adaptive (a deployment sizes spark.sql.shuffle.partitions
    * to the cluster, and at real data volumes coalescing would not have
    * triggered anyway). HashPartitioning(key) also pre-satisfies every
    * downstream key-prefixed aggregation/window, so the kernel pass and
    * its per-doc aggregate share this one exchange.
    */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, key: _*)

  /** [[spread]] curried for `.transform(...)` chaining. */
  def spreadBy(key: org.apache.spark.sql.Column): DataFrame => DataFrame =
    df => spread(df, key)

  /** Register every table as a temp view so the full surface is also
    * reachable through `spark.sql(...)` ANSI SQL — `events` goes through
    * the nanos-normalizing loader above, everything else is the plain
    * pruned/pushed-down parquet scan.
    */
  def registerViews(s: SparkSession, d: String): Unit = {
    names.filterNot(_ == "events")
      .foreach(n => load(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }
}
