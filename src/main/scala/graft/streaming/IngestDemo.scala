package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession

/** Runnable demo of the streaming ingest path (A10): feeds two
  * micro-batches through [[EventIngest]] and prints the append log and
  * the latest-state view. `sbt "runMain graft.streaming.IngestDemo"`.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def t(s: String) = Timestamp.valueOf(s"2026-01-01 $s:00")
    val src = MemoryStream[(Timestamp, String, Double)]
    val events = src.toDS().toDF("ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("ingest_demo").toString
    val q = EventIngest.start(events, s"$dir/sink", s"$dir/ckpt")

    src.addData((t("10:05"), "click", 1.0), (t("10:40"), "click", 2.0),
      (t("11:10"), "view", 5.0))
    q.processAllAvailable()
    // second batch lands in an already-emitted window → a new epoch row
    src.addData((t("10:55"), "click", 4.0))
    q.processAllAvailable()
    q.stop()

    println("=== RAW APPEND LOG (ReplacingMergeTree-style) ===")
    spark.read.parquet(s"$dir/sink")
      .orderBy("hour_start", "event_type", "dump_id").show(false)
    println("=== LATEST STATE (A1 view) ===")
    EventIngest.latestState(spark, s"$dir/sink")
      .orderBy("hour_start", "event_type").show(false)

    // stateful sessionization (flatMapGroupsWithState): 30-min gap
    val sess = MemoryStream[(Long, Timestamp)]
    val sq = SessionizeStream.sessions(
        sess.toDS().toDF("user_id", "ts").withWatermark("ts", "10 minutes"),
        gapMinutes = 30)
      .writeStream.format("memory").queryName("demo_sessions")
      .outputMode("append").start()
    sess.addData((1L, t("10:00")), (1L, t("10:10")), (1L, t("11:30")))
    sq.processAllAvailable()
    sess.addData((2L, t("13:00"))) // advance watermark → close the tail
    sq.processAllAvailable()
    sess.addData((2L, t("13:01")))
    sq.processAllAvailable()
    sq.stop()
    println("=== CLOSED SESSIONS (flatMapGroupsWithState) ===")
    spark.table("demo_sessions").orderBy("user_id", "start_us").show(false)
    spark.stop()
  }
}
