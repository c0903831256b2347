package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Portable._

/** Structured-Streaming ingest twin of the reference's event-driven path
  * (signals.py:1-82 — change event fires; tasks.py:1-59 — async dump into
  * the sink): events arrive on a stream, are aggregated into 1-hour
  * tumbling windows with a watermark, and each micro-batch is appended to
  * a parquet sink tagged with its epoch id. Idempotency mirrors the
  * reference's dump_id design: appends are never updated in place — the
  * authoritative "current state" is the latest-epoch-per-key VIEW over the
  * append log (exactly ClickHouse ReplacingMergeTree + FINAL, and exactly
  * our A1 `sink_latest_state` operator).
  *
  * At scale: the window agg shuffles once on (window, event_type) with
  * map-side partial aggregation; the watermark bounds state; the sink
  * append is partition-parallel; compaction of the append log is the A1
  * window, run lazily at read or scheduled.
  */
object EventIngest {

  /** The shared windowed-agg plan fragment — identical to the batch twin
    * (A9 `events_windowed_agg`), so batch and streaming compute the same
    * thing from the same code.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Start the ingest on a streaming events frame (must have columns
    * ts: timestamp, event_type: string, value: double). Each micro-batch
    * appends its (possibly updated) window rows tagged with the epoch id.
    */
  def start(
      events: DataFrame,
      sinkDir: String,
      checkpointDir: String): StreamingQuery =
    windowedAgg(events.withWatermark("ts", "2 hours"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        batch.withColumn("epoch", lit(epochId))
          .write.mode("append").parquet(sinkDir)
      }
      .start()

  /** The authoritative current state of the sink: latest epoch wins per
    * (hour_start, event_type) — the A1 latest-row-per-key shape over the
    * append log.
    */
  def latestState(spark: SparkSession, sinkDir: String): DataFrame = {
    val w = Window.partitionBy(col("hour_start"), col("event_type"))
      .orderBy(col("epoch").desc)
    spark.read.parquet(sinkDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "epoch")
  }
}
