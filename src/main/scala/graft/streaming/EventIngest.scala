package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Portable._
import graft.sources.{ParquetSink, SinkLog, Sinks}

/** Structured-Streaming ingest twin of the reference's event-driven path
  * (signals.py:1-82 — change event fires; tasks.py:1-59 — async dump into
  * the sink): events arrive on a stream, are aggregated into 1-hour
  * tumbling windows with a watermark, and each micro-batch is appended
  * THROUGH the engine's idempotent sink abstraction
  * ([[graft.sources.ParquetSink]]), stamped with a (query-instance tag,
  * epoch id) dump_id. `foreachBatch` may re-deliver an epoch after a failure; the
  * dump-id dedup turns that at-least-once delivery into exactly-once
  * sink contents — the same idempotency design the reference gets from
  * dump_id + ReplacingMergeTree, and the standard Spark recipe for
  * exactly-once foreachBatch sinks. The authoritative current state is
  * the sink's latest-state view (newest epoch wins per window key).
  *
  * At scale: the window agg shuffles once on (window, event_type) with
  * map-side partial aggregation; the watermark bounds state; the sink
  * append is partition-parallel; compaction (ParquetSink.compact) runs
  * scheduled, like ClickHouse background merges.
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
    * appends its (possibly updated) window rows through the idempotent
    * sink, dump_id = (query-instance tag, epoch id).
    */
  def start(
      events: DataFrame,
      sinkDir: String,
      checkpointDir: String): StreamingQuery =
    start(events, ParquetSink(sinkDir), checkpointDir)

  /** Same ingest against ANY [[SinkLog]] backend — a parquet log or an
    * external database over JDBC ([[graft.sources.ExternalSink]], the
    * reference's broker role): the epoch-id dump dedup makes
    * at-least-once foreachBatch delivery exactly-once in either store.
    */
  def start(
      events: DataFrame,
      sink: SinkLog,
      checkpointDir: String): StreamingQuery = {
    // Dump ids carry a per-query-instance tag (Sinks.runTag): a restart
    // from the SAME checkpoint re-delivers epochs under their original
    // ids (deduped, as intended), while a fresh-checkpoint restart or a
    // second query against the same log cannot collide with prior runs'
    // ids. The dump time is wall-clock micros, not the epoch number, so
    // the latest-state view stays newest-wins ACROSS query restarts
    // (epoch numbers reset to 0 on a fresh checkpoint; wall clock does
    // not). The zero-padded epoch keeps the dump_id tie-break ordered
    // like the epochs themselves.
    val tag = Sinks.runTag(checkpointDir)
    windowedAgg(events.withWatermark("ts", "2 hours"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        sink.appendIdempotent(batch.sparkSession,
          Sinks.stamped(batch, f"ingest-$tag-epoch-$epochId%09d",
            System.currentTimeMillis() * 1000L))
        ()
      }
      .start()
  }

  /** The authoritative current state of the sink: latest epoch wins per
    * (hour_start, event_type) — the ReplacingMergeTree-FINAL view.
    */
  def latestState(spark: SparkSession, sinkDir: String): DataFrame =
    ParquetSink(sinkDir)
      .latestState(spark, Seq("hour_start", "event_type"))
      .drop("dump_id", "time_last_dumped_us")
}
