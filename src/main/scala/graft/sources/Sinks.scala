package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink abstractions (SURVEY.md §4): the write-side twin of the
  * reference's `ModelBaseSink.send_item` / dump-id idempotency contract
  * (reference sinks/base_sink.py:251-282 and the dump_id/time_last_dumped
  * columns every serializer stamps, serializers.py:34-153).
  *
  * Model: a sink is an APPEND-ONLY log of dumped rows, each stamped with
  * a `dump_id` (one per dump attempt) and a `time_last_dumped`. Readers
  * never see the log raw — they read the latest-state view (one row per
  * unique key, newest dump wins), exactly like ClickHouse
  * ReplacingMergeTree + FINAL. Idempotency is re-dump-safe appends:
  * a dump_id that already reached the sink is dropped before writing,
  * so retrying a failed/duplicated dump batch never duplicates rows —
  * the Spark twin of the reference tolerating Celery task re-delivery.
  */
object Sinks {

  /** Stamp a batch with its dump metadata (the serializer twin of
    * `dump_id`/`time_last_dumped`). `dumpId` identifies the ATTEMPT:
    * replays of the same attempt are deduplicated by
    * [[ParquetSink.appendIdempotent]].
    */
  def stamped(df: DataFrame, dumpId: String, dumpTimeUs: Long): DataFrame =
    df.withColumn("dump_id", lit(dumpId))
      .withColumn("time_last_dumped_us", lit(dumpTimeUs))
}

/** Append-only parquet sink log with dump-id idempotency and a
  * latest-state read view.
  *
  * Scale notes: the idempotency check reads ONLY the `dump_id` column of
  * the existing log (column-pruned parquet scan) and left-anti joins the
  * incoming batch against its distinct ids — a broadcast join in
  * practice (distinct dump ids are few). A 100 TB deployment
  * additionally partitions the log directory by dump date so the
  * existence scan prunes to recent partitions; the latest-state view is
  * one shuffle on the unique key and is the same plan as the
  * `sink_latest_state` operator (A1).
  */
final case class ParquetSink(path: String) {

  private def exists(spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read the raw append-only log. */
  def log(spark: SparkSession): DataFrame = spark.read.parquet(path)

  /** Append `batch` (already stamped with `dump_id`), dropping every row
    * whose dump_id already reached the sink. Returns the number of rows
    * actually appended.
    */
  def appendIdempotent(spark: SparkSession, batch: DataFrame): Long = {
    val fresh =
      if (!exists(spark)) batch
      else {
        val seen = log(spark).select(col("dump_id")).distinct()
        batch.join(broadcast(seen), Seq("dump_id"), "left_anti")
      }
    // one pass: count and append without recomputing the anti-join
    val materialized = fresh.localCheckpoint()
    val n = materialized.count()
    if (n > 0) materialized.write.mode("append").parquet(path)
    n
  }

  /** Latest-state view: one row per unique key, newest
    * `time_last_dumped_us` wins (ties broken by dump_id so replays of
    * distinct attempts stay deterministic) — ReplacingMergeTree FINAL.
    */
  def latestState(spark: SparkSession, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("time_last_dumped_us").desc, col("dump_id").desc)
    log(spark)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Compaction — the scheduled twin of ClickHouse's background merge:
    * rewrite the append log down to its latest-state rows so reads stop
    * paying for superseded versions. Readers through [[latestState]]
    * see identical results before and after (the view is idempotent
    * over compaction); dump-id idempotency keeps working because the
    * surviving rows retain their dump_id. Write-temp-then-swap keeps a
    * crash from destroying the log (a lake-format deployment would get
    * this atomically from the table format's commit protocol).
    */
  def compact(spark: SparkSession, keyCols: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact.tmp")
    latestState(spark, keyCols).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }
}

/** ClickHouse-FORMAT-CSV-shaped payload rendering: every row of any
  * DataFrame becomes one QUOTE_NONNUMERIC CSV line (strings/dates
  * quoted with internal quotes doubled, numbers bare, NULL as an empty
  * field) — the bulk-insert payload `send_item` builds
  * (reference sinks/base_sink.py:251-282). Schema-driven and
  * whole-stage-codegen'd: a narrow projection, no shuffle, so payload
  * rendering runs at scan speed at any scale.
  */
object CsvBulkSink {

  private def quoted(c: Column): Column =
    concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\""))

  /** The CSV cell expression for one field, by type. */
  private def cell(f: StructField): Column = f.dataType match {
    case _: NumericType | BooleanType => col(f.name).cast(StringType)
    case DateType => quoted(date_format(col(f.name), "yyyy-MM-dd"))
    case TimestampType =>
      quoted(date_format(col(f.name), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    case _ => quoted(col(f.name).cast(StringType))
  }

  /** One `csv_row` string column for the whole schema. NULL in any field
    * renders as an empty cell (coalesce before concat_ws — concat_ws
    * SKIPS null arguments, which would silently shift every later
    * column one position left).
    */
  def csvRow(df: DataFrame): Column =
    concat_ws(",",
      df.schema.fields.map(f => coalesce(cell(f), lit(""))).toIndexedSeq: _*)

  /** Render and write the payload as text files, one CSV line per row. */
  def write(df: DataFrame, path: String): Unit =
    df.select(csvRow(df).as("value")).write.mode("overwrite").text(path)
}
