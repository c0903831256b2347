package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Checkpoints

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

  /** Stable per-query-instance tag for streaming dump ids. Epoch numbers
    * restart at 0 whenever a query starts from a fresh checkpoint dir, so
    * a dump id derived from the epoch alone collides with a previous
    * run's ids against the same sink log — and the idempotency anti-join
    * would silently drop the new run's batches. Deriving the tag from the
    * checkpoint dir gives exactly the right identity: restarts from the
    * SAME checkpoint keep the tag (their re-delivered epochs SHOULD
    * dedup), while a fresh checkpoint — or a second query sharing the
    * log — gets a fresh tag.
    */
  def runTag(checkpointDir: String): String = {
    // Canonicalize before hashing: two spellings of the same directory
    // ('/x/ckpt' vs '/x/ckpt/', relative vs absolute, '..' segments)
    // MUST yield the same tag, or a restart referencing the same
    // checkpoint under a different spelling would get a fresh dump-id
    // namespace and its re-delivered epochs would append twice.
    val f = new java.io.File(checkpointDir)
    val canon = try f.getCanonicalPath catch {
      case _: java.io.IOException => f.getAbsolutePath
    }
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
    d.take(6).map(b => f"${b & 0xff}%02x").mkString
  }
}

/** The sink contract every backend shares: an append-only log with
  * dump-id idempotent appends and a latest-state read view. Backends
  * differ only in where the log lives ([[ParquetSink]] — the lake;
  * [[ExternalSink]] — an external database over JDBC, the reference's
  * actual broker role).
  *
  * Scale notes: the idempotency check reads ONLY the `dump_id` column of
  * the existing log (a column-pruned scan — parquet prunes natively, the
  * JDBC read pushes the projection to the database) and left-anti joins
  * the incoming batch against its distinct ids — a broadcast join in
  * practice (distinct dump ids are few). The latest-state view is one
  * shuffle on the unique key and is the same plan as the
  * `sink_latest_state` operator (A1).
  */
trait SinkLog {

  /** Does the log exist yet (first append creates it)? */
  protected def exists(spark: SparkSession): Boolean

  /** Backend append of an already-deduplicated batch. */
  protected def append(df: DataFrame): Unit

  /** Read the raw append-only log. */
  def log(spark: SparkSession): DataFrame

  /** Has anything ever been appended (the first append creates the
    * log)? Public so schedulers ([[Backfill]]) can gate their sink-state
    * read without touching the backend directly.
    */
  def initialized(spark: SparkSession): Boolean = exists(spark)

  /** Distinct dump_ids already in the sink — subclasses may override
    * with a cheaper pushed-down query than the full-log scan.
    */
  protected def seenDumpIds(spark: SparkSession): DataFrame =
    log(spark).select(col("dump_id")).distinct()

  /** Test hook: the idempotency pre-read, for plan/width assertions. */
  private[graft] def seenForTest(spark: SparkSession): DataFrame =
    seenDumpIds(spark)

  /** Append `batch` (already stamped with `dump_id`), dropping every row
    * whose dump_id already reached the sink. Returns the number of rows
    * actually appended.
    */
  def appendIdempotent(spark: SparkSession, batch: DataFrame): Long = {
    val fresh =
      if (!exists(spark)) batch
      else batch.join(broadcast(seenDumpIds(spark)), Seq("dump_id"), "left_anti")
    // one pass: count and append without recomputing the anti-join
    val materialized = Checkpoints.checkpoint(fresh)
    val n = materialized.count()
    if (n > 0) append(materialized)
    n
  }

  /** Latest-state view: one row per unique key, newest
    * `time_last_dumped_us` wins (ties broken by dump_id so replays of
    * distinct attempts stay deterministic) — ReplacingMergeTree FINAL.
    * A `max_by` hash aggregate, not a window: map-side combine forwards
    * one row per key per map task and no per-key sort runs (see A1's
    * scaladoc in SinkOps for the 100 TB argument).
    */
  def latestState(spark: SparkSession, keyCols: Seq[String]): DataFrame = {
    val df = log(spark)
    val missing = keyCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"latestState key column(s) ${missing.mkString(", ")} not in log " +
        s"schema [${df.columns.mkString(", ")}]")
    val others = df.columns.filterNot(keyCols.contains).toSeq
    require(others.nonEmpty,
      "latestState needs at least one non-key column (the max_by payload " +
        "struct cannot be empty); a keys-only log has no versioned state " +
        s"to resolve — keys [${keyCols.mkString(", ")}] cover every column")
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct(others.map(c => col(s"`$c`")): _*),
        struct(col("time_last_dumped_us"), col("dump_id"))).as("m"))
      .select(df.columns.toSeq.map(c =>
        if (keyCols.contains(c)) col(s"`$c`")
        else col(s"m.`$c`").as(c)): _*)
  }
}

/** Append-only parquet sink log — the lake-native [[SinkLog]]. A 100 TB
  * deployment additionally partitions the log directory by dump date so
  * the idempotency scan prunes to recent partitions.
  */
final case class ParquetSink(path: String) extends SinkLog {

  protected def exists(spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  protected def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)

  /** `mergeSchema` because an append-only log lives through producer
    * schema evolution: a batch that gains a column must not make the log
    * unreadable (rows from before the column read as NULL, exactly like
    * ClickHouse ALTER ADD COLUMN defaults). Cost note: merging reads
    * every file's footer at planning time — a 100 TB deployment
    * partitions the log by dump date and prunes before the merge, or
    * pins the schema once evolution settles.
    */
  def log(spark: SparkSession): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

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

/** External-database sink over JDBC — the [[SinkLog]] twin of the
  * reference's actual broker role: pushing serialized rows into an
  * external store over the wire (`_send_clickhouse_request`,
  * base_sink.py:55-72, and `send_item`'s bulk POST,
  * base_sink.py:251-282). The reference tolerates Celery re-delivery of
  * the same dump via dump_id + ReplacingMergeTree; here the SAME
  * dump-id anti-join dedups re-delivered batches BEFORE the wire, so
  * the external table never sees a duplicate attempt.
  *
  * Scale notes: the write is `df.write.jdbc` — every Spark partition
  * opens its own connection and streams its rows in `batchsize`d
  * inserts, so the append is partition-parallel like the parquet path
  * (the reference posts one CSV payload per batch from one process; a
  * 1000-executor cluster writes 1000 ways). The idempotency pre-read
  * selects ONLY the distinct dump_id (pushed to the database as a
  * one-column query via a subquery alias, not a full-table fetch).
  */
final case class ExternalSink(
    url: String,
    table: String,
    connProps: Map[String, String] = Map.empty,
    createColumnTypes: Option[String] = None,
    timeoutSecs: Option[Int] = None) extends SinkLog {

  /** `timeoutSecs` is the `ClickHouseClient.ch_timeout_secs` twin
    * (base_sink.py:39-53, overridable per instance exactly as
    * `connection_overrides` overrides the settings default): it rides
    * the JDBC `queryTimeout` option into every Spark read/write this
    * sink issues, and the probe statement in [[exists]] sets it
    * directly — no sink request may hang past it.
    */
  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    timeoutSecs.foreach(t => p.setProperty("queryTimeout", t.toString))
    p
  }

  protected def exists(spark: SparkSession): Boolean =
      ExternalSink.surfacing("existence probe", url, table) {
    // Spark's JDBC source loads the driver class itself from the
    // "driver" property; the raw DriverManager probe here must do the
    // same (service autoloading misses drivers registered only in
    // add-on jars, e.g. Derby 10.15+'s EmbeddedDriver in derbytools).
    connProps.get("driver").foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // Probe with the EXACT identifier every other path uses (Spark's
      // JDBC reader/writer pass `table` through verbatim) rather than
      // case-guessing against DatabaseMetaData — a metadata probe can
      // false-positive on a differently-cased sibling table on
      // case-sensitive stores, sending appendIdempotent's anti-join to
      // the wrong log. ONLY a table-not-found SQLState may mean "no log
      // yet": any other failure (lock timeout, dropped connection,
      // permission) must propagate, or appendIdempotent would skip the
      // dump-id anti-join and a replayed dump would land twice.
      val st = conn.createStatement()
      timeoutSecs.foreach(st.setQueryTimeout)
      try {
        st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close()
        true
      } catch {
        case e: java.sql.SQLException
            if ExternalSink.isTableNotFound(e) => false
      } finally st.close()
    } finally conn.close()
  }

  protected def append(df: DataFrame): Unit =
      ExternalSink.surfacing("append", url, table) {
    // Some dialects map StringType to a LOB type (Derby: CLOB) that the
    // database cannot use in DISTINCT — which the idempotency pre-read
    // needs on dump_id. Pin the key column to a comparable VARCHAR at
    // table creation; callers override for their own columns.
    val colTypes = createColumnTypes.getOrElse(
      if (df.columns.contains("dump_id")) "dump_id VARCHAR(128)" else "")
    val w = df.write.mode("append")
    (if (colTypes.nonEmpty) w.option("createTableColumnTypes", colTypes)
     else w).jdbc(url, table, props)
  }

  def log(spark: SparkSession): DataFrame =
    spark.read.jdbc(url, table, props)

  override protected def seenDumpIds(spark: SparkSession): DataFrame = {
    // A subquery pushes the projection+distinct to the database: the
    // idempotency pre-read moves one column of few values over the
    // wire, not the log. Spark's JDBC writer creates columns with
    // dialect-quoted (case-preserved) names, so the read-back must
    // quote the same way or the database would case-normalize it.
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier("dump_id")
    spark.read.jdbc(
        url, s"(SELECT DISTINCT $q FROM $table) AS seen", props)
      .toDF("dump_id")
  }
}

object ExternalSink {
  /** SQLStates that mean "table/view does not exist" across the dialects
    * Spark's JDBC source ships: Derby 42X05, MySQL/SQL Server/ODBC 42S02,
    * Postgres 42P01, H2 42102/42S02, DB2 42704, legacy MySQL S0002.
    * Anything else is NOT evidence of a missing log and is rethrown by
    * [[ExternalSink.exists]].
    */
  val TableNotFoundStates: Set[String] =
    Set("42X05", "42S02", "42P01", "42102", "42704", "S0002")

  /** Oracle reports a missing table as ORA-00942 under the AMBIGUOUS
    * SQLState 42000 (syntax-error class), so it is classified by vendor
    * error code, never by state — treating all of 42000 as "no table"
    * would swallow real syntax errors and skip the idempotency anti-join.
    */
  def isTableNotFound(e: java.sql.SQLException): Boolean =
    TableNotFoundStates(e.getSQLState) ||
      (e.getSQLState == "42000" && e.getErrorCode == 942)

  /** The backend's full diagnostic chain, flattened: SQLState, vendor
    * code and message of the exception AND its `getNextException` chain
    * (JDBC batch drivers bury the real failure there). The twin of the
    * reference client logging `e.response` + `e.response.text` before
    * re-raising (`_send_clickhouse_request`, base_sink.py:55-71) — the
    * error BODY must reach the operator, not just "request failed".
    */
  def describe(e: java.sql.SQLException): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var cur = e
    var n = 0
    while (cur != null && n < 8) {
      parts += s"[state=${cur.getSQLState} code=${cur.getErrorCode}] " +
        String.valueOf(cur.getMessage).linesIterator.mkString(" ")
      cur = cur.getNextException
      n += 1
    }
    parts.mkString(" <- ")
  }

  /** Run a sink request, surfacing the backend diagnostics on failure:
    * the first SQLException in the cause chain (Spark wraps JDBC
    * failures) is re-raised with [[describe]]'s flattened detail in the
    * message, original as cause, SQLState/code preserved. Non-SQL
    * failures pass through untouched.
    */
  def surfacing[T](ctx: String, url: String, table: String)(body: => T): T =
    try body catch {
      case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .collectFirst { case s: java.sql.SQLException => s } match {
          case Some(s) => throw new java.sql.SQLException(
            s"sink $ctx failed against $url table $table: ${describe(s)}",
            s.getSQLState, s.getErrorCode, e)
          case None => throw e
        }
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

/** One registered model sink: what `ModelBaseSink` subclasses declare
  * (reference sinks/base_sink.py:125-160: `model`, `unique_key`, the
  * serializer) plus the two `is_enabled` flag sources (settings +
  * waffle, base_sink.py:338-358). `serialize` is the model's serializer
  * over its source table — projection/rename, the A5/A5b/A7 shape.
  */
/** One nested sink chained under a parent model sink — the
  * `nested_sinks` / `dump_related` contract (base_sink.py:123-127,
  * 184-203, 226-233): after a parent object dumps, each nested sink
  * serializes the object's RELATED rows and they land stamped with the
  * PARENT's dump_id/time_last_dumped. `serializeRelated` takes
  * (spark, sfDir, parentIds) where `parentIds` is a one-column
  * (`parent_id`) frame — BATCH-shaped, so the single-object task
  * (a 1-row frame) and [[Backfill.runModel]]'s per-batch cascade share
  * ONE definition and can never drift; the related scan semi-joins the
  * broadcast id set instead of filtering per object.
  */
final case class NestedSinkSpec(
    name: String,
    serializeRelated: (SparkSession, String, DataFrame) => DataFrame)

final case class ModelSinkSpec(
    model: String,
    uniqueKey: String,
    serializedKey: String,
    settingEnabled: Boolean,
    waffleEnabled: Boolean,
    serialize: (SparkSession, String) => DataFrame,
    nested: Seq[NestedSinkSpec] = Nil) {

  /** `is_enabled` = settings flag OR waffle flag (base_sink.py:338-358). */
  def isEnabled: Boolean = settingEnabled || waffleEnabled
}

/** Model→sink registry dispatch — the twin of
  * `ModelBaseSink.get_sink_by_model_name` (base_sink.py:361-369: walk
  * the registered sinks, match on `model`, None for unknown) and of the
  * generic `dump_data_to_clickhouse` task that drives a sink BY NAME
  * (tasks.py:43-59: resolve the class, check `is_enabled`, dump one
  * object). A driver that knows only "dump model X, object N" needs no
  * knowledge of which operator implements X — the routing the reference
  * exposes to its Celery layer.
  */
object SinkRegistry {

  /** The registered model sinks (the `__subclasses__()` walk, keyed
    * up-front — the registry is a handful of entries, so a Map twin of
    * the reference's linear scan is the same contract). Flags mirror
    * the A13 gating fixture: supplier/events are disabled models.
    */
  val specs: Map[String, ModelSinkSpec] = Seq(
    ModelSinkSpec("orders", "o_orderkey", "course_id",
      settingEnabled = true, waffleEnabled = false,
      (s, d) => graft.Tables.orders(s, d).select(
        col("o_orderkey").as("course_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"),
        col("o_orderdate").as("last_published")),
      // the XBlockSink-under-CourseOverviewSink shape: the order's
      // line rows ride the parent dump
      nested = Seq(NestedSinkSpec("order_lines",
        (s, d, pids) => graft.Tables.lineitem(s, d)
          .join(broadcast(pids.select(col("parent_id").as("l_orderkey"))),
            Seq("l_orderkey"), "left_semi")
          .select(col("l_orderkey").as("course_id"),
            col("l_linenumber").as("line"),
            col("l_quantity").as("qty"))))),
    ModelSinkSpec("customer", "c_custkey", "user_id",
      settingEnabled = false, waffleEnabled = true,
      (s, d) => graft.Tables.customer(s, d).select(
        col("c_custkey").as("user_id"),
        col("c_name").as("name"),
        col("c_acctbal").as("balance"))),
    ModelSinkSpec("supplier", "s_suppkey", "supplier_id",
      settingEnabled = false, waffleEnabled = false,
      (s, d) => graft.Tables.supplier(s, d).select(
        col("s_suppkey").as("supplier_id"),
        col("s_name").as("name")))
  ).map(sp => sp.model -> sp).toMap

  /** `get_sink_by_model_name` twin: None for an unregistered model. */
  def byModelName(model: String): Option[ModelSinkSpec] = specs.get(model)

  /** The generic dump task (`dump_data_to_clickhouse` twin): resolve
    * the sink by model name, honor the enable gate (a disabled sink is
    * never invoked — zero reads of its table), serialize the ONE object
    * named by `objectId` (the task's `object_id`), stamp it, append
    * idempotently, then cascade to the spec's nested sinks — each
    * related frame lands under the PARENT's dump_id/time (the
    * `dump` → `nested_sink.dump_related` loop, base_sink.py:184-203).
    * Returns total rows appended, parent + nested (0 for a disabled
    * sink or a fully-replayed dump id). An unknown model throws — the
    * analog of the task's import/getattr failure on a bad sink path; a
    * nested sink with no provided log likewise (the reference's
    * NotImplementedError for an unimplemented dump_related).
    */
  def dumpModel(
      spark: SparkSession,
      sfDir: String,
      model: String,
      objectId: Long,
      sink: SinkLog,
      dumpId: String,
      dumpTimeUs: Long,
      nestedSinks: Map[String, SinkLog] = Map.empty): Long = {
    val spec = byModelName(model).getOrElse(throw new IllegalArgumentException(
      s"unknown model '$model'; registered: ${specs.keys.toSeq.sorted.mkString(", ")}"))
    if (!spec.isEnabled) 0L
    else {
      // resolve EVERY nested sink before anything dumps — the reference
      // instantiates nested_sinks in __init__, so a missing/broken
      // nested sink fails BEFORE the parent row lands, never between
      // the parent append and the cascade
      val resolved = spec.nested.map { ns =>
        ns -> nestedSinks.getOrElse(ns.name,
          throw new IllegalArgumentException(
            s"no sink provided for nested '${ns.name}' of model '$model'"))
      }
      val nParent = sink.appendIdempotent(spark,
        Sinks.stamped(
          spec.serialize(spark, sfDir)
            .filter(col(spec.serializedKey) === objectId),
          dumpId, dumpTimeUs))
      val oneId = spark.range(1).select(lit(objectId).as("parent_id"))
      val nNested = resolved.map { case (ns, nsink) =>
        nsink.appendIdempotent(spark, Sinks.stamped(
          ns.serializeRelated(spark, sfDir, oneId), dumpId, dumpTimeUs))
      }.sum
      nParent + nNested
    }
  }
}
