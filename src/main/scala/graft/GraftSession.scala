package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every entry point (Verify, Bench, tests)
  * builds its session here so configs stay consistent.
  *
  * - shuffle partitions sized to local cores (never the 200 default);
  *   on a real cluster this is overridden by AQE coalescing anyway.
  * - AQE on: runtime partition coalescing + skew-join splitting — the
  *   100 TB safety net for skewed keys.
  * - nanosAsLong: the events table carries TIMESTAMP(NANOS) parquet,
  *   which Spark 4 otherwise refuses; Tables.events converts back.
  * - UTC session TZ so date formatting matches the DuckDB oracle.
  */
object GraftSession {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // native kernels: dot_micros/proj_micros (codegen'd), minhash16,
      // the topk_min bounded-heap aggregate, and the bpe_count tokenizer
      .withExtensions(graft.functions.VectorExpressions.registerAll)
      .withExtensions(graft.functions.Bpe.registerAll)
      // SPARK_GRAFT_SHUFFLE: scale experiments size shuffle partitions
      // to the DATA (a cluster sizes this to executors × data; local
      // boards keep cores so gate plans stay comparable)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cores.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()
}
