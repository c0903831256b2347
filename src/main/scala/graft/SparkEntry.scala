package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full operator inventory (SURVEY.md §2). */
  def allOps: Seq[Op] =
    RelationalOps.all ++ SinkOps.all ++ TextOps.all ++ DedupOps.all ++
      AnnOps.all ++ MultimodalOps.all ++ PipelineOps.all ++
      EmbeddingOps.all ++ BitextOps.all ++ GopherRep.all ++
      RetrievalOps.all ++ GraphAnnOps.all ++ HnswOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.key -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(sql => op.key -> sql)).toMap
}
