package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark query
  * plus (when SQL-expressible) a DuckDB oracle that must produce identical
  * rows on the same parquet tables.
  */
final case class Op(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  /** DuckDB twin of [[graft.functions.Portable.exactSum]]. */
  def xsum(expr: String): String =
    s"CAST(sum(CAST(round(($expr)*1000000) AS BIGINT)) AS BIGINT)/1000000.0"

  /** DuckDB twin of [[graft.functions.Portable.hash32]]. */
  def xhash32(expr: String): String =
    s"CAST(('0x' || substr(md5($expr),1,8)) AS BIGINT)"

  /** DuckDB twin of [[graft.functions.Portable.hash60]]. */
  def xhash60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr),1,15)) AS BIGINT)"
}
