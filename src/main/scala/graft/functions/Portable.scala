package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable deterministic primitives.
  *
  * Each helper has a DuckDB-SQL twin (given in the scaladoc) that produces
  * bit-identical results, so the driver's DuckDB oracle can replay every
  * query exactly. The key idea: keep all *per-row* math in IEEE doubles
  * (deterministic across engines), and make every *aggregation* either an
  * exact integer sum or an order-insensitive op (min/max/count), so shuffle
  * and aggregation order can never change the answer. This matters at
  * 100 TB exactly as much as for the oracle: results become run-to-run
  * reproducible regardless of partitioning.
  */
object Portable {

  /** Exact portable sum of a per-row double expression.
    *
    * Rounds the per-row value to integer micros (a deterministic IEEE op),
    * sums as longs (exact, order-insensitive), scales back. Safe up to
    * ~9.2e18 micros ≈ 9.2e12 in value — far beyond any test aggregate.
    *
    * DuckDB twin:
    *   CAST(sum(CAST(round((expr)*1000000) AS BIGINT)) AS BIGINT)/1000000.0
    */
  def exactSum(e: Column): Column =
    sum(round(e * lit(1000000.0)).cast(LongType)) / lit(1000000.0)

  /** Portable exact average: exactSum / count, one double division.
    * DuckDB twin: (exactSum-twin) / count(*)  (careful: same grouping).
    */
  def exactAvg(e: Column): Column = exactSum(e) / count(lit(1))

  /** Portable unsigned 32-bit hash: first 8 hex chars of md5 as a long.
    * Uniform, deterministic, identical in any engine with md5().
    *
    * DuckDB twin: CAST(('0x' || substr(md5(expr),1,8)) AS BIGINT)
    */
  def hash32(e: Column): Column =
    conv(substring(md5(e), 1, 8), 16, 10).cast(LongType)

  /** Portable 60-bit positive hash (15 hex chars — stays clear of the
    * sign bit so `>>`/`&` behave identically everywhere).
    *
    * DuckDB twin: CAST(('0x' || substr(md5(expr),1,15)) AS BIGINT)
    */
  def hash60(e: Column): Column =
    conv(substring(md5(e), 1, 15), 16, 10).cast(LongType)

  /** Whitespace tokenization of trimmed text.
    * DuckDB twin: regexp_split_to_array(trim(expr), '\s+')
    */
  def tokens(e: Column): Column = split(trim(e), "\\s+")

  /** Normalized text for fingerprinting: collapse whitespace, lowercase.
    * DuckDB twin: lower(trim(regexp_replace(expr, '\s+', ' ', 'g')))
    */
  def normText(e: Column): Column =
    lower(trim(regexp_replace(e, "\\s+", " ")))
}
