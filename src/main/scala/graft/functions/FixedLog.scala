package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** Engine-portable fixed-point log2 — the log-domain scoring primitive.
  *
  * The text ops deliberately avoid `ln()` (engines differ in the last
  * ULP, so micro-rounded log scores can hash-mismatch at a boundary) and
  * until now substituted rational surrogates (`tot div cnt` in
  * text_rarity, the rational idf in text_bm25). Those keep per-TERM
  * monotonicity but lose the log's additivity: a SUM of rational
  * rarities is dominated by its single rarest term, where a sum of logs
  * is the log of the product — the actual information content. This
  * helper provides real log2 as an EXACT integer recipe
  * ([[VectorExpressions.Log2Q16Expr]] in the engine, [[sqlRounds]] as
  * the DuckDB twin): both sides execute the identical shifts and
  * truncating divides, so the BIGINT result is bit-identical by
  * construction, with ≈2^-16 bits of (deterministic, shared)
  * approximation error vs true log2 across the full int64 ratio range
  * (two-sided normalization — a tiny den under a huge num keeps its
  * exponent bits).
  *
  * Q16 fixed point: the returned long is floor-ish(log2(num/den)·2^16);
  * divide by 65536.0 for a readable double (one IEEE divide — portable).
  * Contract num ≥ den ≥ 1.
  */
object FixedLog {

  /** `log2(num/den)` in Q16 fixed point as a long (native kernel). */
  def bitsQ16(num: Column, den: Column): Column =
    call_function("log2_q16", num, den)

  /** DuckDB twin of [[bitsQ16]] as a chained-CTE fragment.
    *
    * Emits CTEs `{out}_a`, `{out}_b`, `{out}_c`, `{out}_r1..r16`, and
    * finally `{out}` with columns `keyCols :+ bits_q16`. `src` must
    * expose `keyCols` plus the expressions `numExpr`/`denExpr`
    * (BIGINTs, num ≥ den ≥ 1). Internal columns are prefixed `lm_` —
    * keep key columns clear of that prefix. The 16 unrolled rounds are
    * the same square-and-shift loop the kernel runs: one fractional bit
    * per round, every intermediate inside a signed 64-bit integer
    * (mantissa < 2^31, square < 2^62; operands normalized to 33 bits).
    */
  def sqlRounds(
      src: String,
      keyCols: Seq[String],
      numExpr: String,
      denExpr: String,
      out: String): String = {
    val keys = keyCols.mkString(", ")
    val round = (i: Int) => {
      val prev = if (i == 1) s"${out}_c" else s"${out}_r${i - 1}"
      s"""${out}_r$i AS (
        SELECT $keys, lm_e,
          CASE WHEN lm_v*lm_v >= (CAST(1 AS BIGINT) << 61)
               THEN (lm_v*lm_v) >> 31 ELSE (lm_v*lm_v) >> 30 END AS lm_v,
          lm_acc*2 + (CASE WHEN lm_v*lm_v >= (CAST(1 AS BIGINT) << 61)
                           THEN 1 ELSE 0 END) AS lm_acc
        FROM $prev)"""
    }
    s"""${out}_a AS (
        SELECT $keys, CAST($numExpr AS BIGINT) AS lm_num,
               CAST($denExpr AS BIGINT) AS lm_den FROM $src),
      ${out}_b AS (
        SELECT $keys, lm_bn, lm_bd,
               CASE WHEN lm_bn <= 33 THEN lm_num << (33 - lm_bn)
                    ELSE lm_num >> (lm_bn - 33) END AS lm_n2,
               CASE WHEN lm_bd <= 33 THEN lm_den << (33 - lm_bd)
                    ELSE lm_den >> (lm_bd - 33) END AS lm_d2
        FROM (SELECT *, length(bin(lm_num)) AS lm_bn,
                     length(bin(lm_den)) AS lm_bd
              FROM ${out}_a) x),
      ${out}_c AS (
        SELECT $keys,
               (lm_bn - lm_bd) + (CASE WHEN lm_n2 >= lm_d2
                                       THEN 0 ELSE -1 END) AS lm_e,
               CASE WHEN lm_n2 >= lm_d2 THEN (lm_n2 << 30) // lm_d2
                    ELSE ((lm_n2 << 30) // lm_d2) << 1 END AS lm_v,
               CAST(0 AS BIGINT) AS lm_acc
        FROM ${out}_b),
      ${(1 to 16).map(round).mkString(",\n      ")},
      $out AS (
        SELECT $keys, CAST((lm_e << 16) + lm_acc AS BIGINT) AS bits_q16
        FROM ${out}_r16)"""
  }
}
