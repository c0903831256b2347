package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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
    * DuckDB twin: regexp_split_to_array(trim(expr, ' '), '\s+')
    * (the explicit ' ' char list pins DuckDB to Spark's ASCII-space trim:
    * default DuckDB trim also strips U+00A0)
    */
  def tokens(e: Column): Column = split(trim(e), "\\s+")

  /** Normalized text for fingerprinting: collapse whitespace, lowercase.
    * DuckDB twin: lower(trim(regexp_replace(expr, '\s+', ' ', 'g'), ' '))
    * (explicit ' ' — Spark's trim strips ASCII 0x20 only, DuckDB's
    * default also strips U+00A0; boundary NBSP text diverged at sf10)
    */
  def normText(e: Column): Column =
    lower(trim(regexp_replace(e, "\\s+", " ")))

  /** Distinct word-trigram shingles of lowercased text — the unit set for
    * n-gram Jaccard / MinHash dedup. concat_ws skips the NULL tails on
    * docs shorter than 3 tokens, matching DuckDB's out-of-range NULLs.
    *
    * DuckDB twin:
    *   list_distinct([concat_ws(' ', tok[i], tok[i+1], tok[i+2])
    *     for i in generate_series(1, greatest(len(tok)-2, 1))])
    *   with tok = regexp_split_to_array(trim(lower(text), ' '), '\s+')
    */
  def shingles(text: Column): Column =
    shinglesFromTokens(split(trim(lower(text)), "\\s+"))

  /** Shingles from an ALREADY MATERIALIZED token-array column. Callers on
    * a hot path must project the token array in a separate select first:
    * referencing `split(...)` directly here inlines the regex split into
    * every `element_at` of the lambda, re-tokenizing the document ~3×
    * per shingle (measured: 11s → <2s on the sf0.1 shingle explode).
    */
  def shinglesFromTokens(tok: Column): Column = ngramsFromTokens(tok, 3)

  /** Distinct word n-grams from an ALREADY MATERIALIZED token array —
    * the general form of [[shinglesFromTokens]] (same projection rule,
    * same partial-tail semantics via try_element_at; callers wanting
    * only full n-grams filter `size(tok) >= n` first). Decontamination
    * uses LONG n-grams (n=8 here, 13 in common practice) precisely so
    * stopword runs never collide.
    */
  def ngramsFromTokens(tok: Column, n: Int): Column =
    // native kernel ([[VectorExpressions.WordNgramsExpr]]) — identical
    // output to the array_distinct(transform(sequence, concat_ws ∘
    // try_element_at)) HOF chain (windows 1..max(len-n+1,1), NULL tail
    // tokens dropped, first-occurrence dedup), one JVM loop per doc
    // instead of interpreted per-window dispatch
    call_function("word_ngrams", tok, lit(n))

  /** All ordered pairs (ds[i], ds[j]), i<j, from a SORTED id array — the
    * bucket-local pair enumeration used by the dedup candidate
    * generators. Enumerating pairs inside each (small, bounded) bucket
    * replaces a self-join that would recompute the whole upstream
    * pipeline once per side; bucket sizes are bounded (shingle df / LSH
    * bucket occupancy), so the quadratic is local and tiny.
    */
  def pairCombinations(ds: Column): Column =
    flatten(transform(
      sequence(lit(1), size(ds) - 1),
      i => transform(
        sequence(i + 1, size(ds)),
        j => struct(element_at(ds, i).as("i"), element_at(ds, j).as("j")))))

  /** All i<j pairs of the array column `ds` streamed as ROWS (x, y) —
    * the generator-spelled twin of [[pairCombinations]] (r20, guide
    * §1.2 per-task work): higher-order `transform` lambdas are
    * CodegenFallback, so the array spelling pays one INTERPRETED
    * dispatch per pair (measured 66 s of task time on a 2.3 s pair
    * stage of the kNN build), while posexplode + explode(slice)
    * whole-stage-codegen and never materialize a per-group pair array.
    * Pair order and content are identical: x = ds[i] (0-based), y
    * ranges over ds[i+1..]. Every other column of `df` is dropped —
    * callers project what they need from x/y.
    */
  def pairRows(df: org.apache.spark.sql.DataFrame, ds: String)
      : org.apache.spark.sql.DataFrame =
    df.select(col(ds).as("__pr_ds"),
        posexplode(col(ds)).as(Seq("__pr_i", "x")))
      .select(col("x"),
        explode(slice(col("__pr_ds"), col("__pr_i") + lit(2),
          size(col("__pr_ds")) - col("__pr_i") - lit(1))).as("y"))

  /** Quantize a float/double to exact integer micros. floor(x*1e6 + 0.5)
    * (not round()) because engines disagree on halfway rounding modes —
    * floor is identical everywhere. DuckDB twin:
    *   CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT)
    */
  def qMicros(x: Column): Column =
    floor(x.cast(DoubleType) * lit(1000000.0) + lit(0.5))

  /** Exact integer dot product of two float vectors in micro units:
    * Σ q(a_i)·q(b_i) as a long — order-insensitive, bit-identical in any
    * engine (|x|≤1, 64 dims → ≤ ~6.4e13, far inside Long). This makes
    * cosine similarity run-to-run reproducible regardless of partitioning.
    *
    * Dispatches to the codegen'd native kernel
    * ([[VectorExpressions.DotMicrosExpr]], registered by GraftSession) —
    * a zip_with/aggregate HOF formulation computes the same value but
    * runs interpreted, ~5-10× slower on similarity joins.
    *
    * DuckDB twin (via generate_series(1, dims) indexing):
    *   CAST(list_sum(list_transform(generate_series(1,64), ix ->
    *     CAST(floor(CAST(a[ix] AS DOUBLE)*1000000+0.5) AS BIGINT) *
    *     CAST(floor(CAST(b[ix] AS DOUBLE)*1000000+0.5) AS BIGINT)))
    *     AS BIGINT)
    */
  def dotMicros(a: Column, b: Column): Column =
    call_function("dot_micros", a, b)

  /** Exact integer projection onto integer weights (LSH kernel):
    * Σ q(v_i)·w_i. Codegen'd ([[VectorExpressions.ProjMicrosExpr]]).
    */
  def projMicros(v: Column, w: Column): Column =
    call_function("proj_micros", v, w)

  /** 16-function MinHash signature of a shingle-set column as
    * array<long> — the native kernel
    * ([[VectorExpressions.Minhash16Expr]]); hash i of shingle s ≡ DuckDB
    * CAST(('0x' || substr(md5(concat('g<i/4>|', s)), 8*(i%4)+1, 8)) AS
    * BIGINT), minimum over the set.
    */
  def minhash16(shs: Column): Column = call_function("minhash16", shs)

  /** Bounded-heap top-k aggregate ([[TopKAggregate TopKMinAgg]]): the k
    * lexicographically-smallest `ordStruct` values as a sorted array,
    * with map-side partial aggregation (shuffle carries ≤ k rows per
    * group per partition — the scale path for rank-per-group top-k).
    * Encode DESC by negating a numeric field; include a unique
    * tie-break field to keep the ordering total.
    */
  def topkMin(ordStruct: Column, k: Int): Column =
    call_function("topk_min", ordStruct, lit(k))

  /** Merge-table BPE token count of a RAW text column ([[Bpe]] — the
    * expression simple-lowercases per code point itself, matching the
    * oracle's utf8proc `lower()`; a Spark `lower()` here would apply the
    * JVM's full string mapping, which diverges on e.g. U+0130). DuckDB
    * twin: the recursive CTE [[Bpe.sqlWordLenCte]]/[[Bpe.sqlDocCountCtes]]
    * replaying the same merges.
    */
  def bpeCount(text: Column): Column =
    call_function("bpe_count", text)

  /** Byte-level (no-OOV) BPE token count of a RAW text column — the
    * GPT-2-family pricing: word symbols are UTF-8 bytes, residual code
    * points price per byte. DuckDB twin: [[Bpe.sqlWordLenCteBytes]] /
    * [[Bpe.sqlDocCountCtesBytes]].
    */
  def bpeCountBytes(text: Column): Column =
    call_function("bpe_count_bytes", text)

  /** Cosine similarity from exact micro dot products: one double division
    * over identical integers → identical doubles everywhere. `na`/`nb` are
    * the precomputed self-dots (dotMicros(v, v)).
    */
  def cosineFromMicros(dot: Column, na: Column, nb: Column): Column =
    dot.cast(DoubleType) / (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType)))
}
