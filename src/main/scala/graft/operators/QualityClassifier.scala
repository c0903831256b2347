package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.apache.spark.storage.StorageLevel

import graft.Caches
import graft.functions.Portable

/** fastText-style learned quality scorer — the standard curation-stack
  * classifier (a linear model over hashed n-gram bag features, cf. the
  * public fastText / CCNet quality-filter recipe) trained by a few
  * distributed full-batch gradient rounds and applied map-only.
  *
  * Everything is engine-portable integer/IEEE arithmetic so the DuckDB
  * oracle can replay TRAINING AND SCORING exactly (the same bar the
  * learned tokenizer meets, see [[TokenizerIndex]]):
  *
  *  - features: unigram + bigram counts of whitespace tokens, hashed into
  *    [[NumBuckets]] buckets with [[Portable.hash32]] (both engines md5).
  *  - model: weights and bias in integer MICROS; the per-doc raw score
  *    `S = Σ_b w_b·c_b` is an exact order-insensitive BIGINT sum, then
  *    normalized once per doc: `p = floor(S / n) + bias` (length-
  *    normalized bag like fastText's mean-of-vectors — one deterministic
  *    floor instead of a per-term IEEE division whose summation order
  *    would differ between engines).
  *  - label: weak supervision distilled from the C2 heuristic gate
  *    (`quality_score > 0.5`) — the same bootstrap the public quality
  *    classifiers use ("wiki-like vs not" stands in for a labeled set).
  *  - training: full-batch squared-loss gradient descent with QUANTIZED
  *    gradients — each per-(doc,bucket) term is floored to an integer,
  *    `g_b = Σ_d floor(r_d·c_b / n_d)`, so the epoch aggregate is again
  *    an exact BIGINT sum and shuffle order can never change the model.
  *    Simplex-normalized bags are brutally ill-conditioned (measured:
  *    λ spans 1e-2 … 1e-7), so raw GD learns only the bias; the update
  *    is therefore JACOBI-PRECONDITIONED — per-bucket curvature
  *    `h_b = Σ_d floor(1e6·x_b²)` is aggregated once, and each step is
  *    `Δw_b = floor(1e6·g_b / (max(h_b,1)·EtaDen))` — plus heavy-ball
  *    momentum `v ← floor(βv) + Δ` (β = [[BetaNum]]/[[BetaDen]]),
  *    which cuts the epoch count for the small surviving κ. η = 1/32
  *    sits under the measured preconditioned stability bound 2/λ̃max
  *    (λ̃max ≈ 47 → bound ≈ 1/23). The bias keeps η = 1, no
  *    preconditioner: its curvature is exactly 1. Epochs unroll in the
  *    oracle as CTE rounds ([[sqlCtes]]), the same shape as
  *    [[graft.functions.Bpe.sqlTrainCtes]].
  *
  * Scale shape (the parameter-server pattern at 100 TB, and exactly how
  * MLlib's own linear trainers are built): the corpus is scanned ONCE
  * into the one-row-per-doc frame `(doc_id, y, n, fs: array<(b, c)>)`
  * ([[docFrame]], declarative — pruning/pushdown apply), which
  * [[buildTrainData]] compacts into a persisted RDD of primitive
  * arrays; every epoch is then ONE `treeAggregate` over that RDD — the
  * model is a [[NumBuckets]]-long closure array, each task folds its
  * docs into a model-sized partial gradient, and the tree combine ships
  * ≤ depth·partitions such arrays. No per-epoch query planning, no
  * join, no shuffle of data rows; driver traffic is the B+1-value
  * gradient (the bounded-collect class documented for the BPE trainer's
  * argmax). This is the one place the engine drops to the RDD API on
  * purpose: an iterative model loop re-planned 16× by Catalyst costs
  * ~0.4 s/epoch in pure planning/codegen (measured — data-size
  * independent), while the treeAggregate epoch is a plain cached-RDD
  * job; MLlib draws the line in the same place. Scoring stays a
  * Dataset pass: one map-only fold under the final weights. (At 100 TB
  * a deployment would train on a deterministic hash-sample of documents
  * and score the full corpus with the same pass; the board trains
  * full-batch because the test corpora are small enough that a sample
  * underfits.)
  */
object QualityClassifier {

  /** Hashed feature-space size. Small on purpose (fastText uses 2M for
    * open-vocabulary tasks; a quality gate needs far fewer) — the weight
    * vector must stay a literal/driver object, and the oracle replays it
    * as a `range(0, NumBuckets)` CTE.
    */
  val NumBuckets = 256

  /** Full-batch GD rounds; each epoch is one pass over the persisted
    * doc frame. 16 preconditioned+momentum rounds reach the
    * least-squares ceiling of this feature family on every test corpus
    * (measured: within 2% of the closed-form optimum's MSE).
    */
  val Epochs = 16

  /** Weight step: `Δw_b = floor(1e6·g_b / (max(h_b,1)·EtaDen))` — the
    * Jacobi-preconditioned η = 1/EtaDen.
    */
  val EtaDen = 32L

  /** Heavy-ball momentum β = BetaNum/BetaDen for weights and bias. */
  val BetaNum = 4L
  val BetaDen = 5L

  /** Micros threshold for the positive class (= 0.5 in label space). */
  val PredThreshold = 500000L

  final case class Model(weights: Array[Long], bias: Long)

  /** The gram array (unigrams + word bigrams) of a token-array column —
    * ONE definition shared by [[features]] (the batch training/scoring
    * path) and the streaming quality gate
    * ([[graft.streaming.DocIngest.qualityGateLearned]]), so edge and
    * batch featurize identically by construction (the A18 shared-code
    * doctrine).
    */
  private[graft] def gramsOf(tok: Column): Column = {
    val bigrams = when(size(tok) >= 2,
      transform(sequence(lit(1), size(tok) - 1),
        i => concat_ws(" ", element_at(tok, i),
          element_at(tok, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    concat(tok, bigrams)
  }

  /** The standard tokenization the gram features ride on. */
  private[graft] def tokCol: Column = split(trim(lower(col("text"))), "\\s+")

  /** A gram's hashed feature bucket (shared with the edge gate). */
  private[graft] def bucketOf(g: Column): Column =
    pmod(Portable.hash32(g), lit(NumBuckets.toLong))

  /** (doc_id, b, c): hashed unigram+bigram counts — the one corpus scan.
    */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokCol.as("tok"))
      .select(col("doc_id"), explode(gramsOf(col("tok"))).as("g"))
      .select(col("doc_id"), bucketOf(col("g")).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** One row per doc: (doc_id, n, fs: array<struct<b,c>>). The array
    * order is whatever collect_list produced — every consumer folds it
    * with exact integer sums, so order can't leak into results. n ≥ 1:
    * even an empty text tokenizes to the single empty unigram, so the
    * floor-division normalizer never sees 0.
    */
  def docFrame(docs: DataFrame): DataFrame =
    // repartition(doc_id) before the gram/md5 featurize (r19, the
    // shingleSets pattern): a small corpus arrives as ONE input split,
    // which serializes the CPU-bound hashing on a single task (measured
    // 0.9 s single-task at sf0.1); the same hash-spread protects
    // against skewed splits at scale. The groupBy then needs NO new
    // exchange — HashPartitioning(doc_id) already satisfies its
    // clustering — so this REPLACES the aggregate's shuffle (of
    // exploded gram rows) with a narrower shuffle of the raw doc rows.
    docFrameWith(docs, Seq.empty)

  /** [[docFrame]] with per-doc PASS-THROUGH columns computed in the
    * same corpus scan (r20, guide §2.4): consumers that score AND need
    * other per-doc projections (labels, token counts, verdicts)
    * previously re-scanned `documents` and shuffle-joined the two
    * frames back on doc_id. The extras are constant per doc_id, so
    * carrying them through both aggregates with first() is exact, the
    * carried bytes never cross an exchange (both groupBys reuse the
    * spread's HashPartitioning(doc_id)), and the join disappears.
    */
  def docFrameWith(docs: DataFrame, extra: Seq[(String, Column)]): DataFrame = {
    val names = extra.map(_._1)
    val pre = graft.Tables.spread(docs, col("doc_id"))
      .select(col("doc_id") +: extra.map { case (n, c) => c.as(n) } :+
        tokCol.as("tok"): _*)
    val perBucket = pre
      .select(col("doc_id") +: names.map(col) :+
        explode(gramsOf(col("tok"))).as("g"): _*)
      .select(col("doc_id") +: names.map(col) :+
        bucketOf(col("g")).as("b"): _*)
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"), names.map(n => first(col(n)).as(n)): _*)
    perBucket.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("b"), col("c"))).as("fs"),
        sum(col("c")).as("n") +: names.map(n => first(col(n)).as(n)): _*)
  }

  /** Per-doc score in micros under (w, bias), as a column over the doc
    * frame: `p = floor(Σ w_b·c_b / n) + bias`. The fold accumulator is
    * an exact Long; the model is an array LITERAL — no join, no
    * broadcast exchange, the epoch stays one stage.
    */
  def scoreCol(w: Array[Long], bias: Long): Column = {
    val wl = typedlit(w.toSeq)
    val sRaw = aggregate(col("fs"), lit(0L),
      (acc, f) => acc +
        element_at(wl, (f("b") + lit(1L)).cast("int")) * f("c"))
    floor(sRaw.cast(DoubleType) / col("n").cast(DoubleType))
      .cast(LongType) + lit(bias)
  }

  /** Compact materialized training set: per doc (y, n, bucket ids, gram
    * counts) as primitive arrays, plus the doc count and the Jacobi
    * curvature diagonal — everything the epoch loop touches. The RDD is
    * persisted and [[Caches]]-scoped; nDocs and h come out of the SAME
    * first pass that materializes it.
    */
  final case class TrainData(
      rdd: RDD[(Long, Long, Array[Int], Array[Long])],
      nDocs: Long,
      h: Array[Long])

  /** One pass over the doc frame: compact rows to primitive arrays,
    * persist, and fold doc count + curvature
    * `h_b = Σ_d floor(1e6·(c/n)²)` (quantized per-term like the
    * gradient, so the sum is exact and order-insensitive).
    */
  def buildTrainData(df: DataFrame): TrainData = {
    val rdd = df.select(col("y"), col("n"), col("fs")).rdd.map { row =>
      val fs = row.getSeq[Row](2)
      val bs = new Array[Int](fs.length)
      val cs = new Array[Long](fs.length)
      var i = 0
      fs.foreach { f =>
        bs(i) = f.getLong(0).toInt; cs(i) = f.getLong(1); i += 1
      }
      (row.getLong(0), row.getLong(1), bs, cs)
    }.persist(StorageLevel.MEMORY_AND_DISK)
    Caches.trackRdd(rdd)
    val (nDocs, h) = rdd.treeAggregate((0L, Array.fill(NumBuckets)(0L)))(
      { case ((cnt, acc), (_, n, bs, cs)) =>
        var i = 0
        while (i < bs.length) {
          // mirrors the oracle's qc_h term operand-for-operand:
          // floor((CAST(c AS DOUBLE)·c·1e6) / (CAST(n AS DOUBLE)·n))
          acc(bs(i)) += math.floor(
            (cs(i).toDouble * cs(i) * 1000000.0) /
              (n.toDouble * n)).toLong
          i += 1
        }
        (cnt + 1, acc)
      },
      { case ((c1, a1), (c2, a2)) =>
        var i = 0
        while (i < NumBuckets) { a1(i) += a2(i); i += 1 }
        (c1 + c2, a1)
      })
    TrainData(rdd, nDocs, h)
  }

  /** One epoch's gradient: (per-bucket g_b, bias gradient Σr) in a
    * single treeAggregate — each task scores its docs under the closure
    * weights and folds quantized per-(doc,bucket) terms
    * `floor(r·c / n)` into a model-sized array (exact BIGINT products,
    * one deterministic floor per term, order-insensitive sums).
    */
  def epochGrad(td: TrainData, w: Array[Long], bias: Long)
      : (Array[Long], Long) =
    td.rdd.treeAggregate((Array.fill(NumBuckets)(0L), 0L))(
      { case ((acc, accB), (y, n, bs, cs)) =>
        var s = 0L
        var i = 0
        while (i < bs.length) { s += w(bs(i)) * cs(i); i += 1 }
        val p = math.floor(s.toDouble / n.toDouble).toLong + bias
        val r = p - y * 1000000L
        i = 0
        while (i < bs.length) {
          acc(bs(i)) += math.floor((r * cs(i)).toDouble / n.toDouble).toLong
          i += 1
        }
        (acc, accB + r)
      },
      { case ((a1, b1), (a2, b2)) =>
        var i = 0
        while (i < NumBuckets) { a1(i) += a2(i); i += 1 }
        (a1, b1 + b2)
      })

  /** Full-batch GD driver loop: [[Epochs]] treeAggregate jobs, each
    * returning the model-sized gradient. Every floor mirrors the
    * oracle's SQL expression operand-for-operand, so the trained model
    * is bit-identical across engines.
    */
  def train(td: TrainData, epochs: Int = Epochs): Model = {
    val w = Array.fill(NumBuckets)(0L)
    val v = Array.fill(NumBuckets)(0L)
    var bias = 0L
    var vb = 0L
    for (_ <- 0 until epochs) {
      val (g, gBias) = epochGrad(td, w.clone(), bias)
      for (b <- 0 until NumBuckets) {
        val step = math.floor(
          1000000.0 * g(b).toDouble /
            (math.max(td.h(b), 1L).toDouble * EtaDen)).toLong
        v(b) = math.floor(
          BetaNum.toDouble * v(b).toDouble / BetaDen.toDouble).toLong + step
        w(b) -= v(b)
      }
      val stepB = math.floor(gBias.toDouble / td.nDocs).toLong
      vb = math.floor(
        BetaNum.toDouble * vb.toDouble / BetaDen.toDouble).toLong + stepB
      bias -= vb
    }
    Model(w, bias)
  }

  /** Scoring pass under a trained model: map-only over the doc frame. */
  def score(df: DataFrame, model: Model): DataFrame = {
    val p = scoreCol(model.weights, model.bias)
    df.select(col("doc_id"), col("y"), p.as("score_micros"),
      (p >= lit(PredThreshold)).as("is_quality_pred"))
  }

  // ---- DuckDB oracle: the identical training loop as unrolled CTEs ----

  /** CTE chain replaying feature extraction, the curvature aggregate,
    * `epochs` preconditioned+momentum GD rounds, and the final scoring
    * pass. Emits `qc_p{epochs}` (doc_id, n, p) and `qc_lab` (doc_id, y);
    * the caller's SELECT joins them. `labelSql` is the C2 weak-label
    * expression over `docsRel`.
    */
  def sqlCtes(docsRel: String, labelSql: String, epochs: Int): String = {
    val head = s"""
      qc_tok AS MATERIALIZED (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM $docsRel),
      qc_gram AS MATERIALIZED (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % $NumBuckets
                 AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM (
          SELECT doc_id, unnest(tok) AS g FROM qc_tok
          UNION ALL
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(tok) - 1),
                   i -> tok[i] || ' ' || tok[i + 1])) AS g
          FROM qc_tok) u
        GROUP BY doc_id, b),
      qc_doc AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
        FROM qc_gram GROUP BY doc_id),
      qc_h AS MATERIALIZED (
        SELECT g.b,
               CAST(sum(CAST(floor(
                 (CAST(g.c AS DOUBLE) * g.c * 1000000) /
                 (CAST(d.n AS DOUBLE) * d.n)) AS BIGINT)) AS BIGINT) AS h
        FROM qc_gram g JOIN qc_doc d USING (doc_id)
        GROUP BY g.b),
      qc_lab AS MATERIALIZED (
        $labelSql),
      qc_nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM qc_lab),
      qc_w0 AS (SELECT CAST(r AS BIGINT) AS b, CAST(0 AS BIGINT) AS w,
                       CAST(0 AS BIGINT) AS v
                FROM range(0, $NumBuckets) t(r)),
      qc_bias0 AS (SELECT CAST(0 AS BIGINT) AS bias, CAST(0 AS BIGINT) AS vb)"""
    def pred(e: Int) = s"""
      qc_p$e AS MATERIALIZED (
        SELECT g.doc_id, d.n,
               CAST(floor(CAST(sum(g.c * w.w) AS DOUBLE) / d.n) AS BIGINT)
                 + (SELECT bias FROM qc_bias$e) AS p
        FROM qc_gram g JOIN qc_w$e w USING (b) JOIN qc_doc d USING (doc_id)
        GROUP BY g.doc_id, d.n)"""
    val rounds = (0 until epochs).map { e =>
      val step = s"""CAST(floor(
                 1000000 * CAST(coalesce(g.g, 0) AS DOUBLE) /
                 (CAST(greatest(coalesce(h.h, 0), 1) AS DOUBLE) * $EtaDen))
                 AS BIGINT)"""
      val mom = s"CAST(floor($BetaNum * CAST(w.v AS DOUBLE) / $BetaDen) AS BIGINT)"
      s"""${pred(e)},
      qc_r$e AS MATERIALIZED (
        SELECT p.doc_id, p.n, p.p - l.y * 1000000 AS r
        FROM qc_p$e p JOIN qc_lab l USING (doc_id)),
      qc_g$e AS (
        SELECT g.b,
               CAST(sum(CAST(floor(CAST(r.r * g.c AS DOUBLE) / r.n)
                 AS BIGINT)) AS BIGINT) AS g
        FROM qc_gram g JOIN qc_r$e r USING (doc_id)
        GROUP BY g.b),
      qc_w${e + 1} AS MATERIALIZED (
        SELECT w.b,
               w.w - ($mom + $step) AS w,
               $mom + $step AS v
        FROM qc_w$e w
        LEFT JOIN qc_g$e g USING (b)
        LEFT JOIN qc_h h USING (b)),
      qc_bias${e + 1} AS (
        SELECT b0.bias - (CAST(floor($BetaNum * CAST(b0.vb AS DOUBLE)
                   / $BetaDen) AS BIGINT)
                 + CAST(floor(CAST((SELECT sum(r) FROM qc_r$e) AS DOUBLE)
                     / (SELECT nd FROM qc_nd)) AS BIGINT)) AS bias,
               CAST(floor($BetaNum * CAST(b0.vb AS DOUBLE) / $BetaDen)
                   AS BIGINT)
                 + CAST(floor(CAST((SELECT sum(r) FROM qc_r$e) AS DOUBLE)
                     / (SELECT nd FROM qc_nd)) AS BIGINT) AS vb
        FROM qc_bias$e b0)"""
    }.mkString(",")
    s"$head,$rounds,${pred(epochs)}"
  }
}
