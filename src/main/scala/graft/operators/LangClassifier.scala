package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Caches
import graft.functions.Portable

/** Learned language ID — [[QualityClassifier]]'s hashed-ngram linear
  * machinery made MULTICLASS and pointed at character trigrams with
  * language labels: exactly the public fastText-langid recipe (the
  * CCNet pipeline's language stage is a fastText linear model over
  * hashed char-ngram bags; langid.py is the same linear-over-char-ngram
  * family), where C3 is only the stopword heuristic.
  *
  * One-vs-all squared loss: per language a weight vector over
  * [[QualityClassifier.NumBuckets]] hashed char-trigram buckets plus a
  * bias, trained jointly — each epoch is ONE treeAggregate over the
  * compacted doc RDD folding ALL languages' gradients into one
  * (langs × buckets)-sized array (model-sized driver traffic, the C18
  * parameter-server shape; the epoch count does not multiply by the
  * class count). Every floor mirrors [[QualityClassifier]]'s
  * operand-for-operand — same Jacobi preconditioner (the curvature
  * diagonal depends only on FEATURES, so all classes share one h),
  * same heavy-ball momentum, same integer-micros quantization — so the
  * DuckDB oracle replays training as the SAME unrolled CTE rounds with
  * a `lang` key column ([[sqlCtes]]) and matches scores to the micro.
  *
  * Features: hashed counts of the [[Portable.normText]] char trigrams
  * (the C7 extraction, [[graft.functions.VectorExpressions
  * CharTrigramsExpr]] packed kernel, decoded only for the md5 bucket
  * hash both engines share). Documents with fewer than 3 normalized
  * code points carry no trigram and are excluded on BOTH sides.
  */
object LangClassifier {
  import QualityClassifier.{NumBuckets, Epochs, BetaNum, BetaDen}

  /** Weight step η = 1/EtaDen. Char-trigram bags are denser and more
    * collinear than C18's word bags (repeated trigrams give per-bucket
    * counts quadratically larger relative to n), so the preconditioned
    * spectrum tops out higher — η = 1/32 (C18's dial) measurably
    * DIVERGES here (the positive head walks to −16e6 micros on the
    * gate corpus); 1/256 sits under the measured stability bound and
    * converges on every test corpus.
    */
  val EtaDen = 256L

  /** weights(langIdx)(bucket), bias(langIdx) — micros. */
  final case class Model(weights: Array[Array[Long]], bias: Array[Long])

  /** (doc_id, b, c): hashed char-trigram counts — the COMPOSED
    * relational derivation, kept as the independent reference the
    * fused kernel is property-pinned against (KernelProps; the
    * lsh_buckets precedent).
    */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Portable.normText(col("text")).as("nt"))
      .filter(length(col("nt")) >= 3)
      .select(col("doc_id"),
        explode(call_function("char_trigrams", col("nt"))).as("g"))
      .select(col("doc_id"),
        pmod(Portable.hash32(call_function("trigram_string", col("g"))),
          lit(NumBuckets.toLong)).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** One row per doc: (doc_id, fs: array<struct<b,c>>, n) — since r15
    * via the fused `trigram_bag` kernel: the per-doc hashed bag is
    * computed MAP-SIDE in one code-point walk, so feature extraction
    * (both the LangIndex scoring path and this trainer's input) plans
    * zero shuffles where the composed [[features]] path exploded
    * ~300 trigram rows per doc through two corpus-sized exchanges
    * (the r15 §5 watch item: 24× for 10× data at sf10). Bucket ids
    * ascend within each bag (the kernel emits sorted nonzero
    * buckets); every consumer folds order-independently.
    */
  def docFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Portable.normText(col("text")).as("nt"))
      .filter(length(col("nt")) >= 3)
      .select(col("doc_id"),
        call_function("trigram_bag", col("nt"), lit(NumBuckets)).as("fs"))
      .withColumn("n",
        aggregate(col("fs"), lit(0L), (acc, f) => acc + f("c")))

  /** Compact training set: per doc (langIdx, n, buckets, counts), doc
    * count, and the shared Jacobi curvature diagonal — the
    * [[QualityClassifier.buildTrainData]] twin with a class label.
    */
  final case class TrainData(
      rdd: RDD[(Int, Long, Array[Int], Array[Long])],
      nDocs: Long,
      h: Array[Long])

  /** `df` columns: (`labelCol`: string, n, fs). `langs` fixes the class
    * index order (ties and the oracle's VALUES list follow it).
    */
  def buildTrainData(
      df: DataFrame, langs: Seq[String],
      labelCol: String = "lang"): TrainData = {
    val idx = langs.zipWithIndex.toMap
    val rdd = df.select(col(labelCol), col("n"), col("fs")).rdd.map { row =>
      val fs = row.getSeq[Row](2)
      val bs = new Array[Int](fs.length)
      val cs = new Array[Long](fs.length)
      var i = 0
      fs.foreach { f =>
        bs(i) = f.getLong(0).toInt; cs(i) = f.getLong(1); i += 1
      }
      (idx(row.getString(0)), row.getLong(1), bs, cs)
    }.persist(StorageLevel.MEMORY_AND_DISK)
    Caches.trackRdd(rdd)
    val (nDocs, h) = rdd.treeAggregate((0L, Array.fill(NumBuckets)(0L)))(
      { case ((cnt, acc), (_, n, bs, cs)) =>
        var i = 0
        while (i < bs.length) {
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

  /** One epoch's gradients for ALL classes in a single treeAggregate:
    * flat (langs × buckets) array + per-class bias residual sums. Each
    * task scores its docs under every class's closure weights — the
    * one-vs-all residual `r_l = p_l − [y = l]·1e6` folds the same
    * quantized per-(doc,bucket) terms as the binary trainer.
    */
  def epochGrad(
      td: TrainData, nLangs: Int,
      w: Array[Array[Long]], bias: Array[Long])
      : (Array[Long], Array[Long]) =
    td.rdd.treeAggregate(
      (Array.fill(nLangs * NumBuckets)(0L), Array.fill(nLangs)(0L)))(
      { case ((acc, accB), (y, n, bs, cs)) =>
        var l = 0
        while (l < nLangs) {
          var s = 0L
          var i = 0
          val wl = w(l)
          while (i < bs.length) { s += wl(bs(i)) * cs(i); i += 1 }
          val p = math.floor(s.toDouble / n.toDouble).toLong + bias(l)
          val r = p - (if (y == l) 1000000L else 0L)
          i = 0
          val off = l * NumBuckets
          while (i < bs.length) {
            acc(off + bs(i)) +=
              math.floor((r * cs(i)).toDouble / n.toDouble).toLong
            i += 1
          }
          accB(l) += r
          l += 1
        }
        (acc, accB)
      },
      { case ((a1, b1), (a2, b2)) =>
        var i = 0
        while (i < a1.length) { a1(i) += a2(i); i += 1 }
        i = 0
        while (i < b1.length) { b1(i) += b2(i); i += 1 }
        (a1, b1)
      })

  /** The full-batch loop — [[QualityClassifier.train]]'s update applied
    * per class with the SHARED curvature diagonal.
    */
  def train(td: TrainData, nLangs: Int, epochs: Int = Epochs): Model = {
    val w = Array.fill(nLangs)(Array.fill(NumBuckets)(0L))
    val v = Array.fill(nLangs)(Array.fill(NumBuckets)(0L))
    val bias = Array.fill(nLangs)(0L)
    val vb = Array.fill(nLangs)(0L)
    for (_ <- 0 until epochs) {
      val (g, gBias) = epochGrad(td, nLangs, w.map(_.clone()), bias.clone())
      for (l <- 0 until nLangs; b <- 0 until NumBuckets) {
        val step = math.floor(
          1000000.0 * g(l * NumBuckets + b).toDouble /
            (math.max(td.h(b), 1L).toDouble * EtaDen)).toLong
        v(l)(b) = math.floor(
          BetaNum.toDouble * v(l)(b).toDouble / BetaDen.toDouble).toLong + step
        w(l)(b) -= v(l)(b)
      }
      for (l <- 0 until nLangs) {
        val stepB = math.floor(gBias(l).toDouble / td.nDocs).toLong
        vb(l) = math.floor(
          BetaNum.toDouble * vb(l).toDouble / BetaDen.toDouble).toLong + stepB
        bias(l) -= vb(l)
      }
    }
    Model(w, bias)
  }

  // ---- DuckDB oracle: the identical multiclass loop as unrolled CTEs --

  /** CTE chain replaying char-trigram feature extraction, the shared
    * curvature aggregate, `epochs` preconditioned+momentum rounds with
    * a `lang` key on every weight/gradient table, and the final scoring
    * pass. `labelSql` yields the supervision as (doc_id, y: lang
    * string) over `docsRel` — the weak-label seam, same as
    * [[QualityClassifier.sqlCtes]]. Emits `lc_p{epochs}` (doc_id,
    * lang, p) and `lc_docs` (doc_id, lang, nt); the caller pivots and
    * cascades.
    */
  def sqlCtes(
      docsRel: String, langs: Seq[String], labelSql: String,
      epochs: Int): String = {
    val langValues = langs.map(l => s"('$l')").mkString(", ")
    val head = s"""
      lc_docs AS MATERIALIZED (
        SELECT doc_id, lang,
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' ')) AS nt
        FROM $docsRel
        WHERE length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' ')))
              >= 3),
      lc_gram AS MATERIALIZED (
        SELECT doc_id,
               ${graft.Op.xhash32("g")} % ${QualityClassifier.NumBuckets}
                 AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM (
          SELECT doc_id,
                 unnest([substr(nt, i, 3)
                   for i in generate_series(1, length(nt) - 2)]) AS g
          FROM lc_docs) u
        GROUP BY doc_id, b),
      lc_doc AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
        FROM lc_gram GROUP BY doc_id),
      lc_h AS MATERIALIZED (
        SELECT g.b,
               CAST(sum(CAST(floor(
                 (CAST(g.c AS DOUBLE) * g.c * 1000000) /
                 (CAST(d.n AS DOUBLE) * d.n)) AS BIGINT)) AS BIGINT) AS h
        FROM lc_gram g JOIN lc_doc d USING (doc_id)
        GROUP BY g.b),
      lc_langs AS (SELECT lang FROM (VALUES $langValues) t(lang)),
      lc_lab AS MATERIALIZED (
        $labelSql),
      lc_nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM lc_docs),
      lc_w0 AS (SELECT l.lang, CAST(r AS BIGINT) AS b,
                       CAST(0 AS BIGINT) AS w, CAST(0 AS BIGINT) AS v
                FROM lc_langs l
                CROSS JOIN range(0, ${QualityClassifier.NumBuckets}) t(r)),
      lc_bias0 AS (SELECT lang, CAST(0 AS BIGINT) AS bias,
                          CAST(0 AS BIGINT) AS vb
                   FROM lc_langs)"""
    def pred(e: Int) = s"""
      lc_p$e AS MATERIALIZED (
        SELECT g.doc_id, w.lang, d.n,
               CAST(floor(CAST(sum(g.c * w.w) AS DOUBLE) / d.n) AS BIGINT)
                 + b.bias AS p
        FROM lc_gram g JOIN lc_w$e w USING (b)
        JOIN lc_doc d USING (doc_id)
        JOIN lc_bias$e b ON b.lang = w.lang
        GROUP BY g.doc_id, w.lang, d.n, b.bias)"""
    val rounds = (0 until epochs).map { e =>
      val step = s"""CAST(floor(
                 1000000 * CAST(coalesce(g.g, 0) AS DOUBLE) /
                 (CAST(greatest(coalesce(h.h, 0), 1) AS DOUBLE) *
                   $EtaDen)) AS BIGINT)"""
      val mom =
        s"CAST(floor(${QualityClassifier.BetaNum} * CAST(w.v AS DOUBLE) / " +
          s"${QualityClassifier.BetaDen}) AS BIGINT)"
      val momB =
        s"CAST(floor(${QualityClassifier.BetaNum} * CAST(b0.vb AS DOUBLE) / " +
          s"${QualityClassifier.BetaDen}) AS BIGINT)"
      s"""${pred(e)},
      lc_r$e AS MATERIALIZED (
        SELECT p.doc_id, p.lang, p.n,
               p.p - (CASE WHEN l.y = p.lang THEN 1000000 ELSE 0 END) AS r
        FROM lc_p$e p JOIN lc_lab l USING (doc_id)),
      lc_g$e AS (
        SELECT r.lang, g.b,
               CAST(sum(CAST(floor(CAST(r.r * g.c AS DOUBLE) / r.n)
                 AS BIGINT)) AS BIGINT) AS g
        FROM lc_gram g JOIN lc_r$e r USING (doc_id)
        GROUP BY r.lang, g.b),
      lc_w${e + 1} AS MATERIALIZED (
        SELECT w.lang, w.b,
               w.w - ($mom + $step) AS w,
               $mom + $step AS v
        FROM lc_w$e w
        LEFT JOIN lc_g$e g ON g.lang = w.lang AND g.b = w.b
        LEFT JOIN lc_h h ON h.b = w.b),
      lc_bg$e AS (
        SELECT lang,
               CAST(floor(CAST(sum(r) AS DOUBLE) /
                 (SELECT nd FROM lc_nd)) AS BIGINT) AS sb
        FROM lc_r$e GROUP BY lang),
      lc_bias${e + 1} AS (
        SELECT b0.lang, b0.bias - ($momB + g.sb) AS bias,
               $momB + g.sb AS vb
        FROM lc_bias$e b0 JOIN lc_bg$e g USING (lang))"""
    }.mkString(",")
    s"$head,$rounds,${pred(epochs)}"
  }
}
