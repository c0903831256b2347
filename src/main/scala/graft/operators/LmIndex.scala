package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints

/** Persistent reference bigram-LM artifact — the [[QualityIndex]]
  * pattern applied to C19b/C20's held-out language model. The board
  * queries (`lm_bigram_ref`, `quality_ppl_buckets`) re-aggregate the
  * reference half's bigram counts inline per query; this is the actual
  * CCNet deployment shape made durable: train the LM ONCE on a
  * reference corpus (their Wikipedia), persist the aggregated counts,
  * and score every incoming corpus (their Common Crawl) against the
  * LOADED model — the reference corpus is never re-read. At 100 TB the
  * difference is a full reference-corpus aggregation per consumer
  * query vs a model-sized parquet read.
  *
  * Unlike [[QualityIndex]] (whose model is 2 KB of weights) this
  * artifact is FRAME-shaped: the model is the reference's distinct
  * (w1, w2) bigram counts — Zipf-bounded far below corpus size, but
  * not driver-sized — so it persists as parquet frames under the
  * standard completion-marker bracket, and scoring joins against it
  * exactly as the inline path joins against its in-session aggregate.
  * Unigram (prefix) totals and the continuation vocabulary are DERIVED
  * from the bigram frame at load, never stored beside it, so the three
  * model components cannot disagree.
  *
  * Shared definitions, not parallel ones: [[TextOps]]' C19b scoring
  * path is expressed through [[bigramCounts]]/[[refFromCounts]]/
  * [[scoreCounts]] below, so the artifact cycle and the oracle-checked
  * board queries are definitionally one scoring kernel
  * ([[graft.functions.FixedLog.bitsQ16]] — integer-exact, replayable
  * in DuckDB). Counts are MERGEABLE, so [[append]] folds new reference
  * documents into a saved model by summed union, committed by the
  * staged-sibling + atomic-rename discipline (crash leaves the
  * previous complete model intact).
  *
  * Reference sink analogy: course_published.py:118-153 re-serializes
  * the full block tree on every publish; the persisted-model move is
  * the same dump-once/consume-many economics the sink tables give its
  * downstream queries.
  */
object LmIndex {

  /** A reference model: `bigrams(w1, w2, cnt)` plus the 1-row
    * `vocab(v)` frame (distinct continuation count) — kept as frames,
    * not collected, so training is fully lazy and the board's
    * per-query cache scoping applies unchanged.
    */
  final case class Ref(bigrams: DataFrame, vocab: DataFrame)

  /** Per-document bigram occurrence counts (doc_id, w1, w2, c) —
    * C19/C19b's exact tokenization: whitespace tokens of lowercased
    * text, documents with < 2 tokens contribute nothing.
    */
  def bigramCounts(docs: DataFrame): DataFrame =
    // repartition(doc_id): spread the tokenize+explode off the single
    // input split AND pre-satisfy the (doc_id, w1, w2) grouping — the
    // aggregate's exchange of exploded gram rows is replaced by one
    // narrow shuffle of the raw doc rows (r19, the shingleSets pattern)
    graft.Tables.spread(docs, col("doc_id"))
      .select(col("doc_id"), TextOps.toks(col("text")).as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tok)-1), i -> " +
          "named_struct('w1', element_at(tok, i), 'w2', element_at(tok, i+1)))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("c"))

  /** Aggregate per-doc counts into a model: corpus-wide bigram totals
    * and the continuation vocabulary size. `cache` wraps the bigram
    * frame before the vocab derives from it, so a caller scoping the
    * model in-session (the C19b board path) persists ONE frame and
    * both consumers read it.
    */
  def refFromCounts(
      docbg: DataFrame,
      cache: DataFrame => DataFrame = identity): Ref = {
    val bg = cache(docbg.groupBy("w1", "w2").agg(sum(col("c")).as("cnt")))
    Ref(bg, bg.select(countDistinct(col("w2")).as("v")))
  }

  /** Train a reference model over a document corpus (the caller picks
    * the reference slice — C19b passes the even-doc_id half; a
    * deployment passes its curated reference corpus).
    */
  def train(docs: DataFrame): Ref = refFromCounts(bigramCounts(docs))

  /** Score pre-counted documents under a model:
    * (doc_id, n_bigrams, sum_bits_q16) with add-one smoothing —
    * bits = log2((c_prefix + V) / (c + 1)), unseen prefixes degrading
    * to log2(V). The model side is bigram-frame-sized: the prefix
    * totals are a reaggregation of the model frame itself and the
    * vocabulary broadcast is one row; only the doc-side fan-out is
    * corpus-scaled.
    */
  def scoreCounts(docbg: DataFrame, ref: Ref): DataFrame =
    scoreBits(docbg, ref)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("bits_q16")).as("sum_bits_q16"))

  /** The pre-aggregation scored frame behind [[scoreCounts]]:
    * (doc_id, c, bits_q16) — one row per DISTINCT document bigram with
    * its occurrence count and its exact add-one bits under the model.
    * Exposed for consumers that need the per-token score DISTRIBUTION
    * rather than the document sum (C32's min-k% tail reads the highest
    * bits per document; the sum collapses exactly that signal).
    */
  def scoreBits(docbg: DataFrame, ref: Ref): DataFrame = {
    val unRef = ref.bigrams.groupBy("w1").agg(sum(col("cnt")).as("ucnt"))
    docbg
      .join(ref.bigrams, Seq("w1", "w2"), "left")
      .join(unRef, Seq("w1"), "left")
      .crossJoin(broadcast(ref.vocab))
      .select(col("doc_id"), col("c"),
        graft.functions.FixedLog.bitsQ16(
          coalesce(col("ucnt"), lit(0L)) + col("v"),
          coalesce(col("cnt"), lit(0L)) + lit(1L)).as("bits_q16"))
  }

  /** Score a document corpus under a (loaded or trained) model — the
    * artifact-consumer plan: one scan of the TARGET corpus plus
    * model-frame reads; the reference corpus does not appear.
    */
  def score(docs: DataFrame, ref: Ref): DataFrame =
    scoreCounts(bigramCounts(docs), ref)

  // ---- interpolated-backoff trigram model (r16) ----

  /** A trigram reference model: `trigrams(w1, w2, w3, cnt)` +
    * `bigrams(w1, w2, cnt)` + the 1-row `vocab(v)` frame. The bigram
    * frame is the BACKOFF distribution (C19b's add-one model verbatim),
    * kept beside the trigram counts because it cannot be derived from
    * them (each document's final bigram has no covering trigram);
    * [[load3]] refuses a pair whose marginals disagree.
    */
  final case class Ref3(trigrams: DataFrame, bigrams: DataFrame,
      vocab: DataFrame)

  /** Per-document trigram occurrence counts (doc_id, w1, w2, w3, c) —
    * the [[bigramCounts]] tokenization one order up; documents with
    * < 3 tokens contribute nothing.
    */
  def trigramCounts(docs: DataFrame): DataFrame =
    // same repartition(doc_id) rationale as [[bigramCounts]] (r19)
    graft.Tables.spread(docs, col("doc_id"))
      .select(col("doc_id"), TextOps.toks(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tok)-2), i -> " +
          "named_struct('w1', element_at(tok, i), " +
          "'w2', element_at(tok, i+1), 'w3', element_at(tok, i+2)))"))
        .as("tg"))
      .select(col("doc_id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
      .groupBy("doc_id", "w1", "w2", "w3")
      .agg(count(lit(1)).as("c"))

  /** Aggregate per-doc trigram + bigram counts into a [[Ref3]]. */
  def ref3FromCounts(
      doctg: DataFrame,
      docbg: DataFrame,
      cache: DataFrame => DataFrame = identity): Ref3 = {
    val tg = cache(doctg.groupBy("w1", "w2", "w3")
      .agg(sum(col("c")).as("cnt")))
    val bg = cache(docbg.groupBy("w1", "w2").agg(sum(col("c")).as("cnt")))
    Ref3(tg, bg, bg.select(countDistinct(col("w2")).as("v")))
  }

  def train3(docs: DataFrame): Ref3 =
    ref3FromCounts(trigramCounts(docs), bigramCounts(docs))

  /** Score pre-counted documents under an INTERPOLATED-BACKOFF trigram
    * model — the public-fidelity step the r15 verdict asked for (the
    * CCNet scorer is a 5-gram KenLM; add-one bigrams underprice any
    * text whose bigrams are common but whose trigram CONTEXTS are
    * novel). Jelinek-Mercer interpolation with the integer-rational
    * λ = 1/2 (λ must be rational for the Q16 log recipe to stay
    * engine-exact — 1/2 is the textbook two-model default):
    *
    *   seen context (c12 ≥ 1):
    *     p = 1/2 · c123/c12 + 1/2 · (c23+1)/(c2+V)
    *       = (c123·(c2+V) + c12·(c23+1)) / (2·c12·(c2+V))
    *   unseen context (c12 = 0) — Katz-style full backoff:
    *     p = (c23+1)/(c2+V)     (≡ C19b's smoothed bigram; an unseen
    *                             w2 prefix degrades to 1/V, the same
    *                             uniform floor)
    *
    * p ≤ 1 always (c123 ≤ c12, c23+1 ≤ c2+V), so
    * bits = log2(den/num) runs [[graft.functions.FixedLog.bitsQ16]]
    * with its num ≥ den ≥ 1 contract intact, and every product stays
    * int64-exact under the same tokens-per-side < 2³¹ bound G21
    * documents (pre-scale counts by 2^k above it). Returns
    * (doc_id, n_trigrams, sum_bits3_q16).
    */
  def scoreCounts3(doctg: DataFrame, ref: Ref3): DataFrame = {
    val ctx = ref.trigrams.groupBy("w1", "w2").agg(sum(col("cnt")).as("c12"))
    // the backoff bigram is (w2, w3) — rename the model frame's keys to
    // the trigram's suffix position
    val bgSuffix = ref.bigrams.select(col("w1").as("w2"),
      col("w2").as("w3"), col("cnt").as("c23"))
    val unSuffix = ref.bigrams.groupBy("w1").agg(sum(col("cnt")).as("ucnt"))
      .select(col("w1").as("w2"), col("ucnt"))
    val bgDen = coalesce(col("ucnt"), lit(0L)) + col("v")
    val bgNum = coalesce(col("c23"), lit(0L)) + lit(1L)
    val c12c = coalesce(col("c12"), lit(0L))
    val c123c = coalesce(col("c123"), lit(0L))
    val pNum = when(c12c > 0, c123c * bgDen + c12c * bgNum).otherwise(bgNum)
    val pDen = when(c12c > 0, c12c * bgDen * lit(2L)).otherwise(bgDen)
    doctg
      .join(ref.trigrams.withColumnRenamed("cnt", "c123"),
        Seq("w1", "w2", "w3"), "left")
      .join(ctx, Seq("w1", "w2"), "left")
      .join(bgSuffix, Seq("w2", "w3"), "left")
      .join(unSuffix, Seq("w2"), "left")
      .crossJoin(broadcast(ref.vocab))
      .select(col("doc_id"), col("c"),
        graft.functions.FixedLog.bitsQ16(pDen, pNum).as("bits_q16"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_trigrams"),
        sum(col("c") * col("bits_q16")).as("sum_bits3_q16"))
  }

  def score3(docs: DataFrame, ref: Ref3): DataFrame =
    scoreCounts3(trigramCounts(docs), ref)

  /** Persist a trigram model marker-bracketed (the [[save]] contract,
    * one more frame).
    */
  def save3(spark: SparkSession, ref: Ref3, path: String): Unit = {
    writeMarker(spark, path, complete = false)
    // the three data writes are independent — overlap them from driver
    // threads (r20, guide §2.6, the KnnIndex.save recipe); the marker
    // bracket stays strictly sequential
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Seq(
      Future(ref.trigrams.write.mode("overwrite").parquet(s"$path/trigrams")),
      Future(ref.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")),
      Future(ref.vocab.write.mode("overwrite").parquet(s"$path/vocab")))
      .foreach(Await.result(_, Duration.Inf))
    writeMarker(spark, path, complete = true)
  }

  /** Reopen a saved trigram model. Refuses partial saves, a vocab that
    * disagrees with the bigram frame, and a trigram frame whose
    * (w2, w3) marginal exceeds the backoff bigram counts — every
    * trigram occurrence CONTAINS its suffix bigram occurrence, so a
    * violated marginal means the two frames came from different
    * corpora and the interpolation would mix incompatible models.
    */
  def load3(spark: SparkSession, path: String): Ref3 = {
    recoverSwap(spark, path)
    val marker = try spark.read.parquet(s"$path/complete").head()
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        throw new IllegalStateException(
          s"no LmIndex(3) at $path (missing completion marker)")
    }
    if (!marker.getAs[Boolean]("complete"))
      throw new IllegalStateException(
        s"LmIndex(3) at $path is a partial save — retrain or re-save")
    val tg = spark.read.parquet(s"$path/trigrams")
    val bg = spark.read.parquet(s"$path/bigrams")
    val vocab = spark.read.parquet(s"$path/vocab")
    val v = vocab.head().getAs[Long]("v")
    val actual =
      bg.agg(countDistinct(col("w2")).as("v")).head().getAs[Long]("v")
    if (v != actual)
      throw new IllegalStateException(
        s"LmIndex(3) at $path: stored vocabulary $v != the bigram " +
          s"frame's $actual continuations")
    val bad = tg.groupBy(col("w2"), col("w3")).agg(sum(col("cnt")).as("m"))
      .join(bg.select(col("w1").as("w2"), col("w2").as("w3"),
        col("cnt").as("bcnt")), Seq("w2", "w3"), "left")
      .filter(col("m") > coalesce(col("bcnt"), lit(0L)))
      .count()
    if (bad > 0)
      throw new IllegalStateException(
        s"LmIndex(3) at $path: $bad trigram (w2, w3) marginals exceed " +
          "the backoff bigram counts — frames from different corpora")
    Ref3(tg, bg, vocab)
  }

  // ---- board consumption (train-once per corpus, the E19 pattern) ----

  private val memo3 =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The corpus' even-doc_id-half [[Ref3]] as a persisted artifact,
    * trained and saved AT MOST ONCE per corpus fingerprint per session
    * (r19, the r18 verdict's ask #5): at sf100 the board trigram
    * scorers' first run paid ~415 s of one-time training-frame
    * materialization on top of the ~84 s scoring cost
    * (records/BENCH_sf100_text_r18.json) — the model frames are
    * Zipf-bounded parquet, so every later consumer (C27/C29/C37, any
    * session) pays a model-sized load instead of re-aggregating the
    * reference half. The deployment analogy is [[TokenizerIndex]]'s
    * forCorpus: the artifact is keyed by corpus content, and append
    * (new reference documents) goes through [[append3]]'s summed-union
    * merge on the saved path.
    */
  def forCorpusRefHalf(s: SparkSession, d: String): Ref3 = {
    val key = s"${CorpusKey.key(d, "documents.parquet")}#ref3half"
    val path = memo3.computeIfAbsent(key, _ => {
      val p = java.nio.file.Files
        .createTempDirectory("graft_lm3").toString + "/lm3"
      save3(s, train3(graft.Tables.documents(s, d)
        .filter(col("doc_id") % 2 === 0)), p)
      p
    })
    load3(s, path)
  }

  /** Drop memoized model paths (tests). */
  def clearMemo3(): Unit = memo3.clear()

  /** Fold new reference documents into a saved trigram model — both
    * count frames merge by summed union ([[append]]'s discipline,
    * staged sibling + atomic rename; append ≡ retraining on the union,
    * LmIndexSpec-pinned for the trigram frame too).
    */
  def append3(spark: SparkSession, path: String, newDocs: DataFrame): Unit = {
    val live = load3(spark, path)
    val add = train3(newDocs)
    val mtg = Checkpoints.checkpoint(
      live.trigrams.unionByName(add.trigrams)
        .groupBy("w1", "w2", "w3").agg(sum(col("cnt")).as("cnt")))
    val mbg = Checkpoints.checkpoint(
      live.bigrams.unionByName(add.bigrams)
        .groupBy("w1", "w2").agg(sum(col("cnt")).as("cnt")))
    save3(spark,
      Ref3(mtg, mbg, mbg.select(countDistinct(col("w2")).as("v"))),
      stagedPath(path))
    swapInto(spark, path)
  }

  // ---- persistence (the artifact contract) ----

  private def writeMarker(
      spark: SparkSession, path: String, complete: Boolean): Unit =
    spark.range(0L, 1L, 1L, 1).select(lit(complete).as("complete"))
      .write.mode("overwrite").parquet(s"$path/complete")

  /** Persist the model marker-bracketed: `complete=false`, the bigram
    * frame, the 1-row vocab meta, `complete=true`. A crash mid-save
    * refuses to load rather than scoring under half a model.
    */
  def save(spark: SparkSession, ref: Ref, path: String): Unit = {
    writeMarker(spark, path, complete = false)
    ref.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    ref.vocab.write.mode("overwrite").parquet(s"$path/vocab")
    writeMarker(spark, path, complete = true)
  }

  /** Reopen a saved model (repairing an interrupted [[append]] swap
    * first). Refuses a partial save, and refuses a vocab meta that
    * disagrees with the bigram frame it rides with — a model whose
    * smoothing denominator drifted from its counts would score
    * garbage, not fail.
    */
  def load(spark: SparkSession, path: String): Ref = {
    recoverSwap(spark, path)
    val marker = try spark.read.parquet(s"$path/complete").head()
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        throw new IllegalStateException(
          s"no LmIndex at $path (missing completion marker)")
    }
    if (!marker.getAs[Boolean]("complete"))
      throw new IllegalStateException(
        s"LmIndex at $path is a partial save — retrain or re-save")
    val bg = spark.read.parquet(s"$path/bigrams")
    val vocab = spark.read.parquet(s"$path/vocab")
    val v = vocab.head().getAs[Long]("v")
    val actual = bg.agg(countDistinct(col("w2")).as("v")).head().getAs[Long]("v")
    if (v != actual)
      throw new IllegalStateException(
        s"LmIndex at $path: stored vocabulary $v != the bigram frame's " +
          s"$actual continuations — the model is internally inconsistent")
    Ref(bg, vocab)
  }

  // ---- incremental maintenance ----

  private def stagedPath(path: String): String = path + ".staged"

  private def hfs(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def markerComplete(spark: SparkSession, path: String): Boolean =
    try spark.read.parquet(s"$path/complete").head().getAs[Boolean]("complete")
    catch { case _: Exception => false }

  /** Commit `path`.staged over the live model by displace + rename —
    * the [[IvfPqIndex]] swap discipline: every crash window leaves a
    * COMPLETE model on disk for [[recoverSwap]]. Assumes atomic
    * directory rename (HDFS/local POSIX — NOT object stores, where
    * rename is copy+delete; see the IvfPqIndex.swapInto scaladoc).
    */
  private def swapInto(spark: SparkSession, path: String): Unit = {
    val (fs, p) = hfs(spark, path)
    val st = new org.apache.hadoop.fs.Path(stagedPath(path))
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(old, true)
    if (fs.exists(p) && !fs.rename(p, old))
      throw new IllegalStateException(s"could not displace live model $path")
    if (!fs.rename(st, p))
      throw new IllegalStateException(
        s"could not promote staged model ${stagedPath(path)}")
    fs.delete(old, true)
    ()
  }

  /** Repair an interrupted [[swapInto]]: promote a complete staged
    * copy, restore a displaced previous model, and clear leftover
    * siblings (rolling an uncommitted append back to the intact
    * previous model).
    */
  private def recoverSwap(spark: SparkSession, path: String): Unit = {
    val (fs, p) = hfs(spark, path)
    val st = new org.apache.hadoop.fs.Path(stagedPath(path))
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (!fs.exists(p)) {
      if (fs.exists(st) && markerComplete(spark, stagedPath(path)))
        fs.rename(st, p)
      else if (fs.exists(old)) fs.rename(old, p)
    }
    if (fs.exists(p)) { fs.delete(st, true); fs.delete(old, true) }
    ()
  }

  /** Fold new reference documents into a saved model: bigram counts
    * are mergeable (summed union), the vocabulary re-derives from the
    * merged frame. The merged model is checkpointed session-locally
    * (the read side of the swap must not lazily depend on the
    * directory being replaced), written to the staged sibling, and
    * atomically renamed in — append ≡ retraining on the union, which
    * LmIndexSpec pins frame-exact.
    */
  def append(spark: SparkSession, path: String, newDocs: DataFrame): Unit = {
    val live = load(spark, path)
    val add = train(newDocs)
    val merged = Checkpoints.checkpoint(
      live.bigrams.unionByName(add.bigrams)
        .groupBy("w1", "w2").agg(sum(col("cnt")).as("cnt")))
    save(spark,
      Ref(merged, merged.select(countDistinct(col("w2")).as("v"))),
      stagedPath(path))
    swapInto(spark, path)
  }
}
