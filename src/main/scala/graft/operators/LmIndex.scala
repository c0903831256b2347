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
    docs
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
  def scoreCounts(docbg: DataFrame, ref: Ref): DataFrame = {
    val unRef = ref.bigrams.groupBy("w1").agg(sum(col("cnt")).as("ucnt"))
    docbg
      .join(ref.bigrams, Seq("w1", "w2"), "left")
      .join(unRef, Seq("w1"), "left")
      .crossJoin(broadcast(ref.vocab))
      .select(col("doc_id"), col("c"),
        graft.functions.FixedLog.bitsQ16(
          coalesce(col("ucnt"), lit(0L)) + col("v"),
          coalesce(col("cnt"), lit(0L)) + lit(1L)).as("bits_q16"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("bits_q16")).as("sum_bits_q16"))
  }

  /** Score a document corpus under a (loaded or trained) model — the
    * artifact-consumer plan: one scan of the TARGET corpus plus
    * model-frame reads; the reference corpus does not appear.
    */
  def score(docs: DataFrame, ref: Ref): DataFrame =
    scoreCounts(bigramCounts(docs), ref)

  // ---- persistence (the artifact contract) ----

  private def writeMarker(
      spark: SparkSession, path: String, complete: Boolean): Unit =
    spark.range(1).select(lit(complete).as("complete"))
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
