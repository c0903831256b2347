package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Streaming document-ingest pipeline: the streaming twin of the
  * training-data pre-processing passes (G4 quality filter → D1 exact
  * dedup), for corpora that arrive as a stream rather than a backfill.
  *
  * Dedup state is the content fingerprint only (8 bytes/doc) inside the
  * watermark horizon — `dropDuplicatesWithinWatermark` keys state on the
  * fingerprint column and evicts entries older than the watermark, so
  * state is bounded by (arrival rate × horizon), not corpus size. The
  * batch twin of this exact-dedup semantics is `dedup_exact` (D1): same
  * fingerprint ([[graft.functions.Portable.hash60]] over normalized
  * text), same survivor-per-group rule (first seen wins — in the batch
  * twin, min doc_id).
  */
object DocIngest {

  /** Quality gate, identical rules to the batch `quality_filter` (G4). */
  def qualityGate(docs: DataFrame): DataFrame = {
    val nTok = size(tokens(lower(col("text"))))
    val len = length(col("text"))
    val punct =
      (len - length(regexp_replace(col("text"), "\\p{Punct}", ""))) /
        greatest(len, lit(1)).cast("double")
    val stop = size(filter(tokens(lower(col("text"))),
      t => t.isin("the", "a", "of", "to", "and", "is", "in", "it"))) /
      nTok.cast("double")
    docs.filter(nTok >= 20 && punct <= lit(0.10) && stop >= lit(0.01))
  }

  /** Exact streaming dedup on the normalized-text fingerprint; requires
    * an upstream watermark on `ts`.
    */
  def dedup(docs: DataFrame): DataFrame =
    docs.withColumn("fp", hash60(normText(col("text"))))
      .dropDuplicatesWithinWatermark("fp")

  /** The composed ingest: watermark → quality gate → exact dedup. */
  def pipeline(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    dedup(qualityGate(docs.withWatermark("ts", watermark)))

  /** Bloom decontamination at the ingest edge — the streaming face of
    * D12's two-stage design: the eval-set bitset is built ONCE offline
    * ([[graft.operators.DedupOps.bloomBitset]], the same definition the
    * oracle checks) and rides into the stream as a 2 KB literal; each
    * document tests its long n-grams with a pure row-local expression
    * (one md5 + 3 word probes per gram — no state, no join, no
    * shuffle), and the stream SPLITS: misses continue down the
    * pipeline, hits route to a quarantine side output whose exact
    * verification (D12's broadcast-join stage) runs offline — a
    * streaming pipeline never blocks on the full eval index, and
    * Bloom's one-sided error means nothing contaminated can reach the
    * clean side. Returns (clean, suspects).
    */
  def bloomSplit(
      docs: DataFrame, words: Array[Long]): (DataFrame, DataFrame) = {
    val flagged = docs
      .withColumn("tok", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("bloom_hit",
        size(col("tok")) >= graft.operators.DedupOps.deconN &&
          exists(
            ngramsFromTokens(col("tok"), graft.operators.DedupOps.deconN),
            g => graft.operators.DedupOps.bloomHit(words, g)))
      .drop("tok")
    (flagged.filter(!col("bloom_hit")).drop("bloom_hit"),
      flagged.filter(col("bloom_hit")).drop("bloom_hit"))
  }

  /** The full edge chain with decontamination: watermark → quality
    * gate → Bloom split → exact dedup on the clean side. Returns
    * (deduped clean stream, quarantine stream).
    */
  def pipelineWithDecon(
      docs: DataFrame,
      words: Array[Long],
      watermark: String = "1 hour"): (DataFrame, DataFrame) = {
    val (clean, suspects) =
      bloomSplit(qualityGate(docs.withWatermark("ts", watermark)), words)
    (dedup(clean), suspects)
  }

  /** DSIR gate at the ingest edge — the streaming face of G21
    * (`sample_dsir`): the frozen per-bucket importance scores and the
    * bin threshold come from a batch run
    * ([[graft.operators.PipelineOps.dsirPolicy]] — the deployment
    * shape: the policy retrains OFFLINE against a curated target, the
    * edge only prices), ride into the stream as a [[graft.operators
    * .PipelineOps.DSIR_B]]-long literal, and each document's weight is
    * a pure row-local expression — one md5 per token + an element_at
    * against the literal, summed by an `aggregate` HOF. No state, no
    * join, no shuffle: exactly the Bloom-split doctrine for importance
    * weighting. A document passes iff its weight bin clears the frozen
    * threshold — bit-identical to the batch verdict on the same text
    * (the bucket hash is shared code, the sum is the same Σ c·s, and
    * novel tokens price at the smoothing prior the policy array
    * carries).
    */
  /** LEARNED quality gate at the ingest edge (r16, the r15 verdict's
    * ask #5) — the A18 frozen-policy doctrine applied to the
    * [[graft.operators.QualityIndex]] model: weights train OFFLINE
    * (the C18 preconditioned GD loop), freeze into a literal array,
    * and each document scores with a pure row-local expression — the
    * SAME `scoreCol` fold the batch consumers run, fed per-occurrence
    * (b, 1) structs from the SAME `gramsOf`/`bucketOf` featurization
    * (Σ w_b·c_b over a bag ≡ Σ w_{bucket(g)} over occurrences, n is
    * the occurrence count either way — so edge verdicts are
    * bit-identical to `QualityIndex.score`'s is_quality_pred on the
    * same text, StreamingSpec-pinned). No state, no join, no shuffle.
    */
  def qualityGateLearned(
      docs: DataFrame, model: graft.operators.QualityClassifier.Model)
      : DataFrame = {
    import graft.operators.QualityClassifier
    require(model.weights.length == QualityClassifier.NumBuckets,
      s"model has ${model.weights.length} feature buckets, this engine " +
        s"hashes into ${QualityClassifier.NumBuckets}")
    val grams = QualityClassifier.gramsOf(QualityClassifier.tokCol)
    val fs = transform(grams, g =>
      struct(QualityClassifier.bucketOf(g).as("b"), lit(1L).as("c")))
    docs.withColumn("fs", fs)
      .withColumn("n", size(col("fs")).cast("long"))
      .filter(QualityClassifier.scoreCol(model.weights, model.bias)
        >= lit(QualityClassifier.PredThreshold))
      .drop("fs", "n")
  }

  /** LEARNED language gate at the ingest edge — the same doctrine for
    * [[graft.operators.LangIndex]]: the per-language weight arrays
    * freeze into literals, features come from the fused `trigram_bag`
    * kernel (row-local by construction — the same kernel the batch
    * docFrame runs), per-class scores run the shared `scoreCol`, and
    * the prediction is the SAME argmax cascade as C3/C23, so edge
    * verdicts match `LangIndex.score`'s learned_lang exactly.
    * Documents keep iff their predicted language is in `keep`; docs
    * whose normalized text is shorter than a trigram carry no language
    * evidence and are rejected (the batch docFrame's own filter).
    */
  def langGate(
      docs: DataFrame, model: graft.operators.LangClassifier.Model,
      keep: Seq[String]): DataFrame = {
    import graft.operators.{LangIndex, QualityClassifier, TextOps}
    val langs = LangIndex.langs
    val unknown = keep.filterNot(langs.contains)
    require(unknown.isEmpty,
      s"langGate keep set names unknown languages: $unknown (cascade " +
        s"order is $langs)")
    val nt = normText(col("text"))
    val withScores = langs.zipWithIndex.foldLeft(
      docs.withColumn("fs", call_function("trigram_bag", nt,
          lit(QualityClassifier.NumBuckets)))
        .withColumn("n",
          aggregate(col("fs"), lit(0L), (acc, f) => acc + f("c")))) {
      case (acc, (l, i)) =>
        acc.withColumn(s"p_$l",
          QualityClassifier.scoreCol(model.weights(i), model.bias(i)))
    }
    withScores
      .filter(length(nt) >= 3 &&
        TextOps.langArgmax("p_").isin(keep.map(x => x: Any): _*))
      .drop(Seq("fs", "n") ++ langs.map(l => s"p_$l"): _*)
  }

  def dsirGate(docs: DataFrame, scores: Array[Long], tBin: Long): DataFrame = {
    import org.apache.spark.sql.types.LongType
    // the bucket hash mods by DSIR_B; a differently-sized policy array
    // would make element_at return null and silently drop every doc
    // whose tokens land past the end — refuse instead
    require(scores.length == graft.operators.PipelineOps.DSIR_B,
      s"policy array has ${scores.length} buckets, the gate hashes into " +
        s"${graft.operators.PipelineOps.DSIR_B}")
    val sLit = typedLit(scores.toSeq)
    val w = aggregate(
      transform(tokens(lower(col("text"))), t =>
        element_at(sLit,
          (graft.operators.PipelineOps.dsirBucket(t) + lit(1L))
            .cast("int"))),
      lit(0L), (acc, x) => acc + x)
    docs.withColumn("w_q16", w.cast(LongType))
      .filter(expr("(w_q16 - pmod(w_q16, 65536)) div 65536") > lit(tBin))
  }

  /** Boilerplate removal at the ingest edge — the streaming face of C34
    * (`text_boilerplate`): each document's text REWRITES to its kept
    * prose lines through the one shared kept-lines definition
    * ([[graft.operators.TextOps.boilerplateKept]] — the board op and
    * this stage cannot drift), and documents with no prose line at all
    * drop. Pure row-local lambda work over the line array: no state,
    * no join, no shuffle — the line-level twin of the doc-level gates
    * above, and the natural FIRST stage of the edge chain (downstream
    * quality scoring, dedup fingerprints and n-gram tests then see the
    * prose, not the chrome).
    */
  /** Gopher-repetition gate at the ingest edge (r19, the r18 verdict's
    * ask #7) — the streaming face of C36 (`quality_gopher_rep`): since
    * the r18 rework every repetition metric is a pure row-local
    * expression (the fused `gram_rep` kernel), so the A18 frozen-policy
    * doctrine applies with NO policy at all — the gate evaluates the
    * literally-shared composed verdict
    * ([[graft.operators.GopherRep.fullVerdict]]: document cascade
    * first, then the A1.1 repetition cascade) and keeps survivors. No
    * state, no join, no shuffle; edge verdicts are bit-identical to
    * the batch op's `kept_full` on the same text (StreamingSpec-
    * pinned). Chain position: after [[boilerplateClean]] (the gate
    * should price prose, not chrome) and before the dedup fingerprint
    * (repetition-heavy spam never enters dedup state).
    */
  def gopherRepGate(docs: DataFrame): DataFrame = {
    import graft.operators.GopherRep
    import org.apache.spark.sql.types.LongType
    docs
      .withColumn("gr_tok", tokens(lower(col("text"))))
      .withColumn("gr_cc",
        greatest(length(array_join(col("gr_tok"), "")), lit(1))
          .cast(LongType))
      .filter(GopherRep.fullVerdict(col("text"), col("gr_tok"),
        col("gr_cc")) === "keep")
      .drop("gr_tok", "gr_cc")
  }

  def boilerplateClean(docs: DataFrame): DataFrame =
    docs
      .withColumn("bl_kept",
        graft.operators.TextOps.boilerplateKept(col("text")))
      .filter(size(col("bl_kept")) >= 1)
      .withColumn("text", array_join(col("bl_kept"), "\n"))
      .drop("bl_kept")
}
