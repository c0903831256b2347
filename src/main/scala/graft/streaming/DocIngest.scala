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
}
