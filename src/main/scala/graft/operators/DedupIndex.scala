package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Persistent MinHash-LSH index for INCREMENTAL near-duplicate
  * detection — the operational shape of D3 at 100 TB. A lake-scale
  * pipeline cannot re-shingle the whole corpus every time a batch
  * arrives: signatures are computed ONCE per document, stored banded
  * (doc_id, band, bkey, mh), and each arriving batch probes the stored
  * index and appends its own signatures. The streaming twin is
  * [[graft.streaming.NearDupStream]] (same signature scheme, state held
  * in the stream instead of the lake); this is the batch/backfill side
  * of the same contract.
  *
  * Scale shape of [[probe]]:
  *  - the NEW batch's signatures broadcast — the corpus-sized index
  *    NEVER shuffles; the probe is a broadcast hash join against the
  *    index scan (at petabyte scale, partition the index parquet by
  *    `band` and the join prunes to probed bands).
  *  - the band-bucket occupancy cap is enforced from the join output
  *    itself: every probe doc meets ALL index rows of its bucket, so a
  *    count windowed per (band, bkey, new_id) IS the bucket occupancy —
  *    no second read of the index. Saturated buckets emit no pairs,
  *    the same monotone rule as batch D3 and the stream.
  *  - verification is the signature-estimated Jaccard (fraction of
  *    agreeing minhashes, ±1/16 resolution) — the index stores
  *    signatures, not shingle sets; callers wanting exactness join the
  *    pair ids back to the documents, as with the stream.
  */
object DedupIndex {

  /** Twins of DedupOps.K / R / MAX_BUCKET and the NearDupStream
    * constants — one signature scheme across batch, stream, and index.
    */
  val Hashes = 16
  val BandRows = 2
  val Bands: Int = Hashes / BandRows
  val MaxBucket = 200

  /** Banded signatures of a documents frame (doc_id, text):
    * (doc_id, band, bkey, mh). The explode argument stays a raw
    * expression (never a projected attribute) for the
    * InferFiltersFromGenerate reason documented at DedupOps.shingleRows;
    * the repartition spreads the CPU-bound shingling like every D-series
    * pipeline.
    */
  def signatures(docs: DataFrame): DataFrame =
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("tok"))
      .select(col("doc_id"), shinglesFromTokens(col("tok")).as("shs"))
      .select(col("doc_id"), minhash16(col("shs")).as("mh"))
      .select(col("doc_id"), col("mh"),
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            md5(concat_ws("|",
              element_at(col("mh"), BandRows * b + 1),
              element_at(col("mh"), BandRows * b + 2))).as("bkey"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"), col("mh"))

  /** Build the index for an initial corpus. */
  def build(docs: DataFrame): DataFrame = signatures(docs)

  /** Persist / reopen the index. Partitioned by band: a probe of b bands
    * prunes to those directories, and one band's buckets co-locate.
    */
  def save(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("band").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Near-dup pairs between a NEW batch and the indexed corpus:
    * (first_id — the indexed doc, new_id, est_jaccard ≥ tau). Pairs
    * WITHIN the new batch are the caller's choice of a batch-local D3
    * pass; this probe answers "is this new document a dup of anything
    * we already hold" without touching old×old.
    */
  def probe(
      index: DataFrame,
      newDocs: DataFrame,
      tau: Double = 0.5,
      maxBucket: Int = MaxBucket): DataFrame = {
    val probeSigs = signatures(newDocs)
      .select(col("doc_id").as("new_id"), col("band"), col("bkey"),
        col("mh").as("new_mh"))
    val hits = index
      .join(broadcast(probeSigs), Seq("band", "bkey"))
      .filter(col("doc_id") =!= col("new_id"))
    // every probe doc meets every index row of its bucket, so the count
    // per (band, bkey, new_id) IS the index-side bucket occupancy
    val occ = Window.partitionBy(col("band"), col("bkey"), col("new_id"))
    hits
      .withColumn("bucket_occ", count(lit(1)).over(occ))
      .filter(col("bucket_occ") <= maxBucket)
      .withColumn("est_jaccard",
        size(filter(zip_with(col("mh"), col("new_mh"), (a, b) => a === b),
          x => x)) / lit(Hashes.toDouble))
      .filter(col("est_jaccard") >= tau)
      .groupBy(col("doc_id").as("first_id"), col("new_id"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** The incremental step: probe, then fold the batch into the index.
    * Returns (pairs, updated index) — the caller lands the pairs in its
    * sink and overwrite-saves (or appends the batch's partitions of)
    * the index.
    */
  def ingest(
      index: DataFrame,
      newDocs: DataFrame,
      tau: Double = 0.5,
      maxBucket: Int = MaxBucket): (DataFrame, DataFrame) =
    (probe(index, newDocs, tau, maxBucket),
      index.unionByName(signatures(newDocs)))
}
