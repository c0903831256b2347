package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Portable._

/** Persistent random-hyperplane LSH index for INCREMENTAL
  * approximate-nearest-neighbor search — the operational twin of E2's
  * `ann_lsh`, as [[DedupIndex]] is to D3. A lake-scale embedding store
  * cannot re-hash the corpus for every query batch: the index is built
  * once and probed/extended per batch.
  *
  * Two artifacts, deliberately separate (reference semantics:
  * `ann_lsh`'s "ids only" index note, AnnOps.scala:127):
  *  - `buckets` — (vec_id, tbl, bucket) membership rows, 8 id-width
  *    rows per vector, parquet-partitioned by `tbl` on save so a probe
  *    prunes to the tables it hashes;
  *  - `vectors` — (vec_id, embedding, nm) with the exact-micros
  *    self-dot precomputed, hash-distributed by vec_id.
  * Candidates travel as id pairs and re-attach vectors by vec_id, so
  * no 0.5 KB embedding ever rides a bucket-join row.
  *
  * Scale shape of [[probe]]: the query batch broadcasts (its bucket
  * rows against the index scan, its vectors against the scored
  * candidates) — the corpus-sized sides NEVER shuffle. The per-(table,
  * bucket, query) occupancy cap is enforced from the join output
  * itself, the same monotone saturation rule as [[DedupIndex]]: a
  * degenerate hot bucket (all-zero vectors, adversarial clustering)
  * contributes no candidates instead of a quadratic blowup.
  */
object AnnIndex {

  /** Twin of the D-series MAX_BUCKET: candidates from a (table, bucket)
    * pair stop counting once the bucket holds more than this many
    * indexed vectors.
    */
  val MaxBucket = 200

  /** The two persisted frames of one logical index. */
  final case class Index(buckets: DataFrame, vectors: DataFrame)

  private def withNormDf(embeddings: DataFrame): DataFrame =
    embeddings
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        dotMicros(col("embedding"), col("embedding")).as("nm"))

  /** Build the index for an initial corpus of (vec_id, embedding). */
  def build(embeddings: DataFrame): Index = {
    val e = withNormDf(embeddings)
    Index(AnnOps.bucketIndex(e), e)
  }

  /** Persist / reopen. Buckets partition by `tbl` (a probe of t tables
    * prunes to those directories); vectors are plain parquet.
    */
  def save(index: Index, path: String): Unit = {
    index.buckets.write.mode("overwrite").partitionBy("tbl")
      .parquet(s"$path/buckets")
    index.vectors.write.mode("overwrite").parquet(s"$path/vectors")
  }

  def load(spark: SparkSession, path: String): Index =
    Index(spark.read.parquet(s"$path/buckets"),
      spark.read.parquet(s"$path/vectors"))

  /** Top-k indexed neighbors of each query vector:
    * (q_id, rank, vec_id, cos), ranked by exact-micros cosine with the
    * deterministic vec_id tie-break — the same output contract as
    * `ann_lsh`, so a probe of the corpus by its own query subset equals
    * the E2 operator row-for-row (proven in AnnIndexSpec).
    */
  def probe(
      index: Index,
      queries: DataFrame,
      k: Int = 5,
      maxBucket: Int = MaxBucket): DataFrame = {
    val q = withNormDf(queries)
    val qb = AnnOps.bucketIndex(q)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    // every query meets every index row of its bucket, so the count per
    // (tbl, bucket, q_id) IS the index-side bucket occupancy — no
    // second read of the index
    val occ = Window.partitionBy(col("tbl"), col("bucket"), col("q_id"))
    val ids = index.buckets
      .join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("bucket_occ", count(lit(1)).over(occ))
      .filter(col("bucket_occ") <= maxBucket)
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val qv = q.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("nm").as("q_nm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    ids.join(index.vectors, "vec_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("vec_id"),
        cosineFromMicros(dotMicros(col("q_emb"), col("embedding")),
          col("q_nm"), col("nm")).as("cos"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The incremental step: probe the standing index with the batch,
    * then fold the batch in. Returns (neighbors, updated index) — the
    * caller lands the neighbors and overwrite-saves (or appends the
    * batch's partitions of) the index.
    */
  def ingest(
      index: Index,
      newVecs: DataFrame,
      k: Int = 5,
      maxBucket: Int = MaxBucket): (DataFrame, Index) = {
    val e = withNormDf(newVecs)
    (probe(index, newVecs, k, maxBucket),
      Index(index.buckets.unionByName(AnnOps.bucketIndex(e)),
        index.vectors.unionByName(e)))
  }
}
