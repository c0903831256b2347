package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Caches, Checkpoints}

/** Persistent product-quantization index — the operational twin of E10's
  * `ann_pq`, as [[AnnIndex]] is to E2 and [[DedupIndex]] to D3. The PQ
  * scale claim is that the CODES COLUMN is the index ("it fits in
  * memory where the vectors don't"); this artifact makes that durable:
  * train the codebook and encode the corpus once, then every later
  * probe computes only its own ADC tables and scans the stored codes —
  * the corpus is never re-encoded, and the float vectors are touched
  * only for the R-row exact-cosine refine per query.
  *
  * Three persisted frames: `codes` (vec_id, m int codes), `vectors`
  * (vec_id, embedding, nm — the refine store, [[AnnOps.withNormDf]]'s
  * norm definition), and a one-row `meta` carrying (k, rerank) AND the
  * flattened codebook — codes are meaningless under any other codebook,
  * so the index PINS it exactly as AnnIndex pins its LSH geometry.
  * [[append]] encodes new batches under the pinned codebook (the
  * standard IVFPQ operational posture: retrain is a rebuild, not an
  * append — drift between the frozen codebook and a shifting corpus
  * distribution degrades recall gracefully and is re-measured at
  * rebuild time).
  *
  * Durability mirrors AnnIndex r12 semantics: every multi-frame
  * mutation is completion-marker-bracketed; a torn overwrite
  * (save/retire/compact) refuses to load; a torn APPEND is repairable —
  * vectors land first (an orphan vector row is inert: nothing nominates
  * it until its codes row exists) and codes second (an orphan codes row
  * would burn shortlist slots on a candidate the refine join then
  * drops), and each frame anti-joins its OWN landed rows so replaying
  * the interrupted batch converges to the never-crashed state.
  */
object PqIndex {

  /** One logical index: the coded corpus, the refine store, and the
    * pinned codebook + dials.
    */
  final case class Index(
      codes: DataFrame,
      vectors: DataFrame,
      codebook: Array[Long],
      k: Int,
      rerank: Int)

  /** Train + encode an initial corpus of (vec_id, embedding). Dials
    * default to the board geometry; a scale deployment passes
    * [[AnnOps.pqGeometryFor]]'s values.
    */
  def build(
      embeddings: DataFrame,
      k: Int = 32,
      rounds: Int = 2,
      rerank: Int = 64): Index = {
    val e = Caches.persist(AnnOps.withNormDf(embeddings))
    val cb = AnnOps.pqTrain(e, k, rounds)
    Index(AnnOps.pqEncodeDf(e, cb), e, cb, k, rerank)
  }

  /** Top-k indexed neighbors of each query vector — (q_id, rank,
    * vec_id, adc, cos), the exact `ann_pq` output contract
    * ([[AnnOps.pqSearch]] is the one shared search body), ranked by
    * exact-micros cosine over the ADC shortlist.
    */
  def probe(index: Index, queries: DataFrame, topK: Int = 5): DataFrame =
    AnnOps.pqSearch(index.codebook, index.k, index.rerank, topK,
      index.codes, index.vectors, AnnOps.withNormDf(queries))

  private def writeMarker(
      spark: SparkSession, path: String, complete: Boolean,
      op: String): Unit =
    spark.range(0L, 1L, 1L, 1)
      .select(lit(complete).as("complete"), lit(op).as("op"))
      .write.mode("overwrite").parquet(s"$path/complete")

  /** Persist: marker bracket around meta (codebook + dials), vectors,
    * codes — `complete=false` first, so a crash mid-save refuses to
    * load instead of probing stored codes under a half-written
    * codebook.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.codes.sparkSession
    writeMarker(spark, path, complete = false, op = "save")
    spark.range(0L, 1L, 1L, 1)
      .select(lit(index.k).as("k"), lit(index.rerank).as("rerank"),
        typedLit(index.codebook.toSeq).as("codebook"))
      .write.mode("overwrite").parquet(s"$path/meta")
    index.vectors.write.mode("overwrite").parquet(s"$path/vectors")
    index.codes.write.mode("overwrite").parquet(s"$path/codes")
    writeMarker(spark, path, complete = true, op = "save")
  }

  def load(spark: SparkSession, path: String): Index =
    loadImpl(spark, path, tolerateTornAppend = false)

  private def loadImpl(
      spark: SparkSession, path: String,
      tolerateTornAppend: Boolean): Index = {
    val m = spark.read.parquet(s"$path/complete").head()
    val op = m.getAs[String]("op")
    if (!m.getAs[Boolean]("complete") &&
        !(tolerateTornAppend && op == "append"))
      throw new IllegalStateException(
        s"PqIndex at $path is a partial $op — " +
          (if (op == "append")
             "replay the interrupted append batch to repair it"
           else "rebuild or re-save it"))
    val meta = spark.read.parquet(s"$path/meta").head()
    Index(spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/vectors"),
      meta.getAs[scala.collection.Seq[Long]]("codebook").toArray,
      meta.getAs[Int]("k"), meta.getAs[Int]("rerank"))
  }

  private def freshVecs(index: Index, e: DataFrame): DataFrame = {
    val present = index.vectors
      .join(broadcast(e.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
      .select(col("vec_id")).distinct()
    e.join(broadcast(present), Seq("vec_id"), "left_anti")
  }

  /** Append a batch to a saved index under the PINNED codebook:
    * replayed ids fold in as no-ops (each frame anti-joins its own
    * landed rows), vectors land before codes (see object note on which
    * orphan is harmless), and the whole append is marker-bracketed with
    * `op=append` so probes refuse a torn state while a replayed
    * append() reads through it and repairs.
    */
  def append(path: String, newVecs: DataFrame): Unit = {
    val spark = newVecs.sparkSession
    val idx = loadImpl(spark, path, tolerateTornAppend = true)
    val e = AnnOps.withNormDf(newVecs)
    val freshV = Checkpoints.checkpoint(freshVecs(idx, e))
    val landedC = idx.codes
      .join(broadcast(e.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
      .select(col("vec_id")).distinct()
    val freshC = Checkpoints.checkpoint(
      AnnOps.pqEncodeDf(e, idx.codebook)
        .join(broadcast(landedC), Seq("vec_id"), "left_anti"))
    writeMarker(spark, path, complete = false, op = "append")
    freshV.write.mode("append").parquet(s"$path/vectors")
    freshC.write.mode("append").parquet(s"$path/codes")
    writeMarker(spark, path, complete = true, op = "append")
  }

  /** Drop retired ids in-session — both frames anti-join the broadcast
    * id set; retiring an unknown or already-retired id is a no-op.
    */
  def retire(index: Index, ids: DataFrame): Index = {
    val r = broadcast(ids.select(col("vec_id")).distinct())
    Index(index.codes.join(r, Seq("vec_id"), "left_anti"),
      index.vectors.join(r, Seq("vec_id"), "left_anti"),
      index.codebook, index.k, index.rerank)
  }

  /** Retire ids on a saved path: checkpoint-materialized rewrite
    * (the save overwrites the directories being read), codebook
    * preserved, marker-bracketed via [[save]].
    */
  def retire(path: String, ids: DataFrame): Unit = {
    val spark = ids.sparkSession
    val idx = retire(load(spark, path), ids)
    save(Index(Checkpoints.checkpoint(idx.codes),
      Checkpoints.checkpoint(idx.vectors),
      idx.codebook, idx.k, idx.rerank), path)
  }

  /** Small-file compaction of the accumulated append files — bounded
    * file count, probe-identical before/after, marker-bracketed via
    * [[save]] (the AnnIndex/DedupIndex compaction contract).
    */
  def compact(path: String, partitions: Int = 8): Unit = {
    val spark = SparkSession.active
    val idx = load(spark, path)
    save(Index(
      Checkpoints.checkpoint(
        idx.codes.repartition(partitions, col("vec_id"))),
      Checkpoints.checkpoint(
        idx.vectors.repartition(partitions, col("vec_id"))),
      idx.codebook, idx.k, idx.rerank), path)
  }
}
