package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Caches, Checkpoints}

/** Persistent IVFPQ index — the composed operational artifact the r12
  * verdict named the remaining O(corpus) gap: [[PqIndex.probe]] scans
  * ALL stored codes per query batch (linear in n, however compressed),
  * while this index stores the codes INVERTED-FILE style — one parquet
  * partition per coarse cell — so a probe reads only the nprobe cells
  * its queries hash to. Partition pruning does the work: the probed
  * cell set is bounded (queries × nprobe values, collected driver-side
  * before the scan), the `cell IN (...)` filter prunes the codes scan
  * to those directories, and per-query compute is the probed cells'
  * occupancy (~nprobe/cells of the corpus under the √n cell dial),
  * never the corpus. IvfPqIndexSpec pins exactly that: a loaded probe's
  * input files are a strict subset of the codes partitions.
  *
  * Four persisted frames: `codes` (vec_id, codes; DIRECTORY-partitioned
  * by cell), `vectors` (the exact-cosine refine store), `centroids`
  * (the pinned coarse quantizer — cell assignment is meaningless under
  * any other), and a one-row `meta` pinning the residual codebook and
  * dials (cells, nprobe, k, rerank). [[append]] assigns and encodes new
  * batches under BOTH pinned models (coarse centroids + residual
  * codebook) — the FAISS operational posture: retrain is a rebuild.
  *
  * Durability mirrors [[PqIndex]] r12 semantics: marker-bracketed
  * multi-frame mutations; a torn overwrite refuses to load; a torn
  * append is repairable by replaying the batch (vectors land first —
  * an orphan vector row is inert — and each frame anti-joins its own
  * landed rows, so replay converges to the never-crashed state).
  * Index-rewriting mutations ([[retire]]/[[compact]]) additionally
  * write to a staged sibling and commit by atomic directory rename,
  * so a crash mid-rewrite can never destroy the only durable copy —
  * [[load]] repairs or rolls back any interrupted swap it finds.
  */
object IvfPqIndex {

  /** One logical index: inverted-file codes, refine store, pinned
    * coarse centroids, pinned residual codebook + dials.
    */
  final case class Index(
      codes: DataFrame,
      vectors: DataFrame,
      centroids: DataFrame,
      codebook: Array[Long],
      cells: Int,
      nprobe: Int,
      k: Int,
      rerank: Int)

  /** Train + encode an initial corpus of (vec_id, embedding). Dials
    * default to the board geometry; a scale deployment passes
    * [[AnnOps.ivfCellsFor]] / [[AnnOps.pqGeometryFor]] values.
    */
  def build(
      embeddings: DataFrame,
      cells: Int = AnnOps.CENTROIDS,
      nprobe: Int = AnnOps.NPROBE,
      k: Int = AnnOps.PQ_K,
      rounds: Int = AnnOps.PQ_ROUNDS,
      rerank: Int = AnnOps.PQ_RERANK): Index = {
    val e = Caches.persist(AnnOps.withNormDf(embeddings))
    // trained coarse stage (r15): slice seeds + Lloyd rounds — the
    // exact ann_ivfpq board definition, so probe ≡ board stays pinned.
    // Routed through CentroidIndex.trainMicros (r16) so the session's
    // train-run counter covers the index build too: building IS the
    // train-once moment, and the centroids persist inside the index.
    val cent = AnnOps.centroidFrame(e.sparkSession,
      CentroidIndex.trainMicros(e, cells))
    val res = Caches.persist(AnnOps.ivfPqResiduals(e, cent))
    val cb = AnnOps.ivfPqTrain(res, k, rounds, AnnOps.ivfPqSeedBase(cells))
    val codes = res.select(col("vec_id"), col("cell"),
      call_function("pql_encode", col("rv"), typedLit(cb.toSeq),
        lit(AnnOps.PQ_SUBDIM)).as("codes"))
    Index(codes, e, cent, cb, cells, nprobe, k, rerank)
  }

  /** Top-k indexed neighbors of each query vector — (q_id, rank,
    * vec_id, adc, cos), the exact `ann_ivfpq` output contract
    * ([[AnnOps.ivfPqSearch]] is the one shared search body). The probed
    * cell set is resolved driver-side FIRST (bounded: ≤ queries×nprobe
    * values) so the codes scan carries a partition-pruning `cell IN`
    * filter — on a saved index only the probed directories are read.
    */
  def probe(index: Index, queries: DataFrame, topK: Int = 5): DataFrame = {
    val spark = queries.sparkSession
    val q = AnnOps.withNormDf(queries)
    // ONE queries×centroids job: the collected probe list both prunes
    // the codes scan (partition filter) and feeds the search as a
    // literal frame, so the scoring never re-runs
    val probeRows = AnnOps.ivfPqProbe(q, index.centroids, index.nprobe)
      .collect()
    val probedCells = probeRows.map(_.getAs[Long]("cell")).distinct.toSeq
    import spark.implicits._
    val probeLit = probeRows
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cell"))).toSeq
      .toDF("q_id", "cell")
    AnnOps.ivfPqSearch(index.codebook, index.k, index.rerank, topK,
      index.nprobe, index.centroids,
      index.codes.filter(col("cell").isin(probedCells: _*)),
      index.vectors, q, probeList = Some(probeLit))
  }

  private def writeMarker(
      spark: SparkSession, path: String, complete: Boolean,
      op: String): Unit =
    spark.range(0L, 1L, 1L, 1)
      .select(lit(complete).as("complete"), lit(op).as("op"))
      .write.mode("overwrite").parquet(s"$path/complete")

  /** Persist: marker bracket around meta (codebook + dials), centroids,
    * vectors, and the cell-partitioned codes — `complete=false` first,
    * so a crash mid-save refuses to load instead of probing codes under
    * a half-written model.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.codes.sparkSession
    writeMarker(spark, path, complete = false, op = "save")
    spark.range(0L, 1L, 1L, 1)
      .select(lit(index.cells).as("cells"), lit(index.nprobe).as("nprobe"),
        lit(index.k).as("k"), lit(index.rerank).as("rerank"),
        typedLit(index.codebook.toSeq).as("codebook"))
      .write.mode("overwrite").parquet(s"$path/meta")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    index.vectors.write.mode("overwrite").parquet(s"$path/vectors")
    // the inverted file: one directory per coarse cell (cells ≤ 65536 by
    // the ivfCellsFor clamp, so the partition count is bounded); cell
    // values are ints on disk and widen back to the engine's long ids
    // at load
    index.codes
      .withColumn("cell", col("cell").cast("int"))
      // repartition on the partition column before the partitioned
      // write (r20, guide §6 small files — the KnnIndex.save finding)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    writeMarker(spark, path, complete = true, op = "save")
  }

  def load(spark: SparkSession, path: String): Index =
    loadImpl(spark, path, tolerateTornAppend = false)

  private def stagedPath(path: String): String = IndexFs.stagedPath(path)

  // staged-sibling swap + crash repair live in [[IndexFs]] (r17 —
  // shared with KnnIndex)
  private def swapInto(spark: SparkSession, path: String): Unit =
    IndexFs.swapInto(spark, path)

  private def recoverSwap(spark: SparkSession, path: String): Unit =
    IndexFs.recoverSwap(spark, path)

  private def loadImpl(
      spark: SparkSession, path: String,
      tolerateTornAppend: Boolean): Index = {
    recoverSwap(spark, path)
    val m = spark.read.parquet(s"$path/complete").head()
    val op = m.getAs[String]("op")
    if (!m.getAs[Boolean]("complete") &&
        !(tolerateTornAppend && op == "append"))
      throw new IllegalStateException(
        s"IvfPqIndex at $path is a partial $op — " +
          (if (op == "append")
             "replay the interrupted append batch to repair it"
           else "rebuild or re-save it"))
    val meta = spark.read.parquet(s"$path/meta").head()
    Index(
      spark.read.parquet(s"$path/codes")
        .withColumn("cell", col("cell").cast(LongType)),
      spark.read.parquet(s"$path/vectors"),
      spark.read.parquet(s"$path/centroids"),
      meta.getAs[scala.collection.Seq[Long]]("codebook").toArray,
      meta.getAs[Int]("cells"), meta.getAs[Int]("nprobe"),
      meta.getAs[Int]("k"), meta.getAs[Int]("rerank"))
  }

  private def freshVecs(index: Index, e: DataFrame): DataFrame = {
    val present = index.vectors
      .join(broadcast(e.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
      .select(col("vec_id")).distinct()
    e.join(broadcast(present), Seq("vec_id"), "left_anti")
  }

  /** Append a batch to a saved index under the PINNED coarse centroids
    * and residual codebook: replayed ids fold in as no-ops (each frame
    * anti-joins its own landed rows), vectors land before codes, and
    * the whole append is marker-bracketed with `op=append` so probes
    * refuse a torn state while a replayed append() reads through it and
    * repairs.
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
    val res = AnnOps.ivfPqResiduals(e, idx.centroids)
    val freshC = Checkpoints.checkpoint(
      res.select(col("vec_id"), col("cell"),
        call_function("pql_encode", col("rv"),
          typedLit(idx.codebook.toSeq), lit(AnnOps.PQ_SUBDIM)).as("codes"))
        .join(broadcast(landedC), Seq("vec_id"), "left_anti"))
    writeMarker(spark, path, complete = false, op = "append")
    freshV.write.mode("append").parquet(s"$path/vectors")
    freshC.withColumn("cell", col("cell").cast("int"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    writeMarker(spark, path, complete = true, op = "append")
  }

  /** Drop retired ids in-session — codes and vectors anti-join the
    * broadcast id set; retiring an unknown or already-retired id is a
    * no-op. Centroids are model, not corpus: they stay.
    */
  def retire(index: Index, ids: DataFrame): Index = {
    val r = broadcast(ids.select(col("vec_id")).distinct())
    index.copy(
      codes = index.codes.join(r, Seq("vec_id"), "left_anti"),
      vectors = index.vectors.join(r, Seq("vec_id"), "left_anti"))
  }

  /** Retire ids on a saved path: the rewritten index is fully written
    * to a staged SIBLING directory (reading the live one lazily — no
    * checkpoint materialization needed, the read and write targets
    * never collide) and then atomically renamed over it, so a crash at
    * any point leaves a complete index on disk — either the previous
    * one (uncommitted) or the rewritten one.
    */
  def retire(path: String, ids: DataFrame): Unit = {
    val spark = ids.sparkSession
    val idx = retire(load(spark, path), ids)
    save(idx, stagedPath(path))
    swapInto(spark, path)
  }

  /** Small-file compaction of the accumulated append files: clustering
    * the codes by cell leaves each cell directory with one file per
    * holding task (a cell lives in exactly one task after the
    * repartition), probe-identical before/after, staged-sibling +
    * atomic rename like [[retire]] — a crash preserves the
    * pre-compaction index intact.
    */
  def compact(path: String, partitions: Int = 8): Unit = {
    val spark = SparkSession.active
    val idx = load(spark, path)
    save(idx.copy(
      codes = idx.codes.repartition(partitions, col("cell")),
      vectors = idx.vectors.repartition(partitions, col("vec_id"))),
      stagedPath(path))
    swapInto(spark, path)
  }
}
