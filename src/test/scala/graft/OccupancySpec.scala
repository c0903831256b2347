package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, CentroidIndex, DedupOps}

/** The r18 occupancy contract of the shared cell-blocked pair
  * generator (the r17 verdict's one `weak`): on ANY data layout the
  * in-row cross product's group occupancy is bounded — the sub-LSH
  * dial alone cannot bound it on cluster-sorted tight clusters (every
  * member shares every hyperplane sign; the buckets never split and
  * the quadratic OOM'd a 24 GB driver at 200k clustered vectors,
  * records/GRAPH_TUNE_r17.txt). Pins, in order: the adaptive split is
  * a strict NO-OP under the trigger (gate corpora byte-identical to
  * r17), the split bounds occupancy on a tight cluster the hyperplanes
  * cannot separate, pair semantics stay exact within the refined
  * blocks, and genuinely unsplittable mass (an exact-duplicate flood)
  * fails BY NAME before the cross product materializes, never by
  * executor OOM.
  */
class OccupancySpec extends SparkSpec {

  import graft.functions.Portable.dotMicros

  /** A (vec_id, embedding, nm, cell) member frame from raw float
    * vectors — nm the exact-micros self-dot the production frames
    * carry.
    */
  private def memberFrame(rows: Seq[(Long, Array[Float], Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "cell")
      .select(col("vec_id"), col("embedding"),
        dotMicros(col("embedding"), col("embedding")).as("nm"), col("cell"))
  }

  /** Deterministic tight cluster around `base`: distinct points whose
    * pairwise cosines stay ≈ 1 (the layout that defeats hyperplane
    * sub-bucketing) but which k-means Voronoi cells CAN separate.
    */
  private def tight(n: Int, base: Float, cell: Long, id0: Long) =
    (0 until n).map { i =>
      val v = Array.tabulate(8)(j =>
        base + ((i * (j + 3) + j) % 101) * 1e-4f)
      (id0 + i, v, cell)
    }

  /** Well-spread small cell (never triggers). */
  private def spread(n: Int, cell: Long, id0: Long) =
    (0 until n).map { i =>
      val v = Array.tabulate(8)(j => math.cos(i * (j + 1) * 0.7).toFloat)
      (id0 + i, v, cell)
    }

  private def cellsOf(df: DataFrame): Map[Long, Long] = df.collect()
    .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap

  test("under the trigger the refinement is a strict no-op — " +
      "gate-corpus assignments (and so the r17 pair set) are unchanged") {
    // synthetic: two healthy cells under SPLIT_OCC
    val m = memberFrame(spread(40, 3L, 100L) ++ spread(30, 7L, 500L))
    assert(cellsOf(AnnOps.occupancyRefined(m, None)) == cellsOf(m))
    // the real gate corpus through the real D11/E14 assignment path
    val e = AnnOps.withNorm(spark, sf)
    val cent = CentroidIndex.forCorpus(spark, sf, 16)
    val assigned = AnnOps.assignCells(e, cent).join(e, "vec_id")
      .select(col("vec_id"), col("embedding"), col("nm"), col("cell"))
    val subG = DedupOps.semSubGeometry(e.count(), 16)
    assert(cellsOf(AnnOps.occupancyRefined(assigned, subG)) ==
      cellsOf(assigned),
      "gate SF must stay under the trigger — the oracle dials depend on it")
    Caches.releaseScope()
  }

  test("a tight cluster the hyperplanes cannot split is re-blocked " +
      "under the occupancy bound, untouched cells unaffected") {
    val n = 1500 // > SPLIT_OCC in ONE cell, one bucket group (sub=None)
    val m = memberFrame(tight(n, 1.0f, 11L, 10000L) ++ spread(40, 3L, 100L))
    val refined = AnnOps.occupancyRefined(m, None)
    val occ = refined.groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("count")).toMap
    assert(occ.values.max <= AnnOps.SPLIT_OCC,
      s"every refined block must sit under the trigger, got $occ")
    assert(occ(3L) == 40L, "an untouched cell keeps its members")
    assert(occ.keys.filter(_ != 3L).forall(_ < 0),
      "split blocks get fresh negative ids (production cells are >= 0)")
    // membership is a partition of the input — nothing dropped or duped
    assert(refined.count() == m.count())
    assert(refined.select(sum(col("vec_id"))).head.getLong(0) ==
      m.select(sum(col("vec_id"))).head.getLong(0))
    // determinism: a second run re-derives the identical refinement
    assert(cellsOf(AnnOps.occupancyRefined(m, None)) == cellsOf(refined))
    Caches.releaseScope()
  }

  test("pair semantics: exactly the within-block pairs, i < j, exact " +
      "cosines — count identity against the refined blocks") {
    val m = memberFrame(tight(1500, 1.0f, 11L, 10000L) ++
      spread(40, 3L, 100L))
    val refined = AnnOps.occupancyRefined(m, None)
    val expect = refined.groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Long]("count")).map(n => n * (n - 1) / 2).sum
    val pairs = AnnOps.bucketedPairsFromAssigned(m, None)
    assert(pairs.count() == expect,
      "one pair per unordered within-block couple")
    assert(pairs.filter(col("i") >= col("j")).count() == 0)
    Caches.releaseScope()
  }

  test("unsplittable mass (exact-duplicate flood) fails by name at the " +
      "loud cap, never by executor OOM") {
    val dup = Array.tabulate(8)(j => 0.5f + j * 0.01f)
    val n = (AnnOps.PAIR_OCC_CAP + 1).toInt
    val m = memberFrame((0 until n).map(i => (20000L + i, dup, 42L)))
    val e = intercept[Exception] {
      AnnOps.bucketedPairsFromAssigned(m, None).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceeds")),
      s"expected the loud occupancy refusal, got: ${e.getMessage}")
    Caches.releaseScope()
  }
}
