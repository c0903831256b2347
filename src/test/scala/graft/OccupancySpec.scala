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
  * blocks, and (r19) an exact-duplicate flood — the one mass the split
  * provably cannot separate — collapses to one representative per
  * quantized vector and yields its complete well-defined pair set
  * instead of the r18 loud refusal; the cap survives only as a
  * never-hit defense-in-depth invariant.
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

  /** Deterministic tight cluster around `base`: GENUINELY distinct
    * points (component 0 encodes i at ~3.5 quantized micros/step, so
    * no two collapse as exact duplicates) whose pairwise cosines stay
    * ≈ 1 (the layout that defeats hyperplane sub-bucketing) but which
    * k-means Voronoi cells CAN separate. r19: the old generator's
    * `% 101` jitter period silently made 15 exact copies of each of
    * 101 vectors — a duplicate flood, not a tight cluster — which the
    * duplicate collapse now (correctly) absorbs before refinement.
    */
  private def tight(n: Int, base: Float, cell: Long, id0: Long) =
    (0 until n).map { i =>
      val v = Array.tabulate(8)(j =>
        if (j == 0) base + i * 1e-5f
        else base + ((i * (j + 3) + j) % 101) * 1e-4f)
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

  test("an exact-duplicate flood collapses to one representative and " +
      "yields its full well-defined pair set (r19: the r18 refusal " +
      "window closed) — never an error, never an in-row quadratic") {
    val dup = Array.tabulate(8)(j => 0.5f + j * 0.01f)
    val n = (AnnOps.PAIR_OCC_CAP + 1).toInt
    val m = memberFrame((0 until n).map(i => (20000L + i, dup, 42L)) ++
      spread(5, 42L, 100L))
    val pairs = AnnOps.bucketedPairsFromAssigned(m, None)
    // all n(n-1)/2 couples of the flood, plus every flood member
    // against each of the 5 distinct cell mates, plus the 10 pairs
    // among those mates — exactly the uncollapsed generator's contract
    // (the ~8.4M-row check stays distributed; nothing collects)
    val expect = n.toLong * (n - 1) / 2 + n.toLong * 5 + 10
    assert(pairs.count() == expect)
    assert(pairs.filter(col("i") >= col("j")).count() == 0)
    // duplicate couples carry ONE exact self-cosine, and all
    // flood-vs-mate couples of one mate share one cosine (identical
    // vectors are indistinguishable to every consumer)
    val self = pairs.filter(col("i") >= 20000L && col("j") >= 20000L)
    assert(self.count() == n.toLong * (n - 1) / 2)
    assert(self.select(countDistinct(col("cos"))).head.getLong(0) == 1L)
    val vsMate = pairs
      .filter(col("i") < 20000L && col("j") >= 20000L)
      .groupBy(col("i"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("cos")).as("dc"))
      .collect()
    assert(vsMate.length == 5 && vsMate.forall(r =>
      r.getAs[Long]("cnt") == n.toLong && r.getAs[Long]("dc") == 1L))
    Caches.releaseScope()
  }

  test("duplicate collapse is exact on a MIXED layout: pair stream " +
      "value-identical to brute-force within-cell pairs") {
    // 3 duplicate groups (sizes 4, 3, 2) + distinct vectors, two cells
    val d1 = Array.tabulate(8)(j => 0.3f + j * 0.02f)
    val d2 = Array.tabulate(8)(j => 0.9f - j * 0.03f)
    val d3 = Array.tabulate(8)(j => (j % 3) * 0.25f + 0.1f)
    val rows = (0 until 4).map(i => (300L + i, d1, 1L)) ++
      (0 until 3).map(i => (400L + i, d2, 1L)) ++
      (0 until 2).map(i => (500L + i, d3, 2L)) ++
      spread(6, 1L, 600L) ++ spread(4, 2L, 700L)
    val m = memberFrame(rows)
    val got = AnnOps.bucketedPairsFromAssigned(m, None)
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"),
        r.getAs[Double]("cos"))).toSet
    // brute force: every within-cell couple through the same exact-
    // micros cosine arithmetic
    val ref = m.select(col("vec_id"), col("embedding"), col("nm"),
        col("cell"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding"),
        r.getAs[Long]("nm"), r.getAs[Long]("cell")))
    val want = (for {
      a <- ref; b <- ref
      if a._4 == b._4 && a._1 < b._1
    } yield (a._1, b._1)).toSet
    assert(got.map(p => (p._1, p._2)) == want,
      "the collapsed generator must emit exactly the within-cell couples")
    // cosine exactness: replay each pair through the engine columns
    val byKey = got.map(p => (p._1, p._2) -> p._3).toMap
    val refPairs = m.as("a").join(m.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        graft.functions.Portable.cosineFromMicros(
          dotMicros(col("a.embedding"), col("b.embedding")),
          col("a.nm"), col("b.nm")).as("cos"))
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        r.getAs[Double]("cos")).toMap
    assert(byKey == refPairs, "pair cosines must be bit-identical to " +
      "the direct exact-micros arithmetic")
    Caches.releaseScope()
  }
}
