package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, EmbeddingOps, GraphAnnOps, KnnIndex}

/** E18 — beam search over the persisted k-NN graph: rank shape, the
  * probed-cell confinement (the walk's world is the centroid probe,
  * never the corpus), and recall monotonicity in hops.
  */
class GraphAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("ann_graph: dense ranks, descending scores, candidates confined " +
      "to the probed cells") {
    val rows = run("ann_graph", dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rs.length).toSeq, s"ranks not dense for $q")
      val sc = rs.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("cos")).toSeq
      assert(sc == sc.sortBy(-(_: Double)), s"scores not descending for $q")
    }
    // confinement: every result member sits in one of its query's
    // nprobe probed cells
    val idx = KnnIndex.forCorpus(spark, dir, AnnOps.CENTROIDS, None,
      k = GraphAnnOps.GRAPH_DEGREE, div = true)
    val e = AnnOps.withNorm(spark, dir)
    val probe = AnnOps.ivfPqProbe(
      e.filter(col("vec_id") < 8),
      AnnOps.centroidFrame(spark, idx.micros), AnnOps.NPROBE)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cell")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cellOf = idx.vectors.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id"); val v = r.getAs[Long]("vec_id")
      assert(probe(q).contains(cellOf(v)),
        s"candidate $v of query $q escaped the probed cells")
    }
    Caches.releaseScope()
  }

  test("r20: driver-local walk engine ≡ distributed walk, bit-exact " +
      "(the size-adaptive engine-chooser parity pin)") {
    import graft.operators.LocalWalk
    def bits(key: String): Seq[(Long, Long, Long, Long)] =
      run(key, dir).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), java.lang.Double.doubleToLongBits(r.getDouble(3))))
        .toSeq
    val keys = Seq("ann_graph", "ann_graph_div")
    // default conf: the gate corpus is far below the threshold → local
    val local = keys.map(bits)
    Caches.releaseScope()
    // force the distributed loop and compare every field bit for bit
    spark.conf.set(LocalWalk.LocalMaxKey, "0")
    try {
      val dist = keys.map(bits)
      keys.indices.foreach { i =>
        assert(local(i) == dist(i), s"${keys(i)}: local != distributed")
      }
    } finally {
      spark.conf.unset(LocalWalk.LocalMaxKey)
      Caches.releaseScope()
    }
  }

  test("ann_graph: recall@5 against the exact baseline is " +
      "non-decreasing in hops") {
    val truth = run("ann_bruteforce", dir)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = KnnIndex.forCorpus(spark, dir, AnnOps.CENTROIDS, None,
      k = GraphAnnOps.GRAPH_DEGREE, div = true)
    val recalls = Seq(0, 1, 3).map { h =>
      val got = GraphAnnOps.graphSearch(
        AnnOps.withNorm(spark, dir), idx, hops = h)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.count(truth.contains).toDouble / truth.size
    }
    assert(recalls == recalls.sorted,
      s"recall must not decrease with hops: $recalls")
    assert(recalls.last > recalls.head,
      s"hops must buy recall on the gate corpus: $recalls")
    Caches.releaseScope()
  }

  /** Scala reference of the select-neighbors heuristic — the exact
    * engine arithmetic (quantized-micros dots, double cosines, strict
    * >, id tie-breaks) so [[EmbeddingOps.divKnnEdges]] is pinned edge
    * for edge, rank for rank.
    */
  private def referenceDiv(
      emb: Map[Long, (Array[Float], Long)],
      pairs: Seq[(Long, Long, Double)],
      k: Int): Seq[(Long, Long, Long, Double)] = {
    def q(f: Float): Long = math.floor(f.toDouble * 1e6 + 0.5).toLong
    def cosOf(a: Long, b: Long): Double = {
      val (va, na) = emb(a); val (vb, nb) = emb(b)
      val dot = va.zip(vb).map { case (x, y) => q(x) * q(y) }.sum
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val m = EmbeddingOps.DIV_CAND_MULT * k
    val directed = pairs.flatMap { case (i, j, c) =>
      Seq((i, j, c), (j, i, c)) }
    directed.groupBy(_._1).toSeq.flatMap { case (src, cs) =>
      val shortlist = cs.map(c => (c._2, c._3))
        .sortBy { case (nbr, c) => (-c, nbr) }.take(m)
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      shortlist.foreach { case (nbr, c) =>
        if (kept.size < k &&
            kept.forall { case (s, _) => cosOf(nbr, s) < c })
          kept += ((nbr, c))
      }
      val keptIds = kept.map(_._1).toSet
      val fill = shortlist.filterNot(c => keptIds(c._1))
        .take(k - kept.size)
      (kept.toSeq ++ fill).sortBy { case (nbr, c) => (-c, nbr) }
        .zipWithIndex
        .map { case ((nbr, c), p) => (src, (p + 1).toLong, nbr, c) }
    }.sortBy(r => (r._1, r._2))
  }

  test("E18b: divKnnEdges replays the select-neighbors heuristic " +
      "edge for edge (Scala reference), gate corpus AND a clustered " +
      "cell where diversification genuinely reroutes an edge") {
    // gate corpus through the real pair stream
    val e = Caches.persist(AnnOps.withNorm(spark, dir))
    val cent = operators.CentroidIndex.forCorpus(spark, dir,
      AnnOps.CENTROIDS)
    val (_, gatePairs) = AnnOps.cellBucketedPairs(e, cent, None)
    val gp = Caches.persist(gatePairs)
    val embMap = e.collect().map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Long]("nm"))).toMap
    val prs = gp.collect().map(r => (r.getAs[Long]("i"),
      r.getAs[Long]("j"), r.getAs[Double]("cos"))).toSeq
    val k = GraphAnnOps.GRAPH_DEGREE
    val got = EmbeddingOps.divKnnEdges(gp, e, k).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Double]("cos")))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == referenceDiv(embMap, prs, k),
      "engine fold must equal the reference greedy on the gate corpus")
    Caches.releaseScope()

    // two angle clusters in ONE cell, k=2 — designed so the heuristic
    // PROVABLY reroutes: for the 0° vector, its cluster-mates at 5°
    // and 8° are closer to each other (3°) than the 8° one is to it,
    // so the second mate is pruned, while the OTHER side's -60° vector
    // is closer to 0° than to the kept 5° mate (65°) and is kept — a
    // cross-cluster link the plain top-2 never creates
    import spark.implicits._
    import graft.functions.Portable.dotMicros
    def at(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array.tabulate(8)(j =>
        if (j == 0) math.cos(r).toFloat
        else if (j == 1) math.sin(r).toFloat else 0.0f)
    }
    val a = Seq(0.0, 5.0, 8.0).zipWithIndex
      .map { case (deg, i) => (100L + i, at(deg)) }
    val b = Seq(-60.0, -63.0, -66.0).zipWithIndex
      .map { case (deg, i) => (200L + i, at(deg)) }
    val members = (a ++ b).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        dotMicros(col("embedding"), col("embedding")).as("nm"),
        lit(0L).as("cell"))
    val cp = Caches.persist(
      AnnOps.bucketedPairsFromAssigned(members, None))
    val embMap2 = members.collect().map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Long]("nm"))).toMap
    val prs2 = cp.collect().map(r => (r.getAs[Long]("i"),
      r.getAs[Long]("j"), r.getAs[Double]("cos"))).toSeq
    val got2 = EmbeddingOps.divKnnEdges(cp, members, 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Double]("cos")))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got2 == referenceDiv(embMap2, prs2, 2))
    val plain2 = EmbeddingOps.knnEdges(cp, 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
      .toSet
    val divSet = got2.map(r => (r._1, r._3)).toSet
    assert(divSet != plain2,
      "on the clustered cell the heuristic must reroute at least one " +
        "edge vs the plain top-k")
    val cross = divSet.count { case (s, n) =>
      (s < 200L) != (n < 200L) }
    assert(cross > plain2.count { case (s, n) =>
      (s < 200L) != (n < 200L) },
      "the rerouted edges must be cross-cluster links")
    Caches.releaseScope()
  }
}
