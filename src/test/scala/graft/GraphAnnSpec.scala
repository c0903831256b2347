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
      k = GraphAnnOps.GRAPH_DEGREE)
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

  test("ann_graph: recall@5 against the exact baseline is " +
      "non-decreasing in hops") {
    val truth = run("ann_bruteforce", dir)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = KnnIndex.forCorpus(spark, dir, AnnOps.CENTROIDS, None,
      k = GraphAnnOps.GRAPH_DEGREE)
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
}
