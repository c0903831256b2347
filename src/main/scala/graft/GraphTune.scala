package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, EmbeddingOps, GraphAnnOps, HnswOps, KnnIndex}

/** Recall-vs-hops dial measurement for E18 (`ann_graph`): at the
  * corpus-derived geometry, beam search over the persisted k-NN graph
  * is measured per hop count against (a) the exact-cosine baseline
  * (recall@5) and (b) `ann_ivf` at the SAME nprobe — the honest
  * comparison is scan fraction: ivf scores EVERY member of the probed
  * cells, the graph walk scores only the vectors it visits, and this
  * prints both so the table shows what each extra hop buys and what it
  * costs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.GraphTune [hops...]
  */
object GraphTune {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val hopsList = if (args.nonEmpty) args.map(_.toInt).toSeq
    else Seq(0, 1, 2, 3, 5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val beam = sys.env.get("SPARK_GRAFT_BEAM").map(_.toInt)
      .getOrElse(GraphAnnOps.GRAPH_BEAM)
    val n = Tables.embeddings(spark, d).count()
    val cells = AnnOps.ivfCellsFor(n)
    val sub = EmbeddingOps.knnSubGeometry(n, cells)
    println(s"[graphtune] n=$n cells=$cells sub=$sub " +
      s"beam=$beam nprobe=${AnnOps.NPROBE}")

    val truth = SparkEntry.queries("ann_bruteforce")(spark, d)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.releaseScope()

    // the ivf row at the same nprobe: the full-probed-cells scan the
    // graph walk undercuts; its scan fraction is the probed occupancy
    val t0 = System.nanoTime()
    val ivf = AnnOps.ivfTopK(spark, d, cells = cells)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSec = (System.nanoTime() - t0) / 1e9
    Caches.releaseScope()

    // index build priced once (the artifact first-run cost); hops then
    // probe the LOADED graph. r18: both edge selections build —
    // div=false (plain k-NN, the r17 rows) and div=true (E18b's
    // select-neighbors heuristic, the op's selection) — so the table
    // shows what diversification buys AT EQUAL DEGREE AND SCAN dials.
    val tb = System.nanoTime()
    val idx = KnnIndex.forCorpus(spark, d, cells, sub,
      k = GraphAnnOps.GRAPH_DEGREE)
    idx.edges.count()
    val buildSec = (System.nanoTime() - tb) / 1e9
    Caches.releaseScope()
    val tbd = System.nanoTime()
    KnnIndex.forCorpus(spark, d, cells, sub,
      k = GraphAnnOps.GRAPH_DEGREE, div = true).edges.count()
    val buildDivSec = (System.nanoTime() - tbd) / 1e9
    Caches.releaseScope()
    println(f"[graphtune] index build/load: plain $buildSec%.2f s, " +
      f"diversified $buildDivSec%.2f s")

    // ivf scan fraction: members of the 8 queries' probed cells
    val e = AnnOps.withNorm(spark, d)
    val probe = AnnOps.ivfPqProbe(
      e.filter(col("vec_id") < 8),
      AnnOps.centroidFrame(spark, idx.micros), AnnOps.NPROBE)
    val ivfScanned = probe
      .join(idx.vectors.select(col("vec_id").as("m_id"), col("cell")),
        "cell")
      .select(col("q_id"), col("m_id")).distinct().count()
    Caches.releaseScope()
    println(f"[graphtune] ivf@nprobe=${AnnOps.NPROBE} " +
      f"recall@5=${ivf.count(truth.contains).toDouble / truth.size}%.3f " +
      f"scanned=$ivfScanned warm=$ivfSec%.2f s | index build/load " +
      f"$buildSec%.2f s")

    Seq(false, true).foreach { div =>
      hopsList.foreach { h =>
        def once(): (Double, Long, Double) = {
          val idx2 = KnnIndex.forCorpus(spark, d, cells, sub,
            k = GraphAnnOps.GRAPH_DEGREE, div = div)
          val t = System.nanoTime()
          val (res, scanned) = GraphAnnOps.graphSearchImpl(
            AnnOps.withNorm(spark, d), idx2, beam, h,
            5, AnnOps.NPROBE)
          val got = res.select(col("q_id"), col("vec_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val secs = (System.nanoTime() - t) / 1e9
          (got.count(truth.contains).toDouble / truth.size,
            scanned.count(), secs)
        }
        val runs = (1 to 3).map(_ => once())
        Caches.releaseScope()
        val tag = if (div) "div " else "plain"
        println(f"[graphtune] $tag hops=$h%-2d " +
          f"recall@5=${runs.head._1}%.3f " +
          f"scanned=${runs.head._2} warm=${runs.map(_._3).min}%.2f s")
      }
    }

    // E18c: the hierarchy-seeded walk — entry no longer depends on the
    // centroid probe, so this is the row the r18 verdict's recall
    // ceiling argument is graded on (target: recall ≥ 0.9 at ≤ 2× the
    // diversified walk's scan)
    val th = System.nanoTime()
    val idxP = KnnIndex.forCorpus(spark, d, cells, sub,
      k = GraphAnnOps.GRAPH_DEGREE)
    val hier = HnswOps.hierFor(spark, d, idxP)
    hier.count()
    val hierSec = (System.nanoTime() - th) / 1e9
    Caches.releaseScope()
    println(f"[graphtune] hnsw hierarchy build/load: $hierSec%.2f s " +
      f"(levels=${HnswOps.levelsFor(n)})")
    hopsList.foreach { h =>
      def once(): (Double, Long, Double) = {
        val idx2 = KnnIndex.forCorpus(spark, d, cells, sub,
          k = GraphAnnOps.GRAPH_DEGREE)
        val hier2 = HnswOps.hierFor(spark, d, idx2)
        val t = System.nanoTime()
        val (res, scanned) = HnswOps.hnswSearch(
          AnnOps.withNorm(spark, d), idx2, hier2, hops = h, topK = 5)
        val got = res.select(col("q_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t) / 1e9
        (got.count(truth.contains).toDouble / truth.size,
          scanned.count(), secs)
      }
      val runs = (1 to 3).map(_ => once())
      Caches.releaseScope()
      println(f"[graphtune] hnsw  hops=$h%-2d " +
        f"recall@5=${runs.head._1}%.3f " +
        f"scanned=${runs.head._2} warm=${runs.map(_._3).min}%.2f s")
    }
    spark.stop()
  }
}
