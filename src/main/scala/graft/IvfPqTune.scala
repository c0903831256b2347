package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnOps

/** Scale-dial measurement for E12 (`ann_ivfpq`): recall@5 against the
  * exact-cosine baseline plus warm timing, across nprobe values at the
  * corpus-derived (cells, k, R) dials — the PqTune successor (BASELINE
  * "ann_pq geometry" section) kept in-tree because IVFPQ has one MORE
  * dial than flat PQ: nprobe bounds the coarse stage's recall ceiling,
  * and only a measurement says where it sits for a given corpus.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.IvfPqTune [nprobe...]
  */
object IvfPqTune {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val nprobes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 8, 16, 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val n = Tables.embeddings(spark, d).count()
    val cells = AnnOps.ivfCellsFor(n)
    val (k, rerank) = AnnOps.pqGeometryFor(n)
    println(s"[ivfpqtune] n=$n cells=$cells k=$k R=$rerank")

    // exact-cosine top-5 baseline (the 8-query board set); top-1 kept
    // separately — the nearest neighbor is the most-correlated (often
    // planted) pair, the case coarse cells co-locate best
    val truthRows = SparkEntry.queries("ann_bruteforce")(spark, d)
      .select(col("q_id"), col("vec_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = truthRows.map(t => (t._1, t._2)).toSet
    val truth1 = truthRows.filter(_._3 == 1L).map(t => (t._1, t._2)).toSet
    Caches.releaseScope()

    nprobes.foreach { np =>
      def once(coarseRounds: Int): (Double, Double, Double) = {
        val t0 = System.nanoTime()
        val got = AnnOps.ivfPqTopK(spark, d, cells = cells, nprobe = np,
          k = k, rerank = rerank, coarseRounds = coarseRounds)
          .select(col("q_id"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        (got.count(truth.contains).toDouble / truth.size,
          got.count(truth1.contains).toDouble / truth1.size, secs)
      }
      val runs = (1 to 3).map(_ => once(AnnOps.IVF_ROUNDS))
      Caches.releaseScope()
      // slice-seeded baseline (coarseRounds = 0 ≡ the r14 quantizer) at
      // the IDENTICAL (cells, nprobe) → equal probe fraction: the row
      // differences exactly what the trained coarse stage buys
      val base = once(0)
      Caches.releaseScope()
      println(f"[ivfpqtune] nprobe=$np%-3d recall@5=${runs.head._1}%.3f " +
        f"recall@1=${runs.head._2}%.3f " +
        f"warm=${runs.map(_._3).min}%.2f s cold=${runs.head._3}%.2f s " +
        f"| slice-seeded recall@5=${base._1}%.3f recall@1=${base._2}%.3f")
    }
    spark.stop()
  }
}
