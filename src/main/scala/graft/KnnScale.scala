package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, EmbeddingOps, GraphAnnOps, KnnIndex}

/** KnnIndex scale probe (r18, verdict asks #1 and #3):
  *
  *  - **build vs warm**: times the first `forCorpus` call (train +
  *    pair stream + k-NN ranking + save — the amortized artifact cost)
  *    against the second (a loaded parquet read), the measured claim
  *    behind KnnIndex's "warm consumers never rebuild" contract.
  *  - **occupancy profile**: the refined (cell, tbl, bucket) occupancy
  *    distribution ([[AnnOps.refinedOccupancy]]) — on a cluster-SORTED
  *    corpus this is the adaptive-split proof: the r17 build OOM'd a
  *    24 GB driver here because the sub-LSH buckets never split tight
  *    clusters; the r18 splitter re-blocks them under the trigger on a
  *    DEFAULT-memory driver.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_DIV=1]
  *   [SPARK_GRAFT_K=8] runMain graft.KnnScale
  */
object KnnScale {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/localdata/clustered_sorted")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_K",
      GraphAnnOps.GRAPH_DEGREE.toString).toInt
    val div = sys.env.get("SPARK_GRAFT_DIV").exists(_ == "1")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val n = Tables.embeddings(spark, d).count()
    val cells = AnnOps.ivfCellsFor(n)
    val sub = EmbeddingOps.knnSubGeometry(n, cells)
    println(s"[knnscale] dir=$d n=$n cells=$cells sub=$sub k=$k " +
      s"div=$div driver_max_heap=" +
      f"${Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)}%.1f GiB")

    def secs(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val (buildS, edgeRows) = secs {
      KnnIndex.forCorpus(spark, d, cells, sub, k = k, div = div)
        .edges.count()
    }
    Caches.releaseScope()
    println(f"[knnscale] build+save (first forCorpus): $buildS%.1f s, " +
      s"$edgeRows edge rows")

    val (warmS, _) = secs {
      KnnIndex.forCorpus(spark, d, cells, sub, k = k, div = div)
        .edges.count()
    }
    Caches.releaseScope()
    println(f"[knnscale] warm (loaded read):           $warmS%.1f s " +
      f"(${buildS / math.max(warmS, 1e-9)}%.0fx)")

    // occupancy profile of the refined pair blocks
    val e = AnnOps.withNorm(spark, d)
    val idx = KnnIndex.forCorpus(spark, d, cells, sub, k = k, div = div)
    val assigned = AnnOps
      .assignCells(e, AnnOps.centroidFrame(spark, idx.micros))
      .join(e, "vec_id")
      .select(col("vec_id"), col("embedding"), col("nm"), col("cell"))
    val occ = AnnOps.refinedOccupancy(assigned, sub)
      .agg(max(col("n")).as("mx"), avg(col("n")).as("mean"),
        count(lit(1)).as("groups"),
        sum(when(col("cell") < 0, col("n")).otherwise(lit(0L)))
          .as("split_members"),
        count_distinct(when(col("cell") < 0, col("cell"))).as("split_cells"))
      .head()
    // refinedOccupancy groups by (cell, tbl, bucket): with sub-LSH a
    // member lands in one bucket PER TABLE, so the raw group-row sum
    // counts each split-cell member `tables` times (r18 advisory)
    val splitMembers =
      occ.getAs[Long]("split_members") / sub.map(_.tables.toLong)
        .getOrElse(1L)
    println(f"[knnscale] refined occupancy: max=${occ.getAs[Long]("mx")} " +
      f"mean=${occ.getAs[Double]("mean")}%.1f " +
      s"groups=${occ.getAs[Long]("groups")} " +
      s"split_cells=${occ.getAs[Long]("split_cells")} " +
      s"split_members=$splitMembers " +
      s"(trigger=${AnnOps.SPLIT_OCC})")
    Caches.releaseScope()

    // E18c: the hierarchy artifact on top of the base index —
    // build-vs-warm + layer profile + one search (SPARK_GRAFT_HNSW=1)
    if (sys.env.get("SPARK_GRAFT_HNSW").exists(_ == "1")) {
      import graft.operators.HnswOps
      val levels = HnswOps.levelsFor(n)
      val idx2 = KnnIndex.forCorpus(spark, d, cells, sub, k = k, div = div)
      val (hb, hRows) = secs { HnswOps.hierFor(spark, d, idx2).count() }
      Caches.releaseScope()
      val (hw, _) = secs { HnswOps.hierFor(spark, d, idx2).count() }
      Caches.releaseScope()
      val sizes = idx2.vectors
        .select(HnswOps.lvlCol(levels).as("lvl"))
        .groupBy(col("lvl")).count().collect()
        .map(r => r.getAs[Int]("lvl") -> r.getAs[Long]("count"))
        .sortBy(_._1)
      val cum = sizes.reverse
        .scanLeft(0L) { case (acc, (_, c)) => acc + c }.drop(1)
        .zip(sizes.reverse.map(_._1)).map { case (c, l) => l -> c }
        .reverse
      println(f"[knnscale] hnsw hierarchy build+save: $hb%.1f s, " +
        f"$hRows edge rows; warm $hw%.1f s " +
        f"(${hb / math.max(hw, 1e-9)}%.0fx); levels=$levels " +
        s"layer_members=${cum.filter(_._1 >= 1).map { case (l, c) =>
          s"l$l=$c" }.mkString(",")}")
      val (srchS, _) = secs {
        HnswOps.hnswSearch(AnnOps.withNorm(spark, d), idx2,
          HnswOps.hierFor(spark, d, idx2))._1.count()
      }
      Caches.releaseScope()
      println(f"[knnscale] hnsw search (8 queries, warm index): " +
        f"$srchS%.1f s")
    }
    spark.stop()
  }
}
