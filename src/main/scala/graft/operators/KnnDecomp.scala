package graft.operators

import org.apache.spark.sql.functions._

import graft.{Caches, GraftSession, Scratch, Tables}

/** Throwaway stage decomposition for the sf100 knn warm-rep gap
  * (old max_by shape 45.7 s vs cell_argmax shape 64.6 s min-of-3).
  * Times each pipeline stage under the forced (un-pruned) plan.
  */
object KnnDecomp {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf100")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val e = AnnOps.withNorm(spark, d)
    Scratch.t("e materialize")(e.count())
    println("[scratch] e partitions = " + e.rdd.getNumPartitions)

    val n = e.count()
    val cells = math.max(1, math.sqrt(n.toDouble).toInt / 4)
    val sub = EmbeddingOps.knnSubGeometry(n, cells)
    println(s"[scratch] n=$n cells=$cells sub=$sub")

    val cent = AnnOps.ivfPqCentroids(e, cells)
    val packed = AnnOps.packedCents(cent)

    // --- new shape stages ---
    val withCell = e.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("embedding"), col("nm"),
        AnnOps.cellCol.as("cell"))
    (1 to 3).foreach { i =>
      Scratch.t(s"new assign forced$i")(withCell.queryExecution.toRdd.count())
    }
    println("[scratch] withCell partitions = " + withCell.rdd.getNumPartitions)

    val g = sub.get
    val bucketed = withCell.select(col("cell"), col("vec_id"),
        col("embedding"), col("nm"),
        posexplode(AnnOps.lshBucketsCol(col("embedding"), g))
          .as(Seq("tbl", "bucket")))
    (1 to 2).foreach { i =>
      Scratch.t(s"new bucketed forced$i")(bucketed.queryExecution.toRdd.count())
    }

    val grouped = bucketed
      .groupBy(col("cell"), col("tbl"), col("bucket"))
      .agg(sort_array(collect_list(
        struct(col("vec_id"), col("embedding"), col("nm")))).as("ds"))
      .filter(size(col("ds")) >= 2)
    (1 to 2).foreach { i =>
      Scratch.t(s"new grouped forced$i")(grouped.queryExecution.toRdd.count())
    }

    // --- old shape stages (r14: crossJoin + max_by agg, then join) ---
    val scored = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("c_id"),
        (call_function("dot_micros", col("embedding"), col("c_emb"))
          .cast("double") /
          (sqrt(col("nm").cast("double")) *
            sqrt(col("c_nm").cast("double")))).as("ccos"))
    val oldAssign = scored
      .groupBy(col("vec_id"))
      .agg(max_by(col("c_id"),
        struct(col("ccos"), (-col("c_id")).as("nc"))).as("cell"))
    (1 to 3).foreach { i =>
      Scratch.t(s"old assign forced$i")(oldAssign.queryExecution.toRdd.count())
    }
    val oldAssignP = Caches.persist(oldAssign)
    Scratch.t("old assign persist")(oldAssignP.count())
    val oldJoin = oldAssignP.join(e, "vec_id")
      .select(col("cell"), col("vec_id"), col("embedding"), col("nm"))
    (1 to 3).foreach { i =>
      Scratch.t(s"old join forced$i")(oldJoin.queryExecution.toRdd.count())
    }
    val oldBucketed = oldJoin.select(col("cell"), col("vec_id"),
        col("embedding"), col("nm"),
        posexplode(AnnOps.lshBucketsCol(col("embedding"), g))
          .as(Seq("tbl", "bucket")))
    (1 to 2).foreach { i =>
      Scratch.t(s"old bucketed forced$i")(oldBucketed.queryExecution.toRdd.count())
    }
    val oldGrouped = oldBucketed
      .groupBy(col("cell"), col("tbl"), col("bucket"))
      .agg(sort_array(collect_list(
        struct(col("vec_id"), col("embedding"), col("nm")))).as("ds"))
      .filter(size(col("ds")) >= 2)
    (1 to 2).foreach { i =>
      Scratch.t(s"old grouped forced$i")(oldGrouped.queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
