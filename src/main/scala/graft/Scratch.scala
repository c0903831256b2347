package graft

/** Throwaway profiling harness for local iteration (not part of the
  * driver contract; Verify/Bench ignore it). Typical use: paste a plan
  * under test, time sub-stages with [[t]], print `.explain("formatted")`
  * — see BASELINE.md's optimization log for what it has caught
  * (InferFiltersFromGenerate re-inlining, post-Generate projections,
  * count() pruning hiding the real cost of a projection).
  */
object Scratch {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_FORCE=1: execute the query's OWN physical plan via
    // queryExecution.toRdd — count() re-optimizes with only
    // count-needed columns, so a projection-only query (per-row
    // kernels, window frames) can prune its entire compute under the
    // bench action; this mode prices the un-pruned plan instead.
    val force = sys.env.get("SPARK_GRAFT_FORCE").exists(_ == "1")
    // SPARK_GRAFT_KNN_PHASES=1: phase decomposition of the KnnIndex
    // build (r20 materialization_total investigation)
    if (sys.env.get("SPARK_GRAFT_KNN_PHASES").exists(_ == "1")) {
      val e = Caches.persist(
        operators.AnnOps.withNormDf(Tables.embeddings(spark, d)))
      var n = 0L
      t("withNorm persist")({ n = e.count(); n })
      val cells = operators.AnnOps.ivfCellsFor(n)
      val sub = operators.EmbeddingOps.knnSubGeometry(n, cells)
      var micros: Array[Array[Long]] = null
      t("centroid train")({
        micros = operators.CentroidIndex.trainMicros(e, cells)
        micros.length.toLong
      })
      var idx: operators.KnnIndex.Index = null
      t("buildFrom+edges")({
        idx = operators.KnnIndex.buildFrom(e, micros, cells,
          operators.AnnOps.IVF_ROUNDS, sub, k = 3)
        idx.edges.count()
      })
      t("edges warm")(idx.edges.count())
      t("seeds")(idx.seeds.count())
      t("save")({
        operators.KnnIndex.save(idx, "/tmp/graft_knn_phases/knn"); 0L
      })
      t("load+neighbors")(operators.KnnIndex.neighbors(
        operators.KnnIndex.load(spark, "/tmp/graft_knn_phases/knn")).count())
      return
    }
    // SPARK_GRAFT_DECOMP=1: sub-stage decomposition of the
    // dedup_substr_rewrite forced pass (sf100 ratio investigation)
    if (sys.env.get("SPARK_GRAFT_DECOMP").exists(_ == "1")) {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, d)
      val toks = Caches.persist(docs
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("tok")))
      t("toks persist")(toks.count())
      t("toks warm")(toks.count())
      val N = 8
      val pos = Caches.persist(toks
        .filter(size(col("tok")) >= N)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("tok")) - lit(N - 1)),
          p => struct(p.as("p"), graft.functions.Portable.hash60(concat_ws(" ",
            (0 until N).map(kk =>
              element_at(col("tok"), p + lit(kk))): _*)).as("gh")))).as("s"))
        .select(col("doc_id"), col("s.p").as("p"), col("s.gh").as("gh"))
        .repartition(col("gh")))
      t("pos persist")(pos.count())
      t("pos warm")(pos.count())
      val st = pos.groupBy(col("gh"))
        .agg(min(col("doc_id")).as("keeper"),
          max(col("doc_id")).as("maxd"))
        .filter(col("maxd") > col("keeper"))
        .select(col("gh"), col("keeper"))
      t("st agg")(st.count())
      val remPos = pos.join(st, "gh")
        .filter(col("doc_id") > col("keeper"))
        .select(col("doc_id"),
          explode(sequence(col("p"), col("p") + lit(N - 1))).as("t"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("t"))).as("rem"))
      t("remPos")(remPos.count())
      t("remPos again")(remPos.count())
      val rewNoSort = toks.join(remPos, Seq("doc_id"), "left")
        .select(col("doc_id"),
          size(col("tok")).cast("long").as("n_tokens"),
          coalesce(size(col("rem")), lit(0)).cast("long")
            .as("n_removed_tokens"),
          call_function("drop_positions", col("tok"),
            coalesce(col("rem"), expr("CAST(array() AS ARRAY<INT>)")))
            .as("clean_text"))
      t("rewrite nosort")(rewNoSort.queryExecution.toRdd.count())
      t("rewrite nosort again")(rewNoSort.queryExecution.toRdd.count())
      val rewSort = rewNoSort.orderBy(col("doc_id"))
      t("rewrite sorted")(rewSort.queryExecution.toRdd.count())
      t("rewrite sorted again")(rewSort.queryExecution.toRdd.count())
      Caches.releaseScope()
      return
    }
    args.foreach { key =>
      // construct+execute together, like Bench does; run 0 is session-
      // cold, the later runs are the bench-relevant steady-state cost
      (0 to 5).foreach { i =>
        val df = SparkEntry.queries(key)(spark, d)
        if (force) t(s"$key forced$i")(df.queryExecution.toRdd.count())
        else t(s"$key e2e$i")(df.count())
      }
      SparkEntry.queries(key)(spark, d).explain("formatted")
      // mirror the bench harness: the cache scope closes per key, so
      // the next key's run 0 is attributably cold
      Caches.releaseScope()
    }
  }
}
