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
