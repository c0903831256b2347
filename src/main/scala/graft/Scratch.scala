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
    args.foreach { key =>
      val df = SparkEntry.queries(key)(spark, d)
      t(s"$key warm0")(df.count())
      t(key)(df.count())
      df.explain("formatted")
    }
  }
}
