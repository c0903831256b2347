package graft

/** Driver-run benchmark: times every registered query at the given scale
  * factor and prints one JSON line. Uses [[GraftSession]] so configs (UTC,
  * AQE, nanosAsLong) match Verify exactly — a query that needs a session
  * config must behave identically here. Failures are NOT swallowed into
  * timings: a failed query records ok=false with elapsed-to-failure, and
  * the process exits non-zero so the driver sees it.
  *
  * Cache policy: operators persist() shared artifacts (the ANN norm
  * frame, shingle sets — see SURVEY §5 "shared-frame materialization"),
  * and the bench deliberately does NOT clearCache() between queries:
  * the first query over an artifact pays its materialization, later
  * ones reuse it, mirroring a deployment where the artifact lives
  * beside the table. Entries are MEMORY_AND_DISK and plan-keyed (one
  * per artifact, not per reference), so a full board run caches tens
  * of MB per scale factor and evicts under pressure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing: JIT, codegen infrastructure, and the
    // per-file parquet footers/file-index all initialize on first action —
    // without this the alphabetically-first query absorbs ~3-5s of one-time
    // cost and per-query numbers aren't comparable across rounds.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // Warm the heavy expression machinery the same way: the interpreted
    // HOF evaluators, md5/minhash16 and dot/proj kernels all JIT on first
    // use (~4-5s, measured), which would otherwise be billed to whichever
    // query alphabetically touches shingles/vectors first. Run the two
    // deepest pipelines once at the smallest scale factor (fall back to
    // the bench SF if no sibling sf0.001 exists).
    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.toString else sfDir
    }
    Seq("dedup_minhash_lsh", "ann_lsh").foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    var anyFailed = false
    // SPARK_GRAFT_ONLY=k1,k2 restricts the run (local iteration on one op).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Deterministic run order (sorted keys) so per-round numbers compare.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            anyFailed = true
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Total counts only successful queries; failures are listed separately.
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (anyFailed) sys.exit(1)
  }
}
