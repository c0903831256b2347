package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalPipeline

/** Measures the composed incremental pipeline
  * ([[graft.operators.IncrementalPipeline]]): build the standing
  * state from the base corpus ONCE, then time a 10% batch and a 5%
  * batch through quality gate → exact dedup → DedupIndex append →
  * TokenizerIndex pricing → IvfPqIndex append, each against a FRESH
  * copy of the base state — the half-batch run is the control that
  * shows per-stage cost scaling with the batch, not the corpus.
  * Prints ONE JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BenchPipeline
  */
object BenchPipeline {

  private def copyDir(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).foreach(_.foreach(f =>
        copyDir(f, new java.io.File(dst, f.getName))))
    } else
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val root = java.nio.file.Files
      .createTempDirectory("graft_pipe").toString
    val basePaths = IncrementalPipeline.Paths(s"$root/base")

    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
    // 10% batch by id hash; queries (vec_id < 8) stay in the base so
    // the IVFPQ seed/query contracts hold
    val baseDocs = docs.filter(col("doc_id") % 10 =!= 0)
    // ids < 2048 stay in the base unconditionally: the IVFPQ coarse
    // seed slice and residual codebook seeds are contiguous id ranges
    // above QUERY_MAX and must exist in the base corpus
    val baseEmb = emb.filter(col("vec_id") % 10 =!= 0 ||
      col("vec_id") < 2048)

    val tBase = IncrementalPipeline.buildBase(
      spark, baseDocs, baseEmb, basePaths)
    Caches.releaseScope()

    def jmap(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    def jmapL(m: Map[String, Long]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")

    def run(tag: String, mod: Int): (String, String) = {
      val paths = IncrementalPipeline.Paths(s"$root/$tag")
      copyDir(new java.io.File(basePaths.root),
        new java.io.File(paths.root))
      val batchDocs = docs.filter(col("doc_id") % 10 === 0 &&
        col("doc_id") % mod === 0)
      val batchEmb = emb.filter(col("vec_id") % 10 === 0 &&
        col("vec_id") % mod === 0 && col("vec_id") >= 2048)
      val (secs, counts) =
        IncrementalPipeline.runBatch(spark, batchDocs, batchEmb, paths)
      Caches.releaseScope()
      (jmap(secs), jmapL(counts))
    }

    // warm the stage plans once on the half batch shape (JIT + plan
    // compilation otherwise bills to whichever run goes first), then
    // measure half and full against fresh state copies
    run("warm", 20)
    val (halfS, halfC) = run("half", 20)
    val (fullS, fullC) = run("full", 10)

    println(s"""{"metric":"pipeline_drill","sf":"$d","base":${jmap(tBase)},"full_batch":{"secs":$fullS,"counts":$fullC},"half_batch":{"secs":$halfS,"counts":$halfC}}""")
    spark.stop()
  }
}
