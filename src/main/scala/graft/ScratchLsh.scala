package graft.operators
import org.apache.spark.sql.functions._
object ScratchLsh {
  def main(args: Array[String]): Unit = {
    val d = "/root/repo/localdata/sf10"
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val n = graft.Tables.embeddings(spark, d).count()
    val g = AnnOps.LshGeometry.forCorpus(n)
    println(s"[scratch] n=$n geometry $g")
    (0 to 1).foreach { i =>
      graft.Scratch.t(s"withNorm agg $i") {
        AnnOps.withNormDf(graft.Tables.embeddings(spark, d))
          .agg(sum("nm")).collect(); 1L
      }
    }
    (0 to 1).foreach { i =>
      graft.Scratch.t(s"bucketIndex agg $i") {
        val e = AnnOps.withNormDf(graft.Tables.embeddings(spark, d))
        AnnOps.bucketIndex(e, g).agg(sum("bucket")).collect(); 1L
      }
    }
    (0 to 1).foreach { i =>
      graft.Scratch.t(s"lshCandidates $i") {
        val c = AnnOps.lshCandidates(spark, d, g).count()
        graft.Caches.releaseScope(); c
      }
    }
    (0 to 1).foreach { i =>
      graft.Scratch.t(s"lshTopK full $i") {
        val c = AnnOps.lshTopK(spark, d, g).count()
        graft.Caches.releaseScope(); c
      }
    }
    spark.stop()
  }
}
