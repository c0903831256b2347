package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling main for local iteration (not part of the driver
  * contract; deleted or ignored by Verify/Bench).
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

    val jac = graft.operators.DedupOps.dedupNgramJaccard.fn(spark, d)
    t("jaccard warm0")(jac.count())
    t("jaccard")(jac.count())
    jac.explain("formatted")
    val mh = graft.operators.DedupOps.dedupMinhashLsh.fn(spark, d)
    t("minhash warm0")(mh.count())
    t("minhash")(mh.count())
    mh.explain("formatted")
  }
}
