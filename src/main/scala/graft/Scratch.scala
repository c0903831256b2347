package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

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
    // warm shingle machinery
    graft.operators.DedupOps.dedupMinhashLsh.fn(spark, "/root/testdata/sf0.001").count()

    def current = graft.operators.DedupOps.dedupNgramJaccard.fn(spark, d)
    t("current warm0")(current.count())
    t("current")(current.count())

    def viaWindow = {
      val sh0 = Tables.documents(spark, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("tok"))
        .select(col("doc_id"), explode(shinglesFromTokens(col("tok"))).as("s"))
      val sh = sh0.withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      sh.groupBy(col("s"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(pairCombinations(col("ds"))).as("p"))
        .groupBy(col("p.i.doc_id").as("i"), col("p.j.doc_id").as("j"),
          col("p.i.n").as("n_i"), col("p.j.n").as("n_j"))
        .agg(count(lit(1)).as("c"))
        .select(col("i"), col("j"),
          (col("c") * lit(1.0) / (col("n_i") + col("n_j") - col("c")))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.2)
        .orderBy(col("i"), col("j"))
    }
    t("window-n warm0")(viaWindow.count())
    t("window-n")(viaWindow.count())
  }
}
