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

    var pairs: org.apache.spark.sql.DataFrame = null
    t("pairs checkpoint") {
      pairs = graft.operators.DedupOps.dedupMinhashLsh.fn(spark, d)
        .select(col("i"), col("j")).localCheckpoint()
      pairs.count()
    }
    val und = pairs.union(pairs.select(col("j"), col("i"))).toDF("src", "dst")
    var labels: org.apache.spark.sql.DataFrame = null
    t("seed") {
      labels = und.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("v"), least(col("mn"), col("src")).as("label"))
        .localCheckpoint()
      labels.count()
    }
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      var prop: org.apache.spark.sql.DataFrame = null
      t(s"round $round propagate") {
        prop = und.join(labels, col("src") === col("v"))
          .select(col("dst").as("v"), col("label"))
          .union(labels)
          .groupBy(col("v")).agg(min(col("label")).as("label"))
          .localCheckpoint()
        prop.count()
      }
      t(s"round $round changed") {
        changed = prop
          .join(labels.withColumnRenamed("label", "old"), "v")
          .filter(col("label") =!= col("old")).count()
        changed
      }
      labels = prop
    }
  }
}
