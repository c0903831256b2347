package graft
object PlanAudit {
  def main(a: Array[String]): Unit = {
    val s = GraftSession.builder("local[8]", 8).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = a.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (a.length > 1) a.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(s, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      def n(pat: String) = pat.r.findAllIn(p).length
      println(f"$k%-26s exch=${n("Exchange")}%2d bhj=${n("BroadcastHashJoin")}%2d smj=${n("SortMergeJoin")}%2d shj=${n("ShuffledHashJoin")}%2d bnlj=${n("BroadcastNestedLoop")}%2d cart=${n("CartesianProduct")}%2d wsc=${n("\\*\\(")}%2d topk=${n("TakeOrderedAndProject")}%2d scan=${n("Scan parquet")}%2d imr=${n("InMemoryTableScan")}%2d")
    }
    s.stop()
  }
}
