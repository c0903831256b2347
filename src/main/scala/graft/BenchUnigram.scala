package graft

import graft.operators.UnigramLm

/** Unigram-LM trainer scale ladder (r17, the r16 verdict's ask #6 —
  * the C15/BenchTokenizer precedent applied to C28): measure the
  * driver-local EM at production dials — word-head and candidate caps
  * raised toward a real SentencePiece-sized vocabulary — against the
  * corpus in SPARK_GRAFT_SF_DIR. The corpus pays ONE word-count
  * shuffle regardless of dials; everything else is the bounded driver
  * loop this table prices.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BenchUnigram
  */
object BenchUnigram {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, d)
    // dial ladder: board gate -> 8x -> the SentencePiece-sized target
    val ladder = Seq(
      (UnigramLm.WordsCap, UnigramLm.CandCap, UnigramLm.Rounds),
      (32768, 4096, 2),
      (262144, 32768, 2),
      (262144, 32768, 4))
    ladder.foreach { case (wc, cc, r) =>
      val t0 = System.nanoTime()
      val wcap = UnigramLm.cappedWordCountsAt(docs, wc)
      val tWords = (System.nanoTime() - t0) / 1e9
      Caches.releaseScope()
      val t1 = System.nanoTime()
      val m = UnigramLm.trainFromCountsAt(wcap, cc, r)
      val tEm = (System.nanoTime() - t1) / 1e9
      println(f"[unigram] words=${wcap.size}%-7d cand_cap=$cc%-6d " +
        f"rounds=$r pieces=${m.pieces.size}%-6d tot=${m.tot} " +
        f"wordcount=$tWords%.1f s em=$tEm%.1f s")
    }
    spark.stop()
  }
}
