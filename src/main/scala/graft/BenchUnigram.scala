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
      println(f"[unigram] corpus words=${wcap.size}%-7d cand_cap=$cc%-6d " +
        f"rounds=$r pieces=${m.pieces.size}%-6d tot=${m.tot} " +
        f"wordcount=$tWords%.1f s em=$tEm%.1f s")
    }
    // vocab-scale run over the deterministic synthetic Zipf vocabulary
    // (the BenchTokenizer shape — the synthetic corpora have only a few
    // thousand distinct words, so the corpus ladder saturates early;
    // web-scale corpora present ~1M distinct words and THIS run prices
    // that regime)
    val rnd = new scala.util.Random(42)
    val letters = "etaoinshrdlucmfwypvbgkjqxz"
    def word(): String = {
      val n = 3 + rnd.nextInt(9)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb += letters(math.min((math.abs(rnd.nextGaussian()) * 6).toInt, 25))
      }
      sb.toString
    }
    val synthAll = (0 until 1000000).map { i =>
      (word() + java.lang.Integer.toString(i, 26).map(c =>
        ('a' + Character.digit(c, 26)).toChar),
        math.max(1L, 10000000L / (i + 1)))
    }.filter(w => w._1.length <= UnigramLm.MaxWordLen)
    Seq((65536, 8192, 2), (262144, 32768, 2), (synthAll.size, 32768, 2))
      .foreach { case (wc, cc, r) =>
        val head = synthAll.sortBy { case (w, c) => (-c, w) }.take(wc)
        val t = System.nanoTime()
        val m = UnigramLm.trainFromCountsAt(head, cc, r)
        val tEm = (System.nanoTime() - t) / 1e9
        println(f"[unigram] synth  words=${head.size}%-7d cand_cap=$cc%-6d " +
          f"rounds=$r pieces=${m.pieces.size}%-6d em=$tEm%.1f s")
      }
    spark.stop()
  }
}
