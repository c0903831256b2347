package graft

import org.apache.spark.sql.functions._

/** C38 — batched BM25: singleton-query parity with C9 and the
  * posting-list plan shape (broadcast pruning, no cartesian).
  */
class RetrievalSpec extends SparkSpec {

  test("text_bm25_batch: a singleton query with C9's terms ranks the " +
      "corpus in C9's order at matching scores") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val qt = operators.TextOps.BM25_TERMS.map(t => (0L, t))
      .toDF("q_id", "t")
    val batch = operators.RetrievalOps.bm25Rank(docs, qt, 20)
      .collect()
    val single = run("text_bm25").collect()
    assert(batch.nonEmpty)
    assert(batch.map(_.getAs[Long]("doc_id")).toSeq ==
      single.map(_.getAs[Long]("doc_id")).toSeq,
      "doc ranking diverges from text_bm25")
    batch.zip(single).foreach { case (b, s) =>
      val diff = math.abs(b.getAs[Double]("score") -
        s.getAs[Double]("score"))
      // batch sums exact per-term micros; C9 sums raw doubles in fixed
      // term order — agreement to the micro quantization
      assert(diff <= 5e-6, s"score drift $diff at doc " +
        s"${b.getAs[Long]("doc_id")}")
    }
  }

  test("text_bm25_batch: plan has no cartesian product and per-query " +
      "top-k is the bounded-heap aggregate") {
    val df = run("text_bm25_batch", "/root/testdata/sf0.01")
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "cartesian in plan")
    assert(p.contains("topk_min"), "top-k is not the bounded heap")
    // ranks are dense from 1 per query
    val byQ = run("text_bm25_batch", "/root/testdata/sf0.01").collect()
      .groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length).toSeq, s"ranks not dense for query $q")
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("score")).toSeq
      assert(sorted == sorted.sortBy(-(_: Double)),
        s"scores not descending for query $q")
    }
  }
}
