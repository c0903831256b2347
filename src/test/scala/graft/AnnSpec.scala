package graft

/** ANN semantics: the exact baseline behaves, and the LSH path trades
  * bounded recall for sublinear candidate scans (recall pinned against
  * the baseline — an oracle match alone cannot prove retrieval quality).
  */
class AnnSpec extends SparkSpec {

  test("ann_bruteforce: 5 ranked neighbors per query, self excluded, sorted") {
    val rows = run("ann_bruteforce").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(!rs.exists(_.getAs[Long]("vec_id") == q), "self in neighbors")
      val cs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.sameElements(cs.sorted.reverse), "ranks not cos-descending")
    }
  }

  private def sets(key: String) = run(key).collect()
    .groupBy(_.getAs[Long]("q_id"))
    .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap

  private def recallVsExact(key: String): Double = {
    val exact = sets("ann_bruteforce")
    val approx = sets(key)
    exact.keys.map { q =>
      approx.get(q).map(s => (s & exact(q)).size / 5.0).getOrElse(0.0)
    }.sum / exact.size
  }

  test("ann_lsh: recall@5 vs exact baseline >= 0.15") {
    val r = recallVsExact("ann_lsh")
    assert(r >= 0.15, f"LSH recall@5 $r%.2f below floor")
  }

  test("ann_ivf: recall@5 vs exact baseline >= 0.15") {
    val r = recallVsExact("ann_ivf")
    assert(r >= 0.15, f"IVF recall@5 $r%.2f below floor")
  }
}
