package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** C37 — modified Kneser-Ney with estimated discounts: the planted
  * corpus where the count-of-count estimates ORDER documents
  * differently from C29's fixed D = 3/4, and append parity of the
  * count-of-count row through the LmIndex trigram artifact.
  */
class LmMknSpec extends SparkSpec {

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_mkn").toString
    spark.createDataFrame(docs.map { case (i, t) =>
      (i, t, "en", s"s$i", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Reference half (even ids) with a SKEWED trigram count-of-count
    * profile — many singletons against one doubleton/tripleton/
    * quadrupleton — so the estimated D₁ ≈ 0.96 discounts singleton
    * evidence far harder than the fixed 3/4. Every ref doc is exactly
    * one trigram (3 tokens), so type counts are planted, not emergent.
    */
  private def corpus(): Seq[(Long, String)] = {
    var id = -2L
    def ref(t: String): (Long, String) = { id += 2; (id, t) }
    val singles = (1 to 40).map(i => ref(s"s${i}a s${i}b s${i}c"))
    val multi = Seq.fill(2)("d1 d2 d3") ++ Seq.fill(3)("t1 t2 t3") ++
      Seq.fill(4)("q1 q2 q3")
    val planted = Seq(
      "a b c",          // the ref-singleton the scored doc leans on
      // (z, q) continuation count 2 among 8 continuations of z: the
      // mid-strength backoff that lands BETWEEN the two models' scores
      // for the singleton doc
      "y z q", "y2 z q",
      "g1 z r1", "g2 z r2", "g3 z r3", "g4 z r4", "g5 z r5", "g6 z r6",
      "u1 m n", "u2 m n",                   // mid-level n23 = 2
      "v1 m2 n2", "v2 m2 n2", "v3 m2 n2",   // n23 = 3
      "w1 m3 n3", "w2 m3 n3", "w3 m3 n3", "w4 m3 n3") // n23 = 4
    singles ++ (multi ++ planted).map(ref)
  }

  test("lm_trigram_mkn: estimated discounts order documents " +
      "differently from the fixed-D model on the planted corpus") {
    // scored (odd) docs: X leans on a ref-singleton trigram (heavily
    // discounted under mkn, mildly under fixed D); Y leans on backoff
    // (same treatment under both)
    val docs = corpus() ++ Seq(
      (1001L, "a b c"),
      (1003L, "x1 z q"),
      (1005L, "d1 d2 d3"),
      (1007L, "u1 m n"))
    val dir = writeDocs(docs)
    val kn = run("lm_trigram_kn", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_bits"))
      .toMap
    val mkn = run("lm_trigram_mkn", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_bits"))
      .toMap
    info(s"kn:  ${Seq(1001L, 1003L, 1005L, 1007L).map(i => i -> kn(i))}")
    info(s"mkn: ${Seq(1001L, 1003L, 1005L, 1007L).map(i => i -> mkn(i))}")
    // the designed flip: under fixed D the singleton doc X outscores the
    // backoff doc Y; under estimated discounts the order reverses
    assert(kn(1001L) < kn(1003L),
      s"fixed-D should prefer X: ${kn(1001L)} vs ${kn(1003L)}")
    assert(mkn(1001L) > mkn(1003L),
      s"mkn should prefer Y: ${mkn(1001L)} vs ${mkn(1003L)}")
  }

  test("lm_trigram_mkn: count-of-count rows derived from an appended " +
      "LmIndex trigram artifact equal direct training on the union") {
    import spark.implicits._
    val a = corpus()
    val b = Seq((500L, "d1 d2 d3"), (502L, "e1 e2 e3"),
      (504L, "a b c"))
    def df(docs: Seq[(Long, String)]) =
      docs.toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft_mkn_idx").toString + "/lm3"
    operators.LmIndex.save3(spark, operators.LmIndex.train3(df(a)), path)
    operators.LmIndex.append3(spark, path, df(b))
    val loaded = operators.LmIndex.load3(spark, path)
    def coc(tg: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      tg.groupBy(col("cnt")).agg(count(lit(1)).as("k")).collect()
        .map(r => r.getAs[Long]("cnt") -> r.getAs[Long]("k")).toMap
    val direct = operators.LmIndex.train3(df(a ++ b))
    assert(coc(loaded.trigrams) == coc(direct.trigrams),
      "appended artifact count-of-counts diverge from direct training")
  }
}
