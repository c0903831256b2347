package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantic checks for text + dedup ops, including a crafted mini-corpus
  * with known exact/near duplicates (the sf0.001 corpus has none, so the
  * positive dedup paths are proven here).
  */
class TextDedupSpec extends SparkSpec {

  /** Writes a documents.parquet with planted duplicates; returns the dir. */
  lazy val miniDir: String = {
    val dir = Files.createTempDirectory("graft_mini").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),              // exact dup of 0
      (2L, base + " tomorrow", "en", "src2", base.length + 9L),  // near dup of 0/1
      (3L, "completely different words about spark query engines and storage",
        "en", "src3", 63L),
      (4L, "le chat et le chien et les oiseaux des les la maison", "fr", "src4", 52L),
      (5L, base.toUpperCase, "en", "src5", base.length.toLong),  // case-normalized dup
      (6L, "", "en", "src6", 0L),                                // empty text
      (7L, "two tokens", "en", "src7", 10L))                     // below shingle width
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_token_count / text_fingerprint agree on the real corpus") {
    val tc = run("text_token_count").collect()
    assert(tc.length == 500 && tc.forall(_.getAs[Long]("n_tokens") > 0))
    val fp = run("text_fingerprint").collect()
    assert(fp.map(_.getAs[Long]("fp60")).distinct.length == 500,
      "distinct docs must get distinct 60-bit fingerprints")
  }

  test("text_quality: ratios in range, score composition") {
    run("text_quality").collect().foreach { r =>
      val p = r.getAs[Double]("punct_ratio")
      val s = r.getAs[Double]("stopword_ratio")
      val q = r.getAs[Double]("quality_score")
      assert(p >= 0 && p <= 1); assert(s >= 0 && s <= 1)
      assert(q >= 0 && q <= 1)
      assert(r.getAs[Boolean]("is_quality") == (q > 0.5))
    }
  }

  test("text_langid: french stopwords beat english on a french doc") {
    val rows = run("text_langid", miniDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(rows(4L) == "fr", s"expected fr, got ${rows(4L)}")
    assert(rows(3L) == "en")
  }

  test("dedup_exact: exact + case/whitespace dups collapse, others don't") {
    val groups = run("dedup_exact", miniDir).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(groups(0L) == 3, "docs 0,1,5 must share a fingerprint")
    assert(groups(2L) == 1 && groups(3L) == 1 && groups(4L) == 1)
    assert(groups(6L) == 1 && groups(7L) == 1, "edge docs must survive")
  }

  test("edge docs (empty / below shingle width) flow through every text/dedup op") {
    // none of these may crash, and the edge docs must not produce
    // spurious dup pairs
    Seq("text_token_count", "text_quality", "text_langid", "text_fingerprint",
      "dedup_simhash").foreach { k =>
      val ids = run(k, miniDir).collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(6L) && ids.contains(7L), s"$k dropped edge docs")
    }
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh").foreach { k =>
      val pairs = run(k, miniDir).collect()
        .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")))
      assert(!pairs.exists { case (i, j) => i >= 6L || j >= 6L },
        s"$k paired an edge doc: ${pairs.toSeq}")
    }
  }

  test("dedup_ngram_jaccard finds near + exact dup pairs with sane scores") {
    val pairs = run("dedup_ngram_jaccard", miniDir).collect()
      .map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((0L, 1L)) == 1.0, "exact dup pair must score 1.0")
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5,
      "near dup pair missing")
    assert(!pairs.keySet.exists { case (i, j) => i == 3L || j == 3L },
      "unrelated doc paired")
  }

  test("dedup_minhash_lsh agrees with exhaustive jaccard at tau=0.5") {
    def pairSet(key: String) = run(key, miniDir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.5)
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(pairSet("dedup_minhash_lsh") == pairSet("dedup_ngram_jaccard"))
  }

  test("dedup_simhash: identical texts identical hashes, near-dups close") {
    val sim = run("dedup_simhash", miniDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sim(0L) == sim(1L) && sim(0L) == sim(5L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sim(0L), sim(2L)) <= 10, "near-dup simhashes too far")
    assert(hamming(sim(0L), sim(3L)) > 10, "unrelated simhashes too close")
  }

  test("dedup plans never fall back to cartesian products") {
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embedding")
      .foreach { key =>
        val p = plan(run(key))
        assert(!p.contains("CartesianProduct"), s"$key plan has a cross join")
      }
  }

  test("dedup_embedding: pairs stay within label blocks, cos >= 0.3") {
    val labels = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    run("dedup_embedding").collect().foreach { r =>
      assert(labels(r.getAs[Long]("i")) == labels(r.getAs[Long]("j")))
      assert(r.getAs[Double]("cos") >= 0.3)
    }
  }
}
