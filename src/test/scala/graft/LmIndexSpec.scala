package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LmIndex

/** The persistent reference-LM artifact: scoring under a loaded model
  * must equal scoring under the in-session aggregate to the q16 micro,
  * the loaded-consumer plan must never re-read the reference corpus,
  * append must equal retraining on the union, and torn or inconsistent
  * saves must refuse to load.
  */
class LmIndexSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_lmidx_$tag").toString + "/model"

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("save/load roundtrip: loaded scores equal in-session scores to " +
      "the q16 micro, and equal the oracle-checked board query") {
    val dir = tmp("rt")
    val refDocs = docs.filter(col("doc_id") % 2 === 0)
    LmIndex.save(spark, LmIndex.train(refDocs), dir)
    val loaded = LmIndex.load(spark, dir)
    val got = rows(LmIndex.score(docs, loaded))
    assert(got.nonEmpty)
    assert(got == rows(LmIndex.score(docs, LmIndex.train(refDocs))),
      "loaded-model scores must equal in-session-trained scores")
    // the board op is the same kernel: its (doc_id, n_bigrams,
    // sum_bits_q16) triple must match the artifact cycle exactly
    val board = rows(run("lm_bigram_ref")
      .select(col("doc_id"), col("n_bigrams"), col("sum_bits_q16")))
    assert(got == board,
      "artifact-cycle scores must match the oracle-checked board query")
    Caches.releaseScope()
  }

  test("a loaded consumer reads only the target corpus and the model " +
      "frames — the reference corpus path does not appear in the plan") {
    val dir = tmp("plan")
    // train on a COPY of the corpus so reference scans are recognizable
    // by path: a loaded consumer's plan must reference the model dir,
    // never refCorpus
    val refCorpus = Files.createTempDirectory("graft_lmidx_ref").toString
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$refCorpus/documents.parquet")
    LmIndex.save(spark,
      LmIndex.train(Tables.documents(spark, refCorpus)), dir)
    Caches.releaseScope()
    val scored = LmIndex.score(docs, LmIndex.load(spark, dir))
    scored.count()
    val p = plan(scored)
    assert(!p.contains(refCorpus),
      s"scoring under a loaded model must not rescan the reference " +
        s"corpus:\n$p")
    assert(p.contains(dir),
      s"the scoring plan should read the persisted model frames:\n$p")
  }

  test("unseen prefixes score log2(V) exactly (the uniform prior)") {
    import spark.implicits._
    // reference: "a b", "a c" → V = 2 continuations, c_prefix(a) = 2.
    // scoring doc "x y": prefix x unseen → bits = log2((0+2)/(0+1)) = 1
    // bit exactly = 65536 in q16.
    val ref = Seq((0L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val target = Seq((1L, "x y")).toDF("doc_id", "text")
    val got = rows(LmIndex.score(target, LmIndex.train(ref)))
    assert(got == Seq((1L, 1L, 65536L)),
      s"unseen-prefix bigram must cost exactly log2(V) = 1 bit: $got")
  }

  test("append equals retraining on the union, frame-exact") {
    val dir = tmp("app")
    val half = docs.filter(col("doc_id") % 4 === 0)
    val add = docs.filter(col("doc_id") % 4 === 2)
    LmIndex.save(spark, LmIndex.train(half), dir)
    LmIndex.append(spark, dir, add)
    val appended = LmIndex.load(spark, dir)
    val retrained = LmIndex.train(docs.filter(col("doc_id") % 2 === 0))
    def bg(r: LmIndex.Ref) =
      r.bigrams.orderBy(col("w1"), col("w2")).collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(bg(appended) == bg(retrained),
      "appended model must equal the union retrain bigram-for-bigram")
    assert(appended.vocab.head().getLong(0) ==
      retrained.vocab.head().getLong(0))
    Caches.releaseScope()
  }

  test("torn save refuses to load; an inconsistent vocab refuses to " +
      "load; an interrupted append swap rolls back to the live model") {
    val dir = tmp("torn")
    val ref = LmIndex.train(docs.filter(col("doc_id") % 2 === 0))
    LmIndex.save(spark, ref, dir)
    val before = LmIndex.load(spark, dir)
      .bigrams.count()
    // torn save: marker incomplete
    spark.range(1).select(lit(false).as("complete"))
      .write.mode("overwrite").parquet(s"$dir/complete")
    intercept[IllegalStateException] { LmIndex.load(spark, dir) }
    spark.range(1).select(lit(true).as("complete"))
      .write.mode("overwrite").parquet(s"$dir/complete")
    // inconsistent vocab: stored v drifted from the bigram frame
    spark.range(1).select(lit(999999L).as("v"))
      .write.mode("overwrite").parquet(s"$dir/vocab")
    intercept[IllegalStateException] { LmIndex.load(spark, dir) }
    spark.read.parquet(s"$dir/bigrams")
      .agg(countDistinct(col("w2")).as("v"))
      .write.mode("overwrite").parquet(s"$dir/vocab")
    // uncommitted append debris: a torn staged sibling must roll back
    // to the intact live model on the next load
    LmIndex.save(spark, ref, dir + ".staged")
    spark.range(1).select(lit(false).as("complete"))
      .write.mode("overwrite").parquet(s"$dir.staged/complete")
    val recovered = LmIndex.load(spark, dir)
    assert(recovered.bigrams.count() == before,
      "interrupted append must leave the previous complete model")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".staged")),
      "recovery must clear the uncommitted staged sibling")
    Caches.releaseScope()
  }
}
