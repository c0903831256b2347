package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DedupIndex, IncrementalPipeline, IvfPqIndex}

/** The composed incremental pipeline: a batch flows through quality
  * gate → exact dedup → DedupIndex append → TokenizerIndex pricing →
  * IvfPqIndex append → fingerprint commit, and REPLAYING the batch is
  * a no-op end to end — the composition inherits each component's
  * idempotence and the fp-commit-last ordering makes a crashed batch
  * re-runnable.
  */
class PipelineDrillSpec extends SparkSpec {

  private def probeSig(spark: org.apache.spark.sql.SparkSession,
      paths: IncrementalPipeline.Paths): (Long, Long, Seq[Seq[Any]]) = {
    val dedupRows = DedupIndex.load(spark, paths.dedup).count()
    val idx = IvfPqIndex.load(spark, paths.ivfpq)
    val codeRows = idx.codes.count()
    val probe = IvfPqIndex.probe(idx,
      Tables.embeddings(spark, sf).filter(col("vec_id") < 8))
      .collect().map(_.toSeq).toSeq
    (dedupRows, codeRows, probe)
  }

  test("a batch flows through; replaying it is a no-op end to end") {
    val root = Files.createTempDirectory("graft_drill").toString
    val paths = IncrementalPipeline.Paths(root)
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val baseDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val baseEmb = emb.filter(col("vec_id") % 5 =!= 0 ||
      col("vec_id") < 64)
    val batchDocs = docs.filter(col("doc_id") % 5 === 0)
    val batchEmb = emb.filter(col("vec_id") % 5 === 0 &&
      col("vec_id") >= 64)

    IncrementalPipeline.buildBase(spark, baseDocs, baseEmb, paths)
    Caches.releaseScope()
    val before = probeSig(spark, paths)

    val (_, counts) =
      IncrementalPipeline.runBatch(spark, batchDocs, batchEmb, paths)
    Caches.releaseScope()
    assert(counts("batch_docs") > 0 && counts("gate_kept") > 0,
      s"the gate must pass some of the batch: $counts")
    assert(counts("fresh_docs") == counts("gate_kept"),
      "no batch doc duplicates base content in the gate corpus, so " +
        s"every gate survivor is fresh: $counts")
    assert(counts("priced_docs") == counts("fresh_docs") &&
      counts("priced_tokens") > 0L, s"pricing covers the survivors: $counts")
    val after = probeSig(spark, paths)
    assert(after._1 > before._1, "the dedup index must grow by the batch")
    assert(after._2 == before._2 + counts("batch_vecs"),
      s"the IVFPQ codes must grow by exactly the batch: $counts")

    // REPLAY: the committed fingerprints make every survivor 'seen',
    // so fresh is empty and no standing artifact changes
    val (_, replay) =
      IncrementalPipeline.runBatch(spark, batchDocs, batchEmb, paths)
    Caches.releaseScope()
    assert(replay("fresh_docs") == 0L && replay("priced_docs") == 0L,
      s"replayed batch must be fully seen: $replay")
    val afterReplay = probeSig(spark, paths)
    assert(afterReplay._1 == after._1,
      "replay must not grow the dedup index")
    assert(afterReplay._2 == after._2,
      "replay must not grow the IVFPQ codes (append dedupes on ids)")
    assert(afterReplay._3 == after._3,
      "probes must be identical before and after the replay")
  }

  test("a crash BEFORE the fp commit re-runs to the same state (the " +
      "commit-last ordering)") {
    val root = Files.createTempDirectory("graft_drill2").toString
    val paths = IncrementalPipeline.Paths(root)
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    IncrementalPipeline.buildBase(spark,
      docs.filter(col("doc_id") % 5 =!= 0),
      emb.filter(col("vec_id") % 5 =!= 0 || col("vec_id") < 64), paths)
    Caches.releaseScope()
    val batchDocs = docs.filter(col("doc_id") % 5 === 0)
    val batchEmb = emb.filter(col("vec_id") % 5 === 0 &&
      col("vec_id") >= 64)

    // simulate the crash: run the full batch, then REVERT the fp
    // commit (as if the run died between stage 5 and 6)
    val fpBefore = spark.read.parquet(paths.fp).count()
    IncrementalPipeline.runBatch(spark, batchDocs, batchEmb, paths)
    Caches.releaseScope()
    val crashed = probeSig(spark, paths)
    // rewrite the fp table back to its pre-batch content
    val baseFp = IncrementalPipeline.fingerprints(
      docs.filter(col("doc_id") % 5 =!= 0))
    baseFp.write.mode("overwrite").parquet(paths.fp + ".tmp")
    spark.read.parquet(paths.fp + ".tmp").write.mode("overwrite")
      .parquet(paths.fp)
    assert(spark.read.parquet(paths.fp).count() == fpBefore)

    // the recovery replay re-runs every stage; appends dedupe, so the
    // end state is identical to the uncrashed run — and the fp table
    // is now committed
    val (_, rec) =
      IncrementalPipeline.runBatch(spark, batchDocs, batchEmb, paths)
    Caches.releaseScope()
    assert(rec("fresh_docs") > 0L,
      "the un-committed batch must re-run as fresh content")
    val recovered = probeSig(spark, paths)
    assert(recovered == crashed,
      "recovery must converge to the uncrashed state")
    // and a further replay is now a no-op
    val (_, replay) =
      IncrementalPipeline.runBatch(spark, batchDocs, batchEmb, paths)
    Caches.releaseScope()
    assert(replay("fresh_docs") == 0L)
  }
}
