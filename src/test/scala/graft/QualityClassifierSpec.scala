package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** C18 learned quality scorer: the model must LEARN (beat the trivial
  * predictors on its own training objective), train deterministically
  * (bit-identical weights run-to-run — the property the DuckDB oracle
  * replay depends on), and run its epochs entirely over the persisted
  * feature frame (the corpus-scanned-once claim).
  */
class QualityClassifierSpec extends SparkSpec {

  test("training fits: beats the zero model and the majority baseline") {
    val out = run("quality_classifier").collect()
    val n = out.length.toDouble
    assert(n > 0)
    val pos = out.count(_.getLong(1) == 1L) / n
    val acc = out.count(r => r.getBoolean(3) == (r.getLong(1) == 1L)) / n
    val majority = math.max(pos, 1.0 - pos)
    val mse = out.map { r =>
      val d = (r.getLong(2) - r.getLong(1) * 1000000L).toDouble
      d * d
    }.sum / n
    val mseZero = pos * 1e12 // epoch-0 model scores everything 0
    info(f"n=${out.length} pos=$pos%.3f acc=$acc%.3f " +
      f"majority=$majority%.3f mse/mse0=${mse / mseZero}%.3f")
    assert(acc >= majority - 1e-9,
      f"learned scorer ($acc%.3f) must not lose to the majority class " +
        f"($majority%.3f)")
    assert(mse < mseZero * 0.95,
      "8 GD epochs must reduce the training objective vs the zero model")
  }

  private def frame(dir: String = sf) = {
    val docs = Tables.documents(spark, dir)
    val labels = docs.select(col("doc_id"),
      (operators.TextOps.qualityScoreCol > lit(0.5)).cast("long").as("y"))
    QualityClassifier.docFrame(docs).join(labels, "doc_id")
  }

  test("training is deterministic: two runs produce identical weights") {
    val df = frame().persist()
    val td = QualityClassifier.buildTrainData(df)
    val m1 = QualityClassifier.train(td, epochs = 3)
    val m2 = QualityClassifier.train(td, epochs = 3)
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.bias == m2.bias,
      "partitioning/combine order must never leak into the model")
    assert(m1.weights.exists(_ != 0L), "training must actually move weights")
    df.unpersist(); Caches.releaseScope()
  }

  test("epochs run on the materialized training RDD only — the corpus " +
      "files can vanish and training still works") {
    // the corpus-touched-once claim, functionally: copy the fixture,
    // build TrainData (one pass materializes the cached RDD), DELETE the
    // parquet, then train — every epoch must come out of the cache
    val dir = java.nio.file.Files.createTempDirectory("graft_qc").toString
    val docsSrc = Tables.documents(spark, sf)
    docsSrc.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val td = QualityClassifier.buildTrainData(frame(dir))
    assert(td.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "the training set must be persisted")
    assert(td.nDocs > 0 && td.h.exists(_ > 0L))
    // delete the source files out from under the (materialized) RDD
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
    val m = QualityClassifier.train(td, epochs = 3)
    assert(m.weights.exists(_ != 0L),
      "training after source deletion proves no per-epoch corpus rescan")
    Caches.releaseScope()
  }
}
