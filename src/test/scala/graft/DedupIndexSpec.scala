package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.DedupIndex

/** The persistent incremental LSH index: probe finds cross-batch
  * near-dups without re-shingling or shuffling the indexed corpus.
  */
class DedupIndexSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  private val base = (1 to 40).map(i => s"idx$i").mkString(" ")
  private val other = (1 to 40).map(i => s"oth$i").mkString(" ")

  test("probe finds new-vs-indexed near-dups, never old-vs-old") {
    val index = DedupIndex.build(docs(0L -> base, 1L -> other))
    val batch = docs(2L -> base.replace("idx9", "edited"), 3L -> "tiny text here")
    val pairs = DedupIndex.probe(index, batch).collect()
      .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("new_id"),
        r.getAs[Double]("est_jaccard")))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 2L)),
      s"expected only (0,2): ${pairs.toSeq}")
    assert(pairs.head._3 >= 0.5 && pairs.head._3 <= 1.0)
  }

  test("ingest folds the batch in: later probes see earlier batches") {
    val index0 = DedupIndex.build(docs(0L -> base))
    val (p1, index1) = DedupIndex.ingest(index0, docs(1L -> other))
    assert(p1.collect().isEmpty, "unrelated batch pairs with nothing")
    // the next batch dups BOTH an original doc and a previous batch's
    val batch2 = docs(2L -> base.replace("idx3", "x"), 3L -> other)
    val pairs = DedupIndex.probe(index1, batch2).collect()
      .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("new_id"))).toSet
    assert(pairs == Set((0L, 2L), (1L, 3L)), s"got $pairs")
  }

  test("save/load roundtrip: band-partitioned layout, identical probes") {
    val dir = Files.createTempDirectory("graft_lshidx").toString + "/index"
    val index = DedupIndex.build(docs(0L -> base, 1L -> other))
    DedupIndex.save(index, dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("band=")),
      "index parquet must partition by band")
    val reloaded = DedupIndex.load(spark, dir)
    val batch = docs(2L -> base.replace("idx9", "edited"))
    val a = DedupIndex.probe(index, batch).collect()
      .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("new_id"))).toSet
    val b = DedupIndex.probe(reloaded, batch).collect()
      .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("new_id"))).toSet
    assert(a == b && a == Set((0L, 2L)))
  }

  test("occupancy cap: saturated index buckets emit no pairs") {
    // two identical indexed docs share every band bucket: occupancy 2
    val index = DedupIndex.build(docs(0L -> base, 1L -> base))
    val batch = docs(2L -> base)
    val capped = DedupIndex.probe(index, batch, maxBucket = 1).collect()
    assert(capped.isEmpty, "buckets over the cap must not pair")
    val uncapped = DedupIndex.probe(index, batch).collect()
      .map(r => (r.getAs[Long]("first_id"), r.getAs[Long]("new_id"))).toSet
    assert(uncapped == Set((0L, 2L), (1L, 2L)))
  }

  test("probe plan broadcasts the batch; the index side never shuffles") {
    val index = DedupIndex.build(docs(0L -> base, 1L -> other))
    val batch = docs(2L -> base.replace("idx9", "edited"))
    val p = plan(DedupIndex.probe(index, batch))
    assert(p.contains("BroadcastHashJoin"), "probe must broadcast-join")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }
}
