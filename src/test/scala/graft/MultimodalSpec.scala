package graft

/** Multimodal plumbing: the binary column round-trips and the batched
  * decode preserves rows with bounded batch sizes.
  */
class MultimodalSpec extends SparkSpec {

  test("mm_binary_meta: magic bytes are the blob's first 4 bytes") {
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    run("mm_binary_meta").collect().foreach { r =>
      val expect = docs(r.getAs[Long]("doc_id"))
        .getBytes("UTF-8").take(4).map(b => f"$b%02x").mkString
      assert(r.getAs[String]("magic4") == expect)
      assert(r.getAs[Long]("size_bytes") > 0)
    }
  }

  test("mm_decode_batch: one feature row per blob, batches bounded at 64") {
    val out = run("mm_decode_batch").collect()
    assert(out.length == Tables.documents(spark, sf).count())
    out.foreach { r =>
      val bs = r.getAs[Long]("batch_size")
      assert(bs >= 1 && bs <= 64)
      val f0 = r.getAs[Float]("f0")
      assert(f0 >= 0.0f && f0 <= 1.0f)
    }
  }

  test("mm_shard_manifest: two-level prefix sum equals the sequential scan") {
    val seq = Tables.documents(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text").getBytes("UTF-8").length.toLong))
      .sortBy(t => (t._1, t._2))
    // brute-force sequential packing per source
    val expected = seq.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_._2).toSeq.map { case (_, id, sz) =>
        val start = cum; cum += sz
        (src, id) -> ((sz, start / 65536L, start % 65536L))
      }
    }.toMap
    val got = run("mm_shard_manifest").collect()
    assert(got.length == seq.length)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("doc_id"))
      val (sz, shard, off) = expected(k)
      assert(r.getAs[Long]("size_bytes") == sz, s"$k size")
      assert(r.getAs[Long]("shard_idx") == shard, s"$k shard")
      assert(r.getAs[Long]("offset_in_shard") == off, s"$k offset")
    }
    // every window in the plan is partitioned (no global-sort window)
    val p = plan(run("mm_shard_manifest"))
    assert(!p.contains("windowspecdefinition(doc_id"),
      "prefix sum must never window over an unpartitioned corpus")
  }

  test("mm_frame_sample: strided indices cover every doc's derived frame count") {
    val sizes = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").getBytes("UTF-8").length.toLong).toMap
    val byDoc = run("mm_frame_sample").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("frame_ts_ms")))
      .groupBy(_._1)
    assert(byDoc.keySet == sizes.keySet, "one frame set per doc")
    byDoc.foreach { case (id, rows) =>
      val nFrames = (sizes(id) % 10000L + 1000L) * 24L / 1000L
      val idx = rows.map(_._2).sorted.toSeq
      assert(idx == (0L until nFrames by 10L).toSeq, s"doc $id stride")
      // timestamps are frame_idx / fps, monotone within the doc
      rows.foreach { case (_, i, ts) => assert(ts == i * 1000L / 24L) }
    }
  }
}
