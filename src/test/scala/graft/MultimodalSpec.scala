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
      // text bytes are not a PNG: the raw fallback path
      assert(r.getAs[String]("format") == "raw")
      assert(r.getAs[Boolean]("crc_ok"))
    }
  }

  // ---- hand-built PNG fixtures for the real chunk-walk decode ----

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val tb = tpe.getBytes("US-ASCII")
    crc.update(tb); crc.update(data)
    be32(data.length.toLong) ++ tb ++ data ++ be32(crc.getValue)
  }

  private def pngBytes(w: Int, h: Int, depth: Int, ctype: Int): Array[Byte] =
    pngSig ++
      chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
        Array(depth.toByte, ctype.toByte, 0.toByte, 0.toByte, 0.toByte)) ++
      chunk("IDAT", Array[Byte](0x78, 0x01, 0x03, 0x00)) ++
      chunk("IEND", Array.empty[Byte])

  test("Png.decode: chunk walk reads IHDR and validates every CRC") {
    import graft.operators.MultimodalOps.Png
    // the builder's CRC is grounded against the PUBLISHED IEND constant
    // (len-0 IEND chunk CRC is ae426082 in every PNG ever written)
    assert(chunk("IEND", Array.empty[Byte]).drop(8).map(b => f"$b%02x")
      .mkString == "ae426082")
    val m = Png.decode(pngBytes(7, 3, 8, 2)).get
    assert(m == Png.Meta(7L, 3L, 8L, 2L, 3L, crcOk = true),
      s"got $m")
    // a flipped payload byte fails that chunk's CRC
    val bad = pngBytes(7, 3, 8, 2)
    bad(pngSig.length + 12 + 13 + 10) = 0x7f // inside IDAT data
    assert(!Png.decode(bad).get.crcOk)
    // truncation mid-chunk fails structurally
    assert(!Png.decode(pngBytes(7, 3, 8, 2).dropRight(6)).get.crcOk)
    // IHDR-not-first fails (signature alone doesn't make a PNG)
    val noIhdr = pngSig ++ chunk("IDAT", Array[Byte](1, 2)) ++
      chunk("IEND", Array.empty[Byte])
    assert(!Png.decode(noIhdr).get.crcOk)
    // non-PNG bytes are not an error — they route to the raw path
    assert(Png.decode("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("decodePipeline: PNG and raw blobs share one batched path") {
    import spark.implicits._
    import graft.operators.MultimodalOps
    val blobs = Seq(
      MultimodalOps.BlobRow(0L, pngBytes(640, 480, 8, 6)),
      MultimodalOps.BlobRow(1L, "not an image".getBytes("UTF-8")),
      MultimodalOps.BlobRow(2L, pngBytes(16, 16, 16, 0)))
    val out = MultimodalOps.decodePipeline(blobs.toDS()).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(0L).format == "png" && out(0L).width == 640L &&
      out(0L).height == 480L && out(0L).bit_depth == 8L &&
      out(0L).color_type == 6L && out(0L).n_chunks == 3L && out(0L).crc_ok)
    assert(out(1L).format == "raw" && out(1L).width == 0L)
    assert(out(2L).format == "png" && out(2L).width == 16L &&
      out(2L).bit_depth == 16L)
    assert(out.values.forall(_.batch_size <= 64L))
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

  test("mm_phash_dedup: exact copy at Hamming 0, light edit within tau, " +
      "distinct payload unpaired; no cartesian") {
    val dir = java.nio.file.Files.createTempDirectory("graft_phash").toString
    val base = (1 to 120).map(i => s"px$i").mkString(" ")
    // a light edit: one stripe's content shifts, most cells untouched
    val edited = base.replace("px60", "qx60")
    val other = (1 to 120).map(i => s"zz${i * 7}").mkString(" ")
    spark.createDataFrame(Seq(
        (0L, base, "en", "s", base.length.toLong),
        (1L, base, "en", "s", base.length.toLong),
        (2L, edited, "en", "s", edited.length.toLong),
        (3L, other, "en", "s", other.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = run("mm_phash_dedup", dir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs((0L, 1L)) == 0L, s"exact copy must hash identically: $pairs")
    assert(pairs.contains(0L -> 2L) && pairs((0L, 2L)) <= 6L,
      s"light edit must pair within tau: $pairs")
    assert(!pairs.keySet.exists { case (i, j) => i == 3L || j == 3L },
      s"distinct payload must not pair: $pairs")
    val p = plan(run("mm_phash_dedup", dir))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "pairs must enumerate bucket-locally, never via join")
  }

  test("phash63 kernel ≡ the composed HOF derivation, including " +
      "multibyte and short payloads") {
    import org.apache.spark.sql.functions.{call_function, col}
    val dir = java.nio.file.Files.createTempDirectory("graft_ph63").toString
    val docs = Seq(
      (0L, (1 to 200).map(i => s"tok$i").mkString(" ")),
      (1L, "short"),                       // below 63 chars -> w = 1
      (2L, ""),                            // empty payload
      (3L, "héllo wörld ünïcode çontent " * 8), // multibyte code points
      (4L, (1 to 63).map(_ => "a").mkString(""))) // exactly 63 chars
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val base = Tables.documents(spark, dir)
    val fused = base
      .select(col("doc_id"), call_function("phash63", col("text")).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = graft.operators.MultimodalOps.phashHof(base)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == composed, s"kernel/HOF divergence: $fused vs $composed")
    // and on the real corpus
    val corp = Tables.documents(spark, sf)
    val f2 = corp.select(col("doc_id"),
        call_function("phash63", col("text")).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = graft.operators.MultimodalOps.phashHof(corp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f2 == c2, "kernel/HOF divergence on the sf corpus")
  }

  test("phashGeometryFor: oracle-pinned default region; bands widen with " +
      "log2(n) above it so bucket occupancy stays bounded") {
    import graft.operators.MultimodalOps.phashGeometryFor
    assert(phashGeometryFor(500) == ((7, 9)))
    assert(phashGeometryFor(16384) == ((7, 9)))
    // above the region the 9-bit key space itself forces ~n/512 docs
    // into every bucket (the measured sf10 OOM); width tracks log2(n)+2
    // up to a 21-bit third of the hash
    assert(phashGeometryFor(50000) == ((3, 18)))
    assert(phashGeometryFor(500000) == ((3, 21)))
    assert(phashGeometryFor(1000000000L) == ((3, 21)))
    // expected occupancy at the widest geometry stays sub-1 per bucket
    // for any corpus the 63-bit hash can meaningfully serve
    assert(500000.0 / (1L << 21) < 1.0)
  }

  test("mm_pair_filter: a planted aligned pair survives the percentile " +
      "gate, a planted mismatched pair drops") {
    import spark.implicits._
    import graft.operators.MultimodalOps
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    // background: 200 independent random pairs — isotropic cosines ~ 0
    val bg = (0 until 200).map { i =>
      (i.toLong, 1000L + i, unit(Array.fill(64)(rnd.nextGaussian())),
        unit(Array.fill(64)(rnd.nextGaussian())))
    }
    val av = unit(Array.fill(64)(rnd.nextGaussian()))
    val aligned = (900L, 1900L, av, av)                  // cos = 1
    val mismatch = (901L, 1901L, av, av.map(f => -f))    // cos = -1
    val pairs = (bg :+ aligned :+ mismatch)
      .toDF("pair_id", "txt_id", "a_emb", "b_emb")
    val got = MultimodalOps.pairFilterFor(pairs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Double]("cos"), r.getAs[Boolean]("kept"))).toMap
    assert(got(900L)._1 > 0.99 && got(900L)._2,
      s"aligned pair must score ~1 and survive: ${got(900L)}")
    assert(got(901L)._1 < -0.99 && !got(901L)._2,
      s"mismatched pair must score ~-1 and drop: ${got(901L)}")
    // the gate drops ~30% at bin granularity (boundary bucket is
    // all-or-nothing, so allow slack around the exact percentile)
    val dropped = got.values.count(!_._2)
    assert(dropped >= 202 * 20 / 100 && dropped <= 202 * 45 / 100,
      s"drop rate $dropped/202 far from the 30% dial")
    Caches.releaseScope()
  }
}
