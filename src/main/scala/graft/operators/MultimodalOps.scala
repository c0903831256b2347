package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Op, Tables}

/** Multimodal-column plumbing (SURVEY.md §2 part F): media payloads
  * travel as opaque `binary` columns with typed metadata beside them; all
  * relational machinery (partitioning, pruning, joins) applies unchanged.
  * The test corpus has no real media, so the documents' text bytes play
  * the blob — the binary-column plumbing (casts, byte-level functions,
  * batched decode) is real; only the codec is faked.
  */
object MultimodalOps {

  /** F1 — binary column + typed metadata extraction: magic-bytes sniffing
    * (first 4 bytes, hex), payload size, a derived content kind, and a
    * JSON metadata document — the standard "describe the blob without
    * decoding it" pass. Narrow projection, codegen'd, no shuffle.
    */
  val mmBinaryMeta: Op = Op(
    "mm_binary_meta",
    (s, d) => {
      val bin = col("text").cast("binary")
      val size = octet_length(col("text")).cast(LongType)
      val kind = when(size % 3 === 0, "image")
        .when(size % 3 === 1, "audio").otherwise("video")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          lower(hex(substring(bin, 1, 4))).as("magic4"),
          size.as("size_bytes"),
          kind.as("kind"),
          to_json(struct(
            lower(hex(substring(bin, 1, 4))).as("magic"),
            size.as("bytes"),
            kind.as("kind"))).as("meta_json"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             lower(hex(substr(text, 1, 4))) AS magic4,
             CAST(strlen(text) AS BIGINT) AS size_bytes,
             CASE WHEN strlen(text) % 3 = 0 THEN 'image'
                  WHEN strlen(text) % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             CAST(to_json(struct_pack(
               magic := lower(hex(substr(text, 1, 4))),
               bytes := CAST(strlen(text) AS BIGINT),
               kind := CASE WHEN strlen(text) % 3 = 0 THEN 'image'
                            WHEN strlen(text) % 3 = 1 THEN 'audio'
                            ELSE 'video' END)) AS VARCHAR) AS meta_json
      FROM documents
      ORDER BY doc_id"""))

  /** Input/output rows of the batched decode pipeline. */
  final case class BlobRow(doc_id: Long, data: Array[Byte])
  final case class FeatRow(
      doc_id: Long, n_bytes: Long, batch_size: Long, format: String,
      width: Long, height: Long, bit_depth: Long, color_type: Long,
      n_chunks: Long, crc_ok: Boolean, feat: Array[Float])

  private val DECODE_BATCH = 64

  /** Real PNG container decode: the full chunk walk over the public PNG
    * layout (8-byte signature; then length/type/data/CRC chunks; IHDR
    * first with width/height/bit-depth/color-type; IEND last), with
    * every chunk's CRC-32 validated over type+data. This is the honest
    * per-batch CPU a media pipeline pays before the pixel codec — pixel
    * decompression (zlib IDAT) is the part a production pipeline hands
    * to an image library.
    */
  object Png {
    final case class Meta(width: Long, height: Long, bitDepth: Long,
        colorType: Long, nChunks: Long, crcOk: Boolean)

    private val SIG =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(d: Array[Byte], o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)

    /** None = not a PNG (signature mismatch — fall back to the raw
      * path); Some(meta) with crcOk=false = a PNG whose structure or a
      * chunk CRC fails validation (a quarantine row downstream).
      */
    def decode(d: Array[Byte]): Option[Meta] = {
      if (d.length < 8 || (0 until 8).exists(i => d(i) != SIG(i))) None
      else {
        var off = 8L
        var w = 0L; var h = 0L; var depth = 0L; var ctype = 0L
        var n = 0L
        var ok = true
        var sawIhdr = false
        var sawIend = false
        while (!sawIend && ok) {
          if (off + 12 > d.length) ok = false
          else {
            val len = be32(d, off.toInt)
            if (off + 12 + len > d.length) ok = false
            else {
              val o = off.toInt
              val tpe = new String(d, o + 4, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
              val crc = new java.util.zip.CRC32()
              crc.update(d, o + 4, 4 + len.toInt)
              if (crc.getValue != be32(d, o + 8 + len.toInt)) ok = false
              n += 1
              if (n == 1) {
                if (tpe != "IHDR" || len != 13) ok = false
                else {
                  sawIhdr = true
                  w = be32(d, o + 8); h = be32(d, o + 12)
                  depth = d(o + 16) & 0xffL; ctype = d(o + 17) & 0xffL
                }
              }
              if (tpe == "IEND") sawIend = true
              off += 12 + len
            }
          }
        }
        Some(Meta(w, h, depth, ctype, n, ok && sawIhdr && sawIend))
      }
    }
  }

  /** Per-batch decode: PNG payloads get the REAL chunk walk ([[Png]]);
    * anything else (the text-bytes test corpus) takes the deterministic
    * raw fallback — 4 "features" from the first bytes, standing in for
    * the codec output. Typed schema in/out either way.
    */
  private[graft] def decodeBatch(batch: Seq[BlobRow]): Seq[FeatRow] =
    batch.map { b =>
      val f = (0 until 4).map { i =>
        if (b.data.length > i) (b.data(i) & 0xff) / 255.0f else 0.0f
      }.toArray
      Png.decode(b.data) match {
        case Some(m) => FeatRow(b.doc_id, b.data.length.toLong,
          batch.length.toLong, "png", m.width, m.height, m.bitDepth,
          m.colorType, m.nChunks, m.crcOk, f)
        case None => FeatRow(b.doc_id, b.data.length.toLong,
          batch.length.toLong, "raw", 0L, 0L, 0L, 0L, 0L, crc_ok = true, f)
      }
    }

  /** The batched mapPartitions pipeline over ANY blob frame — factored
    * so MultimodalSpec drives real PNG bytes through the exact operator
    * code path (the documents corpus is text-bytes, which exercises the
    * raw fallback).
    */
  private[graft] def decodePipeline(
      ds: org.apache.spark.sql.Dataset[BlobRow])
      : org.apache.spark.sql.Dataset[FeatRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(it =>
      it.grouped(DECODE_BATCH).flatMap(b => decodeBatch(b)))
  }

  /** F2 — batched decode/feature-extract over a binary column: the Spark
    * shape of a Pandas-UDF/`mapInPandas` media pipeline. Rows stream
    * through `mapPartitions` in fixed-size batches (the unit a codec or
    * accelerator would want), emitting a typed feature row per blob.
    * The container decode is REAL for PNG (r9: full chunk walk, IHDR
    * dimensions/depth/color-type, per-chunk CRC-32 validation — see
    * [[Png]]); non-PNG payloads fall back to deterministic stub
    * features, so the text-bytes test corpus still flows. No oracle
    * (not SQL-expressible) — the driver does a rows-only check and
    * MultimodalSpec asserts batching + decode on hand-built fixtures.
    *
    * At 100 TB: mapPartitions preserves the scan partitioning (no
    * shuffle); batch size bounds peak decoder memory per task; the
    * output is columnar-writable parquet for the downstream trainer.
    */
  val mmDecodeBatch: Op = Op(
    "mm_decode_batch",
    (s, d) => {
      import s.implicits._
      decodePipeline(
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("data"))
          .as[BlobRow])
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("batch_size"),
          col("format"), col("width"), col("height"), col("bit_depth"),
          col("color_type"), col("n_chunks"), col("crc_ok"),
          element_at(col("feat"), 1).as("f0"))
        .orderBy(col("doc_id"))
    },
    None)

  /** F3 — fixed-size chunking of a binary payload: the shard-for-
    * transport / frame-sample plumbing pass (256-byte windows, last
    * chunk ragged; empty payloads produce one empty chunk). Byte ranges
    * are sliced on the lowercase hex encoding — 2 hex chars per byte,
    * multibyte-safe, and expressible identically in any engine (DuckDB
    * lacks BLOB substring) — with an md5 per chunk for integrity
    * checking. One narrow explode: chunk count rides a prior projection
    * so the Generate never recomputes it per row; no shuffle except the
    * output ordering.
    */
  val mmChunk: Op = Op(
    "mm_chunk",
    (s, d) => {
      val CHUNK_HEX = 512 // 256 bytes
      Tables.documents(s, d)
        .select(col("doc_id"),
          lower(hex(col("text").cast("binary"))).as("hx"))
        .select(col("doc_id"), col("hx"),
          greatest(ceil(length(col("hx")) / lit(CHUNK_HEX.toDouble))
            .cast(LongType), lit(1L)).as("nc"))
        .select(col("doc_id"), col("hx"), col("nc"),
          explode(sequence(lit(0L), col("nc") - 1)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          (length(expr(s"substr(hx, chunk_idx * $CHUNK_HEX + 1, $CHUNK_HEX)")) / 2)
            .cast(LongType).as("chunk_bytes"),
          md5(expr(s"substr(hx, chunk_idx * $CHUNK_HEX + 1, $CHUNK_HEX)"))
            .as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""
      SELECT doc_id, chunk_idx,
             CAST(length(substr(hx, CAST(chunk_idx * 512 + 1 AS BIGINT), 512)) // 2
               AS BIGINT) AS chunk_bytes,
             md5(substr(hx, CAST(chunk_idx * 512 + 1 AS BIGINT), 512)) AS chunk_md5
      FROM (
        SELECT doc_id, hx,
               unnest(generate_series(0, greatest(
                 CAST(ceil(length(hx) / 512.0) AS BIGINT), 1) - 1)) AS chunk_idx
        FROM (SELECT doc_id, lower(hex(encode(text))) AS hx
              FROM documents) t1) t2
      ORDER BY doc_id, chunk_idx"""))

  /** F4 — strided frame sampling from blob metadata: every video-style
    * pipeline samples every Nth frame before decode. Duration derives
    * deterministically from the payload (the codec header is faked like
    * F1/F2's decode — the plumbing is the real part): duration_ms →
    * frame count at FPS → a strided `sequence` explode yields the
    * sampled frame indices, each stamped with its timestamp and a
    * deterministic frame fingerprint (a real pipeline would hand
    * (doc_id, frame_idx) spans to the decoder batch of F2).
    *
    * One narrow Generate per doc (n_frames/stride rows), no shuffle
    * except output ordering; the frame count rides a prior projection so
    * the Generate never recomputes it per emitted row.
    */
  val mmFrameSample: Op = Op(
    "mm_frame_sample",
    (s, d) => {
      val FPS = 24L
      val STRIDE = 10L
      Tables.documents(s, d)
        .select(col("doc_id"),
          (octet_length(col("text")).cast(LongType) % 10000L + 1000L)
            .as("duration_ms"))
        .select(col("doc_id"),
          expr(s"duration_ms * $FPS div 1000").as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(STRIDE)))
            .as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          expr(s"frame_idx * 1000 div $FPS").as("frame_ts_ms"),
          md5(concat_ws(":", col("doc_id"), col("frame_idx"))).as("frame_fp"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""
      SELECT doc_id, frame_idx,
             frame_idx * 1000 // 24 AS frame_ts_ms,
             md5(concat_ws(':', doc_id, frame_idx)) AS frame_fp
      FROM (
        SELECT doc_id,
               unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx
        FROM (
          SELECT doc_id,
                 (CAST(strlen(text) AS BIGINT) % 10000 + 1000) * 24 // 1000
                   AS n_frames
          FROM documents) t1) t2
      ORDER BY doc_id, frame_idx"""))

  /** Shard capacity for [[mmShardManifest]] (64 KiB at test scale; a
    * production webdataset shard is ~100 MB–1 GB — same math).
    */
  private[graft] val SHARD_BYTES = 65536L
  /** Docs per prefix-sum block — the intra-block window bound. */
  private[graft] val SHARD_BLOCK = 100L

  /** F5 — shard manifest: pack each source's blobs, in doc_id order,
    * into fixed-capacity output shards (the webdataset/tar-shard layout
    * step before training) — every blob gets (shard_idx, offset) from
    * the running byte total, start-offset assignment (a blob belongs to
    * the shard its first byte lands in).
    *
    * The running total is a TWO-LEVEL DISTRIBUTED PREFIX SUM, not a
    * per-source window over the corpus (that would sort a whole source's
    * blobs on one task — the constant-cardinality skew trap, like q22's
    * 5-value window): (1) one aggregate of byte sums per
    * (source, doc_id-block of [[SHARD_BLOCK]]); (2) the per-source
    * running total over BLOCK SUMS — a window over corpus/SHARD_BLOCK
    * rows per source, broadcast back; (3) the intra-block running total
    * — a window bounded by SHARD_BLOCK rows regardless of corpus size.
    * Every offset is the exact same integer the sequential scan would
    * produce; no task ever sorts more than a block or a source's block
    * list.
    */
  val mmShardManifest: Op = Op(
    "mm_shard_manifest",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          octet_length(col("text")).cast(LongType).as("sz"),
          expr(s"doc_id div $SHARD_BLOCK").as("blk"))
      val blockSums = docs.groupBy(col("source"), col("blk"))
        .agg(sum(col("sz")).as("bsum"))
      val wBlocks = Window.partitionBy(col("source")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val blockBases = blockSums
        .select(col("source"), col("blk"),
          (sum(col("bsum")).over(wBlocks) - col("bsum")).as("block_base"))
      val wIntra = Window.partitionBy(col("source"), col("blk"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(blockBases), Seq("source", "blk"))
        .withColumn("start",
          col("block_base") + sum(col("sz")).over(wIntra) - col("sz"))
        .select(col("source"), col("doc_id"), col("sz").as("size_bytes"),
          expr(s"start div $SHARD_BYTES").as("shard_idx"),
          (col("start") % SHARD_BYTES).as("offset_in_shard"))
        .orderBy(col("source"), col("doc_id"))
    },
    Some(s"""
      SELECT source, doc_id, sz AS size_bytes,
             (cum - sz) // $SHARD_BYTES AS shard_idx,
             (cum - sz) % $SHARD_BYTES AS offset_in_shard
      FROM (
        SELECT source, doc_id, CAST(strlen(text) AS BIGINT) AS sz,
               CAST(sum(strlen(text)) OVER (PARTITION BY source
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM documents) t
      ORDER BY source, doc_id"""))

  /** Perceptual-hash geometry (F6): a 63-cell average hash (the
    * 64-cell public aHash minus one cell — bit 63 is unusable as a
    * portable word bit, the D12 lesson: DuckDB's `<<` range-errors
    * where the JVM wraps), banded for candidate generation, Hamming ≤ 6
    * as the near-dup verdict.
    */
  private val PH_CELLS = 63
  private val PH_BANDS = 7
  private val PH_BAND_BITS = 9
  private val PH_TAU = 6

  /** D3's bucket-cap twin: a (band, key) bucket holding more than this
    * many documents contributes NO pairs (monotone saturation — a
    * pathological hot bucket degrades recall, never cost).
    */
  private val PH_MAX_BUCKET = 200

  /** Band geometry for a corpus of n documents: (bands, bits-per-band).
    * The default region (n ≤ 4096, the standing gate margin) keeps the
    * oracle-pinned 7 × 9-bit multi-index — Hamming ≤ 6 pairs are
    * GUARANTEED a shared untouched band by pigeonhole. Above it the
    * bands must widen or occupancy explodes by pigeonhole on the KEY
    * SPACE itself (measured: at 500k docs, 9-bit keys put ~1000 docs
    * in every bucket — n/512 regardless of data — and the in-bucket
    * quadratic OOMed the first sf10 bench): width grows with log2(n)+2
    * up to the 21-bit third of the hash, so expected occupancy stays
    * ≤ ~n/2^21 ≈ 0.25 at 500k. The price is the standard LSH-banding
    * tradeoff — at 3 bands only ≤ 2 flipped bits keep the pigeonhole
    * guarantee, deeper edits surface probabilistically — and the cap
    * bounds whatever skew remains.
    */
  private[graft] def phashGeometryFor(n: Long): (Int, Int) =
    if (n <= 16384) (PH_BANDS, PH_BAND_BITS)
    else {
      val w = math.min(21,
        2 + math.ceil(math.log(math.max(n, 2).toDouble) /
          math.log(2.0)).toInt)
      (63 / w, w)
    }

  /** F6's body at an explicit band geometry — the GeometryCheck seam
    * (the D5/D11 pattern: above the default region the engine buckets
    * wider than the static oracle, and the matching-geometry oracle
    * regenerates via [[sqlPhashAt]]).
    */
  /** The composed HOF derivation of the 63-cell hash — kept as the
    * independent twin MultimodalSpec pins the `phash63` kernel against
    * (the lsh_buckets/pq_encode parity precedent).
    */
  private[graft] def phashHof(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("text"),
      greatest(expr(s"char_length(text) div $PH_CELLS"), lit(1))
        .as("w"))
    .select(col("doc_id"),
      expr(s"""transform(sequence(0, ${PH_CELLS - 1}), i ->
        aggregate(sequence(i * w + 1, i * w + w), cast(0 as bigint),
          (acc, p) -> acc + ascii(substring(text, p, 1))))""")
        .as("cells"))
    .select(col("doc_id"), col("cells"),
      expr(s"aggregate(cells, cast(0 as bigint), (a, x) -> a + x)" +
        s" div $PH_CELLS").as("mean"))
    .select(col("doc_id"),
      expr(s"""aggregate(sequence(0, ${PH_CELLS - 1}),
        cast(0 as bigint), (acc, i) ->
          acc + if(element_at(cells, i + 1) > mean,
            shiftleft(cast(1 as bigint), i), cast(0 as bigint)))""")
        .as("phash"))

  private[graft] def phashPairsAt(
      s: SparkSession, d: String, bands: Int, width: Int): DataFrame = {
      // one kernel call per document (the HOF spelling ran interpreted
      // — 63 sub-aggregates per row — and dominated the sf10 hash
      // materialization at 26 s cold)
      val hashed = graft.Caches.persist(Tables.documents(s, d)
        .transform(graft.Tables.spreadBy(col("doc_id")))
        .select(col("doc_id"),
          call_function("phash63", col("text")).as("phash")))
      val banded = hashed
        .select(col("doc_id"), col("phash"),
          explode(expr(s"""transform(sequence(0, ${bands - 1}), b ->
            named_struct('band', b, 'key',
              shiftright(phash, b * $width)
                & ${(1L << width) - 1}))""")).as("bk"))
        .select(col("doc_id"), col("phash"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      // spread on the band bucket (r20, guide §2.5): the bucket stage
      // downstream runs the O(bucket²) pair explosion, but its shuffle
      // is ~1 MB, so AQE coalesced it to ONE task (~0.37 s straggler,
      // measured). The conf-derived pinned width keeps it on all cores.
      graft.Tables.spread(banded, col("band"), col("key"))
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(
          struct(col("doc_id"), col("phash")))).as("ds"))
        .filter(size(col("ds")) >= 2 &&
          size(col("ds")) <= PH_MAX_BUCKET)
        // r20: pairs stream through the codegen'd generator pair
        // ([[graft.functions.Portable.pairRows]]) — the nested
        // transform paid interpreted lambda dispatch per pair
        .transform(df => graft.functions.Portable.pairRows(df, "ds"))
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
          bit_count(col("x.phash").bitwiseXOR(col("y.phash")))
            .cast(LongType).as("hamming"))
        .filter(col("hamming") <= PH_TAU)
        .groupBy(col("i"), col("j"))
        .agg(min(col("hamming")).as("hamming"))
        .orderBy(col("i"), col("j"))
  }

  /** DuckDB twin of [[phashPairsAt]] at an explicit geometry. */
  private[graft] def sqlPhashAt(bands: Int, width: Int): String = s"""
      WITH ph AS (
        SELECT doc_id, text,
               greatest(length(text) // $PH_CELLS, 1) AS w
        FROM documents),
      cells AS (
        SELECT doc_id,
               list_transform(generate_series(0, ${PH_CELLS - 1}), i ->
                 CAST(list_sum(list_transform(
                   generate_series(i*w+1, i*w+w), p ->
                     ascii(substr(text, p, 1)))) AS BIGINT)) AS cells
        FROM ph),
      hm AS (SELECT doc_id, cells,
                    CAST(list_sum(cells) AS BIGINT) // $PH_CELLS AS mean
             FROM cells),
      hv AS (SELECT doc_id,
               CAST(list_sum(list_transform(
                 generate_series(0, ${PH_CELLS - 1}), i ->
                   CASE WHEN cells[i+1] > mean
                        THEN (1::BIGINT << CAST(i AS INT))
                        ELSE 0 END)) AS BIGINT) AS phash
             FROM hm),
      bk AS (SELECT doc_id, phash, b,
                    (phash >> CAST(b * $width AS INT))
                      & ${(1L << width) - 1} AS key
             FROM hv, generate_series(0, ${bands - 1}) t(b)),
      occ AS (SELECT b, key, count(*) AS n FROM bk GROUP BY 1, 2),
      pr AS (SELECT a.doc_id AS i, b2.doc_id AS j,
                    CAST(bit_count(xor(a.phash, b2.phash)) AS BIGINT)
                      AS hamming
             FROM bk a
             JOIN bk b2
               ON a.b = b2.b AND a.key = b2.key AND a.doc_id < b2.doc_id
             JOIN occ ON occ.b = a.b AND occ.key = a.key
             WHERE occ.n <= $PH_MAX_BUCKET)
      SELECT i, j, CAST(min(hamming) AS BIGINT) AS hamming
      FROM pr WHERE hamming <= $PH_TAU
      GROUP BY i, j
      ORDER BY i, j"""

  /** F6 — perceptual-hash near-duplicate detection over the media
    * column: the image-dedup stage of a multimodal pipeline (aHash/
    * pHash-family fingerprints + Hamming banding — the public
    * average-hash recipe). The "downscale" is deterministic content
    * striping: the payload splits into [[PH_CELLS]] equal character
    * stripes whose code-point sums play the 8×8 luma grid (the fake
    * codec, exactly the F-series pattern — a real deployment swaps in
    * the pixel decoder and keeps EVERYTHING downstream); bit i = stripe
    * i above the payload mean, so near-identical payloads differ in few
    * bits, which is the property the banding exploits. Candidates
    * come from 9-bit band buckets (Hamming ≤ 6 pairs share a band
    * w.p. ≥ 1 − C(7,6)·…  ≈ 1 for ≤ 6 flipped bits spread over 7
    * bands — at least one band is untouched by pigeonhole), pairs
    * enumerate bucket-locally with the hash riding in the bucket rows
    * (the D4/D5 shape — no self-join), and the exact Hamming distance
    * verifies via bit_count(xor). At 100 TB: one corpus-linear hash
    * pass, one groupBy-band shuffle of id+hash rows, in-task pair
    * work bounded by band-bucket occupancy.
    */
  val mmPhashDedup: Op = Op(
    "mm_phash_dedup",
    (s, d) => {
      val (bands, width) = phashGeometryFor(Tables.documents(s, d).count())
      AnnOps.logGeometryDivergence("mm_phash_dedup",
        s"$bands x $width-bit bands", s"$PH_BANDS x $PH_BAND_BITS-bit bands")
      phashPairsAt(s, d, bands, width)
    },
    Some(sqlPhashAt(PH_BANDS, PH_BAND_BITS)))

  /** F7's dials. PAIR_SHIFT pairs corpus vector v (the "image"
    * embedding) with vector (v + 7) mod n (the "text" embedding) — the
    * F-series fake-payload doctrine applied to pairing: a real
    * image/text corpus ships its pairs; the gate corpus derives them
    * deterministically, and everything downstream (scoring, histogram,
    * threshold, verdict) is the real pipeline. PAIR_BIN buckets
    * cosine-micros into ≤ ~2000 histogram bins (the C20 ≤ 4096-bucket
    * discipline); PAIR_DROP_PCT drops the bottom 30% of pairs by
    * cosine — the public LAION recipe's percentile gate (LAION filters
    * CLIP image-text cosine at a fixed quantile of the distribution).
    */
  private val PAIR_SHIFT = 7L
  private val PAIR_BIN = 1024L
  private val PAIR_DROP_PCT = 30L

  /** F7's body over any (pair_id, txt_id, a_emb, b_emb) frame — the
    * seam the planted-pair spec drives. Exact-micros cosine per pair,
    * then the C20 boundary-bucket percentile: histogram over
    * cosine-micro bins (≤ ~2000 rows), one running sum over the
    * broadcast-sized histogram, threshold = the bin where cumulative
    * mass crosses [[PAIR_DROP_PCT]]%, verdict per pair by bin
    * comparison. NO corpus sort anywhere: the only corpus-sized work
    * is the map-side scoring pass and the bin aggregate. The
    * threshold bucket is all-or-nothing (bin granularity ≈ 0.001
    * cosine), the same deliberate coarseness as C20/G11.
    */
  private[graft] def pairFilterFor(pairs: DataFrame): DataFrame = {
    import graft.functions.Portable.{cosineFromMicros, dotMicros}
    import graft.Caches
    val scored = Caches.persist(pairs
      .select(col("pair_id"), col("txt_id"),
        cosineFromMicros(dotMicros(col("a_emb"), col("b_emb")),
          dotMicros(col("a_emb"), col("a_emb")),
          dotMicros(col("b_emb"), col("b_emb"))).as("cos"))
      // FLOOR-division binning (r16, the r15 advisory): truncating div
      // gave bin 0 a double width straddling cosine 0 — exactly where
      // isotropic pairs concentrate — coarsening the percentile cut;
      // the pmod floor form is the same convention sample_dsir/
      // sample_rho's histogram gates use, uniform width on both signs
      .withColumn("bin", expr(
        s"""(CAST(floor(cos * 1000000) AS BIGINT)
            - pmod(CAST(floor(cos * 1000000) AS BIGINT), $PAIR_BIN))
           div $PAIR_BIN""")))
    val hist = scored.groupBy(col("bin")).agg(count(lit(1)).as("mass"))
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cumh = hist.withColumn("cum", sum(col("mass")).over(wb))
    val tot = hist.agg(sum(col("mass")).as("total"))
    val th = cumh.crossJoin(broadcast(tot))
      .agg(min(when(col("cum") * 100 >= col("total") * PAIR_DROP_PCT,
        col("bin"))).as("t"))
    scored.crossJoin(broadcast(th))
      .select(col("pair_id"), col("txt_id"), col("cos"), col("bin"),
        (col("bin") > col("t")).as("kept"))
      .orderBy(col("pair_id"))
  }

  /** F7 — CROSS-MODAL pair curation (r15): the LAION-style gate every
    * public image-text corpus went through — score each (image
    * embedding, text embedding) pair's cosine and keep only pairs
    * above a distribution-derived percentile threshold. Composes the
    * engine's existing pieces: exact-micros cosine kernels (the E/D
    * similarity currency) and the C20 boundary-bucket histogram
    * threshold (no corpus sort — the percentile resolves from a ≤
    * ~2000-bin broadcast histogram). At 100 TB: pairing is an id-width
    * hash join, scoring is one map-side pass, and the gate is a
    * broadcast threshold — scan-speed end to end.
    */
  val mmPairFilter: Op = Op(
    "mm_pair_filter",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val n = e.count()
      val a = e.select(col("vec_id").as("pair_id"),
        col("embedding").as("a_emb"))
      val b = e.select(col("vec_id").as("txt_id"),
        col("embedding").as("b_emb"))
      pairFilterFor(a
        .withColumn("txt_id", (col("pair_id") + PAIR_SHIFT) % n)
        .join(b, "txt_id")
        .select(col("pair_id"), col("txt_id"), col("a_emb"), col("b_emb")))
    },
    Some {
      val q = (side: String, ix: String) =>
        s"CAST(floor(CAST($side[$ix] AS DOUBLE)*1000000+0.5) AS BIGINT)"
      s"""
      WITH nn AS (SELECT count(*) AS n FROM embeddings),
      p AS (
        SELECT a.vec_id AS pair_id, b.vec_id AS txt_id,
               a.embedding AS ae, b.embedding AS be
        FROM embeddings a
        CROSS JOIN nn
        JOIN embeddings b ON b.vec_id = (a.vec_id + $PAIR_SHIFT) % nn.n),
      sc AS (
        SELECT pair_id, txt_id,
               CAST(list_sum(list_transform(generate_series(1,64), ix ->
                 ${q("ae", "ix")} * ${q("be", "ix")})) AS DOUBLE) /
               (sqrt(CAST(list_sum(list_transform(generate_series(1,64), ix ->
                 ${q("ae", "ix")} * ${q("ae", "ix")})) AS BIGINT)) *
                sqrt(CAST(list_sum(list_transform(generate_series(1,64), ix ->
                 ${q("be", "ix")} * ${q("be", "ix")})) AS BIGINT))) AS cos
        FROM p),
      sb AS (SELECT pair_id, txt_id, cos,
                    (CAST(floor(cos * 1000000) AS BIGINT)
                     - ((CAST(floor(cos * 1000000) AS BIGINT) % $PAIR_BIN
                         + $PAIR_BIN) % $PAIR_BIN)) // $PAIR_BIN AS bin
             FROM sc),
      hist AS (SELECT bin, CAST(count(*) AS BIGINT) AS mass
               FROM sb GROUP BY bin),
      cumh AS (SELECT bin,
                      CAST(sum(mass) OVER (ORDER BY bin) AS BIGINT) AS cum
               FROM hist),
      tot AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM hist),
      th AS (SELECT min(CASE WHEN cum * 100 >= total * $PAIR_DROP_PCT
                             THEN bin END) AS t
             FROM cumh, tot)
      SELECT s.pair_id, s.txt_id, s.cos, s.bin, s.bin > th.t AS kept
      FROM sb s, th
      ORDER BY s.pair_id"""
    })

  val all: Seq[Op] =
    Seq(mmBinaryMeta, mmDecodeBatch, mmChunk, mmFrameSample,
      mmShardManifest, mmPhashDedup, mmPairFilter)
}
