package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Byte-level BPE mode (C12b): 256 base symbols, no OOV — encode
  * parity on planted never-seen words/scripts, total byte coverage,
  * and the expression/oracle contract.
  */
class BpeSpecBytes extends SparkSpec {

  private def utf8(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq

  private def hexDecode(sym: String): Seq[Byte] =
    sym.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toSeq

  test("encodeBytes: total coverage — symbol bytes always reconstruct " +
      "the word (no OOV by construction)") {
    // planted never-seen words and scripts: Latin garbage, Greek, CJK,
    // supplementary-plane letters
    val planted = Seq("xqzzqx", "αβγδ", "中文文本", "ᄀᄁᄂ", "𝒜𝒷𝒸",
      "the", "spark", "nEVerSEENword")
    planted.foreach { w =>
      val lw = {
        // the engine fold lowercases per code point before encoding
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          sb.appendCodePoint(Character.toLowerCase(cp))
          i += Character.charCount(cp)
        }
        sb.toString
      }
      val pieces = Bpe.encodeBytes(lw)
      assert(pieces.flatMap(hexDecode) === utf8(lw),
        s"'$w': concatenated symbol bytes must equal the word's UTF-8")
      assert(pieces.nonEmpty === lw.nonEmpty)
    }
  }

  test("encodeBytes parity with code-point encode on pure-ASCII words " +
      "(the byte merge table is the 1:1 hex re-coding)") {
    // for ASCII words the two alphabets are isomorphic, so the merge
    // loops take identical steps and the piece COUNT matches exactly
    Seq("the", "table", "value", "window", "scan", "spark", "data",
      "stream", "xyzzy", "aaaa", "ananan", "thethethe").foreach { w =>
      assert(Bpe.encodeBytes(w).length === Bpe.encode(w).length,
        s"'$w': byte-level and code-point piece counts must agree on ASCII")
    }
  }

  test("tokenCountBytes prices never-seen scripts by UTF-8 bytes, not " +
      "one-per-code-point") {
    // CJK letters: 3 bytes each, no fixture merges on those bytes
    assert(Bpe.tokenCountBytes("中文") === 6L)
    assert(Bpe.tokenCount("中文") === 2L)
    // Greek: 2 bytes per letter
    assert(Bpe.tokenCountBytes("αβγ") === 6L)
    // residuals price per byte too: emoji (4 bytes), comma (1 byte)
    assert(Bpe.tokenCountBytes("🙂") === 4L)
    assert(Bpe.tokenCountBytes("a,b") === 3L)
    // merge-covered ASCII is unchanged vs code-point mode
    assert(Bpe.tokenCountBytes("the table value") === 3L)
    assert(Bpe.tokenCountBytes("") === 0L)
    assert(Bpe.tokenCountBytes("  \t\n ") === 0L)
  }

  test("bpe_count_bytes expression matches the Scala loop through a " +
      "Spark plan") {
    import spark.implicits._
    val texts = Seq("the table value", "中文 and ascii", "αβγ!", "", "🙂 ok")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.functions.Portable.bpeCountBytes(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = texts.zipWithIndex
      .map { case (t, i) => i.toLong -> Bpe.tokenCountBytes(t) }.toMap
    assert(got === want)
  }

  test("the board op reports both prices and the measurable bias ratio") {
    val rows = run("text_bpe_count_bytes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nB = r.getAs[Long]("n_bpe_bytes")
      val nCp = r.getAs[Long]("n_bpe_cp")
      val nBytes = r.getAs[Long]("n_utf8_bytes")
      // byte pricing can never undercount a doc's non-ws bytes' floor:
      // every byte belongs to at most one symbol
      assert(nB <= nBytes,
        s"doc ${r.getLong(0)}: byte tokens $nB cannot exceed bytes $nBytes")
      // and can never be cheaper than the code-point count on any doc
      // (a merged byte symbol never spans two code points' letters in
      // the fixture table, which is ASCII-only)
      assert(nB >= nCp,
        s"doc ${r.getLong(0)}: byte tokens $nB < code-point tokens $nCp")
    }
  }
}
