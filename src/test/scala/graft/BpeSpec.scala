package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Semantics of the merge-table BPE tokenizer (C12/G9b): the Scala merge
  * loop, the kernel expression, and the manifest parity between the
  * whitespace and BPE packers.
  */
class BpeSpec extends SparkSpec {

  test("encode: chained merges reach whole common words") {
    assert(Bpe.encode("the") === Vector("the"))
    assert(Bpe.encode("table") === Vector("table"))
    assert(Bpe.encode("value") === Vector("value"))
    assert(Bpe.encode("window") === Vector("window"))
    assert(Bpe.encode("scan") === Vector("scan"))
    // partial tokenizations stay partial (no merge path to the full word)
    // (p,ar) ranks below (s,p), so par forms before sp can
    assert(Bpe.encode("spark") === Vector("s", "par", "k"))
    assert(Bpe.encode("data") === Vector("d", "at", "a"))
    assert(Bpe.encode("stream") === Vector("st", "re", "a", "m"))
    // unknown letters stay single chars
    assert(Bpe.encode("xyzzy").length === 5)
  }

  test("encode: leftmost-lowest-rank order is what the loop applies") {
    // "thethethe": (t,h) rank 0 fires at each position before (th,e);
    // final = three 'the' symbols regardless of interleaving
    assert(Bpe.encode("thethethe") === Vector("the", "the", "the"))
    // repeated pair: leftmost-first gives ceil-halving, not chain-greedy
    assert(Bpe.encode("aaaa").length === 4) // (a,a) not a merge
    assert(Bpe.encode("ananan") === Vector("an", "an", "an"))
  }

  test("tokenCount: words + residual chars, whitespace free") {
    assert(Bpe.tokenCount("the table") === 2L)
    assert(Bpe.tokenCount("") === 0L)
    assert(Bpe.tokenCount("  \t\n ") === 0L)
    // punctuation and digits count one token per char
    assert(Bpe.tokenCount("the, table!") === 4L)
    assert(Bpe.tokenCount("a1b2") === 4L) // a,1,b,2
  }

  test("bpe_count expression matches the Scala loop through a Spark plan") {
    import spark.implicits._
    val docs = Seq("the table value", "spark scan data", "", "a, b! c?")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.functions.Portable.bpeCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Seq("the table value", "spark scan data", "", "a, b! c?")
      .zipWithIndex.map { case (t, i) => i.toLong -> Bpe.tokenCount(t) }
      .toMap
    assert(got === want)
  }

  test("tokenCount: unicode words, code-point residuals, simple lowercase") {
    // lowercasing is the expression's own per-code-point simple mapping
    assert(Bpe.tokenCount("The TABLE") === Bpe.tokenCount("the table"))
    // non-ASCII letters join words (é is a letter, no merge covers it)
    assert(Bpe.tokenCount("café") === 4L) // c,a,f,é — (c,a) not a merge
    assert(Bpe.tokenCount("déjà vu") === Bpe.tokenCount("DÉJÀ VU"))
    // a supplementary-plane char is ONE residual token, not two halves
    assert(Bpe.tokenCount("a🙂b") === 3L) // a 🙂 b
    // U+0130 İ: simple mapping → i (the full JVM string mapping would
    // expand to i + combining dot and count an extra residual)
    assert(Bpe.tokenCount("İstanbul") === Bpe.tokenCount("istanbul"))
    // CJK: letters, one symbol per code point, no merges apply
    assert(Bpe.tokenCount("日本語") === 3L)
    // NBSP is NOT tokenization whitespace — one residual token
    assert(Bpe.tokenCount("a b") === 3L)
  }

  test("cross-engine unicode table parity: boundary code points match DuckDB") {
    // Ground truth computed by running the text_bpe_count ORACLE SQL in
    // DuckDB 1.0.0 over these exact strings (tools/unicode_parity.py
    // re-derives it — run it after a JRE or DuckDB upgrade). This pins
    // the JVM's Character tables to utf8proc/RE2 where bpe_count is
    // sensitive: the simple-vs-full lowercase mapping (U+0130 İ: a full
    // mapping would add a combining dot and count one extra token),
    // titlecase digraphs, cross-block case maps, supplementary-plane
    // letters (Deseret/Osage/Medefaidrin), recently-cased scripts
    // (Georgian Mtavruli, Cherokee), Lm modifiers, and the classes both
    // engines must agree are residual (Nl roman numerals, Mn combining
    // marks). U+A7C0 (Unicode 14) is the deliberate drift probe: JRE 17
    // (Unicode 13) says non-letter, DuckDB 1.0's RE2 says letter — and
    // the COUNT still agrees because an unmergeable code point prices 1
    // either way; a future table change that breaks count parity fails
    // the gate, which is the property that matters.
    // explicit escapes: source-file encoding or NFC normalization must
    // never silently change what is being pinned
    val pinned = Seq(
      "\u0130stanbul ICE" -> 9L,                             // Istanbul w/ dotted capital I
      "\u1E9E\u00DF \u01C5\u01C4\u01C6" -> 5L,           // sharp s, Dz digraph family
      "\uA7BA\uA7BB" -> 2L,                                 // Latin glottal A (Unicode 12)
      "\uD801\uDC00\uD801\uDC28 \uD801\uDCB0\uD801\uDCD8" -> 4L, // Deseret + Osage
      "\u1C90\u10D0 \u1C91\u10D1" -> 4L,                  // Georgian Mtavruli + Mkhedruli
      "\u13A0\uAB70" -> 2L,                                 // Cherokee upper + lower
      "\u02B0\u02B7 x" -> 3L,                               // Lm modifier letters
      "\u2160 \u2163" -> 2L,                                // Nl roman numerals (residual)
      "a\u0300e\u0301" -> 4L,                               // decomposed combining marks
      "\uD81B\uDE40\uD81B\uDE60" -> 2L,                   // Medefaidrin (Unicode 11)
      "\uA7C0\uA7C1" -> 2L,                                 // drift probe (Unicode 14)
      "\u0390 \u0345" -> 2L,                                // Greek + ypogegrammeni (Mn)
      "\u023A\u2C65\u023E" -> 3L,                          // cross-block case mapping
      "\uFB00 \uFB01" -> 2L,                                // Latin ligatures (Ll, no map)
      "\u03A3\u039F\u03A3 \u03C3\u03BF\u03C2" -> 6L)    // final-sigma: simple lower
    pinned.foreach { case (text, want) =>
      assert(Bpe.tokenCount(text) == want,
        s"'$text': engine ${Bpe.tokenCount(text)} != DuckDB-pinned $want")
    }
  }

  test("pieces: unicode pieces re-concatenate to lowered non-ws text") {
    Seq("Café Déjà", "a🙂b!", "日本語 x",
      "MiXed CASE text").foreach { t =>
      val p = Bpe.pieces(t)
      assert(p.length.toLong === Bpe.tokenCount(t))
      val expected = t.codePoints().toArray
        .filterNot(cp => cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r')
        .map(Character.toLowerCase)
        .flatMap(Character.toChars).mkString
      assert(p.mkString === expected, s"pieces mismatch on '$t'")
    }
  }

  test("pieces: sequence joins back to the letters, length == tokenCount") {
    Seq("the table value", "spark scan data", "a, b! c?", "thethethe x")
      .foreach { t =>
        val p = Bpe.pieces(t)
        assert(p.length.toLong === Bpe.tokenCount(t),
          s"pieces/count disagree on '$t'")
        assert(p.mkString === t.filterNot(" \t\n\r".contains(_)),
          s"pieces must re-concatenate to the non-ws text of '$t'")
      }
  }

  test("text_bpe_vocab: counts are consistent with per-doc totals") {
    val sf = "/root/testdata/sf0.001"
    val vocab = TextOps.textBpeVocab.fn(spark, sf).collect()
    val totalUses = vocab.map(_.getAs[Long]("n_uses")).sum
    val perDoc = TextOps.textBpeCount.fn(spark, sf).collect()
      .map(_.getAs[Long]("n_bpe")).sum
    assert(totalUses === perDoc,
      "vocabulary uses must sum to the corpus token budget")
    val fracs = vocab.map(_.getAs[Double]("uses_frac")).sum
    assert(math.abs(fracs - 1.0) < 1e-9)
  }

  private object TextOps {
    val textBpeVocab = graft.operators.TextOps.all
      .find(_.key == "text_bpe_vocab").get
    val textBpeCount = graft.operators.TextOps.all
      .find(_.key == "text_bpe_count").get
    val textBpeTrain = graft.operators.TextOps.all
      .find(_.key == "text_bpe_train").get
    val textBpeCountLearned = graft.operators.TextOps.all
      .find(_.key == "text_bpe_count_learned").get
  }

  test("text_bpe_train: greedy merge table invariants on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val m = TextOps.textBpeTrain.fn(spark, sf).collect()
    assert(m.length === 32, "a rich corpus must yield all K merges")
    assert(m.map(_.getAs[Long]("rank")).toSeq === (0L until 32L),
      "ranks must be dense 0..K-1")
    assert(m.forall(_.getAs[Long]("cnt") > 0))
    val pairs = m.map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    assert(pairs.distinct.length === pairs.length, "no pair merges twice")
    // rank 0 IS the global argmax pair of the raw symbol stream
    assert(m.head.getAs[Long]("cnt") === m.map(_.getAs[Long]("cnt")).max)
    // every learned symbol is built from earlier symbols or single chars
    val known = scala.collection.mutable.Set[String]()
    pairs.foreach { case (a, b) =>
      assert(a.length == 1 || known.contains(a), s"orphan left symbol $a")
      assert(b.length == 1 || known.contains(b), s"orphan right symbol $b")
      known += a + b
    }
  }

  test("text_bpe_train: runs dry gracefully on a tiny vocab") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpetiny").toString
    Seq((0L, "ab ab ab", "en", "s0", 8L), (1L, "ab", "en", "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextOps.textBpeTrain.fn(spark, dir).collect()
    assert(m.length === 1, s"one merge then dry, got ${m.length}")
    assert(m.head.getAs[String]("a") === "a" &&
      m.head.getAs[String]("b") === "b" && m.head.getAs[Long]("cnt") === 4L)
    // the learned counter then prices every doc at 1 token per 'ab'
    val n = TextOps.textBpeCountLearned.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_learned"))
      .toMap
    assert(n === Map(0L -> 3L, 1L -> 1L))
  }

  test("text_bpe_count_learned: compression accounting vs the char baseline") {
    val sf = "/root/testdata/sf0.001"
    val learned = TextOps.textBpeCountLearned.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_learned"))
      .toMap
    val m = TextOps.textBpeTrain.fn(spark, sf).collect()
    // char baseline: one token per letter/residual code point (0 merges)
    val baseline = Tables.documents(spark, sf).collect().map { r =>
      val t = r.getAs[String]("text")
      Bpe.words(t).map(w => w.codePointCount(0, w.length)).sum.toLong +
        Bpe.residualCount(t)
    }.sum
    val mergedAway = m.map(_.getAs[Long]("cnt")).sum
    val total = learned.values.sum
    // each merge round removes AT MOST cnt tokens (overlapping pair
    // occurrences collapse to fewer replacements), and at least one
    assert(total < baseline, "learned merges must compress the corpus")
    assert(total >= baseline - mergedAway,
      s"$total tokens vs baseline $baseline minus $mergedAway merged")
    // empty docs price at zero in the learned currency too
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    learned.foreach { case (id, n) =>
      if (docs(id).isEmpty) assert(n === 0L)
    }
  }

  test("doc_pack_bpe: manifest arithmetic consistent with its own counts") {
    val sf = "/root/testdata/sf0.001"
    val rows = PipelineOps.docPackBpe.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // offsets are the exact running concat: reconstruct and compare
    var cum = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val nt = r.getLong(1) + 1 // +EOS
      val seqIdx = r.getLong(2)
      val off = r.getLong(3)
      assert(seqIdx === cum / 512 && off === cum % 512,
        s"doc ${r.getLong(0)}: manifest offset mismatch")
      cum += nt
    }
    // BPE budgets differ from whitespace budgets on real text
    val ws = PipelineOps.docPack.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diff = rows.count(r => ws(r.getLong(0)) != r.getLong(1))
    assert(diff > 0, "BPE token counts should differ from whitespace counts")
  }

  private object PipelineOps {
    val docPackBpe = graft.operators.PipelineOps.all
      .find(_.key == "doc_pack_bpe").get
    val docPack = graft.operators.PipelineOps.all
      .find(_.key == "doc_pack").get
  }
}
