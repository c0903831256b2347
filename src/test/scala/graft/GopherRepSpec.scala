package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** C36 — the Gopher/RedPajama REPETITION cascade: one planted document
  * per published rule (each constructed so ITS rule is the first to
  * fail), the boundary semantics (fraction == threshold passes), and
  * the composed full_verdict (document cascade first, then repetition).
  */
class GopherRepSpec extends SparkSpec {

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_gopher_rep").toString
    spark.createDataFrame(docs.map { case (i, t) =>
      (i, t, "en", s"s$i", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Two copies of an n-token phrase (1-char tokens) among f unique
    * 4-char fillers — duplicated m-gram char fraction = 2n/(2n+4f) for
    * every m ≤ n, zero above, so the filler count dials which dup rule
    * fires first under the descending thresholds.
    */
  private def phraseDoc(n: Int, f: Int): String = {
    val letters = "pqrstuvwxy".take(n).map(_.toString)
    val fl = (0 until f).map(i => f"f$i%03d")
    (letters ++ fl.take(f / 2) ++ letters ++ fl.drop(f / 2)).mkString(" ")
  }

  test("quality_gopher_rep: each repetition rule fires first on its " +
      "planted doc; thresholds are exclusive; full_verdict composes") {
    val clean = ((1 to 56).map(i => s"word${i}xx") ++
      Seq("the", "and", "that", "with")).mkString(" ")
    // 3 identical 20-word lines: C30-clean (60 words, stopwords, sane
    // lengths) but 100% duplicate lines -> verdict AND full_verdict
    val line20 = "the cat sat with the dog and that they have been " +
      "fine here now today okay good more word play"
    val dupLines = Seq(line20, line20, line20).mkString("\n")
    // duplicated single-line paragraph among 4 multi-line fillers:
    // line frac 2/14, para frac 2/6 > 0.3
    val paraX = "solo paragraph line"
    val paraFill = (0 until 4).map(p =>
      (0 until 3).map(l => f"para$p%02d line$l%02d filler").mkString("\n"))
    val dupParas = (Seq(paraX, paraX) ++ paraFill).mkString("\n\n")
    // long line x2 among 8 unique: line frac 2/10 passes, char frac fails
    val longLine = (1 to 16).map(i => f"wrd$i%02dxx").mkString(" ")
    val dupLineChars = (Seq(longLine, longLine) ++
      (1 to 8).map(i => f"uniq$i%02dln")).mkString("\n")
    // duplicated two-line paragraph: line chars 40/200 == 0.2 PASSES
    // (exclusive threshold), para chars 42/207 > 0.2 fails
    val paraP = "abcdefghij\nklmnopqrst"
    val paraFill2 = (0 until 5).map(p =>
      Seq(f"pp$p%02dxxxxxxxxxxxx", f"qq$p%02dxxxxxxxxxxxx").mkString("\n"))
    val dupParaChars = (Seq(paraP, paraP) ++ paraFill2).mkString("\n\n")
    // "a b" x20 among unique 3-char fillers: top2 = 40/100
    val top2 = (1 to 20).flatMap(i => Seq("a", "b", f"u$i%02d")).mkString(" ")
    // "a b c" x10 with 9-char fillers: top3 = 30/120 > .18, top2 = .167
    val top3 = (1 to 10).flatMap(i =>
      Seq("a", "b", "c", f"u$i%03d".padTo(9, 'x'))).mkString(" ")
    // "a b c d" x10 with 16-char fillers: top4 = .2 > .16, top3 = .15
    val top4 = (1 to 10).flatMap(i =>
      Seq("a", "b", "c", "d", f"g$i%02d".padTo(16, 'x'))).mkString(" ")
    // no gopher stopwords at 60 unique words: doc cascade fails, rep keeps
    val noStop = (1 to 60).map(i => s"zeb${i}ra").mkString(" ")
    val docs = Seq(
      0L -> clean,
      1L -> dupLines,
      2L -> dupParas,
      3L -> dupLineChars,
      4L -> dupParaChars,
      5L -> top2,
      6L -> top3,
      7L -> top4,
      8L -> phraseDoc(5, 12),   // 10/58  = .172 > .15
      9L -> phraseDoc(6, 17),   // 12/80  = .15 passes dup5, fails dup6
      10L -> phraseDoc(7, 22),  // 14/102 = .137 passes dup6, fails dup7
      11L -> phraseDoc(8, 27),  // 16/124 = .129 passes dup7, fails dup8
      12L -> phraseDoc(9, 33),  // 18/150 = .12 == dup8 passes, fails dup9
      13L -> phraseDoc(10, 41), // 20/184 = .109 passes dup9, fails dup10
      14L -> noStop)
    val dir = writeDocs(docs)
    val rows = run("quality_gopher_rep", dir).collect()
    val v = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("verdict")).toMap
    val fv = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("full_verdict")).toMap
    assert(v(0L) == "keep", s"clean: ${v(0L)}")
    assert(v(1L) == "dup_lines")
    assert(v(2L) == "dup_paragraphs", s"got ${v(2L)}")
    assert(v(3L) == "dup_line_chars", s"got ${v(3L)}")
    assert(v(4L) == "dup_para_chars", s"got ${v(4L)}")
    assert(v(5L) == "top_2gram")
    assert(v(6L) == "top_3gram", s"got ${v(6L)}")
    assert(v(7L) == "top_4gram", s"got ${v(7L)}")
    (8 to 13).foreach { i =>
      assert(v(i.toLong) == s"dup_${i - 3}gram",
        s"doc $i: ${v(i.toLong)}")
    }
    assert(v(14L) == "keep")
    // exact metric spot-checks (the conventions, not just the cascade)
    val m = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(8L).getAs[Double]("dup_5gram_frac") == 10.0 / 58.0)
    assert(m(4L).getAs[Double]("dup_line_char_frac") == 40.0 / 200.0)
    assert(m(4L).getAs[Double]("dup_para_char_frac") == 42.0 / 207.0)
    assert(m(1L).getAs[Double]("dup_line_frac") == 1.0)
    // composition: doc-level failure wins; rep failure surfaces when the
    // doc half keeps; both keep -> keep
    assert(fv(14L) == "low_stopword" && v(14L) == "keep")
    assert(m(1L).getAs[String]("doc_verdict") == "keep" &&
      fv(1L) == "dup_lines")
    assert(fv(0L) == "keep" && m(0L).getAs[Boolean]("kept_full"))
  }

  test("gram_rep kernel == the string-level reference on " +
      "repetition-heavy token arrays (all n, boundary shapes)") {
    import spark.implicits._
    def ref(tok: IndexedSeq[String], n: Int): (Long, Long) = {
      val m = tok.length - n + 1
      if (m <= 0) return (0L, 0L)
      val key = (0 until m).map(p =>
        tok.slice(p, p + n).mkString(""))
      val cnt = key.groupBy(identity).view.mapValues(_.size).toMap
      def cps(s: String): Long = s.codePointCount(0, s.length).toLong
      val gl = (0 until m).map(p =>
        tok.slice(p, p + n).map(cps).sum)
      val top = (0 until m).map(p => (cnt(key(p)).toLong, gl(p))).max
      val covered = Array.fill(tok.length)(false)
      for (p <- 0 until m; if cnt(key(p)) >= 2; t <- p until p + n)
        covered(t) = true
      val dup = tok.indices.filter(covered).map(i => cps(tok(i))).sum
      (top._1 * top._2, dup)
    }
    val vocab = Vector("a", "bb", "ccc", "the", "xyzzy", "dd")
    def words(seed: Int, len: Int): IndexedSeq[String] =
      (0 until len).map(i => vocab((seed * 31 + i * i * 7 + i / 3) % vocab.size))
    val cases: Seq[IndexedSeq[String]] =
      Seq(Vector.empty[String], Vector("solo"),
        Vector.fill(40)("dup"),
        ("a b a b a b a b c".split(" ")).toIndexedSeq) ++
        (1 to 8).map(s => words(s, 5 + s * 6))
    val df = cases.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }.toDF("id", "tok")
    (2 to 10).foreach { n =>
      val got = df.select(col("id"),
        call_function("gram_rep", col("tok"), lit(n)).as("g"))
        .select(col("id"), col("g.top_chars"), col("g.dup_chars"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      cases.zipWithIndex.foreach { case (ws, i) =>
        assert(got(i.toLong) == ref(ws, n),
          s"kernel != reference for case $i at n=$n: " +
            s"${got(i.toLong)} vs ${ref(ws, n)}")
      }
    }
  }

}
