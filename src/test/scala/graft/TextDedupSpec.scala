package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantic checks for text + dedup ops, including a crafted mini-corpus
  * with known exact/near duplicates (the sf0.001 corpus has none, so the
  * positive dedup paths are proven here).
  */
class TextDedupSpec extends SparkSpec {

  /** Writes a documents.parquet with planted duplicates; returns the dir. */
  lazy val miniDir: String = {
    val dir = Files.createTempDirectory("graft_mini").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),              // exact dup of 0
      (2L, base + " tomorrow", "en", "src2", base.length + 9L),  // near dup of 0/1
      (3L, "completely different words about spark query engines and storage",
        "en", "src3", 63L),
      (4L, "le chat et le chien et les oiseaux des les la maison", "fr", "src4", 52L),
      (5L, base.toUpperCase, "en", "src5", base.length.toLong),  // case-normalized dup
      (6L, "", "en", "src6", 0L),                                // empty text
      (7L, "two tokens", "en", "src7", 10L))                     // below shingle width
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_langid_learned: distills the heuristic where it has signal " +
      "and reads CHARACTER identity where it doesn't (planted " +
      "ambiguous doc)") {
    val dir = Files.createTempDirectory("graft_langid").toString
    val enBody = "the quick brown fox jumps over the lazy dog and " +
      "plenty of words to look at because the corpus is small"
    val frBody = "bonjour château fromage poisson oiseau maison jardin " +
      "voiture montagne rivière soleil nuage écureuil papillon"
    // teacher-labeled training docs: stopword-bearing en and fr text
    val docs = (0L until 6L).map(i =>
      (i, s"$enBody extra$i", "en", s"s$i", 1L)) ++
      (6L until 12L).map(i =>
        (i, s"le $frBody et la $frBody les des autre$i", "fr", s"s$i", 1L)) :+
      // the AMBIGUOUS doc: French characters, ZERO stopwords from any
      // list — the heuristic ties (all scores 0) and falls back to 'en'
      (12L, frBody, "fr", "s12", 1L)
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("text_langid_learned", dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("heur_lang"), x.getAs[String]("learned_lang")))
      .toMap
    // where the teacher has signal, the student reproduces it
    (0L until 6L).foreach(i => assert(r(i) == (("en", "en")), s"$i: ${r(i)}"))
    (6L until 12L).foreach(i => assert(r(i) == (("fr", "fr")), s"$i: ${r(i)}"))
    // the ambiguous doc: the teacher's stopword tie falls back to 'en',
    // but the learned model has seen these CHARACTER trigrams under the
    // fr label and sides with the character identity
    assert(r(12L)._1 == "en", s"heuristic must tie-break to en: ${r(12L)}")
    assert(r(12L)._2 == "fr",
      s"learned model must read the character identity: ${r(12L)}")
    Caches.releaseScope()
  }

  test("dedup_substr: planted copied spans measured, unique docs score 0") {
    val dir = Files.createTempDirectory("graft_substr").toString
    val a = (1 to 20).map(i => s"a$i").mkString(" ") // 13 8-token spans
    val copied = (1 to 12).map(i => s"b$i").mkString(" ") + " " +
      (1 to 8).map(i => s"a$i").mkString(" ")        // d0's first span, once
    val docs = Seq(
      (0L, a, "en", "s0", a.length.toLong),
      (1L, a, "en", "s1", a.length.toLong),          // exact copy of 0
      (2L, copied, "en", "s2", copied.length.toLong),
      (3L, (1 to 10).map(i => s"c$i").mkString(" "), "en", "s3", 10L),
      (4L, "short doc", "en", "s4", 9L))             // below span width
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("dedup_substr", dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_spans"), x.getAs[Long]("n_dup_spans"),
          x.getAs[Double]("dup_frac"))).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L), "sub-width docs excluded")
    assert(r(0L) == ((13L, 13L, 1.0)), s"full copy: ${r(0L)}")
    assert(r(1L) == ((13L, 13L, 1.0)))
    assert(r(2L) == ((13L, 1L, 1.0 / 13)), s"one copied span: ${r(2L)}")
    assert(r(3L) == ((3L, 0L, 0.0)), "unique doc shares nothing")
  }

  test("dedup_substr_rewrite: first occurrence keeps every token, later " +
      "copies lose exactly the covered span, audit + mass reconcile") {
    val dir = Files.createTempDirectory("graft_substrw").toString
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val pre = (1 to 12).map(i => s"b$i").mkString(" ")
    val span = (1 to 8).map(i => s"a$i").mkString(" ") // d0's first span
    val docs = Seq(
      (0L, a, "en", "s0", a.length.toLong),            // keeper (min id)
      (1L, a, "en", "s1", a.length.toLong),            // full later copy
      (2L, pre + " " + span, "en", "s2", 1L),          // one copied span
      (3L, (1 to 10).map(i => s"c$i").mkString(" "), "en", "s3", 10L),
      (4L, "short doc", "en", "s4", 9L))               // below span width
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("dedup_substr_rewrite", dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_removed_tokens"),
          x.getAs[String]("clean_text"))).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 4L), "every doc gets a row")
    assert(r(0L) == ((20L, 0L, a)), s"keeper untouched: ${r(0L)}")
    assert(r(1L) == ((20L, 20L, "")), "full later copy rewrites to empty")
    assert(r(2L) == ((20L, 8L, pre)), s"covered span cut, prefix kept: ${r(2L)}")
    assert(r(3L) == ((10L, 0L, (1 to 10).map(i => s"c$i").mkString(" "))))
    assert(r(4L) == ((2L, 0L, "short doc")), "sub-width docs pass through")
    // reconcile with D10's audit on the same corpus: a doc loses tokens
    // only if the audit saw duplicated spans in it, and the mass
    // accounting closes (clean token count = n_tokens - n_removed)
    val audit = run("dedup_substr", dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_dup_spans")).toMap
    r.foreach { case (id, (nt, nrem, clean)) =>
      if (nrem > 0)
        assert(audit(id) > 0, s"doc $id cut without audited dup spans")
      val cleanToks = if (clean.isEmpty) 0 else clean.split("\\s+").length
      assert(cleanToks == nt - nrem, s"mass mismatch for doc $id")
    }
  }

  test("dedup_canonical_quality: keeps the argmax-score member — " +
      "including a planted cluster whose best member is NOT the min id") {
    val dir = Files.createTempDirectory("graft_canon").toString
    // a near-dup cluster whose LATER member carries a stopword-rich
    // (higher-quality-label) tail, plus fillers on both sides of the
    // label threshold so the classifier trains non-degenerately
    val junk = (1 to 40).map(i => s"xq$i").mkString(" ")
    val tail = "the cat is on the mat and it was happy there that day"
    val good = junk + " " + tail
    val docs = Seq(
      (0L, junk, "en", "s0", junk.length.toLong),
      (1L, good, "en", "s1", good.length.toLong),
      (2L, tail + " in the warm sun near the door", "en", "s2", 50L),
      (3L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 zz10", "en", "s3", 40L),
      (4L, tail + " and it was quiet there for a while", "en", "s4", 60L),
      (5L, tail + " while the dog was out in the yard", "en", "s5", 60L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scores = run("quality_classifier", dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("score_micros"))
      .toMap
    val got = run("dedup_canonical_quality", dir).collect()
      .map(x => (x.getAs[Long]("cluster_id"), x.getAs[Long]("keep_id"),
        x.getAs[Long]("keep_score_micros"), x.getAs[Long]("n_members")))
    assert(got.nonEmpty, "the planted near-dup pair must cluster")
    val c0 = got.find(_._1 == 0L).getOrElse(
      fail("docs 0 and 1 must form cluster 0"))
    assert(c0._4 == 2L, s"cluster 0 has both members: $c0")
    // the selection RULE: argmax score, tie → min id — checked against
    // the standalone C18 scores
    val expected = Seq(0L, 1L).maxBy(id => (scores(id), -id))
    assert(c0._2 == expected && c0._3 == scores(expected))
    // and the plant did its job: the best-quality member is the LATER id
    assert(expected == 1L && scores(1L) > scores(0L),
      s"planted tail must out-score the junk base: $scores")
  }

  test("text_rarity: rare-token docs score above common-token docs") {
    val dir = Files.createTempDirectory("graft_rarity").toString
    val common = Seq.fill(30)("the").mkString(" ")
    val rare = (1 to 10).map(i => s"zq$i").mkString(" ")
    val docs = Seq(
      (0L, common, "en", "s0", common.length.toLong),
      (1L, common, "en", "s1", common.length.toLong),
      (2L, rare, "en", "s2", rare.length.toLong))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("text_rarity", dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("mean_rarity"),
          x.getAs[Long]("n_hapax"), x.getAs[Double]("hapax_frac"))).toMap
    // corpus: 60 "the" + 10 hapax → total 70; rarity(the) = 70 div 60 = 1,
    // rarity(hapax) = 70
    assert(r(0L) == ((30L, 1L, 0L, 0.0)), s"common doc: ${r(0L)}")
    assert(r(2L) == ((10L, 70L, 10L, 1.0)), s"rare doc: ${r(2L)}")
    assert(r(2L)._2 > r(0L)._2, "rarity must rank rare above common")
    // real corpus: every doc tokenizes, rarity ≥ 1, fractions in range
    val real = run("text_rarity").collect()
    assert(real.length == 500)
    real.foreach { x =>
      assert(x.getAs[Long]("mean_rarity") >= 1L)
      val hf = x.getAs[Double]("hapax_frac")
      assert(hf >= 0.0 && hf <= 1.0)
    }
  }

  test("text_token_count / text_fingerprint agree on the real corpus") {
    val tc = run("text_token_count").collect()
    assert(tc.length == 500 && tc.forall(_.getAs[Long]("n_tokens") > 0))
    // BPE-ish pre-tokens: at least one per whitespace token (words split
    // further into digit/punct/contraction runs), and bounded by chars
    tc.foreach { r =>
      val (ws, bpe) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bpe_tokens"))
      assert(bpe >= ws, s"bpe pieces can't undercut word count: $bpe < $ws")
      assert(bpe <= r.getAs[Long]("n_chars_measured"))
    }
    val fp = run("text_fingerprint").collect()
    assert(fp.map(_.getAs[Long]("fp60")).distinct.length == 500,
      "distinct docs must get distinct 60-bit fingerprints")
  }

  test("text_repetition: looping text flagged, varied text not") {
    val dir = Files.createTempDirectory("graft_rep").toString
    val looped = Seq.fill(10)("buy cheap pills now").mkString(" ")
    val varied = (1 to 40).map(i => s"w$i").mkString(" ")
    spark.createDataFrame(Seq(
        (0L, looped, "en", "s", looped.length.toLong),
        (1L, varied, "en", "s", varied.length.toLong),
        (2L, "", "en", "s", 0L),
        (3L, "two tokens", "en", "s", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("text_repetition", dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("rep_ratio"), r.getAs[Boolean]("is_repetitive"),
          r.getAs[Long]("n_trigrams"))).toMap
    // 40 tokens looping a 4-token phrase: 38 trigram slots, only 4
    // distinct trigrams → rep_ratio = 34/38
    assert(rows(0L)._3 == 38L && rows(0L)._2, s"looped doc: ${rows(0L)}")
    assert(math.abs(rows(0L)._1 - 34.0 / 38.0) < 1e-12)
    assert(rows(1L)._1 == 0.0 && !rows(1L)._2, "varied doc must score 0")
    // degenerate docs: no trigrams → ratio 0, not flagged
    assert(rows(2L) == ((0.0, false, 0L)) && rows(3L) == ((0.0, false, 0L)))
  }

  test("dedup_decontaminate: planted eval overlap flagged, clean docs pass") {
    val dir = Files.createTempDirectory("graft_decon").toString
    val evalText = (1 to 20).map(i => s"eval$i").mkString(" ")
    // doc 30 embeds 10 consecutive eval tokens (3 shared 8-grams);
    // doc 31 shares only 7 consecutive tokens (below the n-gram width);
    // doc 32 is clean
    val leaked = "intro words then " +
      (5 to 14).map(i => s"eval$i").mkString(" ") + " and more after"
    val below = "padding " + (5 to 11).map(i => s"eval$i").mkString(" ") +
      " other tail words here to pass length"
    val clean = (1 to 20).map(i => s"clean$i").mkString(" ")
    spark.createDataFrame(Seq(
        (0L, evalText, "en", "s", evalText.length.toLong),
        (30L, leaked, "en", "s", leaked.length.toLong),
        (31L, below, "en", "s", below.length.toLong),
        (32L, clean, "en", "s", clean.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("dedup_decontaminate", dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared_ngrams"),
        r.getAs[Long]("n_eval_docs"))).toSeq
    assert(rows == Seq((30L, 3L, 1L)),
      s"only the 10-token leak spans a full 8-gram: $rows")

    // scale contract: the tiny eval index broadcasts; the corpus n-gram
    // stream is probed map-side, never shuffled for the join
    val df = run("dedup_decontaminate", dir)
    df.collect()
    assert(plan(df).contains("BroadcastHashJoin"),
      "eval index must broadcast against the corpus n-gram stream")
  }

  test("text_bm25: scores positive and sorted, winners contain query terms") {
    val out = run("text_bm25").collect()
    assert(out.length == 20)
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores.forall(_ > 0))
    assert(scores == scores.sortBy(-_), "must be sorted by score desc")
    // every returned doc really contains at least one query term
    val terms = Set("fast", "stream", "merge", "query")
    val texts = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    out.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).toLowerCase
        .split("\\s+").toSet
      assert((toks & terms).nonEmpty, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // scale contract: global top-k plans as TakeOrderedAndProject
    val df = run("text_bm25")
    df.collect()
    assert(plan(df).contains("TakeOrderedAndProject"))
  }

  test("dedup_decon_fuzzy: a paraphrased eval leak is flagged; a " +
      "corpus-internal dup pair is not") {
    val dir = Files.createTempDirectory("graft_decon").toString
    val evalDoc =
      "the quick brown fox jumps over the lazy dog again and again today"
    val corpusOnly =
      "completely different words about spark query engines and storage"
    val docs = Seq(
      (0L, evalDoc),                  // eval set (doc_id < 25)
      (1L, "benchmark answers nothing shares these tokens with anything"),
      (30L, evalDoc + " tomorrow"),   // near-dup LEAK of eval doc 0
      (31L, corpusOnly),              // corpus-internal exact dup pair:
      (32L, corpusOnly),              //   near-dup of each other, NOT of eval
      (33L, "entirely unrelated musings on distributed shuffles and sorts"))
      .map { case (i, t) => (i, t, "en", s"s$i", t.length.toLong) }
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("dedup_decon_fuzzy", dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_eval_dups"), x.getAs[Double]("max_jaccard")))
      .toMap
    assert(r.keySet == Set(30L), s"flagged: ${r.keySet}")
    assert(r(30L)._1 == 1L)
    assert(r(30L)._2 >= 0.5)
  }

  test("quality_gopher: each published rule fires on its planted doc " +
      "and a clean doc keeps") {
    val dir = Files.createTempDirectory("graft_gopher").toString
    // 60 clean words incl. >=2 required stopwords, no symbols/bullets
    val clean = (("the cat sat with the dog and that was fine " +
      "because words flow nicely here today") + " extra filler") * 3
    val few = "the cat sat with mat"                       // < 50 words
    val shortWords = Array.fill(60)("ab").mkString(" ")    // mean len < 3
    val symbols = (Array.fill(60)("word") :+
      Array.fill(12)("#").mkString(" ")).mkString(" ")     // > 0.1 sym/word
    val bullets = (0 until 10).map(i => s"- bullet item $i with the " +
      "needed and tom word count padding padding").mkString("\n")
    val ellipsis = (0 until 10).map(i => s"a trailing line $i with the " +
      "and of words that keeps going on...").mkString("\n")
    val lowAlpha = (Array.fill(30)("9999") ++ Array.fill(30)("the"))
      .mkString(" ")                                       // alpha < 0.8
    val noStop = Array.fill(60)("zebra").mkString(" ")     // 0 required stop
    val docs = Seq(
      (0L, clean), (1L, few), (2L, shortWords), (3L, symbols),
      (4L, bullets), (5L, ellipsis), (6L, lowAlpha), (7L, noStop))
      .map { case (i, t) => (i, t, "en", s"s$i", t.length.toLong) }
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("quality_gopher", dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("verdict")).toMap
    assert(r(0L) == "keep", s"clean: ${r(0L)}")
    assert(r(1L) == "too_few_words")
    assert(r(2L) == "word_length")
    assert(r(3L) == "symbol_ratio")
    assert(r(4L) == "bullet_lines")
    assert(r(5L) == "ellipsis_lines")
    assert(r(6L) == "low_alpha")
    assert(r(7L) == "low_stopword")
  }

  test("text_quality: ratios in range, score composition") {
    run("text_quality").collect().foreach { r =>
      val p = r.getAs[Double]("punct_ratio")
      val s = r.getAs[Double]("stopword_ratio")
      val q = r.getAs[Double]("quality_score")
      assert(p >= 0 && p <= 1); assert(s >= 0 && s <= 1)
      assert(q >= 0 && q <= 1)
      assert(r.getAs[Boolean]("is_quality") == (q > 0.5))
    }
  }

  test("text_langid: french stopwords beat english on a french doc") {
    val rows = run("text_langid", miniDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(rows(4L) == "fr", s"expected fr, got ${rows(4L)}")
    assert(rows(3L) == "en")
  }

  test("dedup_exact: exact + case/whitespace dups collapse, others don't") {
    val groups = run("dedup_exact", miniDir).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(groups(0L) == 3, "docs 0,1,5 must share a fingerprint")
    assert(groups(2L) == 1 && groups(3L) == 1 && groups(4L) == 1)
    assert(groups(6L) == 1 && groups(7L) == 1, "edge docs must survive")
  }

  test("edge docs (empty / below shingle width) flow through every text/dedup op") {
    // none of these may crash, and the edge docs must not produce
    // spurious dup pairs
    Seq("text_token_count", "text_quality", "text_langid", "text_fingerprint",
      "dedup_simhash", "text_repetition", "text_rarity").foreach { k =>
      val ids = run(k, miniDir).collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(6L) && ids.contains(7L), s"$k dropped edge docs")
    }
    // the zero-weight clamp: the empty doc (n_chars=0) must still draw a
    // defined priority key and be sampled, not hit an engine-dependent
    // division by zero
    val sampled = run("sample_weighted", miniDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(sampled.contains(6L), "sample_weighted dropped the empty doc")
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh").foreach { k =>
      val pairs = run(k, miniDir).collect()
        .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")))
      assert(!pairs.exists { case (i, j) => i >= 6L || j >= 6L },
        s"$k paired an edge doc: ${pairs.toSeq}")
    }
    // below-span-width edge docs are EXCLUDED from the span audit (not
    // crashed on), and doc_pack still packs them (EOS-only entries)
    val substrIds = run("dedup_substr", miniDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(!substrIds.contains(6L) && !substrIds.contains(7L))
    val packIds = run("doc_pack", miniDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(packIds.contains(6L) && packIds.contains(7L),
      "doc_pack must place every doc, even empty ones")
    // the BPE family: the empty doc counts 0 tokens (and a defined
    // chars_per_token via the greatest-guard), still packs (EOS-only)
    // and still budgets
    val bpe = run("text_bpe_count", miniDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe")).toMap
    assert(bpe(6L) == 0L, "empty doc must count 0 BPE tokens")
    assert(bpe(7L) > 0L)
    val bpePackIds = run("doc_pack_bpe", miniDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(bpePackIds.contains(6L) && bpePackIds.contains(7L),
      "doc_pack_bpe must place every doc, even empty ones")
    val mixSrcs = run("mixture_plan_bpe", miniDir).collect()
      .map(_.getAs[String]("source")).toSet
    assert(mixSrcs.contains("src7"), "mixture_plan_bpe dropped a source")
  }

  test("dedup_ngram_jaccard finds near + exact dup pairs with sane scores") {
    val pairs = run("dedup_ngram_jaccard", miniDir).collect()
      .map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((0L, 1L)) == 1.0, "exact dup pair must score 1.0")
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5,
      "near dup pair missing")
    assert(!pairs.keySet.exists { case (i, j) => i == 3L || j == 3L },
      "unrelated doc paired")
  }

  test("dedup_minhash_lsh agrees with exhaustive jaccard at tau=0.5") {
    def pairSet(key: String) = run(key, miniDir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.5)
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert(pairSet("dedup_minhash_lsh") == pairSet("dedup_ngram_jaccard"))
  }

  test("dedup_simhash: identical texts identical hashes, near-dups close") {
    val sim = run("dedup_simhash", miniDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sim(0L) == sim(1L) && sim(0L) == sim(5L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sim(0L), sim(2L)) <= 10, "near-dup simhashes too far")
    assert(hamming(sim(0L), sim(3L)) > 10, "unrelated simhashes too close")
  }

  test("dedup plans never fall back to cartesian products") {
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embedding")
      .foreach { key =>
        val p = plan(run(key))
        assert(!p.contains("CartesianProduct"), s"$key plan has a cross join")
      }
  }

  test("dedup_ngram_jaccard df-cap: a planted stop-phrase generates no pairs") {
    // 6 documents that share ONLY a 10-token boilerplate tail (a viral
    // stop-phrase: df=6 on every tail trigram) behind 3 distinct lead
    // tokens. Uncapped, every pair scores jaccard 8/14 ≈ 0.57; with the
    // df cap at 2 the stop-phrase buckets are dropped and no candidate
    // pair survives — the bound that keeps one boilerplate trigram from
    // going quadratic at 100 TB.
    val dir = Files.createTempDirectory("graft_stopphrase").toString
    val tail = "please like share and subscribe to our channel today friends"
    val docs = (0L until 6L).map(i =>
      (i, s"alpha$i beta$i gamma$i " + tail, "en", s"s$i", 0L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val uncapped = operators.DedupOps.jaccardPairs(spark, dir, maxDf = 100)
    assert(uncapped.count() == 15, "uncapped: all 15 boilerplate pairs")
    val capped = operators.DedupOps.jaccardPairs(spark, dir, maxDf = 2)
    assert(capped.count() == 0, "df cap must drop the stop-phrase bucket")
  }

  test("dedup_minhash_lsh bucket cap: an oversized band bucket is dropped") {
    val dir = Files.createTempDirectory("graft_bigbucket").toString
    // 5 exact copies: every band bucket has occupancy 5.
    val docs = (0L until 5L).map(i =>
      (i, "identical boilerplate text repeated verbatim in every document",
        "en", s"s$i", 0L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(operators.DedupOps.minhashPairs(spark, dir).count() == 10)
    assert(operators.DedupOps.minhashPairs(spark, dir, maxBucket = 4).count() == 0,
      "occupancy cap must drop the oversized bucket")
  }

  /** Planted embedding corpus: 30 near-identical pairs (cos ≈ 0.999,
    * ids 2k/2k+1) + 40 independent random vectors; labels deliberately
    * DISAGREE within each planted pair, so any label-blocked plan would
    * score recall 0.
    */
  lazy val miniEmbDir: String = {
    val dir = Files.createTempDirectory("graft_emb").toString
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val rows = (0 until 30).flatMap { k =>
      val base = vec()
      val near = base.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
      Seq((2L * k, base, k % 4), (2L * k + 1, near, (k + 1) % 4))
    } ++ (60 until 100).map(i => (i.toLong, vec(), i % 4))
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("dedup_embedding: LSH blocking finds every planted near-dup pair") {
    val pairs = run("dedup_embedding", miniEmbDir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    val planted = (0 until 30).map(k => (2L * k, 2L * k + 1)).toSet
    assert(planted.subsetOf(pairs),
      s"missed planted pairs: ${(planted -- pairs).toSeq.sorted}")
  }

  test("dedup_embedding: blocks on LSH buckets, not any metadata key") {
    val p = plan(run("dedup_embedding"))
    assert(!p.contains("label"), "plan must not touch the label column")
    // soundness at sf0.001: every reported pair really has cos >= 0.3
    run("dedup_embedding").collect().foreach { r =>
      assert(r.getAs[Double]("cos") >= 0.3)
    }
  }

  test("text_vocab_coverage: Zipf-curve invariants hold") {
    val rows = run("text_vocab_coverage").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to rows.length),
      "ranks must be contiguous from 1")
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing by rank")
    val cums = rows.map(_.getAs[Long]("cum_cnt"))
    assert(cums.head == cnts.head)
    cums.zip(cums.tail).zip(cnts.tail).foreach { case ((prev, cur), c) =>
      assert(cur == prev + c, "cumulative must add exactly per rank")
    }
    val nTotal = rows.head.getAs[Long]("n_total")
    assert(rows.forall(_.getAs[Long]("n_total") == nTotal))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.last <= 1.0 && cums.last <= nTotal)
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a },
      "coverage must be monotone")
    // the sf0.001 corpus is a small closed vocabulary: the top-100 cut
    // must cover the whole token stream (the curve reaches 1.0)
    assert(rows.length < 100 || cums.last == nTotal || cov.last > 0.9)
  }

  test("text_extract: markup stripped, boilerplate dropped, content kept") {
    val rows = run("text_extract").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val content = r.getAs[String]("content")
      // extraction output is markup- and entity-free
      assert(!content.contains("<") || content.contains("<tail>"),
        "only the decoded literal '<tail>' marker may carry angle brackets")
      assert(!content.contains("&amp;") && !content.contains("&lt;") &&
        !content.contains("&copy;"), s"undecoded entity in: $content")
      // the synthesized template blocks never survive
      assert(!content.contains("home docs about"), "nav must be dropped")
      assert(!content.contains("see these links now"), "promo must be dropped")
      assert(!content.contains("2026 example corp"), "footer must be dropped")
      val (kept, total) = (r.getAs[Long]("kept_blocks"),
        r.getAs[Long]("total_blocks"))
      assert(total == 5L, "template always synthesizes 5 blocks")
      assert(kept >= 0L && kept <= 2L,
        "only the two paragraph halves can pass the classifier")
      val ratio = r.getAs[Double]("boilerplate_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
      // every kept char is in content (+ newline separators between blocks)
      assert(content.length >= 0 &&
        (kept > 0 || content.isEmpty))
    }
    // the corpus has long docs: both halves pass for at least one, and the
    // length gate is data-dependent (not every doc keeps both halves)
    assert(rows.exists(_.getAs[Long]("kept_blocks") == 2L),
      "long docs must keep both paragraph halves")
    // content words come from the source text (tags/entities are template)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val src = run("text_token_count").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(byId.keySet == src, "one output row per document")
  }

  test("text_extract: link-density and length gates classify planted blocks") {
    val dir = Files.createTempDirectory("graft_extract").toString
    val long = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (0L, long, "en", "s0", long.length.toLong),   // both halves >= 30 chars
      (1L, "tiny doc", "en", "s1", 8L))             // both halves < 30 chars
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run("text_extract", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("kept_blocks") == 2L)
    assert(out(0L).getAs[String]("content").contains("word1"))
    // the entity tail decodes on the kept second half
    assert(out(0L).getAs[String]("content").contains("& <tail>"))
    assert(out(1L).getAs[Long]("kept_blocks") == 0L,
      "short halves fail the length gate")
    assert(out(1L).getAs[String]("content").isEmpty)
    assert(out(1L).getAs[Double]("boilerplate_ratio") == 1.0)
  }

  test("dedup_semantic: planted near-identical pairs drop their j-member") {
    val rows = run("dedup_semantic", miniEmbDir).collect()
    assert(rows.length == 100, "one verdict row per vector")
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    // verdict self-consistency on every row
    rows.foreach { r =>
      val (n, keep) = (r.getAs[Long]("n_dups"), r.getAs[Boolean]("keep"))
      assert(keep == (n == 0L))
      if (n > 0) assert(r.getAs[Double]("max_dup_cos") >= 0.35)
      else assert(r.isNullAt(r.fieldIndex("max_dup_cos")))
    }
    // a cos≈0.999 pair drops its higher-id member EXACTLY when both land
    // in the same semantic cell; cell-straddling pairs survive (the
    // documented SemDeDup recall limitation — a ±0.01 perturbation can
    // flip a near-tied centroid argmax). With these random centroids
    // most pairs co-locate.
    val sameCell = (0 until 30).count { k =>
      byId(2L * k).getAs[Long]("cell") == byId(2L * k + 1).getAs[Long]("cell")
    }
    val dropped = (0 until 30).count { k =>
      !byId(2L * k + 1).getAs[Boolean]("keep") &&
        byId(2L * k + 1).getAs[Double]("max_dup_cos") > 0.9
    }
    assert(sameCell >= 18, s"only $sameCell of 30 planted pairs co-locate")
    assert(dropped == sameCell,
      s"dropped $dropped must equal co-located $sameCell")
    // the lower-id member survives unless it has its own lower-id dup
    val keptBase = (0 until 30).count(k => byId(2L * k).getAs[Boolean]("keep"))
    assert(keptBase >= 25, s"only $keptBase of 30 base vectors kept")
  }

  test("dedup_semantic: no cartesian fallback; verdicts move with tau") {
    val p = plan(run("dedup_semantic", miniEmbDir))
    assert(!p.contains("CartesianProduct"),
      "cell-local pair enumeration must never fall back to a cross join")
  }

  test("lm_bigram: improbable word order scores above fluent repetition") {
    val dir = Files.createTempDirectory("graft_lm").toString
    val fluent = "the cat sat on the mat"
    // same multiset of words, an order no other doc uses
    val scrambled = "mat the on sat cat the"
    val docs = (0L until 10L).map(i =>
      (i, fluent, "en", s"s$i", fluent.length.toLong)) :+
      (10L, scrambled, "en", "s10", scrambled.length.toLong)
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run("lm_bigram", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == (0L to 10L).toSet)
    val fluentBits = out(0L).getAs[Double]("mean_bits")
    val scrambledBits = out(10L).getAs[Double]("mean_bits")
    assert(scrambledBits > fluentBits + 1.0,
      s"scrambled $scrambledBits must clearly exceed fluent $fluentBits")
    // all fluent copies share identical bigram stats → identical scores
    (1L until 10L).foreach { i =>
      assert(out(i).getAs[Long]("sum_bits_q16") ==
        out(0L).getAs[Long]("sum_bits_q16"))
    }
    // bits are information content: never negative, and a doc whose
    // bigrams are all unique prefix-continuations scores ~0 only if its
    // prefixes are unambiguous — here "the" continues two ways, so even
    // the fluent docs carry positive bits
    assert(fluentBits > 0.0)
  }

  test("lm_bigram_ref: out-of-domain docs pay for unseen bigrams") {
    val dir = Files.createTempDirectory("graft_lmref").toString
    // even ids (the training half) share one fluent phrasebook; doc 11
    // is odd (scored only) and in-domain, doc 13 is odd and alien
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val alien = "zx qv wp zx qv wp zx qv wp zx qv wp"
    val docs = (0L until 10L).map(i =>
      (i, fluent, "en", s"s$i", 0L)) ++ Seq(
      (11L, fluent, "en", "s11", 0L),
      (13L, alien, "en", "s13", 0L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run("lm_bigram_ref", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("is_ref"))
    assert(!out(11L).getAs[Boolean]("is_ref"))
    val inDomain = out(11L).getAs[Double]("mean_bits")
    val outDomain = out(13L).getAs[Double]("mean_bits")
    assert(outDomain > inDomain + 1.0,
      s"alien doc $outDomain must exceed in-domain $inDomain")
    // every alien bigram has an unseen prefix, so it prices EXACTLY at
    // the uniform prior log2(V/(0+1)); the fluent reference has V = 8
    // continuations (cat sat on the mat and dog rug) → exactly 3 bits
    assert(outDomain == 3.0, s"unseen-prefix floor must be log2(8)=$outDomain")
    assert(inDomain > 0.0)
    // in-domain odd doc scores exactly like its even twins (same
    // bigrams, same model)
    assert(out(11L).getAs[Long]("sum_bits_q16") ==
      out(0L).getAs[Long]("sum_bits_q16"))
  }

  test("lm_bigram: every doc with >=2 tokens scored, bits internally consistent") {
    val rows = run("lm_bigram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sum, mean) = (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("sum_bits_q16"), r.getAs[Long]("mean_bits_q16"))
      assert(n >= 1L && sum >= 0L)
      assert(mean == sum / n)
      assert(math.abs(r.getAs[Double]("mean_bits") -
        sum.toDouble / n / 65536.0) < 1e-12)
    }
  }

  test("text_pii_redact: planted spans scrubbed, counts and density exact") {
    val rows = run("text_pii_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]") &&
        red.contains("[IP]"), s"all three planted spans must redact: $red")
      assert(!red.contains("@example.com"), "email must not survive")
      assert(!red.contains("10.0."), "IP must not survive")
      assert(!red.matches(".*\\b555-[0-9]{4}\\b.*"), "phone must not survive")
      // exactly one of each is planted; the clean corpus contributes none
      assert(r.getAs[Long]("n_email") == 1L)
      assert(r.getAs[Long]("n_phone") == 1L)
      assert(r.getAs[Long]("n_ip") == 1L)
      val d = r.getAs[Double]("pii_density")
      assert(d > 0.0 && d < 1.0)
      // redaction only ever shrinks or preserves the token stream
      assert(red.split("\\s+").length >= 5)
    }
  }

  test("dedup_bloom: planted leak flagged exactly, Bloom never misses an " +
      "exact overlap (no false negatives vs dedup_decontaminate)") {
    // same planted corpus as the decontaminate test: doc 30 leaks 3 full
    // 8-grams, doc 31 is below width, doc 32 is clean
    val dir = Files.createTempDirectory("graft_bloom").toString
    val evalText = (1 to 20).map(i => s"eval$i").mkString(" ")
    val leaked = "intro words then " +
      (5 to 14).map(i => s"eval$i").mkString(" ") + " and more after"
    val below = "padding " + (5 to 11).map(i => s"eval$i").mkString(" ") +
      " other tail words here to pass length"
    val clean = (1 to 20).map(i => s"clean$i").mkString(" ")
    spark.createDataFrame(Seq(
        (0L, evalText, "en", "s", evalText.length.toLong),
        (30L, leaked, "en", "s", leaked.length.toLong),
        (31L, below, "en", "s", below.length.toLong),
        (32L, clean, "en", "s", clean.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("dedup_bloom", dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bloom_hits"), r.getAs[Long]("n_exact_hits"),
          r.getAs[Long]("n_false_pos"))).toMap
    val r30 = rows.getOrElse(30L, fail("leaked doc must be flagged"))
    assert(r30._2 == 3L, s"3 shared 8-grams must verify exactly: $r30")
    // Bloom guarantees one-sided error: exact hits can never be missed,
    // and bloom >= exact on every flagged doc
    rows.values.foreach { case (b, e, f) =>
      assert(b >= e && f == b - e, s"hit accounting: ($b, $e, $f)")
    }
    assert(rows.get(31L).forall(_._2 == 0L), "below-width leak never exact")
    assert(rows.get(32L).forall(_._2 == 0L), "clean doc never exact")
  }

  test("dedup_bloom at gate SF: exact-hit docs == dedup_decontaminate's " +
      "docs gram-for-gram; false positives exist (the verify stage is " +
      "load-bearing); corpus joins only broadcast") {
    val d01 = "/root/testdata/sf0.01"
    val bloom = run("dedup_bloom", d01)
    val bRows = bloom.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bloom_hits"), r.getAs[Long]("n_exact_hits"),
          r.getAs[Long]("n_false_pos"))).toMap
    val exact = run("dedup_decontaminate", d01).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_ngrams"))
      .toMap
    // no false negatives: every exactly-contaminated doc is flagged with
    // the identical distinct-gram count
    exact.foreach { case (id, n) =>
      assert(bRows.contains(id) && bRows(id)._2 == n,
        s"doc $id: exact $n vs bloom ${bRows.get(id)}")
    }
    // and no phantom exact hits beyond the exact set
    bRows.foreach { case (id, (_, e, _)) =>
      assert(e == exact.getOrElse(id, 0L), s"doc $id exact-hit drift")
    }
    // the 2 KB bitset is sized so FPs genuinely occur at this SF —
    // without them the two-stage design would be untested decoration
    assert(bRows.values.map(_._3).sum > 0, "expected false positives")
    // scale contract: the only join is the broadcast exact-verify on the
    // (rare) bloom survivors; the corpus n-gram stream itself is filtered
    // map-side against the literal bitset and never shuffle-joined
    val p = plan(bloom)
    assert(p.contains("BroadcastHashJoin"), "exact verify must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus side must never shuffle-join")
  }

  test("dedup_url: every canonicalization rule fires — case/port/www/" +
      "slash/fragment collapse, tracking params strip, param order sorts") {
    val rows = run("dedup_url").collect()
      .map(r => r.getAs[Long]("keep_id") ->
        (r.getAs[String]("canon_url"), r.getAs[Long]("n_copies"))).toMap
    // ids 0,1,2 carry the same page decorated with (case+utm),
    // (www+:443+trailing slash+#fragment) — all must collapse onto id 0
    assert(rows(0L) == (("https://h0.example.com/article/0?id=0", 3L)),
      s"normalization group: ${rows(0L)}")
    // ids 3,4 share a REAL param set in different order, one with a utm
    // tail — only sorting + tracking-strip together collapse them
    assert(rows(3L) == (("https://h0.example.com/article/0?id=0&page=2", 2L)),
      s"param-sort group: ${rows(3L)}")
    // id 5 is a genuinely different page and must stay its own group
    assert(rows(5L)._2 == 1L, s"unique page: ${rows(5L)}")
    assert(!rows.values.exists(_._1.contains("utm_")),
      "no canonical URL may retain a tracking param")
    assert(!rows.values.exists(_._1.contains("#")), "fragments stripped")
    // one per-row projection + one exact-dedup shuffle — no joins
    val p = plan(run("dedup_url"))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "URL dedup is projection + groupBy only")
  }

  test("dedup_containment: a quoted subset scores ~1 containment at low " +
      "jaccard; symmetric near-dups agree with D2") {
    val dir = Files.createTempDirectory("graft_cont").toString
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    // doc 1 is the first 12 tokens of doc 0 quoted wholesale: 10 of its
    // 10 shingles live in doc 0, but jaccard is only ~10/58
    val quoted = (1 to 12).map(i => s"w$i").mkString(" ")
    val unrelated = (1 to 30).map(i => s"z$i").mkString(" ")
    spark.createDataFrame(Seq(
        (0L, long, "en", "s", long.length.toLong),
        (1L, quoted, "en", "s", quoted.length.toLong),
        (2L, unrelated, "en", "s", unrelated.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("dedup_containment", dir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        (r.getAs[Double]("containment"), r.getAs[Double]("jaccard"))).toMap
    val (cont, jac) = rows.getOrElse((0L, 1L),
      fail(s"quoted-subset pair must surface: $rows"))
    assert(cont == 1.0, s"full quote -> containment 1.0, got $cont")
    assert(jac < 0.25, s"and jaccard stays low ($jac) — the asymmetry " +
      "D2 cannot see")
    assert(!rows.keySet.exists { case (i, j) => i == 2L || j == 2L },
      "unrelated doc never pairs")
  }

  test("quality_ppl_buckets: token-mass terciles, score-ordered buckets, " +
      "full coverage vs lm_bigram_ref") {
    val rows = run("quality_ppl_buckets").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("mean_bits"), r.getAs[String]("bucket")))
    val total = rows.map(_._2).sum.toDouble
    val mass = rows.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    Seq("head", "middle", "tail").foreach { b =>
      val share = mass.getOrElse(b, 0L) / total
      assert(share > 0.2 && share < 0.47,
        f"$b holds $share%.2f of token mass — not a tercile split")
    }
    // buckets are score-ordered up to one histogram bin (1/256 bit)
    val binW = 2.0 / 256
    val h = rows.filter(_._4 == "head").map(_._3)
    val m = rows.filter(_._4 == "middle").map(_._3)
    val t = rows.filter(_._4 == "tail").map(_._3)
    assert(h.max <= m.min + binW, "head must score below middle")
    assert(m.max <= t.min + binW, "middle must score below tail")
    // every LM-scored doc gets a bucket (same population as C19b)
    assert(rows.length == run("lm_bigram_ref").count(),
      "bucket partition must cover the scored corpus exactly")
  }

  test("quality_ppl_buckets: a planted alien doc lands in tail, fluent " +
      "clones land in head") {
    val dir = Files.createTempDirectory("graft_ppl").toString
    val fluent = "the cat sat on the mat and the dog sat on the rug today"
    val alien = "zx qv wk jh pf mg bn td lr cs zx qv wk jh pf mg bn td"
    val docs = (0L to 8L).map(i =>
      (i, fluent, "en", s"s$i", fluent.length.toLong)) :+
      (9L, alien, "xx", "s9", alien.length.toLong)
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val by = run("quality_ppl_buckets", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(by(9L) == "tail", s"alien doc must be tail: ${by(9L)}")
    assert(by(0L) == "head", s"fluent doc must be head: ${by(0L)}")
  }

  test("text_entropy: closed-form cases exact in Q16, degenerate docs " +
      "gate low, multibyte counts by code point, no shuffle before sort") {
    val dir = Files.createTempDirectory("graft_ent").toString
    val docs = Seq(
      (0L, "aaaaaaaaaaaaaaaa", "en", "s", 16L),       // 1 symbol → H = 0
      (1L, "abababababababab", "en", "s", 16L),       // uniform 2 → H = 1
      (2L, "abcdabcdabcdabcd", "en", "s", 16L),       // uniform 4 → H = 2
      (3L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
      (4L, "ñññ💩💩💩", "xx", "s", 6L),               // multibyte, uniform 2
      (5L, "", "en", "s", 0L))                         // empty → excluded
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = run("text_entropy", dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_cp"), x.getAs[Long]("n_distinct_cp"),
          x.getAs[Long]("ent_q16"), x.getAs[Boolean]("is_low_entropy")))
      .toMap
    assert(!r.contains(5L), "empty text must be excluded")
    // uniform distributions hit the Q16 grid exactly: H = log2(k) is an
    // integer, and the kernel's exponent path carries it losslessly
    assert(r(0L) == ((16L, 1L, 0L, true)), s"H(uniform-1): ${r(0L)}")
    assert(r(1L)._3 == 65536L && r(1L)._4, s"H(uniform-2): ${r(1L)}")
    assert(r(2L)._3 == 2L * 65536L && r(2L)._4, s"H(uniform-4): ${r(2L)}")
    // surrogate-pair code points count once each (6 cps, not 9 UTF-16 units)
    assert(r(4L)._1 == 6L && r(4L)._2 == 2L && r(4L)._3 == 65536L,
      s"multibyte: ${r(4L)}")
    // fluent text sits in the natural-language band and passes the gate
    val fluent = r(3L)._3 / 65536.0
    assert(fluent > 3.0 && fluent < 5.0 && !r(3L)._4, s"fluent: $fluent")
    // entropy is bounded by log2(alphabet): uniform docs meet the bound
    // exactly, nothing exceeds its ceil
    r.values.foreach { case (_, dct, ent, _) =>
      val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(
        2 * dct - 1)
      assert(ent <= ceilLog2.toLong * 65536L,
        s"H must not exceed log2 of the alphabet: $dct $ent")
    }
    val df = run("text_entropy", dir)
    df.collect()
    val p = plan(df)
    // shuffle-free apart from the doc_id spread + output sort: no
    // aggregate exchange, no join — the kernel does everything per row
    assert(!p.contains("Join"), "entropy must not plan a join")
    assert(!"HashAggregate".r.findFirstIn(p).isDefined,
      "entropy must not plan an aggregate")
  }

  test("dedup_lines: planted boilerplate (df>=3) is dropped everywhere " +
      "but its corpus-first occurrence; df=2 and blank lines survive") {
    import spark.implicits._
    import graft.operators.DedupOps
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (0L, s"alpha beta\n$boiler\ngamma"),
      (1L, s"$boiler\ndelta"),
      (2L, s"epsilon\n$boiler"),
      (3L, "twice line\nzeta"),   // df=2: below threshold, survives
      (4L, "twice line\neta"),
      (5L, ""),                   // empty doc: 1 blank line, untouched
      (6L, "a\n\nb"),             // blank lines are exempt even at df>=3
      (7L, "c\n\nd"),
      (8L, "e\n\nf")
    ).toDF("doc_id", "text")
    val got = DedupOps.dedupLinesFor(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // boilerplate df=3: first occurrence is (doc 0, line 2) — kept
    // there, removed from docs 1 and 2
    assert(got(0L) == ((3L, 0L, s"alpha beta\n$boiler\ngamma")))
    assert(got(1L) == ((2L, 1L, "delta")))
    assert(got(2L) == ((2L, 1L, "epsilon")))
    // mass reconciliation: removed occurrences = total (3) - 1 keeper
    assert(got.values.map(_._2).sum == 2L)
    // df=2 survives in both docs
    assert(got(3L) == ((2L, 0L, "twice line\nzeta")))
    assert(got(4L) == ((2L, 0L, "twice line\neta")))
    // empty doc untouched
    assert(got(5L) == ((1L, 0L, "")))
    // blank lines occur 3 times corpus-wide but are structure, not
    // boilerplate — exempt from counting and removal
    assert(got(6L) == ((3L, 0L, "a\n\nb")))
    assert(got(7L) == ((3L, 0L, "c\n\nd")))
    assert(got(8L) == ((3L, 0L, "e\n\nf")))
    Caches.releaseScope()
  }

  test("dedup_lines plan: corpus text never shuffles — no Exchange " +
      "below the line-array persist's rewrite projection") {
    import spark.implicits._
    import graft.operators.DedupOps
    val docs = Seq((0L, "x\ny"), (1L, "x\nz"), (2L, "x\nw"))
      .toDF("doc_id", "text")
    val df = DedupOps.dedupLinesFor(docs)
    df.count()
    val p = plan(df)
    // the rewrite kernel is present and the removal side joins by id
    assert(p.contains("drop_positions_sep"), s"kernel missing:\n$p")
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian in plan:\n$p")
    Caches.releaseScope()
  }

  test("sample_softdedup: commonness orders fully-duplicated > " +
      "partially-duplicated > unique; weights invert it; unique text " +
      "keeps weight 1000") {
    import spark.implicits._
    // 10-token docs → 3 distinct 8-token spans each. Docs 1-3 are
    // identical (their first span ALSO opens doc 5, df=4; spans 2-3
    // df=3); doc 4 is unique (commonness 0); doc 5 shares only its
    // opening span (df=4, then unique tail)
    val dupTxt = "a b c d e f g h i j"
    val uniqTxt = "p q r s t u v w x y"
    val mixTxt = "a b c d e f g h zz1 zz2"
    val docs = Seq(
      (1L, dupTxt), (2L, dupTxt), (3L, dupTxt),
      (4L, uniqTxt), (5L, mixTxt)).toDF("doc_id", "text")
    val out = graft.operators.DedupOps.softdedupWeights(docs).collect()
    assert(out.length == 5)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val cOf = (id: Long) => byId(id).getAs[Long]("common_q16")
    val wOf = (id: Long) => byId(id).getAs[Long]("weight_milli")
    assert(out.forall(_.getAs[Long]("n_spans") == 3L))
    // unique doc: zero commonness, full weight, deterministically kept
    assert(cOf(4L) == 0L && wOf(4L) == 1000L)
    assert(byId(4L).getAs[Boolean]("kept"),
      "a weight-1000 doc must always be kept (hash mod 1000 < 1000)")
    // identical copies score identically
    assert(cOf(1L) == cOf(2L) && cOf(2L) == cOf(3L))
    // commonness ordering: full-dup > one-shared-span > unique
    assert(cOf(1L) > cOf(5L) && cOf(5L) > 0L,
      s"commonness must order dup=${cOf(1L)} > mix=${cOf(5L)} > 0")
    // weight inverts commonness
    assert(wOf(1L) < wOf(5L) && wOf(5L) < 1000L)
    // the exact Q16 weight law holds row by row
    assert(out.forall { r =>
      r.getAs[Long]("weight_milli") ==
        (1000L * 65536L) / (65536L + r.getAs[Long]("common_q16"))
    })
    // full-dup commonness = mean(bits(4), bits(3), bits(3)): above
    // log2(3), below log2(4) in Q16
    assert(cOf(1L) > 65536L * 3 / 2 && cOf(1L) < 2L * 65536L,
      s"dup commonness ${cOf(1L)} outside (1.5, 2.0) bits")
    Caches.releaseScope()
  }

  test("sample_softdedup plan: dup-only inner join-back; no " +
      "cartesian; one output sort") {
    val df = run("sample_softdedup")
    df.count()
    val p = plan(df)
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian:\n$p")
    val globalSorts = "Sort \\[[^\\]]*\\], true".r.findAllIn(p).size
    assert(globalSorts <= 1,
      s"only the deterministic output sort may be global:\n$p")
    assert(p.contains("log2_q16"), s"Q16 log kernel missing:\n$p")
    Caches.releaseScope()
  }

  test("decon_report: planted verbatim leak reports 'both', a single " +
      "shared n-gram reports 'exact', untouched eval docs report " +
      "'clean' with zero fills") {
    val dir = Files.createTempDirectory("graft_decon_rep").toString
    def words(tag: String, n: Int = 40): String =
      (0 until n).map(j => s"${tag}w$j").mkString(" ")
    // eval suite: ids 0..24, disjoint vocabularies
    val evals = (0L until 25L).map(i =>
      (i, words(s"e$i"), "en", "eval", 40L))
    val e3 = words("e3")
    val e7head = (0 until 8).map(j => s"e7w$j").mkString(" ")
    val corpus = Seq(
      // verbatim copy of eval 3 → exact AND fuzzy channels fire
      (100L, e3, "en", "web", 40L),
      // exactly ONE 8-gram of eval 7 embedded in filler → exact only
      // (6 shared trigrams of ~72 → jaccard ≈ 0.09, far under τ)
      (101L, words("f101", 16) + " " + e7head + " " + words("g101", 16),
        "en", "web", 40L)) ++
      (102L until 111L).map(i => (i, words(s"f$i"), "en", "web", 40L))
    spark.createDataFrame(evals ++ corpus)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("decon_report", dir).collect().map(r =>
      r.getAs[Long]("eval_id") ->
        ((r.getAs[Long]("n_exact_docs"), r.getAs[Long]("n_shared_ngrams"),
          r.getAs[Long]("n_fuzzy_docs"), r.getAs[Double]("max_jaccard"),
          r.getAs[String]("verdict")))).toMap
    assert(rows.size == 25, "every eval doc must report")
    // eval 3: leaked verbatim — 33 shared 8-grams, jaccard 1.0
    assert(rows(3L) == ((1L, 33L, 1L, 1.0, "both")), s"${rows(3L)}")
    // eval 7: one shared 8-gram, no near-dup
    assert(rows(7L) == ((1L, 1L, 0L, 0.0, "exact")), s"${rows(7L)}")
    // everything else is clean with zero fills
    (0L until 25L).filterNot(i => i == 3L || i == 7L).foreach { i =>
      assert(rows(i) == ((0L, 0L, 0L, 0.0, "clean")), s"$i: ${rows(i)}")
    }
    Caches.releaseScope()
  }

  test("quality_calibration: buckets partition the corpus, ppm rates " +
      "replay the integer arithmetic, high-score buckets are more " +
      "positive than low-score buckets") {
    val rows = run("quality_calibration").collect().map(r =>
      (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("pos_rate_ppm")))
    assert(rows.map(_._2).sum == 500, "every doc lands in one bucket")
    rows.foreach { case (b, n, p, ppm) =>
      assert(b >= 0 && b <= 9, s"bucket $b out of range")
      assert(p >= 0 && p <= n, s"bucket $b: $p of $n")
      assert(ppm == p * 1000000L / n, s"bucket $b ppm mismatch")
    }
    // the trained classifier's scores must separate its supervision:
    // pooled positive rate above the score midpoint > pooled rate below
    val (hi, lo) = rows.partition(_._1 >= 5)
    assert(hi.nonEmpty && lo.nonEmpty, "degenerate score distribution")
    val hiRate = hi.map(_._3).sum.toDouble / hi.map(_._2).sum
    val loRate = lo.map(_._3).sum.toDouble / lo.map(_._2).sum
    assert(hiRate > loRate, s"calibration inverted: $hiRate <= $loRate")
    Caches.releaseScope()
  }

  test("text_boilerplate: each line-keep cue fires on its planted line, " +
      "prose survives, and the document reassembles from kept lines " +
      "only") {
    val dir = Files.createTempDirectory("graft_boiler").toString
    val prose1 = "the quick brown fox jumps over the lazy dog"
    val prose2 = "storage engines and the planner share one catalog"
    val docs = Seq(
      // prose + every drop cue, one per line
      (0L, Seq(
        prose1,
        "Home | About | Contact",  // stopword-free nav chrome
        "ok",                      // < 3 words
        "$$ 42 --- 17 %% ##",      // < 50% alphabetic words
        prose2,
        "").mkString("\n"), "en", "s0", 1L),
      // all boilerplate: everything drops, clean_text is ''
      (1L, "Menu | Login\n42 37 99\nclick", "en", "s1", 1L),
      // single prose line, no newline at all
      (2L, prose1, "en", "s2", 1L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = run("text_boilerplate", dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_lines") == 6L)
    assert(r(0L).getAs[Long]("n_kept") == 2L)
    assert(r(0L).getAs[String]("clean_text") == s"$prose1\n$prose2")
    assert(r(1L).getAs[Long]("n_kept") == 0L)
    assert(r(1L).getAs[String]("clean_text") == "")
    assert(r(1L).getAs[Long]("n_chars_clean") == 0L)
    assert(r(2L).getAs[Long]("n_lines") == 1L)
    assert(r(2L).getAs[String]("clean_text") == prose1)
    assert(r(2L).getAs[Double]("kept_frac") == 1.0)
  }

  test("clusterPairs: driver-local union-find == distributed loop (r19 engine parity)") {
    import org.apache.spark.sql.functions._
    // chain (1-2-3-4), clique (10,11,12 all pairs), disjoint pair
    // (20,21), and a bridge merging two cliques late (30..33 + edge)
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L),
      (30L, 31L), (32L, 33L), (31L, 32L))
    val pairs = spark.createDataFrame(edges).toDF("i", "j")
    val loc = operators.DedupOps.clusterPairsLocal(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = operators.DedupOps.clusterPairsDistributed(pairs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(loc == dist)
    assert(loc(4L) == 1L && loc(12L) == 10L && loc(21L) == 20L && loc(33L) == 30L)
    graft.Caches.releaseScope()
  }
}
