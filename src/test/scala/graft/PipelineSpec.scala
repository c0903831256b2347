package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic + plan-shape checks for the G-series pipeline ops and the
  * D6 duplicate-clustering pass.
  */
class PipelineSpec extends SparkSpec {

  test("sample_prototypes: planted far-from-prototype outliers are kept, " +
      "tight cluster cores are pruned, and a warm run retrains nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_proto").toString
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(2, 64)(rnd.nextGaussian())
    // 480 EASY vectors: two tight clusters (tiny noise -> pcos ~ 1)
    val easy = (0 until 480).map { i =>
      (i.toLong, unit(centers(i % 2).map(_ + 0.05 * rnd.nextGaussian())),
        i % 2)
    }
    // 32 HARD vectors: random directions, far from every prototype
    val hard = (0 until 32).map { i =>
      (480L + i, unit(Array.fill(64)(rnd.nextGaussian())), 99)
    }
    spark.createDataFrame(easy ++ hard)
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val r = run("sample_prototypes", dir).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Boolean]("kept"), x.getAs[Double]("pcos"))).toMap
    assert(r.size == 512)
    // the planted outliers survive the prune — all but the few k-means
    // ADAPTS to (a lone outlier captured as a cell's only member
    // becomes its own prototype at pcos = 1, the known k-means outlier
    // behavior; the metric is still "distance to the LEARNED
    // prototypes", so those self-prototypes score easy by definition)
    val keptOutliers = (480L until 512L).count(i => r(i)._1)
    assert(keptOutliers >= 24, s"only $keptOutliers/32 outliers kept")
    // the keep budget holds (all-or-nothing at bin granularity only
    // ever UNDER-fills)
    val kept = r.values.count(_._1)
    assert(kept <= 512 * operators.PipelineOps.PROTO_KEEP_PCT / 100 + 1,
      s"kept $kept")
    // selection is by prototypicality: every kept pcos <= every
    // dropped pcos (+ one bin of slack)
    val maxKept = r.values.filter(_._1).map(_._2).max
    val minDrop = r.values.filterNot(_._1).map(_._2).min
    assert(maxKept <= minDrop + 8192 / 1e6, s"$maxKept vs $minDrop")
    // warm re-invocation consumes the memoized CentroidIndex artifact
    val before = operators.CentroidIndex.trainRuns.get()
    assert(run("sample_prototypes", dir).count() == 512)
    assert(operators.CentroidIndex.trainRuns.get() == before,
      "warm sample_prototypes retrained the coarse quantizer")
  }

  test("sample_budget: kept token mass clears the 40% budget by less " +
      "than one bin, selection is score-monotone, every doc verdicted") {
    val rows = run("sample_budget").collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("score_micros"), r.getAs[Long]("bin"),
        r.getAs[Boolean]("kept")))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "every doc must carry a verdict")
    val total = rows.map(_._2).sum
    val kept = rows.filter(_._5)
    val keptMass = kept.map(_._2).sum
    // the budget is a floor: kept mass clears 40% of the corpus tokens
    assert(keptMass * 100 >= total * operators.PipelineOps.BUDGET_PCT,
      s"$keptMass of $total")
    // ... by less than one bin: dropping the threshold bin (the largest
    // kept bin — bins ascend as scores descend) goes under budget
    val tBin = kept.map(_._4).max
    val underMass = kept.filter(_._4 < tBin).map(_._2).sum
    assert(underMass * 100 < total * operators.PipelineOps.BUDGET_PCT,
      "threshold bin is not the marginal one")
    // monotone in the learned score: every kept doc scores at least as
    // high as every dropped doc, up to the 4096-micro bin granularity
    val minKept = kept.map(_._3).min
    val maxDrop = rows.filterNot(_._5).map(_._3).max
    assert(minKept >= maxDrop - 4096, s"$minKept vs $maxDrop")
  }

  test("doc_pack_semantic: per-cell manifests replay the sequential " +
      "per-cluster concat exactly (multi-block corpus)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psem").toString
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val centers = Array.fill(4, 64)(rnd.nextGaussian())
    val n = 2500 // doc_id reaches blk = 2: the per-(cell, blk) path runs
    val emb = (0 until n).map(i =>
      (i.toLong, unit(centers(i % 4).map(_ + 0.2 * rnd.nextGaussian())),
        i % 4))
    spark.createDataFrame(emb).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val docs = (0 until n).map { i =>
      val words = Array.fill(5 + rnd.nextInt(120))("w").mkString(" ")
      (i.toLong, words, "en", s"s${i % 3}", words.length.toLong)
    }
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = run("doc_pack_semantic", dir).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("n_tokens"),
        r.getAs[Long]("seq_idx") * operators.PipelineOps.SEQ_TOKENS
          + r.getAs[Long]("offset_in_seq"),
        r.getAs[Long]("n_seqs_spanned"), r.getAs[Boolean]("is_split")))
    assert(out.length == n)
    val S = operators.PipelineOps.SEQ_TOKENS
    out.groupBy(_._2).foreach { case (cell, rows) =>
      // per-cell sequential replay: starts are the running (nt = tokens
      // + EOS) sum in doc_id order, from zero
      var cum = 0L
      rows.sortBy(_._1).foreach {
        case (id, _, nTok, start, spanned, split) =>
          assert(start == cum, s"cell $cell doc $id: start $start != $cum")
          val nt = nTok + 1
          assert(spanned == (cum + nt - 1) / S - cum / S + 1)
          assert(split == ((cum + nt - 1) / S != cum / S))
          cum += nt
      }
    }
    // the multi-block path actually engaged
    assert(out.map(_._1).max / operators.PipelineOps.PACK_BLOCK >= 2)
  }

  test("join_asof: every purchase attributed to the latest prior click") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts"), r.getAs[String]("event_type")))
    val clicks = e.filter(_._4 == "click")
    val out = run("join_asof").collect()
    val purchases = e.filter(_._4 == "purchase")
    assert(out.length == purchases.length, "one output row per purchase")
    out.foreach { r =>
      val (eid, uid) = (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"))
      val pts = purchases.find(_._1 == eid).get._3
      val prior = clicks.filter(c => c._2 == uid && !c._3.after(pts))
      val got = Option(r.getAs[java.lang.Long]("last_click_id"))
      if (prior.isEmpty) assert(got.isEmpty, s"purchase $eid: expected NULL")
      else {
        val bestTs = prior.map(_._3.getTime).max
        val best = prior.filter(_._3.getTime == bestTs).map(_._1).max
        assert(got.contains(best), s"purchase $eid: $got != $best")
      }
    }
  }

  test("join_asof plan: one window pass, no inequality join") {
    val p = plan(run("join_asof"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "as-of must not plan a range join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "expected the union+window shape")
  }

  test("join_range: follow counts match brute force on sf0.001") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts").getTime, r.getAs[String]("event_type")))
    val out = run("join_range").collect()
    val signups = e.filter(_._4 == "signup")
    assert(out.length == signups.length)
    val byId = out.map(r => r.getAs[Long]("signup_id") ->
      r.getAs[Long]("n_follow")).toMap
    signups.foreach { case (sid, uid, t0, _) =>
      val expected = e.count(f =>
        f._2 == uid && f._3 > t0 && f._3 <= t0 + 24L * 3600 * 1000)
      assert(byId(sid) == expected, s"signup $sid: ${byId(sid)} != $expected")
    }
  }

  test("join_range: compound bucketing bounds heavy-user fanout; join keys on (user, bucket)") {
    import spark.implicits._
    val W = operators.PipelineOps.RANGE_BUCKET_SECONDS
    // planted corpus: bot user 7 = 60 daily signups + 3000 events spread
    // over the same 60 days (the per-user skew bomb); user 8 normal;
    // user 9 = one zero-activity signup
    val base = 1700000000L
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val days = 60
    val plant: Seq[(Long, Long, Timestamp, String, Double)] =
      (0 until days).map(d =>
        (1000L + d, 7L, t(base + d * 86400L + 1000), "signup", 0.0)) ++
      (0 until days * 50).map(i =>
        (10000L + i, 7L, t(base + i * 1728L), "click", 1.0)) ++
      Seq((50L, 8L, t(base + 500), "signup", 0.0),
        (51L, 8L, t(base + 600), "click", 2.5),
        (52L, 8L, t(base + 90 * 86400L), "click", 4.0),
        (60L, 9L, t(base + 120 * 86400L), "signup", 0.0))
    val tmp = java.nio.file.Files.createTempDirectory("jrheavy").toString
    plant.toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")

    // exact parity against in-memory brute force (incl. the bucket-
    // boundary case: a signup exactly 24h after the previous one is
    // inside its inclusive window end)
    val out = run("join_range", tmp).collect()
      .map(r => (r.getAs[Long]("signup_id"), r.getAs[Long]("n_follow"),
        r.getAs[Double]("follow_value"))).toSeq.sortBy(_._1)
    val expected = plant.filter(_._4 == "signup").map { case (sid, uid, t0, _, _) =>
      val in = plant.filter(f => f._2 == uid &&
        f._3.getTime > t0.getTime && f._3.getTime <= t0.getTime + 86400000L)
      (sid, in.size.toLong, in.map(_._5).sum)
    }.sortBy(_._1)
    assert(out == expected, "bucketed range join != brute force on planted corpus")

    // the scale contract: candidate pairs are bounded by per-bucket
    // occupancy, not per-user volume — ≥10x below the single-key join
    val ev = Tables.events(spark, tmp)
    val su = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("t0"))
      .withColumn("bkt", explode(array_distinct(array(
        expr(s"cast(t0 as long) div $W"),
        expr(s"(cast(t0 as long) + $W) div $W")))))
      .groupBy("user_id", "bkt").agg(count(lit(1)).as("s_cnt"))
    val fo = ev.groupBy(col("user_id").as("u"),
        expr(s"cast(ts as long) div $W").as("bkt"))
      .agg(count(lit(1)).as("e_cnt"))
    val bucketedPairs = su.join(fo,
        su("user_id") === fo("u") && su("bkt") === fo("bkt"))
      .agg(sum(col("s_cnt") * col("e_cnt"))).collect().head.getLong(0)
    val perUser = plant.groupBy(_._2).map { case (_, rows) =>
      rows.count(_._4 == "signup").toLong * rows.size }
    val naivePairs = perUser.sum
    assert(bucketedPairs * 10 <= naivePairs,
      s"bucketing must cut candidates >=10x: $bucketedPairs vs $naivePairs")

    // plan shape: the hash join keys on the compound (user, bucket) key
    val df = run("join_range", tmp)
    df.collect()
    val joinLine = plan(df).linesIterator
      .find(l => l.contains("Join") && l.contains("user_id")).getOrElse("")
    assert(joinLine.contains("bkt"),
      s"range join must key on the time bucket, got: $joinLine")
  }

  test("reliable-checkpoint mode: iterative + multi-consumer ops unchanged") {
    // graft.checkpoint.reliable=true routes every Checkpoints.checkpoint
    // call through reliable checkpoint() (cluster deployments, where an
    // executor loss invalidates localCheckpoint blocks) — results must
    // be identical in both modes
    val clustersLocal = run("dedup_clusters").collect().map(_.toSeq).toSeq
    val q22Local = run("q22_percentile").collect().map(_.toSeq).toSeq
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try {
      assert(run("dedup_clusters").collect().map(_.toSeq).toSeq == clustersLocal,
        "dedup_clusters diverges under reliable checkpointing")
      assert(run("q22_percentile").collect().map(_.toSeq).toSeq == q22Local,
        "q22_percentile diverges under reliable checkpointing")
    } finally spark.conf.unset(Checkpoints.ReliableKey)
  }

  test("sample_stratified: deterministic, k per stratum, subset of stratum") {
    val docs = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        r.getAs[Long]("count")).toMap
    val s1 = run("sample_stratified").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("rk")))
    val s2 = run("sample_stratified").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("rk")))
    assert(s1.toSeq == s2.toSeq, "sampling must be run-to-run deterministic")
    s1.groupBy(t => (t._1, t._2)).foreach { case (stratum, rows) =>
      assert(rows.length == math.min(3L, docs(stratum)),
        s"stratum $stratum: ${rows.length} rows for ${docs(stratum)} docs")
    }
  }

  test("quality_filter: verdict is the first failing rule") {
    val out = run("quality_filter").collect()
    assert(out.length == 500, "one verdict row per document")
    val verdicts = out.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.contains("keep"), "sf0.001 corpus must keep some docs")
    out.foreach(r =>
      assert(r.getAs[Boolean]("kept") == (r.getAs[String]("verdict") == "keep")))
  }

  test("events_retention: offset-0 cell covers every cohort user") {
    val out = run("events_retention").collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("day_offset"), r.getAs[Long]("n_users")))
    assert(out.nonEmpty)
    assert(out.forall(_._2 >= 0), "offsets are non-negative by construction")
    // every user is active on their own cohort day, so summing the
    // offset-0 cells recovers the distinct-user count
    val users = Tables.events(spark, sf).select(col("user_id"))
      .distinct().count()
    assert(out.filter(_._2 == 0L).map(_._3).sum == users)
  }

  test("events_funnel: monotone stage counts, stages strictly ordered") {
    val r = run("events_funnel").collect().head
    val (s, c, p) = (r.getAs[Long]("n_signup"), r.getAs[Long]("n_click_after"),
      r.getAs[Long]("n_purchase_after"))
    assert(s >= c && c >= p, s"funnel must narrow: $s >= $c >= $p")
    assert(s > 0, "sf0.001 has signups")
  }

  test("curation_report: funnel chains, each planted failure drops at its stage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val good = "the cat and the dog sat in a house of many rooms with " +
      "a door and a window and a roof to keep the rain out today"
    val docs =
      // 30 quality-passing docs on one dominant domain (cap 6 of the
      // dedup survivors), each unique
      (0L until 30L).map(i => (i, good + s" extra$i", "en", "big.com", 0L)) ++
        Seq(
          (40L, "too short", "en", "x.org", 0L),          // quality drop
          (41L, good + " extra1", "en", "x.org", 0L),     // exact dup of 1
          (42L, good + " solo", "en", "solo.net", 0L))    // survives all
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("curation_report", dir).collect()
      .map(r => r.getAs[String]("stage") -> r).toMap
    assert(rows.keySet ==
      Set("1_raw", "2_quality", "3_exact_dedup", "4_domain_cap"))
    def out(st: String) = rows(st).getAs[Long]("docs_out")
    def in(st: String) = rows(st).getAs[Long]("docs_in")
    assert(in("1_raw") == 33L && out("1_raw") == 33L)
    assert(out("2_quality") == 32L, "only the too-short doc fails the gate")
    assert(out("3_exact_dedup") == 31L, "doc 41 collapses onto doc 1")
    // dedup survivors per source: big.com 30, solo.net 1 → caps 6 + 1
    assert(out("4_domain_cap") == 7L, "sqrt caps over the survivor set")
    // the funnel CHAINS: each stage's docs_in is the previous docs_out
    assert(in("2_quality") == out("1_raw"))
    assert(in("3_exact_dedup") == out("2_quality"))
    assert(in("4_domain_cap") == out("3_exact_dedup"))
    // token mass never grows down the funnel
    val toks = Seq("1_raw", "2_quality", "3_exact_dedup", "4_domain_cap")
      .map(st => rows(st).getAs[Long]("tokens_out"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
  }

  test("mixture_plan_temp: temperature flattens a skewed mixture, tail upsampled") {
    val dir = java.nio.file.Files.createTempDirectory("graft_temp").toString
    val long = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = (0L until 50L).map(i => (i, long, "en", "big.com", 0L)) :+
      ((50L, "just five short tokens here", "en", "tiny.org", 0L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("mixture_plan_temp", dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val (big, tiny) = (rows("big.com"), rows("tiny.org"))
    assert(big.getAs[Long]("weight") ==
      math.floor(math.sqrt(big.getAs[Long]("n_tokens").toDouble)).toLong)
    // temperature share vs proportional share: the tail source's budget
    // fraction must EXCEED its token fraction (that's what T=2 is for)
    val totTok = big.getAs[Long]("n_tokens") + tiny.getAs[Long]("n_tokens")
    val tempShare = tiny.getAs[Long]("target_tokens").toDouble /
      (big.getAs[Long]("target_tokens") + tiny.getAs[Long]("target_tokens"))
    val propShare = tiny.getAs[Long]("n_tokens").toDouble / totTok
    assert(tempShare > 2 * propShare,
      s"temperature must flatten: temp=$tempShare prop=$propShare")
    // flattening means the tail runs >1 epoch — the upsampling warning
    assert(tiny.getAs[Boolean]("is_upsampled"))
    assert(tiny.getAs[Long]("epochs_milli") > 1000L)
    assert(!big.getAs[Boolean]("is_upsampled"))
  }

  test("sample_domain_cap: sqrt caps enforced exactly on a skewed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_domcap").toString
    // 100 docs from a dominant host, 4 from a small one, 1 singleton —
    // caps must be 10 / 2 / 1
    val docs = (0L until 100L).map(i => (i, s"text $i", "en", "big.com", 7L)) ++
      (100L until 104L).map(i => (i, s"text $i", "en", "small.org", 7L)) :+
      ((104L, "text 104", "en", "solo.net", 8L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("sample_domain_cap", dir).collect()
    assert(rows.length == 105, "one verdict row per document")
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    def kept(s: String) = bySrc(s).count(_.getAs[Boolean]("kept"))
    assert(bySrc("big.com").head.getAs[Long]("cap") == 10L)
    assert(kept("big.com") == 10, "dominant domain capped at ceil(sqrt(100))")
    assert(bySrc("small.org").head.getAs[Long]("cap") == 2L)
    assert(kept("small.org") == 2)
    assert(bySrc("solo.net").head.getAs[Long]("cap") == 1L)
    assert(kept("solo.net") == 1)
    // determinism: a second run keeps the identical subset
    val again = run("sample_domain_cap", dir).collect()
      .filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("doc_id")).toSet
    assert(again ==
      rows.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("doc_id")).toSet)
  }

  test("sample_domain_cap plan: bounded-heap threshold, no corpus window sort") {
    val p = plan(run("sample_domain_cap"))
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      "selection must come from the topk_min threshold, not a window rank")
    assert(p.contains("topk_min"), "bounded-heap aggregate expected in plan")
  }

  test("emb_pca: planted dominant direction recovered, scores centered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pca").toString
    val rnd = new scala.util.Random(7)
    // unit-ish direction u; vectors t·u + small isotropic noise — the
    // top PC must align with u and pc1 must recover t (up to sign)
    val u = Array.fill(64)(rnd.nextDouble() * 2 - 1)
    val un = math.sqrt(u.map(x => x * x).sum)
    val rows = (0 until 80).map { k =>
      val t = (k - 40) / 40.0
      val emb = u.map(x => (t * x / un +
        (rnd.nextDouble() * 2 - 1) * 0.03).toFloat)
      (k.toLong, emb, k % 4)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = run("emb_pca", dir).collect()
    assert(out.length == 80)
    val t = (0 until 80).map(k => (k - 40) / 40.0)
    val p = out.sortBy(_.getAs[Long]("vec_id")).map(_.getAs[Double]("pc1"))
    val (mt, mp) = (t.sum / 80, p.sum / 80)
    val cov = t.zip(p).map { case (a, b) => (a - mt) * (b - mp) }.sum
    val corr = cov / math.sqrt(t.map(a => (a - mt) * (a - mt)).sum *
      p.map(b => (b - mp) * (b - mp)).sum)
    assert(math.abs(corr) > 0.995,
      s"pc1 must recover the planted coefficient, |corr|=${math.abs(corr)}")
    // centered scores: the mean projection is ~0 (integer-mean rounding
    // leaves at most half a micro per dim)
    assert(math.abs(mp) < 1e-3, s"scores must be centered, mean=$mp")
    // exact-integer consistency between pc1_q and pc1
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("pc1") -
        r.getAs[Long]("pc1_q").toDouble / 1048576.0 / 1000000.0) < 1e-15)
    }
  }

  test("emb_whiten: two planted directions split across pc1/pc2, z-scores unit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_whiten").toString
    val rnd = new scala.util.Random(11)
    def unit(): Array[Double] = {
      val u = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val n = math.sqrt(u.map(x => x * x).sum)
      u.map(_ / n)
    }
    val u1 = unit()
    // gram-schmidt the second direction against the first
    val raw2 = unit()
    val d12 = raw2.zip(u1).map { case (a, b) => a * b }.sum
    val u2p = raw2.zip(u1).map { case (a, b) => a - d12 * b }
    val n2n = math.sqrt(u2p.map(x => x * x).sum)
    val u2 = u2p.map(_ / n2n)
    val (t1s, t2s) = ((0 until 120).map(_ => rnd.nextDouble() * 2 - 1),
      (0 until 120).map(_ => (rnd.nextDouble() * 2 - 1) * 0.4))
    val rows = (0 until 120).map { k =>
      val emb = (0 until 64).map(i => (t1s(k) * u1(i) + t2s(k) * u2(i) +
        (rnd.nextDouble() * 2 - 1) * 0.01).toFloat).toArray
      (k.toLong, emb, k % 4)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = run("emb_whiten", dir).collect().sortBy(_.getAs[Long]("vec_id"))
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
        b.map(y => (y - mb) * (y - mb)).sum)
    }
    val pc1 = out.map(_.getAs[Double]("pc1")).toSeq
    val pc2 = out.map(_.getAs[Double]("pc2")).toSeq
    assert(math.abs(corr(pc1, t1s.map(identity))) > 0.99,
      "pc1 must recover the dominant planted coefficient")
    assert(math.abs(corr(pc2, t2s.map(identity))) > 0.95,
      "pc2 must recover the deflated second direction")
    assert(math.abs(corr(pc1, pc2)) < 0.15, "components near-orthogonal")
    // whitening: z-scores carry ~unit sample variance per component
    Seq("z1", "z2").foreach { zc =>
      val z = out.map(_.getAs[Double](zc))
      val mz = z.sum / z.length
      val vz = z.map(x => (x - mz) * (x - mz)).sum / z.length
      assert(vz > 0.7 && vz < 1.3, s"$zc variance $vz must be ~1")
    }
  }

  test("emb_centroids: 64 dims per label, centroid = mean of quantized values") {
    val out = run("emb_centroids").collect()
    val dims = out.groupBy(_.getAs[Long]("label")).view.mapValues(_.length)
    assert(dims.values.forall(_ == 64), s"expected 64 dims/label: $dims")
    out.foreach { r =>
      val mean = r.getAs[Long]("sum_micros").toDouble /
        r.getAs[Long]("n_vecs") / 1e6
      assert(math.abs(r.getAs[Double]("centroid") - mean) < 1e-12)
      assert(math.abs(r.getAs[Double]("centroid")) <= 1.0)
    }
  }

  test("emb_quantize: int8 reconstruction error bounded by half a quantization step") {
    run("emb_quantize").collect().foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(scale > 0)
      // symmetric rounding: per-dim error ≤ scale/2, plus the 1e-6
      // micros-quantization slack on the reported mean
      assert(r.getAs[Double]("mean_abs_err") <= scale / 2 + 1e-6,
        s"vec ${r.getAs[Long]("vec_id")}: err > scale/2")
      assert(r.getAs[Long]("n_dims") == 64L)
    }
  }

  test("text_doc_freq: df bounded by corpus size, common words on top") {
    val out = run("text_doc_freq").collect()
    assert(out.length == 20)
    val n = out.head.getAs[Long]("n_docs")
    assert(out.forall(r => r.getAs[Long]("df") <= n))
    val dfs = out.map(_.getAs[Long]("df")).toSeq
    assert(dfs == dfs.sorted.reverse, "must be sorted by df desc")
  }

  test("dedup_clusters: transitive closure over minhash pairs, min-id labels") {
    val dir = miniClusterDir
    val pairs = run("dedup_minhash_lsh", dir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")))
    assert(pairs.nonEmpty, "mini corpus must produce dup pairs")
    // brute-force union-find over the pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> find(v)).toMap
    val got = run("dedup_clusters", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == expected, s"$got != $expected")
  }

  test("sample_weighted: k per stratum, heap-aggregate plan, long-doc bias") {
    val df = run("sample_weighted")
    val rows = df.collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.length <= 20, s"$lang oversampled: ${rs.length}")
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to rs.length),
        s"$lang ranks not contiguous")
    }
    // bounded-heap aggregate, not a per-stratum window sort
    val p = plan(df)
    assert(p.contains("topk_min"), "must use the bounded-heap aggregate")
    assert(!p.contains("Window"), "weighted sampling must not window-sort")
    // the hash/weight priority key biases selection toward heavy docs:
    // on the fixed corpus the sampled mean weight exceeds the corpus mean
    val sampleMean =
      rows.map(_.getAs[Long]("weight")).sum.toDouble / rows.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"no weight bias: sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("events_anomaly: a planted volume spike is flagged, normal days are not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    // 29 days of 10 clicks, one day of 500: only the spike is > 3 sigma
    val rows = (0 until 30).flatMap { day =>
      val n = if (day == 15) 500 else 10
      (0 until n).map(i => (day * 1000L + i,
        Timestamp.valueOf(f"2026-03-${day + 1}%02d 12:00:00"),
        i.toLong % 7, "click", 1.0, "{}"))
    }
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = run("events_anomaly", dir).collect()
    assert(got.length == 30)
    val flagged = got.filter(_.getAs[Boolean]("is_anomaly"))
      .map(_.getAs[java.sql.Date]("day").toString).toSeq
    assert(flagged == Seq("2026-03-16"), s"flags: $flagged")
  }

  test("events_anomaly: integer flag equals the floating-point 3-sigma rule") {
    val got = run("events_anomaly").collect()
    got.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val cs = rs.map(_.getAs[Long]("cnt").toDouble)
      val n = cs.length
      val mu = cs.sum / n
      val sd = math.sqrt(cs.map(c => (c - mu) * (c - mu)).sum / (n - 1))
      rs.foreach { r =>
        val c = r.getAs[Long]("cnt").toDouble
        val expect = n > 1 && (c - mu) * (c - mu) > 9 * sd * sd
        assert(r.getAs[Boolean]("is_anomaly") == expect,
          s"$et day ${r.getAs[java.sql.Date]("day")}: cnt=$c mu=$mu sd=$sd")
      }
    }
  }

  test("dedup_clusters: long chain collapses to one cluster (pointer jumping)") {
    // sliding 20-word windows with stride 5: consecutive docs share
    // ~0.57 jaccard (> tau), two-apart ~0.29 (< tau) -> the dup graph is
    // a CHAIN of diameter 7, so the transitive label must cross hops
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toString
    val vocab = (0 until 60).map(i => s"w${i}word")
    val docs = (0L until 8L).map { k =>
      val text = vocab.slice(5 * k.toInt, 5 * k.toInt + 20).mkString(" ")
      (k, text, "en", s"src$k", text.length.toLong)
    }
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = run("dedup_minhash_lsh", dir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"))).toSet
    assert((0L until 7L).forall(k => pairs.contains((k, k + 1))),
      s"chain links missing: $pairs")
    assert(!pairs.contains((0L, 7L)), "distant docs must not pair directly")
    val got = run("dedup_clusters", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == (0L until 8L).map(_ -> 0L).toMap,
      s"chain must collapse to cluster 0: $got")
  }

  test("emb_outliers: a planted far vector is flagged, the tight cluster is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_outl").toString
    val rnd = new scala.util.Random(7)
    // 40 vectors tightly around a direction + one far-off, same label
    def near(): Array[Float] = Array.tabulate(64)(i =>
      (if (i == 0) 1.0 else 0.0).toFloat + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    val far = Array.tabulate(64)(i => if (i == 7) 5.0f else 0.0f)
    val rows = (0 until 40).map(i => (i.toLong, near(), 0)) :+ (99L, far, 0)
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = run("emb_outliers", dir).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Boolean]("is_outlier")).toMap
    assert(r(99L), "the far vector must flag")
    assert((0 until 40).forall(i => !r(i.toLong)),
      s"tight-cluster vectors must not flag: ${r.filter(_._2)}")
  }

  test("mixture_plan: budgets honor the weights, epochs flag small sources") {
    val r = run("mixture_plan").collect()
    assert(r.length == 20)
    val tot = r.map(_.getAs[Long]("n_tokens")).sum
    val totW = r.map(_.getAs[Long]("weight")).sum
    r.foreach { x =>
      val (nt, w) = (x.getAs[Long]("n_tokens"), x.getAs[Long]("weight"))
      assert(w >= 1 && w <= 9)
      assert(x.getAs[Long]("target_tokens") == tot * w / totW)
      val em = x.getAs[Long]("epochs_milli")
      val target = x.getAs[Long]("target_tokens")
      assert(em == (target / nt) * 1000 + target % nt * 1000 / nt)
      assert(x.getAs[Boolean]("is_upsampled") == (em > 1000))
    }
    // budgets can never exceed the declared total (integer floor)
    assert(r.map(_.getAs[Long]("target_tokens")).sum <= tot)
    // the mixture is non-trivial: at least one source up- and one down-sampled
    assert(r.exists(_.getAs[Boolean]("is_upsampled")) &&
      r.exists(!_.getAs[Boolean]("is_upsampled")))
  }

  test("sample_mixture: selected token mass lands within one document of " +
      "each source's budget; saturated sources select everything") {
    val plan = run("mixture_plan").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("target_tokens"), r.getAs[Long]("n_tokens"))).toMap
    val sel = run("sample_mixture").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("nt"),
        r.getAs[Boolean]("kept")))
    sel.groupBy(_._1).foreach { case (src, rows) =>
      val (target, total) = plan(src)
      val selected = rows.collect { case (_, nt, true) => nt }.sum
      val maxDoc = rows.map(_._2).max
      if (target >= total)
        assert(selected == total, s"$src: saturated source must keep all")
      else
        assert(target <= selected && selected < target + maxDoc,
          s"$src: selected $selected vs target $target (maxDoc $maxDoc)")
    }
    // the budgets genuinely bite somewhere (not all sources saturate)
    assert(plan.exists { case (_, (t, n)) => t < n },
      "at least one source must be under-sampled for the bound to mean anything")
  }

  test("events_quantiles: boundary-bucket picks equal the global-sort " +
      "answer on planted ranks, ties, and single-bucket groups") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_quant").toString
    val ts = Timestamp.valueOf("2026-01-01 10:00:00")
    // type a: values 1..100 (known rank arithmetic: p50 -> rank 49 ->
    // value 50.0); type b: ALL TIES (every quantile = the tied value,
    // exercised entirely inside one bucket); type c: two values
    // straddling a bucket edge
    val rows =
      (1 to 100).map(i => (i.toLong, ts, 7L, "a", i.toDouble, "{}")) ++
      (1 to 10).map(i => (100L + i, ts, 7L, "b", 3.5, "{}")) ++
      Seq((200L, ts, 7L, "c", 0.0009, "{}"), (201L, ts, 7L, "c", 0.0011, "{}"))
    spark.createDataFrame(rows.toSeq)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = run("events_quantiles", dir).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_events"), x.getAs[Double]("p50"),
          x.getAs[Double]("p90"), x.getAs[Double]("p99"))).toMap
    // rank floor(q·(n−1)): n=100 → p50 idx 49 → value 50; p90 idx 89 →
    // 90; p99 idx 98 → 99
    assert(r("a") == ((100L, 50.0, 90.0, 99.0)), s"type a: ${r("a")}")
    assert(r("b") == ((10L, 3.5, 3.5, 3.5)), s"all-ties: ${r("b")}")
    // n=2: p50 idx 0 → smaller value; p90/p99 idx 0 too
    assert(r("c") == ((2L, 0.0009, 0.0009, 0.0009)), s"edge: ${r("c")}")
  }

  test("curation_fate: per-doc fates reconcile exactly with " +
      "curation_report's stage deltas") {
    val report = run("curation_report").collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out"))).toMap
    val fates = run("curation_fate").collect()
      .groupBy(_.getAs[String]("fate")).view.mapValues(_.length.toLong).toMap
    assert(fates.getOrElse("2_quality", 0L) ==
      report("2_quality")._1 - report("2_quality")._2)
    assert(fates.getOrElse("3_exact_dedup", 0L) ==
      report("3_exact_dedup")._1 - report("3_exact_dedup")._2)
    assert(fates.getOrElse("4_domain_cap", 0L) ==
      report("4_domain_cap")._1 - report("4_domain_cap")._2)
    assert(fates.getOrElse("kept", 0L) == report("4_domain_cap")._2)
    assert(fates.values.sum == report("1_raw")._1, "every doc has one fate")
  }

  test("doc_pack: distributed prefix sum equals the sequential concat scan") {
    val r = run("doc_pack").collect().sortBy(_.getAs[Long]("doc_id"))
    assert(r.length == 500)
    // replay the packing sequentially from the op's own token counts
    var cum = 0L
    r.foreach { x =>
      val nt = x.getAs[Long]("n_tokens") + 1 // + EOS
      val (start, end) = (cum, cum + nt - 1)
      assert(x.getAs[Long]("seq_idx") == start / 512,
        s"doc ${x.getAs[Long]("doc_id")}: seq_idx")
      assert(x.getAs[Long]("offset_in_seq") == start % 512)
      assert(x.getAs[Long]("n_seqs_spanned") == end / 512 - start / 512 + 1)
      assert(x.getAs[Boolean]("is_split") == (end / 512 != start / 512))
      cum += nt
    }
    // packing is gapless: total sequences cover exactly the token stream
    val lastEnd = cum - 1
    val maxSeq = r.map(x =>
      x.getAs[Long]("seq_idx") + x.getAs[Long]("n_seqs_spanned") - 1).max
    assert(maxSeq == lastEnd / 512, "last doc must land in the last sequence")
  }

  test("doc_pack_emit: span stream reconciles exactly with the " +
      "doc_pack_bpe manifest and tiles every sequence") {
    val manifest = run("doc_pack_bpe").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("seq_idx"),
          x.getAs[Long]("offset_in_seq"), x.getAs[Long]("n_seqs_spanned")))
      .toMap
    val spans = run("doc_pack_emit").collect()
      .map(x => (x.getAs[Long]("seq_idx"), x.getAs[Long]("offset_in_seq"),
        x.getAs[Long]("doc_id"), x.getAs[Long]("tok_start"),
        x.getAs[Long]("tok_len")))
    assert(spans.nonEmpty && spans.forall(_._5 > 0), "no empty spans")
    // per doc: spans cover [0, nt) contiguously, count and first
    // placement match the manifest row exactly
    spans.groupBy(_._3).foreach { case (docId, ss) =>
      val (nTok, seqIdx, off, nSpanned) = manifest(docId)
      val sorted = ss.sortBy(_._4)
      assert(sorted.length == nSpanned, s"doc $docId: span count")
      assert(sorted.head._1 == seqIdx && sorted.head._2 == off &&
        sorted.head._4 == 0L, s"doc $docId: first span placement")
      var cum = 0L
      sorted.foreach { sp => assert(sp._4 == cum); cum += sp._5 }
      assert(cum == nTok + 1, s"doc $docId: spans must cover nt incl EOS")
      // consecutive spans land in consecutive sequences at offset 0
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1)._1 == w(0)._1 + 1 && w(1)._2 == 0L)
      }
    }
    // per sequence: spans tile [0, SEQ_TOKENS) exactly (last may stop
    // short at the corpus' end)
    val maxSeq = spans.map(_._1).max
    spans.groupBy(_._1).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._2)
      var pos = 0L
      sorted.foreach { sp => assert(sp._2 == pos, s"seq $seq gap"); pos += sp._5 }
      if (seq < maxSeq) assert(pos == 512L, s"seq $seq: filled $pos")
      else assert(pos <= 512L)
    }
    // gapless: every sequence index up to the last exists
    assert(spans.map(_._1).distinct.length == maxSeq + 1)
  }

  test("graph_pagerank: teleport floor, mass bound, inlink monotonicity, " +
      "determinism") {
    val rows = run("graph_pagerank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("in_deg"),
        r.getAs[Long]("rank_micros")))
    val n = rows.length
    assert(n >= 100, "corpus-sized node set")
    // a node nobody links to earns exactly the teleport mass; any inlink
    // adds a strictly positive share (every rank >= 150000 -> every
    // per-edge floor-share >= 37500 > 0)
    rows.foreach { case (id, deg, rank) =>
      if (deg == 0L) assert(rank == 150000L, s"doc $id: sink rank $rank")
      else assert(rank > 150000L, s"doc $id: linked rank $rank")
    }
    // total mass stays within the teleport/full bounds (truncating
    // division only ever leaks mass downward)
    val total = rows.map(_._3).sum
    assert(total <= n * 1000000L && total >= n * 150000L,
      s"mass $total out of bounds for $n nodes")
    // ranks genuinely spread (the hash graph is not regular)
    assert(rows.map(_._3).distinct.length > n / 2, "rank spread")
    val again = run("graph_pagerank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("in_deg"),
        r.getAs[Long]("rank_micros")))
    assert(rows.toSeq == again.toSeq, "integer PageRank must be exact")
  }

  test("graph_pagerank: iterative joins stay id-width — no cartesian, " +
      "edges materialized once") {
    val df = run("graph_pagerank")
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "no all-pairs fallback")
    assert(p.contains("InMemoryTableScan"),
      "the edge frame must persist across the K round joins")
  }

  /** Corpus with a dup CHAIN (0~1, 1~2 strongly; 0~2 weaker) so clustering
    * exercises a real transitive step, plus an unrelated pair.
    */
  lazy val miniClusterDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc").toString
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val b = a + " phi chi"
    val c = b + " psi omega"
    val u = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val docs = Seq(
      (0L, a, "en", "src0", a.length.toLong),
      (1L, b, "en", "src1", b.length.toLong),
      (2L, c, "en", "src2", c.length.toLong),
      (3L, u, "en", "src3", u.length.toLong),
      (4L, u + " seventeen", "en", "src4", u.length + 10L),
      (5L, "totally unrelated text about distributed query planning",
        "en", "src5", 55L))
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("events_heavy_hitters: exact under 100k-key tail with capacity-128 " +
      "sketch; hot keys survive every partitioning") {
    import spark.implicits._
    def t(s: Long) = new Timestamp(s * 1000L)
    // 3 hot keys (3000/2000/1000 events of n≈106k — all > n/128 ≈ 829)
    // + 100k singleton tail keys that overflow the 128-entry sketch
    // thousands of times over; planted interleaved so decrements hit
    // every counter
    val hot = Seq((1L, 3000), (2L, 2000), (3L, 1000)).flatMap {
      case (k, c) => (0 until c).map(i => (k * 1000000L + i, k, t(i), "click", 1.0))
    }
    val tail = (0 until 100000).map(i =>
      (9000000L + i, 100L + i, t(i), "view", 0.5))
    val tmp = java.nio.file.Files.createTempDirectory("ghh").toString
    (hot ++ tail).toDF("event_id", "user_id", "ts", "event_type", "value")
      .repartition(8) // interleave hot + tail across tasks
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = run("events_heavy_hitters", tmp).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_total"), r.getAs[Long]("share_ppm")))
    val n = 106000L
    assert(out.toSeq == Seq((1L, 3000L, n, 3000L * 1000000L / n),
      (2L, 2000L, n, 2000L * 1000000L / n),
      (3L, 1000L, n, 1000L * 1000000L / n)),
      s"exact heavy hitters under tail cardinality: ${out.toSeq}")
    // plan shape: the sketch aggregates with map-side partials, the
    // exact pass joins candidates by broadcast — never a full-key
    // aggregate feeding the filter
    val df = run("events_heavy_hitters", tmp)
    df.collect()
    val p = plan(df)
    assert(p.contains("mg_sketch"), "sketch aggregate missing from plan")
    assert(p.contains("BroadcastHashJoin"), "candidate join must broadcast")
  }

  test("mg_sketch: superset guarantee at tiny capacity, single-key " +
      "degenerate, null keys ignored") {
    import spark.implicits._
    // 60 of key 7, 40 of key 8, 100 singletons: n=200, cap=4 → any key
    // with freq > 40 must survive; key 7 qualifies everywhere
    val rows = ((0 until 60).map(_ => 7L) ++ (0 until 40).map(_ => 8L) ++
      (0 until 100).map(i => 1000L + i))
    val shuffled = new scala.util.Random(42).shuffle(rows)
    val got = shuffled.toDF("k").repartition(7)
      .agg(expr("mg_sketch(k, 4)").as("ks"))
      .collect()(0).getSeq[Long](0)
    assert(got.contains(7L), s"freq-0.3 key must survive cap-4 sketch: $got")
    assert(got.size <= 4, s"summary exceeds capacity: $got")
    assert(got == got.sorted, "eval must sort for determinism")
    val single = Seq(5L, 5L, 5L).toDF("k")
      .agg(expr("mg_sketch(k, 1)").as("ks"))
      .collect()(0).getSeq[Long](0)
    assert(single == Seq(5L))
    val withNulls = Seq(Some(9L), None, Some(9L), None).toDF("k")
      .agg(expr("mg_sketch(k, 2)").as("ks"))
      .collect()(0).getSeq[Long](0)
    assert(withNulls == Seq(9L), "nulls must be ignored like SQL aggregates")
  }
  test("pack_shuffle: per-epoch ranks are a dense permutation, shards " +
      "balance within one sequence, epochs genuinely differ, and the " +
      "bucket-composed rank equals the one-window rank") {
    val r = run("pack_shuffle").collect().map(x =>
      (x.getAs[Long]("epoch"), x.getAs[Long]("seq_idx"),
        x.getAs[Long]("rank"), x.getAs[Long]("shard"),
        x.getAs[Long]("pos_in_shard")))
    val byEpoch = r.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    val s0 = byEpoch(0L)
    val nSeqs = s0.length.toLong
    val sps = (nSeqs + 7) / 8
    byEpoch.values.foreach { rows =>
      // dense permutation: ranks are exactly 0..S-1, each seq once
      assert(rows.map(_._3).sorted.toSeq == (0L until nSeqs).toSeq)
      assert(rows.map(_._2).distinct.length == nSeqs.toInt)
      // shard arithmetic rides the rank exactly
      rows.foreach { case (_, _, rk, sh, pos) =>
        assert(sh == rk / sps && pos == rk % sps)
      }
      // balance: shard sizes differ by at most one sequence
      val sizes = rows.groupBy(_._4).values.map(_.length).toSeq
      assert(sizes.max - sizes.min <= 1,
        s"shards must balance within one sequence: $sizes")
    }
    // the two epochs order the same sequence set DIFFERENTLY — the
    // point of an epoch-seeded shuffle
    val ord0 = byEpoch(0L).sortBy(_._3).map(_._2).toSeq
    val ord1 = byEpoch(1L).sortBy(_._3).map(_._2).toSeq
    assert(ord0.toSet == ord1.toSet && ord0 != ord1)
    // the bucket-composed rank must equal the oracle's single-window
    // rank: replay order by (hash, seq_idx) locally
    def md5hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val h0 = byEpoch(0L).map { case (_, sq, rk, _, _) =>
      (md5hash60(s"shuf0|$sq"), sq) -> rk
    }
    assert(h0.sortBy(_._1).map(_._2).toSeq == (0L until nSeqs).toSeq,
      "composed rank must equal the (h, seq_idx) order rank")
  }

  test("packStarts: the three-level prefix sum equals the sequential " +
      "scan at a block size that forces MULTIPLE superblocks, and no " +
      "window partitions an unbounded frame") {
    import spark.implicits._
    import graft.operators.PipelineOps
    // 100 docs at block=4: 25 blocks, 7 superblocks — every level of
    // the recursion carries real multi-row partitions
    val counts = (0 until 100)
      .map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("doc_id", "nt")
    val got = PipelineOps.packStarts(counts, block = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var acc = 0L
    (0 until 100).foreach { i =>
      assert(got(i.toLong) == acc,
        s"doc $i: start ${got(i.toLong)} != sequential $acc")
      acc += (i % 7 + 1)
    }
    // the board path (default block) still matches the oracle's plain
    // cumsum — doc_pack's CORRECTNESS pin covers it end to end; here
    // assert the three-level plan shape: the only unpartitioned window
    // runs over SUPERBLOCK rows (corpus/block² — bounded), every other
    // window is partitioned
    val df = PipelineOps.packStarts(counts, block = 4L)
    df.count()
    val p = plan(df)
    val windows = "Window".r.findAllIn(p).size
    assert(windows >= 3, s"three-level form must plan 3 windows:\n$p")
    Caches.releaseScope()
  }

  test("sample_dsir: target-vocabulary docs outscore and survive; " +
      "keep rate brackets the dial at bin granularity") {
    import spark.implicits._
    import graft.operators.PipelineOps
    // 40 background docs in a generic vocabulary; 4 docs from the
    // DSIR_TARGET sources plus 4 non-target docs that SHARE the target
    // vocabulary — DSIR must promote the look-alikes even though their
    // source tag is not the target (that is the point of importance
    // resampling vs a source filter). 8 target-vocab docs of 48 fit
    // UNDER the 25% keep budget (12), so the whole group survives the
    // all-or-nothing bin threshold.
    val tgtVocab = "genome protein enzyme ribosome chromosome"
    val bgVocab = Seq("alpha beta gamma delta", "epsilon zeta eta theta",
      "iota kappa lambda mu", "nu xi omicron pi")
    val docs = (
      (0 until 40).map(i =>
        (i.toLong, "web", bgVocab(i % 4) + s" filler$i")) ++
      (40 until 44).map(i =>
        (i.toLong, PipelineOps.DSIR_TARGET(i % 2), tgtVocab)) ++
      (44 until 48).map(i => (i.toLong, "web", tgtVocab))
    ).toDF("doc_id", "source", "text")
    val out = PipelineOps.dsirSelect(docs).collect()
    assert(out.length == 48)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // every target-vocab doc (target-tagged or look-alike) must
    // outscore every background doc
    val wOf = (id: Long) => byId(id).getAs[Long]("w_q16")
    val minTgt = (40L until 48L).map(wOf).min
    val maxBg = (0L until 40L).map(wOf).max
    assert(minTgt > maxBg,
      s"target-vocab floor $minTgt must beat background ceiling $maxBg")
    // the whole target-vocab group (tagged AND look-alike) is kept
    assert((40L until 48L).forall(id => byId(id).getAs[Boolean]("kept")),
      "target-vocab docs must be selected")
    // is_target reflects the SOURCE tag, not the verdict
    assert((40L until 44L).forall(id => byId(id).getAs[Boolean]("is_target")))
    assert(!byId(44L).getAs[Boolean]("is_target"))
    // selection is MONOTONE in the weight (the bin threshold can only
    // cut between bins): every kept doc outweighs every dropped doc
    val (keptRows, dropRows) = out.partition(_.getAs[Boolean]("kept"))
    assert(keptRows.map(_.getAs[Long]("w_q16")).min >
      dropRows.map(_.getAs[Long]("w_q16")).max,
      "kept set must be a weight prefix")
    // keep rate brackets the dial at bin granularity: at least the
    // budget's bin-rounded floor, at most the budget (48 − cum(t) ≤ 12)
    assert(keptRows.length >= 8 && keptRows.length <= 12,
      s"kept ${keptRows.length} outside the dial bracket [8, 12]")
    Caches.releaseScope()
  }

  test("sample_rho: the learnable gem (rare in corpus, known to the " +
      "reference) is selected; noise and background are not") {
    import spark.implicits._
    import graft.operators.TextOps
    // all bigrams share the prefix "the", so the self-model MLE prices
    // each continuation by its corpus share. Candidates (odd ids):
    // 38 background docs ("the cat/dog" — common everywhere, excess≈0),
    // one GEM ("the zyx" — rare corpus-wide, well-represented in the
    // reference half → high self bits, low ref bits, max excess), one
    // NOISE doc ("the qqq" — rare corpus-wide AND unknown to the
    // reference → the smoothed ref model prices it high too, excess
    // strongly negative). Reference half (even ids): 34 background +
    // 6 gem-phrase docs.
    val bg = "the cat the dog the cat the dog the cat"
    val gemTxt = "the zyx the zyx the zyx the zyx the zyx"
    val noiseTxt = "the qqq the qqq the qqq the qqq the qqq"
    val gemId = 41L
    val noiseId = 43L
    val docs = (
      (0 until 40).map(i => (i * 2L, bg)).take(34) ++
      (34 until 40).map(i => (i * 2L, gemTxt)) ++
      (0 until 40).map(i => (i * 2L + 1, bg))
        .filterNot(p => p._1 == gemId || p._1 == noiseId) ++
      Seq((gemId, gemTxt), (noiseId, noiseTxt))
    ).toDF("doc_id", "text")
    val out = TextOps.rhoSelect(docs).collect()
    // only the odd (candidate) half is in scope
    assert(out.length == 40)
    assert(out.forall(_.getAs[Long]("doc_id") % 2 == 1),
      "reference-member docs must not compete for selection")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val xOf = (id: Long) => byId(id).getAs[Long]("excess_q16")
    val bgIds = out.map(_.getAs[Long]("doc_id"))
      .filterNot(id => id == gemId || id == noiseId)
    // excess ordering: gem > every background > noise
    assert(bgIds.forall(id => xOf(gemId) > xOf(id)),
      "gem must have the highest excess")
    assert(bgIds.forall(id => xOf(id) > xOf(noiseId)),
      "noise must have the lowest excess")
    // verdicts: the gem's bin is the only one above the 75% cut
    // (background docs are identical → one fat bin at the threshold,
    // dropped all-or-nothing)
    assert(byId(gemId).getAs[Boolean]("kept"), "gem must be selected")
    assert(!byId(noiseId).getAs[Boolean]("kept"), "noise must not be")
    assert(bgIds.forall(id => !byId(id).getAs[Boolean]("kept")),
      "the straddling background bin drops wholesale")
    // monotone prefix: every kept doc outweighs every dropped doc
    val (keptRows, dropRows) = out.partition(_.getAs[Boolean]("kept"))
    assert(keptRows.nonEmpty &&
      keptRows.map(_.getAs[Long]("excess_q16")).min >
        dropRows.map(_.getAs[Long]("excess_q16")).max)
    Caches.releaseScope()
  }

  test("sample_dsir plan: no corpus sort before the verdict; " +
      "score and threshold attach as broadcasts") {
    val df = run("sample_dsir")
    df.count()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "no all-pairs fallback")
    // the only Sort allowed below the final output ordering is none —
    // TakeOrderedAndProject/Sort must appear exactly once (the
    // deterministic output order every oracle query ends with)
    val sorts = "\\bSort \\[doc_id".r.findAllIn(p).size
    assert(sorts <= 1, s"corpus must not sort before the verdict:\n$p")
    Caches.releaseScope()
  }

  test("sample_rho plan: no cartesian, no GLOBAL corpus sort before " +
      "the verdict") {
    val df = run("sample_rho")
    df.count()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "no all-pairs fallback")
    // the doc_id-keyed SMJ sorts are partition-local (global=false);
    // the ONLY global sort is the deterministic output ordering
    val globalSorts = "Sort \\[[^\\]]*\\], true".r.findAllIn(p).size
    assert(globalSorts <= 1,
      s"corpus must not globally sort before the verdict:\n$p")
    Caches.releaseScope()
  }

  /** The planted-domain DoReMi corpus: reference membership is G23's
    * HASH split, so the spec derives the role partition through the
    * engine's own predicate, then plants: 6 reference-member gem docs
    * (domain 'gem' is well-represented in the reference), 1 candidate
    * gem (rare corpus-wide, known to the reference → max excess),
    * 1 candidate noise doc (rare AND unknown → excess clamps to 0),
    * background everywhere else. Returns (docs, nCandidates).
    */
  private def doremiCorpus(): (org.apache.spark.sql.DataFrame, Int) = {
    import spark.implicits._
    val bg = "the cat the dog the cat the dog the cat"
    val gemTxt = "the zyx the zyx the zyx the zyx the zyx"
    val noiseTxt = "the qqq the qqq the qqq the qqq the qqq"
    val isRef = spark.range(80)
      .select(col("id"),
        graft.operators.TextOps.doremiIsRef(col("id")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val refIds = (0L until 80L).filter(isRef)
    val candIds = (0L until 80L).filterNot(isRef)
    assert(refIds.size >= 10 && candIds.size >= 10,
      s"hash split degenerate: ${refIds.size}/${candIds.size}")
    val gemRef = refIds.take(6).toSet
    val gemId = candIds.head
    val noiseId = candIds(1)
    val docs = (0L until 80L).map { id =>
      if (gemRef(id) || id == gemId) (id, gemTxt, "gem")
      else if (id == noiseId) (id, noiseTxt, "noise")
      else (id, bg, "bg")
    }.toDF("doc_id", "text", "source")
    (docs, candIds.size)
  }

  test("mixture_doremi: the unlearned-but-learnable domain gains " +
      "weight; noise clamps to zero excess; smoothing floors every " +
      "domain") {
    import graft.operators.TextOps
    val (docs, nCand) = doremiCorpus()
    val out = TextOps.doremiWeights(docs).collect()
    assert(out.length == 3, "one row per domain")
    val byDom = out.map(r => r.getAs[String]("source") -> r).toMap
    val xOf = (s: String) => byDom(s).getAs[Long]("excess_q16")
    val wOf = (s: String) => byDom(s).getAs[Long]("weight_milli")
    val aOf = (s: String) => byDom(s).getAs[Long]("alpha_ppm")
    // excess ordering and the clamp
    assert(xOf("gem") > xOf("bg"), "gem domain must out-excess bg")
    assert(xOf("noise") == 0L, "noise excess must clamp to zero")
    assert(out.forall(_.getAs[Long]("excess_q16") >= 0L))
    // the MWU concentrates on the gem domain
    assert(wOf("gem") > wOf("bg") && wOf("gem") > wOf("noise"),
      s"gem must carry the top weight: gem=${wOf("gem")} " +
        s"bg=${wOf("bg")} noise=${wOf("noise")}")
    assert(aOf("gem") > TextOps.DOREMI_SCALE / 3,
      "gem alpha must exceed its uniform share")
    // normalization: alphas sum to SCALE within floor-division slack
    val aSum = out.map(_.getAs[Long]("alpha_ppm")).sum
    assert(aSum <= TextOps.DOREMI_SCALE && aSum > TextOps.DOREMI_SCALE - 10,
      s"alpha sum $aSum outside the renormalization band")
    // the paper's uniform smoothing floors every domain at c/nd
    val floor = TextOps.DOREMI_SMOOTH * (TextOps.DOREMI_SCALE / 3) /
      TextOps.DOREMI_SCALE
    assert(out.forall(_.getAs[Long]("weight_milli") >= floor - 1),
      s"every domain must keep the smoothing floor ~$floor")
    // weights are a distribution (milli, floor-division slack)
    val wSum = out.map(_.getAs[Long]("weight_milli")).sum
    assert(wSum <= 1000 && wSum > 985, s"weight sum $wSum not ~1000")
    // candidate-pool discipline: only non-reference docs counted
    assert(out.map(_.getAs[Long]("n_docs")).sum == nCand.toLong)
    Caches.releaseScope()
  }

  test("sample_mixture_doremi: the learned weights actually move " +
      "token mass — the gem domain's kept share beats its corpus " +
      "share; every budget lands within one doc") {
    import spark.implicits._
    import graft.operators.{PipelineOps, TextOps}
    val (docs, _) = doremiCorpus()
    val w = TextOps.doremiWeights(docs)
      .select("source", "weight_milli").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totM = w.values.sum
    val totTokens = 80L * 10L // every doc is 10 whitespace tokens
    val tgtOf = (s: String) => totTokens * w(s) / totM
    val tgt = w.toSeq.map { case (s, wm) => (s, totTokens * wm / totM) }
      .toDF("source", "target_tokens")
    val out = PipelineOps.mixtureSelect(docs, tgt).collect()
    val keptMass = out.filter(_.getAs[Boolean]("kept"))
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("nt")).sum).toMap
      .withDefaultValue(0L)
    val srcMass = Map("gem" -> 70L, "bg" -> 720L, "noise" -> 10L)
    // every budget lands within one document of its target (saturated
    // sources select everything)
    Seq("gem", "bg", "noise").foreach { s =>
      val t = tgtOf(s) min srcMass(s)
      assert(math.abs(keptMass(s) - t) <= 10L,
        s"$s kept ${keptMass(s)} vs target ${tgtOf(s)} (mass ${srcMass(s)})")
    }
    // the DoReMi upweighting is visible in the realized mixture: the
    // gem domain saturates (its learned budget exceeds its mass)
    // while the dominant background is cut far below its corpus share
    assert(keptMass("gem") == 70L,
      s"gem must saturate under its learned budget ${tgtOf("gem")}")
    assert(keptMass("bg") < 720L / 2,
      s"background must be cut below half its mass, kept ${keptMass("bg")}")
    Caches.releaseScope()
  }

  test("mixture_doremi plan: the returned frame is the |domains|-row " +
      "driver fold — no corpus subtree survives into it") {
    val df = run("mixture_doremi")
    df.count()
    val p = plan(df)
    // the MWU rounds fold driver-local on the collected summary; the
    // result plan must be a local relation, not a re-derivation of
    // the LM pipeline (which a plan-expressed round ladder would
    // replicate once per lineage branch)
    assert(p.contains("LocalTableScan") || p.contains("LocalRelation"),
      s"expected a local-relation result plan:\n$p")
    assert(!p.contains("FileScan"),
      s"corpus must not be re-scanned by the result frame:\n$p")
    Caches.releaseScope()
  }
}
