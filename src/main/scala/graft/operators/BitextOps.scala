package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Caches, Op, Tables}
import graft.functions.Portable._

/** E17 — margin-based bitext mining (SURVEY.md §2 part E): the
  * CCMatrix/LASER parallel-corpus miner (Artetxe & Schwenk 2019,
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings", arXiv:1811.01136; Schwenk et al. 2021 CCMatrix,
  * arXiv:1911.04944). Raw cross-lingual cosine is miscalibrated — hub
  * sentences score high against EVERYTHING — so the miner scores each
  * candidate pair by its MARGIN over the two sides' average
  * neighborhoods: margin(x, y) = cos(x, y) − (avgK(x) + avgK(y)) / 2,
  * where avgK is the mean cosine of a side's K nearest cross-side
  * candidates. A hub's high raw cosines cancel against its own high
  * neighborhood average; a genuinely parallel pair stands out above
  * both neighborhoods. This is the op that turns a multilingual
  * embedding lake into translation training pairs.
  *
  * The two "languages" here are the vec_id-parity halves of the
  * embeddings corpus (even = source side, odd = target side) — the
  * same built-in-split convention C19b's reference LM uses with
  * doc_id parity; a deployment substitutes its per-language corpora.
  *
  * Mechanics: candidates are CELL-BLOCKED cross-side pairs under the
  * trained [[CentroidIndex]] coarse quantizer (D11/E14's exact
  * blocking discipline — mining is defined over coarse-quantized
  * neighborhoods, stated identically in the oracle, so results are
  * engine-exact rather than a recall-bearing approximation); pair
  * cosines quantize to integer micros (an exactly-reproducible double
  * rounds once, then every average/margin/threshold is int64
  * arithmetic with the G21 floor-division convention); each side's
  * neighborhood average is a bounded [[graft.functions.Portable.topkMin]]
  * heap over its candidate stream; the forward-best target per source
  * is one max_by aggregate; and the mined cut keeps the top
  * [[MINE_PCT]]% of forward-best margins via a boundary-bucket
  * histogram (boundary bin included) — no corpus sort anywhere.
  *
  * Scale shape: one corpus-sized bucket shuffle (vectors ride their
  * cell/bucket groups, bounded by the E14 occupancy dial), then
  * id-width aggregates and joins only — the pair stream never carries
  * text, and the margin statistics are ≤ one row per vector. At
  * 100 TB this is the E14 plan with a parity filter inside the bucket
  * (the A×B in-row cross product enumerates ONLY cross-side pairs —
  * same-side pairs are never materialized).
  */
object BitextOps {

  /** Neighborhood size for the margin average — the K of avgK. The
    * published miner uses K = 4 neighbors per side.
    */
  private val MINE_K = 4

  /** Mined fraction: the top-% of forward-best margins kept (boundary
    * bin included — the G21 threshold convention).
    */
  private val MINE_PCT = 25

  /** Margin histogram bin width in cosine micros (~0.001 cosine). */
  private val MINE_BIN = 1000L

  /** Loudest acceptable (cell, tbl, bucket) membership before the
    * in-row cross product is refused (r17 advisory): 2^16 members ×
    * ~260 B/vector ≈ 17 MB in one aggregate row — already far past
    * what a sane occupancy dial produces (targets ~16), so tripping
    * this means the geometry degenerated, not that data grew.
    */
  private val CROSS_BUCKET_CAP = 1 << 16

  /** Cross-side candidate pairs at a geometry — the
    * [[AnnOps.cellBucketedPairs]] bucket discipline with the pair
    * enumeration split BY SIDE: each (cell, tbl, bucket) group
    * collects its even-parity and odd-parity members separately and
    * cross-products A×B in-row, so same-side pairs never exist. The
    * assignment frame is the same narrow cached (vec_id, cell) plan
    * subtree the D11/E14 consumers share (Spark's cache manager
    * dedupes by plan). Returns (a, b, cos) with a even, b odd, one
    * row per pair (max over multi-bucket collisions).
    */
  private def crossPairs(
      e: DataFrame,
      cent: DataFrame,
      sub: Option[AnnOps.LshGeometry]): DataFrame = {
    val packed = AnnOps.packedCents(cent)
    val assign = Caches.persist(e.crossJoin(broadcast(packed))
      .select(col("vec_id"), AnnOps.cellCol.as("cell")))
    val withCell = assign.join(e, "vec_id")
      .select(col("vec_id"), col("embedding"), col("nm"), col("cell"))
    val bucketed = sub match {
      case None =>
        withCell.select(col("cell"), lit(0).as("tbl"), lit(0L).as("bucket"),
          col("vec_id"), col("embedding"), col("nm"))
      case Some(g) =>
        withCell.select(col("cell"), col("vec_id"), col("embedding"),
          col("nm"),
          posexplode(AnnOps.lshBucketsCol(col("embedding"), g))
            .as(Seq("tbl", "bucket")))
          .select(col("cell"), col("tbl"), col("bucket"), col("vec_id"),
            col("embedding"), col("nm"))
    }
    // collect_list skips the nulls the unmatched side's `when` leaves,
    // so each group holds exactly its two sides, sorted for determinism.
    // Side split by pmod (r17 advisory): plain % returns NEGATIVE
    // remainders for negative ids in both engines, silently emptying
    // one side — pmod here and ((x % 2 + 2) % 2) in the oracle agree
    // on any id sign.
    bucketed
      .groupBy(col("cell"), col("tbl"), col("bucket"))
      .agg(
        sort_array(collect_list(when(pmod(col("vec_id"), lit(2)) === 0,
          struct(col("vec_id"), col("embedding"), col("nm"))))).as("xs"),
        sort_array(collect_list(when(pmod(col("vec_id"), lit(2)) === 1,
          struct(col("vec_id"), col("embedding"), col("nm"))))).as("ys"))
      .filter(size(col("xs")) >= 1 && size(col("ys")) >= 1)
      // loud skew guard (r17 advisory): the A×B cross product
      // materializes a bucket's whole membership in one row — bounded
      // by the occupancy dial in a sane geometry, so a bucket past the
      // cap means a degenerate centroid/sub-LSH layout and should fail
      // with a name, not OOM an executor
      .withColumn("xs",
        when(size(col("xs")) + size(col("ys")) > CROSS_BUCKET_CAP,
          raise_error(concat(
            lit("emb_bitext_mine: bucket occupancy "),
            (size(col("xs")) + size(col("ys"))).cast("string"),
            lit(s" exceeds $CROSS_BUCKET_CAP in (cell, tbl, bucket) = ("),
            col("cell").cast("string"), lit(", "),
            col("tbl").cast("string"), lit(", "),
            col("bucket").cast("string"),
            lit(") — re-dial the sub-LSH geometry before the cross " +
              "product materializes it in one row"))))
          .otherwise(col("xs")))
      // r20: the A×B cross product streams through two codegen'd
      // explodes with the cosine as a whole-stage-codegen projection —
      // the nested transform paid interpreted lambda dispatch per pair
      // (the pairRows finding; this is its cross-sided twin)
      .select(col("ys"), explode(col("xs")).as("x"))
      .select(col("x"), explode(col("ys")).as("y"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        cosineFromMicros(
          dotMicros(col("x.embedding"), col("y.embedding")),
          col("x.nm"), col("y.nm")).as("cos"))
      .groupBy(col("a"), col("b"))
      .agg(max(col("cos")).as("cos"))
  }

  /** E17's body at an explicit geometry — the [[graft.GeometryCheck]]
    * seam, mirroring [[EmbeddingOps.knnAt]].
    */
  private[graft] def mineAt(
      s: SparkSession,
      d: String,
      cells: Int,
      sub: Option[AnnOps.LshGeometry]): DataFrame = {
    val p = Caches.persist(
      crossPairs(AnnOps.withNorm(s, d),
        CentroidIndex.forCorpus(s, d, cells), sub)
        .select(col("a"), col("b"),
          floor(col("cos") * lit(1000000.0) + lit(0.5)).cast(LongType)
            .as("cmic")))
    // per-side neighborhood stats: K highest-cosine cross-side
    // candidates per vector, bounded-heap; avg by floor division
    val ast = p.groupBy(col("a"))
      .agg(topkMin(struct((-col("cmic")).as("nc"), col("b")), MINE_K)
        .as("ks"))
      .select(col("a"),
        aggregate(col("ks"), lit(0L), (acc, x) => acc - x("nc")).as("asum"),
        size(col("ks")).cast(LongType).as("acnt"))
    val bst = p.groupBy(col("b"))
      .agg(topkMin(struct((-col("cmic")).as("nc"), col("a")), MINE_K)
        .as("ks"))
      .select(col("b"),
        aggregate(col("ks"), lit(0L), (acc, x) => acc - x("nc")).as("bsum"),
        size(col("ks")).cast(LongType).as("bcnt"))
    val mg = p.join(ast, "a").join(bst, "b")
      .withColumn("aavg", expr("(asum - pmod(asum, acnt)) div acnt"))
      .withColumn("bavg", expr("(bsum - pmod(bsum, bcnt)) div bcnt"))
      .withColumn("nn2", col("aavg") + col("bavg"))
      .withColumn("margin",
        col("cmic") - expr("(nn2 - pmod(nn2, 2)) div 2"))
    val best = Caches.persist(mg.groupBy(col("a"))
      .agg(max_by(struct(col("b"), col("cmic"), col("margin")),
        struct(col("margin"), -col("b"))).as("w"))
      .select(col("a").as("src_id"), col("w.b").as("tgt_id"),
        col("w.cmic").as("cos_micros"), col("w.margin").as("margin_micros"))
      .withColumn("bin", expr(
        s"(margin_micros - pmod(margin_micros, $MINE_BIN)) div $MINE_BIN")))
    val hist = best.groupBy(col("bin")).agg(count(lit(1)).as("mass"))
    // bounded global window: ≤ a few thousand margin bins
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = hist.agg(sum(col("mass")).as("total"))
    val th = hist.withColumn("cum", sum(col("mass")).over(wb))
      .crossJoin(broadcast(tot))
      .agg(min(when(
        col("cum") * 100 >= col("total") * (100 - MINE_PCT),
        col("bin"))).as("t"))
    best.crossJoin(broadcast(th))
      .filter(col("bin") >= col("t"))
      .select(col("src_id"), col("tgt_id"), col("cos_micros"),
        col("margin_micros"))
      .orderBy(col("src_id"))
  }

  /** E17's oracle at an explicit geometry (the
    * [[EmbeddingOps.sqlKnnAt]] pattern: trained-centroid CTEs, pair
    * enumeration ID-WIDTH with vectors re-attaching once, sub-LSH
    * bucket CTEs when the dial is active).
    */
  private[graft] def sqlMineAt(
      cells: Int, sub: Option[AnnOps.LshGeometry]): String = {
    val fd = (x: String, y: String) => s"($x - (($x % $y + $y) % $y)) // $y"
    val pairCte = sub match {
      case None =>
        """prid AS MATERIALIZED (SELECT a.vec_id AS i, b.vec_id AS j
             FROM m a JOIN m b
               ON a.cell = b.cell
                 AND ((a.vec_id % 2 + 2) % 2) = 0
                 AND ((b.vec_id % 2 + 2) % 2) = 1)"""
      case Some(g) =>
        val pwRows = (for { t <- 0 until g.tables; k <- 0 until g.planes }
          yield s"($t, $k, ${AnnOps.planeWeights(t * g.planes + k)
            .mkString("[", ",", "]")}::BIGINT[])")
          .mkString(",\n          ")
        s"""pw AS (SELECT * FROM (VALUES
          $pwRows) AS pw(tbl, k, w)),
      bk AS MATERIALIZED (
             SELECT m.vec_id, pw.tbl,
               CAST(sum(CASE WHEN CAST(list_sum(list_transform(generate_series(1,64), ix ->
                 CAST(floor(CAST(m.embedding[ix] AS DOUBLE)*1000000+0.5) AS BIGINT) *
                 pw.w[ix])) AS BIGINT) > 0
                 THEN (CAST(1 AS BIGINT) << pw.k) ELSE 0 END) AS BIGINT) AS bucket
             FROM m, pw GROUP BY m.vec_id, pw.tbl),
      mb AS MATERIALIZED (SELECT m.vec_id, m.cell, bk.tbl, bk.bucket
             FROM m JOIN bk USING (vec_id)),
      prid AS MATERIALIZED (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
             FROM mb a JOIN mb b
               ON a.cell = b.cell AND a.tbl = b.tbl AND a.bucket = b.bucket
                 AND ((a.vec_id % 2 + 2) % 2) = 0
                 AND ((b.vec_id % 2 + 2) % 2) = 1)"""
    }
    s"""
      WITH ${AnnOps.sqlNormCte},
      ${AnnOps.sqlIvfTrainCtes(cells, AnnOps.IVF_ROUNDS)},
      ${AnnOps.sqlIvfAssignAggCte(AnnOps.IVF_ROUNDS)},
      m AS MATERIALIZED (SELECT e.vec_id, e.embedding, e.nm, assign.cell
            FROM e JOIN assign USING (vec_id)),
      $pairCte,
      pr AS MATERIALIZED (
             SELECT prid.i AS a, prid.j AS b,
                    CAST(floor((${AnnOps.sqlCos("x", "y")}) * 1000000 + 0.5)
                      AS BIGINT) AS cmic
             FROM prid
             JOIN e x ON prid.i = x.vec_id
             JOIN e y ON prid.j = y.vec_id),
      ar AS (SELECT a, cmic,
                    row_number() OVER (PARTITION BY a
                      ORDER BY cmic DESC, b) AS rn FROM pr),
      ast AS (SELECT a, CAST(sum(cmic) AS BIGINT) AS asum,
                     CAST(count(*) AS BIGINT) AS acnt
              FROM ar WHERE rn <= $MINE_K GROUP BY a),
      br AS (SELECT b, cmic,
                    row_number() OVER (PARTITION BY b
                      ORDER BY cmic DESC, a) AS rn FROM pr),
      bst AS (SELECT b, CAST(sum(cmic) AS BIGINT) AS bsum,
                     CAST(count(*) AS BIGINT) AS bcnt
              FROM br WHERE rn <= $MINE_K GROUP BY b),
      mg AS (SELECT a, b, cmic,
                    cmic - (${fd("nn2", "2")}) AS margin
             FROM (SELECT pr.a, pr.b, pr.cmic,
                          (${fd("ast.asum", "ast.acnt")})
                            + (${fd("bst.bsum", "bst.bcnt")}) AS nn2
                   FROM pr
                   JOIN ast ON pr.a = ast.a
                   JOIN bst ON pr.b = bst.b) x),
      fb AS (SELECT a, b, cmic, margin,
                    row_number() OVER (PARTITION BY a
                      ORDER BY margin DESC, b) AS rn FROM mg),
      best AS (SELECT a AS src_id, b AS tgt_id, cmic AS cos_micros,
                      margin AS margin_micros,
                      ${fd("margin", MINE_BIN.toString)} AS bin
               FROM fb WHERE rn = 1),
      hist AS (SELECT bin, CAST(count(*) AS BIGINT) AS mass
               FROM best GROUP BY bin),
      tot AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM hist),
      th AS (SELECT min(CASE WHEN cum * 100 >= total * ${100 - MINE_PCT}
                        THEN bin END) AS t
             FROM (SELECT bin, CAST(sum(mass) OVER (ORDER BY bin
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                   FROM hist) h, tot)
      SELECT src_id, tgt_id, cos_micros, margin_micros
      FROM best, th
      WHERE bin >= t
      ORDER BY src_id"""
  }

  /** E17 at the corpus-derived geometry (E14's cells + occupancy dial;
    * board-SF geometry coincides with the pinned oracle, divergence
    * logs the GeometryCheck pointer — the E14 convention).
    */
  val embBitextMine: Op = Op(
    "emb_bitext_mine",
    (s, d) => {
      val n = Tables.embeddings(s, d).count()
      val cells = AnnOps.ivfCellsFor(n)
      AnnOps.logGeometryDivergence("emb_bitext_mine", s"$cells cells",
        s"${AnnOps.CENTROIDS} cells")
      mineAt(s, d, cells, EmbeddingOps.knnSubGeometry(n, cells))
    },
    Some(sqlMineAt(AnnOps.CENTROIDS, None)))

  val all: Seq[Op] = Seq(embBitextMine)
}
