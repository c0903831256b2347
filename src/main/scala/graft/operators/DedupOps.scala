package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Caches, Checkpoints, Op, Tables}
import graft.Op.{xhash32, xhash60}
import graft.functions.Portable._

/** Deduplication over the documents/embeddings corpus (SURVEY.md §2
  * part D) — the core LLM-training-data pipeline pass. Scale design
  * (SURVEY §5): exact dedup is one shuffle on a uniform 60-bit hash;
  * near-dup detection NEVER does an all-pairs join — candidates come from
  * shared shingles (D2, df-capped), LSH band buckets (D3,
  * occupancy-capped), simhash prefix bands (D4) or random-hyperplane LSH
  * buckets (D5), so the join cost tracks the number of genuinely
  * colliding documents, not n², and every candidate generator carries a
  * hard bound on its worst bucket.
  */
object DedupOps {

  /** DuckDB twin of [[graft.functions.Portable.shingles]], as CTE text:
    * tok → shl (doc_id, shs list) for the documents table.
    */
  private val sqlShingleCte: String = """
      tok AS (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text), ' '), '\s+') AS tok
              FROM documents),
      shl AS (SELECT doc_id,
                     list_distinct([concat_ws(' ', tok[i], tok[i+1], tok[i+2])
                       for i in generate_series(1, greatest(len(tok)-2, 1))])
                       AS shs
              FROM tok),
      sh AS (SELECT doc_id, unnest(shs) AS s FROM shl)"""

  /** D1 — exact dedup on the normalized-text fingerprint: group by a
    * uniform 60-bit hash, keep the smallest doc_id per group. One shuffle
    * on the hash (uniform by construction → no skew at any scale),
    * map-side partial aggregation. The survivor set is `keep_id`;
    * n_copies>1 rows are the duplicate groups a pipeline would drop.
    */
  val dedupExact: Op = Op(
    "dedup_exact",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), hash60(normText(col("text"))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("fp")),
    Some(s"""
      SELECT ${xhash60("lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '))")} AS fp,
             min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents
      GROUP BY fp
      ORDER BY fp"""))

  /** Materialized distinct-shingle sets: (doc_id, shs). The repartition
    * spreads the CPU-bound shingle expression across all cores: a small
    * corpus file arrives as ONE input split, which would otherwise
    * serialize the whole shingling pass on a single task (measured
    * 14s → <1s at sf0.1); at scale the same hash-spread protects against
    * skewed file sizes. One narrow shuffle of the raw (doc_id, text)
    * rows — negligible next to the per-row compute it parallelizes.
    */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    // persist() (via Caches, scope-released by the harness): minhashPairs
    // consumes this twice (signatures + candidate verification) and the
    // cache manager dedupes the entry across every D-series op on the
    // same corpus — the CPU-bound shingling pass runs once per scope,
    // not once per reference
    Caches.persist(Tables.spread(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("tok"))
      .select(col("doc_id"), shinglesFromTokens(col("tok")).as("shs")))

  /** Exploded distinct shingles: (doc_id, s). NOTE: the explode argument
    * must stay the RAW shingle expression, not a projected `shs`
    * attribute — exploding an attribute makes InferFiltersFromGenerate
    * push an inferred `size(shs) > 0` filter below the projections,
    * re-inlining the whole tokenize+shingle pipeline (with split()
    * re-evaluated per element) into a pre-shuffle Filter: measured
    * 0.7 s → 7.3 s at sf0.1.
    */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    // spread, not bare repartition (r19): uncached, so AQE's byte-based
    // coalescing would fold the sub-MB doc shuffle back to ONE task and
    // serialize the shingle kernel (see [[graft.Tables.spread]])
    Tables.spread(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("tok"))
      .select(col("doc_id"), explode(shinglesFromTokens(col("tok"))).as("s"))

  /** Default shingle document-frequency cap (D2): a shingle shared by
    * more than this many documents generates NO candidate pairs. Bounds
    * the per-bucket pair quadratic at maxDf²/2 regardless of corpus
    * size — the stop-phrase guard ("in this paper", boilerplate
    * headers) every production near-dup pipeline carries. High-df
    * shingles carry almost no dedup signal anyway (they're common
    * English, not duplication), so true near-dup pairs still surface
    * through their many LOW-df shared shingles. Mirrored into the
    * DuckDB oracle, so the cap is part of the checked semantics.
    */
  private val MAX_DF = 100

  /** Default LSH band-bucket occupancy cap (D3): a band bucket holding
    * more than this many documents is dropped from candidate
    * enumeration. A bucket that large at r=2 rows/band means a
    * boilerplate-heavy cluster that exact dedup (D1) or the remaining 7
    * bands will still catch; without the cap one viral bucket costs
    * O(bucket²) pairs.
    */
  private val MAX_BUCKET = 200

  /** The exact n-gram Jaccard pair pipeline (D2), parameterized by the
    * shingle df cap so TextDedupSpec can prove the cap with a planted
    * stop-phrase at maxDf=2.
    */
  private[graft] def jaccardPairs(s: SparkSession, d: String,
      maxDf: Int): DataFrame = {
    // Candidate pairs are enumerated bucket-locally: group by shingle,
    // collect the (sorted) doc ids sharing it, emit the in-bucket pair
    // combinations. One pass over the shingle pipeline — a self-join
    // would recompute scan→tokenize→shingle per side — and df=1
    // shingles (the vast majority) drop out before any pair exists.
    // Bucket sizes are bounded by the df cap, so the per-bucket
    // quadratic is local and bounded at any corpus size. The
    // shingle-set SIZE rides along inside the collected structs, so the
    // Jaccard denominator needs NO join back to a per-doc sizes table —
    // the whole op is two shuffles (shingle, pair) and zero joins. `n`
    // (the distinct shingle count per doc) comes from a count window
    // over the exploded stream: the input is already hash-partitioned
    // on doc_id, so the window adds only an in-partition sort — cheaper
    // than recomputing the shingle array for a size() column, and it
    // sidesteps two measured ~10× plan-shape traps (see
    // [[shingleRows]]; also: a non-generator column written next to
    // explode() is planned AFTER Generate and recomputed per row).
    val sh = shingleRows(s, d).withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    // spread on the shingle key (r20, guide §2.5): the bucket stage
    // downstream of this exchange runs the O(bucket²) pairCombinations
    // kernel, but its shuffle is only a few MB, so AQE's byte-based
    // coalescing folded it to ~6 tasks with a ~0.6 s straggler
    // (measured; max/median task ≫ 5). The pinned conf-derived width
    // keeps the pair enumeration on all cores.
    pairRows(Tables.spread(sh, col("s")).groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .filter(size(col("ds")).between(2, maxDf)), "ds")
      .groupBy(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        col("x.n").as("n_i"), col("y.n").as("n_j"))
      .agg(count(lit(1)).as("c"))
      .select(col("i"), col("j"),
        (col("c") * lit(1.0) / (col("n_i") + col("n_j") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.2)
  }

  /** D2 — exact n-gram Jaccard pairs ≥ τ via shared shingles: pairs are
    * generated only for documents sharing at least one trigram with
    * document frequency ≤ [[MAX_DF]] (capped shingles are excluded from
    * the intersection count; denominators stay full-set, and the oracle
    * computes the identical capped semantics). τ=0.2 (the corpus'
    * planted near-dups sit at ≥0.9; random pairs at ≤0.1).
    */
  val dedupNgramJaccard: Op = Op(
    "dedup_ngram_jaccard",
    (s, d) => jaccardPairs(s, d, MAX_DF).orderBy(col("i"), col("j")),
    Some(s"""
      WITH $sqlShingleCte,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      dfc AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $MAX_DF),
      common AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                 FROM sh a JOIN sh b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN dfc ON a.s = dfc.s
                 GROUP BY 1, 2)
      SELECT i, j, c * 1.0 / (x.n + y.n - c) AS jaccard
      FROM common
      JOIN sizes x ON i = x.doc_id
      JOIN sizes y ON j = y.doc_id
      WHERE c * 1.0 / (x.n + y.n - c) >= 0.2
      ORDER BY i, j"""))

  /** ONE MinHash-LSH signature scheme for batch D3, the persistent
    * index (DedupIndex) and the stream (NearDupStream): these constants
    * and [[bandedSignatureRows]] are the compatibility contract between
    * them — an index probe or a stream bucket only ever matches batch
    * candidates because all three derive from this single definition.
    */
  private[graft] val K = 16 // minhash functions
  private[graft] val R = 2  // rows per band → 8 bands
  private[graft] val NumBands: Int = K / R

  /** Banded signatures (doc_id, extra..., band, bkey, mh) of a frame
    * carrying (doc_id, text, extra...). The explode argument stays a
    * raw expression (never a projected attribute) for the
    * InferFiltersFromGenerate reason documented at [[shingleRows]].
    */
  private[graft] def bandedSignatureRows(
      docs: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val carry = extra.map(col)
    bandedFromShingles(
      docs
        .select(col("doc_id") +: carry :+
          split(trim(lower(col("text"))), "\\s+").as("tok"): _*)
        .select(col("doc_id") +: carry :+
          shinglesFromTokens(col("tok")).as("shs"): _*),
      extra)
  }

  /** minhash + band explode of an already-shingled (doc_id, extra...,
    * shs) frame: the banding half of [[bandedSignatureRows]], factored
    * out so [[minhashPairs]] (which shares its shingle frame with
    * candidate verification) derives its band keys from the SAME
    * definition instead of an inline copy — the batch/index/stream
    * compatibility contract is true by construction.
    */
  private[graft] def bandedFromShingles(
      shingled: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val carry = extra.map(col)
    shingled
      .select(col("doc_id") +: carry :+ minhash16(col("shs")).as("mh"): _*)
      .select(col("doc_id") +: carry :+ col("mh") :+
        explode(array((0 until NumBands).map { b =>
          struct(lit(b).as("band"),
            md5(concat_ws("|",
              element_at(col("mh"), R * b + 1),
              element_at(col("mh"), R * b + 2))).as("bkey"))
        }: _*)).as("bk"): _*)
      .select(col("doc_id") +: carry :+ col("bk.band").as("band") :+
        col("bk.bkey").as("bkey") :+ col("mh"): _*)
  }

  private def sqlMinhashFn(i: Int): String =
    s"CAST(('0x' || substr(md5(concat('g${i / 4}|', s)), ${8 * (i % 4) + 1}, 8)) AS BIGINT)"

  /** D3 — MinHash + LSH banding: 16 minhashes per document (the
    * [[graft.functions.VectorExpressions.Minhash16Expr]] native kernel —
    * one tight loop over the materialized shingle array, 4 md5 digests
    * per shingle, NO per-shingle explode and no signature shuffle),
    * banded 8×2; documents sharing any band bucket become candidates
    * (bucket-join, never all-pairs), then candidates are verified with
    * the exact Jaccard on their shingle sets (array_intersect on the two
    * docs' arrays — per-pair local work, no second shingle shuffle).
    * Band-collision probability at r=2: j² per band, 1-(1-j²)⁸ overall —
    * ≥0.999 at j=0.9 (the planted dups), ~0.01 at j=0.1 (random pairs).
    * Final filter τ=0.5. Signature values are bit-identical to the
    * oracle's min-over-exploded-shingles GROUP BY.
    */
  /** The MinHash-LSH near-dup pair pipeline (shared by D3 and D6):
    * (i, j, jaccard) for all LSH-candidate pairs with exact Jaccard ≥ 0.5,
    * unordered. Band buckets above `maxBucket` occupancy are dropped
    * (see [[MAX_BUCKET]]); the cap is mirrored in the oracle.
    */
  private[graft] def minhashPairs(s: SparkSession, d: String,
      maxBucket: Int = MAX_BUCKET): DataFrame = {
      // band keys derive from the ONE banding definition
      // ([[bandedFromShingles]]) over the shared persisted shingle frame
      val bands = bandedFromShingles(shingleSets(s, d))
        .select(col("doc_id"), col("band"), col("bkey"))
      // bucket-local pair enumeration (see dedup_ngram_jaccard): one pass
      // over the signature pipeline instead of a self-join recomputing it
      // per side; the occupancy cap bounds the per-bucket quadratic.
      val cand = pairRows(bands.groupBy(col("band"), col("bkey"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, maxBucket)), "ds")
        .select(col("x").as("i"), col("y").as("j"))
        .distinct()
      // Verification fetches both documents' shingle sets with ONE join
      // against ONE pass of the doc pipeline: each candidate pair
      // explodes to its two member ids, joins, and regroups — two
      // min-over-one-row aggregates per pair pick the sides apart.
      // Joining twice (shs_i, shs_j) would recompute the whole
      // scan→tokenize→shingle lineage once per side.
      val shSets = shingleSets(s, d)
      // The verified pair frame is THE shared dedup artifact: five board
      // queries (D3/D6/D7/D16, G12b) and several in-query consumers
      // derive from it, and the banding + verification upstream is the
      // family's dominant CPU (measured at sf0.1: ~14.5 s + ~11.6 s of
      // task time per pass). persist() it like [[shingleSets]] so the
      // scope's consumers — and warm reps, whose plans cache-match —
      // pay it once (r19 optimization; cold cost stays visible in the
      // bench's `first`).
      Caches.persist(cand
        .select(col("i"), col("j"),
          explode(array(col("i"), col("j"))).as("doc_id"))
        .join(shSets, "doc_id")
        .groupBy(col("i"), col("j"))
        .agg(
          min(when(col("doc_id") === col("i"), col("shs"))).as("shs_i"),
          min(when(col("doc_id") === col("j"), col("shs"))).as("shs_j"))
        .select(col("i"), col("j"),
          (size(array_intersect(col("shs_i"), col("shs_j"))) * lit(1.0) /
            (size(col("shs_i")) + size(col("shs_j"))
              - size(array_intersect(col("shs_i"), col("shs_j")))))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.5))
  }

  /** DuckDB CTE chain ending in `mh_pairs(i, j, jaccard)` — the oracle
    * twin of [[minhashPairs]] (shared by the D3 and D6 oracles).
    */
  /** DuckDB CTE chain ending in `bands(doc_id, band, bkey)` — the
    * banded-signature half of [[sqlMinhashPairsCtes]], factored so the
    * D19 decontamination oracle derives its band keys from the SAME
    * definition (the engine-side [[bandedFromShingles]] sharing,
    * mirrored).
    */
  private[operators] val sqlBandsCtes: String = {
    val minCols = (0 until K).map(i =>
      s"min(${sqlMinhashFn(i)}) AS m$i").mkString(",\n               ")
    val bandSelects = (0 until K / R).map(b =>
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', m${R * b}, m${R * b + 1})) AS bkey FROM mh")
      .mkString("\n        UNION ALL ")
    s"""$sqlShingleCte,
      mh AS (SELECT doc_id,
               $minCols
             FROM sh GROUP BY doc_id),
      bands AS (
        $bandSelects
      )"""
  }

  private[operators] val sqlMinhashPairsCtes: String = {
    s"""$sqlBandsCtes,
      bok AS (SELECT band, bkey FROM bands GROUP BY band, bkey
              HAVING count(*) <= $MAX_BUCKET),
      cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bkey = b.bkey
                   AND a.doc_id < b.doc_id
               JOIN bok ON a.band = bok.band AND a.bkey = bok.bkey),
      mh_pairs AS (
        SELECT i, j, jaccard FROM (
          SELECT c.i, c.j,
                 len(list_intersect(x.shs, y.shs)) * 1.0 /
                   (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs)))
                   AS jaccard
          FROM cand c
          JOIN shl x ON c.i = x.doc_id
          JOIN shl y ON c.j = y.doc_id) t
        WHERE jaccard >= 0.5)"""
  }

  val dedupMinhashLsh: Op = Op(
    "dedup_minhash_lsh",
    (s, d) => minhashPairs(s, d).orderBy(col("i"), col("j")),
    Some(s"""
      WITH $sqlMinhashPairsCtes
      SELECT i, j, jaccard FROM mh_pairs
      ORDER BY i, j"""))

  /** D6 — duplicate clustering: connected components over the MinHash-LSH
    * near-dup pairs. cluster_id = the smallest doc_id reachable through
    * the dup graph; a pipeline keeps `doc_id = cluster_id` (the canonical
    * representative) and drops the rest — the transitive step exact
    * pairwise dedup misses (A~B, B~C ⇒ {A,B,C} one cluster even when
    * A~C scores below τ).
    *
    * Spark-first CC: iterative min-label propagation — each round every
    * vertex takes the min label over itself and its neighbors (one
    * edges⋈labels shuffle join + one groupBy per round), converging in
    * ≤ component-diameter rounds (dup clusters are near-cliques, so 1-3
    * in practice; the large-star/small-star rewiring trick bounds rounds
    * at O(log n) for pathological chains — same plan shape, noted here
    * for the 100 TB tail). The edge list is checkpointed once so rounds
    * don't recompute the LSH pipeline, and each round's labels are
    * checkpointed to truncate the growing lineage ([[graft.Checkpoints]]:
    * executor-local by default, reliable on clusters via
    * graft.checkpoint.reliable=true).
    * Convergence is detected with an aggregated count — no driver-side
    * data collection.
    */
  /** Min-label-propagation connected components over an already
    * materialized (i, j) pair frame. Callers MUST pass a checkpointed
    * frame — the loop re-reads it every round, and [[dedupReport]]
    * shares ONE checkpoint between this and its pair count (the r4
    * double-pipeline fix: building pairs twice doubled the most
    * expensive query on the board).
    */
  /** Pair-count bound for the driver-local CC engine: 2^20 edges
    * (~16 MB collected) — the [[TokenizerIndex.MaxDriverWords]]
    * size-adaptive engine doctrine applied to connected components. A
    * real near-dup pair set is duplication-sized, not corpus-sized, so
    * gate corpora sit far below this; an adversarial flood takes the
    * distributed loop.
    */
  private val CC_DRIVER_MAX = 1L << 20

  /** Driver-local min-label connected components via union-find with
    * min-id representatives — byte-identical to the distributed loop's
    * fixpoint (cluster_id = the smallest doc_id reachable through the
    * pair graph) at driver speed: the distributed loop costs ~2 jobs ×
    * ~9 tiny exchanges in round latency (measured 2.3 s at sf0.1 on
    * label frames of a few thousand rows), which is the whole cost of
    * the cluster family once the pair frame is cached (r19).
    */
  private[graft] def clusterPairsLocal(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    // explicit (i, j) LongType selection (r20, the r19 advisory): a
    // caller passing a frame with a different leading-column order
    // fails here at the seam instead of silently mis-clustering
    val edges = pairs.select(col("i"), col("j")).collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { e =>
      val i = e.getLong(0); val j = e.getLong(1)
      if (!parent.containsKey(i)) parent.put(i, i)
      if (!parent.containsKey(j)) parent.put(j, j)
      val ri = find(i); val rj = find(j)
      // union by MIN id so the representative is the component minimum
      if (ri != rj) { if (ri < rj) parent.put(rj, ri) else parent.put(ri, rj) }
    }
    import scala.jdk.CollectionConverters._
    val rows = parent.keySet().asScala.toSeq
      .map(v => (v, find(v)))
    import s.implicits._
    rows.toDF("doc_id", "cluster_id")
  }

  /** Connected components over an (i, j) LongType pair frame. Callers
    * MUST pass a CHECKPOINTED frame (the r4 double-pipeline fix, stated
    * here at the seam per the r19 advisory): the engine gate counts it
    * and the chosen engine re-reads it — an un-checkpointed caller
    * would recompute the whole LSH pipeline once for the count and
    * again for the clustering.
    */
  private[graft] def clusterPairs(pairs: DataFrame): DataFrame =
      // size-adaptive engine choice (r19): the caller's checkpointed
      // pair frame is already materialized, so the count is a cached
      // scan; small pair sets cluster driver-side, large ones keep the
      // distributed pointer-jumping loop. Engine parity is pinned in
      // TextDedupSpec (local ≡ distributed on chain/clique/mixed
      // graphs).
      if (pairs.count() <= CC_DRIVER_MAX)
        clusterPairsLocal(pairs)
      else clusterPairsDistributed(pairs)

  /** The distributed min-label-propagation + pointer-jumping loop — the
    * above-threshold engine (and the parity-test seam).
    */
  private[graft] def clusterPairsDistributed(pairs: DataFrame): DataFrame = {
      // r20 exchange diet (the beamWalk recipe, guide §2.4): the
      // undirected edge frame is persisted PRE-PARTITIONED on src — its
      // join key in EVERY round — so each round's edges⋈labels join
      // reuses the cached partitioning instead of re-exchanging (and
      // re-deriving) the edge set per round. Cached plans keep their
      // partition count (canChangeCachedPlanOutputPartitioning=false),
      // so one up-front exchange serves the whole loop.
      val und = Caches.persist(
        pairs.union(pairs.select(col("j"), col("i"))).toDF("src", "dst")
          .repartition(col("src")))
      // Seed with one neighborhood-min pass (label(v) = min(v, neighbors))
      // — equivalent to the first propagation round at the cost of a
      // single groupBy, no join. Near-clique dup clusters converge here,
      // so the loop usually runs once just to confirm no change.
      //
      // Per-round frames are lazily persist()ed, NOT eagerly
      // checkpointed: the round's convergence count is already an
      // action, so it materializes the round's labels into the cache as
      // a side effect — ONE job per round instead of three (two eager
      // checkpoint jobs + the count), which matters because every
      // post-pairs frame is label-sized (vertices of actual duplicate
      // clusters), so the loop's cost is job overhead, not data.
      // Superseded rounds unpersist as they go; the caller-checkpointed
      // pairs frame remains the recompute root, so lineage stays
      // shallow in the round count.
      var labels = Caches.persist(und.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("v"), least(col("mn"), col("src")).as("label")))
      // Convergence is detected by comparing Σ label across rounds
      // (exact DECIMAL(38,0) sum — no overflow below ~10^19 vertices of
      // 60-bit ids): per-vertex labels are monotone non-increasing and
      // the vertex set is fixed, so sum equality ⟺ pointwise equality.
      // This replaces the r4–r18 jumped⋈old-labels count — the round's
      // one action is now a 1-row aggregate that materializes the
      // round's labels as a side effect, with no second join in the
      // round's DAG (r19 optimization: the loop was the dedup cluster
      // family's residual latency once the pair frame cached).
      def labelSum(df: DataFrame): java.math.BigDecimal = {
        val r = df.agg(
          sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("s")).collect()(0)
        Option(r.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
      }
      var prevSum = labelSum(labels)
      var changed = true
      while (changed) {
        // r20: prop is persisted so the pointer-jumping self-join reads
        // ONE cached round result instead of planning the whole
        // edges⋈labels→groupBy subtree twice (its 3 exchanges were
        // duplicated inside every round's job — ~9 exchanges/round
        // measured; now ≤4: labels→v, the post-union groupBy, and the
        // self-join's two label-keyed exchanges over a label-sized
        // frame. The und side of the round join is exchange-free from
        // the cache).
        val prop = Caches.persist(und.join(labels, col("src") === col("v"))
          .select(col("dst").as("v"), col("label"))
          .union(labels)
          .groupBy(col("v")).agg(min(col("label")).as("label")))
        // Pointer jumping: follow the label's own label (L' = L∘L), so
        // label depth halves every round and convergence is
        // O(log diameter) instead of O(diameter) — the difference
        // between 2-3 rounds and millions on a pathological 100 TB
        // duplicate CHAIN. Labels are always vertex ids (minima over
        // seen ids), so the self-join key always resolves; the rename
        // on the right side keeps the un-materialized self-join
        // attribute-clean.
        val jumped = Caches.persist(prop
          .join(prop.select(col("v").as("lv"), col("label").as("ll")),
            col("label") === col("lv"))
          .select(col("v"), col("ll").as("label")))
        val curSum = labelSum(jumped)
        changed = curSum.compareTo(prevSum) != 0
        prevSum = curSum
        labels.unpersist()
        prop.unpersist()
        labels = jumped
      }
      labels.select(col("v").as("doc_id"), col("label").as("cluster_id"))
  }

  val dedupClusters: Op = Op(
    "dedup_clusters",
    (s, d) => clusterPairs(Checkpoints.checkpoint(
        minhashPairs(s, d).select(col("i"), col("j"))))
      .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE $sqlMinhashPairsCtes,
      und AS (SELECT i AS src, j AS dst FROM mh_pairs
              UNION ALL SELECT j, i FROM mh_pairs),
      reach(v, r) AS (
        SELECT src, dst FROM und
        UNION
        SELECT w.v, u.dst FROM reach w JOIN und u ON w.r = u.src)
      SELECT v AS doc_id, least(v, min(r)) AS cluster_id
      FROM reach GROUP BY v
      ORDER BY doc_id"""))

  /** D16 — QUALITY-AWARE cluster canonicals: D6 keeps the minimum
    * doc_id per near-dup cluster (a deterministic but quality-blind
    * convention); production curation keeps the BEST member — dedup is
    * exactly the moment the pipeline chooses which copy of the content
    * survives, and crawl timestamps (≈ doc_id order) are uncorrelated
    * with quality. This op joins D6's connected components with C18's
    * learned quality scores and keeps the argmax-score member, ties
    * broken to the min doc_id — the same rule as a (score DESC, doc_id)
    * rank-1, expressed as a max_by AGGREGATE so only one id-width row
    * per cluster survives the shuffle (never a window over the corpus).
    *
    * Composition is by construction drift-free: the cluster side IS
    * [[clusterPairs]]∘[[minhashPairs]] (D6's body) and the score side IS
    * [[QualityIndex.score]] under the corpus' one trained model
    * ([[QualityIndex.forCorpus]] — C18's artifact, not a retrain), so the
    * canonical rule can never disagree with the standalone ops.
    */
  val dedupCanonicalQuality: Op = Op(
    "dedup_canonical_quality",
    (s, d) => {
      val clusters = clusterPairs(Checkpoints.checkpoint(
        minhashPairs(s, d).select(col("i"), col("j"))))
      val scores = QualityIndex
        .score(Tables.documents(s, d), QualityIndex.forCorpus(s, d))
        .select(col("doc_id"), col("score_micros"))
      clusters.join(scores, "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max_by(struct(col("doc_id"), col("score_micros")),
            struct(col("score_micros"), (-col("doc_id")).as("nd")))
            .as("kb"))
        .select(col("cluster_id"), col("kb.doc_id").as("keep_id"),
          col("kb.score_micros").as("keep_score_micros"),
          col("n_members"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""
      WITH RECURSIVE $sqlMinhashPairsCtes,
      und AS (SELECT i AS src, j AS dst FROM mh_pairs
              UNION ALL SELECT j, i FROM mh_pairs),
      reach(v, r) AS (
        SELECT src, dst FROM und
        UNION
        SELECT w.v, u.dst FROM reach w JOIN und u ON w.r = u.src),
      cl AS (SELECT v AS doc_id, least(v, min(r)) AS cluster_id
             FROM reach GROUP BY v),
      ${TextOps.sqlQualityCtes},
      cj AS (SELECT cl.cluster_id, cl.doc_id, p.p AS score
             FROM cl JOIN ${TextOps.sqlQualityScoreTable} p USING (doc_id)),
      rk AS (SELECT cluster_id, doc_id, score,
                    row_number() OVER (PARTITION BY cluster_id
                      ORDER BY score DESC, doc_id) AS rn
             FROM cj),
      nn AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
             FROM cj GROUP BY cluster_id)
      SELECT rk.cluster_id, rk.doc_id AS keep_id,
             rk.score AS keep_score_micros, nn.n_members
      FROM rk JOIN nn USING (cluster_id)
      WHERE rn = 1
      ORDER BY cluster_id"""))

  private val BITS = 60 // hash60 width

  /** D4 — SimHash near-dup buckets: per-document 60-bit simhash (per-bit
    * majority vote over shingle hashes, computed as 60 conditional-sum
    * aggregates in ONE groupBy pass — map-side combined, no bit explode),
    * bucketed by the top-12-bit prefix band. Identical documents get
    * identical simhashes; near-identical ones differ in few bits and
    * mostly share the prefix band. One shuffle on doc_id (uniform).
    */
  val dedupSimhash: Op = Op(
    "dedup_simhash",
    (s, d) => {
      val sh = shingleRows(s, d)
        .withColumn("h", hash60(col("s")))
      val bitSums = (0 until BITS).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"b$j"))
      val simhash = (0 until BITS).map(j =>
        shiftleft(when(col(s"b$j") > 0, 1L).otherwise(0L), j))
        .reduce(_ + _)
      sh.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), simhash.as("simhash"))
        .withColumn("band", shiftright(col("simhash"), BITS - 12))
        .orderBy(col("doc_id"))
    },
    Some {
      val bitSums = (0 until BITS).map(j =>
        s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b$j")
        .mkString(",\n               ")
      val simhash = (0 until BITS).map(j =>
        s"(CAST(CASE WHEN b$j > 0 THEN 1 ELSE 0 END AS BIGINT) << $j)")
        .mkString(" + ")
      s"""
      WITH $sqlShingleCte,
      hv AS (SELECT doc_id, ${xhash60("s")} AS h FROM sh),
      bits AS (SELECT doc_id,
               $bitSums
             FROM hv GROUP BY doc_id),
      sim AS (SELECT doc_id, $simhash AS simhash FROM bits)
      SELECT doc_id, simhash, simhash >> ${BITS - 12} AS band
      FROM sim
      ORDER BY doc_id"""
    })

  /** D5 — embedding-cosine near-dup pairs, LSH-blocked: candidates are
    * vector pairs sharing a random-hyperplane bucket in ANY of the 8
    * hash tables — the exact [[AnnOps.bucketIndex]] ann_lsh uses, so at
    * scale ONE persisted (vec_id, table, bucket) artifact serves both
    * ANN search and dedup. Candidates verify with the exact
    * integer-micros cosine (bit-identical across engines, see
    * [[graft.functions.Portable.dotMicros]]), τ=0.3.
    *
    * Why LSH blocks and not a metadata key: a bounded-cardinality key
    * (label, language, source) gives blocks that grow LINEARLY with the
    * corpus, so the in-block all-pairs join grows quadratically — a
    * scale-killer at 100 TB. LSH bucket occupancy instead tracks local
    * density: more data means more buckets, not bigger ones (and the
    * band structure keeps recall: cos≥0.9 pairs collide in ≥1 of 8
    * tables w.p. ~0.98, pinned in TextDedupSpec against brute force).
    *
    * Plan shape: pair enumeration is bucket-local (groupBy +
    * pairCombinations — no self-join, which would recompute the
    * bucketing per side), the candidate distinct carries 16-byte id
    * pairs, and BOTH member vectors re-attach in ONE pass over the
    * vec_id-partitioned corpus (explode to members → join → regroup —
    * joining the corpus twice would double the scan and shuffle).
    */
  /** D5's body at an explicit geometry — the op derives it from the
    * corpus count; graft.GeometryCheck re-runs it at the oracle's
    * default above gate scale.
    *
    * Plan shape (r11): cosines compute BUCKET-LOCALLY. Bucket rows
    * carry the vector ([[AnnOps.bucketRowsWithVectors]]), so the only
    * corpus-sized shuffle is the one groupBy-bucket at ~0.3 KB/row;
    * pair scoring is then pure in-task compute (occupancy² per bucket,
    * occupancy pinned by the PAIR_OCCUPANCY geometry) and only the
    * SURVIVORS (cos ≥ tau — rare) reach the cross-table dedup
    * aggregate. The previous shape deduped candidate ids FIRST and
    * re-attached both embeddings by id; at sf10 that meant a
    * 19M-row distinct plus a candidate-sized join/groupBy carrying
    * 0.5 KB of vectors per row — the measured 100× wall was this
    * shuffle machinery, not the cosine math. A pair colliding in t of
    * 8 tables now scores t times instead of once; exact-micros cosine
    * makes every copy bit-identical, so the max() dedup is untouched
    * and redundant scoring is cheap codegen'd arithmetic traded
    * against candidate-sized shuffles.
    */
  private[graft] def embeddingPairsAt(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      g: AnnOps.LshGeometry): org.apache.spark.sql.DataFrame = {
      val e = AnnOps.withNorm(s, d)
      AnnOps.bucketRowsWithVectors(e, g)
        .groupBy(col("tbl"), col("bucket"))
        .agg(sort_array(collect_list(
          struct(col("vec_id"), col("embedding"), col("nm")))).as("ds"))
        .filter(size(col("ds")) >= 2)
        // all i<j pairs of the (vec_id-sorted) bucket: the nested
        // transform is the struct-typed twin of pairCombinations.
        // Deliberately NOT the r20 pairRows generator spelling: these
        // buckets run at the ~512-pair occupancy dial, and pairRows'
        // per-member slice copies of the embedding-carrying group array
        // cost MORE than the interpreted lambda dispatch it saves
        // (paired boards: 0.76 -> 1.44 s warm under pairRows — the
        // inverse of the small-occupancy ANN cells, where the lambda
        // dispatch dominated).
        .select(explode(flatten(transform(col("ds"), (x, i) =>
          transform(
            slice(col("ds"), i + lit(2), size(col("ds")) - i - lit(1)),
            y => struct(x.as("x"), y.as("y")))))).as("p"))
        .select(col("p.x.vec_id").as("i"), col("p.y.vec_id").as("j"),
          cosineFromMicros(
            dotMicros(col("p.x.embedding"), col("p.y.embedding")),
            col("p.x.nm"), col("p.y.nm")).as("cos"))
        .filter(col("cos") >= 0.3)
        .groupBy(col("i"), col("j"))
        .agg(max(col("cos")).as("cos"))
        .orderBy(col("i"), col("j"))
  }

  val dedupEmbedding: Op = Op(
    "dedup_embedding",
    (s, d) => {
      // corpus-sized geometry at the PAIR occupancy target (≡ the
      // oracle's default through PAIR_DEFAULT_MAX — 2× gate margin):
      // with fixed buckets, 10x corpus = 10x occupancy = 100x
      // bucket-local pair enumeration — the one measured super-linear
      // query at sf1 before this derivation, re-confirmed and
      // re-tightened by the r10 sf10 step (BASELINE.md)
      val g = AnnOps.LshGeometry.forCorpusPairs(
        Tables.embeddings(s, d).count())
      AnnOps.logGeometryDivergence("dedup_embedding", g,
        AnnOps.LshGeometry.default)
      embeddingPairsAt(s, d, g)
    },
    Some(sqlEmbeddingPairs(AnnOps.LshGeometry.default)))

  /** D5's DuckDB twin at an ARBITRARY geometry — the board oracle is
    * this at the default (≡ forCorpusPairs at every gate SF), and
    * [[graft.GeometryCheck]] replays it at the corpus-derived geometry
    * above gate scale, so parity is provable at the geometry the engine
    * actually deploys (the plane family is index-parameterized, see
    * [[AnnOps.planeWeights]]).
    */
  private[graft] def sqlEmbeddingPairs(g: AnnOps.LshGeometry): String = {
    val bandSelects = (0 until g.tables).map(t =>
      s"SELECT vec_id, $t AS tbl, ${AnnOps.sqlBucket("e", t, g)} AS bucket FROM e")
      .mkString("\n        UNION ALL ")
    s"""
      WITH ${AnnOps.sqlNormCte},
      b AS (
        $bandSelects
      ),
      cand AS (SELECT DISTINCT a.vec_id AS i, c.vec_id AS j
               FROM b a JOIN b c
                 ON a.tbl = c.tbl AND a.bucket = c.bucket
                   AND a.vec_id < c.vec_id)
      SELECT i, j, cos FROM (
        SELECT cand.i, cand.j,
               ${AnnOps.sqlCos("x", "y")} AS cos
        FROM cand
        JOIN e x ON cand.i = x.vec_id
        JOIN e y ON cand.j = y.vec_id) t
      WHERE cos >= 0.3
      ORDER BY i, j"""
  }

  /** D7 — the end-of-run dedup report: one row summarizing what the
    * pipeline did to the corpus — raw docs, exact-fingerprint survivors,
    * near-dup pairs found, docs swept into near-dup clusters, cluster
    * count (= canonical docs kept from those), and the final corpus
    * size after dropping exact dups and non-canonical near-dups. Pure
    * composition of D1/D3/D6 plans plus single-row broadcast cross
    * joins — the numbers a curation run logs at every scale.
    */
  val dedupReport: Op = Op(
    "dedup_report",
    (s, d) => {
      // one scan serves both corpus counts (row count + distinct
      // fingerprints) — they were two separate aggregates over the
      // same table
      val nDocsFp = Tables.documents(s, d)
        .select(hash60(normText(col("text"))).as("fp"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_distinct_fp"))
      // ONE checkpointed pairs frame feeds both the pair count and the
      // clustering — the LSH pipeline (shingle → minhash → band →
      // verify) runs exactly once.
      val pairs = Checkpoints.checkpoint(
        minhashPairs(s, d).select(col("i"), col("j")))
      val nPairs = pairs.agg(count(lit(1)).as("n_near_pairs"))
      val cl = clusterPairs(pairs)
      val clStats = cl.agg(count(lit(1)).as("n_docs_in_clusters"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      nDocsFp.crossJoin(nPairs).crossJoin(clStats)
        .select(col("n_docs"), col("n_distinct_fp"), col("n_near_pairs"),
          col("n_docs_in_clusters"), col("n_clusters"),
          (col("n_distinct_fp") -
            (col("n_docs_in_clusters") - col("n_clusters")))
            .as("n_final_upper_bound"))
    },
    Some(s"""
      WITH RECURSIVE $sqlMinhashPairsCtes,
      und AS (SELECT i AS src, j AS dst FROM mh_pairs
              UNION ALL SELECT j, i FROM mh_pairs),
      reach(v, r) AS (
        SELECT src, dst FROM und
        UNION
        SELECT w.v, u.dst FROM reach w JOIN und u ON w.r = u.src),
      cl AS (SELECT v, least(v, min(r)) AS cluster_id
             FROM reach GROUP BY v)
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT count(DISTINCT
                ${xhash60("lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '))")})
                FROM documents) AS n_distinct_fp,
             (SELECT count(*) FROM mh_pairs) AS n_near_pairs,
             (SELECT count(*) FROM cl) AS n_docs_in_clusters,
             (SELECT count(DISTINCT cluster_id) FROM cl) AS n_clusters,
             (SELECT count(DISTINCT
                ${xhash60("lower(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '))")})
                FROM documents)
               - ((SELECT count(*) FROM cl)
                  - (SELECT count(DISTINCT cluster_id) FROM cl))
               AS n_final_upper_bound"""))

  /** Decontamination parameters: docs with id < [[EVAL_MAX]] play the
    * held-out benchmark set; [[DECON_N]]-token n-grams (13 in common
    * practice, 8 here for the small corpus) are long enough that
    * stopword runs never collide — overlap means real shared text.
    */
  private val EVAL_MAX = 25L
  private val DECON_N = 8

  /** D8 — benchmark decontamination: flag corpus documents sharing any
    * long n-gram with the held-out eval set, the standard pre-training
    * hygiene pass (eval answers leaking into training data inflate
    * benchmarks). Spark shape: ONE tokenize→n-gram pass over the corpus
    * (the explode argument stays a raw expression — see
    * [[shingleRows]]); the eval side is a tiny distinct (eval_id, gram)
    * frame that BROADCASTS, so the corpus never shuffles — at 100 TB
    * this is a map-side probe of every corpus n-gram against the
    * broadcast eval index, then one aggregate on the (rare) hits.
    */
  val dedupDecontaminate: Op = Op(
    "dedup_decontaminate",
    (s, d) => {
      val base = Tables.documents(s, d)
        .transform(graft.Tables.spreadBy(col("doc_id")))
        .select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("tok"))
        .filter(size(col("tok")) >= DECON_N)
      val grams = base
        .select(col("doc_id"),
          explode(ngramsFromTokens(col("tok"), DECON_N)).as("g"))
      val evalG = grams.filter(col("doc_id") < EVAL_MAX)
        .select(col("doc_id").as("eval_id"), col("g")).distinct()
      grams.filter(col("doc_id") >= EVAL_MAX)
        .join(broadcast(evalG), "g")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_shared_ngrams"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH tokd AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(tok) - ${DECON_N - 1}), i ->
                   concat_ws(' ', ${(0 until DECON_N)
                     .map(k => s"tok[i+$k]").mkString(", ")})))) AS g
        FROM tokd WHERE len(tok) >= $DECON_N),
      ev AS (SELECT DISTINCT doc_id AS eval_id, g FROM g
             WHERE doc_id < $EVAL_MAX)
      SELECT c.doc_id,
             CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_ngrams,
             CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
      FROM g c JOIN ev ON c.g = ev.g
      WHERE c.doc_id >= $EVAL_MAX
      GROUP BY c.doc_id
      ORDER BY c.doc_id"""))

  /** D19's fuzzy-decontamination Jaccard threshold. Decontamination is
    * recall-oriented (a missed leak inflates benchmarks; an over-dropped
    * doc costs one document), so τ sits at D3's near-dup threshold, not
    * above it.
    */
  private val DECON_TAU = 0.5

  /** D19 — FUZZY decontamination: flag corpus documents NEAR-duplicating
    * any held-out eval document under the D3 MinHash-LSH scheme. D8's
    * exact n-gram probe misses paraphrased or lightly-edited leaks (the
    * common contamination mode — eval questions reformatted by a crawl
    * pipeline); the published fix (GPT-3 appendix C / Llama 2's fuzzy
    * decontamination) is the near-dup test against the eval set. Bands
    * derive from the ONE [[bandedFromShingles]] definition, so a doc
    * flagged here is exactly a doc the D3 pipeline would pair with an
    * eval doc — one signature scheme across batch dedup, the persisted
    * index, the stream, and decontamination.
    *
    * Scale shape: the eval side is bounded (a benchmark suite, not a
    * corpus), so its 8-band signature frame BROADCASTS; the corpus'
    * banded signatures are derived map-side (no shuffle — the bands
    * never aggregate, unlike D3's bucket-local pair enumeration) and
    * probe the broadcast eval buckets. Only the (rare) collisions
    * shuffle: candidate (doc_id, eval_id) pairs are id-width, and the
    * exact-Jaccard verification re-attaches the two shingle sets from
    * the shared persisted [[shingleSets]] frame (corpus side rides its
    * doc_id partitioning; eval side broadcasts). No occupancy cap: a
    * band key shared by half the corpus AND an eval doc means mass
    * contamination — the verification cost is the finding, not a skew
    * accident (cf. [[MAX_BUCKET]], which D3 needs because BOTH pair
    * sides are corpus-sized).
    */
  val dedupDeconFuzzy: Op = Op(
    "dedup_decon_fuzzy",
    (s, d) => {
      val sh = shingleSets(s, d)
      val bands = bandedFromShingles(sh)
        .select(col("doc_id"), col("band"), col("bkey"))
      val evalB = bands.filter(col("doc_id") < EVAL_MAX)
        .select(col("doc_id").as("eval_id"), col("band"), col("bkey"))
      val cand = bands.filter(col("doc_id") >= EVAL_MAX)
        .join(broadcast(evalB), Seq("band", "bkey"))
        .select(col("doc_id"), col("eval_id"))
        .distinct()
      val ev = sh.filter(col("doc_id") < EVAL_MAX)
        .select(col("doc_id").as("eval_id"), col("shs").as("shs_e"))
      val inter = size(array_intersect(col("shs"), col("shs_e")))
      cand.join(sh, "doc_id")
        .join(broadcast(ev), "eval_id")
        .select(col("doc_id"), col("eval_id"),
          (inter * lit(1.0) /
            (size(col("shs")) + size(col("shs_e")) - inter)).as("jaccard"))
        .filter(col("jaccard") >= DECON_TAU)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_eval_dups"),
          max(col("jaccard")).as("max_jaccard"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $sqlBandsCtes,
      evb AS (SELECT doc_id AS eval_id, band, bkey FROM bands
              WHERE doc_id < $EVAL_MAX),
      dcand AS (SELECT DISTINCT b.doc_id, e.eval_id
                FROM bands b JOIN evb e
                  ON b.band = e.band AND b.bkey = e.bkey
                WHERE b.doc_id >= $EVAL_MAX),
      dver AS (SELECT c.doc_id,
                      len(list_intersect(x.shs, y.shs)) * 1.0 /
                        (len(x.shs) + len(y.shs)
                          - len(list_intersect(x.shs, y.shs))) AS jaccard
               FROM dcand c
               JOIN shl x ON c.doc_id = x.doc_id
               JOIN shl y ON c.eval_id = y.doc_id)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_dups,
             max(jaccard) AS max_jaccard
      FROM dver WHERE jaccard >= $DECON_TAU
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** D20 — the per-EVAL-document CONTAMINATION REPORT: for every doc in
    * the held-out suite, how many corpus documents leak it through the
    * EXACT n-gram channel (D8's probe) and through the FUZZY near-dup
    * channel (D19's probe), with a verdict column — the per-benchmark
    * contamination table every model card publishes (the GPT-3 appendix
    * C / Llama-2 style "n-gram overlap + near-dup" audit, reported from
    * the eval set's point of view so a benchmark item that leaked is
    * visible even when no single corpus doc is flagged twice). Both
    * channels are the SAME probes the standalone ops run — the gram
    * pipeline and the [[bandedFromShingles]] signature scheme — so this
    * report can never drift from the gates it audits (the G12 funnel
    * doctrine).
    *
    * Scale shape: identical to D8/D19 — the eval side broadcasts, the
    * corpus never shuffles, only the (rare) hits aggregate; the report
    * aggregates key on eval_id, so every frame after the probes is
    * BENCHMARK-sized, and the final outer joins against the eval
    * universe are broadcast joins over suite-sized rows. Eval docs too
    * short to carry a single n-gram still report (zero-filled via the
    * eval-universe left joins).
    */
  val deconReport: Op = Op(
    "decon_report",
    (s, d) => {
      // exact channel: D8's gram probe, aggregated per EVAL doc
      val base = Tables.documents(s, d)
        .transform(graft.Tables.spreadBy(col("doc_id")))
        .select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("tok"))
        .filter(size(col("tok")) >= DECON_N)
      val grams = base
        .select(col("doc_id"),
          explode(ngramsFromTokens(col("tok"), DECON_N)).as("g"))
      val evalG = grams.filter(col("doc_id") < EVAL_MAX)
        .select(col("doc_id").as("eval_id"), col("g")).distinct()
      val exact = grams.filter(col("doc_id") >= EVAL_MAX)
        .join(broadcast(evalG), "g")
        .groupBy(col("eval_id"))
        .agg(countDistinct(col("doc_id")).as("n_exact_docs"),
          countDistinct(col("g")).as("n_shared_ngrams"))
      // fuzzy channel: D19's banded probe + exact-Jaccard verification,
      // aggregated per EVAL doc
      val sh = shingleSets(s, d)
      val bands = bandedFromShingles(sh)
        .select(col("doc_id"), col("band"), col("bkey"))
      val evalB = bands.filter(col("doc_id") < EVAL_MAX)
        .select(col("doc_id").as("eval_id"), col("band"), col("bkey"))
      val cand = bands.filter(col("doc_id") >= EVAL_MAX)
        .join(broadcast(evalB), Seq("band", "bkey"))
        .select(col("doc_id"), col("eval_id"))
        .distinct()
      val ev = sh.filter(col("doc_id") < EVAL_MAX)
        .select(col("doc_id").as("eval_id"), col("shs").as("shs_e"))
      val inter = size(array_intersect(col("shs"), col("shs_e")))
      val fuzzy = cand.join(sh, "doc_id")
        .join(broadcast(ev), "eval_id")
        .select(col("doc_id"), col("eval_id"),
          (inter * lit(1.0) /
            (size(col("shs")) + size(col("shs_e")) - inter)).as("jaccard"))
        .filter(col("jaccard") >= DECON_TAU)
        .groupBy(col("eval_id"))
        .agg(count(lit(1)).as("n_fuzzy_docs"),
          max(col("jaccard")).as("max_jaccard"))
      // the eval universe: every suite doc reports, leaked or not
      val evals = Tables.documents(s, d)
        .filter(col("doc_id") < EVAL_MAX)
        .select(col("doc_id").as("eval_id"))
      val nEx = coalesce(col("n_exact_docs"), lit(0L))
      val nFz = coalesce(col("n_fuzzy_docs"), lit(0L))
      evals.join(broadcast(exact), Seq("eval_id"), "left")
        .join(broadcast(fuzzy), Seq("eval_id"), "left")
        .select(col("eval_id"),
          nEx.as("n_exact_docs"),
          coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
          nFz.as("n_fuzzy_docs"),
          coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"),
          when(nEx > 0 && nFz > 0, "both")
            .when(nEx > 0, "exact")
            .when(nFz > 0, "fuzzy")
            .otherwise("clean").as("verdict"))
        .orderBy(col("eval_id"))
    },
    Some(s"""
      WITH $sqlBandsCtes,
      xtok AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      xg AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(tok) - ${DECON_N - 1}), i ->
                   concat_ws(' ', ${(0 until DECON_N)
                     .map(k => s"tok[i+$k]").mkString(", ")})))) AS g
        FROM xtok WHERE len(tok) >= $DECON_N),
      xev AS (SELECT DISTINCT doc_id AS eval_id, g FROM xg
              WHERE doc_id < $EVAL_MAX),
      xagg AS (SELECT xev.eval_id,
                      CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_exact_docs,
                      CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_ngrams
               FROM xg c JOIN xev ON c.g = xev.g
               WHERE c.doc_id >= $EVAL_MAX
               GROUP BY xev.eval_id),
      fevb AS (SELECT doc_id AS eval_id, band, bkey FROM bands
               WHERE doc_id < $EVAL_MAX),
      fcand AS (SELECT DISTINCT b.doc_id, e.eval_id
                FROM bands b JOIN fevb e
                  ON b.band = e.band AND b.bkey = e.bkey
                WHERE b.doc_id >= $EVAL_MAX),
      fver AS (SELECT c.doc_id, c.eval_id,
                      len(list_intersect(x.shs, y.shs)) * 1.0 /
                        (len(x.shs) + len(y.shs)
                          - len(list_intersect(x.shs, y.shs))) AS jaccard
               FROM fcand c
               JOIN shl x ON c.doc_id = x.doc_id
               JOIN shl y ON c.eval_id = y.doc_id),
      fagg AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_fuzzy_docs,
                      max(jaccard) AS max_jaccard
               FROM fver WHERE jaccard >= $DECON_TAU
               GROUP BY eval_id),
      evu AS (SELECT doc_id AS eval_id FROM documents
              WHERE doc_id < $EVAL_MAX)
      SELECT evu.eval_id,
             coalesce(x.n_exact_docs, 0) AS n_exact_docs,
             coalesce(x.n_shared_ngrams, 0) AS n_shared_ngrams,
             coalesce(f.n_fuzzy_docs, 0) AS n_fuzzy_docs,
             coalesce(f.max_jaccard, 0.0) AS max_jaccard,
             CASE WHEN coalesce(x.n_exact_docs, 0) > 0
                    AND coalesce(f.n_fuzzy_docs, 0) > 0 THEN 'both'
                  WHEN coalesce(x.n_exact_docs, 0) > 0 THEN 'exact'
                  WHEN coalesce(f.n_fuzzy_docs, 0) > 0 THEN 'fuzzy'
                  ELSE 'clean' END AS verdict
      FROM evu
      LEFT JOIN xagg x ON evu.eval_id = x.eval_id
      LEFT JOIN fagg f ON evu.eval_id = f.eval_id
      ORDER BY evu.eval_id"""))

  /** Span width for the duplicated-substring audit — long enough that a
    * shared span means copied text, not phrase reuse (Lee et al. use
    * 50 BPE tokens on web corpora; 8 words fits the ~60-word test docs).
    */
  private val SPAN_N = 8

  /** D10 — duplicated-span audit: for each document, the fraction of its
    * distinct [[SPAN_N]]-token spans that occur in at least one OTHER
    * document (span corpus-df ≥ 2; per-doc spans are distinct, so df
    * counts documents). The corpus-level repeated-text measurement of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al. 2022, ExactSubstr) at shingle granularity — distinct from C8
    * (intra-doc repetition), D8 (overlap vs a held-out set) and D2
    * (pairwise similarity): it scores every doc by how much of it exists
    * elsewhere in the corpus, the signal used to trim boilerplate and
    * templated spam before training.
    *
    * Scale shape: spans travel as 60-bit hashes (uniform keys — the
    * span-df shuffle can never skew on hot words, unlike a raw-token
    * key), the df aggregate is map-side combined, and the join back to
    * per-doc spans is a LEFT SEMI against the df≥2 spans only — the
    * dup set scales with actual duplication, not corpus size, so AQE
    * broadcasts it and the span stream shuffles exactly once (both
    * per-doc counts ride the persisted stream's doc_id partitioning).
    * No all-pairs anything.
    */
  val dedupSubstr: Op = Op(
    "dedup_substr",
    (s, d) => {
      // persist() (via Caches): the span stream feeds both the df
      // aggregate and the join-back; without it each consumer
      // re-shingles the corpus
      val grams = Caches.persist(Tables.documents(s, d)
        .transform(graft.Tables.spreadBy(col("doc_id")))
        .select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("tok"))
        .filter(size(col("tok")) >= SPAN_N)
        .select(col("doc_id"),
          explode(ngramsFromTokens(col("tok"), SPAN_N)).as("g"))
        .select(col("doc_id"), hash60(col("g")).as("gh")))
      // dup-only semi-join instead of a full df join-back (the r16
      // sf100 lesson from D15): the df aggregate's output is
      // one-group-per-distinct-span (~the corpus token count), so
      // joining it back wholesale re-shuffles the entire span stream
      // against an equally-huge build side. Only the DUPLICATED spans
      // matter — filter first (dup set scales with actual duplication,
      // not corpus size; AQE broadcasts it when it fits), and both
      // per-doc counts then aggregate on the persisted stream's
      // existing doc_id partitioning with no further shuffle.
      val dupGh = grams.groupBy(col("gh"))
        .agg(count(lit(1)).as("span_df"))
        .filter(col("span_df") >= 2)
        .select(col("gh"))
      val perDoc = grams.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"))
      val dupPerDoc = grams.join(dupGh, Seq("gh"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_spans"))
      perDoc.join(dupPerDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          (coalesce(col("n_dup_spans"), lit(0L)).cast("double")
            / col("n_spans")).as("dup_frac"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(tok) - ${SPAN_N - 1}), i ->
                   concat_ws(' ', ${(0 until SPAN_N)
                     .map(k => s"tok[i+$k]").mkString(", ")})))) AS g
        FROM tok WHERE len(tok) >= $SPAN_N),
      gh AS (SELECT doc_id, ${xhash60("g")} AS gh FROM g),
      df AS (SELECT gh, count(*) AS span_df FROM gh GROUP BY gh)
      SELECT c.doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN span_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
             CAST(sum(CASE WHEN span_df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS dup_frac
      FROM gh c JOIN df USING (gh)
      GROUP BY c.doc_id
      ORDER BY doc_id"""))

  /** D15's body over an arbitrary (doc_id, text) frame — the seam the
    * planted-duplicate spec drives with synthetic corpora.
    */
  private[graft] def substrRewriteFor(docs: DataFrame): DataFrame = {
    // persist: the token frame feeds the span stream AND the final
    // rewrite projection; the POSITIONED span stream feeds the df/keeper
    // aggregate AND the removal join (the D10 persist lesson, but this
    // op keeps positions — the audit's distinct-gram stream can't say
    // WHICH occurrence to cut)
    val toks = Caches.persist(docs
      .transform(graft.Tables.spreadBy(col("doc_id")))
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("tok")))
    val pos = Caches.persist(toks
      .filter(size(col("tok")) >= SPAN_N)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tok")) - lit(SPAN_N - 1)),
        p => struct(p.as("p"), hash60(concat_ws(" ",
          (0 until SPAN_N).map(kk =>
            element_at(col("tok"), p + lit(kk))): _*)).as("gh")))).as("s"))
      .select(col("doc_id"), col("s.p").as("p"), col("s.gh").as("gh"))
      // persist gh-PARTITIONED: the keeper aggregate and the removal
      // join-back both key on gh, so the one shuffle happens at
      // materialization and neither warm pass exchanges the corpus-
      // sized stream again (r16 sf100 decomp: the join-back leg
      // halved, 108.9 → 54.6 s warm)
      .repartition(col("gh")))
    // df ≥ 2 over DOCS ⟺ min(doc_id) ≠ max(doc_id): min/max partials
    // replace the countDistinct two-phase expand (the r16 sf100 decomp
    // measured the expand + unfiltered join-back at 97-132 s of the
    // 5M-doc forced pass), and filtering to dup-only spans BEFORE the
    // join-back shrinks the st side from every-span (213M groups at
    // sf100, ~one per corpus token) to just the duplicated spans — so
    // AQE can broadcast it when small enough, and either way the
    // join-back rides the persisted gh partitioning. At 100 TB the
    // dup-span set scales with actual duplication, not corpus size.
    val st = pos.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("keeper"),
        max(col("doc_id")).as("maxd"))
      .filter(col("maxd") > col("keeper"))
      .select(col("gh"), col("keeper"))
    // removed token positions per doc: every position covered by a span
    // that exists in ≥ 2 docs and whose first-occurrence doc (min
    // doc_id) is someone else — the keeper doc keeps ALL its copies
    // SORTED removal positions (not a bag): the rewrite below walks
    // them as segment boundaries, so membership never needs testing
    val remPos = pos.join(st, "gh")
      .filter(col("doc_id") > col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + lit(SPAN_N - 1))).as("t"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("t"))).as("rem"))
    // clean_text via the drop_positions kernel: ONE two-pointer pass
    // over (tokens, sorted removal positions) — O(L + |rem|) per doc.
    // The r13 watch item: the previous per-token `array_contains(rem,
    // i)` membership filter was O(L·|rem|) — quadratic for a long
    // fully-duplicated doc, the doc's hot loop at 100 TB with
    // book-length duplicates.
    toks.join(remPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("tok")).cast(LongType).as("n_tokens"),
        coalesce(size(col("rem")), lit(0)).cast(LongType)
          .as("n_removed_tokens"),
        call_function("drop_positions", col("tok"),
          coalesce(col("rem"), expr("CAST(array() AS ARRAY<INT>)")))
          .as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** D15 — ExactSubstr dedup as a REWRITE: emit the span-deduplicated
    * corpus, not just D10's audit numbers — the Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better")
    * deployment output, at doc granularity: a [[SPAN_N]]-token span
    * occurrence is cut when the span occurs in ≥ 2 documents and this
    * document is not its first occurrence (min doc_id keeps every copy
    * it holds — including intra-doc repeats, which are C8's repetition
    * signal, not cross-doc duplication). A token goes when ANY removed
    * span covers it; the output carries the cleaned text plus the token
    * mass accounting (n_tokens, n_removed_tokens) that reconciles with
    * D10's span-level audit.
    *
    * Scale shape: the positioned span stream is one row per token
    * (~corpus token count), shuffled ONCE — to the span-hash keeper
    * aggregate (min/max doc_id partials; df≥2 ⟺ min≠max, so no
    * countDistinct expand). The join back to the doc for the removal
    * set sees only the pre-filtered duplicated spans (AQE broadcasts
    * the dup set when it fits; SMJ on the filtered side otherwise),
    * and the removal rows it emits are positions only, id-width rows. The rewrite
    * itself is ONE projection over the persisted token frame: the
    * removal set rides in as a SORTED per-doc position array and
    * clean_text is rebuilt as the token slices between consecutive
    * removals — O(tokens + removals) per doc, never a per-token
    * membership scan (the r13 watch item's O(L·|rem|) hot loop) — and
    * the corpus text never shuffles at all. Boilerplate spans with huge df skew the stats join; AQE
    * skew-split handles the head keys (and the D2-style df cap drops in
    * unchanged if a corpus needs it — capped spans would simply never
    * be removed).
    */
  val dedupSubstrRewrite: Op = Op(
    "dedup_substr_rewrite",
    (s, d) => substrRewriteFor(Tables.documents(s, d)),
    Some {
      val gram = s"concat_ws(' ', ${(0 until SPAN_N)
        .map(kk => s"tok[p+$kk]").mkString(", ")})"
      s"""
      WITH tok AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      ghp AS (
        SELECT doc_id, unnest(generate_series(1, len(tok) - ${SPAN_N - 1}))
                 AS p, tok
        FROM tok WHERE len(tok) >= $SPAN_N),
      gh AS (SELECT doc_id, p, ${xhash60(gram)} AS gh FROM ghp),
      st AS (SELECT gh, count(DISTINCT doc_id) AS df,
                    min(doc_id) AS keeper
             FROM gh GROUP BY gh),
      rem AS (SELECT DISTINCT g.doc_id, g.p + k.k AS t
              FROM gh g JOIN st USING (gh)
              CROSS JOIN generate_series(0, ${SPAN_N - 1}) k(k)
              WHERE st.df >= 2 AND g.doc_id > st.keeper),
      tp AS (SELECT doc_id, unnest(generate_series(1, len(tok))) AS i, tok
             FROM tok),
      kept AS (SELECT tp.doc_id, tp.i, tp.tok[tp.i] AS w
               FROM tp LEFT JOIN rem
                 ON rem.doc_id = tp.doc_id AND rem.t = tp.i
               WHERE rem.doc_id IS NULL),
      agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text
              FROM kept GROUP BY doc_id),
      nr AS (SELECT doc_id, count(*) AS nrem FROM rem GROUP BY doc_id)
      SELECT t.doc_id,
             CAST(len(t.tok) AS BIGINT) AS n_tokens,
             CAST(coalesce(nr.nrem, 0) AS BIGINT) AS n_removed_tokens,
             coalesce(a.clean_text, '') AS clean_text
      FROM tok t
      LEFT JOIN agg a USING (doc_id)
      LEFT JOIN nr USING (doc_id)
      ORDER BY doc_id"""
    })

  /** D18 — SoftDeDup-style duplication REWEIGHTING (He et al. 2024,
    * "SoftDedup: an Efficient Data Reweighting Method for Speeding Up
    * Language Model Pre-training"): instead of D15's hard span
    * removal, down-WEIGHT common text — per document, commonness =
    * mean log2(span df) over its distinct [[SPAN_N]]-token spans
    * (unique spans contribute log2(1) = 0, so only the df ≥ 2 set is
    * ever scored), and the sampling weight is 1/(1 + commonness_bits):
    * a never-duplicated doc keeps weight 1.0, a doc whose every span
    * appears in 4 docs keeps 1/3. The kept flag realizes the weight as
    * a deterministic hash-Bernoulli draw (the G7/G16 priority hash, so
    * reruns and engines agree doc-by-doc) — the soft alternative the
    * paper measures against exact-dedup's all-or-nothing drop.
    *
    * All arithmetic is exact: commonness in Q16 via the [[graft.functions.FixedLog]]
    * kernel, weight_milli = 1000·2^16 div (2^16 + commonness), draw =
    * hash60 mod 1000 < weight_milli.
    *
    * Scale shape: D10's audit plan plus one broadcast-sized change —
    * the df join-back is INNER against the df ≥ 2 spans only (the
    * dup set scales with actual duplication, not corpus size), and
    * both per-doc aggregates ride the persisted span stream's doc_id
    * partitioning. No all-pairs, no corpus sort.
    */
  /** D18's body over an explicit (doc_id, text) frame — the seam the
    * planted-duplication spec drives directly.
    */
  private[graft] def softdedupWeights(docs: DataFrame): DataFrame = {
      val grams = Caches.persist(docs
        .transform(graft.Tables.spreadBy(col("doc_id")))
        .select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("tok"))
        .filter(size(col("tok")) >= SPAN_N)
        .select(col("doc_id"),
          explode(ngramsFromTokens(col("tok"), SPAN_N)).as("g"))
        .select(col("doc_id"), hash60(col("g")).as("gh")))
      val dupDf = grams.groupBy(col("gh"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      val perDoc = grams.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"))
      val dupBits = grams.join(dupDf, "gh")
        .select(col("doc_id"),
          graft.functions.FixedLog.bitsQ16(col("df"), lit(1L)).as("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("b")).as("sum_bits"))
      perDoc.join(dupBits, Seq("doc_id"), "left")
        // sum_bits ≥ 0 (df ≥ 2 ⇒ log2 ≥ 1), so truncating div IS floor
        .select(col("doc_id"), col("n_spans"),
          expr("coalesce(sum_bits, 0L) div n_spans").as("common_q16"))
        .select(col("doc_id"), col("n_spans"), col("common_q16"),
          expr("(1000 * 65536) div (65536 + common_q16)")
            .as("weight_milli"))
        .withColumn("kept",
          pmod(hash60(concat(lit("softdedup|"), col("doc_id"))),
            lit(1000L)) < col("weight_milli"))
        .orderBy(col("doc_id"))
  }

  val sampleSoftdedup: Op = Op(
    "sample_softdedup",
    (s, d) => softdedupWeights(Tables.documents(s, d)),
    Some(s"""
      WITH tok AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(tok) - ${SPAN_N - 1}), i ->
                   concat_ws(' ', ${(0 until SPAN_N)
                     .map(k => s"tok[i+$k]").mkString(", ")})))) AS g
        FROM tok WHERE len(tok) >= $SPAN_N),
      gh AS (SELECT doc_id, ${xhash60("g")} AS gh FROM g),
      dup AS (SELECT gh, CAST(count(*) AS BIGINT) AS df
              FROM gh GROUP BY gh HAVING count(*) >= 2),
      per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
              FROM gh GROUP BY doc_id),
      dsrc AS (SELECT c.doc_id, dup.df AS df
               FROM gh c JOIN dup USING (gh)),
      ${graft.functions.FixedLog.sqlRounds(
        "dsrc", Seq("doc_id"), "df", "1", "sb")},
      db AS (SELECT doc_id, CAST(sum(bits_q16) AS BIGINT) AS sum_bits
             FROM sb GROUP BY doc_id),
      soft AS (
        SELECT p.doc_id, p.n_spans,
               coalesce(db.sum_bits, 0) // p.n_spans AS common_q16
        FROM per p LEFT JOIN db USING (doc_id))
      SELECT doc_id, n_spans, CAST(common_q16 AS BIGINT) AS common_q16,
             CAST((1000 * 65536) // (65536 + common_q16) AS BIGINT)
               AS weight_milli,
             ${xhash60("'softdedup|' || doc_id")} % 1000 <
               (1000 * 65536) // (65536 + common_q16) AS kept
      FROM soft
      ORDER BY doc_id"""))

  /** D17's dials. LINE_DF: the public C4/CCNet line-dedup recipe —
    * a line occurring ≥ 3 times corpus-wide is boilerplate; every
    * occurrence but the corpus-first is dropped. LINE_TOKENS: the gate
    * corpus has no newlines, so the BOARD query derives a
    * line-structured corpus by inserting a newline every LINE_TOKENS
    * tokens (deterministic, replayed verbatim in the oracle — the
    * operator itself consumes real newline-delimited text).
    * LINE_POS_W packs (doc_id, line_idx) into one orderable key for
    * the first-occurrence argmin; documents are bounded at 2^20 lines
    * (a 100 TB corpus shard with longer docs raises the width — it is
    * a dial, not a structural limit).
    */
  private val LINE_TOKENS = 8
  private val LINE_DF = 3
  private val LINE_POS_W = 1L << 20

  /** D17's body over any (doc_id, text) frame with newline-delimited
    * lines — the seam the planted-boilerplate spec drives directly.
    *
    * The D15 plan shape at line granularity: the positioned line
    * stream (doc_id, li, line-hash) is id-width rows, shuffled twice —
    * once to the per-hash (df, first-occurrence) aggregate (map-side
    * combined), once back to the doc as removal positions; the corpus
    * TEXT never shuffles (the rewrite is one projection over the
    * doc-partitioned persisted line-array frame, rejoining kept lines
    * with the one-pass drop_positions_sep kernel). Blank lines are
    * structure, not boilerplate: they are exempt from counting and
    * removal on both sides.
    */
  private[graft] def dedupLinesFor(docs: DataFrame): DataFrame = {
    val lns = Caches.persist(docs
      .transform(graft.Tables.spreadBy(col("doc_id")))
      .select(col("doc_id"), split(col("text"), "\n").as("lines")))
    val pos = Caches.persist(lns
      .select(col("doc_id"), posexplode(col("lines")))
      .filter(trim(col("col")) =!= "")
      .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("li"),
        hash60(col("col")).as("lh")))
    // keep-one discipline guard (r16, the r15 advisory): a doc with
    // ≥ LINE_POS_W non-blank lines — or a doc_id big enough that the
    // multiply overflows Long — would silently ALIAS packed keys, so
    // the keeper argmin could crown a wrong occurrence or drop every
    // copy of a line. The width is a dial; exceeding it must fail
    // loudly, not corrupt the rewrite.
    val pk = when(
      col("li") >= lit(LINE_POS_W) ||
        col("doc_id") >= lit(Long.MaxValue / LINE_POS_W),
      raise_error(concat(
        lit("dedup_lines: (doc_id, line_idx) exceeds the LINE_POS_W="),
        lit(LINE_POS_W),
        lit(" packing width (doc_id="), col("doc_id"),
        lit(", li="), col("li"), lit(") — raise the dial"))))
      .otherwise(col("doc_id") * lit(LINE_POS_W) + col("li"))
    val st = pos.groupBy(col("lh"))
      .agg(count(lit(1)).as("df"), min(pk).as("keeper"))
    val remPos = pos.join(st, "lh")
      .filter(col("df") >= LINE_DF && pk =!= col("keeper"))
      .select(col("doc_id"), col("li").cast("int").as("t"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("t"))).as("rem"))
    lns.join(remPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("lines")).cast(LongType).as("n_lines"),
        coalesce(size(col("rem")), lit(0)).cast(LongType)
          .as("n_removed_lines"),
        call_function("drop_positions_sep", col("lines"),
          coalesce(col("rem"), expr("CAST(array() AS ARRAY<INT>)")),
          lit("\n")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** D17 — LINE-level exact dedup as a REWRITE: the cheapest and most
    * common public dedup stage (the C4 recipe's boilerplate pass —
    * drop any line occurring ≥ [[LINE_DF]] times in the corpus, except
    * its corpus-first occurrence), sitting between D1's whole-document
    * granularity and D15's overlapping 8-token spans: lines are
    * NON-overlapping, newline-delimited units, so the removal stream
    * is at most one entry per line (vs per token), and navigation
    * boilerplate/cookie banners — which D15 only trims down to span
    * fragments — disappear wholly.
    *
    * Output per doc: n_lines, n_removed_lines, clean_text (kept lines
    * re-joined with newlines). The keeper (corpus-first occurrence by
    * (doc_id, line-position)) keeps its copy, so no line's content
    * ever vanishes from the corpus entirely — the same keep-one
    * discipline as D1/D15.
    */
  val dedupLines: Op = Op(
    "dedup_lines",
    (s, d) => {
      // derive the line-structured corpus: a newline every LINE_TOKENS
      // tokens (see the dials doc) — the oracle replays this exactly
      val tok = split(trim(lower(col("text"))), "\\s+")
      val seg = transform(
        sequence(lit(0),
          ((size(tok) - 1) / lit(LINE_TOKENS)).cast("int")),
        s0 => concat_ws(" ",
          slice(tok, s0 * lit(LINE_TOKENS) + 1, lit(LINE_TOKENS))))
      dedupLinesFor(Tables.documents(s, d)
        .select(col("doc_id"), array_join(seg, "\n").as("text")))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      seg AS (
        SELECT doc_id, unnest(generate_series(0, (len(tok) - 1) // $LINE_TOKENS))
                 AS s, tok
        FROM tok),
      ln AS (
        SELECT doc_id, CAST(s + 1 AS BIGINT) AS li,
               array_to_string(tok[s*$LINE_TOKENS+1 : s*$LINE_TOKENS+$LINE_TOKENS],
                 ' ') AS line
        FROM seg),
      lp AS (SELECT doc_id, li, ${xhash60("line")} AS lh
             FROM ln WHERE trim(line, ' ') <> ''),
      st AS (SELECT lh, count(*) AS df,
                    min(doc_id * $LINE_POS_W + li) AS keeper
             FROM lp GROUP BY lh),
      rem AS (SELECT l.doc_id, l.li
              FROM lp l JOIN st USING (lh)
              WHERE st.df >= $LINE_DF
                AND l.doc_id * $LINE_POS_W + l.li <> st.keeper),
      kept AS (SELECT n.doc_id, n.li, n.line
               FROM ln n LEFT JOIN rem r
                 ON r.doc_id = n.doc_id AND r.li = n.li
               WHERE r.doc_id IS NULL),
      agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY li)
                       AS clean_text
              FROM kept GROUP BY doc_id),
      nl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
             FROM ln GROUP BY doc_id),
      nr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nrem
             FROM rem GROUP BY doc_id)
      SELECT d.doc_id, nl.n_lines,
             coalesce(nr.nrem, 0) AS n_removed_lines,
             coalesce(a.clean_text, '') AS clean_text
      FROM documents d
      JOIN nl USING (doc_id)
      LEFT JOIN agg a ON a.doc_id = d.doc_id
      LEFT JOIN nr ON nr.doc_id = d.doc_id
      ORDER BY d.doc_id"""))

  /** D11's keep/drop threshold: in-cell pairs at or above this cosine
    * are semantic duplicates (the corpus plants its near-dup structure
    * around [0.3, 0.5) — 0.35 drops ~10% at the gate SFs, so the
    * verdict genuinely varies with the data).
    */
  private val SEM_TAU = 0.35

  /** D11's in-cell sub-bucketing dial: below ~512 mean occupancy the
    * cell itself bounds the pair enumeration (None — the oracle-exact
    * default region, which covers every gate SF: 500 vectors / 16
    * cells ≈ 31); above it, 4 LSH tables of enough planes to bring
    * per-(cell, bucket) occupancy back to ~64, so in-task pair work
    * stays bounded while recall degrades gracefully (4-table
    * OR-amplification, the D3/D5 band argument).
    */
  private[graft] def semSubGeometry(
      n: Long, cells: Int): Option[AnnOps.LshGeometry] = {
    val occ = n.toDouble / cells
    if (occ <= 512) None
    else Some(AnnOps.LshGeometry(4, math.max(1, math.min(24,
      math.ceil(math.log(occ / 64.0) / math.log(2.0)).toInt))))
  }

  /** D11's body at an explicit geometry (cells + optional in-cell LSH),
    * the [[graft.GeometryCheck]]-style seam. */
  private[graft] def semanticAt(
      s: SparkSession,
      d: String,
      cells: Int,
      sub: Option[AnnOps.LshGeometry]): DataFrame = {
    // the assign + bucket-local pair machinery is the SHARED
    // [[AnnOps.cellBucketedPairs]] generator (E14's k-NN graph runs the
    // identical candidate semantics — factored r13 so they cannot
    // drift); cells are the TRAINED per-corpus [[CentroidIndex]]
    // artifact (r16 — slice seeds collapse on cluster-ordered ingest,
    // the r15 tune table's 0.525→0.95 recall gap); D11 applies its τ
    // threshold to the deduped pair stream
    val (assign, allPairs) = AnnOps.cellBucketedPairs(
      AnnOps.withNorm(s, d), CentroidIndex.forCorpus(s, d, cells), sub)
    val pairs = allPairs.filter(col("cos") >= SEM_TAU)
    val dup = pairs.groupBy(col("j"))
      .agg(count(lit(1)).as("n_dups"), max(col("cos")).as("max_dup_cos"))
    assign.join(dup, assign("vec_id") === dup("j"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("max_dup_cos"),
        (coalesce(col("n_dups"), lit(0L)) === 0).as("keep"))
      .orderBy(col("vec_id"))
  }

  /** D11 — SemDeDup-style SEMANTIC deduplication: cluster the embedding
    * corpus with the IVF coarse quantizer (nearest of a deterministic
    * centroid set — E3's cells), then score pairs WITHIN each cluster
    * and drop every vector with a higher-priority (lower-id) in-cell
    * neighbor at cos ≥ τ. This is the embedding-space dedup that D5's
    * random-hyperplane blocking cannot express: D5 finds pairs that
    * collide under RANDOM projections (near-duplicate geometry); D11
    * groups by SEMANTIC neighborhood first, so the pruning rate is
    * per-topic — the published SemDeDup recipe (k-means cells +
    * within-cell cosine pruning), re-expressed with this engine's
    * exact-micros cosine and bucket-local pair enumeration.
    *
    * Scale shape: assignment is n·cells codegen'd dot products against
    * a BROADCAST centroid set, collapsed map-side by the max_by
    * aggregate (id-width shuffle). With the √n cell dial that
    * assignment grows as n^1.5 — fine through ~10⁷ vectors (sf100's 2M
    * × 354 cells materializes in ~1 min at local[32]) but the known
    * k-means-assignment wall above it; the standard deployment fixes
    * compose here without semantic change: a two-level centroid tree
    * (√cells coarse probes prune the centroid set per vector) or
    * reusing E6's persisted LSH buckets as an assignment prefilter,
    * both public-recipe refinements of the same argmax. Pair enumeration is cell-local with
    * the vectors riding in the bucket rows (one corpus-sized shuffle);
    * above ~512 mean occupancy an in-cell LSH sub-bucketing
    * ([[semSubGeometry]]) bounds the in-task quadratic, the same dial
    * D5 runs. Cells grow √n ([[AnnOps.ivfCellsFor]]), so both knobs
    * move with the corpus; every gate SF resolves to the oracle-pinned
    * 16 cells with no sub-bucketing (default region n ≤ 4096, same 2×
    * margin as D5).
    */
  val dedupSemantic: Op = Op(
    "dedup_semantic",
    (s, d) => {
      val n = Tables.embeddings(s, d).count()
      val cells = AnnOps.ivfCellsFor(n)
      val sub = semSubGeometry(n, cells)
      AnnOps.logGeometryDivergence("dedup_semantic", (cells, sub),
        (AnnOps.CENTROIDS, None))
      semanticAt(s, d, cells, sub)
    },
    Some(sqlSemanticAt(AnnOps.CENTROIDS, None)))

  /** D11's DuckDB twin at an ARBITRARY geometry — the board oracle is
    * this at (16 cells, no sub-bucketing); [[graft.GeometryCheck]]
    * replays it at the corpus-derived geometry above gate scale, so
    * parity is provable at the geometry the engine actually deploys
    * (the sqlEmbeddingPairs precedent; centroids AND sub-planes are
    * both index-parameterized).
    */
  private[graft] def sqlSemanticAt(
      cells: Int, sub: Option[AnnOps.LshGeometry]): String = {
    // with sub-bucketing, a pair counts iff it shares the cell AND a
    // (tbl, bucket) in >=1 sub-table; cos is functionally determined by
    // (i, j), so DISTINCT replays the engine's groupBy(i, j) collapse
    val pairCte = sub match {
      case None =>
        s"""pr AS (SELECT a.vec_id AS i, b.vec_id AS j,
                    ${AnnOps.sqlCos("a", "b")} AS cos
             FROM m a JOIN m b
               ON a.cell = b.cell AND a.vec_id < b.vec_id)"""
      case Some(g) =>
        val bandSelects = (0 until g.tables).map(t =>
          s"SELECT vec_id, $t AS tbl, ${AnnOps.sqlBucket("m", t, g)} AS bucket FROM m")
          .mkString("\n        UNION ALL ")
        s"""bk AS (
        $bandSelects
      ),
      mb AS (SELECT m.vec_id, m.embedding, m.nm, m.cell, bk.tbl, bk.bucket
             FROM m JOIN bk USING (vec_id)),
      pr AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j,
                    ${AnnOps.sqlCos("a", "b")} AS cos
             FROM mb a JOIN mb b
               ON a.cell = b.cell AND a.tbl = b.tbl AND a.bucket = b.bucket
                 AND a.vec_id < b.vec_id)"""
    }
    s"""
      WITH ${AnnOps.sqlNormCte},
      ${AnnOps.sqlIvfTrainCtes(cells, AnnOps.IVF_ROUNDS)},
      ${AnnOps.sqlIvfAssignAggCte(AnnOps.IVF_ROUNDS)},
      m AS (SELECT e.vec_id, e.embedding, e.nm, assign.cell
            FROM e JOIN assign USING (vec_id)),
      $pairCte,
      dup AS (SELECT j, count(*) AS n_dups, max(cos) AS max_dup_cos
              FROM pr WHERE cos >= $SEM_TAU GROUP BY j)
      SELECT a.vec_id, a.cell,
             CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
             d.max_dup_cos,
             coalesce(d.n_dups, 0) = 0 AS keep
      FROM assign a LEFT JOIN dup d ON a.vec_id = d.j
      ORDER BY a.vec_id"""
  }

  /** Bloom geometry (D12): 256 words × 63 usable bits = 16,128 bits, 3
    * hash probes per n-gram. Sized against the ~1.4k distinct eval grams
    * at the gate SFs so the fill ratio lands near 23% and the per-gram
    * false-positive rate near (0.23)³ ≈ 1.2% — false positives genuinely
    * occur in the output, which is what makes the two-stage
    * (filter → exact verify) design load-bearing rather than decorative.
    * Bits 0..62 only: DuckDB's `<<` range-errors at 63 where the JVM
    * wraps, so the portable word is 63 bits wide.
    */
  private val BLOOM_WORDS = 256
  private val BLOOM_BITS = BLOOM_WORDS * 63
  private val BLOOM_K = 3

  /** Probe j's bit position from an ALREADY MATERIALIZED md5 hex column:
    * 5 hex chars (20 bits) sliced at offset j·5, mod the bitset width.
    * One md5 per gram feeds all three probes — the md5 IS the corpus
    * stream's dominant per-gram cost, so deriving the k positions from
    * one digest (instead of k salted digests) cuts the map-side work
    * ~3× (measured 1.27 → ~0.6 s at sf0.1).
    */
  private def bloomPos(j: Int, h: Column): Column =
    pmod(conv(substring(h, j * 5 + 1, 5), 16, 10).cast(LongType),
      lit(BLOOM_BITS.toLong))

  /** Build the fixed-size bitset from a distinct-gram frame (column
    * `g`) — collected driver-side (2 KB). Factored out so the streaming
    * ingest edge ([[graft.streaming.DocIngest]]) builds its filter from
    * the SAME definition D12 checks against the oracle.
    */
  private[graft] def bloomBitset(evalG: DataFrame): Array[Long] = {
    val words = new Array[Long](BLOOM_WORDS)
    evalG
      .select(md5(col("g")).as("h"))
      .select(explode(array((0 until BLOOM_K).map(j =>
        bloomPos(j, col("h"))): _*)).as("pos"))
      .select(floor(col("pos") / lit(63)).cast("int").as("w_idx"),
        call_function("shiftleft", lit(1L),
          (col("pos") % lit(63L)).cast("int")).as("wbit"))
      .groupBy(col("w_idx"))
      .agg(expr("bit_or(wbit)").as("w"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test of a gram COLUMN against a built bitset: one md5 +
    * [[BLOOM_K]] sliced-position word probes, pure row-local expression
    * work (usable inside streaming filters and HOF lambdas).
    */
  private[graft] def bloomHit(words: Array[Long], g: Column): Column = {
    val wordsCol = typedLit(words.toSeq)
    val h = md5(g)
    (0 until BLOOM_K).map { j =>
      val p = bloomPos(j, h)
      element_at(wordsCol, floor(p / lit(63)).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % lit(63L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** The n-gram width D12/D8 and the streaming decon stage share. */
  private[graft] def deconN: Int = DECON_N

  /** DuckDB twin of [[bloomPos]] over a hex column expression. */
  private def sqlBloomPos(j: Int, h: String): String =
    s"CAST(('0x' || substr($h, ${j * 5 + 1}, 5)) AS BIGINT) % $BLOOM_BITS"

  /** D12 — Bloom-filter decontamination: the FIXED-SIZE-broadcast
    * variant of D8. D8 broadcasts the raw eval n-gram index, whose size
    * grows with the eval suite (a full benchmark union is GBs — too big
    * to ship to every task); the Bloom bitset is a constant-size bit
    * array (2 KB here; ~1 GB covers 10⁹ grams at 1% FP) built ONCE from
    * the eval side and carried into the corpus scan as a literal, so
    * membership is 3 md5 probes + 3 array-word tests per corpus n-gram —
    * pure map-side codegen, zero joins for the overwhelming majority of
    * grams that miss. Only Bloom survivors (true overlaps + the ~1% false
    * positives) reach the exact verification join against the real eval
    * set, and the output separates the two (`n_exact_hits` vs
    * `n_false_pos`) — the standard two-stage shape of production
    * decontamination/URL filters (Bloom 1970; the CCNet/Dolma-family
    * dedup filters use exactly this pre-filter-then-verify split).
    *
    * Spark shape: the eval bitset is a tiny aggregate collected
    * driver-side (model-sized driver traffic — the C18/E8 precedent) and
    * re-emitted as a 256-long literal array; the corpus n-gram stream is
    * scanned once, filtered map-only, and only the rare survivors join
    * the broadcast exact set. At 100 TB the corpus side never shuffles
    * at all — the one aggregate runs on the (rare) verified hits.
    */
  val dedupBloom: Op = Op(
    "dedup_bloom",
    (s, d) => {
      // the eval slice filters BEFORE tokenization (its own tiny scan —
      // leaving one shared gram stream put the doc_id filter above the
      // repartition, so the bitset-build action re-tokenized the whole
      // corpus); the corpus side drops the eval docs at its scan the
      // same way
      def gramsOf(docs: DataFrame): DataFrame = docs
        .select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("tok"))
        .filter(size(col("tok")) >= DECON_N)
        .select(col("doc_id"),
          explode(ngramsFromTokens(col("tok"), DECON_N)).as("g"))
      // persist: the eval gram set feeds the bitset build (driver
      // collect) AND the exact-verify broadcast join
      val evalG = Caches.persist(gramsOf(
        Tables.documents(s, d).filter(col("doc_id") < EVAL_MAX))
        .select(col("g")).distinct())
      val grams = gramsOf(Tables.documents(s, d)
        .filter(col("doc_id") >= EVAL_MAX)
        .transform(graft.Tables.spreadBy(col("doc_id"))))
      val words = new Array[Long](BLOOM_WORDS)
      evalG
        .select(md5(col("g")).as("h"))
        .select(explode(array((0 until BLOOM_K).map(j =>
          bloomPos(j, col("h"))): _*)).as("pos"))
        .select(floor(col("pos") / lit(63)).cast("int").as("w_idx"),
          call_function("shiftleft", lit(1L),
            (col("pos") % lit(63L)).cast("int")).as("wbit"))
        .groupBy(col("w_idx"))
        .agg(expr("bit_or(wbit)").as("w"))
        .collect()
        .foreach(r => words(r.getInt(0)) = r.getLong(1))
      val wordsCol = typedLit(words.toSeq)
      def member(j: Int): Column = {
        val p = bloomPos(j, col("h"))
        element_at(wordsCol, floor(p / lit(63)).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L),
            (p % lit(63L)).cast("int"))) =!= lit(0L)
      }
      grams
        // one digest per gram, materialized ahead of the three probe
        // tests
        .select(col("doc_id"), col("g"), md5(col("g")).as("h"))
        .filter((0 until BLOOM_K).map(member).reduce(_ && _))
        .select(col("doc_id"), col("g"))
        .join(broadcast(evalG.withColumn("exact", lit(1L))),
          Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bloom_hits"),
          sum(coalesce(col("exact"), lit(0L))).as("n_exact_hits"))
        .select(col("doc_id"), col("n_bloom_hits"), col("n_exact_hits"),
          (col("n_bloom_hits") - col("n_exact_hits")).as("n_false_pos"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH tokd AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(tok) - ${DECON_N - 1}), i ->
                   concat_ws(' ', ${(0 until DECON_N)
                     .map(k => s"tok[i+$k]").mkString(", ")})))) AS g
        FROM tokd WHERE len(tok) >= $DECON_N),
      ev AS (SELECT DISTINCT g FROM g WHERE doc_id < $EVAL_MAX),
      evpos AS (
        SELECT unnest([${(0 until BLOOM_K)
          .map(j => sqlBloomPos(j, "md5(g)")).mkString(", ")}]) AS pos
        FROM ev),
      words AS (
        SELECT CAST(pos // 63 AS INT) AS w_idx,
               bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS w
        FROM evpos GROUP BY 1),
      ch AS (
        SELECT doc_id, g, md5(g) AS h
        FROM g WHERE doc_id >= $EVAL_MAX),
      cpos AS (
        SELECT doc_id, g,
               unnest([${(0 until BLOOM_K)
                 .map(j => sqlBloomPos(j, "h")).mkString(", ")}]) AS pos
        FROM ch),
      hits AS (
        SELECT doc_id, g
        FROM cpos JOIN words ON CAST(pos // 63 AS INT) = w_idx
        WHERE (w & (1::BIGINT << CAST(pos % 63 AS INT))) <> 0
        GROUP BY doc_id, g
        HAVING count(*) = $BLOOM_K)
      SELECT h.doc_id,
             CAST(count(*) AS BIGINT) AS n_bloom_hits,
             CAST(sum(CASE WHEN e2.g IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_exact_hits,
             CAST(count(*) - sum(CASE WHEN e2.g IS NOT NULL THEN 1 ELSE 0
               END) AS BIGINT) AS n_false_pos
      FROM hits h LEFT JOIN ev e2 USING (g)
      GROUP BY h.doc_id
      ORDER BY doc_id"""))

  /** D13 — canonical-URL deduplication: the FIRST dedup stage of every
    * crawl pipeline, upstream even of D1's content hash — the same page
    * fetched as `HTTPS://WWW.Host:443/a/?utm_source=x#frag` and
    * `https://host/a?…` must collapse before anything downstream counts
    * it twice. Canonicalization is the RFC-3986-style normalization +
    * tracking-hygiene every crawler applies: lowercase scheme/host,
    * strip default ports (:80/:443), strip `www.`, drop the fragment,
    * strip trailing path slashes, drop tracking parameters
    * (`utm_*`/`fbclid`/`gclid`/`ref`), and SORT the surviving query
    * parameters so order never splits a group. The corpus has no URLs,
    * so each document synthesizes one deterministically with planted
    * variant decorations (the C16/C17 fake-payload pattern — six
    * variants per canonical target exercising every rule, including a
    * pair that only collapses because param sorting AND utm-stripping
    * both fire); the CANONICALIZER is what the oracle checks, and group
    * sizes vary with the corpus.
    *
    * Scale shape: canonicalization is pure per-row regex/array work in
    * one codegen'd projection (the C17 regex subset — Java ∩ RE2, so
    * both engines agree byte-for-byte), followed by D1's exact-dedup
    * shuffle on the canonical string — uniform-ish keys (URL hash), one
    * map-side-combined aggregate. At 100 TB this is the cheapest dedup
    * pass in the pipeline and runs first precisely because it is.
    */
  val dedupUrl: Op = Op(
    "dedup_url",
    (s, d) => {
      val g = expr("doc_id div 6")
      val k = pmod(g, lit(7)).cast("string")
      val gs = g.cast("string")
      val ms = (g + lit(1000000L)).cast("string")
      val url = when(pmod(col("doc_id"), lit(6)) === 0,
          concat(lit("https://h"), k, lit(".example.com/article/"), gs,
            lit("?id="), gs))
        .when(pmod(col("doc_id"), lit(6)) === 1,
          concat(lit("https://H"), k, lit(".EXAMPLE.COM/article/"), gs,
            lit("?utm_source=feed&id="), gs))
        .when(pmod(col("doc_id"), lit(6)) === 2,
          concat(lit("https://www.h"), k, lit(".example.com:443/article/"),
            gs, lit("/?id="), gs, lit("#top")))
        .when(pmod(col("doc_id"), lit(6)) === 3,
          concat(lit("https://h"), k, lit(".example.com/article/"), gs,
            lit("?page=2&id="), gs))
        .when(pmod(col("doc_id"), lit(6)) === 4,
          concat(lit("https://h"), k, lit(".example.com/article/"), gs,
            lit("?id="), gs, lit("&page=2&utm_campaign=promo")))
        .otherwise(
          concat(lit("https://h"), k, lit(".example.com/article/"), ms,
            lit("?id="), ms))
      val noFrag = regexp_replace(col("url"), "#.*$", "")
      val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
      val hostport = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
      val host = regexp_replace(
        regexp_replace(hostport, ":(80|443)$", ""), "^www\\.", "")
      val path = regexp_replace(
        regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
      val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
      val params = array_join(array_sort(filter(split(query, "&"),
        x => x =!= "" && !x.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))), "&")
      Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), concat(scheme, lit("://"), host, path,
          when(params === "", lit("")).otherwise(concat(lit("?"), params)))
          .as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    },
    Some(s"""
      WITH u AS (
        SELECT doc_id,
               CASE CAST(doc_id % 6 AS INT)
                 WHEN 0 THEN 'https://h' || (doc_id // 6) % 7 ||
                   '.example.com/article/' || doc_id // 6 ||
                   '?id=' || doc_id // 6
                 WHEN 1 THEN 'https://H' || (doc_id // 6) % 7 ||
                   '.EXAMPLE.COM/article/' || doc_id // 6 ||
                   '?utm_source=feed&id=' || doc_id // 6
                 WHEN 2 THEN 'https://www.h' || (doc_id // 6) % 7 ||
                   '.example.com:443/article/' || doc_id // 6 ||
                   '/?id=' || doc_id // 6 || '#top'
                 WHEN 3 THEN 'https://h' || (doc_id // 6) % 7 ||
                   '.example.com/article/' || doc_id // 6 ||
                   '?page=2&id=' || doc_id // 6
                 WHEN 4 THEN 'https://h' || (doc_id // 6) % 7 ||
                   '.example.com/article/' || doc_id // 6 ||
                   '?id=' || doc_id // 6 || '&page=2&utm_campaign=promo'
                 ELSE 'https://h' || (doc_id // 6) % 7 ||
                   '.example.com/article/' || (doc_id // 6 + 1000000) ||
                   '?id=' || (doc_id // 6 + 1000000)
               END AS url
        FROM documents),
      nf AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nf FROM u),
      parts AS (
        SELECT doc_id,
               lower(regexp_extract(nf, '^([A-Za-z]+)://', 1)) AS scheme,
               regexp_replace(regexp_replace(
                 lower(regexp_extract(nf, '^[A-Za-z]+://([^/?#]+)', 1)),
                 ':(80|443)$$', ''), '^www\\.', '') AS host,
               regexp_replace(
                 regexp_extract(nf, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                 '/+$$', '') AS path,
               array_to_string(list_sort(list_filter(
                 str_split(regexp_extract(nf, '\\?([^#]*)', 1), '&'),
                 x -> x <> '' AND NOT regexp_matches(x,
                   '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS params
        FROM nf),
      c AS (
        SELECT doc_id,
               scheme || '://' || host || path ||
                 CASE WHEN params = '' THEN '' ELSE '?' || params END
                 AS canon_url
        FROM parts)
      SELECT canon_url, min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM c
      GROUP BY canon_url
      ORDER BY keep_id"""))

  /** D14's keep threshold: pairs where the smaller document's shingle
    * set is ≥ 70% inside the larger one's.
    */
  private val CONT_TAU = 0.7

  /** D14 — shingle CONTAINMENT pairs: Broder's asymmetric companion to
    * D2's resemblance ("On the Resemblance and Containment of
    * Documents", Broder 1997): c(A,B) = |S(A)∩S(B)| / |S(A)| — how much
    * of the SMALLER document lives inside the larger. This is the
    * inclusion detector symmetric Jaccard structurally misses: a short
    * document quoted wholesale inside a long one scores
    * containment ≈ 1 while Jaccard ≈ |A|/|B| ≈ 0 — exactly the
    * quote/boilerplate/subset duplication a curation pass wants flagged
    * (the output carries BOTH measures so the divergence is visible).
    *
    * Same plan as D2 — the shared-shingle candidate generator with the
    * df cap, bucket-local pair enumeration, set sizes riding in the
    * collected structs (two shuffles, zero joins) — and the same capped
    * semantics: capped shingles leave the intersection, denominators
    * stay full-set.
    */
  val dedupContainment: Op = Op(
    "dedup_containment",
    (s, d) => {
      val sh = shingleRows(s, d).withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // spread on the shingle key (r20): same straggler fix as
      // jaccardPairs — the pair-enumeration kernel downstream of this
      // exchange must not run on the handful of tasks AQE's byte-based
      // coalescing leaves
      pairRows(Tables.spread(sh, col("s")).groupBy(col("s"))
        .agg(sort_array(collect_list(
          struct(col("doc_id"), col("n")))).as("ds"))
        .filter(size(col("ds")).between(2, MAX_DF)), "ds")
        .groupBy(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
          col("x.n").as("n_i"), col("y.n").as("n_j"))
        .agg(count(lit(1)).as("c"))
        .select(col("i"), col("j"), col("n_i"), col("n_j"),
          col("c").as("n_shared"),
          (col("c") * lit(1.0) / least(col("n_i"), col("n_j")))
            .as("containment"),
          (col("c") * lit(1.0) / (col("n_i") + col("n_j") - col("c")))
            .as("jaccard"))
        .filter(col("containment") >= CONT_TAU)
        .orderBy(col("i"), col("j"))
    },
    Some(s"""
      WITH $sqlShingleCte,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      dfc AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $MAX_DF),
      common AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                 FROM sh a JOIN sh b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN dfc ON a.s = dfc.s
                 GROUP BY 1, 2)
      SELECT i, j, x.n AS n_i, y.n AS n_j, c AS n_shared,
             c * 1.0 / least(x.n, y.n) AS containment,
             c * 1.0 / (x.n + y.n - c) AS jaccard
      FROM common
      JOIN sizes x ON i = x.doc_id
      JOIN sizes y ON j = y.doc_id
      WHERE c * 1.0 / least(x.n, y.n) >= $CONT_TAU
      ORDER BY i, j"""))

  val all: Seq[Op] = Seq(sampleSoftdedup,
    dedupExact, dedupNgramJaccard, dedupMinhashLsh, dedupSimhash,
    dedupEmbedding, dedupClusters, dedupReport, dedupDecontaminate,
    dedupDeconFuzzy, deconReport,
    dedupSubstr, dedupSubstrRewrite, dedupLines, dedupSemantic, dedupBloom,
    dedupUrl, dedupContainment, dedupCanonicalQuality)
}
