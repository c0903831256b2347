package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Caches, Op, Tables}
import graft.functions.Portable._

/** C38 — BATCHED BM25 retrieval (r17, the r16 verdict's ask #3): rank
  * the corpus against N query documents at once — the deployment shape
  * of lexical retrieval (rank training shards against a benchmark's
  * questions for decontamination-aware curation, mine RAG negatives,
  * build per-topic subsets), where C9 (`text_bm25`,
  * [[TextOps.textBm25]]) scores ONE fixed query. The query set is the
  * held-out eval split (doc_id < [[QUERY_MAX]] — the D8
  * decontamination convention, DedupOps.scala); each query's terms are
  * its distinct tokens.
  *
  * Spark shape — the posting-list plan, no cartesian anywhere: the
  * corpus collapses once to per-(doc, term) counts (one uniform
  * doc-keyed shuffle, map-side combined), the query-term table
  * BROADCASTS (eval-sized — KBs at any corpus size) and prunes the
  * posting lists to query terms via an equi-join, document frequencies
  * for those terms aggregate from the pruned lists (≤ |query vocab|
  * rows — broadcast back), and the per-query top-k is the bounded-heap
  * [[graft.functions.Portable.topkMin]] aggregate — ≤ k rows per
  * (query, partition) on the shuffle, never a corpus sort. Wall-clock
  * scales with posting-list mass (corpus occurrences of query terms),
  * not queries × corpus.
  *
  * Portability: C9's rational idf (N+1)/(df+1) and saturation kernel,
  * parenthesis-for-parenthesis; per-term contributions quantize to
  * exact micro integers ([[qMicros]]) BEFORE the per-(query, doc) sum,
  * so the score is order-insensitive and bit-identical in both engines
  * (IEEE addition does not commute across an unordered aggregate; the
  * single-query C9 could sum doubles only because its term order is
  * fixed in the expression tree).
  */
object RetrievalOps {

  /** Per-query result depth. */
  private val BATCH_K = 10

  /** The D8 eval-split convention: doc_id < 25 plays the benchmark. */
  private val QUERY_MAX = 25L

  /** Rank `corpus` documents against each query in `queryTerms`
    * (q_id, t): per-(query, doc) BM25 score in exact micros, top-`k`
    * per query. The seam the C9-parity spec drives directly.
    */
  private[graft] def bm25Rank(
      corpus: DataFrame, queryTerms: DataFrame, k: Int): DataFrame = {
    // posting lists: (doc_id, term, tf, dl) — tf collapsed per doc
    val tc = Caches.persist(corpus
      .transform(graft.Tables.spreadBy(col("doc_id")))
      .select(col("doc_id"), TextOps.toks(col("text")).as("tok"))
      .select(col("doc_id"), size(col("tok")).cast(LongType).as("dl"),
        explode(col("tok")).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("c"), max(col("dl")).as("dl")))
    val dls = tc.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
    val stats = dls.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val qt = queryTerms.select(col("q_id"), col("t")).distinct()
    val terms = qt.select(col("t")).distinct()
    // prune the posting lists to query terms BEFORE anything fans out
    val post = Caches.persist(tc.join(broadcast(terms), "t"))
    val df = post.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val tf = col("c").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val contrib =
      (((col("n_docs") + 1).cast("double") / (col("df") + 1)) *
        (tf * lit(2.2))) /
        (tf + (lit(1.2) * (lit(0.25) + ((lit(0.75) * col("dl")) / avgdl))))
    val sc = post
      .join(broadcast(df), "t")
      .join(broadcast(qt), "t")
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"),
        qMicros(contrib).cast(LongType).as("c_q6"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("c_q6")).as("score_q6"))
      .filter(col("score_q6") > 0)
    sc.groupBy(col("q_id"))
      .agg(topkMin(struct((-col("score_q6")).as("neg"), col("doc_id")), k)
        .as("ks"))
      .select(col("q_id"), posexplode(col("ks")).as(Seq("p", "kv")))
      .select(col("q_id"), (col("p") + 1).cast(LongType).as("rank"),
        col("kv.doc_id").as("doc_id"),
        ((-col("kv.neg")).cast("double") / lit(1000000.0)).as("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  val textBm25Batch: Op = Op(
    "text_bm25_batch",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id") < QUERY_MAX)
        .select(col("doc_id").as("q_id"),
          explode(array_distinct(TextOps.toks(col("text")))).as("t"))
      bm25Rank(docs.filter(col("doc_id") >= QUERY_MAX), queries, BATCH_K)
    },
    Some(s"""
      WITH corp AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents WHERE doc_id >= $QUERY_MAX),
      qt AS (
        SELECT DISTINCT doc_id AS q_id,
               unnest(list_distinct(
                 regexp_split_to_array(trim(lower(text), ' '), '\\s+'))) AS t
        FROM documents WHERE doc_id < $QUERY_MAX),
      tc AS MATERIALIZED (
        SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c,
               CAST(max(dl) AS BIGINT) AS dl
        FROM (SELECT doc_id, CAST(len(tok) AS BIGINT) AS dl,
                     unnest(tok) AS t
              FROM corp) x
        GROUP BY doc_id, t),
      dls AS (SELECT doc_id, max(dl) AS dl FROM tc GROUP BY doc_id),
      st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(dl) AS BIGINT) AS sum_dl
             FROM dls),
      terms AS (SELECT DISTINCT t FROM qt),
      post AS MATERIALIZED (
        SELECT tc.doc_id, tc.t, tc.c, tc.dl FROM tc JOIN terms USING (t)),
      df AS (SELECT t, CAST(count(*) AS BIGINT) AS df
             FROM post GROUP BY t),
      contrib AS (
        SELECT qt.q_id, post.doc_id,
               CAST(floor((((((CAST(st.n_docs + 1 AS DOUBLE) / (df.df + 1))
                 * (CAST(post.c AS DOUBLE) * 2.2))
                 / (CAST(post.c AS DOUBLE) + (1.2 * (0.25
                     + ((0.75 * post.dl)
                        / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))))))
                 * 1000000.0) + 0.5) AS BIGINT) AS c_q6
        FROM post
        JOIN df USING (t)
        JOIN qt USING (t)
        CROSS JOIN st),
      sc AS (SELECT q_id, doc_id, CAST(sum(c_q6) AS BIGINT) AS score_q6
             FROM contrib GROUP BY q_id, doc_id
             HAVING CAST(sum(c_q6) AS BIGINT) > 0)
      SELECT q_id, rank, doc_id,
             CAST(score_q6 AS DOUBLE) / 1000000.0 AS score
      FROM (SELECT q_id, doc_id, score_q6,
                   CAST(row_number() OVER (PARTITION BY q_id
                     ORDER BY score_q6 DESC, doc_id) AS BIGINT) AS rank
            FROM sc) r
      WHERE rank <= $BATCH_K
      ORDER BY q_id, rank"""))

  val all: Seq[Op] = Seq(textBm25Batch)
}
