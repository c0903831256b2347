package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Caches, Op, Tables}

/** C36 — the REPETITION half of the published Gopher quality gate
  * (Rae et al. 2021, appendix A1.1 "Repetition removal"; shipped by
  * RedPajama/Dolma as `gopher_repetition` beside the document-level
  * rules C30 carries): duplicate-line / duplicate-paragraph fractions,
  * their character fractions, the character fraction of the most
  * frequent 2/3/4-gram, and the character fraction covered by
  * duplicated 5..10-grams. Verdict = first failing rule in the paper's
  * listing order (the C30/G4 cascade convention), with every per-rule
  * metric alongside so a curation report can histogram rule margins,
  * plus the COMPOSED `full_verdict` (document cascade first, then
  * repetition — [[TextOps.gopherDocVerdict]] is the shared document
  * half), so the complete published gate is one op.
  *
  * Measurement conventions (stated because the paper doesn't pin them;
  * these are the common Dolma-style choices, identical in the oracle):
  *  - lines = regex-split on `\n`, paragraphs on `\n\n`, EMPTY segments
  *    dropped (they are separator artifacts, not content — and under
  *    split('\n') every `\n\n` boundary would otherwise inject
  *    always-duplicated "" lines that mask real paragraph structure);
  *  - a segment occurrence is "duplicate" when its exact value occurs
  *    more than once in the document; the duplicate fraction counts ALL
  *    such occurrences (both copies), over all non-empty segments;
  *  - n-grams are over the lowercased whitespace tokens (C1's `toks`),
  *    and "characters" means the sum of token lengths (no separators),
  *    the same basis as C30's mean-word-length;
  *  - top-n-gram fraction = count(most frequent n-gram) × its character
  *    length / doc characters, ties on count broken by the LONGER gram
  *    (deterministic, and the max possible fraction among tied counts);
  *  - dup-n-gram fraction marks every token POSITION covered by any
  *    occurrence of any n-gram that occurs ≥ 2 times, then prices the
  *    marked positions' token lengths once — overlapping duplicated
  *    windows never double-count a character.
  *
  * Scale shape (r18 — the sf100 decade's finding made structural):
  * every metric is PER-DOCUMENT, so the whole gate is row-local — a
  * map-only plan with no shuffle, no join and no cached intermediate.
  * The r17 shape exploded one corpus-sized (doc_id, n, position, gram)
  * stream (9 windows/token) through a groupBy + a dup-only join-back;
  * at 5M docs that stream was ~4.6B rows whose string-keyed cache +
  * shuffle overflowed 52 GB of scratch — for statistics that never
  * cross a document boundary. Now each document's row computes its own
  * channels through the ONE fused native kernel
  * ([[graft.functions.VectorExpressions.GramRepExpr gram_rep]] — the
  * lsh_buckets precedent: the interpreted-HOF formulation of the same
  * per-doc algorithm measured ~130 docs/s/core): per-token xxhash64
  * once, gram hashes chained over the window, counts in a primitive
  * open-addressed table, coverage as one interval sweep — O(9·nw·n)
  * per document, embarrassingly parallel, cost bounded by the largest
  * DOCUMENT, never the corpus. Grams compare by 64-bit hash in-row
  * (P[in-doc collision] ≈ grams²·2⁻⁶⁴ ≈ 10⁻¹⁴ per doc; the oracle
  * keeps comparing the strings themselves, so the gate would surface
  * a collision as a hash mismatch).
  */
object GopherRep {

  private val SEP = "\u0001"
  private val TOP_NS = 2 to 4
  private val DUP_NS = 5 to 10

  /** (metric column, threshold, rule name) in the paper's A1.1 listing
    * order — the ONE source the engine cascade, the oracle cascade and
    * the output schema are all generated from.
    */
  private val RULES: Seq[(String, Double, String)] =
    Seq(
      ("dup_line_frac", 0.30, "dup_lines"),
      ("dup_para_frac", 0.30, "dup_paragraphs"),
      ("dup_line_char_frac", 0.20, "dup_line_chars"),
      ("dup_para_char_frac", 0.20, "dup_para_chars"),
      ("top_2gram_frac", 0.20, "top_2gram"),
      ("top_3gram_frac", 0.18, "top_3gram"),
      ("top_4gram_frac", 0.16, "top_4gram"),
      ("dup_5gram_frac", 0.15, "dup_5gram"),
      ("dup_6gram_frac", 0.14, "dup_6gram"),
      ("dup_7gram_frac", 0.13, "dup_7gram"),
      ("dup_8gram_frac", 0.12, "dup_8gram"),
      ("dup_9gram_frac", 0.11, "dup_9gram"),
      ("dup_10gram_frac", 0.10, "dup_10gram"))

  /** Non-empty segments of `text` under a regex separator. */
  private def segs(text: Column, sep: String): Column =
    filter(split(text, sep), x => x =!= "")

  /** Per-position duplicate flags over a SORTED copy of the segments:
    * position i is duplicated iff it equals a neighbor — O(L log L)
    * per row vs the r17 nested rescans' O(L²) (r18 advisory: a
    * ~100k-line log document cost ~10¹⁰ comparisons in one task).
    * Duplicate-occurrence semantics are unchanged — a value with
    * multiplicity m ≥ 2 contributes all m occurrences, sorting only
    * re-orders them, and both consuming metrics are order-insensitive
    * sums. Index guards clamp instead of touching index 0 / size+1
    * (element_at errors at 0); the clamped compare is masked by the
    * boundary conjunct, and an EMPTY segment array falls through to
    * all-false flags (sequence(1,0) descends — both its probes fail
    * their bound guards).
    */
  private def dupFlags(s: Column): Column =
    transform(sequence(lit(1), size(s)), i =>
      (i > lit(1) &&
        element_at(s, greatest(i - lit(1), lit(1))) === element_at(s, i)) ||
      (i < size(s) &&
        element_at(s, least(i + lit(1), size(s))) === element_at(s, i)))

  /** Fraction of segments whose value occurs more than once. */
  private def dupFrac(a: Column): Column =
    aggregate(dupFlags(sort_array(a)), lit(0L), (acc, f) =>
      acc + when(f, lit(1L)).otherwise(lit(0L))).cast("double") /
      greatest(size(a), lit(1)).cast("double")

  /** Fraction of segment CHARACTERS in segments occurring > once. */
  private def dupCharFrac(a: Column): Column = {
    val s = sort_array(a)
    aggregate(zip_with(dupFlags(s), s, (f, x) =>
      when(f, length(x).cast(LongType)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v).cast("double") /
      greatest(aggregate(a, lit(0L),
        (acc, x) => acc + length(x).cast(LongType)), lit(1L)).cast("double")
  }

  /** Every A1.1 repetition metric as a pure expression over
    * (text, tok, cc) — the ONE definition set the board op's named
    * columns and the streaming edge gate
    * ([[graft.streaming.DocIngest.gopherRepGate]]) both evaluate, so
    * edge verdicts are bit-identical to batch verdicts on the same
    * text by construction. Callers precompute `tok`/`cc` as projected
    * columns so the 9 gram_rep kernel calls share one tokenization.
    */
  private[graft] def metricCols(
      text: Column, tok: Column, cc: Column): Seq[(String, Column)] = {
    val lines = segs(text, "\n")
    val paras = segs(text, "\n\n")
    Seq(
      "dup_line_frac" -> dupFrac(lines),
      "dup_para_frac" -> dupFrac(paras),
      "dup_line_char_frac" -> dupCharFrac(lines),
      "dup_para_char_frac" -> dupCharFrac(paras)) ++
      TOP_NS.map(n => s"top_${n}gram_frac" ->
        (call_function("gram_rep", tok, lit(n))("top_chars")
          .cast("double") / cc)) ++
      DUP_NS.map(n => s"dup_${n}gram_frac" ->
        (call_function("gram_rep", tok, lit(n))("dup_chars")
          .cast("double") / cc))
  }

  /** The repetition cascade over resolved metric expressions — first
    * failing rule in the paper's listing order.
    */
  private[graft] def repVerdict(m: String => Column): Column =
    RULES.foldRight(lit("keep")) {
      case ((c, t, name), alt) => when(m(c) > t, name).otherwise(alt)
    }

  /** The COMPOSED published-gate verdict (document cascade first, then
    * repetition) over (text, tok, cc) — the board op's `full_verdict`
    * and the edge gate's keep test.
    */
  private[graft] def fullVerdict(
      text: Column, tok: Column, cc: Column): Column = {
    val m = metricCols(text, tok, cc).toMap
    val doc = TextOps.gopherDocVerdict(text)
    when(doc =!= "keep", doc).otherwise(repVerdict(m))
  }

  val qualityGopherRep: Op = Op(
    "quality_gopher_rep",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // (doc_id, text, tok, cc) — one row per document, every channel
      // below is a pure expression over it: map-only plan
      val base = docs
        .select(col("doc_id"), col("text"),
          TextOps.toks(col("text")).as("tok"))
        .select(col("doc_id"), col("text"), col("tok"),
          greatest(length(array_join(col("tok"), "")), lit(1))
            .cast(LongType).as("cc"))
      val fracCols =
        TOP_NS.map(n => s"top_${n}gram_frac") ++
          DUP_NS.map(n => s"dup_${n}gram_frac")
      val joined = base.select(col("doc_id") +:
        metricCols(col("text"), col("tok"), col("cc"))
          .map { case (name, c) => c.as(name) } :+
        TextOps.gopherDocVerdict(col("text")).as("doc_verdict"): _*)
      val verdict = repVerdict(col)
      joined
        .withColumn("verdict", verdict)
        .withColumn("kept", col("verdict") === "keep")
        .withColumn("full_verdict",
          when(col("doc_verdict") =!= "keep", col("doc_verdict"))
            .otherwise(col("verdict")))
        .withColumn("kept_full", col("full_verdict") === "keep")
        .select(Seq(col("doc_id"),
          col("dup_line_frac"), col("dup_para_frac"),
          col("dup_line_char_frac"), col("dup_para_char_frac")) ++
          fracCols.map(col) ++
          Seq(col("verdict"), col("kept"), col("doc_verdict"),
            col("full_verdict"), col("kept_full")): _*)
        .orderBy(col("doc_id"))
    },
    Some {
      val nsValues = (TOP_NS ++ DUP_NS).map(n => s"($n)").mkString(",")
      def pivot(ns: Range, prefix: String): String =
        ns.map(n =>
          s"max(CASE WHEN n = $n THEN frac END) AS ${prefix}_${n}gram_frac")
          .mkString(",\n                ")
      val caseCascade = RULES.map { case (c, t, name) =>
        s"WHEN $c > $t THEN '$name'"
      }.mkString("\n                    ")
      def sqlDupFrac(a: String): String =
        s"""CAST(len(list_filter($a, x ->
                 len(list_filter($a, y -> y = x)) > 1)) AS DOUBLE)
               / greatest(len($a), 1)"""
      def sqlDupCharFrac(a: String): String =
        s"""CAST(coalesce(list_sum(list_transform($a, x ->
                 CASE WHEN len(list_filter($a, y -> y = x)) > 1
                      THEN length(x) ELSE 0 END)), 0) AS DOUBLE)
               / greatest(coalesce(list_sum(list_transform($a, x ->
                 length(x))), 0), 1)"""
      s"""
      WITH tokd AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text), ' '), '\\s+') AS tok
        FROM documents),
      base AS MATERIALIZED (
        SELECT doc_id, tok, len(tok) AS nw,
               CAST(greatest(len(array_to_string(tok, '')), 1) AS BIGINT)
                 AS cc
        FROM tokd),
      ng AS MATERIALIZED (
        SELECT doc_id, cc, n, p,
               array_to_string(tok[p:p+n-1], chr(1)) AS g
        FROM (SELECT doc_id, cc, tok, ns.n,
                     unnest(generate_series(1, len(tok) - ns.n + 1)) AS p
              FROM base CROSS JOIN (VALUES $nsValues) ns(n)
              WHERE len(tok) >= ns.n) x),
      gs AS MATERIALIZED (
        SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS cnt, max(cc) AS cc
        FROM ng GROUP BY doc_id, n, g),
      tmax AS (SELECT doc_id, n, max(cnt) AS mc FROM gs
               WHERE n <= ${TOP_NS.max} GROUP BY doc_id, n),
      topf AS (SELECT g.doc_id, g.n,
                      CAST(t.mc * max(length(g.g) - (g.n - 1)) AS DOUBLE)
                        / max(g.cc) AS frac
               FROM gs g JOIN tmax t
                 ON g.doc_id = t.doc_id AND g.n = t.n AND g.cnt = t.mc
               GROUP BY g.doc_id, g.n, t.mc),
      dupg AS (SELECT doc_id, n, g FROM gs
               WHERE n >= ${DUP_NS.head} AND cnt > 1),
      cov AS (SELECT DISTINCT doc_id, n, t
              FROM (SELECT ng.doc_id, ng.n,
                           unnest(generate_series(ng.p, ng.p + ng.n - 1))
                             AS t
                    FROM ng JOIN dupg USING (doc_id, n, g)
                    WHERE ng.n >= ${DUP_NS.head}) y),
      ptok AS (SELECT doc_id, t, CAST(length(tok[t]) AS BIGINT) AS wl, cc
               FROM (SELECT doc_id, tok, cc,
                            unnest(generate_series(1, len(tok))) AS t
                     FROM base) z),
      dupf AS (SELECT c.doc_id, c.n,
                      CAST(sum(p.wl) AS DOUBLE) / max(p.cc) AS frac
               FROM cov c JOIN ptok p USING (doc_id, t)
               GROUP BY c.doc_id, c.n),
      topp AS (SELECT doc_id,
                ${pivot(TOP_NS, "top")}
               FROM topf GROUP BY doc_id),
      dupp AS (SELECT doc_id,
                ${pivot(DUP_NS, "dup")}
               FROM dupf GROUP BY doc_id),
      lm AS (SELECT doc_id,
               ${sqlDupFrac("ls")} AS dup_line_frac,
               ${sqlDupFrac("ps")} AS dup_para_frac,
               ${sqlDupCharFrac("ls")} AS dup_line_char_frac,
               ${sqlDupCharFrac("ps")} AS dup_para_char_frac
             FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\n'),
                       l -> l != '') AS ls,
                     list_filter(regexp_split_to_array(text, '\\n\\n'),
                       l -> l != '') AS ps
                   FROM documents) l0),
      ${TextOps.sqlGopherDocCte("gdoc")},
      m AS (SELECT lm.doc_id,
                   lm.dup_line_frac, lm.dup_para_frac,
                   lm.dup_line_char_frac, lm.dup_para_char_frac,
                   ${(TOP_NS.map(n => s"coalesce(topp.top_${n}gram_frac, 0.0) AS top_${n}gram_frac") ++
        DUP_NS.map(n => s"coalesce(dupp.dup_${n}gram_frac, 0.0) AS dup_${n}gram_frac"))
        .mkString(",\n                   ")},
                   gdoc.doc_verdict
            FROM lm
            LEFT JOIN topp USING (doc_id)
            LEFT JOIN dupp USING (doc_id)
            JOIN gdoc USING (doc_id))
      SELECT doc_id, dup_line_frac, dup_para_frac, dup_line_char_frac,
             dup_para_char_frac,
             ${(TOP_NS.map(n => s"top_${n}gram_frac") ++
        DUP_NS.map(n => s"dup_${n}gram_frac")).mkString(", ")},
             verdict, verdict = 'keep' AS kept, doc_verdict,
             CASE WHEN doc_verdict != 'keep' THEN doc_verdict
                  ELSE verdict END AS full_verdict,
             (CASE WHEN doc_verdict != 'keep' THEN doc_verdict
                   ELSE verdict END) = 'keep' AS kept_full
      FROM (SELECT *,
                   CASE $caseCascade
                        ELSE 'keep' END AS verdict
            FROM m) f
      ORDER BY doc_id"""
    })

  val all: Seq[Op] = Seq(qualityGopherRep)
}
