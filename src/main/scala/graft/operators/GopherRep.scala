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
  * Scale shape: line/paragraph metrics are pure per-row array
  * expressions (lines per document are bounded — no shuffle). The
  * n-gram half explodes one (doc_id, n, position, gram) stream
  * (9 windows/token), groupBy-counts it (map-side combined, key is
  * doc-dominated so uniform), and — like D10's re-plan — joins BACK
  * only the DUPLICATED grams (scales with repetition, not corpus) to
  * mark covered positions. Every aggregate is keyed by doc_id(+n), so
  * partitions stay balanced at any corpus size; nothing ever sorts or
  * collects the corpus.
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

  val qualityGopherRep: Op = Op(
    "quality_gopher_rep",
    (s, d) => {
      val docs = Tables.documents(s, d).repartition(col("doc_id"))
      // (doc_id, tok, nw, cc) — the shared basis for all n-gram metrics
      val base = Caches.persist(docs
        .select(col("doc_id"), TextOps.toks(col("text")).as("tok"))
        .select(col("doc_id"), col("tok"), size(col("tok")).as("nw"),
          greatest(length(array_join(col("tok"), "")), lit(1))
            .cast(LongType).as("cc")))
      // one (doc_id, n, p, gram) stream for every window size — each
      // union branch reads the CACHED base, so the corpus tokenizes once
      val grams = Caches.persist((TOP_NS ++ DUP_NS).map { n =>
        base.filter(col("nw") >= n)
          .select(col("doc_id"), col("cc"), lit(n).as("n"),
            explode(transform(sequence(lit(1), col("nw") - lit(n - 1)),
              p => struct(p.as("p"),
                concat_ws(SEP, slice(col("tok"), p, lit(n))).as("g"))))
              .as("s"))
          .select(col("doc_id"), col("cc"), col("n"),
            col("s.p").as("p"), col("s.g").as("g"))
      }.reduce(_ unionAll _))
      // per-(doc, n, gram) occurrence counts — map-side combined
      val gstats = Caches.persist(grams
        .groupBy(col("doc_id"), col("n"), col("g"))
        .agg(count(lit(1)).as("cnt"), max(col("cc")).as("cc")))
      // top 2/3/4-gram: max (cnt, charlen) struct = max count, longer
      // gram on ties — deterministic in both engines
      val topf = gstats.filter(col("n") <= TOP_NS.max)
        .withColumn("gl",
          (length(col("g")) - (col("n") - lit(1))).cast(LongType))
        .groupBy(col("doc_id"), col("n"))
        .agg(max(struct(col("cnt"), col("gl"))).as("m"),
          max(col("cc")).as("cc"))
        .select(col("doc_id"), col("n"),
          ((col("m.cnt") * col("m.gl")).cast("double") / col("cc"))
            .as("frac"))
      val topP = topf.groupBy(col("doc_id")).agg(
        max(when(col("n") === TOP_NS.head, col("frac")))
          .as(s"top_${TOP_NS.head}gram_frac"),
        TOP_NS.tail.map(n => max(when(col("n") === n, col("frac")))
          .as(s"top_${n}gram_frac")): _*)
      // duplicated 5..10-grams: join back ONLY grams with cnt > 1 (the
      // dup-only D10 discipline), mark covered positions, price each
      // position's token once
      val dupg = gstats
        .filter(col("n") >= DUP_NS.head && col("cnt") > 1)
        .select(col("doc_id"), col("n"), col("g"))
      val covered = grams.filter(col("n") >= DUP_NS.head)
        .join(dupg, Seq("doc_id", "n", "g"))
        .select(col("doc_id"), col("n"),
          explode(sequence(col("p"), col("p") + col("n") - lit(1))).as("t"))
        .distinct()
      val ptok = base
        .select(col("doc_id"), col("cc"),
          posexplode(col("tok")).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + lit(1)).as("t"),
          length(col("w")).cast(LongType).as("wl"), col("cc"))
      val dupf = covered.join(ptok, Seq("doc_id", "t"))
        .groupBy(col("doc_id"), col("n"))
        .agg(sum(col("wl")).as("dc"), max(col("cc")).as("cc"))
        .select(col("doc_id"), col("n"),
          (col("dc").cast("double") / col("cc")).as("frac"))
      val dupP = dupf.groupBy(col("doc_id")).agg(
        max(when(col("n") === DUP_NS.head, col("frac")))
          .as(s"dup_${DUP_NS.head}gram_frac"),
        DUP_NS.tail.map(n => max(when(col("n") === n, col("frac")))
          .as(s"dup_${n}gram_frac")): _*)
      // line/paragraph metrics + the shared document verdict: map-side
      val lines = segs(col("text"), "\n")
      val paras = segs(col("text"), "\n\n")
      val lineM = docs.select(col("doc_id"),
        dupFrac(lines).as("dup_line_frac"),
        dupFrac(paras).as("dup_para_frac"),
        dupCharFrac(lines).as("dup_line_char_frac"),
        dupCharFrac(paras).as("dup_para_char_frac"),
        TextOps.gopherDocVerdict(col("text")).as("doc_verdict"))
      val fracCols =
        TOP_NS.map(n => s"top_${n}gram_frac") ++
          DUP_NS.map(n => s"dup_${n}gram_frac")
      val joined = lineM
        .join(topP, Seq("doc_id"), "left")
        .join(dupP, Seq("doc_id"), "left")
        .na.fill(0.0, fracCols)
      val verdict = RULES.foldRight(lit("keep")) {
        case ((c, t, name), alt) => when(col(c) > t, name).otherwise(alt)
      }
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
