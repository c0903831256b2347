package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Caches, Op, Tables}
import graft.functions.Portable._

/** Embedding-corpus statistics (SURVEY.md §2 part E extensions): the
  * vector aggregation passes an embedding pipeline runs beside ANN —
  * per-class centroids, norm distributions.
  */
object EmbeddingOps {

  /** E4 — per-label centroids: the mean embedding of every label class,
    * dimension-exact. Each vector explodes to (label, dim, q_micros)
    * rows and sums as INTEGERS per (label, dim) — order-insensitive,
    * bit-identical under any partitioning (the portable exact-sum idiom
    * applied per dimension), then divides once. One shuffle,
    * map-side-combined: 64·|labels| running sums per input partition,
    * NOT 64× row blowup through the exchange. At 100 TB this is the
    * cheapest possible plan shape — class centroids for k-means/IVF
    * training, class-balance monitoring, drift detection.
    */
  val embCentroids: Op = Op(
    "emb_centroids",
    (s, d) =>
      Tables.embeddings(s, d)
        .repartition(col("vec_id"))
        .select(col("label"),
          posexplode(transform(col("embedding"), x => qMicros(x).cast(LongType))))
        .groupBy(col("label"), (col("pos") + 1).cast(LongType).as("dim"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("col")).as("sum_micros"))
        .select(col("label").cast(LongType).as("label"), col("dim"),
          col("n_vecs"), col("sum_micros"),
          (col("sum_micros").cast("double") / col("n_vecs") / lit(1000000.0))
            .as("centroid"))
        .orderBy(col("label"), col("dim")),
    Some("""
      SELECT CAST(label AS BIGINT) AS label, CAST(ix AS BIGINT) AS dim,
             count(*) AS n_vecs,
             CAST(sum(CAST(floor(CAST(emb_v AS DOUBLE)*1000000 + 0.5) AS BIGINT))
               AS BIGINT) AS sum_micros,
             CAST(sum(CAST(floor(CAST(emb_v AS DOUBLE)*1000000 + 0.5) AS BIGINT))
               AS DOUBLE) / count(*) / 1000000.0 AS centroid
      FROM (
        SELECT label, unnest(embedding) AS emb_v,
               unnest(generate_series(1, len(embedding))) AS ix
        FROM embeddings) t
      GROUP BY label, ix
      ORDER BY label, dim"""))

  /** E5 — symmetric int8 quantization audit: per-vector scale
    * (max-abs / 127) and the exact reconstruction error of storing the
    * embedding as int8 — the storage-scale decision pass for an
    * embedding lake (4× smaller vectors, bounded recall loss). Pure
    * per-row map work, no shuffle except output ordering.
    *
    * Portability: the per-element |x - dequant(quant(x))| errors are
    * quantized to exact integer micros BEFORE summing (the engine's
    * exact-sum idiom), so the per-vector error is order-insensitive and
    * bit-identical in the oracle; rounding is floor(v + 0.5), never the
    * engine-dependent round(). The max-abs and the lambda's `scale`
    * reference are materialized in prior selects — an inlined max-abs
    * would re-scan the 64 dims per element (the HOF-inlining trap
    * documented at Portable.shinglesFromTokens).
    */
  val embQuantize: Op = Op(
    "emb_quantize",
    (s, d) =>
      Tables.embeddings(s, d)
        .repartition(col("vec_id"))
        .select(col("vec_id"), col("embedding"),
          greatest(array_max(transform(col("embedding"),
            x => abs(x.cast("double")))), lit(1e-12)).as("maxabs"))
        .select(col("vec_id"), col("embedding"),
          (col("maxabs") / lit(127.0)).as("scale"))
        .select(col("vec_id"), col("scale"),
          size(col("embedding")).cast(LongType).as("n_dims"),
          aggregate(col("embedding"), lit(0L), (acc, x) =>
            acc + floor(abs(x.cast("double") -
              (floor((x.cast("double") / col("scale")) + 0.5) * col("scale")))
              * 1000000.0 + 0.5).cast(LongType)).as("err_sum_us"))
        .select(col("vec_id"), col("scale"), col("n_dims"),
          col("err_sum_us"),
          (col("err_sum_us").cast("double") / col("n_dims") / lit(1000000.0))
            .as("mean_abs_err"))
        .orderBy(col("vec_id")),
    Some("""
      SELECT vec_id, scale, n_dims, err_sum_us,
             CAST(err_sum_us AS DOUBLE) / n_dims / 1000000.0 AS mean_abs_err
      FROM (
        SELECT vec_id, scale, CAST(len(embedding) AS BIGINT) AS n_dims,
               CAST(list_sum(list_transform(embedding, x ->
                 CAST(floor(abs(CAST(x AS DOUBLE) -
                   (floor((CAST(x AS DOUBLE) / scale) + 0.5) * scale))
                   * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS err_sum_us
        FROM (
          SELECT vec_id, embedding,
                 (greatest(list_max(list_transform(embedding, x ->
                   abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0) AS scale
          FROM embeddings) t1) t2
      ORDER BY vec_id"""))

  /** E7 — embedding-space outlier flags: per-label squared distance to
    * the label centroid, 3-sigma-flagged against the label's own
    * distance distribution — the embedding-side quality gate (mislabeled
    * rows, garbage vectors, drifted classes) that complements the
    * text-side C-series filters.
    *
    * Portability/exactness: per-element (x-c)² terms are quantized to
    * integer micros BEFORE summing (emb_quantize's idiom — the fold
    * order can never change d²), distances are coarsened to millis for
    * the moment sums (q = Σd⁴ stays in BIGINT up to ~1e8 vectors per
    * label; beyond that a deployment coarsens one more decade), and the
    * 3-sigma test is the cross-multiplied integer form of
    * events_anomaly evaluated in doubles ONLY at the final comparison —
    * deterministic scalar math on exactly-aggregated integers, no
    * engine stddev anywhere.
    *
    * Scale shape: one exploded centroid aggregate (map-side combined,
    * 64·|labels| sums), then the corpus is scored map-only against the
    * BROADCAST centroid arrays, and flags come from a broadcast of the
    * |labels|-row moment frame. The corpus never shuffles after the
    * centroid pass.
    */
  val embOutliers: Op = Op(
    "emb_outliers",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .repartition(col("vec_id"))
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          col("embedding"))
      val cent = e
        .select(col("label"),
          posexplode(transform(col("embedding"), x => qMicros(x).cast(LongType))))
        .groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("col")).as("sum_us"))
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("sum_us").cast("double") / col("n_vecs") / lit(1000000.0))
              .as("c")))),
          t => t.getField("c")).as("cent"))
      val dist = Caches.persist(e.join(broadcast(cent), "label")
        .select(col("label"), col("vec_id"),
          (aggregate(
            zip_with(col("embedding"), col("cent"), (x, c) =>
              floor((x.cast("double") - c) * (x.cast("double") - c)
                * lit(1000000.0) + lit(0.5)).cast(LongType)),
            lit(0L), (acc, t) => acc + t) / lit(1000L)).cast(LongType)
            .as("d2_mi")))
        // ^ Caches.persist: feeds the moment aggregate AND the flag join
        // — without it the centroid pass runs twice
      val st = dist.groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("d2_mi")).as("s"),
          sum(col("d2_mi") * col("d2_mi")).as("q"))
      val dn = col("d2_mi") * col("n") - col("s")
      dist.join(broadcast(st), "label")
        .select(col("label"), col("vec_id"), col("d2_mi"),
          ((dn > 0) &&
            (dn.cast("double") * dn.cast("double") * (col("n") - 1) >
              lit(9.0) * col("n") * (col("n").cast("double") * col("q") -
                col("s").cast("double") * col("s").cast("double"))))
            .as("is_outlier"))
        .orderBy(col("label"), col("vec_id"))
    },
    Some("""
      WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label, embedding
                 FROM embeddings),
      cd AS (
        SELECT label, ix, count(*) AS n_vecs,
               CAST(sum(CAST(floor(CAST(emb_v AS DOUBLE)*1000000 + 0.5)
                 AS BIGINT)) AS BIGINT) AS sum_us
        FROM (SELECT label, unnest(embedding) AS emb_v,
                     unnest(generate_series(1, len(embedding))) AS ix
              FROM e) t
        GROUP BY label, ix),
      cent AS (SELECT label,
                      list(CAST(sum_us AS DOUBLE)/n_vecs/1000000.0
                        ORDER BY ix) AS cent
               FROM cd GROUP BY label),
      dist AS (
        SELECT e.label, e.vec_id,
               CAST(list_sum(list_transform(
                 generate_series(1, len(e.embedding)), ix ->
                   CAST(floor((CAST(e.embedding[ix] AS DOUBLE) - cent.cent[ix])
                     * (CAST(e.embedding[ix] AS DOUBLE) - cent.cent[ix])
                     * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) // 1000
                 AS d2_mi
        FROM e JOIN cent USING (label)),
      st AS (SELECT label, count(*) AS n,
                    CAST(sum(d2_mi) AS BIGINT) AS s,
                    CAST(sum(d2_mi*d2_mi) AS BIGINT) AS q
             FROM dist GROUP BY label)
      SELECT d.label, d.vec_id, d.d2_mi,
             d.d2_mi * st.n - st.s > 0 AND
               CAST(d.d2_mi * st.n - st.s AS DOUBLE)
                 * CAST(d.d2_mi * st.n - st.s AS DOUBLE) * (st.n - 1)
               > 9.0 * st.n * (CAST(st.n AS DOUBLE) * st.q
                 - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
               AS is_outlier
      FROM dist d JOIN st USING (label)
      ORDER BY label, vec_id"""))

  val all: Seq[Op] = Seq(embCentroids, embQuantize, embOutliers)
}
