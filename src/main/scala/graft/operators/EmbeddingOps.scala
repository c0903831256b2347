package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Op, Tables}
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

  val all: Seq[Op] = Seq(embCentroids, embQuantize)
}
