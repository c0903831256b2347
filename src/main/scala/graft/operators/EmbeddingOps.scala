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

  val all: Seq[Op] = Seq(embCentroids)
}
