package graft.ops

import graft.{Op, OpModule, Tables}
import graft.functions.GraftFunctions
import textsql._

/** Similarity search over the embeddings table (SURVEY.md §2.11).
  *
  *  - sim_topk: brute-force cosine top-k — the exact baseline. Queries
  *    broadcast against the corpus; ranking via window. At 100 TB the corpus
  *    side stays partition-parallel; only the (small) query set replicates.
  *  - sim_knn_join: the scale path — sign-bit LSH (8 bits → 256 buckets)
  *    turns the kNN join into an equi-join on the bucket key; recall is
  *    traded for never materializing all pairs. Norms are precomputed once
  *    per vector (shuffle-free scalar column), not per pair.
  *
  * All cosines go through the native vec_dot expression
  * ([[graft.functions.FloatDotProduct]]) — bit-identical to the DuckDB
  * list_reduce fold, ~100× faster than interpreted HOF lambdas. */
object SimOps extends OpModule {

  /** Normalized embeddings (vector + its norm), materialized once per
    * (session, dir) and shared by every similarity/embedding-dedup key —
    * Spark would otherwise inline-recompute the norms per CTE reference. */
  private[ops] def normView(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    GraftFunctions.register(s)
    Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
    graft.Views.materialize(s, dir, "embnorm",
      """SELECT vec_id, label, embedding,
         sqrt(vec_dot(embedding, embedding)) AS nrm FROM embeddings""")
  }

  /** Per-dimension unnested embeddings (IVF training/assignment input). */
  private[ops] def unnView(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
    graft.Views.materialize(s, dir, "embunn",
      """SELECT vec_id, label, dim, v FROM embeddings
         LATERAL VIEW posexplode(embedding) t AS dim, v""")
  }

  def ops: Seq[Op] = Seq(

    Op("sim_topk",
      (s, dir) => {
        s.sql(s"""
          WITH n AS (SELECT vec_id, embedding, nrm FROM ${normView(s, dir)}),
          q AS (SELECT vec_id AS qa, embedding AS eq, nrm AS nq FROM n
            WHERE vec_id % 100 = 0),
          scored AS (SELECT q.qa, n.vec_id AS vb,
            vec_dot(q.eq, n.embedding) / (q.nq * n.nrm) AS cos
            FROM q JOIN n ON n.vec_id <> q.qa),
          ranked AS (SELECT qa, vb, cos,
            ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cos DESC, vb) AS rnk
            FROM scored)
          SELECT qa, vb, rnk, cos FROM ranked WHERE rnk <= 5 ORDER BY qa, rnk""")
      },
      Some(s"""
        WITH n AS MATERIALIZED (SELECT vec_id, embedding,
          sqrt(${duckDot("embedding", "embedding")}) AS nrm FROM embeddings),
        q AS (SELECT vec_id AS qa, embedding AS eq, nrm AS nq FROM n
          WHERE vec_id % 100 = 0),
        scored AS (SELECT q.qa, n.vec_id AS vb,
          ${duckDot("q.eq", "n.embedding")} / (q.nq * n.nrm) AS cos
          FROM q JOIN n ON n.vec_id <> q.qa),
        ranked AS (SELECT qa, vb, cos,
          ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cos DESC, vb) AS rnk
          FROM scored)
        SELECT qa, vb, rnk, cos FROM ranked WHERE rnk <= 5 ORDER BY qa, rnk""")),

    Op("sim_knn_join",
      (s, dir) => {
        s.sql(s"""
          WITH n AS (SELECT vec_id, embedding,
            ${sparkSignBucket("embedding", 8)} AS bkt, nrm
            FROM ${normView(s, dir)}),
          l AS (SELECT vec_id AS va, embedding AS ea, bkt, nrm AS na FROM n
            WHERE vec_id % 10 = 0),
          scored AS (SELECT l.va, n.vec_id AS vb,
            vec_dot(l.ea, n.embedding) / (l.na * n.nrm) AS cos
            FROM l JOIN n ON n.bkt = l.bkt AND n.vec_id <> l.va),
          ranked AS (SELECT va, vb, cos,
            ROW_NUMBER() OVER (PARTITION BY va ORDER BY cos DESC, vb) AS rnk
            FROM scored)
          SELECT va, vb, rnk, cos FROM ranked WHERE rnk <= 3 ORDER BY va, rnk""")
      },
      Some(s"""
        WITH n AS MATERIALIZED (SELECT vec_id, embedding,
          ${duckSignBucket("embedding", 8)} AS bkt,
          sqrt(${duckDot("embedding", "embedding")}) AS nrm FROM embeddings),
        l AS (SELECT vec_id AS va, embedding AS ea, bkt, nrm AS na FROM n
          WHERE vec_id % 10 = 0),
        scored AS (SELECT l.va, n.vec_id AS vb,
          ${duckDot("l.ea", "n.embedding")} / (l.na * n.nrm) AS cos
          FROM l JOIN n ON n.bkt = l.bkt AND n.vec_id <> l.va),
        ranked AS (SELECT va, vb, cos,
          ROW_NUMBER() OVER (PARTITION BY va ORDER BY cos DESC, vb) AS rnk
          FROM scored)
        SELECT va, vb, rnk, cos FROM ranked WHERE rnk <= 3 ORDER BY va, rnk""")),

    // True IVF: train a coarse quantizer (centroid = exact per-dim mean of
    // each label's vectors), probe the nprobe=2 nearest centroids per query,
    // exact-rerank inside the probed cells. Centroids live as a relational
    // (label, dim, val) table, so the train/assign math is decimal-exact and
    // mirrorable in the oracle; the rerank uses native vec_dot. At 100 TB
    // the centroid table stays broadcast-size while cells shard naturally.
    Op("sim_ivf",
      (s, dir) => {
        s.sql(s"""
          WITH n AS (SELECT vec_id, label, embedding, nrm FROM ${normView(s, dir)}),
          unn AS (SELECT vec_id, label, dim, v FROM ${unnView(s, dir)}),
          cent AS (SELECT label, dim,
            CAST(SUM(CAST(v AS DECIMAL(38,10))) AS DOUBLE) / COUNT(v) AS c
            FROM unn GROUP BY label, dim),
          cnorm AS (SELECT label,
            sqrt(CAST(SUM(CAST(c * c AS DECIMAL(38,10))) AS DOUBLE)) AS cn
            FROM cent GROUP BY label),
          q AS (SELECT vec_id AS qa, label AS qlabel, embedding AS eq, nrm AS nq
            FROM n WHERE vec_id % 100 = 0),
          qc AS (SELECT u.vec_id AS qa, ce.label,
              CAST(SUM(CAST(CAST(u.v AS DOUBLE) * ce.c AS DECIMAL(38,10))) AS DOUBLE) AS dot
            FROM unn u JOIN cent ce ON ce.dim = u.dim
            WHERE u.vec_id % 100 = 0 GROUP BY u.vec_id, ce.label),
          probe AS (SELECT qa, label FROM (
            SELECT qc.qa, qc.label,
              ROW_NUMBER() OVER (PARTITION BY qc.qa
                ORDER BY qc.dot / cn.cn DESC, qc.label) AS pr
            FROM qc JOIN cnorm cn ON cn.label = qc.label) t WHERE pr <= 2),
          scored AS (SELECT q.qa, n.vec_id AS vb,
              vec_dot(q.eq, n.embedding) / (q.nq * n.nrm) AS cos
            FROM probe p JOIN q ON q.qa = p.qa
            JOIN n ON n.label = p.label AND n.vec_id <> q.qa),
          ranked AS (SELECT qa, vb, cos,
            ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cos DESC, vb) AS rnk
            FROM scored)
          SELECT qa, vb, rnk, cos FROM ranked WHERE rnk <= 3 ORDER BY qa, rnk""")
      },
      Some(s"""
        WITH n AS MATERIALIZED (SELECT vec_id, label, embedding,
          sqrt(${duckDot("embedding", "embedding")}) AS nrm FROM embeddings),
        unn AS MATERIALIZED (SELECT vec_id, label,
          generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding) AS v
          FROM embeddings),
        cent AS MATERIALIZED (SELECT label, dim,
          CAST(CAST(SUM(CAST(v AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT(v) AS c
          FROM unn GROUP BY label, dim),
        cnorm AS (SELECT label,
          sqrt(CAST(CAST(SUM(CAST(c * c AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)) AS cn
          FROM cent GROUP BY label),
        q AS (SELECT vec_id AS qa, label AS qlabel, embedding AS eq, nrm AS nq
          FROM n WHERE vec_id % 100 = 0),
        qc AS (SELECT u.vec_id AS qa, ce.label,
            CAST(CAST(SUM(CAST(CAST(u.v AS DOUBLE) * ce.c AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS dot
          FROM unn u JOIN cent ce ON ce.dim = u.dim
          WHERE u.vec_id % 100 = 0 GROUP BY u.vec_id, ce.label),
        probe AS (SELECT qa, label FROM (
          SELECT qc.qa, qc.label,
            ROW_NUMBER() OVER (PARTITION BY qc.qa
              ORDER BY qc.dot / cn.cn DESC, qc.label) AS pr
          FROM qc JOIN cnorm cn ON cn.label = qc.label) t WHERE pr <= 2),
        scored AS (SELECT q.qa, n.vec_id AS vb,
            ${duckDot("q.eq", "n.embedding")} / (q.nq * n.nrm) AS cos
          FROM probe p JOIN q ON q.qa = p.qa
          JOIN n ON n.label = p.label AND n.vec_id <> q.qa),
        ranked AS (SELECT qa, vb, cos,
          ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cos DESC, vb) AS rnk
          FROM scored)
        SELECT qa, vb, rnk, cos FROM ranked WHERE rnk <= 3 ORDER BY qa, rnk"""))
  )
}
