package graft.ops

import graft.{Op, OpModule, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import textsql._

/** Deduplication family (SURVEY.md §2.11; driver north star): exact,
  * MinHash+LSH, SimHash, blocked n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is blocked/bucketed so candidate generation is
  * an EQUI-join (shuffle-hash on the bucket key), never an all-pairs loop:
  *   - minhash: LSH band signature equality (2 bands × 4 rows over an 8-hash
  *     signature) → candidates → exact shingle-Jaccard verify of candidates;
  *   - ngram: shingle-match join blocked by document-length bucket (±1);
  *   - embed: sign-bit LSH bucket (6 bits) + label as the join key.
  * At 100 TB the only change is bucket granularity; no operator here holds
  * more than one bucket's pairs in an executor at a time. */
object DedupOps extends OpModule {

  /** Distinct (doc_id, 3-word-shingle) pairs — the unit of minhash/ngram. */
  private def sparkShingleSql =
    s"""SELECT DISTINCT doc_id, n_chars, s FROM (
       SELECT doc_id, n_chars, explode(${sparkShingles("toks")}) AS s FROM (
         SELECT doc_id, n_chars, ${sparkToks("text")} AS toks FROM documents
         WHERE size(${sparkToks("text")}) >= 3) t) x"""
  private def duckShingleSql =
    s"""SELECT DISTINCT doc_id, n_chars, s FROM (
       SELECT doc_id, n_chars, unnest(${duckShingles("toks")}) AS s FROM (
         SELECT doc_id, n_chars, ${duckToks("text")} AS toks FROM documents
         WHERE len(${duckToks("text")}) >= 3) t) x"""

  def ops: Seq[Op] = Seq(

    // Exact dedup: md5 fingerprint, keep min doc_id per distinct text.
    Op("dedup_exact",
      (s, dir) => Tables(s, dir, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies", "fp")
        .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        md5(text) AS fp FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    // MinHash + LSH near-dup pairs, exact-Jaccard verified ≥ 0.5.
    Op("dedup_minhash",
      (s, dir) => {
        val spark = s
        Tables(spark, dir, "documents").createOrReplaceTempView("documents")
        val minCols = A.zipWithIndex
          .map { case (a, i) => s"MIN(($a * h + ${i + 1}) % $P) AS m$i" }
          .mkString(", ")
        spark.sql(s"""
          WITH sh AS (SELECT doc_id, s FROM ($sparkShingleSql) q),
          hs AS (SELECT doc_id, ${sparkHash("s")} AS h FROM sh),
          sig AS (SELECT doc_id, $minCols FROM hs GROUP BY doc_id),
          bands AS (SELECT doc_id,
            concat_ws('_', CAST(m0 AS STRING), CAST(m1 AS STRING), CAST(m2 AS STRING), CAST(m3 AS STRING)) AS b0,
            concat_ws('_', CAST(m4 AS STRING), CAST(m5 AS STRING), CAST(m6 AS STRING), CAST(m7 AS STRING)) AS b1
            FROM sig),
          cand AS (
            SELECT a.doc_id AS da, b.doc_id AS db FROM bands a JOIN bands b
              ON a.b0 = b.b0 AND a.doc_id < b.doc_id
            UNION
            SELECT a.doc_id, b.doc_id FROM bands a JOIN bands b
              ON a.b1 = b.b1 AND a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          inter AS (SELECT c.da, c.db, COUNT(*) AS i FROM cand c
            JOIN sh sa ON sa.doc_id = c.da
            JOIN sh sb ON sb.doc_id = c.db AND sb.s = sa.s
            GROUP BY c.da, c.db)
          SELECT da AS doc_a, db AS doc_b, i AS n_common,
            CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
          FROM inter JOIN sizes na ON na.doc_id = da
          JOIN sizes nb ON nb.doc_id = db
          WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5
          ORDER BY doc_a, doc_b""")
      },
      Some {
        val minCols = A.zipWithIndex
          .map { case (a, i) => s"MIN(($a * h + ${i + 1}) % $P) AS m$i" }
          .mkString(", ")
        s"""
          WITH sh AS MATERIALIZED (SELECT doc_id, s FROM ($duckShingleSql) q),
          hs AS (SELECT doc_id, ${duckHash("s")} AS h FROM sh),
          sig AS MATERIALIZED (SELECT doc_id, $minCols FROM hs GROUP BY doc_id),
          bands AS MATERIALIZED (SELECT doc_id,
            concat_ws('_', CAST(m0 AS VARCHAR), CAST(m1 AS VARCHAR), CAST(m2 AS VARCHAR), CAST(m3 AS VARCHAR)) AS b0,
            concat_ws('_', CAST(m4 AS VARCHAR), CAST(m5 AS VARCHAR), CAST(m6 AS VARCHAR), CAST(m7 AS VARCHAR)) AS b1
            FROM sig),
          cand AS (
            SELECT a.doc_id AS da, b.doc_id AS db FROM bands a JOIN bands b
              ON a.b0 = b.b0 AND a.doc_id < b.doc_id
            UNION
            SELECT a.doc_id, b.doc_id FROM bands a JOIN bands b
              ON a.b1 = b.b1 AND a.doc_id < b.doc_id),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          inter AS (SELECT c.da, c.db, COUNT(*) AS i FROM cand c
            JOIN sh sa ON sa.doc_id = c.da
            JOIN sh sb ON sb.doc_id = c.db AND sb.s = sa.s
            GROUP BY c.da, c.db)
          SELECT da AS doc_a, db AS doc_b, i AS n_common,
            CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
          FROM inter JOIN sizes na ON na.doc_id = da
          JOIN sizes nb ON nb.doc_id = db
          WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5
          ORDER BY doc_a, doc_b"""
      }),

    // 32-bit SimHash fingerprint over tokens (with multiplicity).
    Op("dedup_simhash",
      (s, dir) => {
        Tables(s, dir, "documents").createOrReplaceTempView("documents")
        val sums = (0 until 32)
          .map(b => s"SUM(CASE WHEN shiftright(h, $b) % 2 = 1 THEN 1 ELSE -1 END) AS s$b")
          .mkString(", ")
        val fp = (0 until 32)
          .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
          .mkString(" + ")
        s.sql(s"""
          WITH tok AS (SELECT doc_id, explode(${sparkToks("text")}) AS tok FROM documents),
          th AS (SELECT doc_id, ${sparkHash("tok")} AS h FROM tok),
          bits AS (SELECT doc_id, $sums FROM th GROUP BY doc_id)
          SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM bits ORDER BY doc_id""")
      },
      Some {
        val sums = (0 until 32)
          .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
          .mkString(", ")
        val fp = (0 until 32)
          .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
          .mkString(" + ")
        s"""
          WITH tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS tok FROM documents),
          th AS (SELECT doc_id, ${duckHash("tok")} AS h FROM tok),
          bits AS (SELECT doc_id, $sums FROM th GROUP BY doc_id)
          SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM bits ORDER BY doc_id"""
      }),

    // Exact shingle-Jaccard pairs, blocked by length bucket (same or +1).
    Op("dedup_ngram",
      (s, dir) => {
        Tables(s, dir, "documents").createOrReplaceTempView("documents")
        s.sql(s"""
          WITH sh AS (SELECT doc_id, n_chars div 20 AS bkt, s FROM ($sparkShingleSql) q),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              AND b.bkt - a.bkt IN (0, 1)
            GROUP BY a.doc_id, b.doc_id)
          SELECT da AS doc_a, db AS doc_b,
            CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
          FROM inter JOIN sizes na ON na.doc_id = da
          JOIN sizes nb ON nb.doc_id = db
          WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5
          ORDER BY doc_a, doc_b""")
      },
      Some(s"""
        WITH sh AS MATERIALIZED (SELECT doc_id, n_chars // 20 AS bkt, s FROM ($duckShingleSql) q),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            AND b.bkt - a.bkt IN (0, 1)
          GROUP BY a.doc_id, b.doc_id)
        SELECT da AS doc_a, db AS doc_b,
          CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
        FROM inter JOIN sizes na ON na.doc_id = da
        JOIN sizes nb ON nb.doc_id = db
        WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // Embedding-cosine near-dup: sign-bit LSH bucket + label blocking.
    Op("dedup_embed",
      (s, dir) => {
        GraftFunctions.register(s)
        Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
        s.sql(s"""
          WITH n AS (SELECT vec_id, label,
            ${sparkSignBucket("embedding", 6)} AS bkt, embedding,
            sqrt(vec_dot(embedding, embedding)) AS nrm FROM embeddings)
          SELECT va, vb, cos FROM (
            SELECT a.vec_id AS va, b.vec_id AS vb,
              vec_dot(a.embedding, b.embedding) / (a.nrm * b.nrm) AS cos
            FROM n a JOIN n b ON a.label = b.label AND a.bkt = b.bkt
              AND a.vec_id < b.vec_id) p
          WHERE cos >= 0.35 ORDER BY va, vb""")
      },
      Some(s"""
        WITH n AS MATERIALIZED (SELECT vec_id, label,
          ${duckSignBucket("embedding", 6)} AS bkt, embedding,
          sqrt(${duckDot("embedding", "embedding")}) AS nrm FROM embeddings)
        SELECT va, vb, cos FROM (
          SELECT a.vec_id AS va, b.vec_id AS vb,
            ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
          FROM n a JOIN n b ON a.label = b.label AND a.bkt = b.bkt
            AND a.vec_id < b.vec_id) p
        WHERE cos >= 0.35 ORDER BY va, vb"""))
  )
}
