package graft.ops

import graft.{Op, OpModule, Staging, Tables, num}
import org.apache.spark.sql.functions._
import textsql._

/** Round-3 additions to the training-data-pipeline surface (SURVEY.md §2.11
  * family) plus small relational completions: deterministic dataset
  * splitting, context-window packing, PII redaction, argmin/argmax
  * aggregates, batch sessionization, time-series interpolation, csv/json
  * sink round-trips, and a threshold similarity join.
  *
  * House determinism rules apply throughout (graft.num scaladoc): md5-based
  * hashes, decimal-exact cross-row sums, per-row IEEE arithmetic written in
  * identical operation order in both engines.
  */
object PipelineOps extends OpModule {

  private def view(s: org.apache.spark.sql.SparkSession, dir: String, n: String): Unit =
    Tables(s, dir, n).createOrReplaceTempView(n)

  def ops: Seq[Op] = Seq(

    // Deterministic train/val/test split — the reproducible-split primitive
    // every training pipeline needs: bucket = md5(doc_id) mod 10 (8/1/1).
    // Hash-based (not random) so the split is stable across engines, runs,
    // and partitionings; per-row map work, embarrassingly parallel at 100 TB.
    Op("split_train_test",
      (s, dir) => {
        view(s, dir, "documents")
        s.sql(s"""
          WITH h AS (SELECT doc_id, n_chars,
            (${sparkHash("CAST(doc_id AS STRING)")}) % 10 AS b
            FROM documents)
          SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
              ELSE 'test' END AS split,
            COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
          FROM h GROUP BY 1 ORDER BY 1""")
      },
      Some(s"""
        WITH h AS (SELECT doc_id, n_chars,
          (${duckHash("CAST(doc_id AS VARCHAR)")}) % 10 AS b
          FROM documents)
        SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
            ELSE 'test' END AS split,
          COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM h GROUP BY 1 ORDER BY 1""")),

    // CORPUS MIXTURE REBALANCING — the domain/language-balancing step a
    // training-data pipeline runs between dedup and packing: downsample
    // every language class to (approximately) the minority class's size
    // with DETERMINISTIC hash-threshold sampling — keep doc iff
    // h(doc) · n_lang < k_target · P, h uniform on [0, P) — so the sample
    // is stable across engines, runs and partitionings, needs no shuffle
    // beyond a 5-row broadcast of class counts (per-row map + one
    // aggregate; the same plan shape at 100 TB), and the minority class is
    // kept in full (h·k < k·P always). Counts are rate-targeted, not
    // exact-k: exact-k per class is a per-class top-k (see win_rank's
    // TopKRows) — the rate form is what web-scale pipelines ship because
    // it composes with sharding. Emits per-class audit rows (original
    // count, kept count, kept-id checksum), integer-exact cross-engine.
    Op("corpus_mix",
      (s, dir) => {
        view(s, dir, "documents")
        s.sql(s"""
          WITH h AS (SELECT doc_id, lang,
            (${sparkHash("CAST(doc_id AS STRING)")}) AS hv FROM documents),
          cnt AS (SELECT lang, COUNT(*) AS n FROM h GROUP BY 1),
          tgt AS (SELECT MIN(n) AS k FROM cnt),
          kept AS (SELECT h.doc_id, h.lang
            FROM h JOIN cnt ON cnt.lang = h.lang
            WHERE CAST(h.hv AS DECIMAL(38,0)) * cnt.n
              < CAST((SELECT k FROM tgt) AS DECIMAL(38,0)) * ${textsql.P}),
          ks AS (SELECT lang, COUNT(*) AS n_kept, SUM(doc_id) AS id_sum
            FROM kept GROUP BY 1)
          SELECT c.lang, c.n AS n_orig,
            COALESCE(ks.n_kept, CAST(0 AS BIGINT)) AS n_kept,
            COALESCE(ks.id_sum, CAST(0 AS BIGINT)) AS id_sum
          FROM cnt c LEFT JOIN ks ON ks.lang = c.lang
          ORDER BY 1""")
      },
      Some(s"""
        WITH h AS (SELECT doc_id, lang,
          (${duckHash("CAST(doc_id AS VARCHAR)")}) AS hv FROM documents),
        cnt AS (SELECT lang, COUNT(*) AS n FROM h GROUP BY 1),
        tgt AS (SELECT MIN(n) AS k FROM cnt),
        kept AS (SELECT h.doc_id, h.lang
          FROM h JOIN cnt ON cnt.lang = h.lang
          WHERE CAST(h.hv AS DECIMAL(38,0)) * cnt.n
              < CAST((SELECT k FROM tgt) AS DECIMAL(38,0)) * ${textsql.P}),
        ks AS (SELECT lang, COUNT(*) AS n_kept, SUM(doc_id) AS id_sum
          FROM kept GROUP BY 1)
        SELECT c.lang, c.n AS n_orig,
          COALESCE(ks.n_kept, CAST(0 AS BIGINT)) AS n_kept,
          CAST(COALESCE(ks.id_sum, 0) AS BIGINT) AS id_sum
        FROM cnt c LEFT JOIN ks ON ks.lang = c.lang
        ORDER BY 1""")),

    // IMPORTANCE-WEIGHTED SAMPLING — the per-row generalization of
    // corpus_mix's class-rate thresholding (DSIR-family curation: sample
    // docs proportionally to a per-doc weight — here n_chars, i.e.
    // length-proportional token-budget sampling; any integer quality or
    // domain-match score plugs into the same comparison): keep doc iff
    // h(doc)·wmax < w(doc)·2⁶⁰, h uniform on [0, 2⁶⁰) — E[keep] =
    // w/wmax per doc, deterministic across engines/runs/partitionings.
    // Products in DECIMAL(38,0) (h·wmax crosses 2⁶³ immediately). Per-row
    // map + a 1-row broadcast of wmax — the same plan at 100 TB. Emits
    // per-source audit rows (orig/kept counts, char masses, kept-id
    // checksum).
    Op("corpus_importance_sample",
      (s, dir) => {
        view(s, dir, "documents")
        s.sql(s"""
          WITH h AS (SELECT doc_id, source, n_chars,
            (${sparkHash60("CAST(doc_id AS STRING)")}) AS hv FROM documents),
          mx AS (SELECT MAX(n_chars) AS wmax FROM documents),
          kept AS (SELECT h.doc_id, h.source, h.n_chars
            FROM h CROSS JOIN mx
            WHERE CAST(h.hv AS DECIMAL(38,0)) * wmax
              < CAST(h.n_chars AS DECIMAL(38,0)) * ${1L << 60}),
          ks AS (SELECT source, COUNT(*) AS n_kept,
            SUM(n_chars) AS kept_chars, SUM(doc_id) AS id_sum
            FROM kept GROUP BY 1),
          base AS (SELECT source, COUNT(*) AS n_docs,
            SUM(n_chars) AS sum_chars FROM documents GROUP BY 1)
          SELECT b.source, b.n_docs, b.sum_chars,
            COALESCE(ks.n_kept, CAST(0 AS BIGINT)) AS n_kept,
            COALESCE(ks.kept_chars, CAST(0 AS BIGINT)) AS kept_chars,
            COALESCE(ks.id_sum, CAST(0 AS BIGINT)) AS id_sum
          FROM base b LEFT JOIN ks ON ks.source = b.source
          ORDER BY 1""")
      },
      Some(s"""
        WITH h AS (SELECT doc_id, source, n_chars,
          (${duckHash60("CAST(doc_id AS VARCHAR)")}) AS hv FROM documents),
        mx AS (SELECT MAX(n_chars) AS wmax FROM documents),
        kept AS (SELECT h.doc_id, h.source, h.n_chars
          FROM h CROSS JOIN mx
          WHERE CAST(h.hv AS DECIMAL(38,0)) * wmax
            < CAST(h.n_chars AS DECIMAL(38,0)) * ${1L << 60}),
        ks AS (SELECT source, COUNT(*) AS n_kept,
          CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
          CAST(SUM(doc_id) AS BIGINT) AS id_sum
          FROM kept GROUP BY 1),
        base AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY 1)
        SELECT b.source, b.n_docs, b.sum_chars,
          COALESCE(ks.n_kept, CAST(0 AS BIGINT)) AS n_kept,
          COALESCE(ks.kept_chars, CAST(0 AS BIGINT)) AS kept_chars,
          COALESCE(ks.id_sum, CAST(0 AS BIGINT)) AS id_sum
        FROM base b LEFT JOIN ks ON ks.source = b.source
        ORDER BY 1""")),

    // TOKEN-BUDGET SELECTION — "fill a fixed token budget with the
    // best-scoring docs" (the curation step after scoring: rank by
    // quality, cut at the budget). Score = type-token ratio in ppm
    // (integer div — exact both engines); budget = ⌊total tokens / 5⌋.
    // The cut is computed WITHOUT a global doc sort: scores live in a
    // ppm-BOUNDED domain (≤ 10⁶ + 1 distinct values), so phase 1
    // aggregates tokens per score level (map-side combined,
    // domain-bounded output) and runs the cumulative window over THAT;
    // phase 2 keeps every doc strictly above the boundary score and
    // tie-resolves only the boundary class against the remaining budget.
    // The class tie-break itself is TWO-LEVEL (r16 — the r15 form ran
    // one ORDER BY doc_id window over the whole class, which a
    // degenerate score distribution could make corpus-sized, exactly
    // the single-task collapse the score rewrite avoids): the boundary
    // class hash-bands into 1024 md5 buckets, a cumulative window over
    // the ≤1024-row band aggregate finds the boundary BAND, and the
    // per-doc window runs only inside that one band — so the largest
    // unpartitioned window anywhere in the plan is ~class/1024 rows
    // even when every doc shares one score. Tie order is (band,
    // doc_id): deterministic and identical cross-engine, which is all
    // the fill-the-last-tokens contract requires. (The naive ORDER BY
    // score global window is one task holding every doc row — the
    // vertex-cover-tail collapse shape; this is the bounded-domain
    // rewrite that survives 100 TB.)
    Op("corpus_token_budget",
      (s, dir) => {
        view(s, dir, "documents")
        val toks = sparkToks("text")
        s.sql(s"""
          WITH sc AS (SELECT doc_id, source, size($toks) AS n_tok,
            (1000000 * CAST(size(array_distinct($toks)) AS BIGINT))
              div size($toks) AS score
            FROM documents),
          agg AS (SELECT score, SUM(n_tok) AS t FROM sc GROUP BY score),
          cum AS (SELECT score, SUM(t) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumt
            FROM agg),
          bud AS (SELECT SUM(n_tok) div 5 AS b FROM sc),
          bound AS (SELECT MAX(score) AS sb FROM cum CROSS JOIN bud
            WHERE cumt > b),
          rb AS (SELECT b - COALESCE(
              (SELECT MAX(cumt) FROM cum CROSS JOIN bud WHERE cumt <= b),
              CAST(0 AS BIGINT)) AS r
            FROM bud),
          bcl AS (SELECT sc.doc_id, sc.source, sc.n_tok,
              (${sparkHash("CAST(sc.doc_id AS STRING)")}) % 1024 AS band
            FROM sc CROSS JOIN bound WHERE sc.score = bound.sb),
          bagg AS (SELECT band, SUM(n_tok) AS t FROM bcl GROUP BY band),
          bcum AS (SELECT band, SUM(t) OVER (ORDER BY band
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumt
            FROM bagg),
          bb AS (SELECT MIN(band) AS v FROM bcum CROSS JOIN rb
            WHERE cumt > rb.r),
          rb2 AS (SELECT rb.r - COALESCE(
              (SELECT MAX(cumt) FROM bcum CROSS JOIN rb WHERE cumt <= rb.r),
              CAST(0 AS BIGINT)) AS r2
            FROM rb),
          btie AS (
            SELECT bcl.doc_id, bcl.source, bcl.n_tok
            FROM bcl CROSS JOIN bb WHERE bcl.band < bb.v
            UNION ALL
            SELECT doc_id, source, n_tok FROM (
              SELECT bcl.*, SUM(n_tok) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dcum
              FROM bcl CROSS JOIN bb WHERE bcl.band = bb.v) z
            CROSS JOIN rb2 WHERE dcum <= rb2.r2),
          kept AS (SELECT doc_id, source, n_tok FROM sc CROSS JOIN bound
              WHERE bound.sb IS NULL OR sc.score > bound.sb
            UNION ALL SELECT doc_id, source, n_tok FROM btie)
          SELECT source, COUNT(*) AS n_kept, SUM(n_tok) AS kept_toks,
            SUM(doc_id) AS id_sum
          FROM kept GROUP BY 1 ORDER BY 1""")
      },
      Some(s"""
        WITH sc AS (SELECT doc_id, source,
          len(${duckToks("text")}) AS n_tok,
          (1000000 * len(list_distinct(${duckToks("text")})))
            // len(${duckToks("text")}) AS score
          FROM documents),
        agg AS (SELECT score, CAST(SUM(n_tok) AS BIGINT) AS t
          FROM sc GROUP BY score),
        cum AS (SELECT score, CAST(SUM(t) OVER (ORDER BY score DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cumt FROM agg),
        bud AS (SELECT CAST(SUM(n_tok) AS BIGINT) // 5 AS b FROM sc),
        bound AS (SELECT MAX(score) AS sb FROM cum CROSS JOIN bud
          WHERE cumt > b),
        rb AS (SELECT b - COALESCE(
            (SELECT MAX(cumt) FROM cum CROSS JOIN bud WHERE cumt <= b),
            CAST(0 AS BIGINT)) AS r
          FROM bud),
        bcl AS (SELECT sc.doc_id, sc.source, sc.n_tok,
            (${duckHash("CAST(sc.doc_id AS VARCHAR)")}) % 1024 AS band
          FROM sc CROSS JOIN bound WHERE sc.score = bound.sb),
        bagg AS (SELECT band, CAST(SUM(n_tok) AS BIGINT) AS t
          FROM bcl GROUP BY band),
        bcum AS (SELECT band, CAST(SUM(t) OVER (ORDER BY band
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cumt FROM bagg),
        bb AS (SELECT MIN(band) AS v FROM bcum CROSS JOIN rb
          WHERE cumt > rb.r),
        rb2 AS (SELECT rb.r - COALESCE(
            (SELECT MAX(cumt) FROM bcum CROSS JOIN rb WHERE cumt <= rb.r),
            CAST(0 AS BIGINT)) AS r2
          FROM rb),
        btie AS (
          SELECT bcl.doc_id, bcl.source, bcl.n_tok
          FROM bcl CROSS JOIN bb WHERE bcl.band < bb.v
          UNION ALL
          SELECT doc_id, source, n_tok FROM (
            SELECT bcl.*, CAST(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS dcum
            FROM bcl CROSS JOIN bb WHERE bcl.band = bb.v) z
          CROSS JOIN rb2 WHERE dcum <= rb2.r2),
        kept AS (SELECT doc_id, source, n_tok FROM sc CROSS JOIN bound
            WHERE bound.sb IS NULL OR sc.score > bound.sb
          UNION ALL SELECT doc_id, source, n_tok FROM btie)
        SELECT source, COUNT(*) AS n_kept,
          CAST(SUM(n_tok) AS BIGINT) AS kept_toks,
          CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM kept GROUP BY 1 ORDER BY 1""")),

    // Train/eval DECONTAMINATION — the overlap audit every LLM training
    // pipeline runs before shipping a dataset: find training documents that
    // share any 5-word shingle with a held-out benchmark/eval set (here the
    // deterministic doc_id % 17 holdout), reporting how many distinct
    // shingles leak and how many eval docs each one taints. 5-word windows
    // are the n-gram-decontamination sweet spot: long enough that shared
    // boilerplate phrases don't flag everything (3-grams flag 87% of this
    // fixture; 5-grams flag ~1%), short enough to catch paraphrase-free
    // inclusion. Scale shape: the eval side is benchmarks — thousands of
    // docs against billions, so its distinct-shingle set is broadcast-sized
    // by construction (hinted below; Catalyst confirms from the size
    // estimate); the train side streams map-side through the hash join and
    // NEVER shuffles pre-join. The two aggregate distincts shuffle only
    // matched (doc, shingle) pairs — contamination-sized, not corpus-sized.
    Op("text_decontaminate",
      (s, dir) => {
        view(s, dir, "documents")
        s.sql(s"""
          WITH toks AS (SELECT doc_id, ${sparkToks("text")} AS t FROM documents),
          sh AS (SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, explode(${sparkShinglesW("t", 5)}) AS s
            FROM toks WHERE size(t) >= 5) x),
          ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 17 = 0),
          tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 17 <> 0)
          SELECT /*+ BROADCAST(ev) */ tr.doc_id,
            COUNT(DISTINCT tr.s) AS n_shared,
            COUNT(DISTINCT ev.eval_id) AS n_eval_docs
          FROM tr JOIN ev ON ev.s = tr.s
          GROUP BY tr.doc_id ORDER BY doc_id""")
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${duckToks("text")} AS t FROM documents),
        sh AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(${duckShinglesW("t", 5)}) AS s
          FROM toks WHERE len(t) >= 5) x),
        ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 17 = 0),
        tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 17 <> 0)
        SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n_shared,
          COUNT(DISTINCT ev.eval_id) AS n_eval_docs
        FROM tr JOIN ev ON ev.s = tr.s
        GROUP BY tr.doc_id ORDER BY doc_id""")),

    // Context-window packing by OFFSET BINNING: concatenate each shard's
    // docs in a stable order and cut the token stream at fixed 512-token
    // marks; a doc belongs to the bin containing its start offset (doc
    // boundaries respected, so a doc straddling a mark overflows its bin
    // and the NEXT bin starts correspondingly short — unlike a greedy
    // packer, which would reset the budget per pack; offset binning is the
    // windowless-shuffle variant: one prefix sum, no sequential state).
    // The running sum is PARTITIONED BY SOURCE — a global ORDER BY window
    // would execute as one task at any scale; per-shard packing (here: the
    // corpus's source streams, at 100 TB: file shards) is what pipelines
    // ship anyway. pack_id = (source, start-offset div budget).
    Op("text_pack",
      (s, dir) => {
        view(s, dir, "documents")
        s.sql("""
          WITH t AS (SELECT source, doc_id, size(split(text, ' ')) AS toks
            FROM documents),
          c AS (SELECT source, doc_id, toks,
            COALESCE(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM t)
          SELECT source, cb div 512 AS pack_id, COUNT(*) AS n_docs,
            SUM(toks) AS sum_toks, MIN(doc_id) AS first_doc
          FROM c GROUP BY 1, 2 ORDER BY 1, 2""")
      },
      Some("""
        WITH t AS (SELECT source, doc_id, len(string_split(text, ' ')) AS toks
          FROM documents),
        c AS (SELECT source, doc_id, toks,
          COALESCE(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM t)
        SELECT source, CAST(cb // 512 AS BIGINT) AS pack_id, COUNT(*) AS n_docs,
          CAST(SUM(toks) AS BIGINT) AS sum_toks, MIN(doc_id) AS first_doc
        FROM c GROUP BY 1, 2 ORDER BY 1, 2""")),

    // PII redaction — the scrubbing pass before training data leaves the
    // pipeline. The fixture corpus is synthetic words, so a contact string
    // (email + phone) is appended per doc and the redactor must strip it
    // from the combined text; n_pii counts pre-redaction matches. Pure
    // per-row regex (codegen'd), no shuffle. Patterns stay in the
    // character-class subset Java regex and RE2 treat identically.
    Op("text_pii_redact",
      (s, dir) => {
        view(s, dir, "documents")
        s.sql("""
          WITH raw AS (SELECT doc_id,
            concat(text, ' contact u', CAST(doc_id AS STRING),
              '@mail.example tel 555-', CAST(doc_id * 7 AS STRING)) AS full_text
            FROM documents)
          SELECT doc_id,
            regexp_count(full_text,
              '[a-z0-9._]+@[a-z0-9.]+|555-[0-9]+') AS n_pii,
            regexp_replace(regexp_replace(full_text,
              '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>'),
              '555-[0-9]+', '<TEL>') AS redacted
          FROM raw ORDER BY doc_id""")
      },
      Some("""
        WITH raw AS (SELECT doc_id,
          text || ' contact u' || CAST(doc_id AS VARCHAR)
            || '@mail.example tel 555-' || CAST(doc_id * 7 AS VARCHAR) AS full_text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(full_text,
            '[a-z0-9._]+@[a-z0-9.]+|555-[0-9]+')) AS INTEGER) AS n_pii,
          regexp_replace(regexp_replace(full_text,
            '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
            '555-[0-9]+', '<TEL>', 'g') AS redacted
        FROM raw ORDER BY doc_id""")),

    // argmin/argmax aggregates (SQL MAX_BY/MIN_BY ≡ DuckDB arg_max/arg_min).
    // The ordering value is o_orderkey — unique by construction, so the
    // picked row is deterministic with no tie-break dance: per status, the
    // price of the newest and oldest order. One map-side-combinable agg.
    Op("agg_minmax_by",
      (s, dir) => {
        view(s, dir, "orders")
        s.sql("""SELECT o_orderstatus,
          max_by(o_totalprice, o_orderkey) AS newest_price,
          min_by(o_totalprice, o_orderkey) AS oldest_price,
          MAX(o_totalprice) AS max_price, COUNT(*) AS n
          FROM orders GROUP BY 1 ORDER BY 1""")
      },
      Some("""SELECT o_orderstatus,
        arg_max(o_totalprice, o_orderkey) AS newest_price,
        arg_min(o_totalprice, o_orderkey) AS oldest_price,
        MAX(o_totalprice) AS max_price, COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // Batch sessionization: gap > 30 min starts a new session — the batch
    // twin of stream_session (session_window), built from primitives (lag →
    // boundary flag → running sum) so the semantics are oracle-checkable.
    // One shuffle on user_id; window state is per-user-bounded. Output is
    // epoch-micros longs (cross-engine timestamp text differs at ns
    // precision; the micros longs are the exact values both engines hold).
    Op("win_sessionize",
      (s, dir) => {
        view(s, dir, "events")
        s.sql("""
          WITH e AS (SELECT user_id, event_id, unix_micros(ts) AS tm
            FROM events WHERE user_id % 20 = 0),
          l AS (SELECT user_id, event_id, tm,
            LAG(tm) OVER (PARTITION BY user_id ORDER BY tm, event_id) AS ptm
            FROM e),
          b AS (SELECT user_id, event_id, tm,
            CASE WHEN ptm IS NULL OR tm - ptm > 1800000000 THEN 1 ELSE 0 END AS ns
            FROM l),
          s AS (SELECT user_id, event_id, tm,
            SUM(ns) OVER (PARTITION BY user_id ORDER BY tm, event_id
              ROWS UNBOUNDED PRECEDING) AS sess
            FROM b)
          SELECT user_id, CAST(sess AS BIGINT) AS sess,
            COUNT(*) AS n_events, MIN(tm) AS t0, MAX(tm) AS t1
          FROM s GROUP BY 1, 2 ORDER BY 1, 2""")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tm
          FROM events WHERE user_id % 20 = 0),
        l AS (SELECT user_id, event_id, tm,
          LAG(tm) OVER (PARTITION BY user_id ORDER BY tm, event_id) AS ptm
          FROM e),
        b AS (SELECT user_id, event_id, tm,
          CASE WHEN ptm IS NULL OR tm - ptm > 1800000000 THEN 1 ELSE 0 END AS ns
          FROM l),
        s AS (SELECT user_id, event_id, tm,
          SUM(ns) OVER (PARTITION BY user_id ORDER BY tm, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
          FROM b)
        SELECT user_id, CAST(sess AS BIGINT) AS sess,
          COUNT(*) AS n_events, MIN(tm) AS t0, MAX(tm) AS t1
        FROM s GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Funnel / sequence-pattern detection (the MATCH_RECOGNIZE surface of
    // event analytics, composed from primitives): view → click → purchase
    // per user in stream order — intervening events allowed (the standard
    // funnel contract), each step ≤ 7 days after the previous (this
    // fixture's per-user event cadence is ~10 h; a 30-min bound matched
    // zero rows at every SF, which round 5 demoted from "contract" to
    // "vacuous"). Step memory = two conditional running-max scans over one
    // user-partitioned window — one shuffle on user_id, per-user-bounded
    // state, deterministic via (ts, event_id) ordering. Output: per-user
    // completed-funnel count and first completion time (epoch micros).
    Op("win_funnel",
      (s, dir) => {
        view(s, dir, "events")
        s.sql(s"""
          WITH e AS (SELECT user_id, event_id, event_type,
            unix_micros(ts) AS tm FROM events
            WHERE event_type IN ('view', 'click', 'purchase')),
          l AS (SELECT user_id, event_type, tm,
            MAX(CASE WHEN event_type = 'click' THEN tm END) OVER w AS last_click,
            MAX(CASE WHEN event_type = 'view' THEN tm END) OVER w AS last_view
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tm, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
          f AS (SELECT user_id, tm FROM l
            WHERE event_type = 'purchase' AND last_click IS NOT NULL
              AND last_view IS NOT NULL AND last_view <= last_click
              AND tm - last_click <= $FunnelStepMicros
              AND last_click - last_view <= $FunnelStepMicros)
          SELECT user_id, COUNT(*) AS n_funnels, MIN(tm) AS first_done
          FROM f GROUP BY 1 ORDER BY 1""")
      },
      Some(s"""
        WITH e AS (SELECT user_id, event_id, event_type,
          epoch_us(ts) AS tm FROM events
          WHERE event_type IN ('view', 'click', 'purchase')),
        l AS (SELECT user_id, event_type, tm,
          MAX(CASE WHEN event_type = 'click' THEN tm END) OVER w AS last_click,
          MAX(CASE WHEN event_type = 'view' THEN tm END) OVER w AS last_view
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tm, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        f AS (SELECT user_id, tm FROM l
          WHERE event_type = 'purchase' AND last_click IS NOT NULL
            AND last_view IS NOT NULL AND last_view <= last_click
            AND tm - last_click <= $FunnelStepMicros
            AND last_click - last_view <= $FunnelStepMicros)
        SELECT user_id, COUNT(*) AS n_funnels, MIN(tm) AS first_done
        FROM f GROUP BY 1 ORDER BY 1""")),

    // Linear interpolation over the gap-filled 5-minute grid (ts_gapfill's
    // sibling: gapfill carries counts forward, this reconstructs the value
    // series a model trains on). prev/next observed value+time come from
    // IGNORE NULLS window scans — two passes over the per-user grid, no
    // self-join; interpolation is per-row IEEE arithmetic in identical op
    // order in both engines. Grid edges are observed buckets by
    // construction, so prev/next never fall off the series.
    Op("ts_interpolate",
      (s, dir) => {
        view(s, dir, "events")
        s.sql(s"""
          WITH b AS (SELECT user_id, window(ts, '5 minutes').start AS bstart,
            CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS v
            FROM events WHERE user_id % 50 = 0 GROUP BY 1, 2),
          spans AS (SELECT user_id, MIN(bstart) AS mn, MAX(bstart) AS mx
            FROM b GROUP BY 1),
          grid AS (SELECT user_id,
            explode(sequence(mn, mx, interval 5 minutes)) AS bstart FROM spans),
          g AS (SELECT gr.user_id, gr.bstart, b.v,
            unix_micros(gr.bstart) AS em
            FROM grid gr LEFT JOIN b
              ON b.user_id = gr.user_id AND b.bstart = gr.bstart),
          w AS (SELECT user_id, bstart, v, em,
            LAST_VALUE(v) IGNORE NULLS OVER wp AS pv,
            LAST_VALUE(CASE WHEN v IS NOT NULL THEN em END) IGNORE NULLS
              OVER wp AS pe,
            FIRST_VALUE(v) IGNORE NULLS OVER wf AS nv,
            FIRST_VALUE(CASE WHEN v IS NOT NULL THEN em END) IGNORE NULLS
              OVER wf AS ne
            FROM g
            WINDOW wp AS (PARTITION BY user_id ORDER BY bstart
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wf AS (PARTITION BY user_id ORDER BY bstart
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          SELECT user_id, bstart,
            CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
            CASE WHEN v IS NOT NULL THEN v
              WHEN pv IS NULL THEN nv
              WHEN nv IS NULL THEN pv
              ELSE pv + (nv - pv)
                * (CAST(em - pe AS DOUBLE) / CAST(ne - pe AS DOUBLE)) END AS filled
          FROM w ORDER BY user_id, bstart""")
      },
      Some(s"""
        WITH b AS (SELECT user_id,
          time_bucket(INTERVAL '5 minutes', ts) AS bstart,
          ${num.DSUM("value")} AS v
          FROM events WHERE user_id % 50 = 0 GROUP BY 1, 2),
        spans AS (SELECT user_id, MIN(bstart) AS mn, MAX(bstart) AS mx
          FROM b GROUP BY 1),
        grid AS (SELECT user_id,
          unnest(generate_series(mn, mx, INTERVAL '5 minutes')) AS bstart
          FROM spans),
        g AS (SELECT gr.user_id, gr.bstart, b.v,
          epoch_us(gr.bstart) AS em
          FROM grid gr LEFT JOIN b
            ON b.user_id = gr.user_id AND b.bstart = gr.bstart),
        w AS (SELECT user_id, bstart, v, em,
          LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
          LAST_VALUE(CASE WHEN v IS NOT NULL THEN em END IGNORE NULLS)
            OVER wp AS pe,
          FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
          FIRST_VALUE(CASE WHEN v IS NOT NULL THEN em END IGNORE NULLS)
            OVER wf AS ne
          FROM g
          WINDOW wp AS (PARTITION BY user_id ORDER BY bstart
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY user_id ORDER BY bstart
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id, bstart,
          CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
          CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv)
              * (CAST(em - pe AS DOUBLE) / CAST(ne - pe AS DOUBLE)) END AS filled
        FROM w ORDER BY user_id, bstart""")),

    // Ordered string aggregation (SQL LISTAGG / string_agg): per source,
    // the sorted distinct language list as CSV. Sorting inside the
    // aggregate makes set-valued string concat deterministic under any
    // partitioning — the same rule agg_collect applies to arrays.
    Op("agg_string_concat",
      (s, dir) => {
        view(s, dir, "documents")
        s.sql("""SELECT source,
          array_join(array_sort(collect_set(lang)), ',') AS langs,
          COUNT(DISTINCT lang) AS n_langs, COUNT(*) AS n_docs
          FROM documents GROUP BY 1 ORDER BY 1""")
      },
      Some("""
        WITH d AS (SELECT DISTINCT source, lang FROM documents),
        a AS (SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs,
          COUNT(lang) AS n_langs FROM d GROUP BY 1),
        c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
        SELECT a.source, a.langs, a.n_langs, c.n_docs
        FROM a JOIN c USING (source) ORDER BY source""")),

    // csv / json WRITE sinks (reads were covered by source_csv_json; this
    // closes the writer half of the format surface): the same aggregate is
    // written to both formats, read back with explicit schemas, and the
    // union oracle certifies round-trip fidelity. Long counts only — float
    // text round-trips are format-version territory, parquet owns those.
    Op("sink_csv_json",
      (s, dir) => {
        val agg = Tables(s, dir, "nation")
          .join(broadcast(Tables(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
        val out = Staging.fresh("sink-csv-json")
        agg.write.mode("overwrite").option("header", "true").csv(s"$out/csv")
        agg.write.mode("overwrite").json(s"$out/json")
        val schema = "r_name STRING, n_nations BIGINT"
        val c = s.read.schema(schema).option("header", "true").csv(s"$out/csv")
          .withColumn("fmt", lit("csv"))
        val j = s.read.schema(schema).json(s"$out/json")
          .withColumn("fmt", lit("json"))
        c.unionByName(j).select("fmt", "r_name", "n_nations")
          .orderBy("fmt", "r_name")
      },
      Some("""
        WITH agg AS (SELECT r_name, COUNT(*) AS n_nations
          FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY 1)
        SELECT fmt, r_name, n_nations
        FROM (SELECT 'csv' AS fmt, * FROM agg
          UNION ALL SELECT 'json', * FROM agg) u
        ORDER BY fmt, r_name""")),

    // Threshold (range) similarity join: ALL pairs with cosine ≥ τ inside
    // the same 8-bit sign-LSH bucket — the ε-neighborhood companion to
    // sim_knn_join's top-k. Bucketing keeps the candidate set equi-join-
    // shaped (never all pairs); τ = 0.35 is calibrated to the fixture's
    // random-vector cosine distribution (in-bucket p99 ≈ 0.36). Exact
    // bucketed semantics — the oracle reproduces bucket + threshold, so
    // recall loss from LSH is part of the contract, not hidden.
    Op("sim_range_join",
      (s, dir) => {
        s.sql(s"""
          WITH n AS (SELECT vec_id, embedding,
            ${sparkSignBucket("embedding", 8)} AS bkt, nrm
            FROM ${SimOps.normView(s, dir)}),
          scored AS (SELECT a.vec_id AS va, b.vec_id AS vb,
            vec_dot(a.embedding, b.embedding) / (a.nrm * b.nrm) AS cos
            FROM n a JOIN n b ON b.bkt = a.bkt AND a.vec_id < b.vec_id)
          SELECT va, vb, cos FROM scored WHERE cos >= 0.35
          ORDER BY va, vb""")
      },
      Some(s"""
        WITH n AS MATERIALIZED (SELECT vec_id, embedding,
          ${duckSignBucket("embedding", 8)} AS bkt,
          sqrt(${duckDot("embedding", "embedding")}) AS nrm FROM embeddings),
        scored AS (SELECT a.vec_id AS va, b.vec_id AS vb,
          ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
          FROM n a JOIN n b ON b.bkt = a.bkt AND a.vec_id < b.vec_id)
        SELECT va, vb, cos FROM scored WHERE cos >= 0.35
        ORDER BY va, vb""")),

    // OHLC resample — the finance/telemetry candle: per (series, day)
    // open/high/low/close. Open/close are row_number picks over the
    // (ts, event_id) total order — engines' arg_min/first() tie rules
    // differ, an explicit unique ordering does not. One window pass + one
    // aggregate, both clustered on the same keys (single shuffle).
    Op("ts_ohlc",
      (s, dir) => {
        view(s, dir, "events")
        s.sql(OhlcSql)
      },
      Some(OhlcSql)),

    // ORC sink/source round-trip (the columnar-format surface beyond
    // parquet): write the events aggregate to ORC, read it back, certify
    // content against the parquet-derived oracle. DuckDB can't read ORC, so
    // round-trip-then-summarize is the strongest cross-engine contract
    // available — same pattern as graph_export.
    Op("sink_orc",
      (s, dir) => {
        val agg = Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), num.dsum(col("value")).as("sum_value"))
        val out = Staging.fresh("sink-orc")
        agg.write.mode("overwrite").orc(out)
        s.read.orc(out).orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
        ${num.DSUM("value")} AS sum_value
        FROM events GROUP BY 1 ORDER BY 1"""))
  )

  /** win_funnel step bound: 7 days in epoch micros (see the op's scaladoc
    * for why 30 min is vacuous on this fixture's cadence). */
  private val FunnelStepMicros = 604800000000L

  /** ts_ohlc is engine-portable SQL — one string serves both sides. */
  private val OhlcSql = """
    WITH r AS (SELECT event_type, CAST(ts AS DATE) AS day, value,
      ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        ORDER BY ts, event_id) AS rn_a,
      ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT event_type, day,
      MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
      MAX(value) AS high, MIN(value) AS low,
      MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
      COUNT(*) AS n
    FROM r GROUP BY 1, 2 ORDER BY 1, 2"""
}
