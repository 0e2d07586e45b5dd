package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ExtraOps additions (cross-engine value
  * equality is the Verify/DuckDB gate's job; these assert the properties
  * the values must satisfy). */
class ExtraOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("agg_bitwise: AND ≤ XOR-range ≤ OR bounds and per-group identities") {
    val rows = SparkEntry.queries("agg_bitwise")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (band, bor) = (r.getLong(1), r.getLong(2))
      assert((band & bor) == band) // AND's bits are a subset of OR's
      assert((r.getLong(3) & ~bor) == 0) // XOR can't set bits OR doesn't have
    }
  }

  test("win_ntile: 10 deciles per status, sizes differ by at most 1, sum to n") {
    val d = SparkEntry.queries("win_ntile")(spark, sf).collect()
      .groupBy(_.getString(0))
    val statusN = Tables(spark, sf, "orders")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    d.foreach { case (st, buckets) =>
      assert(buckets.map(_.getInt(1)).sorted.toSeq == (1 to 10))
      val sizes = buckets.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.sum == statusN(st))
    }
  }

  test("agg_mad is at most the half-range and positive on this data") {
    SparkEntry.queries("agg_mad")(spark, sf).collect().foreach { r =>
      assert(r.getDouble(1) > 0)
    }
  }

  test("fn_printf renders zero-padded decimal and hex consistently") {
    val r = SparkEntry.queries("fn_printf")(spark, sf).limit(100).collect()
    r.foreach { row =>
      val key = row.getLong(0)
      assert(row.getString(2) == java.lang.Long.toHexString(key))
      assert(row.getString(1).matches("[A-Z]-\\d{7,}"))
    }
  }

  test("sample_stratified: every stratum sampled at exactly ceil(10%)") {
    val sampled = SparkEntry.queries("sample_stratified")(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables(spark, sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet == full.keySet)
    full.foreach { case (k, n) =>
      assert(sampled(k) == math.ceil(n * 0.1).toLong)
    }
  }

  test("join_salted equals the plain unsalted join") {
    val salted = SparkEntry.queries("join_salted")(spark, sf)
    val li = Tables(spark, sf, "lineitem")
    val o = Tables(spark, sf, "orders")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), num.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderstatus")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("sink_compact round-trips every row into exactly 4 files") {
    val r = SparkEntry.queries("sink_compact")(spark, sf).head
    val n = Tables(spark, sf, "events").count()
    assert(r.getLong(0) == n)
    assert(r.getLong(2) == 64 && r.getLong(3) == 4)
  }

  test("sort_zorder: morton code de-interleaves back to its inputs") {
    val rows = SparkEntry.queries("sort_zorder")(spark, sf).collect()
    assert(rows.length == 1000)
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).sorted.toSeq)
    rows.foreach { r =>
      val z = r.getLong(2)
      var (x, y, i) = (0L, 0L, 0)
      while (i < 16) {
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
        i += 1
      }
      assert(x == r.getLong(1) % 65536 && y == r.getLong(0) % 65536)
    }
  }

  test("fn_levenshtein: zero iff equal, bounded by operand length") {
    val rows = SparkEntry.queries("fn_levenshtein")(spark, sf).limit(500).collect()
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 10)
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 12)
    }
    assert(rows.exists(_.getInt(1) == 0)) // BUILDING segment exists
  }

  test("graph_assortativity: r is a correlation, in [-1, 1]") {
    val r = SparkEntry.queries("graph_assortativity")(spark, sf).head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0)
  }

  test("win_nth: third_seen is NULL for first two rows then constant per group") {
    val rows = SparkEntry.queries("win_nth")(spark, sf).collect()
      .groupBy(_.getString(1))
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0))
      assert(sorted.take(2).forall(_.isNullAt(2)))
      val third = sorted(2).getLong(0)
      assert(sorted.drop(2).forall(_.getLong(2) == third))
    }
  }

  test("join_correlated decorrelates to hash joins (no nested-loop probe)") {
    val df = SparkEntry.queries("join_correlated")(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    // EXISTS → semi join; result rows are a subset of orders with ≥1 item
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) >= 1))
    val direct = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") > 45).select("l_orderkey").distinct().count()
    assert(rows.length == direct.toInt)
  }

  test("agg_weighted_avg lies between group min and max price") {
    val li = Tables(spark, sf, "lineitem")
    val bounds = li.groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    SparkEntry.queries("agg_weighted_avg")(spark, sf).collect().foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getDouble(1) >= lo && r.getDouble(1) <= hi)
    }
  }

  test("fn_posexplode: tokens rebuild p_name in position order") {
    val toks = SparkEntry.queries("fn_posexplode")(spark, sf).collect()
      .groupBy(_.getLong(0))
    val names = Tables(spark, sf, "part").select("p_partkey", "p_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    names.foreach { case (k, name) =>
      val rebuilt = toks(k).sortBy(_.getInt(2)).map(_.getString(1)).mkString(" ")
      assert(rebuilt == name)
    }
  }

  test("agg_checksum is stable across partitionings") {
    val a = SparkEntry.queries("agg_checksum")(spark, sf).head
    // recompute over a reshuffled copy: addition commutes, so the fold
    // must not depend on row order or partition count
    Tables(spark, sf, "orders").repartition(7).createOrReplaceTempView("orders")
    val b = spark.sql(
      """SELECT COUNT(*) AS n,
        CAST(SUM(CAST(CAST(conv(substring(md5(
          CAST(o_orderkey AS STRING) || '|' || CAST(o_custkey AS STRING)
            || '|' || o_orderstatus), 1, 15), 16, 10) AS BIGINT)
          AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) AS checksum
      FROM orders""").head
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
  }

  test("scan_merge_schema: old files yield NULL for the evolved column") {
    val r = SparkEntry.queries("scan_merge_schema")(spark, sf).head
    val n = Tables(spark, sf, "events").count()
    assert(r.getLong(0) == 2 * n)  // both file generations read
    assert(r.getLong(1) == n)      // evolved column non-null only in v2
    assert(math.abs(r.getDouble(3) - 2 * r.getDouble(2) / 2) < 1e-6)
  }

  test("graph_degree_dist: histogram masses sum to the vertex count") {
    val d = SparkEntry.queries("graph_degree_dist")(spark, sf).collect()
    val nv = graph.GraphFixture(spark, sf).vertices.count()
    assert(d.map(_.getLong(1)).sum == nv)
    assert(d.map(_.getLong(0)).distinct.length == d.length)
  }

  test("text_normalize: hash invariant under extra whitespace and case") {
    import spark.implicits._
    val probe = Seq((1L, "Hello  World "), (2L, "hello world"))
      .toDF("doc_id", "text")
    probe.createOrReplaceTempView("documents")
    val h = spark.sql(
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '  +', ' ')))) AS norm_hash
        FROM documents""").collect().map(_.getString(1))
    assert(h(0) == h(1))
  }

  test("fn_base64 round-trip reproduces the name") {
    SparkEntry.queries("fn_base64")(spark, sf).limit(200).collect().foreach { r =>
      assert(r.getString(2).startsWith("Customer#"))
      assert(java.util.Base64.getDecoder.decode(r.getString(1)).length > 0)
    }
  }

  test("ts_zscore returns only |z| > 2 and flags a minority of events") {
    val z = SparkEntry.queries("ts_zscore")(spark, sf).collect()
    assert(z.forall(r => math.abs(r.getDouble(2)) > 2))
    val n = Tables(spark, sf, "events").count()
    assert(z.length < n / 4)
  }

  test("join_interval_banded: week masses cover every interval-week overlap") {
    val r = SparkEntry.queries("join_interval_banded")(spark, sf).collect()
    // every lineitem contributes once per covered week: total mass ≥ rows
    val n = Tables(spark, sf, "lineitem").count()
    assert(r.map(_.getLong(1)).sum >= n)
    // 0-day spans contribute exactly 1 week; 6-day spans at most 2
    assert(r.map(_.getLong(1)).sum <= 2 * n)
  }

  test("ts_topk_window picks the true top-2 counts per window") {
    val picked = SparkEntry.queries("ts_topk_window")(spark, sf).collect()
      .groupBy(_.getTimestamp(0))
    val full = Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "15 minutes")("start").as("w"), col("event_type"))
      .count().collect().groupBy(_.getTimestamp(0))
    picked.foreach { case (w, rs) =>
      assert(rs.length <= 2)
      val all = full(w).map(_.getLong(2)).sorted.reverse
      val want = all.take(rs.length)
      assert(rs.map(_.getLong(2)).sorted.reverse.toSeq == want.toSeq)
    }
  }

  test("graph_ppr: seeds keep teleport base and mass actually propagates") {
    val pr = SparkEntry.queries("graph_ppr")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val seedIds = pr.keys.filter(id => id >= 3000000000000L && id < 4000000000000L)
    assert(seedIds.nonEmpty)
    // every customer seed keeps at least its teleport base
    seedIds.foreach(id => assert(pr(id) >= 0.15 / seedIds.size - 1e-12))
    // propagation is EXERCISED, not just the teleport base: customers have
    // out-edges (in_nation, colocated), so nations (hop 1), suppliers
    // (hop 1) and regions (hop 2) must all hold strictly positive mass.
    def massIn(tag: Long) =
      pr.collect { case (id, p) if id >= tag * 1000000000000L &&
        id < (tag + 1) * 1000000000000L => p }.sum
    assert(massIn(2) > 0.0, "nations unreached — propagation not exercised")
    assert(massIn(4) > 0.0, "suppliers unreached — propagation not exercised")
    assert(massIn(1) > 0.0, "regions unreached — 2-hop propagation not exercised")
    assert(pr.values.forall(_ >= 0.0))
    val total = pr.values.sum
    assert(total <= 1.0 + 1e-9)
  }

  test("sink_upsert: snapshot-then-merge equals direct latest-per-key") {
    val merged = SparkEntry.queries("sink_upsert")(spark, sf).collect()
    val direct = {
      Tables(spark, sf, "events").createOrReplaceTempView("events")
      spark.sql("""WITH r AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        SELECT event_type, COUNT(*) AS n_keys,
          CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sum_latest
        FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1""").collect()
    }
    assert(merged.toSeq == direct.toSeq)
  }

  test("agg_benford: digits 1-9 only, masses sum to the row count") {
    val d = SparkEntry.queries("agg_benford")(spark, sf).collect()
    assert(d.map(_.getInt(0)).forall(x => x >= 1 && x <= 9))
    assert(d.map(_.getLong(1)).sum ==
      Tables(spark, sf, "orders").filter(col("o_totalprice") > 0).count())
  }

  test("win_compress_runs keeps at least one event per active user") {
    val kept = SparkEntry.queries("win_compress_runs")(spark, sf).collect()
    val users = Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(kept.length == users.toInt)
    kept.foreach(r => assert(r.getLong(1) >= 1))
  }

  test("agg_cohort_retention: active never exceeds cohort week-1 size") {
    val m = SparkEntry.queries("agg_cohort_retention")(spark, sf).collect()
      .groupBy(_.getTimestamp(0))
    m.foreach { case (cohort, rows) =>
      // the cohort's first week contains every cohort member by definition
      val first = rows.minBy(_.getTimestamp(1).getTime)
      assert(first.getTimestamp(1) == cohort)
      rows.foreach(r => assert(r.getLong(2) <= first.getLong(2)))
    }
  }

  test("ts_seasonality covers only dow 0-6 and hr 0-23") {
    val rows = SparkEntry.queries("ts_seasonality")(spark, sf).collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 6))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 23))
    assert(rows.map(_.getLong(2)).sum == Tables(spark, sf, "events").count())
  }

  test("agg_vector_centroid: 64 dims per label, centroids within [-1,1]") {
    val c = SparkEntry.queries("agg_vector_centroid")(spark, sf).collect()
      .groupBy(_.getInt(0))
    c.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 64))
      rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    }
  }

  test("graph_cc_sizes: total mass equals the vertex count") {
    val h = SparkEntry.queries("graph_cc_sizes")(spark, sf).collect()
    val nv = graph.GraphFixture(spark, sf).vertices.count()
    assert(h.map(r => r.getLong(0) * r.getLong(1)).sum == nv)
  }

  test("graph_clustering: coeff in [0,1] and zero iff no triangles") {
    val rows = SparkEntry.queries("graph_clustering")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, tri, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d >= 2)
      assert(c >= 0.0 && c <= 1.0 + 1e-12)
      assert((c == 0.0) == (tri == 0L))
      assert(tri <= d * (d - 1) / 2)
    }
  }
}
