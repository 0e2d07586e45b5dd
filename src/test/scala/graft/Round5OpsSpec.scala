package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-5 additions (cross-engine value
  * equality is the Verify/DuckDB gate's job; these assert the properties
  * the values must satisfy). */
class Round5OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("unpivot_melt: 3 metrics per flag, values match the wide aggregate") {
    val m = SparkEntry.queries("unpivot_melt")(spark, sf)
    val perFlag = m.groupBy("l_returnflag").agg(count(lit(1)).as("k"))
    assert(perFlag.filter(col("k") =!= 3).count() == 0)
    val qtyA = m.filter(col("l_returnflag") === "A" && col("metric") === "qty")
      .head.getDouble(2)
    val direct = Tables(spark, sf, "lineitem").filter(col("l_returnflag") === "A")
      .agg(num.dsum(col("l_quantity"))).head.getDouble(0)
    assert(qtyA == direct)
  }

  test("agg_mode picks the max-count status (ties to larger value)") {
    val m = SparkEntry.queries("agg_mode")(spark, sf).collect()
    val counts = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority", "o_orderstatus").count().collect()
      .groupBy(_.getString(0))
    m.foreach { r =>
      val best = counts(r.getString(0))
        .map(c => (c.getLong(2), c.getString(1))).max // (n, status) lexicographic
      assert((r.getLong(2), r.getString(1)) == best)
    }
  }

  test("agg_bool counts are consistent with direct predicates") {
    val b = SparkEntry.queries("agg_bool")(spark, sf).collect()
    b.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4)) // n_over50 <= n
      val mn = Tables(spark, sf, "events")
        .filter(col("event_type") === r.getString(0))
        .agg(min("value")).head.getDouble(0)
      assert(r.getBoolean(1) == (mn > 0))
    }
  }

  test("win_ratio: shares of each status group sum to 1") {
    val shares = SparkEntry.queries("win_ratio")(spark, sf)
      .groupBy("o_orderstatus").agg(sum("share").as("s")).collect()
    shares.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("profile_columns: one row per column, extrema ordered, nulls zero") {
    val p = SparkEntry.queries("profile_columns")(spark, sf).collect()
    assert(p.map(_.getString(0)).toSet ==
      Set("o_custkey", "o_totalprice", "o_orderstatus"))
    p.foreach { r =>
      assert(r.getLong(2) == 0) // fixture has no nulls in these columns
      assert(r.getLong(3) > 0 && r.getLong(3) <= r.getLong(1))
      if (!r.isNullAt(4)) assert(r.getDouble(4) <= r.getDouble(5))
      if (!r.isNullAt(6)) assert(r.getString(6) <= r.getString(7))
    }
  }

  test("ts_ohlc: low <= open/close <= high, counts conserve events") {
    val o = SparkEntry.queries("ts_ohlc")(spark, sf)
    assert(o.filter(col("open") > col("high") || col("close") > col("high") ||
      col("open") < col("low") || col("close") < col("low")).count() == 0)
    assert(o.agg(sum("n")).head.getLong(0) ==
      Tables(spark, sf, "events").count())
  }

  test("sink_orc round-trip equals the direct aggregate") {
    val rt = SparkEntry.queries("sink_orc")(spark, sf)
    val direct = Tables(spark, sf, "events").groupBy("event_type")
      .agg(count(lit(1)).as("n"), num.dsum(col("value")).as("sum_value"))
    assert(rt.except(direct).count() == 0 && direct.except(rt).count() == 0)
  }

  test("fn_regex: global replace leaves no vowels, brand pattern total") {
    val r = SparkEntry.queries("fn_regex")(spark, sf)
    assert(r.filter(col("consonants").rlike("[AEIOU]")).count() == 0)
    assert(r.filter(!col("brand_ok")).count() == 0)
  }

  test("graph_jaccard: canonical pairs, score in (0,1], overlap bounded") {
    val j = SparkEntry.queries("graph_jaccard")(spark, sf)
    assert(j.filter(col("s1") >= col("s2")).count() == 0)
    assert(j.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    val deg = graph.GraphFixture(spark, sf).edges
      .filter(col("label") === "supplied_by")
      .groupBy(col("dst").as("s1")).agg(count(lit(1)).as("d1"))
    assert(j.join(deg, "s1").filter(col("common") > col("d1")).count() == 0)
  }

  test("fn_url parses host/path/query back out of the synthesized URL") {
    val u = SparkEntry.queries("fn_url")(spark, sf)
    assert(u.filter(!col("host").endsWith(".example.com") ||
      !col("path").startsWith("/doc/") ||
      !col("query").startsWith("lang=")).count() == 0)
    assert(u.count() == Tables(spark, sf, "documents").count())
  }

  test("win_moving_avg stays within the frame's min/max envelope") {
    val m = SparkEntry.queries("win_moving_avg")(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus").orderBy("o_orderkey").rowsBetween(-6, 0)
    val env = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), min("o_totalprice").over(w).as("lo"),
        max("o_totalprice").over(w).as("hi"))
    assert(m.join(env, "o_orderkey")
      .filter(col("mavg") < col("lo") || col("mavg") > col("hi"))
      .count() == 0)
  }

  test("agg_skew matches Spark's built-in skewness to float tolerance") {
    val s1 = SparkEntry.queries("agg_skew")(spark, sf)
      .select("o_orderstatus", "skew")
    val ref = Tables(spark, sf, "orders").groupBy("o_orderstatus")
      .agg(skewness("o_totalprice").as("ref"))
    val bad = s1.join(ref, "o_orderstatus")
      .filter(abs(col("skew") - col("ref")) > 1e-6)
    assert(bad.count() == 0)
  }

  test("agg_corr matches Spark's built-in corr to float tolerance") {
    val got = SparkEntry.queries("agg_corr")(spark, sf)
      .select("corr_items_qty").head.getDouble(0)
    val ref = Tables(spark, sf, "lineitem").groupBy("l_orderkey")
      .agg(count(lit(1)).cast("double").as("x"),
        sum(col("l_quantity").cast("decimal(38,10)")).cast("double").as("y"))
      .agg(corr("x", "y")).head.getDouble(0)
    assert(math.abs(got - ref) < 1e-9, s"got $got ref $ref")
    // non-degenerate: item count and total quantity genuinely correlate
    assert(got > 0.5)
  }

  test("agg_kurtosis matches Spark's built-in kurtosis to float tolerance") {
    val k = SparkEntry.queries("agg_kurtosis")(spark, sf)
      .select("o_orderstatus", "kurt")
    val ref = Tables(spark, sf, "orders").groupBy("o_orderstatus")
      .agg(kurtosis("o_totalprice").as("ref"))
    assert(k.join(ref, "o_orderstatus")
      .filter(abs(col("kurt") - col("ref")) > 1e-6).count() == 0)
  }

  test("agg_grouping_id: grand total flagged (1,1) and equals row count") {
    val g = SparkEntry.queries("agg_grouping_id")(spark, sf)
    val total = g.filter(col("g_st") === 1 && col("g_pr") === 1)
    assert(total.count() == 1)
    assert(total.head.getLong(4) == Tables(spark, sf, "orders").count())
    // detail rows sum to each subtotal level
    val detail = g.filter(col("g_st") === 0 && col("g_pr") === 0)
      .agg(sum("n")).head.getLong(0)
    assert(detail == Tables(spark, sf, "orders").count())
  }

  test("win_islands: island lengths conserve events, streak <= events") {
    val w = SparkEntry.queries("win_islands")(spark, sf)
    val perUser = Tables(spark, sf, "events").groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"))
    val j = w.join(perUser, "user_id")
    assert(j.filter(col("max_streak") > col("n_ev") ||
      col("n_islands") > col("n_ev") || col("max_streak") < 1).count() == 0)
    assert(w.count() == perUser.count())
  }

  test("text_ngram_top: exactly <=3 rows per lang, counts descending") {
    val t = SparkEntry.queries("text_ngram_top")(spark, sf).collect()
    t.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val ns = rows.map(_.getLong(2)).toSeq
      assert(ns == ns.sorted.reverse)
    }
  }

  test("agg_gini: impurity in [0, 1), one row per active user") {
    val g = SparkEntry.queries("agg_gini")(spark, sf)
    assert(g.filter(col("gini") < 0 || col("gini") >= 1).count() == 0)
    assert(g.count() ==
      Tables(spark, sf, "events").select("user_id").distinct().count())
    // single-type users (if any) must score exactly 0; multi-type > 0
    val types = Tables(spark, sf, "events").groupBy("user_id")
      .agg(countDistinct("event_type").as("k"))
    val j = g.join(types, "user_id")
    assert(j.filter(col("k") === 1 && col("gini") =!= 0.0).count() == 0)
    assert(j.filter(col("k") > 1 && col("gini") === 0.0).count() == 0)
  }

  test("graph_ego: induced edges only touch the 2-hop neighborhood") {
    val g = graph.GraphFixture(spark, sf)
    val ego = SparkEntry.queries("graph_ego")(spark, sf)
    assert(ego.count() > 0)
    // every returned edge endpoint reaches customer #1 within 2 und hops
    val l0 = Seq(3000000000001L)
    val e2 = g.edges.select(col("src"), col("dst"))
    val nbrs1 = e2.filter(col("src").isin(l0: _*)).select(col("dst").as("id"))
      .unionAll(e2.filter(col("dst").isin(l0: _*)).select(col("src").as("id")))
    val set1 = nbrs1.distinct().collect().map(_.getLong(0)).toSet + l0.head
    val nbrs2 = e2.filter(col("src").isin(set1.toSeq: _*)).select(col("dst").as("id"))
      .unionAll(e2.filter(col("dst").isin(set1.toSeq: _*)).select(col("src").as("id")))
    val set2 = set1 ++ nbrs2.distinct().collect().map(_.getLong(0))
    val bad = ego.collect().exists(r =>
      !set2.contains(r.getLong(0)) || !set2.contains(r.getLong(1)))
    assert(!bad)
  }

  test("graph_pregel (max-flood via stored CC): component-constant, >= own val") {
    val g = graph.GraphFixture(spark, sf)
    val mf = SparkEntry.queries("graph_pregel")(spark, sf)
    // same component => same maxval, and maxval >= each member's val
    val joined = mf.join(g.connectedComponents, "id")
      .join(g.vertices.select(col("id"),
        coalesce(col("val"), lit(0.0)).as("v")), "id")
    assert(joined.filter(col("v") > col("maxval")).count() == 0)
    val perComp = joined.groupBy("component")
      .agg(countDistinct("maxval").as("k"))
    assert(perComp.filter(col("k") =!= 1).count() == 0)
  }
}
