package graft.ops

import graft.{Op, OpModule, Tables}
import graft.num._
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Custom typed aggregate (SURVEY.md §2.4 agg_custom_typed): exact integer
  * accumulation of quantities in cents. Integer buffers make the result
  * independent of partition/merge order — the property a distributed fold
  * must have to be oracle-able.
  */
case class QtyBuf(cnt: Long, sumCents: Long)
object QtyStatsAgg extends Aggregator[Double, QtyBuf, QtyBuf] {
  def zero: QtyBuf = QtyBuf(0L, 0L)
  def reduce(b: QtyBuf, q: Double): QtyBuf = QtyBuf(b.cnt + 1, b.sumCents + math.round(q * 100))
  def merge(a: QtyBuf, b: QtyBuf): QtyBuf = QtyBuf(a.cnt + b.cnt, a.sumCents + b.sumCents)
  def finish(r: QtyBuf): QtyBuf = r
  def bufferEncoder = Encoders.product[QtyBuf]
  def outputEncoder = Encoders.product[QtyBuf]
}

/** Hash aggregation (partial + final, map-side combine automatic), exact and
  * approximate distinct, rollup/cube/grouping-sets, per-group collections,
  * and the window-function surface (ranking, lag/lead, running and
  * range-framed aggregates).
  *
  * Scale notes: groupBy aggs shuffle once on the group key with map-side
  * partial aggregation; window functions shuffle once on the partition key.
  * All double sums go through the DECIMAL(38,10) exact-accumulation helper
  * (graft.num) so results are partition-order-independent — mandatory for
  * determinism on a 1000-executor cluster, not just for the oracle.
  */
object AggWindowOps extends OpModule {

  def ops: Seq[Op] = Seq(

    // TPC-H Q1-shaped pricing summary.
    Op("agg_group",
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${DSUM("l_quantity")} AS sum_qty,
        ${DSUM("l_extendedprice")} AS sum_base_price,
        ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${DSUM("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${DAVG("l_quantity")} AS avg_qty,
        ${DAVG("l_extendedprice")} AS avg_price,
        ${DAVG("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    Op("agg_distinct",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // HLL sketch VALUES differ across engines, so the hash-checked contract
    // is (group, exact, within-bound?): Spark computes both the sketch
    // estimate and the exact count and emits whether the relative error is
    // inside the documented rsd bound (default 0.05, checked at 3× for
    // slack — HLL's rsd is a standard deviation, not a hard cap); DuckDB
    // computes the exact count and asserts TRUE. A broken sketch (estimate
    // drifting from the bound) now fails the hash compare instead of
    // passing a rows-only check.
    Op("agg_approx_distinct",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("approx_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        TRUE AS approx_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Op("agg_rollup",
      (s, dir) => Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls"),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        COALESCE(l_linestatus, 'ALL') AS ls,
        ${DSUM("l_quantity")} AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    Op("agg_cube",
      (s, dir) => Tables(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("sum_price"), col("n"))
        .orderBy("st", "prio"),
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        COALESCE(o_orderpriority, 'ALL') AS prio,
        ${DSUM("o_totalprice")} AS sum_price, COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY st, prio""")),

    Op("agg_gsets",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders_gsets")
        // Spark-flavored exact sum (Spark's DECIMAL→DOUBLE cast is already
        // correctly rounded; no VARCHAR hop, which Spark SQL rejects anyway).
        s.sql("""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
          COALESCE(o_orderpriority, 'ALL') AS prio,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS sum_price,
          COUNT(*) AS n
          FROM orders_gsets
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY st, prio""")
      },
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        COALESCE(o_orderpriority, 'ALL') AS prio,
        ${DSUM("o_totalprice")} AS sum_price, COUNT(*) AS n
        FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY st, prio""")),

    // Deterministic per-group collection: sort inside the list, emit as a
    // string so the parquet/oracle comparison is representation-stable.
    Op("agg_collect",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(array_join(sort_array(collect_list(col("l_linenumber").cast("string"))), ",").as("line_nums"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
        string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY CAST(l_linenumber AS VARCHAR)) AS line_nums,
        COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    Op("agg_custom_typed",
      (s, dir) => {
        val qagg = udaf(QtyStatsAgg, Encoders.scalaDouble)
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(qagg(col("l_quantity")).as("st"))
          .select(col("l_returnflag"), col("st.cnt").as("cnt"),
            col("st.sumCents").as("sum_cents"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(l_quantity) AS cnt,
        CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Top-10 per return flag with rank/dense_rank — deliberately NOT a
    // window over the raw fact: `row_number() OVER (PARTITION BY
    // l_returnflag ...)` sorts the whole table inside 3 reducer partitions
    // (single-key skew no AQE rule can split — skew handling doesn't apply
    // to window sorts). Phase 1 is the bounded [[graft.functions.TopKRows]]
    // aggregate — map-side combined, each task reduces its slice to ≤10
    // tuples per flag, the shuffle carries ≤ 10·p·3 tuples. Phase 2
    // recomputes row_number/rank/dense_rank on the ≤30 survivors, which is
    // EXACT: every row preceding a global top-10 row in the total order
    // (price DESC, okey, lnum) is itself global top-10, so all
    // strictly-greater prices a rank would count survive phase 1. Plan
    // shape (no fact-table Window/Sort) pinned in PlanQualitySpec.
    Op("win_rank",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""WITH tk AS (SELECT l_returnflag,
              topk_rows(l_extendedprice, l_orderkey, l_linenumber, 10) AS top
            FROM lineitem GROUP BY l_returnflag),
          ex AS (SELECT l_returnflag, pos, r FROM tk
            LATERAL VIEW posexplode(top) t AS pos, r)
          SELECT l_returnflag, r.key1 AS l_orderkey, r.key2 AS l_linenumber,
            r.ord AS l_extendedprice, pos + 1 AS rn,
            RANK() OVER (PARTITION BY l_returnflag ORDER BY r.ord DESC) AS rnk,
            DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY r.ord DESC) AS drnk
          FROM ex ORDER BY l_returnflag, rn""")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn, rnk, drnk
        FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,
          RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC) AS rnk,
          DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC) AS drnk
          FROM lineitem) t
        WHERE rn <= 10 ORDER BY l_returnflag, rn""")),

    Op("win_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables(s, dir, "orders")
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("first_price", first(col("o_totalprice")).over(w))
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "prev_price", "next_price", "first_price")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        LEAD(o_totalprice, 1) OVER w AS next_price,
        FIRST_VALUE(o_totalprice) OVER w AS first_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    Op("win_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "orders")
          .withColumn("running_spend",
            sum(col("o_totalprice").cast("decimal(38,10)")).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey, o_orderdate,
        ${DSUM_OVER("o_totalprice", """OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")} AS running_spend
        FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // 7-day (current + 6 preceding days) moving spend per customer;
    // range frame over event time expressed in epoch seconds.
    Op("win_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
          .rangeBetween(-6L * 86400L, 0L)
        Tables(s, dir, "orders")
          .withColumn("moving_spend",
            sum(col("o_totalprice").cast("decimal(38,10)")).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "moving_spend")
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey, o_orderdate,
        ${DSUM_OVER("o_totalprice", """OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 518400 SECOND PRECEDING AND CURRENT ROW)""")} AS moving_spend
        FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // Navigation window functions over full frames: each customer's first /
    // latest / second order value. The window ORDER BY includes the unique
    // o_orderkey tiebreaker so every navigation target is deterministic.
    Op("win_first_last",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "orders")
          .withColumn("first_spend", first(col("o_totalprice")).over(w))
          .withColumn("last_spend", last(col("o_totalprice")).over(w))
          .withColumn("second_order", nth_value(col("o_orderkey"), 2).over(w))
          .select("o_custkey", "o_orderkey", "first_spend", "last_spend",
            "second_order")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        FIRST_VALUE(o_totalprice) OVER w AS first_spend,
        LAST_VALUE(o_totalprice) OVER w AS last_spend,
        NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")),

    // Equi-width histogram via width_bucket — the one-pass binning every
    // profiling pipeline runs. DuckDB has no width_bucket, so the oracle
    // spells out the identical arithmetic: bucket width (hi-lo)/n =
    // 600000/24 = 25000.0 is exact in binary, making the division + floor
    // bit-identical across engines.
    Op("agg_histogram",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0),
          lit(24L)).as("bucket"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("bucket_total"))
        .orderBy("bucket"),
      Some(s"""SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
          WHEN o_totalprice >= 600000.0 THEN 25
          ELSE FLOOR((o_totalprice - 0.0) / 25000.0) + 1 END AS BIGINT) AS bucket,
        COUNT(*) AS n, ${DSUM("o_totalprice")} AS bucket_total
        FROM orders GROUP BY 1 ORDER BY 1"""))
  )
}
