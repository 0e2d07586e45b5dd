package graft.ops

import graft.{Op, OpModule, Tables, num}
import org.apache.spark.sql.functions._

/** OLAP statistics operators: exact percentiles, numerically-exact
  * distributed moments (covariance / correlation via decimal sums — the
  * one-pass formula is order-independent, unlike streaming covar updates),
  * and pivot tables. */
object StatsOps extends OpModule {

  def ops: Seq[Op] = Seq(

    // Exact continuous-interpolation percentiles per group. Both engines use
    // the (n-1)p index + linear interpolation definition; interpolation is
    // two IEEE ops on exact inputs.
    Op("agg_percentile",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.75)").as("p75"),
          expr("min(l_extendedprice)").as("pmin"),
          expr("max(l_extendedprice)").as("pmax"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.25) AS p25,
        quantile_cont(l_extendedprice, 0.5) AS p50,
        quantile_cont(l_extendedprice, 0.75) AS p75,
        MIN(l_extendedprice) AS pmin, MAX(l_extendedprice) AS pmax
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // Approximate quantile with a HARD correctness contract (same pattern
    // as agg_approx_distinct): approx_percentile at accuracy 100 guarantees
    // rank error ≤ 1/100, so the returned element must lie between the
    // exact 0.45 and 0.55 quantiles (4.5× margin). A drifting sketch fails
    // the hash compare; the oracle computes the exact bounds implicitly by
    // asserting TRUE.
    Op("agg_approx_quantile",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("approx_percentile(o_totalprice, 0.5, 100)").as("approx"),
          expr("percentile(o_totalprice, 0.45)").as("lo"),
          expr("percentile(o_totalprice, 0.55)").as("hi"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("n"),
          (col("approx") >= col("lo") && col("approx") <= col("hi")).as("approx_ok"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(*) AS n, TRUE AS approx_ok
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // Exact covariance/correlation: decimal-exact Σx, Σy, Σxy, Σx², Σy²,
    // then the closed-form moments in a FIXED double-op order — identical in
    // both engines, independent of partitioning (a streaming covar would
    // not be). cov = (Σxy − ΣxΣy/n)/n; corr = cov/(σx·σy).
    Op("agg_stats_exact",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(s"""
          WITH m AS (SELECT l_returnflag,
            COUNT(*) AS n,
            CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
            CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
            CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS syy
            FROM lineitem GROUP BY l_returnflag)
          SELECT l_returnflag, n,
            (sxy - sx * sy / n) / n AS cov_pop,
            ((sxy - sx * sy / n) / n)
              / (sqrt((sxx - sx * sx / n) / n) * sqrt((syy - sy * sy / n) / n)) AS corr
          FROM m ORDER BY l_returnflag""")
      },
      Some(s"""
        WITH m AS (SELECT l_returnflag,
          COUNT(*) AS n,
          ${num.DSUM("l_quantity")} AS sx,
          ${num.DSUM("l_extendedprice")} AS sy,
          ${num.DSUM("l_quantity * l_extendedprice")} AS sxy,
          ${num.DSUM("l_quantity * l_quantity")} AS sxx,
          ${num.DSUM("l_extendedprice * l_extendedprice")} AS syy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          (sxy - sx * sy / n) / n AS cov_pop,
          ((sxy - sx * sy / n) / n)
            / (sqrt((sxx - sx * sx / n) / n) * sqrt((syy - sy * sy / n) / n)) AS corr
        FROM m ORDER BY l_returnflag""")),

    // Distribution window functions: rank ratios are exact rationals
    // ((rank-1)/(n-1), rank/n) — IEEE division of integers, identical in
    // both engines.
    Op("win_distribution",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderkey, o_custkey,
          PERCENT_RANK() OVER w AS pr,
          CUME_DIST() OVER w AS cd,
          NTILE(4) OVER w AS quartile
          FROM orders
          WINDOW w AS (PARTITION BY o_orderstatus
            ORDER BY o_totalprice, o_orderkey)
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_custkey,
        PERCENT_RANK() OVER w AS pr,
        CUME_DIST() OVER w AS cd,
        NTILE(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
          ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderkey""")),

    // Pivot: order counts + exact price sums per priority, statuses as
    // columns. Spark's relational pivot ≡ conditional aggregation.
    Op("agg_pivot",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), num.dsum(col("o_totalprice")).as("total"))
        .na.fill(0L, Seq("F_n", "O_n", "P_n"))
        .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F_n,
        ${num.DSUM("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F_total,
        COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O_n,
        ${num.DSUM("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O_total,
        COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P_n,
        ${num.DSUM("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P_total
        FROM orders GROUP BY 1 ORDER BY 1"""))
  )
}
