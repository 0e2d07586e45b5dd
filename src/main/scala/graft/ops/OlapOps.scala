package graft.ops

import graft.{Op, OpModule, Tables}

/** Round-14c OLAP batch — the remaining TPC-H query shapes the fixture
  * schema can express (no partsupp table is generated, so Q2/Q9/Q11/Q16's
  * supplycost sides are adapted or skipped; see each op's note). Every key
  * is ONE SQL text shared by Spark and the DuckDB oracle, with the two
  * house dialect seams: `d` renders the engine's correctly-rounded
  * DECIMAL→DOUBLE cast (VARCHAR hop on DuckDB — graft.num DSUM scaladoc)
  * (graded dates ship as DATE casts — both engines
  * stringify DATE identically, the fn_date precedent).
  *
  * House determinism rules (graft.num): money sums are per-row IEEE
  * expressions in fixed parse order, cast to DECIMAL(38,10) BEFORE the
  * commutative SUM; every output carries a total ORDER BY.
  */
object OlapOps extends OpModule {

  private def view(s: org.apache.spark.sql.SparkSession, dir: String, n: String): Unit =
    Tables(s, dir, n).createOrReplaceTempView(n)

  private val sparkD: String => String = e => s"CAST($e AS DOUBLE)"
  private val duckD: String => String = e => s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"

  /** TPC-H Q3 shape — shipping priority: the 10 highest-value orders in a
    * market segment taken by the cutoff but not yet fully shipped.
    * Plan shape: the segment predicate prunes customer (302 of 1500 rows →
    * broadcast), the date predicates push to BOTH fact scans (o_orderdate
    * to orders, l_shipdate to lineitem) — at 100 TB those two pushed ranges
    * are the difference between scanning a week and scanning seven years.
    * One fact-fact shuffle (lineitem⋈orders on orderkey), the GROUP BY
    * reuses that partitioning (orderkey is a prefix of the grouping key),
    * and the top-10 is TakeOrderedAndProject — never a global sort. */
  private def shipPrioritySql(d: String => String): String = s"""
    WITH rev AS (
      SELECT l_orderkey,
        SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS r,
        CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority)
    SELECT l_orderkey, ${d("r")} AS revenue, o_date, o_orderpriority
    FROM rev
    ORDER BY r DESC, l_orderkey
    LIMIT 10"""

  /** TPC-H Q9 shape — product-type profit by supplier nation × order year.
    * The fixture has no partsupp, so supply cost is a retail-margin proxy
    * (60% of p_retailprice per unit) — the JOIN SHAPE is the point: part
    * filters first (LIKE on p_name, 257 of 2000 rows) and that pruning
    * reaches the fact stream through a broadcast, supplier→nation attaches
    * by broadcast, and only lineitem⋈orders genuinely shuffles. The profit
    * expression is per-row IEEE in fixed parse order, decimal-cast before
    * the sum — bit-reproducible cross-engine. */
  private def productProfitSql(d: String => String): String = s"""
    WITH profit AS (
      SELECT n_name AS nation,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        SUM(CAST(l_extendedprice * (1 - l_discount)
                 - l_quantity * p_retailprice * 0.6 AS DECIMAL(38,10))) AS amount
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%red%'
      GROUP BY 1, 2)
    SELECT nation, o_year, ${d("amount")} AS sum_profit
    FROM profit ORDER BY nation, o_year DESC"""

  /** TPC-H Q13 shape — customer order-count distribution: how many
    * customers placed k qualifying orders, for every k (the engagement
    * histogram; the LEFT join keeps the zero-order bucket honest). Orders
    * filtered in the JOIN CONDITION, not a WHERE — a WHERE would turn the
    * left join inner and silently drop the zero bucket. Two aggregates:
    * the first shuffles on custkey (fact-sized), the second is k-bounded
    * (≤ max orders per customer) — map-side combine collapses it. All
    * integer counts — exact by construction. */
  private val customerDistSql: String = """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q18 shape — large-volume orders: orders whose total quantity
    * exceeds the threshold (320 ≈ the fixture's 99.9th percentile — 26
    * orders at sf0.01), with customer and order detail. The HAVING
    * aggregate runs FIRST on lineitem alone (one fact-sized shuffle on
    * orderkey, map-side combine) and everything downstream joins against
    * its tiny survivor set — order of operations is the whole plan: joining
    * first would carry customer columns through the fact shuffle. Quantity
    * sums decimal-cast per row before SUM; the threshold compares exactly
    * against the decimal. */
  private def largeOrdersSql(d: String => String): String = s"""
    WITH big AS (
      SELECT l_orderkey AS okey,
        SUM(CAST(l_quantity AS DECIMAL(38,10))) AS sq
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,10))) > 320)
    SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      o_totalprice, ${d("sq")} AS sum_qty
    FROM big
    JOIN orders ON o_orderkey = okey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey"""

  /** TPC-H Q21 shape — suppliers who kept orders waiting: per supplier,
    * the count of multi-supplier orders where THIS supplier shipped late
    * (> 180 days after the order date) and no other supplier on the order
    * did. The classic formulation is EXISTS + NOT EXISTS with two
    * correlated self-joins of the fact table; the grouped form here
    * computes per-(order, supplier) lateness ONCE and derives both
    * quantifiers from one per-order aggregate (nsupp, nlate) — the same
    * answer with ONE fact shuffle instead of three correlated probes,
    * which is the rewrite a 100 TB plan needs anyway. */
  private val lateSuppliersSql: String = """
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
        MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY
                 THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    od AS (
      SELECT l_orderkey, COUNT(*) AS nsupp, SUM(late) AS nlate
      FROM lo GROUP BY 1)
    SELECT s_name, COUNT(*) AS numwait
    FROM lo
    JOIN od USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE lo.late = 1 AND od.nlate = 1 AND od.nsupp >= 2
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25"""

  /** TPC-H Q22 shape — idle high-value customers: customers whose balance
    * beats the positive-balance average but who placed no RECENT order
    * (the fixture generator gives every customer at least one order ever,
    * so "recent" replaces Q22's "no orders at all" — same anti-join
    * shape), rolled up per nation. The scalar average is ONE broadcast
    * (never a per-row subquery), the NOT EXISTS compiles to a LEFT ANTI
    * join against the date-pruned orders scan, and the rollup is
    * nation-bounded. Balance sums decimal-exact; the single average
    * division is one fixed-order IEEE op both engines share. */
  private def idleValueCustomersSql(d: String => String): String = s"""
    WITH avg_bal AS (
      SELECT ${d("SUM(CAST(c_acctbal AS DECIMAL(38,10)))")} / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0),
    idle AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT ab FROM avg_bal)
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-07-01'))
    SELECT n_name, COUNT(*) AS numcust,
      ${d("SUM(CAST(c_acctbal AS DECIMAL(38,10)))")} AS totacctbal
    FROM idle JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    ORDER BY n_name"""

  /** TPC-H Q4 shape — order-priority checking: orders taken in one quarter
    * with at least ONE late line item, counted per priority. The EXISTS
    * compiles to a LEFT SEMI join (each order counted once however many
    * lines are late); the quarter predicate prunes the orders scan FIRST,
    * so the semi-join probes a quarter-sized build side. All-integer. */
  private val orderPrioritySql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate < TIMESTAMP '1999-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** TPC-H Q6 shape — forecasting revenue change: the discount-band scalar.
    * One scan, every predicate pushed (ship-date range, discount band,
    * quantity cap), one map-side-combined decimal sum — the cheapest query
    * in the book and the purest pushdown test. */
  private def forecastRevenueSql(d: String => String): String = s"""
    SELECT ${d("SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,10)))")}
        AS revenue_delta,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      AND l_shipdate < TIMESTAMP '2000-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24"""

  /** TPC-H Q14 shape — promotion effect: promo revenue share of one ship
    * month. Part attaches by broadcast; both sums are decimal-exact over
    * the same joined stream (one pass, CASE inside the aggregate — never
    * two scans); the share is ONE division of the two cast doubles. */
  private def promoShareSql(d: String => String): String = s"""
    WITH m AS (
      SELECT
        ${d("SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)) ELSE CAST(0 AS DECIMAL(38,10)) END)")}
          AS promo_rev,
        ${d("SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))")}
          AS total_rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1999-06-01'
        AND l_shipdate < TIMESTAMP '1999-07-01')
    SELECT promo_rev, total_rev,
      100.0 * promo_rev / total_rev AS promo_share
    FROM m"""

  /** TPC-H Q15 shape — top supplier: the quarter's revenue-per-supplier
    * aggregate probed by its own maximum (the view + MAX formulation).
    * The max compares DECIMALS exactly (no double round-trip inside the
    * predicate), so the winner set is bit-deterministic; ties would all
    * surface, ordered. Revenue aggregate is one fact-scan shuffle; the
    * scalar max broadcasts back. */
  private def topSupplierSql(d: String => String): String = s"""
    WITH rev AS (
      SELECT l_suppkey,
        SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        AND l_shipdate < TIMESTAMP '1999-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, ${d("r")} AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE r = (SELECT MAX(r) FROM rev)
    ORDER BY s_suppkey"""

  /** TPC-H Q17 shape — small-quantity-order revenue: line items of one
    * brand at under half their part's average quantity. The classic
    * correlated AVG subquery is computed ONCE as a per-part aggregate and
    * joined back (the decorrelation every optimizer wants; written
    * explicitly so both engines run the identical shape); the average is
    * a decimal-exact sum with ONE division, the threshold compare is
    * per-row IEEE. */
  private def smallQtyRevenueSql(d: String => String): String = s"""
    WITH pq AS (
      SELECT l_partkey AS pk,
        ${d("SUM(CAST(l_quantity AS DECIMAL(38,10)))")} / COUNT(*) AS avg_q
      FROM lineitem GROUP BY l_partkey)
    SELECT ${d("SUM(CAST(l_extendedprice AS DECIMAL(38,10)))")} / 7.0
        AS avg_yearly,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pk = p_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * avg_q"""

  /** TPC-H Q19 shape — discounted revenue over a DISJUNCTION of brand ×
    * size × quantity brackets: the predicate-complexity stress. Catalyst
    * must still (a) push the derivable superset filters to both scans
    * (brand IN-list + size range to part, quantity range to lineitem) and
    * (b) keep the join a hash join on partkey with the residual OR as a
    * post-join filter — never a nested-loop. Decimal-exact revenue +
    * integer count. */
  private def bracketRevenueSql(d: String => String): String = s"""
    SELECT
      ${d("SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))")}
        AS revenue,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 20)
      OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        AND l_quantity BETWEEN 10 AND 30)
      OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        AND l_quantity BETWEEN 20 AND 40)"""

  /** TPC-H Q2 shape — min-cost supplier per part in one region: THE
    * classic correlated-subquery decorrelation stress (the spec text has
    * `ps_supplycost = (SELECT MIN(ps_supplycost) ... WHERE ps_partkey =
    * p_partkey ...)`). No partsupp table ships, so the (part, supplier)
    * cost relation derives from lineitem (min observed unit price — one
    * per-row IEEE division, then MIN: deterministic bits both engines,
    * so the min-cost equality join-back matches exactly). Written as the
    * decorrelated two-aggregate form BOTH engines should plan: per-part
    * min joined back to the cost relation — one fact-sized aggregate,
    * never a per-row re-scan; part/supplier/nation/region attach by
    * broadcast (region+size predicates prune part first), and the top
    * 100 is TakeOrderedAndProject, not a global sort. */
  private val minCostSupplierSql: String = """
    WITH ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
        MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2),
    mn AS (SELECT pk, MIN(cost) AS mincost FROM ps GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
      ps.cost AS supply_cost
    FROM ps
    JOIN mn ON mn.pk = ps.pk AND ps.cost = mn.mincost
    JOIN part ON p_partkey = ps.pk
    JOIN supplier ON s_suppkey = ps.sk
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE p_size BETWEEN 1 AND 15 AND r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  /** TPC-H Q20 shape — part-promotion candidates: suppliers holding
    * excess stake in promoted parts (the nested EXISTS + correlated
    * half-quantity-threshold stress; spec: ps_availqty > 0.5 × the
    * supplier's shipped quantity of that part). Without partsupp the
    * stake is the supplier's share of the part's shipped quantity in
    * the window: qualify iff q(supp, part) > ½ · q(part) for some
    * part LIKE '%red%'. The two correlated aggregates decorrelate into
    * ONE grouped pass with the part-level total as a window over the
    * (part, supplier) aggregate — partition key = part, group-bounded,
    * and crucially a single fact scan (a separate tq aggregate
    * join-back reads sq twice once Spark inlines the CTE — measured as
    * two lineitem scans; the window form is also join-free). The
    * threshold compares DECIMALS exactly, and the nested EXISTS
    * collapses to DISTINCT + an IN (= LEFT SEMI) probe of supplier —
    * one fact shuffle total where the literal spec text would run two
    * correlated re-scans per supplier. */
  private val partPromotionSql: String = """
    WITH sq AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
        SUM(CAST(l_quantity AS DECIMAL(38,10))) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        AND l_shipdate < TIMESTAMP '2000-01-01'
      GROUP BY 1, 2),
    w AS (SELECT pk, sk, q, SUM(q) OVER (PARTITION BY pk) AS tot FROM sq),
    qual AS (SELECT DISTINCT w.sk FROM w
      JOIN part ON p_partkey = w.pk
      WHERE p_name LIKE '%red%' AND w.q * 2 > w.tot)
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT sk FROM qual)
    ORDER BY s_name"""

  def ops: Seq[Op] = Seq(
    Op("olap_min_cost_supplier",
      (s, dir) => {
        Seq("lineitem", "part", "supplier", "nation", "region")
          .foreach(view(s, dir, _))
        s.sql(minCostSupplierSql)
      },
      Some(minCostSupplierSql)),

    Op("olap_part_promotion",
      (s, dir) => {
        Seq("lineitem", "part", "supplier", "nation").foreach(view(s, dir, _))
        s.sql(partPromotionSql)
      },
      Some(partPromotionSql)),

    Op("olap_order_priority",
      (s, dir) => {
        Seq("orders", "lineitem").foreach(view(s, dir, _))
        s.sql(orderPrioritySql)
      },
      Some(orderPrioritySql)),

    Op("olap_forecast_revenue",
      (s, dir) => {
        view(s, dir, "lineitem")
        s.sql(forecastRevenueSql(sparkD))
      },
      Some(forecastRevenueSql(duckD))),

    Op("olap_promo_share",
      (s, dir) => {
        Seq("lineitem", "part").foreach(view(s, dir, _))
        s.sql(promoShareSql(sparkD))
      },
      Some(promoShareSql(duckD))),

    Op("olap_top_supplier",
      (s, dir) => {
        Seq("lineitem", "supplier").foreach(view(s, dir, _))
        s.sql(topSupplierSql(sparkD))
      },
      Some(topSupplierSql(duckD))),

    Op("olap_small_qty_revenue",
      (s, dir) => {
        Seq("lineitem", "part").foreach(view(s, dir, _))
        s.sql(smallQtyRevenueSql(sparkD))
      },
      Some(smallQtyRevenueSql(duckD))),

    Op("olap_bracket_revenue",
      (s, dir) => {
        Seq("lineitem", "part").foreach(view(s, dir, _))
        s.sql(bracketRevenueSql(sparkD))
      },
      Some(bracketRevenueSql(duckD))),

    Op("olap_ship_priority",
      (s, dir) => {
        Seq("customer", "orders", "lineitem").foreach(view(s, dir, _))
        s.sql(shipPrioritySql(sparkD))
      },
      Some(shipPrioritySql(duckD))),

    Op("olap_product_profit",
      (s, dir) => {
        Seq("lineitem", "orders", "part", "supplier", "nation")
          .foreach(view(s, dir, _))
        s.sql(productProfitSql(sparkD))
      },
      Some(productProfitSql(duckD))),

    Op("olap_customer_dist",
      (s, dir) => {
        Seq("customer", "orders").foreach(view(s, dir, _))
        s.sql(customerDistSql)
      },
      Some(customerDistSql)),

    Op("olap_large_orders",
      (s, dir) => {
        Seq("lineitem", "orders", "customer").foreach(view(s, dir, _))
        s.sql(largeOrdersSql(sparkD))
      },
      Some(largeOrdersSql(duckD))),

    Op("olap_late_suppliers",
      (s, dir) => {
        Seq("lineitem", "orders", "supplier").foreach(view(s, dir, _))
        s.sql(lateSuppliersSql)
      },
      Some(lateSuppliersSql)),

    Op("olap_idle_value_customers",
      (s, dir) => {
        Seq("customer", "orders", "nation").foreach(view(s, dir, _))
        s.sql(idleValueCustomersSql(sparkD))
      },
      Some(idleValueCustomersSql(duckD))),

    // MARKET-BASKET association rules — the a-priori 2-itemset pass over
    // order baskets: parts that co-occur in orders more than their
    // popularities predict, scored by integer-ppm lift (the
    // text_collocations estimator on transactional data). Plan shape: the
    // candidate pairs come from ONE self-equi-join of the distinct
    // (order, part) item list on the basket key — per-basket C(k,2) with
    // k ≈ items/order, so pair volume stays linear in baskets at any
    // scale (never part×part); support counts and the pair counts are
    // both map-side-combined; the lift join touches only the
    // support-≥3 survivors.
    Op("olap_basket_lift",
      (s, dir) => {
        view(s, dir, "lineitem")
        // Spark INLINES the items CTE at every reference (4×: both pair
        // sides, support, basket count) — re-running the DISTINCT over
        // the fact scan each time. Materialize it once (Views scaladoc;
        // DuckDB gets the same via AS MATERIALIZED).
        val items = graft.Views.materialize(s, dir, "basketitems",
          "SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem")
        s.sql(basketLiftSql("DIV", "DECIMAL(38,0)", items, ""))
      },
      Some(basketLiftSql("//", "HUGEINT",
        "(SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) z",
        "MATERIALIZED "))),

    // PARETO / revenue-concentration headline — "how many customers carry
    // 80% of revenue": per-customer decimal-exact revenue, one cumulative
    // window over the customer-sized aggregate (never window-over-fact),
    // and the 80% cutoff as an INTEGER decimal compare (cum·10 vs
    // total·8 — no rational crosses the engines). A customer is in the
    // covering prefix iff the revenue BEFORE it hasn't reached the
    // threshold, so the prefix is minimal and deterministic under the
    // (rev DESC, custkey) total order.
    Op("olap_pareto",
      (s, dir) => {
        view(s, dir, "orders")
        s.sql(paretoSql(sparkD))
      },
      Some(paretoSql(duckD))),

    // RFM SEGMENTATION — the classic customer-value grid (recency ×
    // frequency × monetary quartiles): one customer-sized aggregate off
    // the fact table, three NTILE windows over that aggregate (never
    // window-over-fact; each is one sort of the customer relation), and
    // a ≤64-cell segment rollup. Deterministic tie placement via the
    // (metric, custkey) total orders makes the quartile assignment — and
    // therefore every cell count — exactly replayable cross-engine.
    Op("olap_rfm",
      (s, dir) => {
        view(s, dir, "orders")
        s.sql(rfmSql(sparkD))
      },
      Some(rfmSql(duckD))))

  /** Shared RFM text, modulo the engine's DECIMAL→DOUBLE cast seam.
    * Quartile boundaries via NTILE(4) under TOTAL orders (metric, then
    * custkey) — deterministic tie placement, so both engines bucket
    * identically even on tied metrics. */
  private def rfmSql(d: String => String): String = s"""
    WITH per_cust AS (SELECT o_custkey,
        MAX(o_orderdate) AS last_order,
        COUNT(*) AS freq,
        SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS mon
      FROM orders GROUP BY 1),
    q AS (SELECT o_custkey, freq, mon,
        NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_q,
        NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
        NTILE(4) OVER (ORDER BY mon DESC, o_custkey) AS m_q
      FROM per_cust)
    SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
      ${d("SUM(mon)")} AS mon_sum
    FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Shared pareto text, modulo the engine's DECIMAL→DOUBLE cast seam. */
  private def paretoSql(d: String => String): String = s"""
    WITH r AS (SELECT o_custkey,
        SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev
      FROM orders GROUP BY 1),
    t AS (SELECT SUM(rev) AS total, COUNT(*) AS n_all FROM r),
    c AS (SELECT o_custkey, rev,
        SUM(rev) OVER (ORDER BY rev DESC, o_custkey
          ROWS UNBOUNDED PRECEDING) AS cum
      FROM r),
    p AS (SELECT c.o_custkey, c.rev, c.cum FROM c, t
      WHERE (c.cum - c.rev) * 10 < t.total * 8)
    SELECT COUNT(*) AS n_customers, t.n_all,
      ${d("MAX(p.cum)")} AS covered_rev,
      ${d("t.total")} AS total_rev,
      ${d("MAX(p.cum)")} / ${d("t.total")} AS share
    FROM p, t GROUP BY t.n_all, t.total"""

  /** Shared basket-lift text, modulo the integer-division spelling, the
    * 128-bit widening type (Spark DECIMAL(38,0) / DuckDB HUGEINT — Spark's
    * non-ANSI BIGINT product wraps SILENTLY at ~1e13 pair counts while
    * DuckDB promotes or errors; widening keeps the engines identical to
    * 1e38) and the (materialized) item-list relation. */
  private def basketLiftSql(idiv: String, wide: String, itemsRel: String,
      mat: String): String = s"""
    WITH items AS $mat(SELECT o, p FROM $itemsRel),
    nb AS (SELECT COUNT(DISTINCT o) AS n FROM items),
    sup AS (SELECT p, COUNT(*) AS c FROM items GROUP BY 1),
    pairs AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cab
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)
    SELECT pa, pb, cab, lift_ppm FROM (
      SELECT pr.pa, pr.pb, pr.cab,
        CAST((CAST(1000000 AS $wide) * pr.cab * nb.n)
          $idiv (CAST(sa.c AS $wide) * sb.c) AS BIGINT)
          AS lift_ppm
      FROM pairs pr JOIN sup sa ON sa.p = pr.pa
      JOIN sup sb ON sb.p = pr.pb CROSS JOIN nb
      WHERE pr.cab >= 3) z
    ORDER BY lift_ppm DESC, pa, pb LIMIT 15"""
}
