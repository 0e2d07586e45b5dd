package graft.ops

import graft.{Op, OpModule, Tables, num}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The custom-Catalyst operator keys (SURVEY.md §2.9) plus secondary source
  * formats (§2.1): each key drives one extension surface end-to-end through
  * the oracle —
  *   udf_expr_hash    → codegen'd UnaryExpression (StableHash64)
  *   udaf_sketch      → TypedImperativeAggregate (ThresholdDistinct)
  *   udtf_tokenize    → Generator (TokenizeGenerator)
  *   join_asof_exec   → custom SparkPlan (AsOfJoinExec ladder)
  *   source_csv_json  → csv + json sinks/sources round-trip
  *   sink_partitioned → partitionBy parquet write + pruned read-back */
object CustomExprOps extends OpModule {

  def ops: Seq[Op] = Seq(

    // Native expression inside whole-stage codegen; same rolling-hash value
    // as the SQL char fold (ASCII corpus ⇒ byte fold ≡ char fold).
    Op("udf_expr_hash",
      (s, dir) => {
        GraftFunctions.register(s)
        Tables(s, dir, "part").createOrReplaceTempView("part")
        s.sql("""SELECT p_partkey, stable_hash64(p_name) AS name_hash,
          stable_hash64(p_type) AS type_hash FROM part ORDER BY p_partkey""")
      },
      Some(s"""SELECT p_partkey, ${textsql.duckRollHash("p_name")} AS name_hash,
        ${textsql.duckRollHash("p_type")} AS type_hash
        FROM part ORDER BY p_partkey""")),

    // Threshold'd exact-distinct sketch: exact below k, -1 (saturated) above.
    // k=80 straddles the fixture's per-group supplier cardinality, so both
    // branches are exercised at every SF.
    Op("udaf_sketch",
      (s, dir) => {
        GraftFunctions.register(s)
        Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
          threshold_distinct(l_suppkey, 80) AS supp_sketch,
          threshold_distinct(l_orderkey, 80) AS order_sketch
          FROM lineitem GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CASE WHEN COUNT(DISTINCT l_suppkey) <= 80
          THEN COUNT(DISTINCT l_suppkey) ELSE -1 END AS supp_sketch,
        CASE WHEN COUNT(DISTINCT l_orderkey) <= 80
          THEN COUNT(DISTINCT l_orderkey) ELSE -1 END AS order_sketch
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // True Generator UDTF: text → (pos, token) rows, 1-based positions.
    Op("udtf_tokenize",
      (s, dir) => {
        GraftFunctions.register(s)
        Tables(s, dir, "documents").createOrReplaceTempView("documents")
        s.sql("""SELECT doc_id, pos, token
          FROM documents LATERAL VIEW tokenize(text) t AS pos, token
          WHERE doc_id % 50 = 0 ORDER BY doc_id, pos""")
      },
      Some(s"""SELECT doc_id, pos, token FROM (
        SELECT doc_id, generate_subscripts(${textsql.duckToks("text")}, 1) AS pos,
          unnest(${textsql.duckToks("text")}) AS token
        FROM documents WHERE doc_id % 50 = 0) t ORDER BY doc_id, pos""")),

    // The custom-SparkPlan rung of the ladder: merge-scan as-of join
    // (graft.plans.AsOfJoinExec) — same semantics and oracle as the
    // window-rewrite join_asof, different physical algorithm (O(1)-state
    // merge over co-partitioned sorted children vs shuffle + running-max).
    Op("join_asof_exec",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        graft.plans.AsOf.join(purchases, clicks,
            "user_id", "c_user", "ts", "c_ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("c_ts").as("last_click_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, p.ts,
        (SELECT max(c.ts) FROM events c WHERE c.event_type = 'click'
          AND c.user_id = p.user_id AND c.ts <= p.ts) AS last_click_ts
        FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""")),

    // Secondary formats: region → csv → read, nation → json → read, join.
    // Lossless for these all-primitive schemas; oracle reads the original
    // parquet — the round-trip is what's being verified.
    Op("source_csv_json",
      (s, dir) => {
        val tmp = graft.Staging.fresh("fmt")
        Tables(s, dir, "region").write.mode("overwrite")
          .option("header", "true").csv(s"$tmp/region_csv")
        Tables(s, dir, "nation").write.mode("overwrite").json(s"$tmp/nation_json")
        val r = s.read.option("header", "true")
          .schema("r_regionkey INT, r_name STRING").csv(s"$tmp/region_csv")
        val n = s.read
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
          .json(s"$tmp/nation_json")
        n.join(r, n("n_regionkey") === r("r_regionkey"))
          .select("n_nationkey", "n_name", "r_name")
          .orderBy("n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name, r_name FROM nation
        JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""")),

    // Partitioned parquet SINK — the scale-relevant write path: data laid
    // out by a partition column so downstream readers get partition pruning
    // for free. Writes orders partitioned by status, reads back ONE
    // partition (the scan lists only that directory — pruning happens at
    // file listing, before any row is read), aggregates it. The oracle
    // reads the original table, so layout + round-trip fidelity are both
    // checked.
    Op("sink_partitioned",
      (s, dir) => {
        val tmp = graft.Staging.fresh("sink")
        graft.Sink.partitionedWrite(Tables(s, dir, "orders"),
          "o_orderstatus", "o_orderkey", s"$tmp/orders_by_status")
        s.read.parquet(s"$tmp/orders_by_status")
          .filter(col("o_orderstatus") === "F")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), num.dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
        ${num.DSUM("o_totalprice")} AS total
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1"""))
  )
}
