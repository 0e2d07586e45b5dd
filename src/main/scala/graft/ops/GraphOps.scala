package graft.ops

import graft.{Op, OpModule}
import graft.functions.GraftFunctions
import graft.graph.{GraphFixture, GraphSql}
import org.apache.spark.sql.functions._

/** Graph operator keys (SURVEY.md §2.10) over the derived property graph.
  * Traversals are DF join pipelines; iterative analytics are GraphX/Pregel
  * (BASELINE.json's stated approach) with unrolled-CTE DuckDB oracles where
  * the arithmetic is order-independent (int min/hop counts, double max,
  * exact decimal sums), and rows-only checks where tie-breaking is
  * implementation-defined (label propagation). */
object GraphOps extends OpModule {
  import GraphSql.withGraph

  /** Test observability: micro-batches folded by stream_mst_maintain. */
  private[graft] val mstMaintainBatches =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** One-region robustness subgraph shared by the biconnectivity keys:
    * region 3, its nations, and their customers/suppliers, over the
    * in_region/in_nation/colocated labels — connected by construction
    * (every member reaches the region through its hierarchy), cyclic
    * through the customer–supplier–nation colocated triangles, and the
    * natural SHARD for cut-vertex/bridge analysis (robustness questions
    * are per-component; at 100 TB each region/CC shard runs this
    * independently). Returns canonical undirected pairs (a < b). */
  private def robustPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val g = GraphFixture(s, dir)
    val nations = g.edges
      .filter(col("label") === "in_region" && col("dst") === RobustRoot)
      .select(col("src").as("id"))
    val members = g.edges.filter(col("label") === "in_nation")
      .join(nations.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select(col("src").as("id"))
    val vs = g.vertices.filter(col("id") === RobustRoot).select("id")
      .unionAll(nations).unionAll(members)
    g.edges.filter(col("label").isin("in_region", "in_nation", "colocated"))
      .join(vs.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(vs.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
  }

  // Region key 3: the one region whose colocated triangles exist at EVERY
  // fixture SF (sf0.001 has colocated edges only in regions 3 and 4), so
  // the subgraph always carries both cut and non-cut structure.
  private val RobustRoot = GraphFixture.B + 3

  // Biconnectivity runs once per (session, dir): both keys read the same
  // Tarjan–Vishkin pass (graph/Biconnect.scala), so memoize the pair.
  private val biconnMemo = new graft.SessionMemo[String,
    (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
  private def biconn(s: org.apache.spark.sql.SparkSession, dir: String) =
    biconnMemo.getOrElseUpdate(s, dir) {
      graft.graph.Biconnect(robustPairs(s, dir), RobustRoot)
    }

  /** ALL-regions robustness subgraph — the genuinely DISCONNECTED input
    * (one component per region hierarchy) for the forest biconnectivity
    * keys: same edge labels as [[robustPairs]], no region restriction. */
  private def robustPairsAll(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    GraphFixture(s, dir).edges
      .filter(col("label").isin("in_region", "in_nation", "colocated"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  // Forest biconnectivity: the COMPOSITION the single-component pass
  // refuses to fake (Biconnect's loud connectivity require) — component
  // roots come from the CC machinery (converged hook+jump labels are each
  // component's min id), then ALL components' BFS trees and sweeps run
  // batched in one forest pass. Memoized like the one-region pair.
  private val biconnAllMemo = new graft.SessionMemo[String,
    (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
  private def biconnAll(s: org.apache.spark.sql.SparkSession, dir: String) =
    biconnAllMemo.getOrElseUpdate(s, dir) {
      val pairs = robustPairsAll(s, dir)
      val roots = graft.graph.PairCC.labelsConverged(
        pairs.select(col("a").as("da"), col("b").as("db")))
        .select(col("lbl").as("id")).distinct()
      graft.graph.Biconnect.forest(pairs, roots)
    }

  /** Shared oracle CTEs for the robustness subgraph: vsub/esub/usub mirror
    * [[robustPairs]] exactly (esub canonical a < b, usub both directions). */
  private val robustSql = s"""nat AS (SELECT src AS id FROM edges
      WHERE label = 'in_region' AND dst = $RobustRoot),
    mem AS (SELECT e.src AS id FROM edges e JOIN nat n ON n.id = e.dst
      WHERE e.label = 'in_nation'),
    vsub AS MATERIALIZED (SELECT CAST($RobustRoot AS BIGINT) AS id
      UNION ALL SELECT id FROM nat UNION ALL SELECT id FROM mem),
    esub AS MATERIALIZED (SELECT LEAST(e.src, e.dst) AS a,
        GREATEST(e.src, e.dst) AS b
      FROM edges e JOIN vsub x ON x.id = e.src JOIN vsub y ON y.id = e.dst
      WHERE e.label IN ('in_region', 'in_nation', 'colocated')
      GROUP BY 1, 2),
    usub AS MATERIALIZED (SELECT a, b FROM esub
      UNION ALL SELECT b, a FROM esub)"""

  /** Oracle CTEs for the ALL-regions robustness subgraph — the SQL twin of
    * [[robustPairsAll]] (canonical a < b, both directions in usubf). */
  private val robustAllSql = """esubf AS MATERIALIZED (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges
      WHERE label IN ('in_region', 'in_nation', 'colocated') AND src <> dst
      GROUP BY 1, 2),
    usubf AS MATERIALIZED (SELECT a, b FROM esubf
      UNION ALL SELECT b, a FROM esubf)"""

  /** One ≤60-root bitmap-BFS eccentricity batch (see graph_eccentricity's
    * Op comment): builds the checkpointed level chain for `batch`'s roots
    * under `tag`-scoped view names and returns the per-root (id, ecc,
    * n_ball) SELECT — batches are root-disjoint, so the caller just
    * UNION ALLs them. */
  private def eccBatch(s: org.apache.spark.sql.SparkSession, dir: String,
      und: String, batch: Array[Long], tag: String): String = {
    require(batch.nonEmpty && batch.length <= 60)
    val f0bits = batch.zipWithIndex.map { case (id, r) =>
      s"(CASE WHEN id = ${id}L THEN CAST(${1L << r} AS BIGINT)" +
        " ELSE CAST(0 AS BIGINT) END)" }.mkString(" | ")
    val inList = batch.map(i => s"${i}L").mkString(", ")
    val fs = new Array[String](9)
    val vs = new Array[String](9)
    fs(0) = graft.Views.checkpointed(s, dir, s"ecch${tag}_f0",
      s"SELECT id, $f0bits AS rb FROM g_vertices WHERE id IN ($inList)")
    vs(0) = graft.Views.checkpointed(s, dir, s"ecch${tag}_v0",
      s"SELECT id, rb AS vis FROM ${fs(0)}")
    for (l <- 1 to 8) {
      fs(l) = graft.Views.checkpointed(s, dir, s"ecch${tag}_f$l", s"""
        SELECT id, rb FROM (
          SELECT e.id, e.rbo & ~COALESCE(v.vis, CAST(0 AS BIGINT)) AS rb
          FROM (SELECT u.b AS id, CAST(bit_or(f.rb) AS BIGINT) AS rbo
                FROM ${fs(l - 1)} f JOIN $und u ON u.a = f.id
                GROUP BY u.b) e
          LEFT JOIN ${vs(l - 1)} v ON v.id = e.id) t
        WHERE rb <> 0""")
      if (l < 8)
        vs(l) = graft.Views.checkpointed(s, dir, s"ecch${tag}_v$l", s"""
          SELECT id, CAST(bit_or(vb) AS BIGINT) AS vis FROM (
            SELECT id, vis AS vb FROM ${vs(l - 1)}
            UNION ALL SELECT id, rb FROM ${fs(l)}) t GROUP BY id""")
    }
    val rootRows = batch.zipWithIndex.map { case (id, r) =>
      s"(${id}L, $r)" }.mkString(", ")
    s"""
      SELECT r.root AS id, CAST(MAX(t.d) AS BIGINT) AS ecc,
        COUNT(*) AS n_ball
      FROM (${(0 to 8).map(l => s"SELECT id, rb, $l AS d FROM ${fs(l)}")
        .mkString(" UNION ALL ")}) t
      JOIN (SELECT * FROM VALUES $rootRows AS rt(root, idx)) r
        ON (shiftright(t.rb, r.idx) & 1) = 1
      GROUP BY r.root"""
  }

  def ops: Seq[Op] = Seq(

    // Construction summary: counts per label over both element kinds —
    // exercises the full build (all 8 vertex sources, all 8 edge rules).
    Op("graph_build",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        g.vertices.groupBy("label").agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("vertex"))
          .unionByName(g.edges.groupBy("label").agg(count(lit(1)).as("n"))
            .withColumn("kind", lit("edge")))
          .select("kind", "label", "n")
          .orderBy("kind", "label")
      },
      Some(withGraph("""SELECT 'vertex' AS kind, label, COUNT(*) AS n
        FROM vertices GROUP BY 2
        UNION ALL SELECT 'edge', label, COUNT(*) FROM edges GROUP BY 2
        ORDER BY kind, label"""))),

    Op("graph_degree",
      (s, dir) => GraphFixture(s, dir).degrees.orderBy("id"),
      Some(withGraph("""SELECT v.id, v.label,
          COALESCE(o.n, CAST(0 AS BIGINT)) AS out_deg,
          COALESCE(i.n, CAST(0 AS BIGINT)) AS in_deg,
          COALESCE(o.n, CAST(0 AS BIGINT)) + COALESCE(i.n, CAST(0 AS BIGINT)) AS deg
        FROM vertices v
        LEFT JOIN (SELECT src, COUNT(*) AS n FROM edges GROUP BY 1) o ON o.src = v.id
        LEFT JOIN (SELECT dst, COUNT(*) AS n FROM edges GROUP BY 1) i ON i.dst = v.id
        ORDER BY v.id"""))),

    // Blueprints out('contains').has(weight > 30): property-filtered 1-hop.
    Op("graph_out",
      (s, dir) => GraphFixture(s, dir).out("contains")
        .filter(col("weight") > 30)
        .select(col("src"), col("dst"), col("dst_name").as("part_name"), col("weight"))
        .orderBy("src", "dst"),
      Some(withGraph("""SELECT e.src, e.dst, v.name AS part_name, e.weight
        FROM edges e JOIN vertices v ON v.id = e.dst
        WHERE e.label = 'contains' AND e.weight > 30
        ORDER BY e.src, e.dst"""))),

    // in('in_nation') grouped: members per nation.
    Op("graph_in",
      (s, dir) => GraphFixture(s, dir).in("in_nation")
        .groupBy(col("dst").as("id"), col("dst_name").as("nation"))
        .agg(count(lit(1)).as("n_in"))
        .orderBy("id"),
      Some(withGraph("""SELECT e.dst AS id, v.name AS nation, COUNT(*) AS n_in
        FROM edges e JOIN vertices v ON v.id = e.dst
        WHERE e.label = 'in_nation'
        GROUP BY 1, 2 ORDER BY 1"""))),

    // Undirected traversal both('colocated'): per-vertex undirected
    // neighborhood summary (Blueprints both() — customers and suppliers
    // each see the other side of the colocated edge).
    Op("graph_both",
      (s, dir) => GraphFixture(s, dir).both("colocated")
        .groupBy("id")
        .agg(count(lit(1)).as("n_nbrs"), min(col("nbr")).as("min_nbr"))
        .orderBy("id"),
      Some(withGraph("""SELECT id, COUNT(*) AS n_nbrs, MIN(nbr) AS min_nbr
        FROM (
          SELECT src AS id, dst AS nbr FROM edges WHERE label = 'colocated'
          UNION ALL
          SELECT dst, src FROM edges WHERE label = 'colocated'
        ) b GROUP BY id ORDER BY id"""))),

    // 2-hop motif: customer -in_nation-> nation -in_region-> region.
    Op("graph_hop2",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val e1 = g.edges.filter(col("label") === "in_nation")
          .select(col("src").as("cid"), col("dst").as("nid"))
        val e2 = g.edges.filter(col("label") === "in_region")
          .select(col("src").as("nid"), col("dst").as("rid"))
        val v = g.vertices
        e1.join(e2, "nid")
          .join(v.filter(col("label") === "customer")
            .select(col("id").as("cid"), col("name").as("customer")), "cid")
          .join(v.select(col("id").as("nid"), col("name").as("nation")), "nid")
          .join(v.select(col("id").as("rid"), col("name").as("region")), "rid")
          .select("customer", "nation", "region")
          .orderBy("customer", "nation", "region")
      },
      Some(withGraph("""SELECT c.name AS customer, n.name AS nation, r.name AS region
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst AND e2.label = 'in_region'
        JOIN vertices c ON c.id = e1.src AND c.label = 'customer'
        JOIN vertices n ON n.id = e1.dst
        JOIN vertices r ON r.id = e2.dst
        WHERE e1.label = 'in_nation'
        ORDER BY 1, 2, 3"""))),

    // Variable-length reachability ≤3 hops from order #1 (BFS min-hops).
    Op("graph_var_hop",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        g.varHop(g.vertices.filter(col("id") === 6000000000001L), 3)
          .orderBy("id")
      },
      Some(withGraph(
        """SELECT r.id, MIN(r.d) AS hops FROM reach r GROUP BY 1 ORDER BY 1""",
        extra = """reach(id, d) AS (
          SELECT CAST(6000000000001 AS BIGINT), 0
          UNION
          SELECT e.dst, r.d + 1 FROM reach r
          JOIN edges e ON e.src = r.id WHERE r.d < 3)""",
        recursive = true))),

    // Point-to-class shortest path WITH path reconstruction: the nearest
    // region-label vertex to customer #1 and the actual route (the "how
    // are these two entities related" graph-DB query — SSSP gives only
    // distances). Point traversal ⇒ PropertyGraph.walks — driver-side
    // enumeration under the frontier cap, distributed paths() past it —
    // then the (hops, path-string)-minimal walk picked declaratively, so
    // an unreachable target yields ZERO rows (matching the oracle's
    // LIMIT 1 over an empty set) instead of a driver minBy crash. The
    // oracle enumerates the same walks recursively and picks the same
    // minimum.
    Op("graph_shortest_path",
      (s, dir) => {
        val B = GraphFixture.B
        GraphFixture(s, dir).walks(3000000000001L, 4)
          .filter(col("id") >= B && col("id") < 2 * B) // region tag = 1
          .select(col("id").as("target"), col("hops"), col("path"))
          .orderBy("hops", "path").limit(1)
      },
      Some(withGraph(
        """SELECT p.id AS target, CAST(len(p.path) - 1 AS BIGINT) AS hops,
          array_to_string(p.path, '->') AS path
        FROM p JOIN vertices v ON v.id = p.id AND v.label = 'region'
        ORDER BY hops, path LIMIT 1""",
        extra = """p(id, path) AS (
          SELECT CAST(3000000000001 AS BIGINT) AS id,
            [CAST(3000000000001 AS BIGINT)] AS path
          UNION ALL
          SELECT e.dst, list_append(pp.path, e.dst) FROM p pp
          JOIN edges e ON e.src = pp.id WHERE len(pp.path) <= 4)""",
        recursive = true))),

    // Reachability PROFILE: min-hop histogram from the entire order set
    // (≤2 hops) — "how far is the data from its entities", the diagnostic
    // for traversal cost planning. Unlike the point lookups (ego/paths),
    // the frontier here is the 150k-order vertex class, so this runs the
    // DISTRIBUTED BSP path (Pregel hop-flood on the shared GraphX view);
    // the histogram folds vertex-sized output to a handful of rows.
    Op("graph_hop_hist",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        g.varHop(g.vertices.filter(col("label") === "order"), 2)
          .groupBy("hops").agg(count(lit(1)).as("n"))
          .orderBy("hops")
      },
      Some(withGraph(
        """SELECT hops, COUNT(*) AS n FROM (
          SELECT id, MIN(d) AS hops FROM reach GROUP BY 1) m
        GROUP BY 1 ORDER BY 1""",
        extra = """reach(id, d) AS (
          SELECT id, 0 FROM vertices WHERE label = 'order'
          UNION
          SELECT e.dst, r.d + 1 FROM reach r
          JOIN edges e ON e.src = r.id WHERE r.d < 2)""",
        recursive = true))),

    // Path enumeration ≤3 hops from order #1 (Blueprints path() step):
    // every walk with its full vertex sequence, serialized '->' for the
    // cross-engine compare (ARRAY columns have no portable hash form).
    // Like graph_ego, this is a POINT traversal, so PropertyGraph.walks
    // runs the graph-DB latency path — per-hop InSet-filtered scans of
    // the edge cache, walk enumeration driver-side on the tiny result
    // (179 walks at sf0.01; the DF-join formulation paid 3 AQE join
    // cascades over the full edge cache — 8-17 s at sf0.1, vs ~1 s) —
    // and cuts over to the distributed PropertyGraph.paths form when any
    // frontier or the walk set overflows the cap (hub-vertex guard).
    Op("graph_paths",
      (s, dir) => GraphFixture(s, dir).walks(6000000000001L, 3)
        .select("id", "path")
        .orderBy("id", "path"),
      Some(withGraph(
        "SELECT id, array_to_string(path, '->') AS path FROM p ORDER BY 1, 2",
        extra = """p(id, path) AS (
          SELECT CAST(6000000000001 AS BIGINT) AS id,
            [CAST(6000000000001 AS BIGINT)] AS path
          UNION ALL
          SELECT e.dst, list_append(pp.path, e.dst) FROM p pp
          JOIN edges e ON e.src = pp.id WHERE len(pp.path) <= 3)""",
        recursive = true))),

    // Induced subgraph: public people/places only, edge list.
    Op("graph_subgraph",
      (s, dir) => GraphFixture(s, dir)
        .subgraph(col("vis") === "public" &&
          col("label").isin("customer", "supplier", "nation", "region"))
        .edges.select("src", "dst", "label")
        .orderBy("src", "dst", "label"),
      Some(withGraph("""SELECT e.src, e.dst, e.label FROM edges e
        JOIN sub s1 ON s1.id = e.src JOIN sub s2 ON s2.id = e.dst
        ORDER BY 1, 2, 3""",
        extra = """sub AS (SELECT id FROM vertices WHERE vis = 'public'
          AND label IN ('customer', 'supplier', 'nation', 'region'))"""))),

    // Visibility-filtered view: per-label visible vertex + out-edge counts.
    Op("graph_visibility",
      (s, dir) => {
        val g = GraphFixture(s, dir).visible
        val od = g.edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("n"))
        g.vertices.join(od, Seq("id"), "left")
          .groupBy("label")
          .agg(count(lit(1)).as("n_vertices"),
            sum(coalesce(col("n"), lit(0L))).as("out_edges"))
          .orderBy("label")
      },
      Some(withGraph("""SELECT v.label, COUNT(*) AS n_vertices,
          CAST(SUM(COALESCE(o.n, 0)) AS BIGINT) AS out_edges
        FROM vv v LEFT JOIN od o ON o.src = v.id
        GROUP BY 1 ORDER BY 1""",
        extra = """vv AS (SELECT * FROM vertices WHERE vis = 'public'),
          ve AS (SELECT e.* FROM edges e
            JOIN vv a ON a.id = e.src JOIN vv b ON b.id = e.dst
            WHERE e.vis = 'public'),
          od AS (SELECT src, COUNT(*) AS n FROM ve GROUP BY 1)"""))),

    Op("graph_cc",
      (s, dir) => GraphFixture(s, dir).connectedComponents.orderBy("id"),
      Some(withGraph(
        "SELECT id, lbl AS component FROM l16 ORDER BY id",
        extra = GraphSql.ccChain(16)))),

    // Directed STRONGLY-connected components over the symmetrized view
    // (GraphFixture.sccView: 'colocated' expanded to both directions —
    // without it the fixture is a DAG and every SCC is a singleton).
    // Spark side: GraphX trim/forward-color/backward-confirm peeling
    // (PropertyGraph.stronglyConnectedComponents). Oracle: the textbook
    // definition — mutual bounded reachability over the directed edge set
    // (fixpoint recursive closure; feasible at oracle SF because reach
    // sets are colocated-cluster-sized, NOT an approach the Spark side
    // could ship at 100 TB). Labels are SCC-minimum vertex ids in both.
    Op("graph_scc",
      (s, dir) => GraphFixture.sccView(s, dir)
        .stronglyConnectedComponents.orderBy("id"),
      Some(withGraph(
        """SELECT v.id, LEAST(v.id, COALESCE(mm.mn, v.id)) AS component
          FROM vertices v LEFT JOIN mm ON mm.id = v.id ORDER BY v.id""",
        extra = """de AS MATERIALIZED (SELECT src, dst FROM edges
            UNION SELECT dst, src FROM edges WHERE label = 'colocated'),
          reach(a, b) AS (SELECT src, dst FROM de
            UNION SELECT r.a, e.dst FROM reach r JOIN de e ON e.src = r.b),
          mut AS (SELECT r.a, r.b FROM reach r
            JOIN reach s ON s.a = r.b AND s.b = r.a),
          mm AS (SELECT a AS id, MIN(b) AS mn FROM mut GROUP BY 1)""",
        recursive = true))),

    // SCC CONDENSATION: the component-level DAG — what SCC exists to
    // produce (collapse each strongly-connected cluster to one node; the
    // remaining edges are by construction acyclic, the form topological
    // analyses run on). Two broadcast-size joins of the stored SCC
    // labeling onto the edge ends + one distinct — the labeling is the
    // expensive part and it is the stored artifact graph_scc certifies;
    // this key certifies the collapse. Output: condensed edges with
    // member/edge multiplicities (how many vertices each super-node
    // swallowed is part of the answer a condensation consumer needs).
    Op("graph_condensation",
      (s, dir) => {
        val g = GraphFixture.sccView(s, dir)
        val lbl = g.stronglyConnectedComponents
        val e = g.edges
          .join(lbl.select(col("id").as("src"), col("component").as("ca")), "src")
          .join(lbl.select(col("id").as("dst"), col("component").as("cb")), "dst")
          .filter(col("ca") =!= col("cb"))
          .groupBy("ca", "cb").agg(count(lit(1)).as("n_edges"))
        val sizes = lbl.groupBy(col("component").as("ca"))
          .agg(count(lit(1)).as("n_members"))
        e.join(sizes, "ca")
          .select("ca", "cb", "n_edges", "n_members")
          .orderBy("ca", "cb")
      },
      Some(withGraph(
        """SELECT ca, cb, n_edges, n_members FROM (
          SELECT l1.c AS ca, l2.c AS cb, COUNT(*) AS n_edges
          FROM ed e JOIN lbl l1 ON l1.id = e.src
          JOIN lbl l2 ON l2.id = e.dst
          WHERE l1.c <> l2.c GROUP BY 1, 2) ce
        JOIN (SELECT c AS ca, COUNT(*) AS n_members FROM lbl GROUP BY 1) sz
          USING (ca)
        ORDER BY ca, cb""",
        extra = """de AS MATERIALIZED (SELECT src, dst FROM edges
            UNION SELECT dst, src FROM edges WHERE label = 'colocated'),
          ed AS MATERIALIZED (SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges WHERE label = 'colocated'),
          reach(a, b) AS (SELECT src, dst FROM de
            UNION SELECT r.a, e.dst FROM reach r JOIN de e ON e.src = r.b),
          mut AS (SELECT r.a, r.b FROM reach r
            JOIN reach s ON s.a = r.b AND s.b = r.a),
          mm AS (SELECT a AS id, MIN(b) AS mn FROM mut GROUP BY 1),
          lbl AS (SELECT v.id, LEAST(v.id, COALESCE(mm.mn, v.id)) AS c
            FROM vertices v LEFT JOIN mm ON mm.id = v.id)""",
        recursive = true))),

    // TOPOLOGICAL LAYERING (Kahn by layers) over the base edge set —
    // which IS a DAG (see graph_scc: cycles only appear under the
    // symmetrized view). layer(v) = length of the longest path reaching v
    // from any source; the peel is one BSP round per layer (distinct
    // dst-set + anti-join), depth-bounded (fixture depth ≤ ~6), with a
    // per-round progress check so a cycle fails loudly instead of
    // spinning. The oracle is the textbook recursive longest-path-depth
    // closure. Layer histograms are what scheduling/lineage consumers of
    // the condensation DAG actually read, so the key emits per-vertex
    // layers (histogram folds are one groupBy away).
    Op("graph_topo_layers",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val e = g.edges.select("src", "dst").distinct().persist()
        var todo = g.vertices.select("id") // persisted parent; cut on reassign
        var out: Seq[org.apache.spark.sql.DataFrame] = Nil
        var layer = 0
        var n = todo.count()
        while (n > 0) {
          require(layer <= 32,
            s"topo depth cap: DAG deeper than 32 layers (raise the cap); " +
              "an actual cycle is caught by the no-progress check below")
          // an edge blocks its dst iff its src is still unlayered — so
          // the STATIC edge list semi-joined against the shrinking todo
          // set replaces any per-round edge-set materialization (the
          // first cut of this key checkpointed the surviving edges every
          // round: 7 edge-sized writes for a vertex-sized answer, 8.9 s
          // at sf0.1). todo is vertex-sized and
          // broadcast-hinted; a graph whose unlayered set outgrows
          // broadcast drops the hint and takes the shuffle.
          val blocked = e.join(g.vhint(todo.withColumnRenamed("id", "src")),
              Seq("src"), "left_semi")
            .select(col("dst").as("id")).distinct()
          // ONE eager cut per round (the surviving set); the layer's ready
          // set is derived lazily as todo \ todo_next — both sides are
          // checkpointed vertex-sized sets, so the final union evaluates
          // K cheap anti-joins in one job instead of paying a second
          // materialization inside every round (r13: 2 jobs/layer → 1)
          val todo2 = graft.util.cut(
            todo.join(blocked, Seq("id"), "left_semi"), eager = false)
          out = out :+ todo.join(todo2, Seq("id"), "left_anti")
            .withColumn("layer", lit(layer))
          val left = todo2.count()
          require(left < n, "cycle detected: topo peel made no progress")
          todo = todo2
          n = left
          layer += 1
        }
        e.unpersist()
        out.reduce(_ unionAll _).orderBy("id")
      },
      Some(withGraph(
        """SELECT id, CAST(MAX(d) AS INTEGER) AS layer
          FROM lp GROUP BY 1 ORDER BY 1""",
        extra = """lp(id, d) AS (
            SELECT id, 0 FROM vertices
            WHERE id NOT IN (SELECT dst FROM edges)
            UNION
            SELECT e.dst, lp.d + 1 FROM lp JOIN edges e ON e.src = lp.id)""",
        recursive = true))),

    // BRIDGES of the one-region robustness subgraph (see robustPairs):
    // cut edges whose removal disconnects the component — the edge half of
    // biconnectivity, next to graph_scc/graph_condensation in the
    // robustness family. Spark side is the Tarjan–Vishkin BSP machinery
    // (graph/Biconnect.scala): BFS tree + preorder-interval low/high — a
    // tree edge is a bridge iff no non-tree edge leaves its subtree. The
    // oracle is DEFINITIONAL and algorithm-independent: per edge, flood
    // from one endpoint in G − that edge and test whether the other
    // endpoint is reached (state is |esub|·|vsub|, fine at oracle SF and
    // exactly the kind of check the distributed side could never ship).
    Op("graph_bridges",
      (s, dir) => biconn(s, dir)._1.orderBy("a", "b"),
      Some(withGraph(
        """SELECT e.a, e.b FROM esub e WHERE NOT EXISTS (
            SELECT 1 FROM br r WHERE r.ea = e.a AND r.eb = e.b AND r.v = e.b)
          ORDER BY 1, 2""",
        extra = robustSql + """,
          br(ea, eb, v) AS (
            SELECT a, b, a FROM esub
            UNION
            SELECT r.ea, r.eb, u.b FROM br r JOIN usub u ON u.a = r.v
            WHERE NOT (LEAST(u.a, u.b) = r.ea
              AND GREATEST(u.a, u.b) = r.eb))""",
        recursive = true))),

    // ARTICULATION POINTS of the same subgraph — the vertex half: cut
    // vertices whose removal disconnects the component. Spark side reads
    // the same Tarjan–Vishkin pass: biconnected components are the CCs of
    // the auxiliary graph on tree edges, and v is a cut vertex iff its
    // tree edge and some child's tree edge land in different components
    // (root: ≥ 2 children's components). Oracle again definitional: per
    // vertex w, flood from w's least neighbor in G − w; w is articulation
    // iff the flood covers fewer than |vsub| − 1 vertices.
    Op("graph_articulation",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        biconn(s, dir)._2
          .join(g.vertices.select("id", "label"), "id")
          .orderBy("id")
      },
      Some(withGraph(
        """SELECT d.id, v.label FROM deg d
          JOIN cnt c ON c.w = d.id
          JOIN vertices v ON v.id = d.id
          WHERE c.n < (SELECT COUNT(*) FROM vsub) - 1
          ORDER BY 1""",
        extra = robustSql + """,
          deg AS (SELECT a AS id, MIN(b) AS seed FROM usub GROUP BY 1),
          ra(w, v) AS (
            SELECT id, seed FROM deg
            UNION
            SELECT r.w, u.b FROM ra r JOIN usub u ON u.a = r.v
            WHERE u.b <> r.w),
          cnt AS (SELECT w, COUNT(*) AS n FROM ra GROUP BY 1)""",
        recursive = true))),

    // FOREST bridges: the same Tarjan–Vishkin pass over the ALL-regions
    // robustness subgraph — a genuinely DISCONNECTED graph (one component
    // per region hierarchy), roots composed from the CC machinery
    // (biconnAll). The oracle stays DEFINITIONAL and per-component-free:
    // per edge, flood from one endpoint in G − that edge; the flood
    // naturally stays inside the edge's own component.
    Op("graph_bridges_forest",
      (s, dir) => biconnAll(s, dir)._1.orderBy("a", "b"),
      Some(withGraph(
        """SELECT e.a, e.b FROM esubf e WHERE NOT EXISTS (
            SELECT 1 FROM br r WHERE r.ea = e.a AND r.eb = e.b AND r.v = e.b)
          ORDER BY 1, 2""",
        extra = robustAllSql + """,
          br(ea, eb, v) AS (
            SELECT a, b, a FROM esubf
            UNION
            SELECT r.ea, r.eb, u.b FROM br r JOIN usubf u ON u.a = r.v
            WHERE NOT (LEAST(u.a, u.b) = r.ea
              AND GREATEST(u.a, u.b) = r.eb))""",
        recursive = true))),

    // FOREST articulation points over the same disconnected input. The
    // single-component oracle compared each removal flood against the
    // GLOBAL vertex count; with several components the yardstick is the
    // removed vertex's OWN component size, measured by a second
    // definitional flood (rc) from the vertex itself with nothing removed.
    Op("graph_articulation_forest",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        biconnAll(s, dir)._2
          .join(g.vertices.select("id", "label"), "id")
          .orderBy("id")
      },
      Some(withGraph(
        """SELECT d.id, v.label FROM deg d
          JOIN cnt c ON c.w = d.id
          JOIN csz s ON s.w = d.id
          JOIN vertices v ON v.id = d.id
          WHERE c.n < s.n - 1
          ORDER BY 1""",
        extra = robustAllSql + """,
          deg AS (SELECT a AS id, MIN(b) AS seed FROM usubf GROUP BY 1),
          ra(w, v) AS (
            SELECT id, seed FROM deg
            UNION
            SELECT r.w, u.b FROM ra r JOIN usubf u ON u.a = r.v
            WHERE u.b <> r.w),
          rc(w, v) AS (
            SELECT id, id FROM deg
            UNION
            SELECT r.w, u.b FROM rc r JOIN usubf u ON u.a = r.v),
          cnt AS (SELECT w, COUNT(*) AS n FROM ra GROUP BY 1),
          csz AS (SELECT w, COUNT(*) AS n FROM rc GROUP BY 1)""",
        recursive = true))),

    // INCREMENTAL CC maintenance: the 'did' edges (user→event — the
    // fixture's streaming-ingest analog batch, cf. stream_graph_ingest)
    // are folded into the BASE graph's stored labeling via delta-bounded
    // component merging (PropertyGraph.incrementalCC) instead of a
    // full-graph fixed point. The oracle is the FULL recompute over all
    // edges (same chain as graph_cc), so the green row certifies
    // incremental ≡ full, bit-for-bit.
    Op("graph_cc_incremental",
      (s, dir) => GraphFixture(s, dir)
        .incrementalCC(col("label") === "did").orderBy("id"),
      Some(withGraph(
        "SELECT id, lbl AS component FROM l16 ORDER BY id",
        extra = GraphSql.ccChain(16)))),

    // INCREMENTAL triangle maintenance: the 'colocated' batch (customer ×
    // same-nation supplier — edges that CLOSE wedges through shared nation
    // neighbors, so the delta actually creates triangles) folded into the
    // stored base count via delta-first common-neighbor probing
    // (PropertyGraph.incrementalTriangles). The oracle recounts BOTH the
    // base and full graphs from scratch, so the green row certifies the
    // delta enumeration is exact — including triangles with 2-3 delta
    // edges, which the vertex-sorted triple dedup counts once.
    Op("graph_triangles_incremental",
      (s, dir) => GraphFixture(s, dir)
        .incrementalTriangles(col("label") === "colocated"),
      Some(withGraph(
        """SELECT n_base, n_total - n_base AS n_delta, n_total FROM (
          SELECT
            (SELECT COUNT(*) FROM bu e1 JOIN bu e2 ON e2.a = e1.b
              JOIN bu e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_base,
            (SELECT COUNT(*) FROM fu e1 JOIN fu e2 ON e2.a = e1.b
              JOIN fu e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_total) t""",
        extra = """fu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b FROM edges WHERE src <> dst),
          bu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b FROM edges
            WHERE src <> dst AND label <> 'colocated')"""))),

    // Component-size distribution — the connectivity skew diagnostic (one
    // giant component? a long tail of islands?). Folds the STORED CC
    // labeling (shared with graph_cc/graph_pregel) through two
    // vertex-sized aggregates.
    Op("graph_cc_sizes",
      (s, dir) => GraphFixture(s, dir).connectedComponents
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_components"))
        .orderBy("sz"),
      Some(withGraph(
        """SELECT sz, COUNT(*) AS n_components FROM (
          SELECT lbl, COUNT(*) AS sz FROM l16 GROUP BY 1) c
        GROUP BY 1 ORDER BY 1""",
        extra = GraphSql.ccChain(16)))),

    // Connected components of the VISIBLE subgraph — analytics under the
    // cell-visibility model: secret vertices/edges are trimmed BEFORE the
    // labeling runs, so components that were only bridged by secret
    // elements fall apart (the security-correct answer, not the convenient
    // one). Runs on the stored visibleView instance so the trimmed GraphX
    // build is shared across visibility-aware keys.
    Op("graph_visible_cc",
      (s, dir) => GraphFixture(s, dir).visibleView
        .connectedComponents.orderBy("id"),
      Some(withGraph(
        "SELECT id, lbl AS component FROM l16 ORDER BY id",
        extra = """vv AS MATERIALIZED (SELECT * FROM vertices WHERE vis = 'public'),
          ve AS MATERIALIZED (SELECT e.* FROM edges e
            JOIN vv a ON a.id = e.src JOIN vv b ON b.id = e.dst
            WHERE e.vis = 'public'), """ + GraphSql.ccChain(16, "ve", "vv")))),

    // Pregel max-value flood = max vertex val per component.
    Op("graph_pregel",
      (s, dir) => GraphFixture(s, dir).maxFlood.orderBy("id"),
      Some(withGraph(
        """SELECT l.id, cm.m AS maxval FROM l16 l
          JOIN cm ON cm.lbl = l.lbl ORDER BY l.id""",
        extra = GraphSql.ccChain(16) + """,
          cm AS (SELECT l.lbl, MAX(COALESCE(v.val, 0)) AS m
            FROM l16 l JOIN vertices v ON v.id = l.id GROUP BY 1)"""))),

    // Min hops to the nearest region following out-edges (GraphX
    // ShortestPaths with region landmarks).
    Op("graph_sssp",
      (s, dir) => GraphFixture(s, dir)
        .minHopsTo(col("label") === "region", 8).orderBy("id"),
      Some(withGraph(
        "SELECT id, MIN(d) AS dist FROM reach GROUP BY 1 ORDER BY 1",
        extra = """reach(id, d) AS (
          SELECT id, 0 FROM vertices WHERE label = 'region'
          UNION
          SELECT e.src, r.d + 1 FROM reach r
          JOIN edges e ON e.dst = r.id WHERE r.d < 8)""",
        recursive = true))),

    // Weighted SSSP from order #1 (Pregel; 'contains' weights = exact
    // Σ quantity, other edges weight 1). Path sums are fixed-order doubles,
    // min is order-independent ⇒ bit-exact vs the bounded-recursion oracle.
    Op("graph_wsssp",
      (s, dir) => GraphFixture(s, dir)
        .weightedSssp(col("id") === 6000000000001L).orderBy("id"),
      Some(withGraph(
        "SELECT id, MIN(d) AS dist FROM reach GROUP BY 1 ORDER BY 1",
        extra = """reach(id, d, h) AS (
          SELECT CAST(6000000000001 AS BIGINT), CAST(0 AS DOUBLE), 0
          UNION
          SELECT e.dst, r.d + COALESCE(e.weight, CAST(1 AS DOUBLE)), r.h + 1
          FROM reach r JOIN edges e ON e.src = r.id WHERE r.h < 6)""",
        recursive = true))),

    Op("graph_pagerank",
      (s, dir) => GraphFixture(s, dir).pageRank(5).orderBy("id"),
      Some(withGraph(
        "SELECT id, pr FROM p5 ORDER BY id",
        extra = GraphSql.prChain(5)))),

    // Katz centrality, 4 fixed iterations: counts α-attenuated bounded
    // walks INTO each vertex (no out-degree normalization — a hub with
    // many in-edges scores high even when its sources fan out widely,
    // the property that distinguishes Katz from PageRank). α=2^-2 keeps
    // every per-row multiply an exponent shift and every score a
    // multiple of 4^-4, so the unrolled DuckDB chain matches
    // bit-for-bit.
    Op("graph_katz",
      (s, dir) => GraphFixture(s, dir).katz(4).orderBy("id"),
      Some(withGraph(
        "SELECT id, katz FROM k4 ORDER BY id",
        extra = GraphSql.katzChain(4)))),

    // HITS hubs & authorities (Kleinberg), 3 fixed rounds in quantized
    // integer micro-units — the one classic centrality the family lacked
    // (r13 verdict ask #5). Every operation is exact BIGINT arithmetic
    // (order-free sums, floor-div max-normalization), so the unrolled
    // DuckDB chain matches bit-for-bit; see PropertyGraph.hits for the
    // per-round shuffle shape and the 100-TB overflow headroom argument.
    Op("graph_hits",
      (s, dir) => GraphFixture(s, dir).hits(3).orderBy("id"),
      Some(withGraph(
        "SELECT a.id, a.auth, h.hub FROM a3 a JOIN h3 h ON h.id = a.id ORDER BY a.id",
        extra = GraphSql.hitsChain(3)))),

    // Personalized PageRank from the CUSTOMER seed set — importance
    // relative to a query context (the recommendation variant of
    // pagerank). Customers have out-edges (in_nation, colocated), so the
    // 4 iterations genuinely propagate mass customer→nation→region and
    // customer→supplier→nation (a region seed set — pure sinks — would
    // test only the teleport base). Exact-decimal message sums; oracle is
    // the unrolled 4-step chain.
    Op("graph_ppr",
      (s, dir) => GraphFixture(s, dir)
        .personalizedPageRank(col("label") === "customer", 4)
        .orderBy("id"),
      Some(withGraph(
        "SELECT id, pr FROM pp4 ORDER BY id",
        extra = GraphSql.pprChain(4)))),

    Op("graph_triangles",
      (s, dir) => GraphFixture(s, dir).triangleCounts.orderBy("id"),
      Some(withGraph("""SELECT id, COUNT(*) AS n_tri FROM corners
        GROUP BY 1 ORDER BY 1""",
        extra = """und AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b FROM edges WHERE src <> dst),
          tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM und e1 JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
          corners AS (SELECT x AS id FROM tri
            UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)"""))),

    // Schema-flexible property access (SURVEY.md §1: dynamic props live in a
    // MAP<STRING,STRING> column): bundle attributes into a map, query via
    // element_at — the Blueprints property() accessor shape.
    Op("graph_props_map",
      (s, dir) => GraphFixture(s, dir).vertices
        .withColumn("props", map(
          lit("label"), col("label"), lit("name"), col("name"),
          lit("vis"), col("vis")))
        .filter(element_at(col("props"), "vis") === "secret")
        .select(col("id"), element_at(col("props"), "label").as("plabel"),
          element_at(col("props"), "name").as("pname"))
        .orderBy("id"),
      Some(withGraph("""SELECT id, label AS plabel, name AS pname
        FROM vertices WHERE vis = 'secret' ORDER BY id"""))),

    // PER-PROPERTY visibility (EzBake's cell-visibility model: labels guard
    // individual properties, not just whole elements). Properties live in a
    // MAP column with a parallel per-entry visibility MAP; the viewer's
    // clearance is applied with map_filter — a codegen'd per-row expression,
    // no join/shuffle — then exploded to rows for the hash compare (MAP
    // columns themselves have no cross-engine ordering). Fixture rule:
    // 'name' is secret on id%3=0, 'vis' on id%2=0, 'label' always public.
    Op("graph_prop_visibility",
      (s, dir) => {
        val v = GraphFixture(s, dir).vertices
          .filter(col("label").isin("customer", "supplier"))
        val withProps = v
          .withColumn("props", map(
            lit("label"), col("label"), lit("name"), col("name"),
            lit("vis"), col("vis")))
          .withColumn("pvis", map(
            lit("label"), lit("public"),
            lit("name"), when(col("id") % 3 === 0, "secret").otherwise("public"),
            lit("vis"), when(col("id") % 2 === 0, "secret").otherwise("public")))
        withProps
          .withColumn("vprops", map_filter(col("props"),
            (k, _) => element_at(col("pvis"), k) === "public"))
          .select(col("id"), explode(col("vprops")).as(Seq("k", "v")))
          .orderBy("id", "k")
      },
      Some(withGraph("""SELECT id, k, v FROM (
          SELECT id, 'label' AS k, label AS v FROM vertices
            WHERE label IN ('customer', 'supplier')
          UNION ALL
          SELECT id, 'name', name FROM vertices
            WHERE label IN ('customer', 'supplier') AND id % 3 <> 0
          UNION ALL
          SELECT id, 'vis', vis FROM vertices
            WHERE label IN ('customer', 'supplier') AND id % 2 <> 0
        ) p ORDER BY id, k"""))),

    // Boolean visibility EXPRESSIONS (the Accumulo-lineage cell-security
    // model: labels compose with & | and parens, evaluated against a
    // viewer's authorization set). The Spark side runs the real
    // recursive-descent evaluator (functions.VisibilityCheck, codegen'd);
    // the oracle hand-evaluates the four fixture expression shapes as
    // constants — so the parser is checked against ground truth on every
    // row. Viewer holds {public, internal}.
    Op("graph_vis_expr",
      (s, dir) => {
        GraftFunctions.register(s)
        GraphFixture(s, dir).vertices
          .filter(col("label").isin("customer", "supplier"))
          .withColumn("vis_expr", element_at(
            array(lit("public"), lit("public&internal"), lit("pii|admin"),
              lit("(pii&admin)|public")),
            (col("id") % 4 + 1).cast("int")))
          .withColumn("visible",
            expr("vis_check(vis_expr, 'public,internal')"))
          .select("id", "vis_expr", "visible")
          .orderBy("id")
      },
      Some(withGraph("""SELECT id,
          CASE CAST(id % 4 AS INTEGER)
            WHEN 0 THEN 'public' WHEN 1 THEN 'public&internal'
            WHEN 2 THEN 'pii|admin' ELSE '(pii&admin)|public' END AS vis_expr,
          CAST(id % 4 AS INTEGER) <> 2 AS visible
        FROM vertices WHERE label IN ('customer', 'supplier')
        ORDER BY id"""))),

    // Motif DSL: the colocated-triangle pattern with a has()-style property
    // filter — `find` compiles the pattern to joins (see PropertyGraph.find).
    Op("graph_motif",
      (s, dir) => GraphFixture(s, dir)
        .find("(c)-[:in_nation]->(n); (s)-[:in_nation]->(n); (c)-[:colocated]->(s)")
        .filter(col("c_val") > 5000)
        .select("c_id", "s_id", "n_id", "c_name", "s_name", "n_name")
        .orderBy("c_id", "s_id"),
      Some(withGraph("""SELECT e1.src AS c_id, e3.dst AS s_id, e1.dst AS n_id,
          c.name AS c_name, sv.name AS s_name, n.name AS n_name
        FROM edges e1
        JOIN edges e2 ON e2.label = 'in_nation' AND e2.dst = e1.dst
        JOIN edges e3 ON e3.label = 'colocated' AND e3.src = e1.src
          AND e3.dst = e2.src
        JOIN vertices c ON c.id = e1.src
        JOIN vertices sv ON sv.id = e3.dst
        JOIN vertices n ON n.id = e1.dst
        WHERE e1.label = 'in_nation' AND c.val > 5000
        ORDER BY c_id, s_id"""))),

    // Traversal-chain DSL (the Gremlin-style string front end the
    // Blueprints family is driven with): V().has().out().out().path()
    // parsed and compiled to the equivalent join tree (see graph.Traversal)
    // — the oracle is the hand-written SQL of that tree, so the parser and
    // compiler are certified end-to-end against ground truth.
    Op("graph_traversal_dsl",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9000).out('in_nation').out('in_region').path()")
        .orderBy("v0", "v1", "v2"),
      Some(withGraph("""SELECT c.id AS v0, e1.dst AS v1, e2.dst AS v2
        FROM vertices c
        JOIN edges e1 ON e1.src = c.id AND e1.label = 'in_nation'
        JOIN edges e2 ON e2.src = e1.dst AND e2.label = 'in_region'
        WHERE c.label = 'customer' AND c.val > 9000
        ORDER BY 1, 2, 3"""))),

    // as()/select()/where() — the cross-step pattern-matching steps a
    // Gremlin user writing anything beyond a linear chain hits first:
    // label walk positions (as), filter the head against an earlier
    // labeled position (where(neq('a')) — a codegen'd column-vs-column
    // filter over the walk matrix, no join), and project labeled positions
    // (select). The chain compiles to the same join tree graph_motif
    // builds by hand: customers sharing a colocated supplier, a ≠ b, one
    // row per (a, supplier, b) walk.
    Op("graph_traversal_select",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').as('a').out('colocated').as('s').in('colocated').as('b').where(neq('a')).select('a','b')")
        .orderBy("a", "b"),
      Some(withGraph("""SELECT e1.src AS a, e2.src AS b
        FROM vertices c
        JOIN edges e1 ON e1.src = c.id AND e1.label = 'colocated'
        JOIN edges e2 ON e2.dst = e1.dst AND e2.label = 'colocated'
        WHERE c.label = 'customer' AND e2.src <> c.id
        ORDER BY 1, 2"""))),

    // where() INSIDE a loop body (VERDICT r11 ask #5 — the walk-prefix
    // step the path-erasing folds cannot carry): a times()-bounded
    // repeat() unrolls TEXTUALLY onto the walk matrix, so the as('a')
    // label set before the loop stays addressable and each iteration's
    // where(neq('a')) is one codegen'd column-vs-column filter — no join,
    // no state (see Traversal.expandRepeats). The chain: each customer's
    // 2-hop undirected colocation walks, every intermediate head ≠ the
    // start (the neq inside the loop kills supplier→start bounce-backs),
    // final head > start (an ORDERING P predicate outside the loop, so
    // both comparator families are graded). Oracle = the unrolled 2-join
    // SQL with both predicates inlined.
    Op("graph_traversal_where",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').as('a').repeat(both('colocated').where(neq('a'))).times(2).where(gt('a')).path()")
        .orderBy("v0", "v1", "v2"),
      Some(withGraph("""SELECT c.id AS v0, u1.b AS v1, u2.b AS v2
        FROM vertices c
        JOIN u u1 ON u1.a = c.id
        JOIN u u2 ON u2.a = u1.b
        WHERE c.label = 'customer' AND u1.b <> c.id
          AND u2.b <> c.id AND u2.b > c.id
        ORDER BY 1, 2, 3""",
        extra = """u AS (SELECT src AS a, dst AS b FROM edges
            WHERE label = 'colocated'
          UNION ALL SELECT dst, src FROM edges WHERE label = 'colocated')"""))),

    // repeat(...).times(n) (Gremlin's bounded loop): two undirected
    // in_nation hops from each customer = its same-nation peers (customers
    // AND suppliers), simplePath() dropping the bounce-back. The parser
    // unrolls the repetition into the same flat join tree the fluent
    // repeat() builds — certified against the hand-written 2-hop SQL.
    Op("graph_traversal_repeat",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').repeat(both('in_nation')).times(2).simplePath().count()"),
      Some(withGraph("""SELECT COUNT(*) AS n_walks
        FROM vertices c
        JOIN u e1 ON e1.a = c.id
        JOIN u e2 ON e2.a = e1.b
        WHERE c.label = 'customer' AND e2.b <> c.id AND e2.b <> e1.a""",
        extra = """u AS (SELECT src AS a, dst AS b FROM edges
            WHERE label = 'in_nation'
          UNION ALL SELECT dst, src FROM edges WHERE label = 'in_nation')"""))),

    // sample(n) mid-chain (Gremlin's stream thinning, made deterministic:
    // md5-minimizing walks — see Traversal.sample): 20 of the
    // customer→nation walks, then one more hop to the region. The sample
    // runs BEFORE the second hop, so the oracle certifies both the draw
    // and that downstream steps compose with a sampled frame.
    Op("graph_traversal_sample",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').out('in_nation').sample(20).out('in_region').path()")
        .orderBy("v0", "v1", "v2"),
      Some(withGraph("""SELECT v0, v1, e2.dst AS v2 FROM (
          SELECT c.id AS v0, e1.dst AS v1
          FROM vertices c
          JOIN edges e1 ON e1.src = c.id AND e1.label = 'in_nation'
          WHERE c.label = 'customer'
          ORDER BY md5(v0 || '#' || v1), v0, v1 LIMIT 20) w
        JOIN edges e2 ON e2.src = w.v1 AND e2.label = 'in_region'
        ORDER BY 1, 2, 3"""))),

    // Reverse traversal + mid-chain has() + the ids() terminal fold:
    // members of every region's nations, restricted to visible vertices.
    Op("graph_traversal_ids",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='region').in('in_region').in('in_nation').has(vis='public').ids()")
        .orderBy("id"),
      Some(withGraph("""SELECT DISTINCT e2.src AS id
        FROM vertices r
        JOIN edges e1 ON e1.dst = r.id AND e1.label = 'in_region'
        JOIN edges e2 ON e2.dst = e1.src AND e2.label = 'in_nation'
        JOIN vertices m ON m.id = e2.src
        WHERE r.label = 'region' AND m.vis = 'public'
        ORDER BY 1"""))),

    // simplePath() + the count() terminal fold: colocation 2-walks
    // supplier→customer→supplier' that never revisit a vertex — the
    // walk-dedup semantics Gremlin chains lean on (without simplePath the
    // dominant "walk back over the same edge" term swamps the count).
    // simplePath compiles to ONE conjunctive codegen'd filter over the walk
    // columns — no join, no driver state.
    Op("graph_traversal_simple",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='supplier').both('colocated').simplePath().both('colocated').simplePath().count()"),
      Some(withGraph("""SELECT COUNT(*) AS n_walks FROM (
          SELECT sv.id AS v0, c1.b AS v1, c2.b AS v2
          FROM vertices sv
          JOIN co c1 ON c1.a = sv.id
          JOIN co c2 ON c2.a = c1.b
          WHERE sv.label = 'supplier') w
        WHERE v0 <> v1 AND v0 <> v2 AND v1 <> v2""",
        extra = """co AS (SELECT src AS a, dst AS b FROM edges
            WHERE label = 'colocated'
          UNION ALL SELECT dst, src FROM edges WHERE label = 'colocated')"""))),

    // not(branch) — Gremlin's negative filter (the walk-level complement
    // of has(): "customers with NO high-balance colocated supplier").
    // One walk-bounded LEFT ANTI join on the walk prefix; together with
    // the positive coverage set it partitions the start set, which the
    // spec pins. The oracle is the NOT EXISTS form a SQL engine plans to
    // the same anti-join.
    Op("graph_traversal_not",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').not(out('colocated').has(val>9500)).ids()")
        .orderBy("id"),
      Some(withGraph("""SELECT c.id FROM vertices c
        WHERE c.label = 'customer' AND NOT EXISTS (
          SELECT 1 FROM edges e JOIN vertices sv ON sv.id = e.dst
          WHERE e.src = c.id AND e.label = 'colocated' AND sv.val > 9500)
        ORDER BY c.id"""))),

    // and(b1, b2) / or(b1, b2) — the other two legs of TinkerPop's
    // logical-filter triple (not() above): conjunction = one walk-bounded
    // LEFT SEMI join per branch, disjunction = union-of-coverages then
    // ONE semi-join. Oracles are the equivalent EXISTS forms; the spec
    // pins the inclusion-exclusion identity |and| + |or| = |A| + |B|.
    Op("graph_traversal_and",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').and(out('colocated').has(val>3000), in('by').has(val>400000)).ids()")
        .orderBy("id"),
      Some(withGraph("""SELECT c.id FROM vertices c
        WHERE c.label = 'customer' AND EXISTS (
          SELECT 1 FROM edges e JOIN vertices sv ON sv.id = e.dst
          WHERE e.src = c.id AND e.label = 'colocated' AND sv.val > 3000)
        AND EXISTS (
          SELECT 1 FROM edges o JOIN vertices ov ON ov.id = o.src
          WHERE o.dst = c.id AND o.label = 'by' AND ov.val > 400000)
        ORDER BY c.id"""))),

    Op("graph_traversal_or",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').or(out('colocated').has(val>3000), in('by').has(val>400000)).ids()")
        .orderBy("id"),
      Some(withGraph("""SELECT c.id FROM vertices c
        WHERE c.label = 'customer' AND (EXISTS (
          SELECT 1 FROM edges e JOIN vertices sv ON sv.id = e.dst
          WHERE e.src = c.id AND e.label = 'colocated' AND sv.val > 3000)
        OR EXISTS (
          SELECT 1 FROM edges o JOIN vertices ov ON ov.id = o.src
          WHERE o.dst = c.id AND o.label = 'by' AND ov.val > 400000))
        ORDER BY c.id"""))),

    // aggregate('x') + where(without('x')) — TinkerPop's side-effect
    // collection step and its membership filter: collect the premium
    // customers into 'prem' at the chain start, walk to their colocated
    // suppliers and back to ALL customers sharing one, and keep the ones
    // NOT themselves premium — "similar-but-not-premium customers", the
    // lookalike-audience query. The collected set is a vertex-id frame;
    // the membership test is one ANTI join (within() is the SEMI twin,
    // exercised by spec) — vertex-bounded state, never walk-sized. The
    // oracle is the NOT IN form a SQL engine plans to the same anti-join.
    Op("graph_traversal_aggregate",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9500).aggregate('prem')" +
          ".out('colocated').in('colocated').where(without('prem')).ids()")
        .orderBy("id"),
      Some(withGraph("""SELECT DISTINCT e2.src AS id
        FROM vertices p
        JOIN edges e1 ON e1.src = p.id AND e1.label = 'colocated'
        JOIN edges e2 ON e2.dst = e1.dst AND e2.label = 'colocated'
        WHERE p.label = 'customer' AND p.val > 9500
          AND e2.src NOT IN (SELECT id FROM vertices
            WHERE label = 'customer' AND val > 9500)
        ORDER BY id"""))),

    // where(P.lt('a')).by('val') — the ATTRIBUTE-comparing where modulator
    // (TinkerPop's cross-step property predicate): customers whose account
    // balance is below some order's total price — the "order exceeds the
    // customer's balance" credit screen. Two narrow (id, val) projections
    // + one codegen'd column filter; the oracle is the equivalent theta
    // condition on the joined vertex attributes.
    Op("graph_traversal_where_by",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').as('a').out('by').where(lt('a')).by('val').ids()")
        .orderBy("id"),
      Some(withGraph("""SELECT DISTINCT e.dst AS id
        FROM vertices o
        JOIN edges e ON e.src = o.id AND e.label = 'by'
        JOIN vertices cv ON cv.id = e.dst
        WHERE o.label = 'order' AND cv.val < o.val
        ORDER BY id"""))),

    // tree() terminal — the walk set folded into its prefix tree, rendered
    // as weighted (depth, parent, child) edges (see Traversal.tree for why
    // the edge list IS the distributed form of TinkerPop's nested map).
    // customer→nation→region walks: level 1 has one row per inhabited
    // (customer, nation) pair, level 2 folds every customer's walks into
    // its nation's region edge — the n_walks multiplicities are the test.
    Op("graph_traversal_tree",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9000).out('in_nation').out('in_region').tree()")
        .orderBy("depth", "parent", "child"),
      Some(withGraph("""SELECT depth, parent, child, n_walks FROM (
          SELECT 1 AS depth, w.v0 AS parent, w.v1 AS child,
            COUNT(*) AS n_walks FROM w GROUP BY 2, 3
          UNION ALL
          SELECT 2 AS depth, w.v1, w.v2, COUNT(*) FROM w GROUP BY 2, 3) t
        ORDER BY depth, parent, child""",
        extra = """w AS (SELECT c.id AS v0, e1.dst AS v1, e2.dst AS v2
          FROM vertices c
          JOIN edges e1 ON e1.src = c.id AND e1.label = 'in_nation'
          JOIN edges e2 ON e2.src = e1.dst AND e2.label = 'in_region'
          WHERE c.label = 'customer' AND c.val > 9000)"""))),

    // cyclicPath() — simplePath()'s exact complement (Gremlin keeps the
    // walks that DO revisit a vertex: cycle detection, back-edge audits).
    // Same per-row codegen'd filter discipline, disjunction instead of
    // conjunction; over the same colocated 2-hop chain the two keys
    // partition the walk set, and this oracle asserts the cyclic half
    // walk-by-walk (the dominant shape here: v0→v1→v0 backtracks, one per
    // directed colocated incidence), not just by count.
    Op("graph_traversal_cyclic",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='supplier').both('colocated').both('colocated').cyclicPath().path()")
        .orderBy("v0", "v1", "v2"),
      Some(withGraph("""SELECT v0, v1, v2 FROM (
          SELECT sv.id AS v0, c1.b AS v1, c2.b AS v2
          FROM vertices sv
          JOIN co c1 ON c1.a = sv.id
          JOIN co c2 ON c2.a = c1.b
          WHERE sv.label = 'supplier') w
        WHERE v0 = v1 OR v0 = v2 OR v1 = v2
        ORDER BY v0, v1, v2""",
        extra = """co AS (SELECT src AS a, dst AS b FROM edges
            WHERE label = 'colocated'
          UNION ALL SELECT dst, src FROM edges WHERE label = 'colocated')"""))),

    // values() terminal: per-walk head-attribute stream (NOT deduped —
    // Gremlin's values() is a stream fold; multiplicity is part of the
    // answer and the oracle asserts it).
    Op("graph_traversal_values",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9000).out('in_nation').values('name')")
        .orderBy("name"),
      Some(withGraph("""SELECT n.name AS name
        FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'in_nation'
        JOIN vertices n ON n.id = e.dst
        WHERE c.label = 'customer' AND c.val > 9000
        ORDER BY 1"""))),

    // groupCount().by() terminal: walk histogram over a head attribute —
    // each customer's nation fans back out to everything in that nation,
    // and the fold counts surviving walks per end-vertex label. The
    // histogram is a map-side-combinable groupBy over the walk matrix
    // (label cardinality-sized result, never walk-sized).
    Op("graph_traversal_groupcount",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').out('in_nation').in('in_nation').groupCount().by('label')"),
      Some(withGraph("""SELECT m.label, COUNT(*) AS n_walks
        FROM vertices c
        JOIN edges e1 ON e1.src = c.id AND e1.label = 'in_nation'
        JOIN edges e2 ON e2.dst = e1.dst AND e2.label = 'in_nation'
        JOIN vertices m ON m.id = e2.src
        WHERE c.label = 'customer'
        GROUP BY 1 ORDER BY 1"""))),

    // EDGE-predicate step (Gremlin outE('l').has(...).inV() collapsed into
    // out('l', pred)): the weight filter lands on the edge scan BEFORE the
    // walk join, pruning fan-out at the source — the DSL twin of the raw
    // graph_out key, graded through the parser path.
    Op("graph_traversal_edgepred",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').out('contains', weight>30).values('name')")
        .orderBy("name"),
      Some(withGraph("""SELECT p.name AS name
        FROM vertices o
        JOIN edges e ON e.src = o.id AND e.label = 'contains'
        JOIN vertices p ON p.id = e.dst
        WHERE o.label = 'order' AND e.weight > 30
        ORDER BY 1"""))),

    // UNLABELED steps (Gremlin's bare in()/out()/both()): traverse every
    // edge label at once — the "what surrounds this element" browse query
    // a graph UI issues, where the label set is unknown up front. The
    // 2-hop label histogram of everything feeding into regions: the
    // unfiltered edge scan replaces the label-pruned one; the fold is
    // unchanged.
    Op("graph_traversal_unlabeled",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='region').in().in().groupCount().by('label')"),
      Some(withGraph("""SELECT m.label, COUNT(*) AS n_walks
        FROM vertices r
        JOIN edges e1 ON e1.dst = r.id
        JOIN edges e2 ON e2.dst = e1.src
        JOIN vertices m ON m.id = e2.src
        WHERE r.label = 'region'
        GROUP BY 1 ORDER BY 1"""))),

    // order().by().limit() terminal: the first 10 part names supplying any
    // supplier, by name. The fold compiles to TakeOrderedAndProject (per-
    // partition top-n heap + n-sized driver merge — no global sort), and
    // the sort key is extended with the walk prefix so the selected set is
    // deterministic across engines when names tie at the cut.
    Op("graph_traversal_order",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='supplier').in('supplied_by').order().by('name').limit(10)"),
      Some(withGraph("""SELECT p.name AS name
        FROM vertices s
        JOIN edges e ON e.dst = s.id AND e.label = 'supplied_by'
        JOIN vertices p ON p.id = e.src
        WHERE s.label = 'supplier'
        ORDER BY p.name, s.id, p.id LIMIT 10"""))),

    // order().by('attr', desc) — the DESCENDING modulator (Gremlin's
    // top-N-by-value shape, the common direction): the 10 highest
    // colocated-supplier balances reachable from customers. Same
    // TakeOrderedAndProject fold, sort key reversed, walk-prefix
    // tiebreak kept ascending in both engines.
    Op("graph_traversal_order_desc",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').out('colocated').order().by('val', desc).limit(10)"),
      Some(withGraph("""SELECT s2.val AS val
        FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'colocated'
        JOIN vertices s2 ON s2.id = e.dst
        WHERE c.label = 'customer'
        ORDER BY s2.val DESC, c.id, s2.id LIMIT 10"""))),

    // Gremlin sack() — the per-traverser accumulator: big orders'
    // quantities routed through the supply chain (order -contains->
    // part -supplied_by-> supplier), each walk carrying its contains
    // weight in the sack, folded per supplier at the terminal. The sack
    // is ONE walk-matrix column + a staged _lastw per adjacency step —
    // fully codegen'd adds, no joins beyond the traversal's own; the
    // fold's total is decimal-exact over per-walk fixed-order IEEE sums
    // (supplied_by is unweighted: NULL counts 0, so the second
    // accumulation is the documented +0.0 identity both engines share).
    Op("graph_traversal_sack",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').has(val>400000).withSack(0)" +
          ".out('contains').sack(sum).by('weight')" +
          ".out('supplied_by').sack(sum).by('weight').sack()"),
      Some(withGraph("""SELECT e2.dst AS id, COUNT(*) AS n_walks,
          CAST(CAST(SUM(CAST(e1.weight AS DECIMAL(38,10))) AS VARCHAR)
            AS DOUBLE) AS total_sack
        FROM vertices o
        JOIN edges e1 ON e1.src = o.id AND e1.label = 'contains'
        JOIN edges e2 ON e2.src = e1.dst AND e2.label = 'supplied_by'
        WHERE o.label = 'order' AND o.val > 400000
        GROUP BY e2.dst ORDER BY id"""))),

    // Gremlin range(lo, hi) — pagination of an ordered walk stream: page
    // two (positions 5..14) of colocated suppliers by balance. Plans as
    // an ordered limit-with-offset (hi-bounded heap), never a global
    // materialized sort; same walk-prefix tiebreak as the order keys, so
    // the PAGE BOUNDARY is deterministic when values tie at either cut.
    Op("graph_traversal_range",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').out('colocated').order().by('val', desc).range(5, 15)"),
      Some(withGraph("""SELECT s2.val AS val
        FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'colocated'
        JOIN vertices s2 ON s2.id = e.dst
        WHERE c.label = 'customer'
        ORDER BY s2.val DESC, c.id, s2.id LIMIT 10 OFFSET 5"""))),

    // Distributed minimum spanning forest — Borůvka on DataFrames (see
    // graph/Boruvka.scala for the algorithm narrative). The graded
    // instance is the cross-nation trade graph (25 vertices, ~300 edges:
    // revenue-weighted nation pairs — one fact shuffle builds it, dims
    // broadcast), small enough for the DuckDB oracle to replay Borůvka
    // UNROLLED (5 rounds × 5 pointer jumps of plain CTEs — a genuinely
    // different computation from the driver-looped Spark op); the
    // OPERATOR is generic and its scale behavior is probed on the 60k+
    // edge contains graph (ScaleBench) and independently recertified by
    // an in-memory Kruskal in GraphAlgoIndependenceSpec. Total edge order
    // (w, a, b) ⇒ the forest is unique, cross-engine.
    Op("graph_mst",
      (s, dir) => {
        Seq("lineitem", "orders", "customer", "supplier")
          .foreach(n => graft.Tables(s, dir, n).createOrReplaceTempView(n))
        graft.graph.Boruvka.msf(
          s.sql(mstPairsSql(e => s"CAST($e AS DOUBLE)")))
      },
      Some(mstOracleSql)),

    // STREAMING MSF MAINTENANCE — graph_mst's maintain twin: the spanning
    // forest kept current as trade slices arrive. Two-level state split
    // by what actually folds: per-pair weights are ORDER-FREE decimal
    // sums (each batch's rows aggregate map-side and merge into the
    // stored nations²-bounded pair relation), while the forest itself is
    // NOT incrementally foldable under weight UPDATES (a pair's weight
    // grows as its lineitems arrive, which can evict a previously-chosen
    // edge), so each batch re-runs Borůvka on the ~300-row pair relation
    // — at 100 TB that relation is still nations²-bounded, so the
    // recompute is metadata-cheap and the fact stream is touched exactly
    // once. (Under INSERT-only edge streams the classic sparsification
    // identity MSF(G ∪ E') = MSF(MSF(G) ∪ E') would fold the forest too;
    // weight-accumulating streams break its precondition — documented
    // trade, same family as stream_phash_maintain's uncapped-pair note.)
    // Order-free fold ⇒ the batch key's oracle IS this key's oracle.
    Op("stream_mst_maintain",
      (s, dir) => {
        val stage = graft.Staging.dir(s"mstm-src-${dir.hashCode.toHexString}")
        if (!new java.io.File(s"$stage/_SUCCESS").exists()) {
          Seq("lineitem", "orders", "customer", "supplier")
            .foreach(n => graft.Tables(s, dir, n).createOrReplaceTempView(n))
          s.sql("""SELECT LEAST(s_nationkey, c_nationkey) AS a,
              GREATEST(s_nationkey, c_nationkey) AS b,
              CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)) AS rev
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE s_nationkey <> c_nationkey""")
            .repartitionByRange(3, col("a"), col("b"))
            .write.mode("overwrite").parquet(stage)
        }
        def empty(ddl: String) = s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
        var pairW = empty("a INT, b INT, w DECIMAL(38,10)")
        var forest = empty("a INT, b INT, w DOUBLE")
        val q = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "a INT, b INT, rev DECIMAL(38,10)"))
          .option("maxFilesPerTrigger", 1).parquet(stage)
          .writeStream
          .option("checkpointLocation", graft.Staging.fresh("mstm-chk"))
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            GraphOps.mstMaintainBatches.incrementAndGet()
            val bAgg = batch.groupBy("a", "b")
              .agg(sum("rev").cast("decimal(38,10)").as("w"))
            pairW = graft.util.cut(pairW.unionByName(bAgg)
              .groupBy("a", "b")
              .agg(sum("w").cast("decimal(38,10)").as("w")))
            // localThreshold: the pair relation is nations²-bounded by
            // construction, so every per-batch recompute takes the
            // executor-local Kruskal path (unique forest ⇒ identical
            // output to the Borůvka rounds; Boruvka.msf scaladoc)
            forest = graft.util.cut(graft.graph.Boruvka.msf(
              pairW.select(col("a"), col("b"),
                col("w").cast("double").as("w")), localThreshold = 100000))
            ()
          }
          .start()
        q.processAllAvailable()
        q.stop()
        forest.orderBy("a", "b")
      },
      Some(mstOracleSql)),

    // Greedy maximal MATCHING on the cross-nation trade pairs (the MST
    // key's weighted instance): the locally-heaviest mutual-best BSP
    // (graft.graph.Matching — ½-approx of max-weight matching, unique
    // under the (w DESC, a, b) total order). The DuckDB oracle replays
    // the rounds UNROLLED (12 = ⌊25/2⌋ bounds the true count; converged
    // rounds see an empty edge set and emit nothing), so the match set,
    // weights AND round tags are exact cross-engine.
    Op("graph_matching",
      (s, dir) => {
        Seq("lineitem", "orders", "customer", "supplier")
          .foreach(n => graft.Tables(s, dir, n).createOrReplaceTempView(n))
        // cut at the call site: the BSP loop re-scans its input (round-1
        // nomination reads it twice via the doubled-half union), and this
        // input is a join pipeline, not a stored artifact — materialize
        // once here. (r16: the loop itself no longer cuts round 0, so
        // stored-artifact callers skip the copy.)
        graft.graph.Matching.greedy(graft.util.cut(
          s.sql(mstPairsSql(e => s"CAST($e AS DOUBLE)"))))
      },
      Some(matchingOracleSql)),

    // DENSEST SUBGRAPH (Charikar peel, parallel ε=1 form —
    // graft.graph.Densest): each round drops every vertex with
    // deg·n ≤ 4·e (all-integer test), the density-max snapshot wins.
    // Emits the full peel trajectory (r, n, e, is_best) — the trajectory
    // is the audit artifact AND gives the oracle a row per round to
    // verify, not just the argmax. The events star collapses in round 1
    // (degree-1 event vertices are always ≤ average), leaving the
    // order/part/customer core as the dense snapshot.
    Op("graph_densest",
      (s, dir) => graft.graph.Densest.peel(
        GraphFixture(s, dir).undirectedEdges),
      Some(densestOracleSql)),

    // VERTEX COVER 2-approximation — the endpoints of a MAXIMAL matching
    // (the Gavril/Yannakakis bound: any maximal matching's endpoint set
    // covers every edge and is ≤ 2·OPT, since OPT must hit each matched
    // edge separately). Runs the same mutual-best BSP as graph_matching
    // on the FULL undirected graph (weights constant ⇒ the nomination
    // order degrades to lexicographic (a, b)); the oracle replays all
    // rounds unrolled (13 at gate SF; 16 leaves slack — converged rounds
    // pass empty sets). Covering is the third classic graph-approximation
    // family after matching and densest-subgraph.
    Op("graph_vertex_cover",
      (s, dir) => {
        // localThreshold = what one task comfortably scans (16M edge
        // pairs ≈ 400 MB). Maximal matching's round count GROWS with
        // graph size on hub-and-chain graphs (measured decay ~10%/round:
        // sf0.1 needs ~40 rounds, 10× needs ~60 — each a full barrier
        // for work that shrinks toward metadata scale), so the BSP head
        // is worth paying only while the remainder exceeds one task's
        // scan; past that the sequential tail IS the scale-correct plan
        // (locally-greedy = globally-greedy, MatchingDensestSpec pins
        // hybrid ≡ BSP). graph_matching keeps threshold 0 so the round
        // loop itself stays exercised at every SF.
        val m = graft.graph.Matching.maximalMatching(
          GraphFixture(s, dir).undirectedEdges.withColumn("w", lit(1.0)),
          localThreshold = 16000000)
        m.select(col("a").as("id")).unionAll(m.select(col("b").as("id")))
          .distinct().orderBy("id")
      },
      Some(vertexCoverOracleSql)),

    // MAXIMAL INDEPENDENT SET — Luby's rounds with the vertex id as the
    // fixed priority (⇒ THE lexicographically-greedy MIS, unique and
    // exactly replayable). Canonical edges collapse the winner test to
    // one anti-join (graft.graph.Mis scaladoc); 3 rounds at gate SF —
    // the fixture's smallest ids are its biggest hubs, so neighborhoods
    // die fast. Completes the approximation trio with graph_matching
    // (edges) and graph_vertex_cover (their complement-flavored dual:
    // an MIS is exactly the complement of a minimal vertex cover).
    // localThreshold here is SMALLER than the cover's: MIS's round count
    // does NOT grow with graph size (≤ 4 id-priority rounds at every
    // measured scale), so the BSP stays optimal above one task's scan —
    // measured at the 10× probe: BSP 14.7 s vs sequential 27.1 s on 14M
    // edges, while at bench SF the sequential scan wins 2.6 vs 4.3 s.
    // The 2M threshold takes the minimum of the two paths at each scale
    // (the probe ratio is therefore a PATH-SWITCH artifact — base times
    // the sequential fast path, 10× the BSP — documented in SCALE.md).
    Op("graph_mis",
      (s, dir) => graft.graph.Mis.greedy(
        GraphFixture(s, dir).undirectedEdges, localThreshold = 2000000),
      Some(misOracleSql)),

    // GREEDY COLORING — iterated lexicographic MIS (color class k = the
    // id-priority MIS of what classes 1..k−1 left behind), ≡ sequential
    // greedy in ascending id order (graft.graph.Coloring scaladoc). The
    // fixture's layered id encoding converges in 3 colors (χ ≥ 3 — the
    // colocated triangles force it, so the greedy bound is TIGHT here).
    // Oracle: 5 layers × 4 MIS rounds unrolled, nested. Same adaptive
    // hybrid as the cover: sequential below one task's scan, BSP layers
    // above (equivalence pinned in spec).
    // The threshold is conf-overridable (like rootBatchBits) so the
    // like-for-like BSP/BSP scale probe can force the layered-MIS head
    // at every SF (ScaleBench coloringbsp).
    Op("graph_coloring",
      (s, dir) => graft.graph.Coloring.greedy(
        GraphFixture(s, dir).undirectedEdges,
        localThreshold = s.conf
          .getOption("graft.graph.coloringLocalThreshold")
          .map(_.toLong).getOrElse(16000000L)),
      Some(coloringOracleSql)),

    // Gremlin local(out().limit(k)) — per-traverser bounded expansion
    // (each big order continues along at most its 2 lowest-id parts):
    // the HUB GUARD for traversals at scale — a degree-10⁶ vertex emits
    // k continuations instead of 10⁶. One edge-relation-sized row_number
    // window, then a plain step join; deterministic by the order().by(id)
    // house reading of TinkerPop's order-undefined bare limit.
    Op("graph_traversal_local",
      (s, dir) => graft.util.sortAll(GraphFixture(s, dir).traverse(
        "V(label='order').has(val>400000).local(out('contains').limit(2)).path()")),
      Some(withGraph("""SELECT o.id AS v0, e.dst AS v1
        FROM vertices o
        JOIN (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
          FROM edges WHERE label = 'contains') e
          ON e.src = o.id AND e.rn <= 2
        WHERE o.label = 'order' AND o.val > 400000
        ORDER BY ALL"""))),

    // sack() composed WITH the local() hub guard — the bounded form of
    // graph_traversal_sack: both expansions capped per traverser, so the
    // traverser multiset is ≤ |starts|·2·3 by CONSTRUCTION however hot a
    // hub part gets. The uncapped key's hub-skew inflation is traverser-
    // multiset-linear (TinkerPop semantics — every walk exists); THIS
    // composition is what a user runs when the multiset itself is the
    // hazard. Skew-certified next to the uncapped key in SCALE.md.
    Op("graph_traversal_sack_local",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').has(val>400000).withSack(0)" +
          ".local(out('contains').limit(2)).sack(sum).by('weight')" +
          ".local(out('supplied_by').limit(3)).sack(sum).by('weight').sack()"),
      Some(withGraph("""SELECT e2.dst AS id, COUNT(*) AS n_walks,
          CAST(CAST(SUM(CAST(e1.weight AS DECIMAL(38,10))) AS VARCHAR)
            AS DOUBLE) AS total_sack
        FROM vertices o
        JOIN (SELECT src, dst, weight,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
          FROM edges WHERE label = 'contains') e1
          ON e1.src = o.id AND e1.rn <= 2
        JOIN (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
          FROM edges WHERE label = 'supplied_by') e2
          ON e2.src = e1.dst AND e2.rn <= 3
        WHERE o.label = 'order' AND o.val > 400000
        GROUP BY e2.dst ORDER BY id"""))),

    // Gremlin valueMap() — the full-property terminal: high-balance
    // members of each nation, every vertex property flattened to columns
    // (one row per surviving walk; the in_nation fan-in is 1, so heads
    // appear once — the sort-by-ALL-columns rule still applies on
    // principle, duplicate heads being duplicate rows).
    Op("graph_traversal_valuemap",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='nation').in('in_nation').has(val>9000).valueMap()"),
      Some(withGraph("""SELECT v.id, v.label, v.name, v.vis, v.val
        FROM vertices n
        JOIN edges e ON e.dst = n.id AND e.label = 'in_nation'
        JOIN vertices v ON v.id = e.src
        WHERE n.label = 'nation' AND v.val > 9000
        ORDER BY ALL"""))),

    // union() branch step (Gremlin's merge of parallel sub-traversals):
    // upper-balance customers' nations AND colocated suppliers (val>5000
    // keeps both branches non-empty at every fixture SF), folded
    // to a label histogram. Compiles to a UNION ALL of the two branch join
    // trees — each branch planned independently by Catalyst, the bulk
    // frame preserved through both (counts union + re-aggregate), so the
    // fold reads vertex-sized frames, never the walks.
    Op("graph_traversal_union",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>5000).union(out('in_nation'), out('colocated')).groupCount().by('label')"),
      Some(withGraph("""SELECT m.label, COUNT(*) AS n_walks FROM (
          SELECT e.dst FROM vertices c
          JOIN edges e ON e.src = c.id AND e.label = 'in_nation'
          WHERE c.label = 'customer' AND c.val > 5000
          UNION ALL
          SELECT e.dst FROM vertices c
          JOIN edges e ON e.src = c.id AND e.label = 'colocated'
          WHERE c.label = 'customer' AND c.val > 5000) w
        JOIN vertices m ON m.id = w.dst
        GROUP BY 1 ORDER BY 1"""))),

    // choose() branch step (per-walk if/then/else on a head predicate):
    // high-value orders route to their customer, the rest to their parts.
    // Sugar for union(has(p).b1, has(!p).b2) — two predicate-pruned branch
    // join trees under one UNION ALL.
    Op("graph_traversal_choose",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').choose(val>200000, out('by'), out('contains')).groupCount().by('label')"),
      Some(withGraph("""SELECT m.label, COUNT(*) AS n_walks FROM (
          SELECT e.dst FROM vertices o
          JOIN edges e ON e.src = o.id AND e.label = 'by'
          WHERE o.label = 'order' AND o.val > 200000
          UNION ALL
          SELECT e.dst FROM vertices o
          JOIN edges e ON e.src = o.id AND e.label = 'contains'
          WHERE o.label = 'order' AND NOT (o.val > 200000)) w
        JOIN vertices m ON m.id = w.dst
        GROUP BY 1 ORDER BY 1"""))),

    // repeat().until() loop step (Gremlin's condition-driven traversal
    // loop, with the times() guard TinkerPop composes with it): walks from
    // every order follow out() until the head is a region (first reached
    // at loop 3 via order→customer→nation), guard 3 — so the graded
    // output exercises BOTH loop exits: pred-stopped region walks AND the
    // supplier-detour walks the guard cuts off (which continue downstream,
    // matching TinkerPop). The fold is path-erasing: per-head (h, cnt)
    // frames through each level — one edge join + one vertex-predicate
    // split per loop, all vertex-sized (the var_hop flood shape with walk
    // multiplicities), never a walk matrix. The oracle unrolls the
    // identical stop/continue split per level.
    Op("graph_traversal_until",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').repeat(out()).until(label='region').times(3).groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, CAST(SUM(f.cnt) AS BIGINT) AS n_walks
          FROM folded f JOIN vertices v ON v.id = f.h
          GROUP BY 1 ORDER BY 1""",
        extra = """f0 AS (SELECT id AS h, CAST(1 AS BIGINT) AS cnt
            FROM vertices WHERE label = 'order'),
          n1 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM f0 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          s1 AS (SELECT n.h, n.cnt FROM n1 n JOIN vertices v ON v.id = n.h
            WHERE v.label = 'region'),
          c1 AS (SELECT n.h, n.cnt FROM n1 n JOIN vertices v ON v.id = n.h
            WHERE NOT v.label = 'region'),
          n2 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM c1 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          s2 AS (SELECT n.h, n.cnt FROM n2 n JOIN vertices v ON v.id = n.h
            WHERE v.label = 'region'),
          c2 AS (SELECT n.h, n.cnt FROM n2 n JOIN vertices v ON v.id = n.h
            WHERE NOT v.label = 'region'),
          n3 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM c2 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          s3 AS (SELECT n.h, n.cnt FROM n3 n JOIN vertices v ON v.id = n.h
            WHERE v.label = 'region'),
          c3 AS (SELECT n.h, n.cnt FROM n3 n JOIN vertices v ON v.id = n.h
            WHERE NOT v.label = 'region'),
          folded AS (SELECT h, SUM(cnt) AS cnt FROM (
            SELECT * FROM s1 UNION ALL SELECT * FROM s2
            UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM c3) em
            GROUP BY 1)"""))),

    // repeat().emit() loop step (emit after every iteration): per-depth
    // reachability from customers over bare out(), levels 1..3, folded to
    // a label histogram with exact walk multiplicities. Same path-erasing
    // (h, cnt) fold as until() minus the split; the oracle unrolls the
    // three levels and unions them.
    Op("graph_traversal_emit",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').repeat(out()).emit().times(3).groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, CAST(SUM(f.cnt) AS BIGINT) AS n_walks
          FROM folded f JOIN vertices v ON v.id = f.h
          GROUP BY 1 ORDER BY 1""",
        extra = """f0 AS (SELECT id AS h, CAST(1 AS BIGINT) AS cnt
            FROM vertices WHERE label = 'customer'),
          n1 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM f0 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          n2 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM n1 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          n3 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM n2 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          folded AS (SELECT h, SUM(cnt) AS cnt FROM (
            SELECT * FROM n1 UNION ALL SELECT * FROM n2
            UNION ALL SELECT * FROM n3) em GROUP BY 1)"""))),

    // emit().repeat() loop step — the PRE-emit placement TinkerPop users
    // reach for when the start position belongs in the result: emit fires
    // at the top of each iteration, so results span depths 0..3 (the
    // post-emit key above spans 1..3; with a bare times() guard the two
    // differ by exactly the depth-0 frame, and the oracle says so: same
    // unrolled levels plus f0 in the union).
    Op("graph_traversal_emit_pre",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').emit().repeat(out()).times(3).groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, CAST(SUM(f.cnt) AS BIGINT) AS n_walks
          FROM folded f JOIN vertices v ON v.id = f.h
          GROUP BY 1 ORDER BY 1""",
        extra = """f0 AS (SELECT id AS h, CAST(1 AS BIGINT) AS cnt
            FROM vertices WHERE label = 'customer'),
          n1 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM f0 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          n2 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM n1 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          n3 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM n2 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          folded AS (SELECT h, SUM(cnt) AS cnt FROM (
            SELECT * FROM f0 UNION ALL SELECT * FROM n1
            UNION ALL SELECT * FROM n2
            UNION ALL SELECT * FROM n3) em GROUP BY 1)"""))),

    // repeat().until().emit() — the combined loop form: region heads EXIT
    // the loop (until), and every position a still-looping walk passes
    // through is also released (emit). Per level the exit set ∪ continue
    // set is the whole post-body frame, so the oracle unions each level's
    // FULL frame while feeding only the non-region side forward — walks
    // contribute once per level reached, exits stop contributing past
    // their exit level (until fires before emit: no double release).
    Op("graph_traversal_until_emit",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').repeat(out()).until(label='region').emit().times(3).groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, CAST(SUM(f.cnt) AS BIGINT) AS n_walks
          FROM folded f JOIN vertices v ON v.id = f.h
          GROUP BY 1 ORDER BY 1""",
        extra = """f0 AS (SELECT id AS h, CAST(1 AS BIGINT) AS cnt
            FROM vertices WHERE label = 'order'),
          n1 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM f0 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          c1 AS (SELECT n.h, n.cnt FROM n1 n JOIN vertices v ON v.id = n.h
            WHERE NOT v.label = 'region'),
          n2 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM c1 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          c2 AS (SELECT n.h, n.cnt FROM n2 n JOIN vertices v ON v.id = n.h
            WHERE NOT v.label = 'region'),
          n3 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM c2 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          folded AS (SELECT h, SUM(cnt) AS cnt FROM (
            SELECT * FROM n1 UNION ALL SELECT * FROM n2
            UNION ALL SELECT * FROM n3) em GROUP BY 1)"""))),

    // emit(pred) — FILTERED emission: non-final depths release only
    // nation heads; the final depth exits via the times() guard before
    // the emit check and contributes everything (TinkerPop's check
    // order). The oracle filters the unrolled non-final levels and
    // unions the last whole.
    Op("graph_traversal_emit_pred",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').repeat(out()).emit(label='nation').times(3).groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, CAST(SUM(f.cnt) AS BIGINT) AS n_walks
          FROM folded f JOIN vertices v ON v.id = f.h
          GROUP BY 1 ORDER BY 1""",
        extra = """f0 AS (SELECT id AS h, CAST(1 AS BIGINT) AS cnt
            FROM vertices WHERE label = 'customer'),
          n1 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM f0 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          e1 AS (SELECT n.h, n.cnt FROM n1 n JOIN vertices v ON v.id = n.h
            WHERE v.label = 'nation'),
          n2 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM n1 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          e2 AS (SELECT n.h, n.cnt FROM n2 n JOIN vertices v ON v.id = n.h
            WHERE v.label = 'nation'),
          n3 AS (SELECT e.dst AS h, SUM(f.cnt) AS cnt FROM n2 f
            JOIN edges e ON e.src = f.h GROUP BY 1),
          folded AS (SELECT h, SUM(cnt) AS cnt FROM (
            SELECT * FROM e1 UNION ALL SELECT * FROM e2
            UNION ALL SELECT * FROM n3) em GROUP BY 1)"""))),

    // repeat().until().times(n).path() — the WALK-MATERIALIZING loop the
    // path-erasing folds refuse (VERDICT r9 "missing #3"): every
    // heterogeneous-length walk carries its full vertex array
    // (PropertyGraph.pathsUntil; live walks per level are cap-bounded
    // with a loud error — the (h,cnt) fold remains the scale path when
    // only head counts are consumed). High-value orders flood out()
    // until a region head, guard 3; both exits' walks are emitted with
    // their paths. Head-count equivalence with the fold is certified in
    // PropertyGraphSpec; the oracle unrolls the same stop/continue split
    // with list_append arrays.
    Op("graph_traversal_until_path",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').has(val>490000).repeat(out())" +
          ".until(label='region').times(3).path()")
        .select((size(col("path")) - 1).as("hops"),
          // House rule (SURVEY §5): no ARRAY-typed columns in registered
          // outputs — the driver's sort/hash grader can't sort array
          // cells. Same stringification as graph_paths (see :253).
          array_join(transform(col("path"), _.cast("string")), "->")
            .as("path"))
        // int leads the sort key (r11 verdict): comparing hops first
        // resolves most row pairs on a 4-byte compare instead of a
        // string prefix walk over '->'-joined id chains.
        .orderBy("hops", "path"),
      Some(withGraph(
        """SELECT CAST(len(path) - 1 AS INTEGER) AS hops,
            array_to_string(path, '->') AS path
          FROM allw ORDER BY len(path), path""",
        extra = """p0 AS (SELECT id, [id] AS path FROM vertices
            WHERE label = 'order' AND val > 490000),
          w1 AS (SELECT e.dst AS id, list_append(p.path, e.dst) AS path
            FROM p0 p JOIN edges e ON e.src = p.id),
          s1 AS (SELECT n.id, n.path FROM w1 n JOIN vertices v ON v.id = n.id
            WHERE v.label = 'region'),
          k1 AS (SELECT n.id, n.path FROM w1 n JOIN vertices v ON v.id = n.id
            WHERE NOT v.label = 'region'),
          w2 AS (SELECT e.dst AS id, list_append(p.path, e.dst) AS path
            FROM k1 p JOIN edges e ON e.src = p.id),
          s2 AS (SELECT n.id, n.path FROM w2 n JOIN vertices v ON v.id = n.id
            WHERE v.label = 'region'),
          k2 AS (SELECT n.id, n.path FROM w2 n JOIN vertices v ON v.id = n.id
            WHERE NOT v.label = 'region'),
          w3 AS (SELECT e.dst AS id, list_append(p.path, e.dst) AS path
            FROM k2 p JOIN edges e ON e.src = p.id),
          s3 AS (SELECT n.id, n.path FROM w3 n JOIN vertices v ON v.id = n.id
            WHERE v.label = 'region'),
          k3 AS (SELECT n.id, n.path FROM w3 n JOIN vertices v ON v.id = n.id
            WHERE NOT v.label = 'region'),
          allw AS (SELECT path FROM s1 UNION ALL SELECT path FROM s2
            UNION ALL SELECT path FROM s3 UNION ALL SELECT path FROM k3)"""))),

    // where() INSIDE a path-ERASING loop (the r12 traversal-surface gap):
    // `as('a').repeat(both().where(neq('a'))).until(...)` — every step
    // must avoid returning to the walk's start. The (h, cnt) fold cannot
    // express it (the fold erased the prefix where() reads), so the parser
    // routes the chain through the walk-matrix pathsUntil machinery and
    // where()/simplePath() compile to a per-level codegen'd filter on the
    // walk array (stepFilter — no join, no state beyond the walk itself).
    // both() from a high-value order returns to its start at level 2 via
    // BOTH branches (customer's 'by' edges and part's 'contains' edges),
    // so the predicate prunes real mass. The oracle unrolls the same
    // step/filter/stop split with list arrays; fold-equivalence on a
    // where-free chain is certified in PropertyGraphSpec.
    Op("graph_traversal_until_where",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').has(val>499500).as('a')" +
          ".repeat(both().where(neq('a')))" +
          ".until(label='nation').times(2).path()")
        .select((size(col("path")) - 1).as("hops"),
          array_join(transform(col("path"), _.cast("string")), "->")
            .as("path"))
        .orderBy("hops", "path"),
      Some(withGraph(
        """SELECT CAST(len(path) - 1 AS INTEGER) AS hops,
            array_to_string(path, '->') AS path
          FROM allw ORDER BY len(path), path""",
        extra = """und AS (SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges),
          p0 AS (SELECT id, [id] AS path FROM vertices
            WHERE label = 'order' AND val > 499500),
          w1 AS (SELECT e.dst AS id, list_append(p.path, e.dst) AS path
            FROM p0 p JOIN und e ON e.src = p.id WHERE e.dst <> p.path[1]),
          s1 AS (SELECT n.id, n.path FROM w1 n JOIN vertices v ON v.id = n.id
            WHERE v.label = 'nation'),
          k1 AS (SELECT n.id, n.path FROM w1 n JOIN vertices v ON v.id = n.id
            WHERE NOT v.label = 'nation'),
          w2 AS (SELECT e.dst AS id, list_append(p.path, e.dst) AS path
            FROM k1 p JOIN und e ON e.src = p.id WHERE e.dst <> p.path[1]),
          s2 AS (SELECT n.id, n.path FROM w2 n JOIN vertices v ON v.id = n.id
            WHERE v.label = 'nation'),
          k2 AS (SELECT n.id, n.path FROM w2 n JOIN vertices v ON v.id = n.id
            WHERE NOT v.label = 'nation'),
          allw AS (SELECT path FROM s1 UNION ALL SELECT path FROM s2
            UNION ALL SELECT path FROM k2)"""))),

    // The COMBINED loop with an in-body where(): until().emit() releases
    // every post-body position (exits AND continuing walks) while the
    // where(neq('a')) prunes steps returning to the walk's start — the
    // emit-side half of the r12 where-in-loop gap. Walk route with
    // emitEachLevel; the oracle is simply w1 ∪ w2 (every filter-surviving
    // stepped walk is released; only non-stopped ones step again).
    Op("graph_traversal_until_emit_where",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').has(val>499500).as('a')" +
          ".repeat(both().where(neq('a')))" +
          ".until(label='nation').emit().times(2).path()")
        .select((size(col("path")) - 1).as("hops"),
          array_join(transform(col("path"), _.cast("string")), "->")
            .as("path"))
        .orderBy("hops", "path"),
      Some(withGraph(
        """SELECT CAST(len(path) - 1 AS INTEGER) AS hops,
            array_to_string(path, '->') AS path
          FROM allw ORDER BY len(path), path""",
        extra = """und AS (SELECT src, dst FROM edges
            UNION ALL SELECT dst, src FROM edges),
          p0 AS (SELECT id, [id] AS path FROM vertices
            WHERE label = 'order' AND val > 499500),
          w1 AS (SELECT e.dst AS id, list_append(p.path, e.dst) AS path
            FROM p0 p JOIN und e ON e.src = p.id WHERE e.dst <> p.path[1]),
          k1 AS (SELECT n.id, n.path FROM w1 n JOIN vertices v ON v.id = n.id
            WHERE NOT v.label = 'nation'),
          w2 AS (SELECT e.dst AS id, list_append(p.path, e.dst) AS path
            FROM k1 p JOIN und e ON e.src = p.id WHERE e.dst <> p.path[1]),
          allw AS (SELECT path FROM w1 UNION ALL SELECT path FROM w2)"""))),

    // Gremlin match() — TinkerPop's declarative pattern step, the last
    // traversal-surface gap named by the r12 verdict: edge clauses +
    // per-variable has() constraints, compiled onto PropertyGraph.find
    // (the stats-greedy motif joiner), V-set bound to the first clause's
    // start label. The pattern: a high-balance customer colocated with a
    // positive-balance supplier in the SAME nation — the shared-nation
    // triangle with both a start-binding filter and an in-pattern has().
    Op("graph_traversal_match",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>8000).match(" +
          "as('c').out('colocated').as('s'), " +
          "as('s').out('in_nation').as('n'), " +
          "as('c').out('in_nation').as('n'), " +
          "as('s').has(val>0)).select('c','s','n')")
        .orderBy("c", "s", "n"),
      Some(withGraph("""SELECT c.id AS c, e1.dst AS s, e2.dst AS n
        FROM vertices c
        JOIN edges e1 ON e1.src = c.id AND e1.label = 'colocated'
        JOIN edges e2 ON e2.src = e1.dst AND e2.label = 'in_nation'
        JOIN edges e3 ON e3.src = c.id AND e3.label = 'in_nation'
          AND e3.dst = e2.dst
        JOIN vertices sv ON sv.id = e1.dst
        WHERE c.label = 'customer' AND c.val > 8000 AND sv.val > 0
        ORDER BY 1, 2, 3"""))),

    // project() terminal (multi-field projection with attribute by()
    // modulators, one column per key): high-balance customers' nation
    // name + visibility, one row per walk. One vertex join feeds every
    // projected column.
    Op("graph_traversal_project",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9000).out('in_nation')" +
          ".project('nname','nvis').by('name').by('vis')")
        .orderBy("nname", "nvis"),
      Some(withGraph("""SELECT n.name AS nname, n.vis AS nvis
        FROM vertices c JOIN edges e ON e.src = c.id AND e.label = 'in_nation'
        JOIN vertices n ON n.id = e.dst
        WHERE c.label = 'customer' AND c.val > 9000
        ORDER BY 1, 2"""))),

    // group().by(k).by(v) terminal (the grouped fold): buyers of
    // high-value orders, keyed by visibility, values the SORTED name
    // multiset (walk multiplicities preserved — a customer with two
    // qualifying orders appears twice). Vertex-sized until the final
    // collect; the collection size is the user's own result.
    Op("graph_traversal_group",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').has(val>480000).out('by').group().by('vis').by('name')")
        // Graded rendering: the grouped fold stays an ARRAY in the fluent
        // API, but the gate comparator row-sorts by every column, so the
        // collection is emitted as its canonical joined string (the
        // agg_collect convention).
        .withColumn("vals", concat_ws(",", col("vals"))),
      Some(withGraph("""SELECT c.vis AS vis,
        array_to_string(list_sort(list(c.name)), ',') AS vals
        FROM vertices o JOIN edges e ON e.src = o.id AND e.label = 'by'
        JOIN vertices c ON c.id = e.dst
        WHERE o.label = 'order' AND o.val > 480000
        GROUP BY 1 ORDER BY 1"""))),

    // optional() branch step (branch results when any, else stay): each
    // high-balance customer routes to its well-capitalized colocated
    // suppliers when it has any, otherwise remains at itself — so the
    // label histogram shows BOTH populations. Coverage is one anti-join
    // on the walk prefix (walk-bounded), same discipline as coalesce().
    Op("graph_traversal_optional",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>5000)" +
          ".optional(out('colocated').has(val>0)).groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, COUNT(*) AS n_walks FROM (
          SELECT e.dst AS h FROM vertices c
          JOIN edges e ON e.src = c.id AND e.label = 'colocated'
          JOIN vertices s2 ON s2.id = e.dst
          WHERE c.label = 'customer' AND c.val > 5000 AND s2.val > 0
          UNION ALL
          SELECT c.id FROM vertices c
          WHERE c.label = 'customer' AND c.val > 5000 AND NOT EXISTS (
            SELECT 1 FROM edges x JOIN vertices s3 ON s3.id = x.dst
            WHERE x.src = c.id AND x.label = 'colocated' AND s3.val > 0)) w
        JOIN vertices v ON v.id = w.h
        GROUP BY 1 ORDER BY 1"""))),

    // ——— edge-granular traversal steps (outE/inE/bothE + inV/outV/otherV):
    // the EDGE is the traverser, so edge-property predicates apply
    // mid-walk without sack() workarounds. Each is one edge equi-join +
    // a codegen'd filter + a projection — no shuffle beyond what the
    // collapsed out(l, epred) form pays (see Traversal.stepEdge).

    // outE().has(edge).inV(): big orders' heavy line items — the edge
    // filter (contains.weight = summed quantity) prunes the fan-out on
    // the edge scan, mid-walk.
    Op("graph_traversal_oute",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='order').has(val>400000).outE('contains').has(weight>40)" +
          ".inV().groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, COUNT(*) AS n_walks
        FROM vertices o
        JOIN edges e ON e.src = o.id AND e.label = 'contains'
          AND e.weight > 40
        JOIN vertices v ON v.id = e.dst
        WHERE o.label = 'order' AND o.val > 400000
        GROUP BY 1 ORDER BY 1"""))),

    // inE().has(edge).outV(): who reaches a nation over a secret edge —
    // the in-edge traverser with an edge-visibility filter, resolved at
    // the tail vertex.
    Op("graph_traversal_ine",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='nation').inE('in_nation').has(vis='secret').outV()" +
          ".groupCount().by('label')"),
      Some(withGraph("""SELECT v.label, COUNT(*) AS n_walks
        FROM vertices n
        JOIN edges e ON e.dst = n.id AND e.label = 'in_nation'
          AND e.vis = 'secret'
        JOIN vertices v ON v.id = e.src
        WHERE n.label = 'nation'
        GROUP BY 1 ORDER BY 1"""))),

    // bothE().has(edge).otherV(): the undirected edge walk — secret
    // parties traverse their public colocation edges from EITHER side
    // and continue at the opposite endpoint (customers hit the src half,
    // suppliers the dst half — both directions of bothE exercised in one
    // key).
    Op("graph_traversal_bothe_otherv",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(vis='secret').bothE('colocated').has(vis='public').otherV()" +
          ".groupCount().by('label')"),
      Some(withGraph("""SELECT w.label, COUNT(*) AS n_walks
        FROM vertices s
        JOIN edges e ON (e.src = s.id OR e.dst = s.id)
          AND e.label = 'colocated' AND e.vis = 'public'
        JOIN vertices w
          ON w.id = CASE WHEN e.src = s.id THEN e.dst ELSE e.src END
        WHERE s.vis = 'secret'
        GROUP BY 1 ORDER BY 1"""))),

    // dedup() as a GRADED step: overlapping union branches duplicate
    // walks (every public colocation arrives via both branches);
    // dedup() collapses the walk multiset to distinct paths — one
    // walk-bounded distinct — before the count fold.
    Op("graph_traversal_dedup",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9000)" +
          ".union(out('colocated'), out('colocated', vis='public'))" +
          ".dedup().count()"),
      Some(withGraph("""SELECT COUNT(*) AS n_walks FROM (
        SELECT DISTINCT c.id, e.dst FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'colocated'
        WHERE c.label = 'customer' AND c.val > 9000) z"""))),

    // path().by('attr') modulator (walk rendered through an attribute):
    // top-balance customers' full membership chain by NAME —
    // customer→nation→region as (p0, p1, p2). One narrow vertex
    // projection join per position.
    Op("graph_traversal_path_by",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9900).out('in_nation').out('in_region')" +
          ".path().by('name')")
        .orderBy("p0", "p1", "p2"),
      Some(withGraph("""SELECT c.name AS p0, n.name AS p1, r.name AS p2
        FROM vertices c
        JOIN edges e1 ON e1.src = c.id AND e1.label = 'in_nation'
        JOIN vertices n ON n.id = e1.dst
        JOIN edges e2 ON e2.src = n.id AND e2.label = 'in_region'
        JOIN vertices r ON r.id = e2.dst
        WHERE c.label = 'customer' AND c.val > 9900
        ORDER BY 1, 2, 3"""))),

    // coin(p) — Gremlin's per-traverser Bernoulli filter, made
    // DETERMINISTIC: keep a walk iff the 60-bit md5 of its columns mod
    // 10⁶ clears the ppm threshold (the RNG coin is un-oracle-able; the
    // hash draw is uniform on the walk population and replays exactly).
    // Per-row codegen'd filter — no joins, no state; the thinning step
    // a sampled analytics pass puts mid-chain.
    Op("graph_traversal_coin",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').out('colocated').coin(250000).count()"),
      Some(withGraph(s"""SELECT COUNT(*) AS n_walks FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'colocated'
        WHERE c.label = 'customer'
          AND ${textsql.duckHash60(
            "CAST(c.id AS VARCHAR) || '#' || CAST(e.dst AS VARCHAR)")}
            % 1000000 < 250000"""))),

    // path().from('a').to('b') — the sub-path projection between two
    // labeled steps: render only the nation→region tail of the
    // customer walk. Pure column selection over the walk matrix
    // (labels are column indexes); nothing executes beyond the walk.
    Op("graph_traversal_path_fromto",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').has(val>9900).as('a').out('in_nation')" +
          ".as('b').out('in_region').as('c').path().from('b').to('c')")
        .orderBy("p0", "p1"),
      Some(withGraph("""SELECT e1.dst AS p0, e2.dst AS p1
        FROM vertices c
        JOIN edges e1 ON e1.src = c.id AND e1.label = 'in_nation'
        JOIN edges e2 ON e2.src = e1.dst AND e2.label = 'in_region'
        WHERE c.label = 'customer' AND c.val > 9900
        ORDER BY 1, 2"""))),

    // coalesce() branch step (first branch with results, per walk): each
    // customer's colocated suppliers when any exist, else its nation —
    // the optional-with-fallback pattern. Later branches anti-join the
    // covered walk-prefix set (walk-bounded, never vertex×vertex).
    Op("graph_traversal_coalesce",
      (s, dir) => GraphFixture(s, dir).traverse(
        "V(label='customer').coalesce(out('colocated'), out('in_nation'))")
        .orderBy("v0", "v1"),
      Some(withGraph("""SELECT c.id AS v0, e.dst AS v1 FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'colocated'
        WHERE c.label = 'customer'
        UNION ALL
        SELECT c.id, e.dst FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'in_nation'
        WHERE c.label = 'customer' AND NOT EXISTS (
          SELECT 1 FROM edges x
          WHERE x.src = c.id AND x.label = 'colocated')
        ORDER BY 1, 2"""))),

    // Batch CRUD (Blueprints mutation surface re-expressed as dataflow —
    // BASELINE.json scopes OLTP mutation out; writes are new DF versions):
    // UPDATE secret customers (+100 balance), DELETE every 7th supplier
    // (edges cascade via semi-joins), INSERT one auditor vertex per region.
    Op("graph_upsert",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val auditors = graft.Tables(s, dir, "region").select(
          (lit(9 * GraphFixture.B) + col("r_regionkey")).as("id"),
          lit("auditor").as("label"),
          concat(lit("audit_"), col("r_name")).as("name"),
          lit("public").as("vis"), lit(0.5).as("val"))
        val v2 = g.vertices
          .withColumn("val",
            when(col("label") === "customer" && col("vis") === "secret",
              col("val") + 100.0).otherwise(col("val")))
          .filter(!(col("label") === "supplier" && col("id") % 7 === 0))
          .unionAll(auditors)
        val g2 = graft.graph.PropertyGraph(v2, g.edges)
          .subgraph(lit(true)) // cascade: drop edges touching deleted vertices
        g2.vertices.groupBy("label")
          .agg(count(lit(1)).as("n"),
            graft.num.dsum(coalesce(col("val"), lit(0.0))).as("sum_val"))
          .withColumn("kind", lit("vertex"))
          .unionByName(g2.edges.groupBy("label")
            .agg(count(lit(1)).as("n"), lit(0.0).as("sum_val"))
            .withColumn("kind", lit("edge")))
          .select("kind", "label", "n", "sum_val")
          .orderBy("kind", "label")
      },
      Some(withGraph(
        s"""SELECT 'vertex' AS kind, label, COUNT(*) AS n,
          ${graft.num.DSUM("COALESCE(val, 0)")} AS sum_val
        FROM v2 GROUP BY 2
        UNION ALL
        SELECT 'edge', e.label, COUNT(*), CAST(0 AS DOUBLE) FROM edges e
        JOIN v2 a ON a.id = e.src JOIN v2 b ON b.id = e.dst GROUP BY 2
        ORDER BY kind, label""",
        extra = """v2 AS MATERIALIZED (
          SELECT id, label, name, vis,
            CASE WHEN label = 'customer' AND vis = 'secret'
              THEN val + 100.0 ELSE val END AS val
          FROM vertices
          WHERE NOT (label = 'supplier' AND id % 7 = 0)
          UNION ALL
          SELECT 9000000000000 + r_regionkey, 'auditor',
            'audit_' || r_name, 'public', CAST(0.5 AS DOUBLE) FROM region)"""))),

    // Per-root ECCENTRICITY within a hop budget (the diameter diagnostic a
    // graph deployment runs before choosing traversal/unroll depths — the
    // r8 betweenness fix started from exactly this measurement: region
    // roots see eccentricity 6 on this fixture, so a depth-5 unroll
    // truncates). Multi-source BFS over the simple undirected graph with
    // HUB-COMPRESSED BITMAP FRONTIERS (r13): one row per frontier VERTEX
    // carrying a BIGINT bitmap of the roots that just reached it, not one
    // row per (root, vertex) — so a degree-D hub in R roots' frontiers is
    // expanded ONCE (D join rows, bit_or-merged) instead of R times
    // (the 2.0× skew lean SCALE.md attributes to frontier densification).
    // Visited state is a per-vertex cumulative bitmap; "new for root r"
    // is one AND-NOT, replacing the per-root NOT EXISTS anti-join. Levels
    // are stored lineage-cut views (the betweenness chain's proven shape:
    // a naive cumulative-visited DataFrame loop re-materializes O(levels²)
    // and measured 15+ s at sf0.1). Root batch ≤ 60 bits per BIGINT; a
    // larger sampled seed set runs independent batches. Emits (root, ecc,
    // n_ball) where n_ball counts the root's ≤8-hop closed ball; BFS
    // first-visit IS min-hop, so the bitmap loop and the oracle's
    // MIN(d)-per-pair recursion agree exactly.
    Op("graph_eccentricity",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        g.edges.createOrReplaceTempView("g_edges")
        g.vertices.createOrReplaceTempView("g_vertices")
        val und = graft.Views.checkpointed(s, dir, "ecc_und",
          """SELECT src AS a, dst AS b FROM g_edges WHERE src <> dst
             UNION SELECT dst, src FROM g_edges WHERE src <> dst""")
        // Seed-set collection is driver-metadata-scale by contract.
        val roots = s.sql(
          "SELECT id FROM g_vertices WHERE label = 'region' ORDER BY id")
          .collect().map(_.getLong(0))
        require(roots.nonEmpty, "no region roots")
        // ⌈R/width⌉ independent bitmap batches (width ≤ 60 bits per
        // BIGINT): root sets are disjoint, so per-root rows just union.
        // The conf knob exists so a spec can force multi-batch on the
        // 5-root fixture; a 10×+ replica blow-up (R = 5k) engages it for
        // real — the pre-r13 require(R ≤ 60) made those runs throw.
        val width = math.min(60, math.max(1,
          s.conf.getOption("graft.graph.rootBatchBits")
            .map(_.toInt).getOrElse(60)))
        val parts = roots.grouped(width).toSeq.zipWithIndex.map {
          case (batch, bi) => eccBatch(s, dir, und, batch, s"${width}x$bi")
        }
        s.sql(parts.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY id"))
      },
      Some(withGraph(
        """SELECT root AS id, CAST(MAX(d) AS BIGINT) AS ecc,
          COUNT(*) AS n_ball
        FROM (SELECT root, id, MIN(d) AS d FROM reach GROUP BY 1, 2) m
        GROUP BY 1 ORDER BY 1""",
        extra = """und AS (SELECT src AS a, dst AS b FROM edges WHERE src <> dst
            UNION SELECT dst, src FROM edges WHERE src <> dst),
          reach(root, id, d) AS (
            SELECT id, id, 0 FROM vertices WHERE label = 'region'
            UNION
            SELECT r.root, u.b, r.d + 1 FROM reach r
            JOIN und u ON u.a = r.id WHERE r.d < 8)""",
        recursive = true))),

    // The METHOD-CHAINED batch mutation API (Blueprints addVertex/addEdge/
    // removeVertex/setProperty as dataflow — PropertyGraph.addVertices/
    // addEdges/removeVertices/removeEdges/setVal, each returning a new
    // graph version): one chain exercising every op incl. the last-wins
    // upsert path (region #0's row replaced with name 'HQ'), edge cascade
    // on vertex removal (events take their 'did' edges with them), and a
    // predicate property update. The audited summary proves each effect:
    // per-label counts, exact-decimal val sums, min name (shows HQ
    // replacing AFRICA shifts the region min to AMERICA).
    Op("graph_mutation_api",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val B = GraphFixture.B
        val aud = graft.Tables(s, dir, "region").select(
          (lit(9 * B) + col("r_regionkey")).as("id"),
          lit("auditor").as("label"),
          concat(lit("audit_"), col("r_name")).as("name"),
          lit("public").as("vis"), lit(0.5).as("val"))
        val hq = g.vertices.filter(col("id") === B)
          .withColumn("name", lit("HQ"))
        val audits = graft.Tables(s, dir, "region").select(
          (lit(9 * B) + col("r_regionkey")).as("src"),
          (lit(B) + col("r_regionkey")).as("dst"),
          lit("audits").as("label"),
          lit(null).cast("double").as("weight"), lit("public").as("vis"))
        val g2 = g.addVertices(aud.unionByName(hq))
          .addEdges(audits)
          .removeVertices(col("label") === "event")
          .removeEdges(col("label") === "colocated")
          .setVal(col("label") === "order" && col("val") > 200000, lit(0.0))
        g2.vertices.groupBy("label")
          .agg(count(lit(1)).as("n"),
            graft.num.dsum(coalesce(col("val"), lit(0.0))).as("sum_val"),
            min("name").as("min_name"))
          .withColumn("kind", lit("vertex"))
          .unionByName(g2.edges.groupBy("label")
            .agg(count(lit(1)).as("n"), lit(0.0).as("sum_val"),
              lit("").as("min_name"))
            .withColumn("kind", lit("edge")))
          .select("kind", "label", "n", "sum_val", "min_name")
          .orderBy("kind", "label")
      },
      Some(withGraph(
        s"""SELECT 'vertex' AS kind, label, COUNT(*) AS n,
          ${graft.num.DSUM("COALESCE(val, 0)")} AS sum_val,
          MIN(name) AS min_name
        FROM v2 GROUP BY 2
        UNION ALL
        SELECT 'edge', label, COUNT(*), CAST(0 AS DOUBLE), '' FROM e2 GROUP BY 2
        ORDER BY kind, label""",
        extra = """v2 AS MATERIALIZED (
          SELECT id, label,
            CASE WHEN id = 1000000000000 THEN 'HQ' ELSE name END AS name, vis,
            CASE WHEN label = 'order' AND val > 200000
              THEN CAST(0.0 AS DOUBLE) ELSE val END AS val
          FROM vertices WHERE label <> 'event'
          UNION ALL
          SELECT 9000000000000 + r_regionkey, 'auditor',
            'audit_' || r_name, 'public', CAST(0.5 AS DOUBLE) FROM region),
          e2 AS (SELECT e.src, e.dst, e.label FROM edges e
            JOIN v2 a ON a.id = e.src JOIN v2 b ON b.id = e.dst
            WHERE e.label <> 'colocated'
          UNION ALL
          SELECT 9000000000000 + r_regionkey, 1000000000000 + r_regionkey,
            'audits' FROM region)"""))),

    // Bulk export (the GraphML/GraphSON-writer surface of the Blueprints
    // family, re-expressed as partitioned columnar sinks): the whole graph
    // written label-partitioned — downstream consumers read single labels
    // with directory-level pruning — then read back and summarized with
    // exact sums, so the oracle certifies round-trip fidelity of every
    // element and weight.
    Op("graph_export",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val out = graft.Staging.fresh("graph-export")
        // Cluster the data by the partition column before the partitioned
        // write: without it every task holds every label and the sink emits
        // tasks × labels small files (256 here — file-commit overhead was
        // this key's round-4 variance source). Hash-clustering on label
        // yields ≤ one file per label locally; at 100 TB add a salt bucket
        // to the repartition keys to split hot labels across writers.
        g.vertices.repartition(col("label")).write.mode("overwrite")
          .partitionBy("label").parquet(s"$out/vertices")
        g.edges.repartition(col("label")).write.mode("overwrite")
          .partitionBy("label").parquet(s"$out/edges")
        val v = s.read.parquet(s"$out/vertices")
        val e = s.read.parquet(s"$out/edges")
        v.groupBy("label")
          .agg(count(lit(1)).as("n"),
            graft.num.dsum(coalesce(col("val"), lit(0.0))).as("sum_val"))
          .withColumn("kind", lit("vertex"))
          .unionByName(e.groupBy("label")
            .agg(count(lit(1)).as("n"),
              graft.num.dsum(coalesce(col("weight"), lit(0.0))).as("sum_val"))
            .withColumn("kind", lit("edge")))
          .select("kind", "label", "n", "sum_val")
          .orderBy("kind", "label")
      },
      Some(withGraph(
        s"""SELECT 'vertex' AS kind, label, COUNT(*) AS n,
          ${graft.num.DSUM("COALESCE(val, 0)")} AS sum_val
        FROM vertices GROUP BY 2
        UNION ALL
        SELECT 'edge', label, COUNT(*),
          ${graft.num.DSUM("COALESCE(weight, 0)")}
        FROM edges GROUP BY 2
        ORDER BY kind, label"""))),

    // Neighborhood aggregation — GraphX's aggregateMessages primitive
    // re-expressed declaratively: per vertex, count + exact sum + max of
    // OUT-neighbor values. One equi-join (vertex attrs onto edge dst) and
    // one map-side-combined groupBy on src — the building block every
    // custom vertex-centric analytic reduces to.
    Op("graph_nbr_agg",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        g.edges.select("src", "dst")
          .join(g.vertices.select(col("id").as("dst"),
            coalesce(col("val"), lit(0.0)).as("v")), "dst")
          .groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("n_out"),
            graft.num.dsum(col("v")).as("sum_val"),
            max(col("v")).as("max_val"))
          .orderBy("id")
      },
      Some(withGraph(s"""SELECT e.src AS id, COUNT(*) AS n_out,
          ${graft.num.DSUM("COALESCE(v.val, 0)")} AS sum_val,
          MAX(COALESCE(v.val, 0)) AS max_val
        FROM edges e JOIN vertices v ON v.id = e.dst
        GROUP BY 1 ORDER BY 1"""))),

    // Bounded 2-core peel, 3 rounds (fixed rounds = deterministic partial
    // peel; the oracle runs the identical rounds, so convergence is not
    // assumed — though this fixture converges at round 2 at every SF, so
    // round 3 also certifies the fixpoint. See PropertyGraph.kCore).
    Op("graph_kcore",
      (s, dir) => GraphFixture(s, dir).kCore(2, 3).orderBy("id"),
      Some(withGraph(
        "SELECT id, deg FROM kc3 ORDER BY id",
        extra = GraphSql.kcChain(2, 3)))),

    // FULL CORENESS DECOMPOSITION (bounded h-index iteration — Lü et al.
    // 2016's distributed coreness scheme, the vertex-LOCAL formulation a
    // 1000-executor deployment actually runs): h₀(v) = undirected degree;
    // hᵣ(v) = h-index of the neighbors' h_{r-1} values (the max h such
    // that ≥ h neighbors score ≥ h). The sequence decreases monotonically
    // to the exact core number; FOUR rounds is the key's contract (fixed
    // rounds = deterministic, the oracle unrolls the IDENTICAL rounds —
    // convergence is certified where it happens, never assumed; a k-core
    // LADDER was tried first and rejected: K sequential bounded peels
    // cost K× graph_kcore and saturate at the cap — measured 52% of
    // vertices in the top rung at K=4 — while h-index rounds are
    // whole-graph one-pass and the estimate is per-vertex-granular).
    // Per round: one hash join (neighbor values onto the bidirectional
    // edge list) + one per-vertex window (the h-index is
    // MAX(LEAST(rank, value)) over neighbors sorted by value — rank
    // cutting value from above IS the h-index) + one aggregate; all
    // edge-sized, partitioned on the vertex key every round. ONE SQL
    // text serves both engines — the strongest cross-engine guarantee.
    Op("graph_coreness",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        g.vertices.createOrReplaceTempView("g_vertices")
        g.edges.createOrReplaceTempView("g_edges")
        s.sql(corenessSql("g_vertices", "g_edges"))
      },
      Some(GraphSql.withGraph(
        "SELECT id, coreness FROM cfin ORDER BY id",
        extra = corenessCtes("vertices", "edges", mat = "MATERIALIZED ")))),

    // Directed-graph RECIPROCITY — the share of directed vertex pairs
    // whose reverse edge also exists (a property-graph health scalar:
    // near-0 in the bipartite-ish relational layers, pushed up by the
    // mutual colocated/follows-style labels). Distinct (src,dst) pairs,
    // self-loops excluded; one self-equi-join on the reversed key; both
    // counts exact integers, the closing ratio one fixed-order IEEE
    // division (the imbalance discipline).
    Op("graph_reciprocity",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val de = g.edges.filter(col("src") =!= col("dst"))
          .select("src", "dst").distinct()
        val rev = de.select(col("dst").as("src"), col("src").as("dst"),
          lit(1).as("has_rev"))
        de.join(rev, Seq("src", "dst"), "left")
          .agg(count(lit(1)).as("n_pairs"),
            sum(coalesce(col("has_rev"), lit(0))).as("n_recip"))
          .select(col("n_pairs"), col("n_recip"),
            (col("n_recip").cast("double") / col("n_pairs").cast("double"))
              .as("reciprocity"))
      },
      Some(withGraph(
        """SELECT COUNT(*) AS n_pairs,
          CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_recip,
          CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS reciprocity
        FROM de LEFT JOIN de r ON r.src = de.dst AND r.dst = de.src""",
        extra = """de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
          WHERE src <> dst)"""))),

    // Bounded 3-truss peel, 3 rounds: edges closing no triangle peel each
    // round, support recomputed over survivors (the 4-truss is EMPTY on
    // this fixture at every SF — the colocated clusters are dense in
    // triangles but no edge sits in 2 surviving triangles after one peel —
    // so k=3 is the tightest non-vacuous rung). The cohesive-subgraph
    // ladder next to k-core — truss bounds TRIANGLE density where core
    // bounds degree, and the peel is edge-wise, so it exercises the
    // per-round triangle re-enumeration kCore never needs. Oracle unrolls
    // identical rounds (GraphSql.ktChain); see PropertyGraph.kTruss.
    Op("graph_ktruss",
      (s, dir) => GraphFixture(s, dir).truss3.orderBy("a", "b"),
      Some(withGraph(
        "SELECT a, b, support FROM kt3 ORDER BY a, b",
        extra = GraphSql.ktChain(3, 3)))),

    // Deterministic random-walk corpus (DeepWalk/node2vec sampling as a
    // batch op — the graph-embedding training-data generator): 4-step
    // walks from every 100th customer, next hop = hash-minimizing
    // neighbor, replayed exactly by the oracle's unrolled window chain.
    // See PropertyGraph.randomWalks for the per-step join/window shape.
    Op("graph_random_walk",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        g.randomWalks(g.vertices.filter(col("label") === "customer" &&
          col("id") % 100 === 0), 4).orderBy("walk_id")
      },
      Some(withGraph(
        "SELECT walk_id, v0, v1, v2, v3, v4 FROM w4 ORDER BY walk_id",
        extra = GraphSql.rwChain(4, "label = 'customer' AND id % 100 = 0")))),

    // node2vec-BIASED walks (p=2, q=0.5 → DFS-leaning in-out bias, the
    // variant embedding pipelines train on): same seeds/length/md5
    // determinism as graph_random_walk, with each step's candidates
    // ranked by h DIV w(α) — α from node2vec's (1/p, 1, 1/q) by the
    // candidate's distance to the PREVIOUS vertex; quantized micro-unit
    // weights keep both engines integer-exact (PropertyGraph.biasedWalks).
    Op("graph_node2vec_walk",
      (s, dir) => GraphFixture(s, dir).n2v4.orderBy("walk_id"),
      Some(withGraph(
        "SELECT walk_id, v0, v1, v2, v3, v4 FROM nw4 ORDER BY walk_id",
        extra = GraphSql.n2vChain(4, "label = 'customer' AND id % 100 = 0",
          500000L, 1000000L, 2000000L)))),

    // WALK→SKIP-GRAM PAIR EXPORT — the step embedding pipelines actually
    // train on: the stored node2vec walk matrix exploded into (center,
    // context, dist) pairs within a ±2 window (word2vec's training-data
    // shape over walk "sentences" — DeepWalk/node2vec both feed exactly
    // this to the skip-gram objective), counted per pair. One text both
    // engines: a 14-arm column-pair union over the walk relation + one
    // map-side-combined aggregate — walk-bounded by construction (14
    // rows per walk before combine), no join at all; at 100 TB the pair
    // stream shuffles once on (center, context), pair-vocabulary-sized.
    // Reads the SAME stored n2v4 artifact as graph_node2vec_walk — the
    // walk loop never re-runs.
    Op("graph_walk_skipgrams",
      (s, dir) => {
        GraphFixture(s, dir).n2v4.createOrReplaceTempView("n2vwalks")
        s.sql(skipgramSql("n2vwalks"))
      },
      Some(withGraph(
        skipgramSql("nw4"),
        extra = GraphSql.n2vChain(4, "label = 'customer' AND id % 100 = 0",
          500000L, 1000000L, 2000000L)))),

    // Bipartite projection: customers sharing a colocated supplier →
    // co-occurrence pair counts, summarized as a histogram (pair list is
    // quadratic per supplier; the projection is generated per-supplier —
    // an equi-join, never all-pairs — and immediately aggregated).
    Op("graph_bipartite",
      (s, dir) => {
        val co = GraphFixture(s, dir).edges
          .filter(col("label") === "colocated")
          .select(col("src").as("c"), col("dst").as("sup"))
        val a = co.select(col("c").as("c1"), col("sup"))
        val b = co.select(col("c").as("c2"), col("sup"))
        a.join(b, "sup").filter(col("c1") < col("c2"))
          .groupBy("c1", "c2").agg(count(lit(1)).as("shared"))
          .groupBy("shared").agg(count(lit(1)).as("n_pairs"))
          .orderBy("shared")
      },
      Some(withGraph("""SELECT shared, COUNT(*) AS n_pairs FROM (
          SELECT a.src AS c1, b.src AS c2, COUNT(*) AS shared
          FROM edges a JOIN edges b
            ON b.dst = a.dst AND b.label = 'colocated' AND a.src < b.src
          WHERE a.label = 'colocated'
          GROUP BY 1, 2) p
        GROUP BY 1 ORDER BY 1"""))),

    // Deterministic DF label propagation (max-count / min-label tie-break)
    // — oracle-checkable, unlike GraphX's arbitrary-tie variant.
    Op("graph_labelprop",
      (s, dir) => GraphFixture(s, dir).lp3.orderBy("id"),
      Some(withGraph(
        "SELECT id, lbl AS lp_label FROM lp3 ORDER BY id",
        extra = GraphSql.lpChain(3)))),

    // Modularity Q of the label-propagation communities — the quality
    // score for any community detection. Exact to the last bit across
    // engines because both Σ-terms collapse to INTEGER aggregates:
    // Q = (Σc e_c)/m − (Σc a_c²)/(4m²), where e_c (intra-community edge
    // count) and a_c (community degree mass) are integers over the simple
    // undirected graph — no cross-row float summation ever happens, and
    // the two closing divisions are fixed-order IEEE. Two vertex-map
    // joins + two map-side-combined aggregates.
    Op("graph_modularity",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val lbl = g.lp3
        val und = g.undirectedEdges
        val m = und.count()
        val intra = und
          .join(lbl.select(col("id").as("a"), col("lp_label").as("la")), "a")
          .join(lbl.select(col("id").as("b"), col("lp_label").as("lb")), "b")
          .filter(col("la") === col("lb")).count()
        val sa2 = g.undDegrees
          .join(lbl, "id")
          .groupBy("lp_label").agg(sum("d").as("ac"))
          .agg(sum(col("ac") * col("ac"))).head.getLong(0)
        import s.implicits._
        Seq((m, intra, sa2)).toDF("m", "intra", "sa2")
          .selectExpr("m", "intra", "sa2",
            "CAST(intra AS DOUBLE) / m - CAST(sa2 AS DOUBLE) / (4 * m * m) AS q")
      },
      Some(withGraph(
        """SELECT m, intra, sa2,
          CAST(intra AS DOUBLE) / m - CAST(sa2 AS DOUBLE) / (4 * m * m) AS q
        FROM (SELECT (SELECT COUNT(*) FROM su) AS m,
          (SELECT COUNT(*) FROM su u
            JOIN lp3 x ON x.id = u.a JOIN lp3 y ON y.id = u.b
            WHERE x.lbl = y.lbl) AS intra,
          (SELECT CAST(SUM(ac * ac) AS BIGINT) FROM (
            SELECT l.lbl, SUM(d.dd) AS ac FROM lp3 l
            JOIN (SELECT id, COUNT(*) AS dd FROM (SELECT a AS id FROM su
              UNION ALL SELECT b FROM su) z GROUP BY 1) d ON d.id = l.id
            GROUP BY 1) cc) AS sa2) t""",
        extra = GraphSql.lpChain(3) + """,
          su AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b FROM edges WHERE src <> dst)"""))),

    // MODULARITY-OPTIMIZING community detection — one Louvain level as 4
    // parity-scheduled synchronous sweeps (see graph/Louvain.scala: the
    // BSP-shaped Louvain whose unrolled-SQL replay is exact;
    // graph_labelprop propagates without an objective, graph_modularity
    // scores a given labeling — this key MOVES vertices to improve the
    // score). Integer gain in DECIMAL(38,0); ties → smallest community
    // id; fixed sweeps make the oracle finite, the lp3 discipline.
    Op("graph_louvain",
      (s, dir) => GraphFixture(s, dir).lu4,
      Some(withGraph(
        "SELECT id, comm FROM lu4 ORDER BY id",
        extra = GraphSql.louvainChain(4)))),

    // LEIDEN-STYLE REFINEMENT of the louvain communities — the
    // well-connectedness repair Leiden (Traag et al. '19) adds over
    // Louvain: a community that is INTERNALLY DISCONNECTED (its vertices
    // only connect through outsiders) is split into its connected pieces.
    // One CC pass over the INTRA-community edge subset (PairCC hook+jump
    // to fixpoint — the dedup-cluster machinery; the intra relation is a
    // fraction of the edge list by construction), refined label = the
    // piece's min vertex id; vertices with no intra edge become
    // singletons. Oracle: the louvain chain + a flood+JUMP doubling
    // chain over the intra CTE (ccJumpChain — a fixed flood depth is
    // NOT safe here: dropping inter-community edges can lengthen intra
    // shortest paths past the full graph's diameter, while the engine
    // side runs PairCC to full convergence). Together with
    // graph_louvain (move), graph_conductance / graph_modularity (score),
    // this completes the community-detection loop a production pipeline
    // runs.
    Op("graph_leiden_refine",
      (s, dir) => GraphFixture(s, dir).leidenRefined.orderBy("id"),
      Some(withGraph(
        """SELECT l.id, u.comm, l.lbl AS refined FROM l12 l
          JOIN lu4 u ON u.id = l.id ORDER BY l.id""",
        extra = GraphSql.louvainChain(4) + """,
          intra AS MATERIALIZED (SELECT u.a AS src, u.b AS dst
            FROM luund u
            JOIN lu4 x ON x.id = u.a JOIN lu4 y ON y.id = u.b
            WHERE x.comm = y.comm),
          """ + GraphSql.ccJumpChain(12, edgesRel = "intra",
            verticesRel = "lu4")))),

    // SECOND COMMUNITY LEVEL — the actual Louvain/Leiden LOOP (Blondel
    // phase 2 / Traag aggregation step): the leiden-refined labeling
    // CONTRACTS into a super-graph (super-node per piece, inter-piece
    // edge counts as weights, intra-piece counts as self-loop strength)
    // and the same 4 parity-scheduled sweeps run WEIGHTED on it
    // (Louvain.weightedSweeps). Emits (id, level1, level2) — the
    // two-level hierarchy a production community pipeline stores. The
    // sweep loop runs on the contracted graph (pieces, not vertices),
    // which is the collapse that keeps multi-level Louvain tractable at
    // 100 TB; GraphAlgoIndependenceSpec asserts Q(level2) ≥ Q(level1)
    // on the fixture. Oracle: the full unrolled chain — louvain sweeps,
    // flood+jump refinement, contraction, weighted sweeps
    // (GraphSql.louvain2Ctes).
    Op("graph_louvain_hierarchy",
      (s, dir) => GraphFixture(s, dir).louvain2.orderBy("id"),
      Some(withGraph(
        """SELECT r.id, r.lbl AS level1, v4.comm AS level2
          FROM l12 r JOIN v4 ON v4.id = r.lbl ORDER BY r.id""",
        extra = GraphSql.louvainChain(4) + """,
          intra AS MATERIALIZED (SELECT u.a AS src, u.b AS dst
            FROM luund u
            JOIN lu4 x ON x.id = u.a JOIN lu4 y ON y.id = u.b
            WHERE x.comm = y.comm),
          """ + GraphSql.ccJumpChain(12, edgesRel = "intra",
            verticesRel = "lu4") + ", " + GraphSql.louvain2Ctes(4)))),

    // CONDUCTANCE of the label-propagation communities — the cut-quality
    // score modularity doesn't see (a community can score high Q yet leak
    // half its volume through a thin frontier; φ(C) = cut(C) /
    // min(vol(C), 2m − vol(C)) is the bottleneck measure sparsest-cut
    // theory bounds). Both Σ-terms are INTEGER aggregates over the simple
    // undirected graph (cut: one boundary-edge scan exploded to both end
    // communities; vol: one degree join) — map-side combined, community-
    // sized outputs; the closing division is fixed-order IEEE. Scores any
    // stored labeling — lp3 here so the artifact is shared with
    // graph_modularity (louvain's communities plug in the same way).
    Op("graph_conductance",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val lbl = g.lp3
        val und = g.undirectedEdges
        val m = und.count()
        val boundary = und
          .join(lbl.select(col("id").as("a"), col("lp_label").as("la")), "a")
          .join(lbl.select(col("id").as("b"), col("lp_label").as("lb")), "b")
          .filter(col("la") =!= col("lb"))
          .select(explode(array(col("la"), col("lb"))).as("lp_label"))
          .groupBy("lp_label").agg(count(lit(1)).as("cut"))
        val denom = least(col("vol"), lit(2 * m) - col("vol"))
        g.undDegrees.join(lbl, "id")
          .groupBy("lp_label").agg(sum("d").as("vol"))
          .join(boundary, Seq("lp_label"), "left")
          .select(col("lp_label"),
            coalesce(col("cut"), lit(0L)).as("cut"), col("vol"),
            when(denom === 0, lit(0.0))
              .otherwise(coalesce(col("cut"), lit(0L)).cast("double")
                / denom.cast("double")).as("phi"))
          .orderBy("lp_label")
      },
      Some(withGraph(
        """SELECT lv.lbl AS lp_label, COALESCE(lc.cut, 0) AS cut, lv.vol,
          CASE WHEN LEAST(lv.vol, 2 * mm.m - lv.vol) = 0 THEN 0.0
            ELSE CAST(COALESCE(lc.cut, 0) AS DOUBLE)
              / CAST(LEAST(lv.vol, 2 * mm.m - lv.vol) AS DOUBLE) END AS phi
        FROM lv CROSS JOIN mm LEFT JOIN lc ON lc.lbl = lv.lbl
        ORDER BY lp_label""",
        extra = GraphSql.lpChain(3) + """,
          su AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b FROM edges WHERE src <> dst),
          dg AS (SELECT id, COUNT(*) AS dd FROM (SELECT a AS id FROM su
            UNION ALL SELECT b FROM su) z GROUP BY 1),
          mm AS (SELECT COUNT(*) AS m FROM su),
          lv AS (SELECT l.lbl, CAST(SUM(d.dd) AS BIGINT) AS vol
            FROM lp3 l JOIN dg d ON d.id = l.id GROUP BY 1),
          bd AS (SELECT x.lbl AS la, y.lbl AS lb FROM su u
            JOIN lp3 x ON x.id = u.a JOIN lp3 y ON y.id = u.b
            WHERE x.lbl <> y.lbl),
          lc AS (SELECT lbl, COUNT(*) AS cut FROM (
            SELECT la AS lbl FROM bd UNION ALL SELECT lb FROM bd) z
            GROUP BY 1)"""))),

    // Neighborhood Jaccard (link prediction): supplier pairs scored by
    // overlap of their in-neighbor part sets. Candidates come from one
    // self-equi-join on the shared part — pairs with zero overlap are never
    // generated, so the work is Σ_part (suppliers-per-part choose 2), not
    // all supplier pairs; at 100 TB a hot part is the skew risk and the
    // standard cap (drop hub parts above a degree bound) slots in front.
    // common/deg arithmetic is integer; the score is one per-row IEEE
    // division.
    Op("graph_jaccard",
      (s, dir) => {
        val sup = GraphFixture(s, dir).edges
          .filter(col("label") === "supplied_by")
          .select(col("src").as("part"), col("dst").as("sup"))
        val deg = sup.groupBy("sup").agg(count(lit(1)).as("deg"))
        val common = sup.select(col("part"), col("sup").as("s1"))
          .join(sup.select(col("part"), col("sup").as("s2")), "part")
          .filter(col("s1") < col("s2"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("common"))
        common
          .join(deg.select(col("sup").as("s1"), col("deg").as("d1")), "s1")
          .join(deg.select(col("sup").as("s2"), col("deg").as("d2")), "s2")
          .select(col("s1"), col("s2"), col("common"),
            (col("common").cast("double") /
              (col("d1") + col("d2") - col("common"))).as("jaccard"))
          // 0.1, not 0.2: sf0.01's max pair score is 0.189, so the old
          // threshold graded an empty relation (r12–r14 vacuous-pass);
          // 0.1 keeps the gate row populated at every tested SF.
          .filter(col("jaccard") >= 0.1)
          .orderBy("s1", "s2")
      },
      Some(withGraph("""SELECT s1, s2, common,
          CAST(common AS DOUBLE) / (x.d + y.d - common) AS jaccard
        FROM (SELECT a.dst AS s1, b.dst AS s2, COUNT(*) AS common
          FROM sb a JOIN sb b ON b.src = a.src AND a.dst < b.dst
          GROUP BY 1, 2) c
        JOIN dg x ON x.sup = c.s1 JOIN dg y ON y.sup = c.s2
        WHERE CAST(common AS DOUBLE) / (x.d + y.d - common) >= 0.1
        ORDER BY s1, s2""",
        extra = """sb AS MATERIALIZED (SELECT src, dst FROM edges
            WHERE label = 'supplied_by'),
          dg AS (SELECT dst AS sup, COUNT(*) AS d FROM sb GROUP BY 1)"""))),

    // RESOURCE-ALLOCATION link prediction — Σ 1/deg(c) over common
    // neighbors c, the Adamic-Adar family member WITHOUT the logarithm:
    // every term is one exact IEEE division, the sum is exact decimal, so
    // the score is bit-reproducible cross-engine (Adamic-Adar's 1/log d
    // is not). Candidates come only from the shared-part equi-join (like
    // graph_jaccard), never all-pairs; the hub-damping intuition is the
    // same — a part supplied by everyone contributes almost nothing.
    // deg(c) is the FULL simple undirected degree of the shared part (the
    // stored undDegrees index), not just its supplier fan-out.
    Op("graph_resource_alloc",
      (s, dir) => {
        val g = GraphFixture(s, dir)
        val sup = g.edges.filter(col("label") === "supplied_by")
          .select(col("src").as("part"), col("dst").as("sup"))
        val deg = g.undDegrees.withColumnRenamed("id", "part")
        sup.select(col("part"), col("sup").as("s1"))
          .join(sup.select(col("part"), col("sup").as("s2")), "part")
          .filter(col("s1") < col("s2"))
          .join(deg, "part")
          .select(col("s1"), col("s2"),
            (lit(1.0) / col("d").cast("double")).as("w"))
          .groupBy("s1", "s2")
          .agg(graft.num.dsum(col("w")).as("ra"),
            count(lit(1)).as("n_common"))
          .filter(col("n_common") >= 2)
          .orderBy("s1", "s2")
      },
      Some(withGraph(s"""SELECT a.dst AS s1, b.dst AS s2,
          ${graft.num.DSUM("CAST(1 AS DOUBLE) / CAST(dg.d AS DOUBLE)")} AS ra,
          COUNT(*) AS n_common
        FROM sb a JOIN sb b ON b.src = a.src AND a.dst < b.dst
        JOIN dg ON dg.id = a.src
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ORDER BY s1, s2""",
        extra = """sb AS MATERIALIZED (SELECT src, dst FROM edges
            WHERE label = 'supplied_by'),
          und AS (SELECT src AS a, dst AS b FROM edges WHERE src <> dst
            UNION SELECT dst, src FROM edges WHERE src <> dst),
          dg AS (SELECT a AS id, COUNT(*) AS d FROM und GROUP BY 1)"""))),

    // Ego network — THE graph-db lookup: everything within 2 undirected
    // hops of one entity (customer #1), as the induced edge list. This is
    // a LATENCY-path query, so PropertyGraph.ego runs it like a graph
    // database runs point traversals: the frontier is expanded DRIVER-SIDE
    // with two collects of filtered index scans, then pushed down as
    // InSet literals — one filtered scan of the edge cache, no joins, no
    // AQE stage cascade (the join/semi-join formulation measured 15 s at
    // sf0.1 — all broadcast-hash, but ~10 adaptive stages of fixed
    // overhead; the pushed-down form is the same filtered scans at ~1 s).
    // The latency path is GUARDED, not assumed: an undirected 2-hop
    // neighborhood routes through nation hubs whose neighbor sets grow
    // with scale factor, so past the frontier cap ego() restarts on the
    // distributed semi-join form (see PropertyGraph.frontierCap; the BSP
    // path for class-sized frontiers is graph_var_hop).
    Op("graph_ego",
      (s, dir) => GraphFixture(s, dir).ego(3000000000001L, 2)
        .orderBy("src", "dst", "label"),
      Some(withGraph(
        """SELECT e.src, e.dst, e.label FROM edges e
          JOIN (SELECT DISTINCT id FROM reach) a ON a.id = e.src
          JOIN (SELECT DISTINCT id FROM reach) b ON b.id = e.dst
        ORDER BY e.src, e.dst, e.label""",
        extra = """und AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges),
          reach(id, d) AS (
            SELECT CAST(3000000000001 AS BIGINT), 0
            UNION
            SELECT u.b, r.d + 1 FROM reach r JOIN und u ON u.a = r.id
            WHERE r.d < 2)""",
        recursive = true)))
  )

  /** graph_coreness CTE chain — ONE text, both engines, modulo `mat`
    * (DuckDB's CTE materialization hint for the 4×-referenced
    * bidirectional edge list; Spark passes "" and re-derives it from the
    * CACHED edge view per round — a deployment points cbid at the stored
    * undirected index instead). The h-index of a neighbor multiset sorted
    * descending is MAX(LEAST(rank, value)): rank climbing past value from
    * above is exactly the h cutoff. */
  private def corenessCtes(vRel: String, eRel: String, mat: String): String = {
    val base = s"""cund AS $mat(SELECT DISTINCT LEAST(src, dst) AS a,
        GREATEST(src, dst) AS b FROM $eRel WHERE src <> dst),
      cbid AS $mat(SELECT a, b FROM cund UNION ALL SELECT b, a FROM cund),
      ch0 AS (SELECT a AS id, COUNT(*) AS h FROM cbid GROUP BY a)"""
    val rounds = (1 to 4).map { i =>
      s"""ch$i AS (SELECT id, MAX(LEAST(rn, hv)) AS h FROM (
        SELECT e.a AS id, p.h AS hv,
          ROW_NUMBER() OVER (PARTITION BY e.a ORDER BY p.h DESC) AS rn
        FROM cbid e JOIN ch${i - 1} p ON p.id = e.b) t GROUP BY id)"""
    }
    val fin = s"""cfin AS (SELECT v.id,
      CAST(COALESCE(ch.h, 0) AS INTEGER) AS coreness
      FROM $vRel v LEFT JOIN ch4 ch ON ch.id = v.id)"""
    (Seq(base) ++ rounds :+ fin).mkString(", ")
  }

  /** graph_walk_skipgrams body, one text both engines: every ordered
    * position pair of the 5-column walk matrix within window 2 (14 arms),
    * counted per (center, context, dist). */
  private def skipgramSql(rel: String): String = {
    val pairs = for {
      i <- 0 to 4; j <- 0 to 4
      if i != j && math.abs(i - j) <= 2
    } yield s"SELECT v$i AS center, v$j AS context, " +
      s"CAST(${math.abs(i - j)} AS INTEGER) AS dist FROM $rel"
    s"""SELECT center, context, dist, COUNT(*) AS n FROM (
      ${pairs.mkString(" UNION ALL ")}) p
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
  }

  private def corenessSql(vRel: String, eRel: String): String =
    "WITH " + corenessCtes(vRel, eRel, mat = "") +
      " SELECT id, coreness FROM cfin ORDER BY id"

  /** Cross-nation trade pairs (a < b, decimal-exact revenue weight) — the
    * graded MST instance; `d` is the engine's DECIMAL→DOUBLE cast seam. */
  private def mstPairsSql(d: String => String): String = s"""
    SELECT LEAST(s_nationkey, c_nationkey) AS a,
           GREATEST(s_nationkey, c_nationkey) AS b,
           ${d("SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))")} AS w
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE s_nationkey <> c_nationkey
    GROUP BY 1, 2"""

  /** Borůvka UNROLLED for the DuckDB oracle: `rounds` merge rounds (≥
    * ⌈log₂ 25⌉ = 5 for the 25-vertex nation graph — components at least
    * halve per round), each with a min-edge pick (ROW_NUMBER over the
    * (w, a, b) total order), a 2-cycle-broken hook, and `jumps` pointer
    * jumps (2^5 = 32 > 25 covers any chain). Rounds past convergence see
    * an empty cross set and pass the labeling through unchanged. */
  private def mstOracleSql: String = {
    val rounds = 5
    val jumps = 5
    // MATERIALIZED throughout: DuckDB re-inlines a plain CTE at every
    // reference, and the unrolled chain references pairs/comp ~a dozen
    // times — inlined, each reference re-opens the four parquet files
    // (observed: "Too many open files" at the default ulimit).
    val pairs = s"pairs AS MATERIALIZED (${mstPairsSql(e =>
      s"CAST(CAST($e AS VARCHAR) AS DOUBLE)")})"
    val comp0 = """comp0 AS MATERIALIZED (SELECT id, id AS comp FROM
      (SELECT a AS id FROM pairs UNION SELECT b FROM pairs) v)"""
    val roundCtes = (1 to rounds).map { r =>
      val jumpCtes = (1 to jumps).map(j =>
        s"""p${r}_$j AS MATERIALIZED (SELECT x.c, y.p FROM p${r}_${j - 1} x
           JOIN p${r}_${j - 1} y ON y.c = x.p)""").mkString(", ")
      s"""xr$r AS MATERIALIZED (SELECT p.a, p.b, p.w, x.comp AS ca, y.comp AS cb
           FROM pairs p
           JOIN comp${r - 1} x ON x.id = p.a
           JOIN comp${r - 1} y ON y.id = p.b
           WHERE x.comp <> y.comp),
         half$r AS MATERIALIZED (SELECT ca AS c, cb AS tgt, w, a, b FROM xr$r
           UNION ALL SELECT cb, ca, w, a, b FROM xr$r),
         sel$r AS MATERIALIZED (SELECT c, tgt, w, a, b FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, a, b)
             AS rn FROM half$r) z WHERE rn = 1),
         p${r}_0 AS MATERIALIZED (SELECT x.c,
             CASE WHEN y.tgt = x.c AND x.c < x.tgt THEN x.c ELSE x.tgt END
               AS p
           FROM sel$r x JOIN sel$r y ON y.c = x.tgt),
         $jumpCtes,
         comp$r AS MATERIALIZED (SELECT m.id, COALESCE(q.p, m.comp) AS comp
           FROM comp${r - 1} m LEFT JOIN p${r}_$jumps q ON q.c = m.comp)"""
    }.mkString(", ")
    val union = (1 to rounds)
      .map(r => s"SELECT a, b, w FROM sel$r").mkString(" UNION ALL ")
    s"""WITH $pairs, $comp0, $roundCtes
      SELECT DISTINCT a, b, w FROM ($union) f ORDER BY a, b"""
  }

  /** Greedy matching UNROLLED for the DuckDB oracle: 12 mutual-best rounds
    * (⌊25/2⌋ matches bound the round count on the nation pair graph;
    * converged rounds pass empty sets through). Same (w DESC, a, b)
    * nomination order as Matching.greedy's min-struct. */
  private def matchingOracleSql: String = {
    val rounds = 12
    val pairs = s"pairs AS MATERIALIZED (${mstPairsSql(e =>
      s"CAST(CAST($e AS VARCHAR) AS DOUBLE)")})"
    val e0 = "me0 AS MATERIALIZED (SELECT a, b, w FROM pairs)"
    val roundCtes = (1 to rounds).map { r =>
      s"""mh$r AS (SELECT a AS v, a, b, w FROM me${r - 1}
           UNION ALL SELECT b, a, b, w FROM me${r - 1}),
         mb$r AS MATERIALIZED (SELECT v, a, b, w FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY v
             ORDER BY w DESC, a, b) AS rn FROM mh$r) z WHERE rn = 1),
         mm$r AS MATERIALIZED (SELECT x.a, x.b, x.w FROM mb$r x
           JOIN mb$r y ON y.v = x.b AND y.a = x.a AND y.b = x.b
           WHERE x.v = x.a),
         mv$r AS (SELECT a AS id FROM mm$r UNION SELECT b FROM mm$r),
         me$r AS MATERIALIZED (SELECT e.a, e.b, e.w FROM me${r - 1} e
           LEFT JOIN mv$r p ON p.id = e.a LEFT JOIN mv$r q ON q.id = e.b
           WHERE p.id IS NULL AND q.id IS NULL)"""
    }.mkString(", ")
    val union = (1 to rounds)
      .map(r => s"SELECT CAST($r AS INTEGER) AS r, a, b, w FROM mm$r")
      .mkString(" UNION ALL ")
    s"WITH $pairs, $e0, $roundCtes SELECT r, a, b, w FROM ($union) f ORDER BY r, a, b"
  }

  /** Unweighted mutual-best matching UNROLLED over the full undirected
    * graph — endpoints = the 2-approx vertex cover. Lexicographic (a, b)
    * nomination order. DEPTH: gate SF (sf0.01) converges in 13 rounds and
    * round count grows ~50% per 10× SF (measured r14d), so 24 covers
    * ~sf1; converged rounds pass EMPTY sets through (near-free). If the
    * oracle is ever run on a fixture deeper than its unroll, the ORACLE
    * is the broken side — bump here, the Spark loop is depth-adaptive. */
  private def vertexCoverOracleSql: String = {
    val rounds = 24
    val base = """uund AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
        GREATEST(src, dst) AS b FROM edges WHERE src <> dst),
      ue0 AS MATERIALIZED (SELECT a, b FROM uund)"""
    val roundCtes = (1 to rounds).map { r =>
      s"""uh$r AS (SELECT a AS v, a, b FROM ue${r - 1}
           UNION ALL SELECT b, a, b FROM ue${r - 1}),
         ub$r AS MATERIALIZED (SELECT v, a, b FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY v ORDER BY a, b) AS rn
           FROM uh$r) z WHERE rn = 1),
         um$r AS MATERIALIZED (SELECT x.a, x.b FROM ub$r x
           JOIN ub$r y ON y.v = x.b AND y.a = x.a AND y.b = x.b
           WHERE x.v = x.a),
         uv$r AS (SELECT a AS id FROM um$r UNION SELECT b FROM um$r),
         ue$r AS MATERIALIZED (SELECT e.a, e.b FROM ue${r - 1} e
           LEFT JOIN uv$r p ON p.id = e.a LEFT JOIN uv$r q ON q.id = e.b
           WHERE p.id IS NULL AND q.id IS NULL)"""
    }.mkString(", ")
    val union = (1 to rounds)
      .map(r => s"SELECT a AS id FROM um$r UNION ALL SELECT b FROM um$r")
      .mkString(" UNION ALL ")
    withGraph(s"SELECT DISTINCT id FROM ($union) f ORDER BY id",
      extra = s"$base, $roundCtes")
  }

  /** Id-priority MIS UNROLLED (gate SF converges in 3; lex-MIS depth is
    * O(log V) expected on random-id graphs — 10 rounds is >3× gate
    * headroom; converged rounds pass empty sets through. A fixture deeper
    * than the unroll breaks the ORACLE side — bump here). */
  private def misOracleSql: String = {
    val rounds = 10
    val base = """mund AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
        GREATEST(src, dst) AS b FROM edges WHERE src <> dst),
      ma1 AS MATERIALIZED (SELECT a AS id FROM mund UNION SELECT b FROM mund),
      mie1 AS MATERIALIZED (SELECT a, b FROM mund)"""
    val roundCtes = (1 to rounds).map { r =>
      s"""mw$r AS MATERIALIZED (SELECT v.id FROM ma$r v
           LEFT JOIN (SELECT DISTINCT b FROM mie$r) l ON l.b = v.id
           WHERE l.b IS NULL),
         md$r AS (SELECT DISTINCT e.b AS id FROM mie$r e
           JOIN mw$r w ON w.id = e.a),
         ma${r + 1} AS MATERIALIZED (SELECT v.id FROM ma$r v
           LEFT JOIN mw$r w ON w.id = v.id
           LEFT JOIN md$r d ON d.id = v.id
           WHERE w.id IS NULL AND d.id IS NULL),
         mie${r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM mie$r e
           JOIN ma${r + 1} x ON x.id = e.a
           JOIN ma${r + 1} y ON y.id = e.b)"""
    }.mkString(", ")
    val union = (1 to rounds).map(r => s"SELECT id FROM mw$r")
      .mkString(" UNION ALL ")
    withGraph(s"SELECT id FROM ($union) f ORDER BY id",
      extra = s"$base, $roundCtes")
  }

  /** Iterated-MIS coloring UNROLLED, nested: 6 layers (gate SF uses 3,
    * layer count ≤ Δ+1) × 5 id-priority MIS rounds each (gate SF layers
    * use ≤ 3, O(log V) expected); converged layers/rounds pass empty
    * sets through, so the headroom is near-free at the gate. A fixture
    * deeper than the unroll breaks the ORACLE side — bump here. */
  private def coloringOracleSql: String = {
    val layers = 6
    val rounds = 5
    val base = """cund AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
        GREATEST(src, dst) AS b FROM edges WHERE src <> dst),
      crv1 AS MATERIALIZED (SELECT a AS id FROM cund UNION SELECT b FROM cund),
      cre1 AS MATERIALIZED (SELECT a, b FROM cund)"""
    val layerCtes = (1 to layers).map { l =>
      val mis0 = s"""ca${l}_1 AS MATERIALIZED (SELECT a AS id FROM cre$l
          UNION SELECT b FROM cre$l),
        cie${l}_1 AS MATERIALIZED (SELECT a, b FROM cre$l)"""
      val misRounds = (1 to rounds).map { j =>
        s"""cw${l}_$j AS MATERIALIZED (SELECT v.id FROM ca${l}_$j v
             LEFT JOIN (SELECT DISTINCT b FROM cie${l}_$j) x ON x.b = v.id
             WHERE x.b IS NULL),
           cd${l}_$j AS (SELECT DISTINCT e.b AS id FROM cie${l}_$j e
             JOIN cw${l}_$j w ON w.id = e.a),
           ca${l}_${j + 1} AS MATERIALIZED (SELECT v.id FROM ca${l}_$j v
             LEFT JOIN cw${l}_$j w ON w.id = v.id
             LEFT JOIN cd${l}_$j d ON d.id = v.id
             WHERE w.id IS NULL AND d.id IS NULL),
           cie${l}_${j + 1} AS MATERIALIZED (SELECT e.a, e.b FROM cie${l}_$j e
             JOIN ca${l}_${j + 1} x ON x.id = e.a
             JOIN ca${l}_${j + 1} y ON y.id = e.b)"""
      }.mkString(", ")
      val misUnion = (1 to rounds).map(j => s"SELECT id FROM cw${l}_$j")
        .mkString(" UNION ALL ")
      s"""$mis0, $misRounds,
        clay$l AS MATERIALIZED (SELECT id FROM ($misUnion) m
          UNION ALL
          SELECT v.id FROM crv$l v LEFT JOIN ca${l}_1 s ON s.id = v.id
          WHERE s.id IS NULL),
        crv${l + 1} AS MATERIALIZED (SELECT v.id FROM crv$l v
          LEFT JOIN clay$l y ON y.id = v.id WHERE y.id IS NULL),
        cre${l + 1} AS MATERIALIZED (SELECT e.a, e.b FROM cre$l e
          JOIN crv${l + 1} x ON x.id = e.a
          JOIN crv${l + 1} y ON y.id = e.b)"""
    }.mkString(", ")
    val union = (1 to layers)
      .map(l => s"SELECT id, CAST($l AS INTEGER) AS color FROM clay$l")
      .mkString(" UNION ALL ")
    withGraph(s"SELECT id, color FROM ($union) f ORDER BY id",
      extra = s"$base, $layerCtes")
  }

  /** Charikar peel UNROLLED — the ε=1 halving bounds true depth at
    * ⌈log₂ V⌉ (~14 at V=10k), so 14 rounds covers ANY fixture the bound
    * admits up to 16k surviving vertices post-round-1; sf0.01 converges
    * in 3; empty rounds emit nothing via WHERE n > 0 (near-free). */
  private def densestOracleSql: String = {
    val rounds = 14
    val base = """dund AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
        GREATEST(src, dst) AS b FROM edges WHERE src <> dst),
      dv1 AS MATERIALIZED (SELECT a AS id FROM dund UNION SELECT b FROM dund),
      de1 AS MATERIALIZED (SELECT a, b FROM dund)"""
    val roundCtes = (1 to rounds).map { r =>
      s"""ds$r AS (SELECT (SELECT COUNT(*) FROM dv$r) AS n,
           (SELECT COUNT(*) FROM de$r) AS e),
         ddeg$r AS (SELECT v.id, COALESCE(d.d, 0) AS d FROM dv$r v
           LEFT JOIN (SELECT id, COUNT(*) AS d FROM (
             SELECT a AS id FROM de$r UNION ALL SELECT b FROM de$r) x
             GROUP BY 1) d ON d.id = v.id),
         drem$r AS (SELECT id FROM ddeg$r, ds$r WHERE d * n <= 4 * e),
         dv${r + 1} AS MATERIALIZED (SELECT v.id FROM dv$r v
           LEFT JOIN drem$r p ON p.id = v.id WHERE p.id IS NULL),
         de${r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM de$r e
           LEFT JOIN drem$r p ON p.id = e.a LEFT JOIN drem$r q ON q.id = e.b
           WHERE p.id IS NULL AND q.id IS NULL)"""
    }.mkString(", ")
    val stats = (1 to rounds)
      .map(r => s"""SELECT CAST($r AS INTEGER) AS r, n AS n_vertices,
        e AS n_edges FROM ds$r WHERE n > 0""")
      .mkString(" UNION ALL ")
    withGraph(
      s"""SELECT r, n_vertices, n_edges,
        CASE WHEN ROW_NUMBER() OVER (ORDER BY
          CAST(n_edges AS DOUBLE) / n_vertices DESC, r) = 1
          THEN 1 ELSE 0 END AS is_best
        FROM dstats ORDER BY r""",
      extra = s"$base, $roundCtes, dstats AS ($stats)")
  }
}
