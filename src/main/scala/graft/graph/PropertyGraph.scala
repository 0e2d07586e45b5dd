package graft.graph

import org.apache.spark.graphx.{Edge, EdgeDirection, Graph, Pregel, lib}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Property-graph surface re-expressed Spark-first (SURVEY.md §2.10, §3.3).
  *
  * The reference family (TinkerPop/Blueprints lineage — see SURVEY.md §0.1;
  * the reference checkout was empty this round, §0) traverses
  * element-at-a-time over a key-value store. Our translation: a graph is a
  * pair of DataFrames and every traversal is a Catalyst join pipeline —
  * pushdown/pruning/broadcast selection come free, and the same code
  * distributes to 1000 executors. Iterative analytics (CC / SSSP / flood)
  * switch to GraphX/Pregel per BASELINE.json's stated approach; PageRank and
  * triangle counting stay in DataFrame land where exact, oracle-checkable
  * arithmetic (graft.num) and join-shape control matter more.
  *
  * Scale notes (100 TB design point):
  *  - vertices/edges are plain DFs: partitioned by id/src hash at shuffle
  *    time; no driver-side materialization anywhere (sources for varHop are
  *    DFs, not collected lists).
  *  - traversals are equi-joins on long keys — shuffled hash / SMJ with AQE,
  *    broadcast when a frontier or dim side is small.
  *  - varHop's frontier loop anti-joins the visited set each step (BFS
  *    level-order ⇒ first visit is min-hops) — the classic distributed BFS.
  *  - triangle counting uses canonical (low-id → high-id) edge orientation so
  *    each triangle is generated exactly once; the fixture graph keeps wedge
  *    counts bounded (see GraphFixture).
  */
final case class PropertyGraph(vertices: DataFrame, edges: DataFrame) {

  private def spark = vertices.sparkSession

  /** Out-traversal over `elabel` edges with the destination vertex attached
    * (Blueprints `out(label)`). One equi-join; dim side broadcast by AQE when
    * small. */
  def out(elabel: String): DataFrame =
    edges.filter(col("label") === elabel)
      .join(vertices.select(col("id").as("dst"), col("label").as("dst_label"),
        col("name").as("dst_name"), col("val").as("dst_val")), "dst")

  /** In-traversal: edges arriving at each vertex, vertex attached. */
  def in(elabel: String): DataFrame =
    edges.filter(col("label") === elabel)
      .join(vertices.select(col("id").as("dst"), col("label").as("dst_label"),
        col("name").as("dst_name")), "dst")

  /** Per-vertex in/out/total degree. Two map-side-combined counts + two
    * left joins; zero-degree vertices kept. */
  def degrees: DataFrame = {
    val o = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val i = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
    vertices.select("id", "label")
      .join(o, Seq("id"), "left").join(i, Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        (coalesce(col("out_deg"), lit(0L)) + coalesce(col("in_deg"), lit(0L))).as("deg"))
  }

  /** Induced subgraph on vertices satisfying `vpred`: keep edges whose BOTH
    * endpoints survive (two semi-joins — no row width growth). */
  def subgraph(vpred: org.apache.spark.sql.Column): PropertyGraph = {
    val vs = vertices.filter(vpred)
    val keep = vs.select("id")
    val es = edges
      .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    PropertyGraph(vs, es)
  }

  /** EzBake-style visibility view: only 'public' vertices, only 'public'
    * edges, and only edges between visible endpoints (SURVEY.md §2.10
    * graph_visibility). A wrapper, not a Catalyst rule — the filter lands
    * before every downstream op and pushes into the scans. */
  def visible: PropertyGraph =
    PropertyGraph(vertices.filter(col("vis") === "public"),
      edges.filter(col("vis") === "public"))
      .subgraph(col("vis") === "public")

  /** Variable-length reachability ≤ maxHops from `sources` (a DF with an
    * `id` column): distributed BFS. Level-order expansion + anti-join on the
    * visited set ⇒ each vertex is labeled with its MINIMUM hop count. */
  def varHop(sources: DataFrame, maxHops: Int): DataFrame = {
    var visited = sources.select(col("id"), lit(0).as("hops"))
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = frontier.select(col("id").as("src"))
        .join(edges.select("src", "dst"), "src")
        .select(col("dst").as("id"), lit(h).as("hops")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
      visited = visited.unionAll(next)
      frontier = next
    }
    visited
  }

  /** GraphX view: vertex attr = val (nulls → 0.0), unit edge attr.
    * MEMORY_AND_DISK so 100 TB-scale graphs spill instead of OOM. */
  def toGraphX: Graph[Double, Long] = {
    val vrdd = vertices.select(col("id"), coalesce(col("val"), lit(0.0))).rdd
      .map(r => (r.getLong(0), r.getDouble(1)))
    val erdd = edges.select("src", "dst").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1L))
    Graph(vrdd, erdd, 0.0,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Connected components (GraphX Pregel, undirected min-id propagation).
    * Integer min is order-independent ⇒ deterministic, recursive-CTE
    * oracle-able. */
  def connectedComponents: DataFrame = {
    val sp = spark; import sp.implicits._
    toGraphX.connectedComponents().vertices.toDF("id", "component")
  }

  /** Min hop count from each vertex TO any of `landmarks` following edge
    * direction (GraphX ShortestPaths; messages flow dst→src). Unreachable
    * vertices are omitted. */
  def minHopsTo(landmarks: Seq[Long]): DataFrame = {
    val sp = spark; import sp.implicits._
    lib.ShortestPaths.run(toGraphX, landmarks).vertices
      .flatMap { case (id, m) => if (m.isEmpty) None else Some((id, m.values.min)) }
      .toDF("id", "dist")
  }

  /** Pregel max-value flood: every vertex converges to the max vertex `val`
    * in its (undirected) component. Max is order-independent ⇒ exact. */
  def maxFlood: DataFrame = {
    val sp = spark; import sp.implicits._
    val res = Pregel(toGraphX, Double.NegativeInfinity,
      activeDirection = EdgeDirection.Either)(
      (_, attr, msg) => math.max(attr, msg),
      t =>
        if (t.srcAttr > t.dstAttr) Iterator((t.dstId, t.srcAttr))
        else if (t.dstAttr > t.srcAttr) Iterator((t.srcId, t.dstAttr))
        else Iterator.empty,
      math.max)
    res.vertices.toDF("id", "maxval")
  }

  /** DataFrame-native PageRank, fixed iteration count, damping 0.85.
    * Deterministic across partitionings: the only order-sensitive step (the
    * per-destination sum of contributions) goes through graft.num.dsum's
    * exact decimal accumulation; all other arithmetic is per-row IEEE double.
    * Dangling mass is dropped (simplified uniform-teleport formulation) —
    * same formula in the DuckDB oracle (GraphSql.pageRankSql). */
  def pageRank(iters: Int): DataFrame = {
    val n = vertices.count().toDouble // metadata-scale driver value, not data
    val odeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ids = vertices.select("id")
    var pr = ids.withColumn("pr", lit(1.0) / lit(n))
    for (_ <- 1 to iters) {
      val contribs = edges.select("src", "dst")
        .join(pr.withColumnRenamed("id", "src"), "src")
        .join(odeg, "src")
        .select(col("dst"), (col("pr") / col("outdeg").cast("double")).as("contrib"))
        .groupBy("dst").agg(graft.num.dsum(col("contrib")).as("s"))
      pr = ids.join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(0.15) / lit(n) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
    }
    pr
  }

  /** Per-vertex triangle count via canonical a<b edge orientation: each
    * triangle (x<y<z) is produced exactly once by e1=(x,y) ⋈ e2=(y,z) ⋈
    * e3=(x,z), then credited to its three corners. */
  def triangleCounts: DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val e1 = und.select(col("a").as("x"), col("b").as("y"))
    val e2 = und.select(col("a").as("y"), col("b").as("z"))
    val e3 = und.select(col("a").as("x"), col("b").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
    val corners = tri.select(col("x").as("id"))
      .unionAll(tri.select(col("y").as("id")))
      .unionAll(tri.select(col("z").as("id")))
    corners.groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** GraphX label propagation, fixed iterations. Tie-breaks are
    * implementation-defined ⇒ registered WITHOUT an oracle (rows-only). */
  def labelPropagation(iters: Int): DataFrame = {
    val sp = spark; import sp.implicits._
    lib.LabelPropagation.run(toGraphX, iters).vertices.toDF("id", "lp_label")
  }
}
