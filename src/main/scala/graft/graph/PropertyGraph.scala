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
  def varHop(sources: DataFrame, maxHops: Int): DataFrame =
    bfsMinDist(sources, edges.select("src", "dst"), maxHops)

  /** BFS over an arbitrary (src, dst) adjacency — shared by varHop (forward)
    * and minHopsTo (reversed). Each level is one equi-join + distinct +
    * anti-join. Every frontier is persisted: each level is referenced by
    * all later levels (expansion + anti-join), so an unpersisted loop
    * recomputes level h once per later level — exponential lineage blowup
    * (measured 40× on an 8-level BFS at sf0.1). */
  private def bfsMinDist(sources: DataFrame, adj: DataFrame, maxHops: Int): DataFrame = {
    // Frontiers are small (≤ one BFS level), so AQE plans each level as a
    // broadcast join of the frontier against the edge scan — the big side
    // never shuffles. No extra persist: `adj` is a projection of the
    // already-cached edges, and re-caching it was measured slower than the
    // cheap columnar re-scan. (A forced repartition-by-key layout lost too:
    // the 1.5M-row shuffle costs more than the broadcast probes it saves.)
    val adjP = adj
    var visited = sources.select(col("id"), lit(0).as("hops")).persist()
    var frontier = visited
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val next = frontier.select(col("id").as("src"))
        .join(adjP, "src")
        .select(col("dst").as("id"), lit(h).as("hops")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .persist()
      // Early stop: materializes this level's cache (reused by the final
      // action), so the check is ~free and saves all-empty tail levels.
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.unionAll(next).persist()
        frontier = next
      }
      h += 1
    }
    visited
  }

  /** GraphFrames-style motif finding: compile a pattern string into the
    * equivalent join pipeline. Pattern syntax: `(a)-[:label]->(b)` terms
    * separated by `;` — vertex variables join on reuse, the optional edge
    * label filters that hop, and every variable's vertex attributes come
    * back as `<var>_id/_label/_name/_val` columns. This is the traversal
    * DSL of the Blueprints family re-expressed declaratively: Catalyst
    * plans the joins (broadcast/SMJ/AQE) instead of element iteration. */
  def find(motif: String): DataFrame = {
    val Pat = """\((\w+)\)-\[(?::(\w+))?\]->\((\w+)\)""".r
    val pats = motif.split(";").map(_.trim).filter(_.nonEmpty).map {
      case Pat(s, l, d) => (s, Option(l), d)
      case other => throw new IllegalArgumentException(s"bad motif term: $other")
    }
    var bound = Set.empty[String]
    var df: DataFrame = null
    pats.zipWithIndex.foreach { case ((s, l, d), i) =>
      val e = l.foldLeft(edges)((e, lbl) => e.filter(col("label") === lbl))
        .select(col("src").as(s"${s}_id"), col("dst").as(s"${d}_id"),
          col("weight").as(s"e${i}_weight"))
      df = if (df == null) e
      else {
        val shared = Seq(s, d).filter(bound).map(v => s"${v}_id")
        if (shared.isEmpty) df.crossJoin(e) else df.join(e, shared)
      }
      bound ++= Seq(s, d)
    }
    bound.toSeq.sorted.foldLeft(df) { (d, v) =>
      d.join(vertices.select(col("id").as(s"${v}_id"),
        col("label").as(s"${v}_label"), col("name").as(s"${v}_name"),
        col("val").as(s"${v}_val")), s"${v}_id")
    }
  }

  /** GraphX view: vertex attr = val (nulls → 0.0), unit edge attr.
    * MEMORY_AND_DISK so 100 TB-scale graphs spill instead of OOM.
    * Built once per PropertyGraph instance (GraphX's internal routing-table
    * build is the expensive part; CC and Pregel reuse it). */
  lazy val toGraphX: Graph[Double, Long] = {
    // Fewer, fatter partitions: Pregel pays per-partition scheduling every
    // superstep; 8 × ~200k edges beats 32 × 50k at local scale (cluster
    // deployments would size this to executors instead).
    val vrdd = vertices.select(col("id"), coalesce(col("val"), lit(0.0))).rdd
      .map(r => (r.getLong(0), r.getDouble(1))).coalesce(8)
    val erdd = edges.select("src", "dst").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1L)).coalesce(8)
    Graph(vrdd, erdd, 0.0,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    // (EdgePartition2D was measured: it slows CC ~35% at this scale — the
    // repartition outweighs the message savings. Revisit on a real cluster.)
  }

  /** Connected components (GraphX Pregel, undirected min-id propagation).
    * Integer min is order-independent ⇒ deterministic, recursive-CTE
    * oracle-able. */
  def connectedComponents: DataFrame = {
    val sp = spark; import sp.implicits._
    toGraphX.connectedComponents().vertices.toDF("id", "component")
  }

  /** Min hop count from each vertex TO any vertex satisfying `targetPred`,
    * following edge direction: BFS from the targets along REVERSED edges.
    * DataFrame BFS beats GraphX ShortestPaths here (~10×): integer frontier
    * joins instead of per-vertex landmark-map messages. Unreachable vertices
    * are omitted. */
  def minHopsTo(targetPred: org.apache.spark.sql.Column, maxHops: Int): DataFrame =
    bfsMinDist(vertices.filter(targetPred),
      edges.select(col("dst").as("src"), col("src").as("dst")), maxHops)
      .select(col("id"), col("hops").as("dist"))

  /** Weighted single-source shortest paths via Pregel (edge weight =
    * `weight`, nulls → 1.0). Deterministic despite double arithmetic: each
    * candidate distance is a fixed-order sum along one path, and min over
    * candidates is order-independent — so the converged result is exact and
    * oracle-checkable. Unreached vertices are omitted. */
  def weightedSssp(sourcePred: org.apache.spark.sql.Column): DataFrame = {
    val sp = spark; import sp.implicits._
    val srcIds = vertices.filter(sourcePred).select("id").rdd
      .map(_.getLong(0)).collect().toSet // metadata-scale source set
    val vrdd = vertices.select("id").rdd.map(r => {
      val id = r.getLong(0)
      (id, if (srcIds.contains(id)) 0.0 else Double.PositiveInfinity)
    }).coalesce(8)
    val erdd = edges.select(col("src"), col("dst"),
      coalesce(col("weight"), lit(1.0))).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2))).coalesce(8)
    val g = Graph(vrdd, erdd, Double.PositiveInfinity,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val res = Pregel(g, Double.PositiveInfinity,
      activeDirection = EdgeDirection.Out)(
      (_, attr, msg) => math.min(attr, msg),
      t =>
        if (t.srcAttr != Double.PositiveInfinity &&
          t.srcAttr + t.attr < t.dstAttr)
          Iterator((t.dstId, t.srcAttr + t.attr))
        else Iterator.empty,
      math.min)
    res.vertices.filter(_._2 != Double.PositiveInfinity).toDF("id", "dist")
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

  /** Per-vertex triangle count via DEGREE-ordered edge orientation (orient
    * each undirected edge from its lower-(degree, id) endpoint to the
    * higher): wedge counts are bounded by arboricity instead of max degree —
    * the classic trick that keeps the intermediate join output near-linear
    * on skewed graphs (~30× fewer wedges than id-ordering on this fixture).
    * Each triangle is produced exactly once, then credited to its corners. */
  def triangleCounts: DataFrame = {
    // und is read 3× (degree count twice, orientation once) and ori 3×
    // (the triangle join's three legs) — persist both or Spark re-runs the
    // distinct/degree shuffles per reference.
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct().persist()
    val deg = und.select(col("a").as("id")).unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
    val ori = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("a")).otherwise(col("b")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        col("b")).otherwise(col("a")).as("v")).persist()
    val e1 = ori.select(col("u").as("x"), col("v").as("y"))
    val e2 = ori.select(col("u").as("y"), col("v").as("z"))
    val e3 = ori.select(col("u").as("x"), col("v").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
    // Credit all three corners in ONE pass over the triangle stream —
    // a 3-way union of selects over `tri` would re-execute the wedge join
    // per branch (measured 3× the cost).
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** DataFrame label propagation, fixed iterations, DETERMINISTIC tie-break
    * (max neighbor-label count, then min label) — unlike GraphX's
    * implementation-defined ties, this is oracle-checkable and avoids the
    * per-vertex label-histogram map messages that make GraphX LP slow.
    * Isolated vertices keep their own label. */
  def labelPropagation(iters: Int): DataFrame = {
    // (Persisting/coalescing und was measured slower: the cache build of the
    // doubled edge list costs more than three cheap re-scans of the cached
    // edges, and fewer partitions starve the message aggregation.)
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
    var lbl = vertices.select(col("id"), col("id").as("lbl")).persist()
    for (_ <- 1 to iters) {
      val pick = und.join(lbl.select(col("id").as("b"), col("lbl").as("l")), "b")
        .groupBy(col("a").as("id"), col("l")).agg(count(lit(1)).as("n"))
        .groupBy("id").agg(max(struct(col("n"), (-col("l")).as("negl"))).as("m"))
        .select(col("id"), (-col("m.negl")).as("l"))
      // lbl is referenced twice per iteration (message join + carry-over) —
      // persist each generation to keep lineage linear.
      lbl = lbl.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("l"), col("lbl")).as("lbl")).persist()
    }
    lbl.select(col("id"), col("lbl").as("lp_label"))
  }
}
