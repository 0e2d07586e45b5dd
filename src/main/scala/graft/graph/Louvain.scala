package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.cut

/** One Louvain LEVEL — modularity-OPTIMIZING community detection (Blondel
  * et al. '08), in the synchronous-sweep form that distributes: every
  * sweep, ALL vertices simultaneously evaluate the standard Louvain gain
  * of moving into each neighboring community — computed against the
  * PREVIOUS sweep's assignment, so a sweep is three equi-join/groupBy
  * passes over the half-edge list, never a sequential scan — and move to
  * the best strictly-improving community (ties → smallest community id).
  * Synchronous sweeps are the Louvain analog of graph_labelprop's
  * synchronous propagation: deterministic, BSP-shaped, and exactly
  * replayable as unrolled SQL (GraphSql.louvainChain), which sequential
  * vertex-at-a-time Louvain is not. Complements graph_labelprop (label
  * flooding, no objective) and graph_modularity (scores a given labeling):
  * this key MOVES vertices to improve the score.
  *
  * Gain arithmetic: for vertex i and candidate community C under
  * assignment c, with k_i = deg(i), k_iC = edges from i into C, and
  * tot'_C = Σ_{v∈C} deg(v) minus k_i when C is i's own community (the
  * standard remove-first convention),
  *     score(i,C) = 2m·k_iC − k_i·tot'_C
  * which orders candidates exactly like ΔQ (the dropped terms do not
  * depend on C). ALL-INTEGER, widened to DECIMAL(38,0): 2m·k_iC crosses
  * 2⁶³ near 1e13 half-edges, inside the 100 TB design envelope, and the
  * widened products stay exact and identical in both engines (the
  * text_collocations lesson). A vertex moves only when the best
  * candidate's score strictly exceeds the stay score.
  *
  * MOVE SCHEDULING: only the parity class (id + sweep) % 2 = 0 may move
  * each sweep (the 2-coloring special case of the coloring-based
  * scheduling distributed Louvain uses, e.g. Ghosh et al. '18):
  * unscheduled synchronous moves let adjacent vertices SWAP communities
  * and oscillate — measured Q −0.0018 → −0.0059 on the spec fixture —
  * while alternating parities merges properly (movers join a frozen
  * side). Sweep count is a FIXED parameter (graded key: 4 — each parity
  * moves twice), not a convergence loop: fixed sweeps make the unrolled
  * oracle finite and the cross-engine replay exact, the lp3 discipline.
  *
  * Scale: each sweep = one half-edge × assignment join (edge-linear, the
  * dominant shuffle), one community-degree aggregate (community-sized),
  * one window pick partitioned by vertex (vertex-sized). Loop state is
  * the (id, comm) frame, cut() once per sweep; degrees and 2m are
  * sweep-invariant and computed once. */
object Louvain {

  /** Run `sweeps` synchronous sweeps over undirected simple edges
    * (columns a, b; canonical a < b, distinct). Returns (id, community)
    * over the edge support, sorted by id. */
  def oneLevel(und0: DataFrame, sweeps: Int): DataFrame = {
    val und = cut(und0.select("a", "b"))
    val half = und.select(col("a").as("i"), col("b").as("j"))
      .unionAll(und.select(col("b").as("i"), col("a").as("j")))
      .withColumn("w", lit(1L))
    val deg = cut(half.groupBy("i").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("i", "id"))
    weightedSweeps(half, deg, sweeps)
  }

  /** The sweep loop over an arbitrary WEIGHTED half-edge list — the
    * second-and-up Louvain level runs here: after contraction the graph
    * carries integer edge weights (inter-community edge counts) and
    * node strengths that include 2× the community's internal weight
    * (self-loops travel with the node, never enter k_iC — the standard
    * contracted-graph convention). `half` is (i, j, w) in BOTH
    * directions; `deg` is (id, deg) = the strength Σ_j w_ij + 2·w_self
    * (for a simple unweighted graph w = 1 and deg = degree, which is
    * how [[oneLevel]] delegates). All gain arithmetic stays the integer
    * DECIMAL(38,0) form — weights are edge counts. */
  def weightedSweeps(half: DataFrame, deg: DataFrame,
      sweeps: Int): DataFrame = {
    // 2m: one 1-row scalar action, sweep-invariant.
    val m2 = deg.agg(sum("deg")).head.getLong(0)
    // NO broadcast hints on the vertex-sized sweep frames: driver-
    // collected broadcast builds per sweep × 4 sweeps cost more than the
    // sort-merge exchanges they replace (measured 15.3 → 19.2 s at sf0.1
    // when hinted — the Mis/Coloring guard pattern pays off only for ONE
    // shrinking frame per round, not several stable ones). AQE's runtime
    // stats still broadcast the community-sized tot join dynamically.
    // The loop state FUSES deg into the assignment frame (id, comm, deg):
    // deg is sweep-invariant, and carrying it drops two per-sweep joins
    // (the separate own/deg lookups) plus tot's deg join.
    var c = cut(deg.select(col("id"), col("id").as("comm"), col("deg")))
    var t = 1
    while (t <= sweeps) {
      // Only this sweep's parity class evaluates moves (see scaladoc);
      // the filter lands on the HALF-EDGE STREAM before the gain fold,
      // so the sweep's dominant shuffle is half-sized too.
      val elig = (col("i") + lit(t.toLong)) % 2 === 0
      val kic = half.filter(elig)
        .join(c.select(col("id").as("j"), col("comm").as("cc")), "j")
        .groupBy("i", "cc").agg(sum("w").as("k"))
      val tot = c.groupBy("comm").agg(sum("deg").as("tot"))
      val own = c.select(col("id").as("i"), col("comm").as("own"),
        col("deg")).filter(elig)
      // Own community is always a candidate (k_i,own may be 0 when no
      // neighbor shares it) — the MAX(k) fold dedups it against kic.
      val cand = kic
        .unionByName(own.select(col("i"), col("own").as("cc"),
          lit(0L).as("k")))
        .groupBy("i", "cc").agg(max("k").as("k"))
      val scored = cand
        .join(own, "i")
        .join(tot.withColumnRenamed("comm", "cc"), "cc")
        .withColumn("score",
          lit(m2).cast("decimal(38,0)") * col("k")
            - col("deg").cast("decimal(38,0)") *
              (col("tot") - when(col("cc") === col("own"), col("deg"))
                .otherwise(lit(0L))))
      // stay score via a WINDOW over the same per-vertex partitioning the
      // pick below uses — NOT a scored⋈scored self-join: Spark INLINES a
      // twice-referenced subplan, so the self-join form executed the
      // whole sweep chain (kic + 3 joins) twice per sweep. Every i has
      // exactly one cc = own row (cand unions it in), so the MAX is total.
      val byI = Window.partitionBy("i")
      val picked = scored
        .withColumn("stay", max(when(col("cc") === col("own"),
          col("score"))).over(byI))
        .filter(col("cc") === col("own") || col("score") > col("stay"))
        .withColumn("rn", row_number().over(
          byI.orderBy(col("score").desc, col("cc"))))
        .filter(col("rn") === 1)
        .select(col("i").as("id"), col("cc").as("comm"), col("deg"))
      c = cut(picked.unionByName(
        c.filter((col("id") + lit(t.toLong)) % 2 =!= 0)))
      t += 1
    }
    c.select("id", "comm").orderBy("id")
  }
}
