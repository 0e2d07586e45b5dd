package graft.graph

import graft.util.cut
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed greedy maximal matching — the locally-heaviest-edge BSP
  * (Preis '99 / Manne–Bisseling's parallel form) on DataFrames.
  *
  * Round: every vertex nominates its best incident edge under the TOTAL
  * order (w DESC, a, b); an edge whose BOTH endpoints nominated it is
  * matched (mutual-best — the distributed handshake); matched vertices and
  * all their edges leave the graph. The globally-best surviving edge is
  * always mutual-best, so every round matches ≥ 1 edge and the loop
  * terminates in ≤ ⌊V/2⌋ rounds (dense small graphs approach that bound;
  * sparse graphs finish in O(log V) expected). The greedy result is the
  * classic ½-approximation of maximum-weight matching, and under a total
  * edge order it is UNIQUE — any engine replaying the rounds gets the
  * identical edge set, which is what makes the unrolled DuckDB oracle an
  * exact replay rather than a property check.
  *
  * Scale shape per round: the nomination is ONE map-side-combinable
  * aggregate (MIN of a (−w, a, b) struct over the doubled edge list); the
  * handshake is a self-join of the V-sized nomination frame; removal is two
  * anti-joins of the shrinking edge list against the matched-vertex set.
  * Every loop frame passes through [[graft.util.cut]] — iterative
  * self-joins without a lineage cut square the plan per round. */
object Matching {

  /** Greedy mutual-best matching over undirected weighted `edges0`
    * (columns a, b, w; canonical a < b, unique (a, b)). Returns
    * (r, a, b, w): the matched edges tagged with the round that matched
    * them, sorted by (r, a, b). */
  def greedy(edges0: DataFrame): DataFrame = {
    val spark = edges0.sparkSession
    var e = cut(edges0.select("a", "b", "w"))
    var out = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "r INT, a BIGINT, b BIGINT, w DOUBLE"))
    var r = 1
    // ⌊V/2⌋ bounds the true round count; 64 is a runaway backstop only.
    while (r <= 64 && !e.isEmpty) {
      val half = e.select(col("a").as("v"), col("a"), col("b"), col("w"))
        .unionAll(e.select(col("b").as("v"), col("a"), col("b"), col("w")))
      val best = half
        .groupBy("v")
        .agg(min(struct((-col("w")).as("nw"), col("a"), col("b"))).as("s"))
        .select(col("v"), col("s.a").as("a"), col("s.b").as("b"),
          (-col("s.nw")).as("w"))
      val m = cut(best.filter(col("v") === col("a")).drop("v")
        .join(best.filter(col("v") === col("b")).select("a", "b"),
          Seq("a", "b"), "left_semi"))
      val mv = m.select(col("a").as("mid"))
        .unionAll(m.select(col("b").as("mid"))).distinct()
      out = out.unionByName(m.select(lit(r).as("r"), col("a"), col("b"), col("w")))
      e = cut(e.join(mv, e("a") === mv("mid"), "left_anti")
        .join(mv, e("b") === mv("mid"), "left_anti"))
      r += 1
    }
    cut(out).orderBy("r", "a", "b")
  }
}

/** Distributed densest-subgraph 4-approximation — Charikar's greedy peel in
  * its parallel form (Bahmani–Kumar–Vassilvitskii '12): each round drops
  * EVERY vertex whose degree is at most (1+ε)·average (ε = 1 here, so the
  * integer test is deg·n ≤ 4·e — no rationals cross the engines), and the
  * round whose snapshot maximizes e/n is the answer. With ε = 1 each round
  * keeps < n/2 vertices, so the loop is ⌈log₂ V⌉-bounded — the property
  * that makes the unrolled oracle finite and the 100 TB run O(log V)
  * passes over a monotonically shrinking edge list.
  *
  * Vertex set = the edge support (isolated vertices only dilute density);
  * a vertex that BECOMES isolated mid-peel stays in the snapshot until the
  * rule removes it (deg·n = 0 ≤ 4e always fires next round). */
object Densest {

  /** Peel `und` (columns a, b; canonical a < b, distinct). Returns one row
    * per non-empty round: (r, n_vertices, n_edges, is_best) with is_best
    * marking the density-maximal snapshot (ties → earliest round). */
  def peel(und0: DataFrame): DataFrame = {
    val spark = und0.sparkSession
    var e = cut(und0.select("a", "b"))
    var v = cut(e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id"))).distinct())
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 1
    while (r <= 64 && !v.isEmpty) {
      val n = v.count()
      val ecnt = e.count()
      stats += ((r, n, ecnt))
      val deg = v.join(
        e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("d")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("d"), lit(0L)).as("d"))
      val rem = deg.filter(col("d") * lit(n) <= lit(4L) * lit(ecnt))
        .select("id")
      v = cut(v.join(rem, Seq("id"), "left_anti"))
      e = cut(e.join(rem, e("a") === rem("id"), "left_anti")
        .join(rem, e("b") === rem("id"), "left_anti"))
      r += 1
    }
    import spark.implicits._
    // Density compare on the few-row stats frame: one IEEE division of
    // exact integer counts — bit-identical in both engines.
    val df = stats.toSeq.toDF("r", "n_vertices", "n_edges")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(
        (col("n_edges").cast("double") / col("n_vertices")).desc, col("r"))
    df.withColumn("is_best",
        when(row_number().over(w) === 1, 1).otherwise(0))
      .orderBy("r")
  }
}
