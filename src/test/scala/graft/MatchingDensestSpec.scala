package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-memory recomputations for graph_matching and graph_densest — the
  * independence net (LlmIndependenceSpec pattern): a plain-Scala replay of
  * each algorithm on collected inputs must equal the distributed output
  * row-for-row, plus the structural properties that define the algorithms
  * (matching validity + maximality; peel-trajectory density argmax). */
class MatchingDensestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs(): Seq[(Long, Long, Double)] = {
    Seq("lineitem", "orders", "customer", "supplier")
      .foreach(n => Tables(spark, TestSpark.sf, n).createOrReplaceTempView(n))
    spark.sql("""
      SELECT CAST(LEAST(s_nationkey, c_nationkey) AS BIGINT) AS a,
             CAST(GREATEST(s_nationkey, c_nationkey) AS BIGINT) AS b,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE) AS w
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey <> c_nationkey GROUP BY 1, 2""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  /** Plain-Scala greedy mutual-best matching under (w DESC, a, b). */
  private def refMatching(edges: Seq[(Long, Long, Double)]): Seq[(Int, Long, Long, Double)] = {
    var e = edges
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Double)]
    var r = 1
    while (e.nonEmpty) {
      val best = scala.collection.mutable.Map.empty[Long, (Long, Long, Double)]
      def ord(t: (Long, Long, Double)) = (-t._3, t._1, t._2)
      for (t @ (a, b, _) <- e; v <- Seq(a, b))
        if (!best.contains(v) ||
          Ordering[(Double, Long, Long)].lt(ord(t), ord(best(v)))) best(v) = t
      val m = e.filter(t => best(t._1) == t && best(t._2) == t)
      val mv = m.flatMap(t => Seq(t._1, t._2)).toSet
      out ++= m.map(t => (r, t._1, t._2, t._3))
      e = e.filterNot(t => mv(t._1) || mv(t._2))
      r += 1
    }
    out.sortBy(t => (t._1, t._2, t._3)).toSeq
  }

  test("graph_matching equals the in-memory greedy replay") {
    val got = SparkEntry.queries("graph_matching")(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = refMatching(pairs())
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("graph_matching is a valid MAXIMAL matching") {
    val m = SparkEntry.queries("graph_matching")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val touched = m.flatMap(t => Seq(t._1, t._2))
    assert(touched.distinct.size == touched.size, "a vertex is matched twice")
    val mv = touched.toSet
    val uncovered = pairs().filter(t => !mv(t._1) && !mv(t._2))
    assert(uncovered.isEmpty, s"not maximal: ${uncovered.take(3)} addable")
  }

  test("graph_vertex_cover covers every edge and is exactly 2x its matching") {
    val cover = SparkEntry.queries("graph_vertex_cover")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    val edges = graph.GraphFixture(spark, TestSpark.sf).undirectedEdges
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val uncovered = edges.filterNot(e => cover(e._1) || cover(e._2))
    assert(uncovered.isEmpty, s"uncovered edges: ${uncovered.take(3)}")
    // replay the unweighted mutual-best matching; endpoints == the cover
    var e = edges
    val mv = scala.collection.mutable.Set.empty[Long]
    var nMatched = 0
    while (e.nonEmpty) {
      val best = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      for (t @ (a, b) <- e; v <- Seq(a, b))
        if (!best.contains(v) || Ordering[(Long, Long)].lt(t, best(v))) best(v) = t
      val m = e.filter(t => best(t._1) == t && best(t._2) == t)
      nMatched += m.size
      mv ++= m.flatMap(t => Seq(t._1, t._2))
      e = e.filterNot(t => mv(t._1) || mv(t._2))
    }
    assert(cover == mv.toSet)
    assert(cover.size == 2 * nMatched) // matched endpoints are disjoint
  }

  test("maximalMatching: sequential local tail == BSP rounds (edge-set equality)") {
    val und = graph.GraphFixture(spark, TestSpark.sf).undirectedEdges
      .withColumn("w", org.apache.spark.sql.functions.lit(1.0))
    val bsp = graph.Matching.greedy(und, localThreshold = 0)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = graph.Matching.maximalMatching(und, localThreshold = Long.MaxValue)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hybrid = graph.Matching.maximalMatching(und, localThreshold = 2000)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bsp == local, "sequential greedy diverged from the BSP rounds")
    assert(bsp == hybrid, "hybrid head+tail diverged from the BSP rounds")
    assert(bsp.nonEmpty)
  }

  test("graph_mis is independent, maximal, and equals the greedy-by-id replay") {
    val mis = SparkEntry.queries("graph_mis")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    val edges = graph.GraphFixture(spark, TestSpark.sf).undirectedEdges
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // independence: no edge inside the set
    assert(edges.forall(e => !(mis(e._1) && mis(e._2))))
    // maximality: every non-member has a member neighbor
    val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val support = adj.keySet
    assert((support -- mis).forall(v => adj(v).exists(mis)))
    // lexicographic-greedy replay: smallest-id-first sequential scan
    val want = scala.collection.mutable.Set.empty[Long]
    for (v <- support.toSeq.sorted)
      if (!adj(v).exists(want)) want += v
    assert(mis == want.toSet)
    // hybrid paths (pure BSP / pure sequential / mixed) agree
    val und = graph.GraphFixture(spark, TestSpark.sf).undirectedEdges
    val bsp = graph.Mis.greedy(und, localThreshold = 0)
      .collect().map(_.getLong(0)).toSet
    val seq = graph.Mis.greedy(und, localThreshold = Long.MaxValue)
      .collect().map(_.getLong(0)).toSet
    val mixed = graph.Mis.greedy(und, localThreshold = 2000)
      .collect().map(_.getLong(0)).toSet
    assert(bsp == mis && seq == mis && mixed == mis)
  }

  test("graph_coloring is proper, equals the greedy-by-id replay, hybrid == BSP") {
    val got = SparkEntry.queries("graph_coloring")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = graph.GraphFixture(spark, TestSpark.sf).undirectedEdges
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // proper: no edge within a color class
    assert(edges.forall(e => got(e._1) != got(e._2)))
    // sequential greedy-by-id replay (color classes = iterated lex MIS)
    val smaller = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val want = scala.collection.mutable.Map.empty[Long, Int]
    for (v <- got.keys.toSeq.sorted) {
      val used = smaller.getOrElse(v, Seq.empty).map(want).toSet
      want(v) = Iterator.from(1).find(k => !used(k)).get
    }
    assert(got == want.toMap)
    // hybrid path (BSP head, threshold forces at least one BSP layer)
    // equals pure BSP and pure sequential
    val und = graph.GraphFixture(spark, TestSpark.sf).undirectedEdges
    val bsp = graph.Coloring.greedy(und, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hybrid = graph.Coloring.greedy(und, localThreshold = 500)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bsp == got)
    assert(hybrid == got)
    assert(got.values.max >= 3, "colocated triangles force >= 3 colors")
  }

  /** Plain-Scala ε=1 Charikar peel over collected undirected edges. */
  private def refPeel(edges: Seq[(Long, Long)]): Seq[(Int, Long, Long)] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    for ((a, b) <- edges) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    var v = adj.keySet.toSet
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 1
    while (v.nonEmpty) {
      val n = v.size.toLong
      val e = v.toSeq.map(x => adj(x).size).sum / 2
      rows += ((r, n, e))
      val rem = v.filter(x => adj(x).size * n <= 4 * e)
      for (x <- rem) { for (u <- adj(x)) adj(u) -= x; adj -= x }
      v --= rem
      r += 1
    }
    rows.toSeq
  }

  test("graph_densest trajectory equals the in-memory peel; is_best is the density argmax") {
    val got = SparkEntry.queries("graph_densest")(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val edges = graph.GraphFixture(spark, TestSpark.sf).undirectedEdges
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = refPeel(edges)
    assert(got.map(t => (t._1, t._2, t._3)) == want)
    val best = got.maxBy(t => (t._3.toDouble / t._2, -t._1))
    assert(got.filter(_._4 == 1).map(_._1) == Seq(best._1))
    // the best snapshot strictly beats the full graph unless it IS round 1
    assert(best._3.toDouble / best._2 >=
      want.head._3.toDouble / want.head._2)
  }
}
