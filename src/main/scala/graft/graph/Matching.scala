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
    * them, sorted by (r, a, b).
    *
    * `localThreshold` > 0 enables the SMALL-REMAINDER TAIL (the
    * Boruvka.msf hybrid): once the surviving edge relation fits under
    * the threshold, the remaining rounds replay executor-locally in one
    * task — the SAME deterministic round semantics (round tags continue),
    * so BSP-only and hybrid outputs are identical (pinned in
    * MatchingDensestSpec). Maximal matching genuinely needs many rounds
    * on hub-and-chain graphs (the mutual-best handshake matches a hub at
    * most once per round), and the late rounds touch metadata-scale
    * remainders — paying a full distributed barrier apiece for them is
    * pure overhead at any deployment size. */
  def greedy(edges0: DataFrame, localThreshold: Long = 0L): DataFrame = {
    val spark = edges0.sparkSession
    // No cut on round 0: the input is a stored artifact (stats intact for
    // the first round's planning); cut() guards REASSIGNED loop frames,
    // and `e` only needs it from the first shrink on.
    var e = edges0.select("a", "b", "w")
    var cnt = e.count()
    var out = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "r INT, a BIGINT, b BIGINT, w DOUBLE"))
    var r = 1
    // ⌊V/2⌋ bounds the true round count; 64 is a runaway backstop only —
    // but localTail materializes its input in ONE task, so the backstop
    // may only exit once the remainder fits a single task's scan
    // (adversarial monotone path weights need ~E/2 rounds; funneling an
    // O(E) remainder into toArray would be a single-executor OOM). The
    // loop always terminates: the globally max-weight edge is mutual-best
    // every round, so cnt strictly decreases.
    // THREE actions per round — the cut of the nomination frame, the cut
    // of the shrunken edge list, and its count. Everything else (the
    // handshake join, the matched-vertex set, the per-round output slice)
    // stays LAZY over the two checkpointed frames: per-round fixed action
    // latency, not data volume, dominates a many-round BSP on a shrinking
    // relation, so the loop's job count is the thing to engineer down.
    val oneTaskCap = 16000000L
    while (cnt > 0 && cnt > localThreshold && (r <= 64 || cnt > oneTaskCap)) {
      val half = e.select(col("a").as("v"), col("a"), col("b"), col("w"))
        .unionAll(e.select(col("b").as("v"), col("a"), col("b"), col("w")))
      // CUT the nomination frame before the handshake: both join sides
      // derive from it, and an uncut plan would run the (dominant)
      // min-struct aggregate twice per round.
      val best = cut(half
        .groupBy("v")
        .agg(min(struct((-col("w")).as("nw"), col("a"), col("b"))).as("s"))
        .select(col("v"), col("s.a").as("a"), col("s.b").as("b"),
          (-col("s.nw")).as("w")), eager = false)
      val m = cut(best.filter(col("v") === col("a")).drop("v")
        .join(best.filter(col("v") === col("b")).select("a", "b"),
          Seq("a", "b"), "left_semi"), eager = false)
      // ≤ 2·matched rows, V/2-bounded — broadcast by construction (a cut
      // frame has no stats, AQE can't see it; deployments with larger
      // matches per round swap the hint for a stats-aware choice).
      val mv = broadcast(m.select(col("a").as("mid"))
        .unionAll(m.select(col("b").as("mid"))))
      out = out.unionByName(m.select(lit(r).as("r"), col("a"), col("b"), col("w")))
      // LAZY cuts throughout the round (the hits half-round lesson):
      // nothing consumes best/m/e until this count fires, so the whole
      // round materializes in one job tree instead of one job per cut.
      e = cut(e.join(mv, e("a") === mv("mid"), "left_anti")
        .join(mv, e("b") === mv("mid"), "left_anti"), eager = false)
      cnt = e.count()
      r += 1
    }
    if (cnt > 0) out = out.unionByName(localTail(e, r))
    cut(out).orderBy("r", "a", "b")
  }

  /** The matching WITHOUT round tags (a, b, w) — for consumers like the
    * vertex cover that only need the edge set. Same BSP head; the local
    * tail is the SEQUENTIAL greedy scan (edges in (w DESC, a, b) order,
    * take iff both endpoints free), which computes the IDENTICAL edge set
    * to the round loop: locally-greedy = globally-greedy under a total
    * order (Preis '99 — the round algorithm peels successive local
    * minima, the scan takes the same edges in rank order; equivalence
    * pinned in MatchingDensestSpec). One O(E log E) pass instead of
    * per-round O(E) passes — the right tail shape when the remainder
    * still has many rounds left. */
  def maximalMatching(edges0: DataFrame, localThreshold: Long = 0L): DataFrame = {
    val spark = edges0.sparkSession
    var e = edges0.select("a", "b", "w") // cut from the first shrink on
    var cnt = e.count()
    var out = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "a BIGINT, b BIGINT, w DOUBLE"))
    var r = 1
    while (r <= 64 && cnt > 0 && cnt > localThreshold) {
      val half = e.select(col("a").as("v"), col("a"), col("b"), col("w"))
        .unionAll(e.select(col("b").as("v"), col("a"), col("b"), col("w")))
      val best = cut(half
        .groupBy("v")
        .agg(min(struct((-col("w")).as("nw"), col("a"), col("b"))).as("s"))
        .select(col("v"), col("s.a").as("a"), col("s.b").as("b"),
          (-col("s.nw")).as("w")), eager = false)
      val m = cut(best.filter(col("v") === col("a")).drop("v")
        .join(best.filter(col("v") === col("b")).select("a", "b"),
          Seq("a", "b"), "left_semi"), eager = false)
      val mv = broadcast(m.select(col("a").as("mid"))
        .unionAll(m.select(col("b").as("mid"))))
      out = out.unionByName(m.select(col("a"), col("b"), col("w")))
      // LAZY cuts throughout the round (the hits half-round lesson):
      // nothing consumes best/m/e until this count fires, so the whole
      // round materializes in one job tree instead of one job per cut.
      e = cut(e.join(mv, e("a") === mv("mid"), "left_anti")
        .join(mv, e("b") === mv("mid"), "left_anti"), eager = false)
      cnt = e.count()
      r += 1
    }
    if (cnt > 0) {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "a BIGINT, b BIGINT, w DOUBLE")
      // Sort DISTRIBUTEDLY (Tungsten range sort), CUT, then scan the rank
      // order through one task. The cut between sort and coalesce is
      // load-bearing twice over: (a) `orderBy(...).coalesce(1)` collapses
      // the whole sort into ONE partition (measured 33–80 s at the 10×
      // probe vs ~3 s distributed); (b) localCheckpoint freezes partition
      // order, and coalesce(1) without shuffle concatenates the
      // range-sorted partitions in index order — so the stream arrives
      // globally sorted and the greedy scan is one O(E) pass with a
      // free-set (the inherently sequential step of greedy matching).
      val sorted = cut(e.select("a", "b", "w")
        .orderBy(col("w").desc, col("a"), col("b")))
      val rdd = sorted.coalesce(1).rdd.mapPartitions { it =>
        val used = new java.util.HashSet[Long]()
        it.filter { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          if (used.contains(a) || used.contains(b)) false
          else { used.add(a); used.add(b); true }
        }
      }
      out = out.unionByName(spark.createDataFrame(rdd, schema))
    }
    cut(out)
  }

  /** Executor-local continuation: the identical mutual-best round loop
    * over the (threshold-bounded) remainder in one task — one coalesced
    * partition, never a driver collect (Boruvka.localMsf's shape). */
  private def localTail(e: DataFrame, r0: Int): DataFrame = {
    val spark = e.sparkSession
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "r INT, a BIGINT, b BIGINT, w DOUBLE")
    val rdd = e.select("a", "b", "w").coalesce(1).rdd.mapPartitions { it =>
      var es = it.map(row => (row.getLong(0), row.getLong(1),
        row.getDouble(2))).toArray
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      var r = r0
      while (es.nonEmpty) {
        val best = scala.collection.mutable
          .Map.empty[Long, (Double, Long, Long)]
        es.foreach { case (a, b, w) =>
          val k = (-w, a, b)
          Seq(a, b).foreach { v =>
            if (!best.contains(v) ||
              Ordering[(Double, Long, Long)].lt(k, best(v))) best(v) = k
          }
        }
        val m = es.filter { case (a, b, w) =>
          best(a) == ((-w, a, b)) && best(b) == ((-w, a, b)) }
        val mv = m.flatMap(t => Seq(t._1, t._2)).toSet
        m.foreach { case (a, b, w) =>
          out += org.apache.spark.sql.Row(r, a, b, w) }
        es = es.filter(t => !mv(t._1) && !mv(t._2))
        r += 1
      }
      out.iterator
    }
    spark.createDataFrame(rdd, schema)
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
    * marking the density-maximal snapshot (ties → earliest round).
    *
    * Loop state is the DEGREE frame (id, d) — one row per surviving
    * vertex — so each round is: ONE scalar aggregate over it (n and Σd =
    * 2e together), a survivor filter, and the edge shrink. The shrink is
    * two SEMI-joins against the survivor set, not anti-joins against the
    * removed set: the ε=1 rule keeps < n/2 vertices per round, so the
    * JOINED side collapses geometrically and is explicitly broadcast
    * (a cut frame has no stats — AQE can't discover broadcastability on
    * its own), making the dominant first rounds map-side over the big
    * edge list with zero edge shuffle. */
  def peel(und0: DataFrame): DataFrame = {
    val spark = und0.sparkSession
    var e = und0.select("a", "b") // cut from the first shrink on
    def degOf(ed: DataFrame, verts: Option[DataFrame]): DataFrame = {
      val cnt = ed.select(col("a").as("id"))
        .unionAll(ed.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      verts match {
        case None => cnt
        case Some(v) => v.join(cnt, Seq("id"), "left")
          .select(col("id"), coalesce(col("d"), lit(0L)).as("d"))
      }
    }
    var deg = cut(degOf(e, None), eager = false)
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 1
    var done = false
    while (r <= 64 && !done) {
      val row = deg.agg(count(lit(1)).as("n"), sum("d").as("sd")).head
      val n = row.getLong(0)
      if (n == 0) done = true
      else {
        val ecnt = if (row.isNullAt(1)) 0L else row.getLong(1) / 2
        stats += ((r, n, ecnt))
        val surv = cut(deg
          .filter(col("d") * lit(n) > lit(4L) * lit(ecnt)).select("id"),
          eager = false)
        // < n/2 by the ε=1 rule, but guard the hint anyway: at deployment
        // scale an early round's survivor set can exceed executor memory,
        // and a shuffle semi-join is the correct fallback there.
        val sb = if (surv.count() <= 4000000) broadcast(surv) else surv
        // lazy: the next round's scalar aggregate over deg materializes
        // the e/deg pair in one job tree
        e = cut(e.join(sb, e("a") === sb("id"), "left_semi")
          .join(sb, e("b") === sb("id"), "left_semi"), eager = false)
        deg = cut(degOf(e, Some(surv)), eager = false)
        r += 1
      }
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

/** Deterministic maximal independent set — the id-ordered local-minimum
  * rounds (Luby's algorithm with the vertex id as the fixed priority, so
  * the result is THE lexicographically-greedy MIS — unique, replayable,
  * and equal to the sequential smallest-id-first scan). With canonical
  * (a < b) edges the per-round winner test collapses to set algebra: a
  * vertex has an alive smaller neighbor iff it appears as some edge's `b`,
  * so winners = alive ∖ {b-side of alive edges} — one anti-join, no
  * neighborhood explosion. Winners' neighbors die; edges shrink to the
  * alive×alive rest. Hub-first ids (regions/nations carry the smallest
  * ids in the fixture encoding) collapse the graph in ~3 rounds. */
object Mis {

  /** MIS over the support of `und0` (columns a, b; canonical a < b,
    * distinct). Returns the MIS vertex ids, sorted.
    *
    * `localThreshold` > 0 enables the sequential tail (the family's
    * hybrid): the lexicographic MIS equals the greedy-by-id scan (add v
    * iff no smaller neighbor was added), so once the remaining edge
    * relation fits one task it streams through the same (b, a)-sorted
    * mex-style pass the coloring tail uses — a vertex first seen as `a`
    * that was never a `b` has no smaller neighbors and joins the MIS on
    * sight. Hybrid ≡ BSP equality pinned in MatchingDensestSpec. */
  def greedy(und0: DataFrame, localThreshold: Long = 0L): DataFrame = {
    val spark = und0.sparkSession
    var e = und0.select("a", "b") // cut from the first shrink on
    var out = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"))
    var r = 1
    var eCnt = e.count()
    // `alive` starts as support(e) — built LAZILY (null encodes exactly
    // "alive ≡ support(e)"): when the sequential tail fires immediately
    // (edge count under localThreshold, the common case at moderate SF),
    // the post-loop "isolated alive vertices" anti-join is empty BY
    // CONSTRUCTION and the support distinct+cut (a full shuffle of the
    // doubled edge list) never needs to run at all.
    var alive: DataFrame = null
    var aliveCnt = 0L
    if (eCnt > localThreshold) {
      alive = cut(e.select(col("a").as("id"))
        .unionAll(e.select(col("b").as("id"))).distinct(), eager = false)
      aliveCnt = alive.count()
    }
    while (r <= 64 && aliveCnt > 0 && eCnt > localThreshold) {
      // Hints guarded by cheap counts on already-materialized frames: cut
      // frames carry no stats, so AQE can't see broadcastability, but an
      // adversarial round can have O(V) winners where shuffle is right.
      def hinted(df: DataFrame): DataFrame =
        if (df.count() <= 4000000) broadcast(df) else df
      val losers = e.select(col("b").as("id")).distinct()
      val winners = cut(alive.join(losers, Seq("id"), "left_anti"),
        eager = false)
      val wb = hinted(winners)
      val dead = e.join(wb, e("a") === wb("id"), "left_semi")
        .select(col("b").as("id")).distinct()
      out = out.unionByName(winners)
      alive = cut(alive.join(winners, Seq("id"), "left_anti")
        .join(dead, Seq("id"), "left_anti"), eager = false)
      val ab = hinted(alive)
      e = cut(e.join(ab, e("a") === ab("id"), "left_semi")
        .join(ab, e("b") === ab("id"), "left_semi"), eager = false)
      aliveCnt = alive.count()
      eCnt = e.count()
      r += 1
    }
    if (eCnt > 0 && (alive == null || aliveCnt > 0)) {
      // Sequential tail: greedy-by-id over the (b, a)-sorted stream (cut
      // between sort and coalesce — the cover-tail lesson).
      val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
      val sortedE = cut(e.select("a", "b").orderBy("b", "a"))
      val rdd = sortedE.coalesce(1).rdd.mapPartitions { it =>
        val inMis = new java.util.HashMap[Long, java.lang.Boolean]()
        val outRows = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.Row]
        var curB = Long.MinValue
        var open = false
        var blocked = false
        def flush(): Unit = if (open) {
          inMis.put(curB, java.lang.Boolean.valueOf(!blocked))
          if (!blocked) outRows += org.apache.spark.sql.Row(curB)
        }
        it.foreach { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          if (!open || b != curB) { flush(); curB = b; open = true; blocked = false }
          var ma = inMis.get(a)
          if (ma == null) {
            ma = java.lang.Boolean.TRUE
            inMis.put(a, ma)
            outRows += org.apache.spark.sql.Row(a)
          }
          if (ma.booleanValue()) blocked = true
        }
        flush()
        outRows.iterator
      }
      out = out.unionByName(spark.createDataFrame(rdd, schema))
      // alive vertices with no remaining edges are trivially in the MIS
      // (when the loop never ran, alive ≡ support(e) and this set is
      // empty — alive == null skips it)
      if (alive != null) {
        val supp = e.select(col("a").as("id"))
          .unionAll(e.select(col("b").as("id"))).distinct()
        out = out.unionByName(alive.join(supp, Seq("id"), "left_anti"))
      }
    } else if (alive != null && aliveCnt > 0) {
      out = out.unionByName(alive) // all isolated ⇒ all in the MIS
    }
    cut(out).orderBy("id")
  }
}

/** Distributed greedy graph coloring — ITERATED lexicographic MIS: color
  * class k is the id-priority MIS of the graph left after classes 1..k−1
  * (each layer delegates to [[Mis]]'s round loop). This equals SEQUENTIAL
  * greedy coloring in ascending id order (class 1 is exactly the lex MIS —
  * a vertex takes color 1 iff no smaller neighbor did — and inductively
  * class k is the lex MIS of the remainder), which is what makes the
  * hybrid sound: above `localThreshold` the layers run as BSP MIS rounds,
  * below it ONE task colors the remainder sequentially (ascending id,
  * smallest color unused by smaller neighbors), with the class↔layer
  * equivalence pinned in MatchingDensestSpec. Colors used ≤ Δ+1; the
  * fixture's layered id encoding (regions < nations < customers < …)
  * converges in 3 colors. */
object Coloring {

  /** Color the support of `und0` (columns a, b; canonical a < b,
    * distinct). Returns (id, color), sorted by id. */
  def greedy(und0: DataFrame, localThreshold: Long = 0L): DataFrame = {
    val spark = und0.sparkSession
    var remE = und0.select("a", "b") // cut from the first shrink on
    var cnt = remE.count()
    var out = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, color INT"))
    var c = 1
    // remV lazily, like Mis.greedy's `alive`: null encodes
    // "remV ≡ support(remE)", under which the tail's isolated-vertex set
    // is empty by construction and the support distinct+cut is skipped.
    var remV: DataFrame = null
    if (cnt > localThreshold)
      remV = cut(remE.select(col("a").as("id"))
        .unionAll(remE.select(col("b").as("id"))).distinct(), eager = false)
    while (c <= 64 && cnt > 0 && cnt > localThreshold) {
      val mis = Mis.greedy(remE).select(col("id"))
      val supp = remE.select(col("a").as("id"))
        .unionAll(remE.select(col("b").as("id"))).distinct()
      val isolated = remV.join(supp, Seq("id"), "left_anti")
      val layer = cut(mis.unionAll(isolated), eager = false)
      out = out.unionByName(layer.select(col("id"), lit(c).as("color")))
      remV = cut(remV.join(layer, Seq("id"), "left_anti"), eager = false)
      // remV shrinks by only ONE MIS layer per iteration and can stay
      // ~|V| for many layers — guard the hint like Mis.greedy/Densest.peel
      // (a cut frame has no stats, so AQE can't pick broadcast itself,
      // but an O(V) remainder must take the shuffle semi-join).
      val rb = if (remV.count() <= 4000000) broadcast(remV) else remV
      remE = cut(remE.join(rb, remE("a") === rb("id"), "left_semi")
        .join(rb, remE("b") === rb("id"), "left_semi"), eager = false)
      cnt = remE.count()
      c += 1
    }
    if (cnt > 0) {
      // Sequential tail as a STREAMING mex pass: edges arrive sorted by
      // (b, a) — distributed Tungsten sort, cut before coalesce(1) (the
      // cover-tail lesson: `orderBy(...).coalesce(1)` collapses the sort
      // into one partition) — so each vertex's smaller-neighbor group is
      // contiguous and every smaller endpoint is already resolved when
      // its group arrives: a vertex first seen as `a` that was never a
      // `b` has no smaller neighbors (its smaller-edges would have keyed
      // to an earlier group) ⇒ color 1 on sight. One O(E) scan, one
      // color map, no adjacency materialization.
      val base = c - 1
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, color INT")
      val sortedE = cut(remE.select("a", "b").orderBy("b", "a"))
      val rdd = sortedE.coalesce(1).rdd.mapPartitions { it =>
        val color = new java.util.HashMap[Long, Integer]()
        val outRows = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.Row]
        val used = new java.util.HashSet[Int]()
        var curB = Long.MinValue
        var open = false
        def flush(): Unit = if (open) {
          var k = 1
          while (used.contains(k)) k += 1
          color.put(curB, k)
          outRows += org.apache.spark.sql.Row(curB, base + k)
          used.clear()
        }
        it.foreach { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          if (!open || b != curB) { flush(); curB = b; open = true }
          var ca = color.get(a)
          if (ca == null) {
            ca = Integer.valueOf(1)
            color.put(a, ca)
            outRows += org.apache.spark.sql.Row(a, base + 1)
          }
          used.add(ca.intValue())
        }
        flush()
        outRows.iterator
      }
      val tail = spark.createDataFrame(rdd, schema)
      out = out.unionByName(tail)
      // remaining vertices with no remaining edges take the first free
      // color (empty by construction when the loop never ran: remV ≡
      // support(remE) then — remV == null skips the two-distinct anti-join)
      if (remV != null) {
        val supp = remE.select(col("a").as("id"))
          .unionAll(remE.select(col("b").as("id"))).distinct()
        val iso = remV.join(supp, Seq("id"), "left_anti")
          .select(col("id"), lit(c).as("color"))
        out = out.unionByName(iso)
      }
    } else if (remV != null && !remV.isEmpty) {
      // edges exhausted but vertices remain (all isolated): one layer
      out = out.unionByName(remV.select(col("id"), lit(c).as("color")))
    }
    cut(out).orderBy("id")
  }
}
