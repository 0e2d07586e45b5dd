package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale blow-up bench (VERDICT r8 "missing #1"): replicate the
  * sf0.1 fixtures K× (default 10×) with per-replica key shifts, re-run the
  * expensive operator keys on BOTH the base and the blown-up directory in
  * the SAME JVM, and report paired timings + plan-shape checks. This turns
  * the repo's 100×-scale design arguments into measurements: does the
  * eccentricity level chain, the k-core peel, the LSH banding, the
  * streaming minhash fold actually hold shape when the data outgrows the
  * sizes every previous number was taken at?
  *
  * Blow-up construction — each replica r ∈ [0, K) is a structurally
  * disjoint copy, not a row-duplication (duplicating rows verbatim would
  * change SEMANTICS, not scale: 10× duplicate keys turn the graph into a
  * multigraph, collapse exact-dedup groups, and make every LSH bucket
  * quadratic in K):
  *   - entity keys shift by r·10^7 (custkey/suppkey/partkey/orderkey/
  *     event_id/user_id/doc_id/vec_id) — far below the 10^12 vertex-id
  *     tag base, and divisible by 5 and 10 so the fixture's mod-based
  *     visibility and 'colocated' sparsity patterns are preserved per
  *     replica;
  *   - the dims replicate too (nationkey += r·100, regionkey += r·10) so
  *     replicas don't cross-join through shared nations — the graph
  *     becomes K disjoint copies (K× vertices, K× edges, K× components,
  *     same diameter), which is the clean linear-scale shape;
  *   - document text is alphabet-rotated by r (a→b→c…): token counts,
  *     lengths and n-gram statistics are preserved per replica while
  *     cross-replica shingle overlap drops to ~0, so near-dup candidate
  *     mass scales K× (not K²× as verbatim copies would);
  *   - embeddings get a per-replica deterministic sign-flip pattern
  *     (dim i flipped iff murmur3(i, r) is odd): norms and per-dim
  *     magnitude distributions are exactly preserved, cross-replica
  *     cosine ≈ 0, so ANN buckets grow K× in count, not K× in size.
  *
  * Timestamps are NOT shifted: 10× events per time window is the
  * realistic "denser stream" scale-up and grows window/session state 10×.
  *
  * Usage: ScaleBench [baseDir] [K] [keys...]; output is JSON lines like
  * Bench plus a per-key ratio map. Results are recorded in SCALE.md.
  */
object ScaleBench {

  /** Keys measured by default: the top of BENCH_r08 by cost plus one
    * representative per family whose scale story SCALE.md argues. Seed- or
    * point-bounded keys (graph_ego, shortest_path, sssp) are excluded on
    * purpose: their work is bounded by a fixed frontier/seed set, so a K×
    * corpus leaves them ~flat — nothing to learn. */
  val DefaultKeys: Seq[String] = Seq(
    // judge-named hot spots
    "graph_kcore", "graph_eccentricity", "stream_minhash_maintain",
    // full-graph analytics (iteration chains over all K components)
    "graph_cc", "graph_pagerank", "graph_triangles", "graph_labelprop",
    "graph_modularity", "graph_harmonic", "graph_motif", "graph_scc",
    "graph_clustering",
    // incremental / streaming maintenance
    "stream_cc_maintain", "graph_triangles_incremental", "stream_tumbling",
    // dedup + similarity flagships
    "dedup_minhash", "dedup_cluster", "dedup_simhash", "sim_knn_join",
    "sim_recall", "sim_topk",
    // r9 additions: truss peel, walk sampling, BPE training
    "graph_ktruss", "graph_random_walk", "text_bpe_train",
    // r14 additions: perceptual image dedup, passage-dedup maintain, HITS
    "dedup_phash", "stream_substring_maintain", "graph_hits",
    // r14b additions: ANN-index maintain, rarity scoring, coreness
    "stream_ivf_maintain", "text_rare_ngrams", "graph_coreness",
    // r14c additions: spanning forest + its maintain twin, SQ8 two-stage
    // retrieval, the heaviest of the new OLAP shapes
    "graph_mst", "stream_mst_maintain", "sim_sq_rerank",
    "olap_late_suppliers", "olap_ship_priority",
    // text / pipeline
    "text_repetition", "text_tfidf", "text_quality", "corpus_mix",
    // relational linear-scale sanity rows
    "agg_group", "join_inner", "join_broadcast", "win_rank",
    "topk_per_group")

  /** Keys re-measured under the SKEW overlay (r9 verdict "next #1"): the
    * skew-sensitive families — wedge/intersection analytics, traversal
    * folds, LSH/candidate dedup, per-key windows, hot-group aggregation —
    * plus linear sanity rows. Ratio reported is skew/uniform at the SAME
    * volume, so 1.0 = the key is distribution-indifferent. */
  val SkewKeys: Seq[String] = Seq(
    "graph_triangles", "graph_motif", "graph_ktruss", "graph_kcore",
    "graph_degree", "graph_traversal_until", "graph_traversal_emit",
    "graph_cc", "graph_pagerank",
    "dedup_minhash", "dedup_cluster", "stream_minhash_maintain",
    "sim_knn_join", "corpus_mix", "text_stats", "win_sessionize",
    "agg_group", "join_inner", "join_salted",
    // r14c: hub orders hit the per-(order, supplier) lateness aggregate
    // and the sack walk fan-out; the MST pair-build rides the fact joins
    "olap_late_suppliers", "graph_traversal_sack", "graph_mst")

  /** Canonical planted-duplicate text for the skew overlay (dedup keys):
    * long enough to shingle, constant so every planted doc lands in the
    * same LSH band buckets — the classic giant-bucket skew bomb, bounded
    * at 2% of the corpus. */
  private val DupText: String =
    Seq.fill(12)("the quick onyx goblin jumps over the lazy dwarf")
      .mkString(" ")

  /** Power-law overlay applied AFTER the replica union (1:1 row-for-row,
    * schema-preserving, deterministic — a hash coin per row). The uniform
    * blow-up is K disjoint near-identical shards; real 100 TB corpora are
    * power-law, so this mode rewires a fraction of foreign keys onto a
    * 1%-sized hub set and concentrates documents onto one hot language:
    *   - orders: 15% of o_custkey onto customer 1 (the Zipf head) + 35%
    *     onto customers 1..150 (the 1% hub tail) — 'by'-edge hubs
    *     CROSSING replicas (hubs ignore shard boundaries);
    *   - lineitem: 10% of l_partkey onto part 1 + 40% onto parts 1..200 —
    *     'contains'/'supplied_by' hubs, the wedge stressor for
    *     triangles/truss;
    *   - events: 15% of user_id onto user 1 + 35% onto users 1..100 —
    *     hot session/window partitions and 'did'-edge hubs;
    *   - documents: ~90% lang → 'en' (one hot aggregation group), and 2%
    *     of texts replaced by one canonical paragraph (one giant minhash
    *     bucket / exact-dup clique);
    *   - embeddings: 2% of vectors set identical (one dense ANN cell).
    * Hub keys are replica-0 keys, which exist in every blown-up dim. */
  def skewize(df: DataFrame, table: String): DataFrame = {
    def coin(seed: Int, cols: Column*): Column =
      pmod(hash((cols :+ lit(seed)): _*), lit(100))
    // Zipf head + hub tail: a TRUE power law has a dominant first key, and
    // partition-level skew (what AQE's skew split and salting exist for)
    // only materializes when one key dwarfs the hash-partition median —
    // 150 equal hubs spread ~5 per shuffle partition and cancel out.
    def hubbed(seed: Int, coinCols: Seq[Column], key: Column, hubs: Int,
        headPct: Int, tailPct: Int): Column =
      when(coin(seed, coinCols: _*) < headPct, lit(1))
        .when(coin(seed, coinCols: _*) < headPct + tailPct,
          pmod(key, lit(hubs)) + 1)
        .otherwise(key)
    table match {
      case "orders" => df.withColumn("o_custkey",
        hubbed(1, Seq(col("o_orderkey")), col("o_custkey"), 150, 15, 35)
          .cast(df.schema("o_custkey").dataType))
      case "lineitem" => df.withColumn("l_partkey",
        hubbed(2, Seq(col("l_orderkey"), col("l_linenumber")),
          col("l_partkey"), 200, 10, 40)
          .cast(df.schema("l_partkey").dataType))
      case "events" => df.withColumn("user_id",
        hubbed(3, Seq(col("event_id")), col("user_id"), 100, 15, 35)
          .cast(df.schema("user_id").dataType))
      case "documents" =>
        val dup = coin(5, col("doc_id")) < 2
        df.withColumn("lang",
            when(coin(4, col("doc_id")) < 90, lit("en"))
              .otherwise(col("lang")))
          .withColumn("text", when(dup, lit(DupText)).otherwise(col("text")))
          .withColumn("n_chars", when(dup, lit(DupText.length.toLong))
            .otherwise(col("n_chars")))
      case "embeddings" => df.withColumn("embedding",
        when(coin(6, col("vec_id")) < 2,
          transform(col("embedding"), _ => lit(0.25f)))
          .otherwise(col("embedding")))
      case _ => df
    }
  }

  private val Shift = 10000000L // per-replica entity-key shift (≡ 0 mod 10)

  /** Per-replica transform of one base table (r = 0 is the identity). */
  def replica(df: DataFrame, table: String, r: Int): DataFrame = {
    def shl(c: String, by: Long): DataFrame => DataFrame = { in =>
      // Replica disjointness rests on base keys being < the shift unit
      // (true of TPC-H keys at bench SFs). For int-typed key columns the
      // non-ANSI cast back would silently WRAP once by*r + maxKey exceeds
      // Int.MaxValue (r ≳ 214 at Shift=10^7), producing colliding
      // replicas that still pass the row-count check — fail loudly first.
      if (df.schema(c).dataType == org.apache.spark.sql.types.IntegerType)
        require(by * r + by - 1 <= Int.MaxValue,
          s"replica shift overflows INT column $c at r=$r (shift unit $by);" +
            " widen the column to BIGINT or lower the replica count")
      in.withColumn(c, (col(c) + lit(by * r)).cast(df.schema(c).dataType))
    }
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String) = s.drop(r % 26) + s.take(r % 26)
    val rotText: DataFrame => DataFrame =
      _.withColumn("text", translate(col("text"),
        lower + lower.toUpperCase, rot(lower) + rot(lower).toUpperCase))
    val flipEmb: DataFrame => DataFrame =
      if (r == 0) identity
      else _.withColumn("embedding", transform(col("embedding"), (x, i) =>
        (x * (lit(1.0f) - lit(2.0f) *
          pmod(hash(i, lit(r)), lit(2)).cast("float"))).cast("float")))
    val steps: Seq[DataFrame => DataFrame] = table match {
      case "region"   => Seq(shl("r_regionkey", 10))
      case "nation"   => Seq(shl("n_nationkey", 100), shl("n_regionkey", 10))
      case "customer" => Seq(shl("c_custkey", Shift), shl("c_nationkey", 100))
      case "supplier" => Seq(shl("s_suppkey", Shift), shl("s_nationkey", 100))
      case "part"     => Seq(shl("p_partkey", Shift))
      case "orders"   => Seq(shl("o_orderkey", Shift), shl("o_custkey", Shift))
      case "lineitem" => Seq(shl("l_orderkey", Shift), shl("l_partkey", Shift),
        shl("l_suppkey", Shift))
      case "events"   => Seq(shl("event_id", Shift), shl("user_id", Shift))
      case "documents" => Seq(shl("doc_id", Shift), rotText)
      case "embeddings" => Seq(shl("vec_id", Shift), flipEmb)
    }
    steps.foldLeft(df)((d, f) => f(d))
  }

  /** Write the K× blow-up of `base` into `out` (each table optionally
    * post-mapped through `xform`, e.g. [[skewize]]); returns seconds. */
  def build(spark: SparkSession, base: String, out: String, k: Int,
      xform: (DataFrame, String) => DataFrame = (d, _) => d): Double = {
    val t0 = System.nanoTime()
    for (t <- Tables.names) {
      val b = Tables(spark, base, t)
      val big = xform(
        (0 until k).map(replica(b, t, _)).reduce(_ unionByName _), t)
      big.write.mode("overwrite").parquet(s"$out/$t.parquet")
      val (nb, ns) = (b.count(), spark.read.parquet(s"$out/$t.parquet").count())
      require(ns == k * nb, s"$t: scaled rows $ns != $k x $nb")
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Does Spark's AQE skew-join split actually ENGAGE on the overlay's hot
    * keys? Under default thresholds (256 MB skewed-partition floor) an
    * MB-scale bench can never trip it, so this probe answers the design
    * question at bench scale by lowering the thresholds to it: run the
    * hub-skewed orders⨝customer as a shuffle join (broadcast off — the
    * dim would otherwise broadcast and dodge the skew entirely) and read
    * the executed plan for the `skew=true` marker AQE stamps on split
    * SMJs. Configs are restored afterward. Returns (engaged, inflation):
    * whether the marker appeared, and the hot key's partition-row share
    * that justified it. */
  def aqeSkewProbe(spark: SparkSession, dir: String): (Boolean, Double) = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // the split repartitions the join output; AQE vetoes that when a
      // downstream stage wants the join's partitioning unless forced
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val c = spark.read.parquet(s"$dir/customer.parquet")
      // Two probe-shape lessons baked in: (a) carry PAYLOAD columns — a
      // hot partition holding 18k copies of one pruned join key
      // lz4-compresses to almost nothing, and AQE's skew detection reads
      // COMPRESSED map-output bytes, so a payload-free probe measures 0
      // skewed partitions over visibly skewed rows; (b) drive the action
      // through THIS Dataset (collect(), not count(), which executes a
      // separate QueryExecution) or executedPlan stays isFinalPlan=false
      // and never shows AQE's decision.
      val j = o.select("o_custkey", "o_orderkey", "o_totalprice",
          "o_orderdate")
        .join(c, o("o_custkey") === c("c_custkey")).groupBy("c_nationkey")
        .agg(sum("o_totalprice").as("s"), count(lit(1)).as("n"))
      j.collect()
      val engaged = j.queryExecution.executedPlan.toString.contains("skew=true")
      // hot-share evidence: fraction of join-side rows on the 1% hub set
      val hot = o.filter(col("o_custkey") <= 150).count().toDouble /
        o.count().toDouble
      (engaged, hot)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  private def once(spark: SparkSession, dir: String, key: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(key)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** min-of-2 per key (same protocol as Bench's >2.5 s re-measure rule,
    * applied unconditionally here — the paired ratio is the signal and a
    * single GC pause would poison it). */
  def time(spark: SparkSession, dir: String, keys: Seq[String])
      : Map[String, Double] =
    keys.map { key =>
      val a = once(spark, dir, key); System.gc()
      val b = once(spark, dir, key)
      key -> math.min(a, b)
    }.toMap

  /** Post-execution physical-plan predicates at the scaled size: the
    * design claims that must survive the blow-up. */
  def planChecks(spark: SparkSession, dir: String): Map[String, Boolean] = {
    def plan(key: String): String = {
      val df = SparkEntry.queries(key)(spark, dir)
      df.count() // force AQE to its final plan
      df.queryExecution.executedPlan.toString
    }
    val bcast = plan("join_broadcast")
    val knn = plan("sim_knn_join")
    val dedup = plan("dedup_minhash")
    val agg = plan("agg_group")
    Map(
      "join_broadcast_still_broadcast" -> bcast.contains("BroadcastHashJoin"),
      "sim_knn_no_nested_loop" ->
        !(knn.contains("CartesianProduct") ||
          knn.contains("BroadcastNestedLoopJoin")),
      "dedup_minhash_no_nested_loop" ->
        !(dedup.contains("CartesianProduct") ||
          dedup.contains("BroadcastNestedLoopJoin")),
      "agg_group_partial_agg" -> agg.contains("partial"))
  }

  /** Skew mode: `ScaleBench skew [baseDir] [K] [keys...]` — build the
    * UNIFORM K× blow-up and the SKEWED one (same volume, [[skewize]]
    * overlay), time the skew-sensitive keys on both in the same JVM, and
    * report per-key skew/uniform inflation plus the AQE skew-split probe.
    * Uniform runs first (same conservative-warmth argument as main). */
  def skewMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val keys = if (args.length > 2) args.drop(2).toSeq else SkewKeys
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outU = Staging.dir(s"scale-x$k")
    val outS = Staging.dir(s"skew-x$k")
    val tBuildU = build(spark, base, outU, k)
    val tBuildS = build(spark, base, outS, k, skewize)
    // INGEST is where data-shape pathologies land first (the stored
    // artifacts — triangle counts, truss peel, LSH index — absorb the
    // wedge/bucket explosions; the bench keys then read stored state and
    // can look deceptively flat), so both warmups are TIMED with a
    // per-artifact breakdown. The first run of this mode proved the
    // point: the skew-side warmup ground silently for ~12 minutes while
    // every per-key ratio came out under 1.
    def timedWarm(dir: String): (Double, Seq[(String, Double)]) = {
      val stages = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      val t0 = System.nanoTime()
      Bench.warmup(spark, dir, (n, s) => stages += ((n, s)))
      ((System.nanoTime() - t0) / 1e9, stages.toSeq)
    }
    val (ingestU, stagesU) = timedWarm(outU)
    val (ingestS, stagesS) = timedWarm(outS)
    // Kill phase-order bias before timing: the first run of this mode
    // timed ALL uniform keys before ALL skew keys and global JVM warmth
    // made most skew ratios come out < 1 on identical volume. One untimed
    // pass per key per side first, then min-of-2 timing INTERLEAVED per
    // key, so both sides see the same warmth.
    keys.foreach { q => once(spark, outU, q); once(spark, outS, q) }
    val paired = keys.map { q =>
      val u = math.min(once(spark, outU, q), once(spark, outU, q))
      val s = math.min(once(spark, outS, q), once(spark, outS, q))
      (q, u, s)
    }
    val tU = paired.map(p => p._1 -> p._2).toMap
    val tS = paired.map(p => p._1 -> p._3).toMap
    val (aqe, hotShare) = aqeSkewProbe(spark, outS)
    val ratio = keys.map(q =>
      q -> (if (tU(q) > 0) tS(q) / tU(q) else -1.0)).toMap
    def j(m: Map[String, Double]) = keys.map(q =>
      "\"" + q + "\":" + f"${m(q)}%.3f").mkString("{", ",", "}")
    def js(st: Seq[(String, Double)]) = st.map { case (n, s) =>
      "\"" + n + "\":" + f"$s%.3f" }.mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"scale_skew","k":$k,"base_dir":"$base",""" +
      s""""build_uniform_sec":${f"$tBuildU%.1f"},""" +
      s""""build_skew_sec":${f"$tBuildS%.1f"},""" +
      s""""ingest_uniform_sec":${f"$ingestU%.1f"},""" +
      s""""ingest_skew_sec":${f"$ingestS%.1f"},""" +
      s""""ingest_stages_uniform":${js(stagesU)},""" +
      s""""ingest_stages_skew":${js(stagesS)},""" +
      s""""queries_uniform":${j(tU)},"queries_skew":${j(tS)},""" +
      s""""ratio":${j(ratio)},"aqe_skew_split_engaged":$aqe,""" +
      s""""hub_share_orders":${f"$hotShare%.3f"}}""")
    System.out.flush()
  }

  /** BFS-lean probe (r10 verdict #7): the multi-source BFS level chains
    * (betweenness, eccentricity) leaned 2-4× under skew in 2 of 3 r10
    * runs — but those numbers came from ONE ingest-warmup pass per side,
    * the noisiest possible protocol on a virtualized host. This mode
    * re-measures JUST those two level-chain builds with an INTERLEAVED
    * min-of-3: per repetition, a FRESH `spark.newSession()` per side
    * busts every SessionMemo/Views cache (the chains are per-(session,
    * dir) artifacts) while keeping JVM/codegen warmth shared, the graph
    * build itself is pre-warmed untimed in that session so only the level
    * chains are timed, and uniform/skew alternate so host drift hits both
    * sides equally. `ScaleBench bfslean [baseDir] [K]`. */
  def bfsLeanMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outU = Staging.dir(s"scale-x$k")
    val outS = Staging.dir(s"skew-x$k")
    build(spark, base, outU, k)
    build(spark, base, outS, k, skewize)
    // default: the two BFS level chains; any key list can ride the same
    // interleaved fresh-session min-of-3 protocol (r13: used to pin the
    // triangle/BPE skew leans before and after their fixes)
    val keys = if (args.length > 2) args.drop(2).toSeq
      else Seq("graph_betweenness", "graph_eccentricity")
    // one untimed JIT pass per side
    Seq(outU, outS).foreach { d =>
      val s0 = spark.newSession()
      keys.foreach(q => SparkEntry.queries(q)(s0, d).count())
    }
    val runs = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to 3; (side, d) <- Seq("uniform" -> outU, "skew" -> outS)) {
      val s2 = spark.newSession()
      graft.graph.GraphFixture(s2, d).edges.count() // graph build untimed
      for (q <- keys) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(s2, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        runs((q, side)) = runs((q, side)) :+ sec
      }
    }
    spark.stop()
    def fmt(l: List[Double]) = l.map(v => f"$v%.2f").mkString("[", ",", "]")
    val body = keys.map { q =>
      val u = runs((q, "uniform")); val s = runs((q, "skew"))
      s""""$q":{"uniform":${fmt(u)},"skew":${fmt(s)},""" +
        s""""min_ratio":${f"${s.min / u.min}%.3f"}}"""
    }.mkString(",")
    println(s"""{"metric":"bfs_lean","k":$k,$body}""")
    System.out.flush()
  }

  /** Betweenness frontier-densification probe (r13 verdict ask #2):
    * `ScaleBench bcfrontier [baseDir] [K]` — measures, per BFS level of
    * the region-root multi-source chain (the σ-array formulation keeps
    * ONE row per frontier vertex, so the distinct-vertex frontier IS the
    * level's row count), the frontier size |F_l| and the edge fan
    * |F_{l-1} ⋈ und| (the rows the level's aggregation actually
    * processes) on the uniform and skew K× builds. The r13 residual
    * question — is betweenness_levels' ~2× skew lean a join blow-up
    * (fixable) or genuine frontier densification (hubs put more vertices
    * and edges in each level — irreducible for EXACT k-bounded Brandes) —
    * is answered by whether the skew/uniform fan ratio tracks the time
    * ratio. */
  def bcFrontierMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outU = Staging.dir(s"scale-x$k")
    val outS = Staging.dir(s"skew-x$k")
    build(spark, base, outU, k)
    build(spark, base, outS, k, skewize)
    def levels(dir: String): Seq[(Int, Long, Long)] = {
      val s2 = spark.newSession()
      val g = graft.graph.GraphFixture(s2, dir)
      val e = g.edges.filter(col("src") =!= col("dst"))
      val und = graft.util.cut(
        e.select(col("src").as("a"), col("dst").as("b"))
          .union(e.select(col("dst").as("a"), col("src").as("b")))
          .distinct())
      var vis = graft.util.cut(
        g.vertices.filter(col("label") === "region").select("id"))
      var frontier = vis
      (1 to graft.ops.QualityOps.BcDepth).map { l =>
        val fan = frontier.join(und.withColumnRenamed("a", "id"), "id").count()
        val nxt = graft.util.cut(
          frontier.join(und.withColumnRenamed("a", "id"), "id")
            .select(col("b").as("id")).distinct()
            .join(vis, Seq("id"), "left_anti"))
        vis = graft.util.cut(vis.union(nxt))
        frontier = nxt
        (l, nxt.count(), fan)
      }
    }
    def j(rows: Seq[(Int, Long, Long)]) = rows.map { case (l, f, fan) =>
      s""""L$l":{"frontier":$f,"fan":$fan}""" }.mkString(",")
    val u = levels(outU)
    val s = levels(outS)
    val fanRatio = s.map(_._3).sum.toDouble / u.map(_._3).sum
    spark.stop()
    println(s"""{"metric":"bc_frontier","k":$k,""" +
      s""""uniform":{${j(u)}},"skew":{${j(s)}},""" +
      s""""total_fan_ratio":${f"$fanRatio%.3f"}}""")
    System.out.flush()
  }

  /** Root-batch scaling probe (r13 verdict ask #2's deployment shape):
    * `ScaleBench bcbatch [baseDir] [K] [widths...]` — times
    * graph_betweenness on the uniform AND skew K× builds at each
    * rootBatchBits width (default 60,25,13 → 1/2/4 batches over the K×
    * fixture's 5K region roots at K=10), fresh session per measurement
    * (the σ-array chains are per-(session, dir) artifacts), min-of-2.
    * The claim under test: ⌈R/width⌉ independent batches cost ≈ linearly
    * in batch count (each batch pays a full level-chain of graph joins;
    * the σ-array width is what amortizes roots) — the model a 100 TB
    * deployment with hundreds of sampled roots plans capacity with. */
  def bcBatchMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val widths = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(60, 25, 13)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outU = Staging.dir(s"scale-x$k")
    val outS = Staging.dir(s"skew-x$k")
    build(spark, base, outU, k)
    build(spark, base, outS, k, skewize)
    // one untimed JIT/ingest pass per side at the default width
    Seq(outU, outS).foreach { d =>
      val s0 = spark.newSession()
      SparkEntry.queries("graph_betweenness")(s0, d).count()
    }
    def once(d: String, w: Int): Double = {
      val s2 = spark.newSession()
      s2.conf.set("graft.graph.rootBatchBits", w.toString)
      graft.graph.GraphFixture(s2, d).edges.count() // graph build untimed
      val t0 = System.nanoTime()
      SparkEntry.queries("graph_betweenness")(s2, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    val body = (for (w <- widths; (side, d) <- Seq("uniform" -> outU, "skew" -> outS))
      yield {
        val t = math.min(once(d, w), once(d, w))
        s""""${side}_w$w":${f"$t%.2f"}"""
      }).mkString(",")
    spark.stop()
    println(s"""{"metric":"bc_root_batches","k":$k,"widths":[${widths.mkString(",")}],$body}""")
    System.out.flush()
  }

  /** Like-for-like BSP coloring probe (r14 verdict ask #6):
    * `ScaleBench coloringbsp [baseDir] [K]` — times graph_coloring with
    * the sequential tail DISABLED (graft.graph.coloringLocalThreshold=0,
    * so every measurement runs the layered-MIS BSP head) at base and K×,
    * uniform AND skew, fresh session per side (the fixture memo is
    * per-(session, dir)), min-of-2 after one untimed JIT pass. This is
    * the same BSP/BSP evidence graph_mis has (SCALE.md): the shipped
    * adaptive key switches paths across the threshold, so its raw probe
    * ratio compares DIFFERENT plans; this mode pins the head's own
    * scaling. */
  def coloringBspMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outU = Staging.dir(s"scale-x$k")
    val outS = Staging.dir(s"skew-x$k")
    build(spark, base, outU, k)
    build(spark, base, outS, k, skewize)
    def once(d: String): Double = {
      val s2 = spark.newSession()
      s2.conf.set("graft.graph.coloringLocalThreshold", "0")
      graft.graph.GraphFixture(s2, d).edges.count() // graph build untimed
      val t0 = System.nanoTime()
      SparkEntry.queries("graph_coloring")(s2, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    once(base) // one untimed JIT/codegen pass
    val body = Seq("base" -> base, "uniform" -> outU, "skew" -> outS)
      .map { case (side, d) =>
        val t = math.min(once(d), once(d))
        s""""$side":${f"$t%.2f"}"""
      }.mkString(",")
    spark.stop()
    println(s"""{"metric":"coloring_bsp","k":$k,$body}""")
    System.out.flush()
  }

  /** Targeted key probe: `ScaleBench probe [baseDir] [K] keys...` —
    * builds the K× blow-up, warms ONLY the graph build (not the full
    * artifact suite: a single-key A/B should not pay 18 minutes of
    * unrelated warmup), and times the given keys min-of-2 paired
    * base-vs-scaled. For spot-checking one operator's scaling after a
    * change without re-running the whole curve. */
  def probeMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val keys = args.drop(2).toSeq
    require(keys.nonEmpty, "probe mode needs explicit keys")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val out = Staging.dir(s"scale-x$k")
    build(spark, base, out, k)
    Seq(base, out).foreach(d =>
      graft.graph.GraphFixture(spark, d).edges.count())
    keys.foreach { q => once(spark, base, q); once(spark, out, q) } // JIT
    val rows = keys.map { q =>
      val b = math.min(once(spark, base, q), once(spark, base, q))
      val s = math.min(once(spark, out, q), once(spark, out, q))
      s""""$q":{"base":${f"$b%.2f"},"scaled":${f"$s%.2f"},""" +
        s""""ratio":${f"${s / b}%.2f"}}"""
    }.mkString(",")
    spark.stop()
    println(s"""{"metric":"scale_probe","k":$k,$rows}""")
    System.out.flush()
  }

  /** Cold-build probe: `ScaleBench probecold [baseDir] [K] keys...` —
    * times each key's FIRST execution per dir (no JIT pre-run, no
    * min-of-2), base then scaled. For keys whose first run builds a
    * memoized ingest artifact (the ANN views, stored labelings): the
    * warmed re-run that `probe` measures hides exactly the cost an
    * ingest stage pays. JIT/class-load noise (~5 s) rides on the first
    * key — order the list so the key under study is not first, or accept
    * the bias when the effect under study is 10×+ that size. */
  def probeColdMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val keys = args.drop(2).toSeq
    require(keys.nonEmpty, "probecold mode needs explicit keys")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val out = Staging.dir(s"scale-x$k")
    build(spark, base, out, k)
    Seq(base, out).foreach(d =>
      graft.graph.GraphFixture(spark, d).edges.count())
    val rows = keys.map { q =>
      val b = once(spark, base, q)
      val s = once(spark, out, q)
      s""""$q":{"base_cold":${f"$b%.2f"},"scaled_cold":${f"$s%.2f"},""" +
        s""""ratio":${f"${s / b}%.2f"}}"""
    }.mkString(",")
    spark.stop()
    println(s"""{"metric":"scale_probe_cold","k":$k,$rows}""")
    System.out.flush()
  }

  /** Output-cardinality attribution: `ScaleBench probecount [baseDir] [K]
    * keys...` — counts each key's RESULT rows base vs K×-scaled. When a
    * probe-mode time ratio tracks the output-row ratio, the cost is the
    * answer getting bigger (path enumeration, pattern matches), not a
    * super-linear plan — the evidence SCALE.md cites for the walk keys. */
  def probeCountMain(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val keys = args.drop(2).toSeq
    require(keys.nonEmpty, "probecount mode needs explicit keys")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val out = Staging.dir(s"scale-x$k")
    build(spark, base, out, k)
    val rows = keys.map { q =>
      val b = SparkEntry.queries(q)(spark, base).count()
      val s = SparkEntry.queries(q)(spark, out).count()
      s""""$q":{"base_rows":$b,"scaled_rows":$s,""" +
        s""""row_ratio":${f"${s.toDouble / math.max(b, 1)}%.2f"}}"""
    }.mkString(",")
    spark.stop()
    println(s"""{"metric":"scale_probe_rows","k":$k,$rows}""")
    System.out.flush()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("skew")) return skewMain(args.drop(1))
    if (args.headOption.contains("bfslean")) return bfsLeanMain(args.drop(1))
    if (args.headOption.contains("bcfrontier"))
      return bcFrontierMain(args.drop(1))
    if (args.headOption.contains("bcbatch")) return bcBatchMain(args.drop(1))
    if (args.headOption.contains("coloringbsp"))
      return coloringBspMain(args.drop(1))
    if (args.headOption.contains("probe")) return probeMain(args.drop(1))
    if (args.headOption.contains("probecount"))
      return probeCountMain(args.drop(1))
    if (args.headOption.contains("probecold"))
      return probeColdMain(args.drop(1))
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val keys = if (args.length > 2) args.drop(2).toSeq else DefaultKeys
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val out = Staging.dir(s"scale-x$k")

    val tBuild = build(spark, base, out, k)

    def warmTimed(dir: String): Double = {
      val t0 = System.nanoTime()
      Bench.warmup(spark, dir)
      (System.nanoTime() - t0) / 1e9
    }
    // base first: its artifacts are small, and JVM-global JIT warmth then
    // benefits BOTH sides equally (biasing, if anything, toward the base
    // looking slower — the conservative direction for a scaling ratio).
    val warmBase = warmTimed(base)
    val tBase = time(spark, base, keys)
    val warmScaled = warmTimed(out)
    val tScaled = time(spark, out, keys)
    val checks = planChecks(spark, out)

    val ratio = keys.map { q =>
      q -> (if (tBase(q) > 0) tScaled(q) / tBase(q) else -1.0)
    }.toMap
    def j(m: Map[String, Double]) = keys.map(q =>
      "\"" + q + "\":" + f"${m(q)}%.3f").mkString("{", ",", "}")
    spark.stop()
    def f1(d: Double) = f"$d%.1f"
    println(s"""{"metric":"scale_blowup","k":$k,"base_dir":"$base",""" +
      s""""build_sec":${f1(tBuild)},"warmup_base_sec":${f1(warmBase)},""" +
      s""""warmup_scaled_sec":${f1(warmScaled)},"queries_base":${j(tBase)},""" +
      s""""queries_scaled":${j(tScaled)},"ratio":${j(ratio)},""" +
      s""""plan_checks":${checks.map { case (n, v) => "\"" + n + "\":" + v }
        .mkString("{", ",", "}")}}""")
    System.out.flush()
  }
}
