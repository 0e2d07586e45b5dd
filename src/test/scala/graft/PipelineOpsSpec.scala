package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-3 pipeline/relational/graph additions
  * (cross-engine value equality is the Verify/DuckDB gate's job; these
  * assert the properties the values must satisfy). */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("split_train_test partitions the corpus exactly") {
    val s = SparkEntry.queries("split_train_test")(spark, sf)
    val rows = s.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    assert(rows.values.sum == Tables(spark, sf, "documents").count())
    // 8/1/1 hash split: train strictly dominates
    assert(rows("train") > rows.getOrElse("val", 0L))
    assert(rows("train") > rows.getOrElse("test", 0L))
  }

  test("corpus_importance_sample: in-memory replay of the weighted gate") {
    // Independent replay: JDK MessageDigest 60-bit hash, the same
    // h·wmax < w·2^60 acceptance in BigInt — per-source kept counts,
    // char masses, and id checksums must match exactly.
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: Long): BigInt = BigInt(
      md.digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val wmax = docs.map(_._3).max
    val kept = docs.filter { case (id, _, w) =>
      h60(id) * wmax < BigInt(w) * (BigInt(1) << 60) }
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val k = kept.filter(_._2 == src)
      (src, ds.length.toLong, ds.map(_._3).sum, k.length.toLong,
        k.map(_._3).sum, k.map(_._1).sum)
    }.toSet
    val got = SparkEntry.queries("corpus_importance_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(kept.nonEmpty && kept.length < docs.length,
      "fixture should exercise both acceptance outcomes")
  }

  test("corpus_token_budget: budget respected, kept set is the greedy cut") {
    // In-memory greedy replay: score docs by type-token ppm, sort
    // (score DESC, doc_id), take while cumulative tokens fit the 20%
    // budget — the bounded-domain two-phase cut must equal this exactly.
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val toks = r.getString(2).split(" ", -1)
        (r.getLong(0), r.getString(1), toks.length.toLong,
          1000000L * toks.distinct.length / toks.length)
      }
    val budget = docs.map(_._3).sum / 5
    var cum = 0L
    // Tie order inside the boundary score class is (md5 band, doc_id) —
    // the r16 two-level tie-break; above-boundary classes are kept in
    // full, so folding the band into the global sort replays the exact
    // cut (full bands kept while they fit, then an in-band doc prefix —
    // both takeWhile-shaped).
    val kept = docs.sortBy { case (id, _, _, sc) => (-sc, band(id), id) }
      .takeWhile { case (_, _, n, _) => { cum += n; cum <= budget } }
    val want = kept.groupBy(_._2).map { case (src, ds) =>
      (src, ds.length.toLong, ds.map(_._3).sum, ds.map(_._1).sum) }.toSet
    val got = SparkEntry.queries("corpus_token_budget")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
    assert(kept.map(_._3).sum <= budget)
    assert(kept.nonEmpty && kept.length < docs.length)
  }

  /** The op's boundary-band function, replayed on the JVM: 60-bit md5
    * prefix mod P (textsql.sparkHash), then mod 1024. */
  private def band(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = BigInt(md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)
    ((h % ops.textsql.P) % 1024).toLong
  }

  test("corpus_token_budget: degenerate all-one-score corpus stays exact") {
    // Every doc scores the same ppm (all-distinct tokens → 10^6), so the
    // ENTIRE corpus is the boundary class — the shape whose tie-break
    // window was corpus-sized before the r16 banding. The two-level cut
    // must still equal the in-memory greedy replay, and the boundary
    // band's per-doc window input must be ~1/1024 of the class.
    val dir = java.nio.file.Files.createTempDirectory("tokbudget").toString
    val n = 500
    val docs = (1 to n).map { i =>
      // i distinct words, all unique within the doc → score 1e6 for all
      val words = (0 until (i % 7) + 3).map(w => s"w${i}x$w")
      (i.toLong, s"src${i % 3}", words.mkString(" "))
    }
    import spark.implicits._
    docs.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("corpus_token_budget")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val toks = docs.map { case (id, src, t) =>
      (id, src, t.split(" ", -1).length.toLong) }
    val budget = toks.map(_._3).sum / 5
    var cum = 0L
    val kept = toks.sortBy { case (id, _, _) => (band(id), id) }
      .takeWhile { case (_, _, k) => { cum += k; cum <= budget } }
    val want = kept.groupBy(_._2).map { case (src, ds) =>
      (src, ds.length.toLong, ds.map(_._3).sum, ds.map(_._1).sum) }.toSet
    assert(got == want)
    assert(kept.nonEmpty && kept.map(_._3).sum <= budget)
  }

  test("text_pack conserves docs and tokens, pack ids contiguous per source") {
    val rows = SparkEntry.queries("text_pack")(spark, sf)
      .orderBy("source", "pack_id").collect()
    val docs = Tables(spark, sf, "documents")
    assert(rows.map(_.getLong(2)).sum == docs.count())
    val totalToks = docs
      .select(sum(size(split(col("text"), " "))).cast("long")).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalToks)
    rows.groupBy(_.getString(0)).foreach { case (_, p) =>
      // pack ids dense 0..k within each source shard
      assert(p.map(_.getLong(1)).toSeq.sorted == (0L until p.length).toSeq)
      // every pack but the shard's last reached the 512 budget (greedy
      // overflow pack; max doc is 99 tokens)
      p.sortBy(_.getLong(1)).dropRight(1)
        .foreach(r => assert(r.getLong(3) >= 512 - 99))
    }
  }

  test("text_pii_redact strips every address and phone") {
    val r = SparkEntry.queries("text_pii_redact")(spark, sf)
    assert(r.filter(col("redacted").contains("@") ||
      col("redacted").rlike("555-[0-9]")).count() == 0)
    assert(r.filter(col("n_pii") < 2).count() == 0) // email + tel per doc
    assert(r.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<TEL>")).count() == 0)
  }

  test("agg_minmax_by picks the rows the window form picks") {
    val m = SparkEntry.queries("agg_minmax_by")(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus").orderBy(col("o_orderkey").desc)
    val expect = Tables(spark, sf, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_totalprice").as("newest_price"))
    assert(m.select("o_orderstatus", "newest_price")
      .except(expect).count() == 0)
  }

  test("win_sessionize: sessions are dense per user and gap-consistent") {
    val s = SparkEntry.queries("win_sessionize")(spark, sf)
    // session ids are 1..k per user
    val dense = s.groupBy("user_id")
      .agg(min("sess").as("mn"), max("sess").as("mx"), count(lit(1)).as("k"))
    assert(dense.filter(col("mn") =!= 1 || col("mx") =!= col("k")).count() == 0)
    // consecutive sessions of one user are separated by > 30 min
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess")
    val adj = s.withColumn("prev_t1", lag("t1", 1).over(w))
      .filter(col("prev_t1").isNotNull)
    assert(adj.filter(col("t0") - col("prev_t1") <= 1800000000L).count() == 0)
    // event conservation
    val total = Tables(spark, sf, "events")
      .filter(col("user_id") % 20 === 0).count()
    assert(s.agg(sum("n_events")).head.getLong(0) == total)
  }

  test("win_funnel only reports users owning the full event triple") {
    val f = SparkEntry.queries("win_funnel")(spark, sf)
    assert(f.count() > 0) // the bound is calibrated to the fixture cadence
    assert(f.filter(col("n_funnels") < 1).count() == 0)
    val ev = Tables(spark, sf, "events")
    val owners = ev.filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("kinds"))
      .filter(col("kinds") === 3)
      .select("user_id")
    // every funnel user has all three step types somewhere in their stream
    assert(f.join(owners, Seq("user_id"), "left_anti").count() == 0)
    // and the total can never exceed the purchase count
    val purchases = ev.filter(col("event_type") === "purchase").count()
    val total = Option(f.agg(sum("n_funnels")).head.get(0))
      .fold(0L)(_.asInstanceOf[Long])
    assert(total <= purchases)
  }

  test("ts_interpolate fills every grid slot within neighbor bounds") {
    val t = SparkEntry.queries("ts_interpolate")(spark, sf)
    assert(t.filter(col("filled").isNull).count() == 0)
    // interpolated (unobserved) values lie between adjacent observed values
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("bstart")
    val withNbr = t
      .withColumn("pv", last(when(col("observed") === 1, col("filled")), ignoreNulls = true)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("nv", first(when(col("observed") === 1, col("filled")), ignoreNulls = true)
        .over(w.rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)))
    val bad = withNbr.filter(col("observed") === 0 &&
      (col("filled") < least(col("pv"), col("nv")) ||
        col("filled") > greatest(col("pv"), col("nv"))))
    assert(bad.count() == 0)
  }

  test("sink_csv_json: both formats round-trip identically") {
    val r = SparkEntry.queries("sink_csv_json")(spark, sf)
    val csv = r.filter(col("fmt") === "csv").drop("fmt")
    val json = r.filter(col("fmt") === "json").drop("fmt")
    assert(csv.count() > 0)
    assert(csv.except(json).count() == 0 && json.except(csv).count() == 0)
  }

  test("sim_range_join: ordered pairs above threshold only") {
    val r = SparkEntry.queries("sim_range_join")(spark, sf)
    assert(r.filter(col("va") >= col("vb")).count() == 0)
    assert(r.filter(col("cos") < 0.35).count() == 0)
  }

  test("graph_kcore survivors all keep degree >= 2 within the core") {
    val core = SparkEntry.queries("graph_kcore")(spark, sf)
    assert(core.filter(col("deg") < 2).count() == 0)
    // recompute degree over the surviving induced subgraph: must equal deg
    val g = graph.GraphFixture(spark, sf)
    val und = g.edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val ids = core.select(col("id"))
    val e = und.join(ids.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(ids.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg2"))
    val joined = core.join(deg, Seq("id"), "left")
    assert(joined.filter(col("deg2").isNull || col("deg2") =!= col("deg"))
      .count() == 0)
  }

  test("corpus_mix: independent in-memory recomputation; minority class kept whole") {
    val got = SparkEntry.queries("corpus_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // Independent recomputation from the raw table: JDK md5, the same
    // 60-bit-prefix-mod-P hash, plain Scala thresholding.
    val P = 2147483647L
    def hv(docId: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % P
    }
    val docs = Tables(spark, sf, "documents").select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2)
    val k = byLang.valuesIterator.map(_.length).min
    val want = byLang.toSeq.map { case (lang, ds) =>
      val kept = ds.filter { case (id, _) => hv(id) * ds.length < k * P }
      (lang, ds.length.toLong, kept.length.toLong, kept.map(_._1).sum)
    }.sortBy(_._1)
    assert(got == want, s"got=$got want=$want")

    // semantics: minority class survives in full; nothing is upsampled
    val minLang = byLang.minBy(_._2.length)._1
    val gm = got.find(_._1 == minLang).get
    assert(gm._2 == gm._3, "minority class must be kept whole")
    assert(got.forall { case (_, o, kk, _) => kk <= o && kk >= 1 })
  }

  test("graph_bipartite histogram accounts for every co-located pair") {
    val h = SparkEntry.queries("graph_bipartite")(spark, sf).collect()
    assert(h.nonEmpty)
    assert(h.forall(_.getLong(0) >= 1))
    // total pair-multiplicity equals the direct 2-path count
    val co = graph.GraphFixture(spark, sf).edges
      .filter(col("label") === "colocated")
      .select(col("src").as("c"), col("dst").as("sup"))
    val paths = co.select(col("c").as("c1"), col("sup"))
      .join(co.select(col("c").as("c2"), col("sup")), "sup")
      .filter(col("c1") < col("c2")).count()
    assert(h.map(r => r.getLong(0) * r.getLong(1)).sum == paths)
  }
}
