package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for the showcase queries
  * (regenerates PLANS.md). Usage: runMain graft.Plans <sfDir>. */
object Plans {
  val showcase: Seq[String] = Seq("scan_pruned", "join_broadcast",
    "join_theta_range", "join_bucketed", "agg_group", "topk_per_group",
    "join_asof_exec", "graph_hop2", "graph_nbr_agg", "dedup_minhash",
    "sim_topk", "sim_range_join", "stream_tumbling",
    "graph_prop_visibility", "stream_stream_join", "ts_gapfill",
    "ts_interpolate", "win_sessionize", "text_pack", "split_train_test",
    "sink_partitioned", "unpivot_melt", "profile_columns", "ts_ohlc",
    "graph_jaccard", "join_salted", "join_correlated", "sample_stratified",
    "sort_zorder", "agg_checksum", "scan_merge_schema", "ts_zscore",
    "join_interval_banded", "agg_cohort_retention", "win_time_range",
    "agg_vector_centroid", "olap_star_rollup", "olap_topk_revenue",
    "olap_pricing_summary", "graph_modularity", "olap_mkt_share",
    "olap_returned_top", "dq_referential", "join_asof_nearest",
    "graph_khop_sample", "text_chunk", "cdc_scd2", "agg_heavy_hitters",
    "join_bloom_prefilter", "olap_local_supplier", "graph_katz",
    "graph_traversal_order", "ts_autocorr", "graph_resource_alloc",
    "graph_traversal_groupcount", "dedup_lsh_curve", "text_hashvec",
    "win_rank", "graph_traversal_union", "graph_traversal_coalesce",
    "graph_traversal_choose", "corpus_mix", "graph_mutation_api",
    "graph_eccentricity", "graph_scc", "graph_traversal_until",
    "graph_traversal_emit", "graph_ktruss", "graph_random_walk",
    "text_bpe_train", "text_bpe_apply", "graph_traversal_sample",
    "sink_parquet", "graph_traversal_emit_pre", "graph_traversal_until_emit",
    "graph_bridges", "graph_articulation", "source_csv", "source_json",
    "graph_traversal_emit_pred", "graph_traversal_until_path",
    "dedup_substring", "graph_traversal_until_where",
    "graph_traversal_until_emit_where", "graph_traversal_match",
    "dedup_substring_strip", "source_avro", "sim_ivf",
    "text_dedup_report", "text_curation_funnel", "dedup_phash", "dedup_ahash", "dedup_vhash",
    "graph_hits", "graph_traversal_optional", "graph_traversal_project",
    "graph_traversal_group", "graph_traversal_path_by",
    "source_orc", "source_text", "graph_closeness", "graph_coreness",
    "graph_reciprocity", "graph_traversal_cyclic", "graph_traversal_tree",
    "olap_nation_volume", "text_rare_ngrams", "text_diversity",
    "embed_quantize", "graph_traversal_not", "sim_hard_negatives",
    "graph_traversal_and", "graph_traversal_or",
    "olap_ship_priority", "olap_product_profit", "olap_customer_dist",
    "olap_large_orders", "olap_late_suppliers", "olap_idle_value_customers",
    "olap_order_priority", "olap_forecast_revenue", "olap_bracket_revenue",
    "olap_small_qty_revenue", "graph_mst", "graph_traversal_sack",
    "graph_traversal_local", "sim_sq_rerank", "multimodal_resize",
    "source_binaryfile", "dq_drift",
    "agg_countmin", "graph_matching", "graph_densest", "graph_mis",
    "graph_vertex_cover", "sim_mips", "text_collocations",
    "ts_changepoint", "agg_hll_merge", "olap_basket_lift", "olap_pareto",
    "dq_kanon", "multimodal_resample",
    // r15 showcase: the PQ-ADC LUT scan, the side-effect/edge traversal
    // steps, louvain/conductance, the biased walks, and the two curation
    // cuts (sim_mips above now snapshots its banded equi-join form)
    "sim_pq_adc", "graph_traversal_aggregate", "graph_traversal_where_by",
    "graph_traversal_oute", "graph_traversal_dedup", "graph_louvain",
    "graph_conductance", "graph_node2vec_walk", "graph_leiden_refine",
    "corpus_importance_sample", "corpus_token_budget",
    // r16 showcase: the composed IVF-PQ serving scan (probe-restricted,
    // topk_rows-cut), the second community level over the contracted
    // graph, the skip-gram export, the full-outer interval join, and
    // the two decorrelation stresses (Q2/Q20 shapes)
    "sim_ivfpq", "graph_louvain_hierarchy", "graph_walk_skipgrams",
    "stream_stream_full_join", "olap_min_cost_supplier",
    "olap_part_promotion", "graph_traversal_coin",
    "graph_traversal_path_fromto")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = new StringBuilder
    def println(s: String = ""): Unit = { out.append(s).append('\n'); () }
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.sql.extensions", "") // ops self-register
      // bucketed-table artifacts (join_bucketed) land in scratch, not ./spark-warehouse
      .config("spark.sql.warehouse.dir", Staging.dir("warehouse"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("# PLANS — formatted physical plans of showcase queries")
    println()
    println("Regenerate: `sbt \"runMain graft.Plans\"` (writes PLANS.md).")
    println("What to look for: `PushedFilters`/`ReadSchema` on scans, " +
      "`BroadcastHashJoin` on dims, partial aggregation before exchanges, " +
      "`TakeOrderedAndProject` for top-k, the custom `AsOfJoin` node, and " +
      "WholeStageCodegen `*(n)` spans.")
    showcase.foreach { k =>
      println(s"\n## $k\n")
      println("```")
      val df = SparkEntry.queries(k)(spark, sfDir)
      df.collect() // drive AQE to the final plan
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(12000))
      println("```")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PLANS.md"), out.toString)
    spark.stop()
  }
}
