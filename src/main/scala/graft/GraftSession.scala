package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for the graft engine, in one place —
  * what Verify/Bench use, minus the harness-specific bits. Library users:
  *
  * {{{
  * val spark = GraftSession.builder("local[32]").getOrCreate()
  * }}}
  *
  * On a cluster, pass the master/deploy config as usual and keep the rest;
  * shuffle partitions and the broadcast threshold are the knobs to re-size
  * (see SCALE.md). Graph-engine knobs (both optional):
  * `graft.graph.pregelPartitions` (GraphX view partition count — default 8
  * locally, set ~2-3× executor cores on a cluster) and
  * `graft.graph.broadcastLabels` (default true; set false when the vertex
  * label map outgrows broadcast — label propagation then shuffles the
  * label side instead). */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      // events.parquet-style TIMESTAMP(NANOS) columns read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native functions + the as-of join strategy
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
}
