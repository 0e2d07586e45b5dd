package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual queries (bench loop minus the harness).
  * Usage: runMain graft.Prof <sfDir> <key>[,key...] — prints seconds each,
  * construction paid by the first graph key. */
object Prof {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, keys) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // bucketed-table artifacts (join_bucketed) land in scratch, not ./spark-warehouse
      .config("spark.sql.warehouse.dir", Staging.dir("warehouse"))
      // shuffle/spill scratch on tmpfs (see Staging scaladoc)
      .config("spark.local.dir", Staging.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.split(",").foreach { k =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(spark, sfDir).count()
      println(f"PROF $k%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
