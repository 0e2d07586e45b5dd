package graft

/** Dev utility (r16): the EXACT Bench protocol — same session builder, same
  * ingest warmup, same min-of-2 re-measure rule — restricted to a
  * comma-separated key subset, so a per-key optimization can be judged
  * against bench-comparable numbers in minutes instead of a full-suite run.
  * Usage: runMain graft.BenchSome <key>[,key...] (sfDir/cpus from the
  * driver-contract env vars, like Bench). */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    Bench.warmup(spark, sfDir)
    keys.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once()
      val t = if (t1 > 1.0) { System.gc(); math.min(t1, once()) } else t1
      println(f"BENCHSOME $name%-32s $t%7.2f s  (first $t1%.2f)")
    }
    spark.stop()
  }
}
