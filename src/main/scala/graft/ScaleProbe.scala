package graft

/** Throwaway-style diagnostic: print the executed join operators of one key
  * at base vs 10× (used to attribute ScaleBench outliers to plan
  * transitions rather than guessing). Kept in-tree because re-attributing
  * a ratio after any future blow-up run is a one-liner with it. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val keys = if (args.length > 2) args.drop(2).toSeq else Seq("graph_motif")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val out = Staging.dir(s"scale-x$k")
    ScaleBench.build(spark, base, out, k)
    def joins(dir: String, key: String): String = {
      val df = SparkEntry.queries(key)(spark, dir)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct")
        .map(j => s"$j=${p.sliding(j.length).count(_ == j)}").mkString(" ")
    }
    for (key <- keys) {
      println(s"$key base:   ${joins(base, key)}")
      println(s"$key scaled: ${joins(out, key)}")
    }
    spark.stop()
  }
}
