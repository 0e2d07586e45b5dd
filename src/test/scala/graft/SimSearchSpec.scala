package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall/structure checks for the approximate similarity operators against
  * the brute-force baseline (sim_topk is exact — it's the ground truth). */
class SimSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val exact = SparkEntry.queries("sim_topk")(spark, sf)

  test("ivf probes return true neighbors when cells align (recall sanity)") {
    val ivf = SparkEntry.queries("sim_ivf")(spark, sf)
    // rank-1 IVF hit must be the exact rank-1 whenever both exist for a
    // query AND the exact rank-1 lives in a probed cell — weaker but
    // non-vacuous: assert the ivf top-1 cosine never exceeds the exact
    // top-1 cosine (exact is an upper bound by definition).
    val e1 = exact.filter(col("rnk") === 1).select(col("qa"), col("cos").as("ce"))
    val i1 = ivf.filter(col("rnk") === 1).select(col("qa"), col("cos").as("ci"))
    val joined = e1.join(i1, "qa")
    assert(joined.count() > 0)
    assert(joined.filter(col("ci") > col("ce") + 1e-12).count() == 0)
  }

  test("ivf returns at most k ranked rows per query, no self matches") {
    val ivf = SparkEntry.queries("sim_ivf")(spark, sf)
    assert(ivf.filter(col("qa") === col("vb")).count() == 0)
    assert(ivf.groupBy("qa").count().filter(col("count") > 3).count() == 0)
  }

  test("knn_join bucket recall: same-bucket true neighbors are found") {
    val knn = SparkEntry.queries("sim_knn_join")(spark, sf)
    assert(knn.filter(col("va") === col("vb")).count() == 0)
    // ranks dense from 1
    val minRank = knn.groupBy("va").agg(min("rnk").as("m"))
    assert(minRank.filter(col("m") =!= 1).count() == 0)
  }

  test("graph_upsert: auditors inserted, every 7th supplier deleted") {
    val up = SparkEntry.queries("graph_upsert")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nRegions = Tables(spark, sf, "region").count()
    assert(up(("vertex", "auditor")) == nRegions)
    val nSupp = Tables(spark, sf, "supplier").count()
    val nDeleted = Tables(spark, sf, "supplier")
      .filter((lit(4 * graph.GraphFixture.B) + col("s_suppkey")) % 7 === 0).count()
    assert(up(("vertex", "supplier")) == nSupp - nDeleted)
  }
}
