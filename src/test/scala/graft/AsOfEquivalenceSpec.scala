package graft

import org.scalatest.funsuite.AnyFunSuite

/** The two as-of implementations — the composed-builtins window rewrite
  * (join_asof) and the custom merge-scan exec (join_asof_exec) — must be
  * row-identical on the same input; they already share one oracle, but this
  * pins the equivalence directly, including null last-click rows. */
class AsOfEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("window rewrite ≡ custom AsOfJoinExec") {
    val a = SparkEntry.queries("join_asof")(spark, TestSpark.sf)
    val b = SparkEntry.queries("join_asof_exec")(spark, TestSpark.sf)
    assert(a.count() > 0)
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("null keys/times: right rows skipped, left rows null-extended") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val left = Seq(
      (Some(1L), Some(10L), "l1"),
      (None: Option[Long], Some(20L), "l-nullkey"),
      (Some(2L), None: Option[Long], "l-nulltime"),
      (Some(1L), Some(30L), "l2"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(5L), "r-early"),
      (None: Option[Long], Some(1L), "r-nullkey"),
      (Some(1L), None: Option[Long], "r-nulltime"),
      (Some(1L), Some(25L), "r-late"))
      .toDF("rk", "rt", "rtag")
    val j = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt")
      .select(col("tag"), col("rtag")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(j("l1") == Some("r-early"))     // only r@5 ≤ t=10
    assert(j("l2") == Some("r-late"))      // r@25 ≤ t=30 wins over r@5
    assert(j("l-nullkey").isEmpty)         // null key never matches
    assert(j("l-nulltime").isEmpty)        // null time never matches
  }

  test("non-long key/time types rejected at construction") {
    import spark.implicits._
    val l = Seq((1, 1L)).toDF("k", "t") // INT key
    val r = Seq((1L, 1L)).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(l, r, "k", "rk", "t", "rt")
    }
  }
}
