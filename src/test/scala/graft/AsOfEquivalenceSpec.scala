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
}
