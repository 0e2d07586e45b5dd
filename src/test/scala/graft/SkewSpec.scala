package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-handling pattern (SCALE.md): two-phase salted aggregation — salt the
  * hot key into S sub-keys, partial-aggregate, strip the salt, merge. The
  * test pins that the rewrite is RESULT-IDENTICAL (with exact decimal sums,
  * bit-for-bit) to the direct aggregation, so it can be applied mechanically
  * wherever a hot key appears at scale. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two-phase salted aggregation ≡ direct aggregation (exact sums)") {
    // Skew: give one synthetic hot key 90%+ of lineitem's rows.
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .withColumn("k", when(col("l_orderkey") % 10 < 9, lit("HOT"))
        .otherwise(concat(lit("cold_"), col("l_orderkey") % 97)))

    val direct = li.groupBy("k")
      .agg(num.dsum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))

    // Deterministic salt (never Math.random — replays must agree).
    val salted = li.withColumn("salt", col("l_linenumber") % 16)
      .groupBy("k", "salt")
      .agg(sum(col("l_extendedprice").cast("decimal(38,10)")).as("ps"),
        count(lit(1)).as("pn"))
      .groupBy("k")
      .agg(sum("ps").cast("double").as("s"), sum("pn").as("n"))

    assert(direct.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(direct).count() == 0)
  }
}
