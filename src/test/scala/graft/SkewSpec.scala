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

  test("salted skew join ≡ plain join (fact side salted, dim side replicated)") {
    val S = 8
    // Skewed fact: hot synthetic key on most rows; small dim keyed the same.
    val fact = Tables(spark, TestSpark.sf, "lineitem")
      .withColumn("k", when(col("l_orderkey") % 10 < 9, lit(0L))
        .otherwise(col("l_orderkey") % 97 + 1))
      .select("k", "l_extendedprice")
    val dim = fact.select("k").distinct()
      .withColumn("dimval", col("k") * 1000)

    val plain = fact.join(dim, "k")
      .groupBy("k").agg(num.dsum(col("l_extendedprice")).as("s"),
        count(lit(1)).as("n"), max("dimval").as("d"))

    // Salt the fact side deterministically; replicate the dim side S× so
    // every (k, salt) pair finds its dim row — the standard skew-join
    // rewrite when one key dominates a shuffle partition.
    val saltedFact = fact.withColumn("salt",
      pmod(hash(col("l_extendedprice")), lit(S)))
    val repDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(S - 1))))
    val salted = saltedFact.join(repDim, Seq("k", "salt"))
      .groupBy("k").agg(num.dsum(col("l_extendedprice")).as("s"),
        count(lit(1)).as("n"), max("dimval").as("d"))

    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
