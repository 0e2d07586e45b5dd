package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.TopKRows]] unit semantics — especially DUPLICATE rows
  * (identical (ord, key1, key2)): the fixtures' lineitem (l_orderkey,
  * l_linenumber) is NOT unique (core.scala), and the win_rank DuckDB oracle
  * uses row_number(), which keeps every duplicate. The aggregate must emit
  * duplicates with full multiplicity (capped at k overall) or it silently
  * undercounts. */
class TopKRowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def topk(rows: Seq[(Double, Long, Int)], k: Int): Seq[(Double, Long, Int)] = {
    import spark.implicits._
    functions.GraftFunctions.register(spark)
    rows.toDF("ord", "key1", "key2").createOrReplaceTempView("tk_in")
    spark.sql(
      s"""SELECT r.ord, r.key1, r.key2
         FROM (SELECT topk_rows(ord, key1, key2, $k) AS top FROM tk_in)
         LATERAL VIEW posexplode(top) t AS pos, r ORDER BY pos""")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getInt(2))).toSeq
  }

  test("duplicate (ord,key1,key2) tuples are emitted with multiplicity, not deduped") {
    val rows = Seq((5.0, 1L, 1), (5.0, 1L, 1), (4.0, 2L, 1), (3.0, 3L, 1))
    // k=3: the duplicate 5.0 tuple occupies TWO of the three slots.
    assert(topk(rows, 3) == Seq((5.0, 1L, 1), (5.0, 1L, 1), (4.0, 2L, 1)))
    // k=4: everything survives, duplicates intact.
    assert(topk(rows, 4) == Seq((5.0, 1L, 1), (5.0, 1L, 1), (4.0, 2L, 1), (3.0, 3L, 1)))
  }

  test("trim splits a multiplicity run at the k boundary") {
    val rows = Seq.fill(5)((2.0, 7L, 7)) ++ Seq((9.0, 1L, 1))
    // k=3: 9.0 first, then only 2 of the 5 duplicate 2.0 rows survive.
    assert(topk(rows, 3) == Seq((9.0, 1L, 1), (2.0, 7L, 7), (2.0, 7L, 7)))
  }

  test("total order is ord DESC, key1 ASC, key2 ASC") {
    val rows = Seq((1.0, 9L, 2), (1.0, 9L, 1), (1.0, 2L, 5), (8.0, 5L, 5))
    assert(topk(rows, 10) ==
      Seq((8.0, 5L, 5), (1.0, 2L, 5), (1.0, 9L, 1), (1.0, 9L, 2)))
  }

  test("builder rejects wrong arity and non-INT k with a descriptive error") {
    functions.GraftFunctions.register(spark)
    val e1 = intercept[Exception](spark.sql(
      "SELECT topk_rows(CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT), 1) FROM range(1)").collect())
    assert(e1.getMessage.contains("4 arguments"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT topk_rows(CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT), 1, 'x') FROM range(1)").collect())
    assert(e2.getMessage.contains("INT literal"), e2.getMessage)
  }
}
