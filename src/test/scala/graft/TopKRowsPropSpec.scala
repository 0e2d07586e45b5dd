package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized certification of [[graft.functions.TopKRows]] at the
  * aggregate-buffer level (no Spark jobs — update/merge/serialize/eval
  * driven directly): against a naive sort-take-k reference with duplicate
  * multiplicity, across random partitionings of the input into partial
  * buffers. The r7 ADVICE bug (TreeSet silently deduplicating equal
  * tuples) is exactly the class of defect only randomized duplicates
  * catch — fixture data happened never to collide in the top-10. */
class TopKRowsPropSpec extends AnyFunSuite {

  private def naive(rows: Seq[(Double, Long, Int)], k: Int): Seq[(Double, Long, Int)] =
    rows.sortBy { case (o, a, b) => (-o, a, b) }.take(k)

  private def viaAggregate(rows: Seq[(Double, Long, Int)], k: Int,
      splits: Seq[Int]): Seq[(Double, Long, Int)] = {
    val agg = functions.TopKRows(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      BoundReference(2, IntegerType, nullable = true), k)
    // partition the input at the given split points, update a partial
    // buffer per slice (map side), round-trip each through serde (the
    // shuffle), then merge (reduce side)
    val slices =
      if (rows.isEmpty) Seq(rows)
      else (0 +: splits.map(_ % rows.length).sorted :+ rows.length)
        .distinct.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }.toSeq
    val partials = slices.map { slice =>
      val buf = agg.createAggregationBuffer()
      slice.foreach { case (o, a, b) =>
        agg.update(buf, InternalRow(o, a, b)); ()
      }
      agg.deserialize(agg.serialize(buf))
    }
    val merged = partials.reduceLeft(agg.merge)
    val arr = agg.eval(merged).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getDouble(0), r.getLong(1), r.getInt(2))
    }
  }

  test("topk_rows ≡ sort-take-k with multiplicity, under any partitioning") {
    // small value domains force heavy duplicate collisions
    val row = for {
      o <- Gen.chooseNum(0, 5).map(_.toDouble)
      a <- Gen.chooseNum(0L, 3L)
      b <- Gen.chooseNum(0, 2)
    } yield (o, a, b)
    val gen = for {
      rows <- Gen.listOf(row)
      k <- Gen.chooseNum(1, 12)
      splits <- Gen.listOfN(3, Gen.chooseNum(0, 1000))
    } yield (rows, k, splits)
    val prop = Prop.forAll(gen) { case (rows, k, splits) =>
      viaAggregate(rows, k, splits) == naive(rows, k)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("topk_rows ignores null inputs instead of crashing or counting them") {
    val agg = functions.TopKRows(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      BoundReference(2, IntegerType, nullable = true), 3)
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow(null, 1L, 1))
    agg.update(buf, InternalRow(1.0, null, 1))
    agg.update(buf, InternalRow(1.0, 1L, null))
    agg.update(buf, InternalRow(2.0, 2L, 2))
    val arr = agg.eval(buf).asInstanceOf[ArrayData]
    assert(arr.numElements() == 1)
    val r = arr.getStruct(0, 3)
    assert((r.getDouble(0), r.getLong(1), r.getInt(2)) == ((2.0, 2L, 2)))
  }
}
