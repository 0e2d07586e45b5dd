package graft

import org.apache.spark.sql.types.{ArrayType, MapType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver's comparator row-sorts the graded parquet by EVERY column
  * (pandas sort_values), and pandas cannot factorize ndarray/dict cells —
  * an ArrayType or MapType top-level column in any graded output turns a
  * value-correct answer into a gate error (r14's graph_traversal_group).
  * Collections must be rendered as their canonical joined string (the
  * agg_collect convention) in the graded key; fluent APIs keep the typed
  * form. This spec pins that for the whole registry: constructing each
  * query is enough to read its analyzed schema (no result materialization
  * beyond what the op itself does eagerly). */
class GradedSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("no graded output carries a top-level array or map column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad =
          try fn(spark, TestSpark.sf).schema.fields.collect {
            case f if f.dataType.isInstanceOf[ArrayType]
              || f.dataType.isInstanceOf[MapType] => f.name
          }.toSeq
          catch { case e: Throwable =>
            // construction failures are the correctness gate's job, not
            // this spec's — report separately so the message stays exact
            Seq(s"<construction failed: ${e.getClass.getSimpleName}>")
          }
        if (bad.isEmpty) None else Some(s"$name -> ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"graded outputs with array/map columns (driver comparator cannot " +
        s"sort these):\n  ${offenders.mkString("\n  ")}")
  }
}
