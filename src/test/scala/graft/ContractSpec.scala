package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants — catches drift that would silently weaken
  * the correctness gate.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has a DuckDB oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle (rows-only downgrade!): $missing")
  }

  test("no orphan oracles") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("every oracle ends with a deterministic ORDER BY") {
    val bad = SparkEntry.oracleSql.filterNot(_._2.toUpperCase.contains("ORDER BY"))
    assert(bad.isEmpty, s"oracles without ORDER BY (positional compare!): ${bad.keySet}")
  }
}
