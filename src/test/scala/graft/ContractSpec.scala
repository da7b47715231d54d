package graft

/** Driver-contract invariants: every oracle key has a query, names are
  * well-formed, and the flagship entry returns rows.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("query inventory is substantial and uniquely named") {
    assert(SparkEntry.queries.size >= 40)
    assert(SparkEntry.oracleSql.size >= 30)
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
