package graft

/** The driver's smoke contract: entry returns rows, every query has a
  * runnable definition, oracle keys are a subset of query keys. */
class EntrySpec extends SparkSuite {
  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("oracle keys are a subset of query keys; 71 queries declared") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size === 71)
    // every query except q64 (raw sketch values, bounded by q64x)
    // carries a DuckDB oracle
    assert(SparkEntry.oracleSql.size === 70)
  }
}
