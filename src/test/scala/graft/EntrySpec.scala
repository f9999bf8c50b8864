package graft

/** The driver's smoke contract: entry returns rows, every query has a
  * runnable definition, oracle keys are a subset of query keys. */
class EntrySpec extends SparkSuite {
  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every query is declared and all but q64 carry a DuckDB oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // q64's raw sketch values are rows-only by design (bounded by
    // q64x); every other query must carry an oracle — comparing the
    // two key sets directly keeps this spec from going stale as
    // queries are added
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ===
      Set("q64_approx_stats"))
  }
}
