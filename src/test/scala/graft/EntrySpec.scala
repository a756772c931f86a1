package graft

/** Driver-contract smoke: the flagship entry returns rows on sf0.001 and
  * every registered query has a unique name; every oracle key has a query. */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("registry integrity") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 60)
  }
}
