package graft

class EntrySpec extends SparkSpec {

  test("driver contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every query has runnable SQL or is intentionally unpaired") {
    val unpaired = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unpaired.isEmpty,
      s"queries without oracle SQL (driver downgrades them to rows-only): $unpaired")
  }

  test("driver contract: oracle SQL map has no orphans") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every query runs at sf0.001 and returns a deterministic row count") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n1 = fn(spark, "/root/testdata/sf0.001").count()
      val n2 = fn(spark, "/root/testdata/sf0.001").count()
      assert(n1 == n2, s"$name row count not stable")
    }
  }
}
