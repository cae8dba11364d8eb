package graft

/** Smoke: every registry query runs at sf0.001 and yields rows (the driver
  * applies the real oracle gate at sf0.01; this catches regressions fast). */
class QueriesSmokeSpec extends SparkSpec {

  Queries.all.foreach { q =>
    test(s"${q.name} runs and yields rows") {
      assert(q.run(spark, sf).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
