package graft

/** Driver-contract smoke (t1): entry() must return rows > 0 on sf0.001,
  * under a session the engine did not configure (the driver's own). */
class EntrySpec extends GraftSparkSpec {

  test("SparkEntry.entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq === Seq("service", "clicks"))
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("registry is collision-free and fully oracle-checked") {
    // the registry fold (`_ ++ _.queries`) would silently drop a query whose
    // name collides across families — assert the sum survives the merge
    val perFamily = SparkEntry.families.map(_.queries.size).sum
    assert(SparkEntry.queries.size === perFamily,
      "duplicate query name across families")
    // every registered query is oracle-checked — no rows-only gaps
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set.empty[String])
  }
}
