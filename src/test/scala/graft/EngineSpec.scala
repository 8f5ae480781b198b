package graft

import org.apache.spark.sql.functions._

/** SQL-first usage: attach a data dir, query with spark.sql, including
  * the engine's native functions. */
class EngineSpec extends GraftSparkSpec {

  test("attach registers all tables and SQL equals the DataFrame API") {
    val tables = Engine.attach(spark, "/root/testdata/sf0.001")
    assert(tables.toSet === Tables.all.toSet)
    assert(spark.catalog.tableExists("lineitem"))

    val sqlResult = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin)
    val dfResult = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
    assert(sqlResult.collect().toSeq === dfResult.collect().toSeq)

    // native function through SQL over an attached table
    val k = spark.sql(
      "SELECT json_get(props, 'k') AS k FROM events WHERE event_id = 0")
      .head().getString(0)
    assert(k != null && k.forall(_.isDigit))
  }
}
