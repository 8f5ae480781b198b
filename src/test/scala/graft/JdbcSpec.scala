package graft

import java.util.Properties

import org.apache.spark.sql.functions._

/** S6/S7 — the JDBC surface exercised against a real database: Spark's
  * bundled Derby (in-memory), through the actual `spark.read.jdbc` /
  * `DataFrameWriter.jdbc` code paths the reference uses for its users
  * dimension (SURVEY §2.1; reference `app.py:121-124` INSERT on signup,
  * `app.py:79-88` SELECT on login).
  *
  * Scale note: the JDBC dimension is the SMALL side by construction (user
  * profiles); the pattern at 100 TB is read-once → broadcast — the fact
  * stream never touches JDBC. Predicate pushdown (asserted below via the
  * plan's PushedFilters) keeps even the dimension read bounded.
  */
class JdbcSpec extends GraftSparkSpec {

  // VARCHAR not Derby's default CLOB: CLOB cannot take a pushed equality
  // predicate, and a real users dimension would declare bounded strings
  private val varcharTypes =
    "login VARCHAR(64), password VARCHAR(64), segment VARCHAR(32)"

  private val url = "jdbc:derby:memory:graftusers;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  private lazy val users = {
    import spark.implicits._
    Seq(
      (1L, "ann", "pass1", "BUILDING"),
      (2L, "bob", "pass2", "MACHINERY"),
      (3L, "cal", "pass3", "HOUSEHOLD"))
      .toDF("user_id", "login", "password", "segment")
  }

  // Each test is self-contained: the shared read-only dimension is
  // recreated (overwrite) before every run of the suite, and the append
  // test writes to its own uniquely-named in-memory database — no test
  // depends on another's writes or on suite-level declaration order.
  override def beforeAll(): Unit = {
    super.beforeAll()
    users.write.mode("overwrite")
      .option("createTableColumnTypes", varcharTypes)
      .jdbc(url, "users", props)
  }

  test("S7: append writes rows through a real JDBC sink, twice (idempotent schema)") {
    // fresh database per run so "append creates the table, then adds" is
    // observable regardless of what other tests (or a prior same-JVM run)
    // did
    val appendUrl =
      s"jdbc:derby:memory:graftappend${System.nanoTime()};create=true"
    users.write.mode("append")
      .option("createTableColumnTypes", varcharTypes)
      .jdbc(appendUrl, "users", props)
    // the reference appends one row per signup — a second append must add,
    // not replace
    users.filter(col("user_id") === 1L)
      .withColumn("user_id", lit(4L)).withColumn("login", lit("dee"))
      .write.mode("append").jdbc(appendUrl, "users", props)
    val n = spark.read.jdbc(appendUrl, "users", props).count()
    assert(n === 4)
  }

  test("S6: point read back through spark.read.jdbc with pushed predicate") {
    // P7 credential conjunction + P8 LIMIT 1, like the reference's login
    val row = spark.read.jdbc(url, "users", props)
      .filter(col("login") === "bob" && col("password") === "pass2")
      .limit(1)
    // the conjunction must reach the JDBC source as PushedFilters, not a
    // post-scan Spark filter over a full-table SELECT
    val planText = row.queryExecution.executedPlan.toString
    assert(planText.contains("PushedFilters:") &&
      planText.contains("login") && planText.contains("password"),
      s"predicate not pushed to JDBC scan:\n$planText")
    val r = row.collect()
    assert(r.length === 1 && r(0).getAs[Long]("user_id") === 2L)
  }

  test("S6→J1: the JDBC dimension broadcasts against a fact side") {
    import spark.implicits._
    val facts = Seq((1L, "click"), (2L, "click"), (2L, "view"), (9L, "click"))
      .toDF("user_id", "event_type")
    val dim = spark.read.jdbc(url, "users", props)
      .select(col("user_id"), col("segment"))
    val joined = facts.join(broadcast(dim), Seq("user_id"))
      .groupBy(col("segment")).agg(count(lit(1)).as("cnt"))
    val planText = joined.queryExecution.executedPlan.toString
    assert(planText.contains("BroadcastHashJoin"),
      s"JDBC dim side did not broadcast:\n$planText")
    val bySegment = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySegment === Map("BUILDING" -> 1L, "MACHINERY" -> 2L))
  }
}
