package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class JoinsSpec extends GraftSparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val s = spark
    import s.implicits._
    // pathological skew: 90% of big rows share one key
    val big = (0 until 1000).map(i => (if (i < 900) 1L else i.toLong % 7, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Joins.saltedJoin(big, small, "k", 8, col("payload"))
      .select("k", "payload", "name")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.count() === plain.count())
  }

  test("bucketed tables join without an Exchange on either side") {
    val s = spark
    import s.implicits._
    val a = (0L until 200L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (0L until 100L).map(i => (i % 50, i * 2)).toDF("k", "vb")
    Joins.bucketWriter(a, "k", 4).saveAsTable("bkt_a")
    Joins.bucketWriter(b, "k", 4).saveAsTable("bkt_b")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path: the point is that bucketed layout
      // replaces the SHUFFLE, which only matters when both sides are big
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("bkt_a").join(s.table("bkt_b"), Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed read not used:\n$plan")
      assert(joined.count() === a.join(b, Seq("k")).count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS bkt_a")
      s.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
