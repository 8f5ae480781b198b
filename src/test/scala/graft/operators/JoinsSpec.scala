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

  test("binned range join == naive inequality join, without a nested-loop plan") {
    val s = spark
    import s.implicits._
    val points = (0L until 200L).map(p => (p, s"u${p % 7}")).toDF("p", "tag")
    // overlapping intervals, widths 1..40, some empty, some covering all
    val intervals = Seq((0, 0L, 1L), (1, 0L, 200L), (2, 10L, 50L), (3, 40L, 45L),
      (4, 44L, 84L), (5, 300L, 310L)).toDF("interval_id", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .where(col("p") >= col("lo") && col("p") < col("hi"))
      .select("interval_id", "p")
    for (binWidth <- Seq(1L, 7L, 64L)) {
      val binned = Joins.rangeJoinBinned(points, col("p"), intervals, binWidth)
        .select("interval_id", "p")
      assert(binned.exceptAll(naive).count() === 0, s"extra rows at binWidth=$binWidth")
      assert(naive.exceptAll(binned).count() === 0, s"missing rows at binWidth=$binWidth")
    }
    // boundary law: lo inclusive, hi exclusive
    val one = Joins.rangeJoinBinned(points, col("p"), intervals, 7L)
      .where(col("interval_id") === 3).select("p").as[Long].collect().sorted
    assert(one.toSeq === Seq(40L, 41L, 42L, 43L, 44L))
    // the point of the operator: an equi-join plan, not a nested loop
    val plan = Joins.rangeJoinBinned(points, col("p"), intervals, 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("skewAdvisor: hand-computed ppm/salt on a hot key; healthy key empty") {
    val s = spark
    import s.implicits._
    // 100 rows: key 1 holds 60, keys 2..9 hold 5 each -> total 100.
    // nPartitions=8: fair share 12.5. Flagged: key 1 only,
    // share_ppm = 60*1e6 DIV 100 = 600000, salt = ceil(60*8/100) = 5.
    val df = ((0 until 60).map(_ => 1L) ++
      (0 until 40).map(i => 2L + i % 8)).toDF("k")
    val got = Joins.skewAdvisor(df, col("k"), "k", 8).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "k")
    assert(got.head.getString(1) === "1")
    assert(got.head.getLong(2) === 60L)
    assert(got.head.getLong(3) === 600000L)
    assert(got.head.getLong(4) === 5L)
    // healthy distribution: 8 uniform keys over 8 partitions -> exactly
    // fair share each, ceil(n*P/total) = 1, nothing flagged
    val uniform = (0 until 800).map(i => (i % 8).toLong).toDF("k")
    assert(Joins.skewAdvisor(uniform, col("k"), "k", 8).count() === 0L)
    // boundary: one row over fair share flips the flag on
    val over = ((0 until 101).map(_ => 1L) ++
      (0 until 700).map(i => 2L + i % 7)).toDF("k")
    val flagged = Joins.skewAdvisor(over, col("k"), "k", 8)
      .collect().map(r => r.getString(1) -> r.getLong(4)).toMap
    assert(flagged === Map("1" -> 2L)) // ceil(101*8/801) = 2
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
