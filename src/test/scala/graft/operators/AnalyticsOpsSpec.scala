package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Round-10 analytics additions: 2-D skyline, closed-form OLS, PMI
  * collocations. Each checked against a brute-force or hand-computed
  * law on deterministic fixtures, plus partitioning invariance for the
  * distribute-then-merge skyline. */
class AnalyticsOpsSpec extends GraftSparkSpec {

  // deterministic pseudo-random points: hash-scatter over a 100×100 grid
  private lazy val points = spark.range(0, 500).toDF("id")
    .withColumn("cost", pmod(hash(col("id"), lit(1)), lit(100)).cast("long"))
    .withColumn("benefit", pmod(hash(col("id"), lit(2)), lit(100)).cast("long"))

  test("skyline2D equals the brute-force dominance filter") {
    val all = points.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = all.filter { case (_, c, b) =>
      !all.exists { case (_, c2, b2) =>
        c2 <= c && b2 >= b && (c2 < c || b2 > b)
      }
    }.map(_._1).toSet
    val got = OrderStats.skyline2D(points, col("id"), col("cost"),
      col("benefit")).collect().map(_.getLong(0)).toSet
    assert(got === expect)
  }

  test("skyline2D: ties on both dimensions survive together; bucket count irrelevant") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 10L, 4L), (4L, 9L, 5L),
      (5L, 20L, 9L)).toDF("id", "cost", "benefit")
    // (4) dominates (1),(2),(3) on cost; (1),(2) would tie each other but
    // are gone; (5) survives (largest benefit). (4) survives (cheapest+5).
    val got = OrderStats.skyline2D(df, col("id"), col("cost"), col("benefit"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(4L, 5L))
    // exact duplicate frontier points both survive
    val dup = Seq((1L, 1L, 1L), (2L, 1L, 1L)).toDF("id", "cost", "benefit")
    assert(OrderStats.skyline2D(dup, col("id"), col("cost"), col("benefit"))
      .count() === 2)
    for (nb <- Seq(1, 7, 64)) {
      val g = OrderStats.skyline2D(points, col("id"), col("cost"),
        col("benefit"), nBuckets = nb).collect().map(_.getLong(0)).toSet
      val base = OrderStats.skyline2D(points, col("id"), col("cost"),
        col("benefit")).collect().map(_.getLong(0)).toSet
      assert(g === base, s"nBuckets=$nb")
    }
  }

  test("linReg recovers an exact line and NULLs a degenerate group") {
    val s = spark
    import s.implicits._
    // group a: y = 3x + 7 exactly; group b: constant x (zero variance)
    val df = ((1L to 50L).map(x => ("a", x, 3 * x + 7)) ++
      (1L to 10L).map(i => ("b", 4L, i))).toDF("g", "x", "y")
    val rows = Profile.linReg(df, Seq(col("g")), col("x"), col("y"))
      .orderBy(col("g")).collect()
    val a = rows(0)
    assert(a.getString(0) === "a" && a.getLong(1) === 50L)
    assert(math.abs(a.getDouble(2) - 3.0) < 1e-12)
    assert(math.abs(a.getDouble(3) - 7.0) < 1e-9)
    assert(math.abs(a.getDouble(4) - 1.0) < 1e-12)
    val b = rows(1)
    assert(b.getString(0) === "b" && b.isNullAt(2) && b.isNullAt(3) &&
      b.isNullAt(4))
  }

  test("RFM quintile rule: balanced cuts, monotone in the metric") {
    // the explicit (5·(rn−1)) DIV n + 1 rule on 23 rows: sizes differ
    // by at most 1 (5,5,4,5,4) and the quintile is monotone in rank
    val n = 23
    val q = (1 to n).map(rn => (5 * (rn - 1)) / n + 1)
    assert(q.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(1 -> 5, 2 -> 5, 3 -> 4, 4 -> 5, 5 -> 4))
    assert(q === q.sorted)
  }

  test("stripBoilerplate: shared chunks drop, survivors reassemble in order") {
    val s = spark
    import s.implicits._
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val shared = words("b", 32) // boilerplate chunk in two docs
    val docs = Seq(
      (0L, shared + " " + words("u", 32) + " " + words("v", 5)),
      (1L, shared),
      (2L, words("w", 40))).toDF("doc_id", "text")
    val got = TextOps.stripBoilerplate(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getInt(5)))).toMap
    // doc 0: 3 chunks, boilerplate dropped, u-chunk + v-tail stitched
    val expect0 = words("u", 32) + " " + words("v", 5)
    assert(got(0L)._1 === 3L && got(0L)._2 === 2L && got(0L)._3 === 1L)
    assert(got(0L)._5 === expect0.length)
    // doc 1 is ALL boilerplate: survives with zero kept text
    assert(got(1L) === ((1L, 0L, 1L, got(1L)._4, 0)))
    // doc 2 untouched: kept_chars equals its full length
    assert(got(2L)._2 === 2L && got(2L)._3 === 0L &&
      got(2L)._5 === words("w", 40).length)
  }

  test("SES fold: hand-computed level, single-day group returns its count") {
    val s = spark
    import s.implicits._
    // build a tiny events dir: type A on 3 days (counts 4, 8, 2),
    // type B on 1 day (count 3)
    val day = 86400L * 1000000000L
    val rows = (0 until 4).map(i => (i.toLong, 1L * 1000, 1L, "A", 1.0, "{}")) ++
      (0 until 8).map(i => ((10 + i).toLong, day + 1000, 1L, "A", 1.0, "{}")) ++
      (0 until 2).map(i => ((20 + i).toLong, 2 * day + 1000, 1L, "A", 1.0, "{}")) ++
      (0 until 3).map(i => ((30 + i).toLong, 1000L, 2L, "B", 1.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-ses-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("rel_ses_forecast")(spark, d)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // A: s1=4; s2=.25·8+.75·4=5; s3=.25·2+.75·5=4.25
    assert(got("A") === ((3L, 14L, 4.25)))
    assert(got("B") === ((1L, 3L, 3.0)))
  }

  test("collocations: counts and lift on a hand fixture, support floor enforced") {
    val s = spark
    import s.implicits._
    // "new york" appears 6×; "the the" 5×; "rare pair" once (below floor)
    val docs = (
      (1L to 6L).map(i => (i, "new york")) ++
        Seq((7L, "the the the the the the")) ++
        Seq((8L, "rare pair"))).toDF("doc_id", "text")
    val got = TextOps.collocations(docs, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2))
    // bigrams: 6×(new,york) + 5×(the,the) + 1×(rare,pair) → Nb = 12
    // unigrams: new 6, york 6, the 6, rare 1, pair 1 → Nu = 20
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq(("new", "york", 6L), ("the", "the", 5L)))
    val Seq(ny, tt) = got.toSeq.map(_._6)
    assert(math.abs(ny - 6.0 * 20 * 20 / (12.0 * 6 * 6)) < 1e-12)
    assert(math.abs(tt - 5.0 * 20 * 20 / (12.0 * 6 * 6)) < 1e-12)
  }

  test("A/B z-test: hand-computed pooled z; degenerate corner NULLs") {
    val s = spark
    import s.implicits._
    // arm 0 (users 2,4): 2 events 1 purchase; arm 1 (user 1): 2 events
    // 0 purchases → p̂=0.25, z = 0.5/√(0.25·0.75·(0.5+0.5))
    val rows = Seq((0L, 1000L, 2L, "purchase", 1.0, "{}"),
      (1L, 2000L, 4L, "view", 1.0, "{}"),
      (2L, 1000L, 1L, "view", 1.0, "{}"), (3L, 2000L, 1L, "click", 1.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-ab-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = graft.SparkEntry.queries("ref_ab_ztest")(spark, d).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 0L)))
    val z = (1.0 / 2.0 - 0.0 / 2.0) /
      math.sqrt((1.0 / 4.0) * (1.0 - 1.0 / 4.0) * (1.0 / 2.0 + 1.0 / 2.0))
    assert(r.getDouble(6) === z)
    // all-success corner: pooled variance 0 → z must be NULL, not a throw
    val rows2 = Seq((0L, 1000L, 2L, "purchase", 1.0, "{}"),
      (1L, 2000L, 1L, "purchase", 1.0, "{}"))
    val d2 = java.nio.file.Files.createTempDirectory("graft-ab2-").toString
    rows2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/events.parquet")
    assert(graft.SparkEntry.queries("ref_ab_ztest")(spark, d2).head().isNullAt(6))
  }

  test("jackknife: constant data → SE exactly 0, mean exact") {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-jk-").toString
    (1L to 200L).map(i => (i, 100.0)).toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = graft.SparkEntry.queries("rel_jackknife_mean")(spark, d).head()
    assert(r.getLong(0) === 200L)
    assert(r.getDouble(1) === 100.0)
    assert(r.getDouble(2) === 0.0) // every leave-out estimate identical
  }

  test("sparse KNN: inverted-index candidates only, exact ppm cosine²") {
    val s = spark
    import s.implicits._
    // query doc 0 "a b"; doc 1 "a b" (cos²=1e6), doc 2 "a a" (cos²=5e5),
    // doc 3 "c" shares no term → must be ABSENT, not scored 0
    val d = java.nio.file.Files.createTempDirectory("graft-sknn-").toString
    Seq((0L, "a b", "en"), (1L, "a b", "en"), (2L, "a a", "en"), (3L, "c", "en"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("txt_sparse_knn")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((0L, 1, 1L, 2L, 1000000L), (0L, 2, 2L, 2L, 500000L)))
  }

  test("feature hash: same term → same bucket everywhere, counts add") {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-fhash-").toString
    Seq((0L, "x", "en"), (1L, "x x", "en"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("txt_feature_hash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bx = Seq(Tuple1("x")).toDF("t")
      .select(Sampling.hash60(col("t")) % 64).head().getLong(0)
    assert(got.toSeq === Seq((0L, bx, 1L), (1L, bx, 2L)))
  }

  test("user Gini impurity: exact ppm, pinned user scores zero") {
    val s = spark
    import s.implicits._
    // user 1: two types 1/1 → 500000 ppm; user 2: one type → 0
    val rows = Seq((0L, 1000L, 1L, "A", 1.0, "{}"), (1L, 2000L, 1L, "B", 1.0, "{}"),
      (2L, 1000L, 2L, "A", 1.0, "{}"), (3L, 2000L, 2L, "A", 1.0, "{}"),
      (4L, 3000L, 2L, "A", 1.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-gini-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("ref_user_gini")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 2L, 500000L), (2L, 3L, 1L, 0L)))
  }

  test("type concentration: CR-10 ppm exact, tail user excluded") {
    val s = spark
    import s.implicits._
    // type A: user 1 has 3 events, users 2..12 have 1 each → 14 events,
    // 12 users; top-10 = user 1 (3) + users 2..10 (9) = 12 events →
    // CR10 = 12e6 DIV 14 = 857142 ppm. type B: one user → 1000000 ppm.
    val rows = (Seq.fill(3)(1L) ++ (2L to 12L)).zipWithIndex.map {
      case (u, i) => (i.toLong, 1000L + i, u, "A", 1.0, "{}")
    } ++ Seq((99L, 9000L, 50L, "B", 1.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-cr10-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("ref_type_concentration")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(("A", 14L, 12L, 12L, 857142L),
      ("B", 1L, 1L, 1L, 1000000L)))
  }

  test("rank AUC: tie-aware Mann-Whitney identity on a hand fixture") {
    val s = spark
    import s.implicits._
    // pos (en) scores {3, 2}; neg scores {1, 2}:
    // gt = 3, eq = 1 → AUC = (2·3+1)/(2·2·2) = 0.875
    val d = java.nio.file.Files.createTempDirectory("graft-auc-").toString
    Seq((0L, "a b c", "en"), (1L, "a b", "en"), (2L, "a", "fr"), (3L, "a b", "de"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = graft.SparkEntry.queries("txt_rank_auc")(spark, d).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 3L, 1L)))
    assert(r.getDouble(4) === 0.875)
  }

  test("Holt fold: hand-computed level and trend, single-day degenerates") {
    val s = spark
    import s.implicits._
    // type A days 0,1,2 with counts 4, 8, 2; type B one day count 3
    val day = 86400L * 1000000000L
    val rows = (0 until 4).map(i => (i.toLong, 1000L, 1L, "A", 1.0, "{}")) ++
      (0 until 8).map(i => ((10 + i).toLong, day + 1000, 1L, "A", 1.0, "{}")) ++
      (0 until 2).map(i => ((20 + i).toLong, 2 * day + 1000, 1L, "A", 1.0, "{}")) ++
      (0 until 3).map(i => ((30 + i).toLong, 1000L, 2L, "B", 1.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-holt-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("rel_holt_forecast")(spark, d)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    // A: l1=4, b1=0; l2=.25·8+.75·4=5, b2=.2·1+.8·0=.2;
    //    l3=.25·2+.75·5.2=4.4, b3=.2·(4.4−5)+.8·.2=.04; f=4.44
    val l2 = 0.25 * 8 + 0.75 * (4.0 + 0.0)
    val b2 = 0.2 * (l2 - 4.0) + 0.8 * 0.0
    val l3 = 0.25 * 2 + 0.75 * (l2 + b2)
    val b3 = 0.2 * (l3 - l2) + 0.8 * b2
    assert(got("A") === ((l3, b3, l3 + b3)))
    assert(got("B") === ((3.0, 0.0, 3.0)))
  }

  test("chi-square: uniform grid scores zero; known 2x2 matches hand value") {
    val s = spark
    import s.implicits._
    val day = 86400L * 1000000000L
    // 2×2 grid (days 0,1 → dows 0,1): A:(30,10), B:(10,30) — the classic
    // dependent table. T=80, rows 40/40, cols 40/40, E=20 everywhere,
    // every cell contributes (10·80)²/(80·40·40) = 5 → χ²=20, dof=1.
    val rows =
      (0 until 30).map(i => (i.toLong, 1000L, 1L, "A", 1.0, "{}")) ++
      (0 until 10).map(i => ((100 + i).toLong, day + 1000, 1L, "A", 1.0, "{}")) ++
      (0 until 10).map(i => ((200 + i).toLong, 1000L, 1L, "B", 1.0, "{}")) ++
      (0 until 30).map(i => ((300 + i).toLong, day + 1000, 1L, "B", 1.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-chisq-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("ref_chisq_type_dow")(spark, d).collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getLong(3) === 20000L) // E = 20 in exact millis
      assert(r.getDouble(4) === 5.0)  // each cell contributes exactly 5
      assert(r.getDouble(5) === 20.0 && r.getLong(6) === 1L)
    }
  }

  test("item-item CF: cooc ranks, ppm cosine², tie-breaks") {
    val s = spark
    import s.implicits._
    // baskets: O1{1,2,3}, O2{1,2}, O3{1,4} → freq 1:3, 2:2, 3:1, 4:1
    val d = java.nio.file.Files.createTempDirectory("graft-cf-").toString
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = graft.SparkEntry.queries("rel_item_cf")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // part 1: neighbor 2 first (cooc 2), then 3 and 4 tie on cooc AND
    // ppm (1e6 DIV 3 = 333333) → neighbor asc; part 3: cooc tie broken
    // by ppm (2 at 500000 beats 1 at 333333)
    assert(got.toSeq === Seq(
      (1L, 1, 2L, 2L, 666666L), (1L, 2, 3L, 1L, 333333L), (1L, 3, 4L, 1L, 333333L),
      (2L, 1, 1L, 2L, 666666L), (2L, 2, 3L, 1L, 500000L),
      (3L, 1, 2L, 1L, 500000L), (3L, 2, 1L, 1L, 333333L),
      (4L, 1, 1L, 1L, 333333L)))
  }

  test("HITS: two exact-integer iterations are incident path counts") {
    val s = spark
    import s.implicits._
    // u1{A,B}, u2{A}, u3{B,C}: auth¹=(2,2,1); hub¹=(4,2,3);
    // auth²: A=hub(u1)+hub(u2)=6, B=hub(u1)+hub(u3)=7, C=hub(u3)=3
    val rows = Seq((0L, "A", 1L), (1L, "B", 1L), (2L, "A", 2L),
      (3L, "B", 3L), (4L, "C", 3L)).map { case (i, t, u) =>
      (i, 1000L + i, u, t, 1.0, "{}")
    }
    val d = java.nio.file.Files.createTempDirectory("graft-hits-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("ref_hits")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("A", 2L, 6L), ("B", 2L, 7L), ("C", 1L, 3L)))
  }

  test("Kaplan-Meier: hand-computed factors, censoring, at-risk suffix") {
    val s = spark
    import s.implicits._
    // cust 1: days 0,10 → dur 10, last 10 (churned);
    // cust 2: day 100    → dur 0,  last 100 (churned);
    // cust 3: days 0,200 → dur 200, last 200 = horizon (censored).
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val d = java.nio.file.Files.createTempDirectory("graft-km-").toString
    Seq((1L, ts(0)), (1L, ts(10)), (2L, ts(100)), (3L, ts(0)), (3L, ts(200)))
      .toDF("o_custkey", "o_orderdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = graft.SparkEntry.queries("rel_survival_km")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // n_risk is the suffix count; S multiplies (1 − d/n) at event durs
    // only (dur 200 is censor-only: S unchanged from dur 10)
    val s0 = 1.0 * (1.0 - 1.0 / 3.0)
    val s10 = s0 * (1.0 - 1.0 / 2.0)
    assert(got.toSeq === Seq(
      (0L, 1L, 0L, 3L, s0), (10L, 1L, 0L, 2L, s10), (200L, 0L, 1L, 1L, s10)))
  }

  test("CUSUM: integer recursion with reset, mirrored negative side") {
    val s = spark
    import s.implicits._
    // daily counts 3, 1, 2 → k = 6 DIV 3 = 2;
    // S⁺ = 1, 0, 0 (resets at day 1); S⁻ = 0, 1, 1
    val day = 86400L * 1000000000L
    val rows = (0 until 3).map(i => (i.toLong, 1000L, 1L, "A", 1.0, "{}")) ++
      Seq((10L, day + 1000, 1L, "A", 1.0, "{}")) ++
      (0 until 2).map(i => ((20 + i).toLong, 2 * day + 1000, 1L, "A", 1.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-cusum-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("ref_cusum_shift")(spark, d)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((3L, 1L, 1L, 0L), (1L, -1L, 0L, 1L), (2L, 0L, 0L, 1L)))
  }

  test("benford digit extraction is notation-proof on the double's string form") {
    // the rel_benford_audit digit rule: first [1-9] of the shortest-repr
    // string is the first SIGNIFICANT digit in plain, sub-1, and
    // scientific notations alike (a scientific mantissa always leads
    // with a nonzero digit, so exponent digits can never match first)
    val df = spark.createDataFrame(Seq(
      Tuple1(68423.46), Tuple1(0.042), Tuple1(9.5e8), Tuple1(1.0), Tuple1(0.0)))
      .toDF("x")
    val got = df.select(
      regexp_extract(col("x").cast("string"), "[1-9]", 0).as("raw"))
      .filter(col("raw") =!= "") // ANSI cast throws on '' — the query filters first
      .select(col("raw").cast("int").as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(6, 4, 9, 1)) // 0.0 has no significant digit — dropped
  }

  test("welch t: hand-computed statistic, and zero-variance arms go NULL") {
    val s = spark
    import s.implicits._
    // arm 0 (even users): values 1.00, 3.00; arm 1 (odd): 2.00, 2.00, 5.00
    val rows = Seq(
      (0L, 1000L, 2L, "view", 1.0, "{}"), (1L, 2000L, 4L, "view", 3.0, "{}"),
      (2L, 3000L, 1L, "view", 2.0, "{}"), (3L, 4000L, 3L, "view", 2.0, "{}"),
      (4L, 5000L, 5L, "view", 5.0, "{}"))
    val d = java.nio.file.Files.createTempDirectory("graft-welch-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = graft.SparkEntry.queries("ref_welch_ttest")(spark, d).head()
    assert((r.getLong(0), r.getLong(1)) === ((2L, 3L)))
    // cents: arm0 {100,300} mean 200, s²=20000; arm1 {200,200,500} mean 300, s²=30000
    assert(r.getDouble(2) === 200.0 && r.getDouble(3) === 300.0)
    val se2 = 20000.0 / 2.0 + 30000.0 / 3.0
    assert(r.getDouble(4) === (200.0 - 300.0) / math.sqrt(se2))
    assert(r.getDouble(5) ===
      se2 * se2 / (10000.0 * 10000.0 / 1.0 + 10000.0 * 10000.0 / 2.0))
    // constant values: both variances 0 → se2 = 0 → t and df NULL
    val d2 = java.nio.file.Files.createTempDirectory("graft-welch2-").toString
    rows.map(t => t.copy(_5 = 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/events.parquet")
    val r2 = graft.SparkEntry.queries("ref_welch_ttest")(spark, d2).head()
    assert(r2.isNullAt(4) && r2.isNullAt(5))
  }

  test("isotonic rate: PAV hand-math — violators pool to the block mean, " +
    "fit is monotone, raw rates untouched") {
    val s = spark
    import s.implicits._
    val day = 86400L * 1000000000L
    // daily purchase rates .5, .25, .25, .75 → PAV pools days 0-2 to
    // (2+1+1)/(4+4+4) = 1/3 and leaves day 3 at .75
    def evs(d: Int, k: Int, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, d * day + 1000L, 1L,
        if (i < k) "purchase" else "view", 1.0, "{}"))
    val rows = evs(0, 2, 4, 0) ++ evs(1, 1, 4, 100) ++
      evs(2, 1, 4, 200) ++ evs(3, 3, 4, 300)
    val d = java.nio.file.Files.createTempDirectory("graft-pav-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("ref_isotonic_rate")(spark, d)
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === Seq(0.5, 0.25, 0.25, 0.75))
    assert(got.map(_._2).toSeq === Seq(4.0 / 12.0, 4.0 / 12.0, 4.0 / 12.0, 0.75))
    assert(got.map(_._2).sliding(2).forall(p => p(0) <= p(1)), "fit not monotone")
  }
}
