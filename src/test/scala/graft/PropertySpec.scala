package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Behavior, Dedup, TextOps}

/** Property-based invariants (SURVEY §5.3) over ScalaCheck-generated
  * micro-corpora (fixed seeds — deterministic CI). */
class PropertySpec extends GraftSparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val eventGen = for {
    user <- Gen.choose(0L, 5L)
    tpe <- Gen.oneOf("click", "view", "purchase", "home")
    k <- Gen.choose(0, 9)
  } yield (user, tpe, k)

  private val eventsGen = Gen.listOfN(40, eventGen)

  private def toDf(rows: List[(Long, String, Int)]) = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex
      .map { case ((u, t, k), i) => (i.toLong, u, t, s"""{"k": $k}""") }
      .toDF("event_id", "user_id", "event_type", "props")
  }

  test("fan-out law: 3 messages per non-home event; clicks sum == count (A3 law)") {
    samples(eventsGen, 8).foreach { rows =>
      val msgs = Behavior.fanoutMessages(toDf(rows))
      val nonHome = rows.count(_._2 != "home")
      assert(msgs.count() === 3L * nonHome)
      // '_clicks' values are the constant '1' => sum == count (serwer.js:117)
      val clicks = msgs.filter(col("topic").endsWith("_clicks"))
      assert(clicks.agg(sum(col("value").cast("long"))).head().getLong(0)
        === clicks.count())
    }
  }

  test("4-way fan-out law: 4 messages per non-home event; segment from dim or 'unknown'") {
    val s = spark
    import s.implicits._
    // dimension covers users 0-3; 4-5 must coalesce to 'unknown', never drop
    val customer = Seq((0L, "A"), (1L, "B"), (2L, "C"), (3L, "D"))
      .toDF("c_custkey", "c_mktsegment")
    samples(eventsGen, 6).foreach { rows =>
      val msgs = Behavior.fanoutMessages(toDf(rows), customer)
      val nonHome = rows.count(_._2 != "home")
      assert(msgs.count() === 4L * nonHome)
      // every non-home event contributes exactly one segment message
      val seg = msgs.filter(col("topic").endsWith("_segment"))
      assert(seg.count() === nonHome.toLong)
      val unknowns = seg.filter(col("value") === "unknown").count()
      assert(unknowns === rows.count(r => r._2 != "home" && r._1 > 3L).toLong)
      // the other three topics agree with the 3-way fan-out exactly
      val three = Behavior.fanoutMessages(toDf(rows))
      assert(msgs.filter(!col("topic").endsWith("_segment"))
        .exceptAll(three).count() === 0L)
      assert(three.exceptAll(msgs.filter(!col("topic").endsWith("_segment")))
        .count() === 0L)
    }
  }

  test("rollup law: A1 counts summed per topic == A2 totals == raw message count") {
    samples(eventsGen, 4).foreach { rows =>
      val msgs = Behavior.fanoutMessages(toDf(rows))
      val a1Total = Behavior.valueCounts(msgs).agg(sum("cnt")).head().getLong(0)
      val a2Total = Behavior.topicTotals(msgs).agg(sum("total")).head().getLong(0)
      assert(a1Total === msgs.count())
      assert(a2Total === msgs.count())
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    words <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
  } yield words.mkString(" ")

  test("jaccard bounds and identity on shingle sets") {
    val s = spark
    import s.implicits._
    samples(Gen.zip(textGen, textGen), 10).foreach { case (ta, tb) =>
      val df = Seq((ta, tb)).toDF("a", "b")
        .select(TextOps.shingles(col("a"), 3).as("sa"), TextOps.shingles(col("b"), 3).as("sb"))
      val r = df.select(
        Dedup.jaccard(col("sa"), col("sb")).as("j"),
        Dedup.jaccard(col("sa"), col("sa")).as("self"),
        size(col("sa")).as("na")).head()
      val j = r.getDouble(0)
      if (!j.isNaN) assert(j >= 0.0 && j <= 1.0)
      if (r.getInt(2) > 0) assert(r.getDouble(1) === 1.0) // self-similarity
    }
  }

  test("repetition-feature laws: fractions bounded, ttr consistent, " +
    "all-identical text maximally repetitive") {
    val s = spark
    import s.implicits._
    val docsGen = Gen.listOfN(12, textGen)
    samples(docsGen, 6).foreach { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "src") }
        .toDF("doc_id", "text", "source")
      val toks = texts.map(_.split(" ", -1).toSeq)
      val rows = TextOps.repetitionFeatures(docs).collect()
        .map(r => r.getLong(0) -> r).toMap
      toks.zipWithIndex.foreach { case (tk, i) =>
        val r = rows(i.toLong)
        assert(r.getLong(1) === tk.size.toLong) // n_tokens
        assert(r.getLong(2) === tk.distinct.size.toLong) // n_types
        val (ttr, d2, d3) = (r.getDouble(3), r.getDouble(5), r.getDouble(6))
        assert(ttr > 0.0 && ttr <= 1.0)
        assert(d2 >= 0.0 && d2 <= 1.0 && d3 >= 0.0 && d3 <= 1.0)
        // a fully-duplicated 2-gram multiset forces a duplicated 3-gram
        // multiset only when enough grams exist; the reverse bound always
        // holds: distinct tokens => zero repetition
        if (tk.distinct.size == tk.size) assert(d2 === 0.0 && d3 === 0.0)
      }
    }
    // degenerate corpus: one token repeated — every gram is the same gram
    val mono = Seq((0L, Seq.fill(30)("aa").mkString(" "), "src"))
      .toDF("doc_id", "text", "source")
    val m = TextOps.repetitionFeatures(mono).head()
    assert(m.getDouble(5) === 1.0 && m.getDouble(6) === 1.0) // dup fracs
    assert(m.getLong(4) === 29L) // top2_cnt: all 29 2-grams identical
    assert(m.getInt(7) === 0) // gate rejects it
  }

  test("medianMad window identity == brute-force rank median/MAD on arbitrary multisets") {
    val s = spark
    import s.implicits._
    // heavy ties, negatives, skew — the shapes that break rank formulas
    val valuesGen = Gen.listOfN(25, Gen.oneOf(
      Gen.choose(-5L, 5L), Gen.const(0L), Gen.choose(-1000L, 1000L)))
    (samples(valuesGen, 10) :+ List(42L) :+ List(7L, 7L)).foreach { vs =>
      val got = graft.operators.Profile
        .medianMad(vs.toDF("v"), col("v")).head()
      val sorted = vs.sorted
      val m = sorted((vs.size + 1) / 2 - 1)
      val mad = vs.map(x => math.abs(x - m)).sorted.apply((vs.size + 1) / 2 - 1)
      assert((got.getLong(0), got.getLong(1), got.getLong(2))
        === ((vs.size.toLong, m, mad)), s"values $vs")
    }
  }

  test("reaggregation algebra law: weekly-from-daily == weekly-from-rows") {
    // the rel_reaggregate contract generalized beyond the fixture: for
    // ANY (day, cents) multiset, rolling the daily rollup up to weeks
    // (sum of sums / sum of counts / min of mins / max of maxes) equals
    // aggregating the raw rows at week grain directly
    val s = spark
    import s.implicits._
    val rowGen = for {
      day <- Gen.choose(0L, 20L)
      c <- Gen.choose(-5000L, 50000L)
    } yield (day, c)
    samples(Gen.listOfN(60, rowGen), 6).foreach { rows =>
      val df = rows.toDF("day", "c")
      val daily = df.groupBy(col("day")).agg(count(lit(1)).as("n"),
        sum(col("c")).as("s"), min(col("c")).as("mn"), max(col("c")).as("mx"))
      val weeklyFromDaily = daily.groupBy(expr("day DIV 7").as("wk"))
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
          min(col("mn")).as("mn"), max(col("mx")).as("mx"))
        .orderBy(col("wk")).collect().map(_.toSeq).toSeq
      val weeklyDirect = df.groupBy(expr("day DIV 7").as("wk"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
          min(col("c")).as("mn"), max(col("c")).as("mx"))
        .orderBy(col("wk")).collect().map(_.toSeq).toSeq
      assert(weeklyFromDaily === weeklyDirect)
    }
  }
}
