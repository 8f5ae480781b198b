package graft.operators

import org.apache.spark.sql.Row

import graft.GraftSparkSpec

/** Hand-math goldens for [[TextOps.bpeTrain]]: pair counts weighted by
  * word frequency with overlapping occurrences counted (get_stats
  * semantics), (total DESC, a, b) tie-break, greedy leftmost
  * non-overlapping merge application (the boundary-space replace trick),
  * merged symbols participating in later rounds, and clean stop when no
  * pairs remain. */
class BpeTrainSpec extends GraftSparkSpec {

  test("merge table: weighting, tie-break, overlap, exhaustion") {
    val s = spark
    import s.implicits._
    // words: abab ×2, aaa ×1
    val docs = Seq((0L, "abab aaa"), (1L, "abab")).toDF("doc_id", "text")
    val out = TextOps.bpeTrain(docs, rounds = 6).collect()
    assert(out.toSeq === Seq(
      // (a,b) occurs twice in abab ×2 words = 4; beats (a,a)=2, (b,a)=2
      Row(1, "a", "b", "ab", 4L),
      // tie at 2 between (a,a) [overlapping in aaa] and (ab,ab);
      // tie-break on left symbol: "a" < "ab"
      Row(2, "a", "a", "aa", 2L),
      // greedy application left aaa as [aa, a]; abab is [ab, ab]
      Row(3, "ab", "ab", "abab", 2L),
      Row(4, "aa", "a", "aaa", 1L)))
    // round 5+: every word is a single symbol — no pairs, no rows
  }

  test("bpeEncode: learned merges replay in rank order, fertility exact") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "abab aaa"), (1L, "abab")).toDF("doc_id", "text")
    // merges from the train fixture above: ab, aa, abab, aaa
    val merges = TextOps.bpeTrain(docs, rounds = 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextOps.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // after all merges: abab -> 1 piece, aaa -> 1 piece
    assert(got(0L) === ((2L, 2L, 1.0)))
    assert(got(1L) === ((1L, 1L, 1.0)))
    // with only the FIRST merge, abab -> [ab, ab] (2), aaa -> [a,a,a] (3)
    val got1 = TextOps.bpeEncode(docs, merges.take(1)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got1(0L) === 5L && got1(1L) === 2L)
    // merge ORDER matters: applying [aa] before [ab] leaves abab at 4
    val gotSwapped = TextOps.bpeEncode(docs, Seq(("a", "a"))).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotSwapped(1L) === 4L)
  }

  test("adjacent occurrences merge back-to-back in one round") {
    val s = spark
    import s.implicits._
    // [x,y,x,y,x,y]: greedy (x,y) must yield 3 merges, so the next
    // round sees (xy,xy) twice — the shared-separator case the
    // boundary-space replace is built for
    val docs = Seq((0L, "xyxyxy")).toDF("doc_id", "text")
    val out = TextOps.bpeTrain(docs, rounds = 2).collect()
    assert(out.toSeq === Seq(
      Row(1, "x", "y", "xy", 3L),
      Row(2, "xy", "xy", "xyxy", 2L)))
  }
}
