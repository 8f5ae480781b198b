package graft.operators

import org.apache.spark.sql.Row

import graft.GraftSparkSpec

/** Hand-math goldens for [[Scd.scd2Merge]]: closed-history pass-through,
  * unchanged current versions, close+reopen on change, brand-new keys,
  * batch no-ops, and NULL-safe attribute comparison (NULL is a value,
  * not a wildcard). */
class ScdSpec extends GraftSparkSpec {

  private def df(rows: Seq[(Long, String, String, String, Boolean)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "seg", "valid_from", "valid_to", "is_current")
  }

  test("one merge exercises every leg") {
    val s = spark
    import s.implicits._
    val history = df(Seq(
      (1L, "A", "1990-01-01", "1992-01-01", false), // closed history
      (1L, "B", "1992-01-01", null, true),
      (2L, "X", "1992-01-01", null, true),
      (3L, null, "1992-01-01", null, true)))        // NULL attribute value
    val incoming = Seq(
      (1L, "B"),      // no-op: unchanged
      (2L, "Y"),      // change: close + reopen
      (3L, null),     // no-op: NULL <=> NULL
      (4L, "Z"))      // new key
      .toDF("k", "seg")
    val out = Scd.scd2Merge(history, incoming, "k", Seq("seg"), "2000-01-01")
      .orderBy("k", "valid_from").collect()
    assert(out.toSeq === Seq(
      Row(1L, "A", "1990-01-01", "1992-01-01", false),
      Row(1L, "B", "1992-01-01", null, true),
      Row(2L, "X", "1992-01-01", "2000-01-01", false),
      Row(2L, "Y", "2000-01-01", null, true),
      Row(3L, null, "1992-01-01", null, true),
      Row(4L, "Z", "2000-01-01", null, true)))
  }

  test("NULL to value counts as a change; merges chain across batches") {
    val s = spark
    import s.implicits._
    val history = df(Seq((3L, null, "1992-01-01", null, true)))
    val b1 = Scd.scd2Merge(history,
      Seq((3L, "W")).toDF("k", "seg"), "k", Seq("seg"), "2000-01-01")
    val b2 = Scd.scd2Merge(b1,
      Seq((3L, "V")).toDF("k", "seg"), "k", Seq("seg"), "2001-01-01")
    assert(b2.orderBy("valid_from").collect().toSeq === Seq(
      Row(3L, null, "1992-01-01", "2000-01-01", false),
      Row(3L, "W", "2000-01-01", "2001-01-01", false),
      Row(3L, "V", "2001-01-01", null, true)))
  }

  test("asOf reconstructs each era; boundary day belongs to the new version") {
    val versions = df(Seq(
      (1L, "A", "1992-01-01", "1995-06-17", false),
      (1L, "B", "1995-06-17", null, true),
      (2L, "C", "1993-01-01", null, true)))
    def snap(dt: String) = Scd.asOf(versions, dt).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap("1994-01-01") === Map(1L -> "A", 2L -> "C"))
    assert(snap("1996-01-01") === Map(1L -> "B", 2L -> "C"))
    // the merge day itself: old version closed (valid_to NOT >), new open
    assert(snap("1995-06-17") === Map(1L -> "B", 2L -> "C"))
    // before any version of key 2 exists
    assert(snap("1992-06-01") === Map(1L -> "A"))
  }
}
