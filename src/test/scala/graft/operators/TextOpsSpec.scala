package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class TextOpsSpec extends GraftSparkSpec {

  private def one(text: String) =
    spark.createDataFrame(Seq(Tuple1(text))).toDF("text")

  test("shingles: trigrams, distinct, empty under 3 tokens") {
    val sh = one("a b c d").select(TextOps.shingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    assert(one("a b").select(TextOps.shingles(col("text"), 3))
      .head().getSeq[String](0).isEmpty)
    // repeated trigrams dedup
    assert(one("a b a b a b").select(TextOps.shingles(col("text"), 3))
      .head().getSeq[String](0).toSet === Set("a b a", "b a b"))
  }

  test("regex tokenizer splits punctuation like a BPE pretokenizer") {
    val toks = one("hello, world! x2").select(TextOps.regexTokens(col("text")))
      .head().getSeq[String](0)
    assert(toks === Seq("hello", ",", "world", "!", "x2"))
  }

  test("language-ID flags marker-rich text as en") {
    val en = one("the cat sat on the mat and the dog is in a house of cards")
    val und = one("alpha beta gamma delta epsilon zeta eta theta")
    assert(en.select(TextOps.langId(col("text"))).head().getString(0) === "en")
    assert(und.select(TextOps.langId(col("text"))).head().getString(0) === "und")
  }

  test("fingerprints: exact differs under reorder, normalized does not") {
    val df = spark.createDataFrame(Seq(
      ("a b c", "c b a"))).toDF("x", "y")
    val r = df.select(
      (TextOps.fingerprint(col("x")) === TextOps.fingerprint(col("y"))).as("exact_eq"),
      (TextOps.normalizedFingerprint(col("x")) === TextOps.normalizedFingerprint(col("y"))).as("norm_eq"))
      .head()
    assert(!r.getBoolean(0) && r.getBoolean(1))
  }

  test("term frequencies count every token occurrence") {
    val docs = spark.createDataFrame(Seq(
      (0L, "a b a"), (1L, "b c"))).toDF("doc_id", "text")
    val tf = TextOps.termFrequencies(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf === Map("a" -> 2, "b" -> 2, "c" -> 1))
  }
}
