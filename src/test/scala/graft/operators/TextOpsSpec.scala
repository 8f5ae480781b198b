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

  test("RAKE: degree/frequency scores, stopword segmentation, maxLen cap") {
    val s = spark
    import s.implicits._
    // "x y the x": phrases "x y" (len 2) and "x" (len 1);
    // x: freq 2, deg 3 → 1.5; y: freq 1, deg 2 → 2.0;
    // scores: "x y" = 3.5, "x" = 1.5
    val docs = Seq((0L, "x y the x")).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs, Seq("the"), 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("x y", 2L, 3.5), ("x", 1L, 1.5)))
    // a phrase longer than maxLen disappears AND its words don't score
    val long = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    assert(TextOps.rakeKeywords(long, Seq("the"), 10, maxLen = 4).count() === 0)
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

  test("tf-idf: counts, rational-scaled score, and ln score agree with hand math") {
    val docs = spark.createDataFrame(Seq(
      (0L, "a a b"), (1L, "a c"), (2L, "c c c"))).toDF("doc_id", "text")
    val rows = TextOps.tfIdf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    // term a: df=2; doc 0 tf=2
    assert(rows((0L, "a"))._1 === 2L && rows((0L, "a"))._2 === 2L)
    assert(rows((0L, "a"))._4 === 2L * (3L * 1000000L / 2L))
    // ln score within ulp noise (Spark's codegen log vs math.log can
    // differ in the last bit — the reason tfidf_scaled exists)
    assert(math.abs(rows((0L, "a"))._5 - 2.0 * math.log(3.0 / 2.0)) < 1e-12)
    // term b: df=1; idf_scaled = 3e6
    assert(rows((0L, "b"))._3 === 3L && rows((0L, "b"))._4 === 3000000L)
    assert(math.abs(rows((0L, "b"))._5 - math.log(3.0)) < 1e-12)
    // term c in both docs 1 and 2
    assert(rows((2L, "c"))._1 === 3L && rows((2L, "c"))._2 === 2L)
  }

  test("chunking: window starts, overlap, short tail, sub-chunk doc") {
    val docs = spark.createDataFrame(Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "x y"))).toDF("doc_id", "text")
    val ch = TextOps.chunkTokens(docs, 4, 1).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3), r.getString(4)))
      .toMap
    // step 3: starts 0,3,6,9
    assert(ch((0L, 0)) === ((0, 4, "t1 t2 t3 t4")))
    assert(ch((0L, 1)) === ((3, 4, "t4 t5 t6 t7")))
    assert(ch((0L, 2)) === ((6, 4, "t7 t8 t9 t10")))
    assert(ch((0L, 3)) === ((9, 1, "t10"))) // short tail
    assert(ch((1L, 0)) === ((0, 2, "x y"))) // doc shorter than one chunk
    assert(ch.size === 5)
  }

  test("pii scrub replaces emails, urls, long numbers; keeps short numbers") {
    val dirty = "write bob.smith+x@corp.example.org or see " +
      "https://ex.com/a?b=1 code 12345678 but room 421 stays"
    val got = one(dirty).select(TextOps.scrubPii(col("text"))).head().getString(0)
    assert(got === "write <EMAIL> or see <URL> code <NUM> but room 421 stays")
  }

  test("repetition features match hand math on planted repetitive text") {
    val docs = spark.createDataFrame(Seq(
      (0L, "a b a b a", "s"), // 2-grams {a b:2, b a:2}; 3-grams {a b a:2, b a b:1}
      (1L, "v w x y z", "s"), // all unique
      (2L, "one two", "s"), // one 2-gram, no 3-grams
      (3L, "solo", "s") // no n-grams at all
    )).toDF("doc_id", "text", "source")
    val r = TextOps.repetitionFeatures(docs).collect().map(x => x.getLong(0) ->
      ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4),
        x.getDouble(5), x.getDouble(6), x.getInt(7)))).toMap
    assert(r(0L) === ((5L, 2L, 0.4, 2L, 1.0, 2.0 / 3.0, 0)))
    assert(r(1L) === ((5L, 5L, 1.0, 1L, 0.0, 0.0, 1)))
    assert(r(2L) === ((2L, 2L, 1.0, 1L, 0.0, 0.0, 1)))
    assert(r(3L) === ((1L, 1L, 1.0, 0L, 0.0, 0.0, 1)))
  }

  test("contamination report matches hand math; clean and short docs absent") {
    val bench = spark.createDataFrame(Seq(
      (100L, "a b c d"), // trigrams {a b c, b c d}
      (101L, "a b c q") // trigrams {a b c, b c q} — shares 'a b c' with 100
    )).toDF("doc_id", "text")
    val train = spark.createDataFrame(Seq(
      (1L, "a b c x"), // shares 'a b c' (1 of 2 grams, both bench docs)
      (2L, "x b c d y"), // shares 'b c d' (1 of 3 grams, bench 100 only)
      (3L, "z z z z"), // no overlap
      (4L, "x y") // too short for trigrams
    )).toDF("doc_id", "text")
    val r = TextOps.contaminationReport(train, bench, 3, 0.4)
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getInt(5))))
      .toMap
    assert(r.keySet === Set(1L, 2L))
    assert(r(1L) === ((2L, 1L, 2L, 0.5, 1)))
    assert(r(2L) === ((3L, 1L, 1L, 1.0 / 3.0, 0)))
  }

  test("count-min sketch: exact when collision-free, total-mass bound at width 1") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a a a b b c"), (2L, "a b d"))).toDF("doc_id", "text")
    // 9 tokens: a=4 b=3 c=1 d=1
    val wide = TextOps.cmsTermEstimates(docs, width = 1024, depth = 4, topK = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(wide("a") === ((4L, 4L)) && wide("b") === ((3L, 3L)))
    assert(wide.values.forall { case (t, e) => e === t }) // no collisions at 1024
    // width 1: every term shares the single cell -> estimate = total mass
    val narrow = TextOps.cmsTermEstimates(docs, width = 1, depth = 4, topK = 4)
      .collect()
    narrow.foreach { r =>
      assert(r.getLong(2) === 9L) // est = all 9 tokens
      assert(r.getInt(3) === 1) // overestimate contract still holds
    }
  }

  test("sequence packing matches hand math and conserves tokens") {
    // token axis (L=4): doc 1 [0,3) | doc 2 [3,9) | doc 3 [9,10) | doc 4 [10,12)
    // seq 0 = docs {1, 2}, seq 1 = doc {2}, seq 2 = docs {2, 3, 4}
    val docs = spark.createDataFrame(Seq(
      (1L, "a b c"), // 3 tokens
      (2L, "d e f g h i"), // 6 tokens, spans seqs 0-2
      (3L, "j"), // 1 token
      (4L, "k l") // 2 tokens — final, short seq
    )).toDF("doc_id", "text").repartition(3) // prefix sum must be partition-independent
    val r = TextOps.packSequences(docs, 4).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))))
      .toMap
    assert(r.keySet === Set(0L, 1L, 2L))
    assert(r(0L) === ((2L, 4L, 1L, 1L, 2L))) // doc 2 split into seq 1
    assert(r(1L) === ((1L, 4L, 1L, 2L, 2L))) // doc 2 alone, split again
    assert(r(2L) === ((3L, 4L, 0L, 2L, 4L)))
    // conservation: every token lands in exactly one sequence
    assert(r.values.map(_._2).sum === 12L)
  }

  test("sequence packing: every sequence but the last is exactly full") {
    val docs = spark.createDataFrame(
      (1L to 97L).map(i => (i, Seq.fill((i % 7).toInt + 1)("t").mkString(" ")))
    ).toDF("doc_id", "text")
    val rows = TextOps.packSequences(docs, 16).orderBy(col("seq_id")).collect()
    val total = (1L to 97L).map(i => (i % 7) + 1).sum
    assert(rows.map(_.getLong(2)).sum === total)
    rows.dropRight(1).foreach(x => assert(x.getLong(2) === 16L))
    assert(rows.last.getLong(2) === (if (total % 16 == 0) 16L else total % 16))
    // split accounting: a doc spanning m sequences contributes m-1 splits
    assert(rows.map(_.getLong(1)).sum - 97L === rows.map(_.getLong(3)).sum)
  }

  test("bm25: rank, hit counts, and score agree with hand math") {
    val docs = spark.createDataFrame(Seq(
      (1L, "spark spark fast"),
      (2L, "join fast fast"),
      (3L, "slow slow slow slow slow slow"))).toDF("doc_id", "text")
    val rows = TextOps.bm25TopK(docs, Seq("spark", "join"), 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // doc 3 has no query term — never scored
    assert(rows.map(_._2).toSeq === Seq(1L, 2L))
    assert(rows.map(_._3).toSeq === Seq(1L, 1L)) // one hit term each
    // n_docs=3, total_dl=12, avgdl=4; df(spark)=df(join)=1:
    // idf_scaled = ((3-1)*2+1)*1e6 DIV 3 = 1666666
    val idf = (((3L - 1) * 2 + 1) * 1000000L) / 3L
    def score(tf: Double, dl: Double): Double =
      idf.toDouble * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / 4.0)))) / 1000000.0
    assert(math.abs(rows(0)._5 - score(2.0, 3.0)) < 1e-12)
    assert(math.abs(rows(1)._5 - score(1.0, 3.0)) < 1e-12)
    assert(rows(0)._5 > rows(1)._5) // higher tf at equal dl ranks first
  }

  test("gopherRules: each rule fires on its designed violation") {
    // 10 tokens x 3 = 30 tokens, mean word length 4.8, two stopword
    // hits per repeat ("the", "a") — passes every rule
    val base = Array.fill(3)(
      "the quick brown foxes jumped over a sleepy gigantic hound")
      .mkString(" ")
    val docs = spark.createDataFrame(Seq(
      (1L, base),                                   // clean: passes
      (2L, "tiny doc"),                             // too few tokens
      (3L, base + " " + Array.fill(12)("####$$$$").mkString(" ")), // symbols
      (4L, base.split(" ").zipWithIndex                            // ellipses
        .map { case (t, i) => if (i % 2 == 0) t + "..." else t }
        .mkString(" ")),
      (5L, base.split(" ").map(t => t + "9999999999").mkString(" ")) // long words
      )).toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(7)).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
    // spot-check features on the clean doc
    val clean = TextOps.gopherRules(docs).filter(col("doc_id") === 1).head()
    assert(clean.getLong(1) === 30L)   // n_tokens
    assert(clean.getDouble(2) === 4.8) // mean_token_len
    assert(clean.getDouble(3) === 1.0) // alpha_word_frac
    assert(clean.getDouble(4) === 0.0) // ellipsis_frac
    assert(clean.getDouble(5) === 0.0) // symbol_word_ratio
    assert(clean.getLong(6) === 6L)    // stop_hits
  }

  test("hashVectors match an independent JVM reimplementation") {
    val docs = spark.createDataFrame(Seq(
      (1L, "the cat sat on the mat"),
      (2L, "dog"),
      (3L, "the the the"))).toDF("doc_id", "text")
    val dim = 8
    def hash40(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(10), 16)
    }
    def expected(text: String): Seq[Double] = {
      val v = new Array[Long](dim)
      text.split(" ").foreach { t =>
        val h = hash40(t)
        v((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1L else -1L)
      }
      v.map(_.toDouble).toSeq
    }
    val got = TextOps.hashVectors(docs, dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) === expected("the cat sat on the mat"))
    assert(got(2L) === expected("dog"))
    assert(got(3L) === expected("the the the"))
    // repeated token accumulates: doc 3 is 3x the single-"the" vector
    assert(got(3L).map(math.abs).sum === 3.0)
  }

  test("lmScore: smoothed bigram mean probability agrees with hand math") {
    // corpus: "a b a b" + "a b c" + one-token doc (no bigrams, dropped).
    // bigram counts: "a b"=3, "b a"=1, "b c"=1; prefix counts: a·=3, b·=2;
    // vocabulary {a,b,c,z} → |V|=4.
    val docs = spark.createDataFrame(Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "z"))).toDF("doc_id", "text")
    val rows = TextOps.lmScore(docs, 10).orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._2).toSeq === Seq(2L, 1L)) // doc 3 has no bigrams
    // doc1: p(ab)=4/7, p(ba)=2/6, p(ab)=4/7 → mean ((4/7)+(2/6)+(4/7))/3
    val d1 = (4.0 / 7 + 2.0 / 6 + 4.0 / 7) / 3
    // doc2: p(ab)=4/7, p(bc)=2/6 → mean; lower → ranked first (worst)
    val d2 = (4.0 / 7 + 2.0 / 6) / 2
    assert(rows(0)._5 === d2 && rows(1)._5 === d1)
    assert(d2 < d1)
    // novel bigrams (corpus count 1): doc1 has "b a"; doc2 has "b c"
    assert(rows.map(_._4).toSeq === Seq(1L, 1L))
    assert(rows.map(_._3).toSeq === Seq(2L, 3L)) // n_bigrams
  }

  test("lmScoreKnAll: exact-rational Kneser-Ney agrees with hand math") {
    // corpus: one doc "a b a b". Bigram types: (a,b) c=2, (b,a) c=1 →
    // T=2 types; c1: a·=2, b·=1; N1+(a·)=1, N1+(b·)=1; N1+(·b)=1,
    // N1+(·a)=1. With D=3/4:
    //   p(b|a) = ((4·2−3)·2 + 3·1·1) / (4·2·2) = 13/16
    //   p(a|b) = ((4·1−3)·2 + 3·1·1) / (4·1·2) = 5/8
    // doc mean over positions (ab, ba, ab) = (13/16 + 5/8 + 13/16)/3
    val docs = spark.createDataFrame(Seq((1L, "a b a b")))
      .toDF("doc_id", "text")
    val r = TextOps.lmScoreKnAll(docs).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 3L) // n_bigrams
    assert(r(0).getLong(2) === 1L) // n_singletons: (b,a) only
    assert(r(0).getDouble(3) === (13.0 / 16 + 5.0 / 8 + 13.0 / 16) / 3)
    // discounting sanity vs add-one: every KN prob here exceeds its
    // add-one counterpart would for a 2-token vocab — and the discount
    // means probabilities never reach the raw MLE c2/c1
    assert(r(0).getDouble(3) < (2.0 / 2 + 1.0 / 1 + 2.0 / 2) / 3)
  }

  private def dsirDocs(rows: (Long, String, Boolean)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text", "is_t")

  test("dsirScreen: target == raw makes every contrast exactly zero") {
    // when every doc is in the target, ct == cr and tot_t == tot_r per
    // bucket, so the integer ppm difference cancels to 0 identically and
    // the rank falls back to doc_id
    val docs = dsirDocs(1L -> ("aa bb cc", true), 2L -> ("dd ee", true),
      3L -> ("aa ee ff", true))
    val got = TextOps.dsirScreen(docs, org.apache.spark.sql.functions.col("is_t"), 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got === Seq(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("dsirScreen: target-vocabulary doc outranks disjoint-vocabulary doc") {
    // target speaks {alpha beta}; raw adds {zork quux} noise. A raw doc
    // written in target vocabulary must score strictly above one written
    // in the noise vocabulary, and n_feats counts unigrams + bigrams
    val docs = dsirDocs(
      1L -> ("alpha beta alpha", true), 2L -> ("beta alpha beta", true),
      10L -> ("alpha beta", false), 11L -> ("zork quux", false))
    val got = TextOps.dsirScreen(docs, org.apache.spark.sql.functions.col("is_t"), 64, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(10L)._2 === 3L) // 2 unigrams + 1 bigram
    assert(byId(10L)._3 > byId(11L)._3)
    assert(got.map(_._1).indexOf(10L) < got.map(_._1).indexOf(11L))
  }

  test("dsirScreen: topK truncates the deterministic rank") {
    val docs = dsirDocs(1L -> ("x y", true), 2L -> ("x y", false),
      3L -> ("x y", false), 4L -> ("p q", false))
    val got = TextOps.dsirScreen(docs, org.apache.spark.sql.functions.col("is_t"), 16, 2)
      .collect().map(_.getLong(0)).toSeq
    // docs 1-3 tie on the target-vocab score; doc_id breaks the tie
    assert(got === Seq(1L, 2L))
  }

  private implicit def tupleToTriple(t: (Long, (String, Boolean))): (Long, String, Boolean) =
    (t._1, t._2._1, t._2._2)

  test("heapsGrowth: first-appearance counting matches the hand-built curve") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a b"), (2L, "a c"), (3L, "c d"), (4L, "a d")))
      .toDF("doc_id", "text")
    // 2 buckets of 2 docs: bucket 0 sees {a,b,c} (3 new), bucket 1 adds {d}
    val got = TextOps.heapsGrowth(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((0L, 2L, 4L, 3L), (1L, 4L, 8L, 4L)))
  }

  test("heapsGrowth: final checkpoint equals the whole-corpus distinct vocabulary") {
    val docs = spark.createDataFrame(
      (1L to 30L).map(i => (i, s"w${i % 7} w${i % 11} shared")))
      .toDF("doc_id", "text")
    val curve = TextOps.heapsGrowth(docs, 5).collect()
    val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    assert(curve.last.getLong(3) === vocab)
    assert(curve.last.getLong(1) === 30L)
    // vocab growth is monotone non-decreasing
    val vs = curve.map(_.getLong(3)).toSeq
    assert(vs === vs.sorted)
  }
}
