package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * All operators are pure narrow column expressions (whole-stage codegen,
  * no shuffle) until an explicit aggregation — at 100 TB the scan cost
  * dominates and these add streaming per-row work only.
  */
object TextOps {

  /** Whitespace tokenization. The corpus is single-space separated
    * (FIXTURES.md §B); a BPE-ish regex variant is [[regexTokens]]. */
  def tokens(text: Column): Column = split(text, " ")

  /** Tokenizer for general text: words, numbers, or single
    * punctuation/symbol characters (BPE-pretokenizer-shaped). */
  def regexTokens(text: Column): Column = {
    // drop the empty leading element regexp-split can produce
    filter(split(text, """\s+|(?=[^\w\s])"""), t => length(t) > 0)
  }

  /** Distinct word n-gram shingles of the token array (dedup unit). Empty
    * array when the document has fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** English marker stopwords present in general text. */
  val enMarkers: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Count of marker-stopword occurrences (language-ID / quality signal). */
  def markerCount(text: Column, markers: Seq[String] = enMarkers): Column =
    size(filter(tokens(text), t => t.isin(markers.map(m => m: Any): _*)))

  /** Heuristic language-ID: marker-stopword ratio thresholding.
    * (The classic n-gram-profile approach reduces to scoring marker token
    * sets per language; with this corpus's vocabulary only the English
    * marker set is informative.) */
  def langId(text: Column): Column = {
    val n = size(tokens(text))
    val ratio = markerCount(text).cast("double") / n.cast("double")
    when(n === 0, lit("und")).when(ratio >= 0.02, lit("en")).otherwise(lit("und"))
  }

  /** Quality features: token count, mean token length, stopword ratio,
    * and a binary quality gate (Gopher-rule-shaped thresholds). */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val n = size(tokens(col("text")))
    val meanLen = (length(col("text")) - (n - 1)).cast("double") / n.cast("double")
    val swRatio = markerCount(col("text")).cast("double") / n.cast("double")
    docs.select(
      col("doc_id"),
      n.as("n_tokens"),
      meanLen.as("mean_token_len"),
      swRatio.as("stopword_ratio"),
      (n.between(20, 100000) && meanLen.between(2.0, 12.0)).cast("int").as("is_quality"))
  }

  /** Exact content fingerprint. */
  def fingerprint(text: Column): Column = md5(text)

  /** Order-insensitive fingerprint: md5 over the sorted distinct token set
    * (catches shuffled/duplicated-token variants of the same content). */
  def normalizedFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Token frequency across the corpus: explode → count. The explode is a
    * narrow 1→n expansion; the count is a partial+final hash aggregate
    * keyed by term (vocabulary-bounded state). */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
}
