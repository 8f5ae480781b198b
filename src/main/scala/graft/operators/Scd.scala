package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the MERGE INTO shape every
  * warehouse pipeline runs nightly, expressed as pure declarative Spark
  * (no table format required; Delta/Iceberg MERGE compiles to exactly
  * this join-and-union plan).
  *
  * Type 2 semantics (Kimball): a dimension row's tracked attributes never
  * update in place — a change CLOSES the current version (valid_to =
  * batch date) and OPENS a new one, so every historical fact can still
  * join the attribute values that were true when it happened.
  */
object Scd {

  /** Merge one upsert batch into an SCD2 history.
    *
    * `history` carries (key, tracked..., valid_from, valid_to,
    * is_current) with dates as yyyy-MM-dd strings (the engine's
    * cross-engine date convention); `incoming` carries (key, tracked...).
    * Keys absent from the batch are untouched (partial-upsert batch, not
    * a full snapshot — deletes are out of SCD2 scope). Per incoming key:
    * unchanged tracked attributes → no-op; changed → close + reopen; new
    * key → first version. Comparisons are null-safe (`<=>`), so a NULL
    * attribute is a value, not a wildcard.
    *
    * Plan at 100 TB: ONE key-keyed full-outer join between the CURRENT
    * version slice and the batch — the historical (closed) slice passes
    * through untouched, so a production layout partitioned by
    * `is_current` rewrites O(current + batch), never O(history); with
    * both sides bucketed by the key the join is co-located and nothing
    * wide shuffles. The three output legs are projections of that one
    * join, unioned — Spark evaluates them as one exchange-shared scan. */
  def scd2Merge(history: DataFrame, incoming: DataFrame, key: String,
      tracked: Seq[String], batchDate: String): DataFrame = {
    require(tracked.nonEmpty, "SCD2 needs at least one tracked attribute")
    val outCols: Seq[Column] =
      (Seq(key) ++ tracked ++ Seq("valid_from", "valid_to", "is_current"))
        .map(col)
    val closedSlice = history.filter(!col("is_current"))
    val cur = history.filter(col("is_current"))
    val in = incoming.select(
      col(key) +: lit(true).as("in_present") +:
        tracked.map(c => col(c).as(s"in_$c")): _*)
    val j = cur.withColumn("cur_present", lit(true))
      .join(in, Seq(key), "full")
    val changed = col("cur_present").isNotNull && col("in_present").isNotNull &&
      tracked.map(a => !(col(a) <=> col(s"in_$a"))).reduce(_ || _)
    val isNew = col("cur_present").isNull
    // leg 1: current versions that survive unchanged (or saw no batch row)
    val untouched = j.filter(!isNew && !changed).select(outCols: _*)
    // leg 2: superseded versions, closed at the batch date
    val closed = j.filter(changed)
      .withColumn("valid_to", lit(batchDate))
      .withColumn("is_current", lit(false))
      .select(outCols: _*)
    // leg 3: freshly opened versions (changed keys + brand-new keys)
    val opened = j.filter(changed || isNew)
      .select(Seq(col(key)) ++ tracked.map(a => col(s"in_$a").as(a)) ++ Seq(
        lit(batchDate).as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current")): _*)
    closedSlice.select(outCols: _*)
      .unionAll(untouched).unionAll(closed).unionAll(opened)
  }

  /** Point-in-time (time-travel) snapshot of an SCD2 version table: the
    * versions live at `date` — valid_from ≤ date < valid_to (open
    * versions have NULL valid_to). ISO 'YYYY-MM-DD' strings compare
    * lexicographically ≡ chronologically, so the filter is engine-
    * portable with no date-type coercion. This is a pure narrow filter:
    * at scale it rides partition pruning on is_current/valid_to — the
    * historical reconstruction never touches more than the scan. */
  def asOf(versions: DataFrame, date: String): DataFrame =
    versions.filter(col("valid_from") <= lit(date) &&
      (col("valid_to").isNull || col("valid_to") > lit(date)))
}
