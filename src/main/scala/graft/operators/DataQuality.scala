package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract audit — the nightly screen a training-data pipeline runs
  * before promoting an ingest batch: null/domain/range shares, referential
  * orphans, key uniqueness, each emitted as one
  * `(check_name, n_rows, n_violations, violation_share)` row.
  *
  * Scale design (100 TB): every column-level check on the same table FUSES
  * into one conditional-aggregation scan — adding a check adds a `sum(when)`
  * to an existing pass, never a pass. Referential checks are keyed
  * left-join counts against the parent's distinct keys (build side
  * broadcastable for dimension parents). Uniqueness is one groupBy on the
  * key — duplicates counted from the grouped frame, no DISTINCT-Expand.
  * The audit result is a union of 1-row frames: driver-sized, no matter
  * the corpus.
  */
object DataQuality {

  /** One scan, many checks: each (name, violationCondition) becomes a
    * conditional sum over a single pass of `df`. A null condition (e.g. a
    * predicate over a null column) counts as non-violating, mirroring SQL
    * CASE semantics on both engines.
    *
    * Check names are constrained to `[A-Za-z0-9_]+` and may not be
    * `n_rows`: the names are interpolated into the stack(...) expression
    * and used as agg aliases, so a quote/backtick would break the
    * expression and the reserved name would collide with the row-count
    * alias — both rejected loudly here instead of failing obscurely (or
    * silently misparsing) downstream. */
  def columnChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "columnChecks needs at least one check")
    checks.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"check name '$n' must match [A-Za-z0-9_]+ (it is interpolated " +
          "into a stack() expression and used as an agg alias)")
      require(n != "n_rows", "check name 'n_rows' collides with the row-count alias")
    }
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    one.select(
      expr(s"stack(${checks.size}, $stacked) AS (check_name, n_violations)"),
      col("n_rows"))
      .select(col("check_name"), col("n_rows"), col("n_violations"))
  }

  /** Referential orphans: child rows whose key has no match in `parent`
    * (a null child key is an orphan — it references nothing). Total and
    * orphan counts come out of the same joined pass. */
  def fkCheck(name: String, child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val p = parent.select(parentKey.as("__pk")).distinct()
    child.select(childKey.as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left_outer")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
  }

  /** Duplicate-key rows: n_rows minus distinct keys, read off one grouped
    * frame (sum of per-key count-1 excesses). */
  def uniqueCheck(name: String, df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("__k")).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
        coalesce(sum(col("cnt") - lit(1L)), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))

  /** Union the per-check frames and attach the fixed-IEEE violation share
    * (one double division of exact longs). */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .withColumn("violation_share",
        col("n_violations").cast("double") / col("n_rows").cast("double"))
      .orderBy(col("check_name"))

  /** ZERO-extra-pass pipeline metrics via the Observation API
    * (SPARK-34806): the metric aggregates ride the SAME job `drive` runs —
    * computed per-task on rows as they stream through the observe node and
    * merged on the driver through an accumulator, no second scan and no
    * shuffle of their own. This is the 100 TB counterpart of
    * [[columnChecks]]: columnChecks is the standalone audit (its own scan);
    * observedMetrics instruments a pass the pipeline ALREADY pays for
    * (e.g. the write of a curated corpus) and records the audit for free.
    *
    * `drive` must run an action that consumes EVERY row of the observed
    * frame (a full aggregate, a write) — observed metrics cover exactly the
    * rows the action processed, so a LIMIT-style partial action would
    * under-count (same contract as Spark's own docs). Returns the metric
    * values keyed by their aliases. */
  def observedMetrics(df: DataFrame, metrics: Seq[Column],
      drive: DataFrame => Unit): Map[String, Any] = {
    require(metrics.nonEmpty, "observedMetrics needs at least one metric")
    val obs = new org.apache.spark.sql.Observation()
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    drive(observed)
    obs.get
  }

  /** k-anonymity audit (Sweeney 2002): every quasi-identifier equivalence
    * class with its size, a `violates_k` flag, and the re-identification
    * risk ceiling `1e6/size` in exact integer ppm. One partial-aggregated
    * scan; output cardinality is the (bounded) QI domain, not the row
    * count, so the map side combines to a few hundred rows per partition
    * before the only shuffle — the privacy gate a corpus clears before
    * release costs one cheap pass at any scale. */
  def kAnonymity(df: DataFrame, qi: Seq[Column], k: Int): DataFrame = {
    require(qi.nonEmpty && k >= 1, "need quasi-identifier columns and k >= 1")
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("violates_k", (col("class_size") < k).cast("int"))
      .withColumn("reident_ppm",
        expr("CAST(1000000 AS BIGINT) DIV class_size"))
  }
}
