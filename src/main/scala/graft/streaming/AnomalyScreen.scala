package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live-feed anomaly screen — the streaming half of
  * [[graft.operators.Profile.zOutliers]]: a static per-key stats table
  * (built once from history via [[graft.operators.Profile.groupStats]] —
  * exact decimal moments, degenerate keys pre-excluded) is joined against
  * an arriving event stream, and rows more than `t` population-σ from
  * their key's historical mean are flagged.
  *
  * This is a PURE stream transform: all per-row work is narrow, the
  * stream-static equi-join is stateless (Append-mode safe — no watermark,
  * no state store), and the stats side is a broadcast — the stream never
  * shuffles. At 100 TB-of-history scale the stats frame is |keys| rows
  * (users), refreshed on whatever cadence the history job runs; the live
  * path cost is one hash probe per event. Works identically on a batch
  * frame — the stream == batch law is asserted in AnomalyScreenSpec.
  */
object AnomalyScreen {

  /** Flag rows with |v − μ_key| > t·σ_key. `vCol` must be integer-valued
    * (cents); `stats` must be a [[graft.operators.Profile.groupStats]]
    * frame (keyCol, n, mu, std). Output: the input columns plus `z` (the
    * one reserved output name — a stream already carrying `z` is
    * rejected; the stats columns join under `__`-prefixed internal
    * names, so streams may freely carry `mu`/`std`/`n`). */
  def flag(stream: DataFrame, stats: DataFrame, keyCol: String,
      vCol: String, t: Double): DataFrame = {
    require(!stream.columns.contains("z"),
      "AnomalyScreen.flag appends a `z` column; rename the stream's existing `z` first")
    val s = stats.drop("n")
      .withColumnRenamed("mu", "__mu").withColumnRenamed("std", "__std")
    stream.join(broadcast(s), Seq(keyCol))
      .withColumn("z", (col(vCol).cast("double") - col("__mu")) / col("__std"))
      .filter(abs(col("z")) > t)
      .drop("__mu", "__std")
  }
}
