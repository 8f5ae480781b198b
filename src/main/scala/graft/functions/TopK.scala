package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One lineitem-ish entry competing for the top-k. */
case class RankEntry(qty: Double, orderkey: Long, linenumber: Int)

/** Bounded-heap top-k typed aggregator (SURVEY §7.4): keeps at most k
  * entries ordered by (qty DESC, orderkey ASC, linenumber ASC).
  *
  * Why not a window: `row_number().over(partitionBy(g).orderBy(...))`
  * shuffles EVERY row to its group's partition and sorts — at 100 TB
  * that's the full fact table through the wire for a 3-row answer per
  * group. As an Aggregator, Catalyst runs it partial+final: each map task
  * reduces its split to ≤ k entries, the shuffle carries k rows per group
  * per task, and the final merge is k·log k. Same result, orders of
  * magnitude less shuffle.
  */
class TopKByQty(k: Int) extends Aggregator[RankEntry, Seq[RankEntry], Seq[RankEntry]] {

  private def better(a: RankEntry, b: RankEntry): Boolean =
    a.qty > b.qty ||
      (a.qty == b.qty && (a.orderkey < b.orderkey ||
        (a.orderkey == b.orderkey && a.linenumber < b.linenumber)))

  private def trim(s: Seq[RankEntry]): Seq[RankEntry] =
    s.sortWith(better).take(k)

  override def zero: Seq[RankEntry] = Seq.empty

  override def reduce(buf: Seq[RankEntry], e: RankEntry): Seq[RankEntry] =
    // k is tiny: insert + resort beats heap bookkeeping in practice
    trim(buf :+ e)

  override def merge(a: Seq[RankEntry], b: Seq[RankEntry]): Seq[RankEntry] =
    trim(a ++ b)

  override def finish(reduction: Seq[RankEntry]): Seq[RankEntry] = reduction

  override def bufferEncoder: Encoder[Seq[RankEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankEntry]]()
  override def outputEncoder: Encoder[Seq[RankEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankEntry]]()
}
