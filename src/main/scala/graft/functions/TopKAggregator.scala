package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored row inside the aggregator: ordered by score DESC, id ASC. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k-per-group as a typed Aggregator — the at-scale
  * replacement for the `row_number().over(partitionBy(g).orderBy(...))
  * <= k` idiom.
  *
  * The window form sorts EVERY row of every group and shuffles them all
  * to do it. This aggregator's state is a k-bounded buffer, and because
  * reduce/merge are commutative-associative Spark plans it as partial
  * (map-side) + final aggregation: each task forwards at most k rows per
  * group, so the shuffle carries k × groups × partitions rows instead of
  * the whole input — the same reason sketches rule 100 TB aggregation.
  * Determinism: total order (score DESC, id ASC), so ties cannot make
  * the result partition-dependent.
  *
  * Buffer is a sorted Seq capped at k (k is small by construction);
  * insertion is O(k) per row without allocation churn beyond the buffer.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0 && k <= 1024)

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], row: ScoredId): Seq[ScoredId] = {
    if (buf.length >= k && !better(row, buf.last)) buf
    else {
      val i = buf.indexWhere(b => better(row, b))
      val at = if (i < 0) buf.length else i
      (buf.take(at) :+ row) ++ buf.drop(at).take(k - at - 1)
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAggregator {
  /** Column form: `top_k(score, id, k)` usable in `agg(...)`; returns
    * `array<struct<score, id>>` sorted best-first.
    */
  def top_k(score: Column, id: Column, k: Int): Column =
    udaf(new TopKAggregator(k)).apply(score, id)
}
