package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate (the `Aggregator` surface from SURVEY.md §4.2):
  * merges per-row MinHash signatures into the signature of the UNION of
  * the underlying sets, by element-wise minimum.
  *
  * Why this is the at-scale shape: min is commutative/associative, so
  * Spark plans it as partial (map-side) + final aggregation — a group's
  * signature is computed without ever colocating the group's raw shingle
  * sets. Estimated Jaccard between two group universes is then just
  * signature agreement: |{j : sigA[j] == sigB[j]}| / k. Constant-size
  * state (k longs) per group regardless of how many documents or shingles
  * feed it — the same reason HLL/theta sketches rule 100 TB aggregation.
  */
class MinHashMergeAggregator(numHashes: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
    if (sig != null) {
      val n = math.min(buf.length, sig.length)
      var i = 0
      while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashMergeAggregator {
  /** Column form: `minhash_union(sigCol, k)` usable in `agg(...)`. */
  def minhash_union(sig: Column, numHashes: Int): Column =
    udaf(new MinHashMergeAggregator(numHashes)).apply(sig)
}
