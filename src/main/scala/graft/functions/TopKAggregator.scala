package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator — the PARTIAL-AGGREGATION
  * answer to "top k rows per key".
  *
  * The window formulation (`row_number over (partition by key order by
  * score) <= k`) shuffles and SORTS every row of every group; this
  * aggregator keeps a k-bounded sorted buffer per group, so the map side
  * reduces each partition's contribution to at most k rows per key before
  * the shuffle, and the merge side merges k-bounded buffers — the same
  * shape as `TakeOrderedAndProject`, but per key. At 100 TB with hot keys
  * this is the difference between shuffling the corpus and shuffling
  * k·|keys| rows.
  *
  * Ordering: (score DESC, id ASC) — the engine's Q7 tie-break contract.
  * Generic in the id type `I` (Long vec ids, String chunk ids) so the
  * cut-off logic exists exactly once; input rows are (key, id, score)
  * with the key carried by groupByKey.
  */
class TopKByScore[K, I](k: Int)(implicit idOrd: Ordering[I],
    seqEnc: Encoder[Seq[(Double, I)]])
    extends Aggregator[(K, I, Double), Seq[(Double, I)], Seq[(Double, I)]] {

  private def better(a: (Double, I), b: (Double, I)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && idOrd.lt(a._2, b._2))

  override def zero: Seq[(Double, I)] = Vector.empty

  override def reduce(buf: Seq[(Double, I)], in: (K, I, Double)): Seq[(Double, I)] = {
    val x = (in._3, in._2)
    if (buf.length >= k && better(buf.last, x)) buf // below the cut: drop
    else ((buf :+ x).sortWith(better)).take(k)
  }

  override def merge(a: Seq[(Double, I)], b: Seq[(Double, I)]): Seq[(Double, I)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[(Double, I)]): Seq[(Double, I)] = r

  override def bufferEncoder: Encoder[Seq[(Double, I)]] = seqEnc
  override def outputEncoder: Encoder[Seq[(Double, I)]] = seqEnc
}

object TopKAggregator {
  /** Convenience for Long-id callers, encoders resolved at the call site
    * (`import spark.implicits._`).
    */
  def topK(k: Int)(implicit seqEnc: Encoder[Seq[(Double, Long)]]): TopKByScore[Long, Long] =
    new TopKByScore[Long, Long](k)

  /** String-id variant (engine chunk ids). */
  def topKStr(k: Int)(implicit seqEnc: Encoder[Seq[(Double, String)]]): TopKByScore[Long, String] =
    new TopKByScore[Long, String](k)

  /** String-keyed, string-id variant (per-node graph cuts — the key slot
    * is unused by the fold; it only has to match the element type).
    */
  def topKStrKey(k: Int)(implicit seqEnc: Encoder[Seq[(Double, String)]])
      : TopKByScore[String, String] =
    new TopKByScore[String, String](k)
}
