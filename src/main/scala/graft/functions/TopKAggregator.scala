package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
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
  * Input rows are (key, id, score); the key is carried by groupByKey.
  */
class TopKByScore(k: Int)(implicit seqEnc: Encoder[Seq[(Double, Long)]])
    extends Aggregator[(Long, Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Long, Double)): Seq[(Double, Long)] = {
    val x = (in._3, in._2)
    if (buf.length >= k && better(buf.last, x)) buf // below the cut: drop
    else ((buf :+ x).sortWith(better)).take(k)
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = seqEnc
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = seqEnc
}

/** String-id variant (engine chunk ids): same contract and ordering
  * ((score DESC, id ASC), the Q7 tie-break) over (key, chunk_id, score).
  */
class TopKByScoreStr(k: Int)(implicit seqEnc: Encoder[Seq[(Double, String)]])
    extends Aggregator[(Long, String, Double), Seq[(Double, String)], Seq[(Double, String)]] {

  private def better(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, String)] = Vector.empty

  override def reduce(buf: Seq[(Double, String)],
      in: (Long, String, Double)): Seq[(Double, String)] = {
    val x = (in._3, in._2)
    if (buf.length >= k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better)).take(k)
  }

  override def merge(a: Seq[(Double, String)],
      b: Seq[(Double, String)]): Seq[(Double, String)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[(Double, String)]): Seq[(Double, String)] = r

  override def bufferEncoder: Encoder[Seq[(Double, String)]] = seqEnc
  override def outputEncoder: Encoder[Seq[(Double, String)]] = seqEnc
}

object TopKAggregator {
  /** Convenience: Encoders.product-free construction using the built-in
    * implicit encoders at the call site (`import spark.implicits._`).
    */
  def topK(k: Int)(implicit seqEnc: Encoder[Seq[(Double, Long)]]): TopKByScore =
    new TopKByScore(k)
}
