package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** The ANN candidate cap + exact rerank as ONE bounded aggregation — the
  * streaming-safe fusion of the batch pipeline's two stateful steps
  * (`capPerQuery` by ADC distance, then top-k by exact score after
  * hydration). Structured Streaming allows one stateful operator on this
  * shape, so the exact score is computed per candidate row BEFORE the
  * aggregation and carried through the buffer; the buffer keeps the
  * best `cap` candidates by (dist_u ASC, chunk_id ASC) — exactly the
  * batch cap's order — and `finish` reranks those by (score DESC,
  * chunk_id ASC) and emits the top `k`. State per group is `cap` rows by
  * construction, so a forever-running stream holds k-bounded state.
  *
  * Input rows: (group key, chunk_id, dist_u, score).
  */
class CapRerank(cap: Int, k: Int)(implicit
    bufEnc: Encoder[Seq[(Long, String, Double)]],
    outEnc: Encoder[Seq[(Double, String)]])
    extends Aggregator[(Long, String, Long, Double),
      Seq[(Long, String, Double)], Seq[(Double, String)]] {

  // (dist_u asc, chunk_id asc): the batch capPerQuery order
  private def keeps(a: (Long, String, Double), b: (Long, String, Double)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, String, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, String, Double)],
      in: (Long, String, Long, Double)): Seq[(Long, String, Double)] = {
    val x = (in._3, in._2, in._4)
    if (buf.length >= cap && keeps(buf.last, x)) buf
    else ((buf :+ x).sortWith(keeps)).take(cap)
  }

  override def merge(a: Seq[(Long, String, Double)],
      b: Seq[(Long, String, Double)]): Seq[(Long, String, Double)] =
    (a ++ b).sortWith(keeps).take(cap)

  // (score desc, chunk_id asc): the engine's Q7 tie-break contract
  override def finish(r: Seq[(Long, String, Double)]): Seq[(Double, String)] =
    r.map(c => (c._3, c._2))
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(k)

  override def bufferEncoder: Encoder[Seq[(Long, String, Double)]] = bufEnc
  override def outputEncoder: Encoder[Seq[(Double, String)]] = outEnc
}

object CapRerankAggregator {
  def capRerank(cap: Int, k: Int)(implicit
      bufEnc: Encoder[Seq[(Long, String, Double)]],
      outEnc: Encoder[Seq[(Double, String)]]): CapRerank =
    new CapRerank(cap, k)
}
