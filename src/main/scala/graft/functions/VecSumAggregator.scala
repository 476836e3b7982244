package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector sum aggregator (SURVEY §4 custom item 3): the
  * k-means centroid-recompute kernel. Shuffles ONE d-length partial per
  * (group x partition) instead of posexplode's d rows per INPUT row — at
  * corpus scale that is the difference between shuffling |corpus| x d
  * values and |clusters| x partitions x d.
  *
  * Mutable-buffer Aggregator: reduce adds into the buffer array in place,
  * no per-row allocation.
  */
object VecSumAggregator
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] =
    if (v == null) buf
    else if (buf.isEmpty) v.toArray
    else {
      var i = 0
      while (i < buf.length && i < v.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(r: Array[Double]): Seq[Double] =
    if (r.isEmpty) null else r.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Column form: vec_sum(array<double>) -> array<double>. */
  lazy val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(VecSumAggregator)

  def vecSum(c: Column): Column = asUdaf(c)
}
