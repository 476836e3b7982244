package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Gram (uncentered second-moment / covariance) matrix over an
  * embedding column — the statistics pass behind whitening, PCA and OPQ-style
  * rotations in an embedding curation pipeline.
  *
  * Scale shape: a typed Aggregator whose buffer is the dim x dim matrix
  * itself (64 x 64 longs = 32 KiB), so the corpus is consumed in ONE scan
  * with map-side partial aggregation: each partition folds its rows into a
  * single buffer and the shuffle moves one 32 KiB buffer per partition —
  * the cost is independent of corpus size, the only property that matters
  * at 100 TB. The naive alternative (posexplode x posexplode self-join)
  * shuffles N x dim rows twice.
  *
  * Determinism contract (cross-engine hash match): each per-row product is
  * floored to exact micro-units BEFORE summing — `floor(x_i * x_j * 1e6 +
  * 0.5)` in pure IEEE double arithmetic — so the aggregate is an exact
  * BIGINT sum, immune to float summation order, and the DuckDB oracle
  * replays it with the identical per-element formulation. Headroom: unit
  * vectors keep each per-row cell <= 1e6, so the BIGINT sum holds ~9e12
  * rows per cell before overflow.
  */
class GramMatrixAgg(dim: Int)(implicit
    bufEnc: Encoder[Array[Long]], outEnc: Encoder[Seq[Long]])
    extends Aggregator[Array[Float], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](dim * dim)

  override def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
    require(a.length == dim, s"embedding dim ${a.length} != $dim")
    var i = 0
    while (i < dim) {
      val xi = a(i).toDouble
      var j = i
      while (j < dim) {
        // NUMERIC CONTRACT with the oracle: floor(x_i * x_j * 1e6 + 0.5),
        // operands in ascending-position order — do not reorder.
        b(i * dim + j) += math.floor(xi * a(j).toDouble * 1.0e6 + 0.5).toLong
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < x.length) { x(k) += y(k); k += 1 }
    x
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = bufEnc
  override def outputEncoder: Encoder[Seq[Long]] = outEnc
}
