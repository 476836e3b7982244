package graft.index

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Schemas
import graft.functions.VectorFunctions._

/** IVF (inverted-file) index: hand-rolled Lloyd's k-means on L2-normalized
  * vectors with dot-product (= cosine) assignment — the Spark re-expression
  * of the reference's `indexing/ivf.py:133-189`.
  *
  * Algorithm parity:
  *   - 20 iterations (reference constant `IVF_KMEAN_ITERS`, `ivf.py:10`)
  *   - assignment = argmax dot against all centroids (`ivf.py:160-165`)
  *   - recompute = elementwise mean then renormalize (`ivf.py:167-178`)
  *   - empty cluster reseeded from a point (`ivf.py:169-171`)
  *   - zero vectors excluded (normalize -> null, quirk Q4)
  *
  * Determinism deviation (documented): the reference seeds Python's
  * Mersenne `random.shuffle` for init — unreproducible outside CPython.
  * This engine derives the init deterministically from content: take the k
  * lowest `md5(chunk_id)` vectors. Same algorithm, reproducible on any
  * cluster.
  *
  * Scale shape: each iteration is one map-only assignment pass over the
  * corpus (centroids broadcast as literals, k x d floats) plus one
  * |k x d|-row aggregation — no shuffle of the corpus itself. The input is
  * cached across the 20 iterations.
  */
object IvfIndex {

  val KmeansIters = 20

  /** Normalized non-zero vectors: (chunk_id, vnorm: array<double>). */
  private def normalized(chunksDf: DataFrame): DataFrame =
    chunksDf.filter(col("embedding").isNotNull)
      .select(col("id").as("chunk_id"), l2Normalize(col("embedding")).as("vnorm"))
      .filter(col("vnorm").isNotNull)

  /** Run k-means, return (centroids, postings) DataFrames. */
  def build(chunksDf: DataFrame, libraryId: String, numCentroids: Int)
      : (DataFrame, DataFrame) = {
    val spark = chunksDf.sparkSession
    val data = normalized(chunksDf).cache()
    try {
      val n = data.count()
      if (n == 0) return (emptyCentroids(spark), emptyPostings(spark))
      val k = math.min(numCentroids.toLong, n).toInt

      // deterministic init: k lowest md5(chunk_id)
      var centroids: Array[Array[Double]] = data
        .withColumn("h", md5(col("chunk_id")))
        .orderBy(col("h").asc)
        .limit(k)
        .collect()
        .map(r => r.getSeq[Double](1).toArray)

      // reseed pool for empty clusters, deterministic order
      lazy val reseedPool: Array[Array[Double]] = data
        .withColumn("h", md5(concat(lit("reseed:"), col("chunk_id"))))
        .orderBy(col("h").asc)
        .limit(k)
        .collect()
        .map(r => r.getSeq[Double](1).toArray)

      var iter = 0
      while (iter < KmeansIters) {
        val assigned = assign(data, centroids)
        // recompute: per-cluster elementwise sum via the mutable-buffer
        // Aggregator (one d-length partial per cluster x partition — no
        // posexplode, no per-element shuffle), mean+renormalize
        // driver-side (k x d values cross the driver, never the corpus)
        val sums = assigned
          .groupBy(col("cid"))
          .agg(graft.functions.VecSumAggregator.vecSum(col("vnorm")).as("s"),
            count(lit(1)).as("cnt"))
          .collect()
        val next = Array.fill(k)(null: Array[Double])
        val counts = Array.fill(k)(0L)
        sums.foreach { r =>
          val cid = r.getInt(0)
          next(cid) = r.getSeq[Double](1).toArray
          counts(cid) = r.getLong(2)
        }
        var reseedIdx = 0
        for (c <- 0 until k) {
          if (next(c) == null || counts(c) == 0L) {
            next(c) = reseedPool(reseedIdx % reseedPool.length)
            reseedIdx += 1
          } else {
            val mean = next(c).map(_ / counts(c))
            val norm = math.sqrt(mean.foldLeft(0.0)((a, x) => a + x * x))
            next(c) = if (norm == 0.0) reseedPool(reseedIdx % reseedPool.length)
                      else mean.map(_ / norm)
          }
        }
        centroids = next
        iter += 1
      }

      val centroidRows = centroids.zipWithIndex.map { case (v, i) =>
        Row(libraryId, i, v.map(_.toFloat).toSeq)
      }
      val centroidsDf = chunksDf.sparkSession.createDataFrame(
        spark.sparkContext.parallelize(centroidRows.toSeq, 1), Schemas.ivfCentroids)

      val postings = assign(data, centroids)
        .select(lit(libraryId).as("library_id"),
          col("cid").as("centroid_id"), col("chunk_id"),
          transform(col("vnorm"), _.cast("float")).as("embedding_norm"))
      (centroidsDf, postings)
    } finally data.unpersist()
  }

  /** Map-only nearest-centroid assignment: argmax dot, first-max wins on
    * ties (reference `utils.py:39-44` strict `>` keeps the earliest).
    */
  private def assign(data: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(dotProduct(col("vnorm"), typedLit(c.toSeq)).as("dot"),
        lit(i).as("cid"))
    }
    // argmax with earliest-index tie-break: sort by (dot desc, cid asc)
    data.withColumn("best",
        element_at(array_sort(array(scored: _*),
          (a, b) => when(a.getField("dot") > b.getField("dot"), -1)
            .when(a.getField("dot") < b.getField("dot"), 1)
            .otherwise(a.getField("cid") - b.getField("cid"))), 1))
      .select(col("chunk_id"), col("vnorm"), col("best.cid").as("cid"))
  }

  /** Assign new vectors to EXISTING centroids (incremental add between
    * rebuilds, reference `ivf.py:40-49` — no re-clustering).
    */
  def assignToCentroids(chunksDf: DataFrame, centroidsDf: DataFrame,
      libraryId: String): DataFrame = {
    val cents = centroidsDf.orderBy(col("centroid_id"))
      .collect()
      .map(r => r.getSeq[Float](2).map(_.toDouble).toArray)
    if (cents.isEmpty) return emptyPostings(chunksDf.sparkSession)
    assign(normalized(chunksDf), cents)
      .select(lit(libraryId).as("library_id"),
        col("cid").as("centroid_id"), col("chunk_id"),
        transform(col("vnorm"), _.cast("float")).as("embedding_norm"))
  }

  private def emptyCentroids(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.ivfCentroids)
  private def emptyPostings(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.ivfPostings)
}
