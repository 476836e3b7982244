package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.Det.{rnd, rndSql}

/** kNN / similarity-search queries over the `embeddings` table (64-d float
  * vectors), mirroring the reference's flat-index search semantics
  * (`/root/reference/src/vector_db_api/indexing/flat.py:21-25`,
  * `services/search.py:18-75`) as declarative Spark plans.
  *
  * Scale design: every query is scan -> score (whole-stage codegen'd
  * expression) -> TakeOrderedAndProject(k) or per-group window top-k. The
  * corpus side is never collected; the query-vector side is a 1..few-row
  * DataFrame that is broadcast, so the only data movement at cluster scale
  * is k rows per partition to the driver (or per group after one shuffle).
  *
  * Determinism contract with the DuckDB oracle: scores are computed in
  * DOUBLE (bitwise-identical to DuckDB's sequential fold — verified), then
  * deterministically rounded (Det.rnd) to 6 decimals BEFORE ranking, and
  * every ordering carries a `vec_id` tie-breaker (SURVEY §2.5 Q7: Python's
  * stable sort is not reproducible; an explicit total order is).
  */
object VectorQueries {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label"))

  /** Single-query exact kNN: corpus scan vs the vec_id=0 vector. */
  private def knn(metric: String, k: Int)(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        rnd(similarity(metric)(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  private val cosSql =
    "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)"
  private val dotSql =
    "list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
  private val eucSql =
    "1.0 / (1.0 + list_distance(CAST(e.embedding AS DOUBLE[]), q.qv))"

  private def knnSql(scoreExpr: String, k: Int): String =
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, ${rndSql(scoreExpr, 6)} AS score
       |FROM embeddings e, q WHERE e.vec_id <> 0
       |ORDER BY score DESC, vec_id ASC LIMIT $k""".stripMargin

  /** Batch kNN: 5 query vectors x corpus, per-query top-5 via window.
    * At scale this is the broadcast-queries pattern: Q rows broadcast to
    * every partition, one shuffle on query_id for the window top-k.
    */
  private def knnBatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        rnd(cosineSim(col("embedding"), col("qvec")), 6).as("score"))
    // k-bounded partial aggregation (TopKByScore), not a per-query
    // window: the map side emits <= k rows per query before the shuffle
    // instead of sorting the full corpus x queries product
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(graft.functions.TopKAggregator.topK(5).toColumn)
      .flatMap { case (qid, hits) => hits.map(h => (qid, h._2, h._1)) }
      .toDF("query_id", "vec_id", "score")
      .orderBy(col("query_id").asc, col("score").desc, col("vec_id").asc)
  }

  /** Post-filter semantics (reference quirk Q5, `services/search.py:37-46`):
    * top-k FIRST, metadata filter AFTER — may return < k rows.
    */
  private def knnPostFilter(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        rnd(cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(20)
      .filter(col("label") % 2 === 0)
      .orderBy(col("score").desc, col("vec_id").asc)
  }

  /** Pre-filter variant (the engine's documented deviation option): filter
    * the candidate pool first, then top-k — always k rows if k matches exist.
    */
  private def knnPreFilter(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    e.filter(col("vec_id") =!= 0 && col("label") % 2 === 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        rnd(cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Per-vector norms + unit-length check (F2/F7 surface). */
  private def norms(s: SparkSession, d: String): DataFrame =
    emb(s, d).select(col("vec_id"),
        rnd(l2Norm(col("embedding")), 6).as("norm"))
      .withColumn("is_unit", (col("norm") - 1.0).between(-0.01, 0.01))
      .orderBy(col("vec_id").asc)

  /** Per-label centroid (mean vector) + its norm — the aggregation kernel
    * of IVF k-means (reference `ivf.py:167-178`) expressed as a
    * posexplode + per-position avg. Map-side partial aggregation keeps the
    * shuffle at |labels| x dim rows regardless of corpus size.
    */
  private def centroids(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val perPos = e.select(col("label"), posexplode(vecAsDouble(col("embedding"))))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("m"), count(lit(1)).as("n"))
    perPos.groupBy(col("label"))
      .agg(rnd(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"),
           max(col("n")).as("n_vectors"))
      .orderBy(col("label").asc)
  }

  /** Embedding near-duplicate pairs: same-label blocking, cosine >= 0.35.
    * The blocked self-join is the scale pattern: equi-join on the blocking
    * key co-locates candidates, so comparisons are per-partition and the
    * cross-product never materializes globally.
    */
  private def nearDupPairs(s: SparkSession, d: String): DataFrame = {
    val a = emb(s, d).select(col("label"),
      col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb(s, d).select(col("label"),
      col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, "label")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        rnd(cosineSim(col("ea"), col("eb")), 6).as("score"))
      .filter(col("score") >= 0.35)
      .orderBy(col("score").desc, col("vec_a").asc, col("vec_b").asc)
  }

  /** Embedding near-dup CLUSTER RESOLUTION: connected components over
    * the cosine pair graph (the same min-label machinery as the text
    * family, `DedupQueries.connectedComponents`) — pairs AND clusters
    * exist for both the lexical and the semantic dedup paths.
    */
  private def nearDupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = emb(s, d).select(col("label"),
        col("vec_id").as("vec_a"), col("embedding").as("ea"))
      .join(emb(s, d).select(col("label"),
        col("vec_id").as("vec_b"), col("embedding").as("eb")), "label")
      .filter(col("vec_a") < col("vec_b"))
      .filter(rnd(cosineSim(col("ea"), col("eb")), 6) >= 0.35)
      .select(col("vec_a"), col("vec_b"))
    DedupQueries.connectedComponents(
        emb(s, d).select(col("vec_id")), pairs, "vec_id")
      .withColumn("is_canonical", col("vec_id") === col("cluster_id"))
      .orderBy(col("vec_id").asc)
  }

  /** One-pass Gram / uncentered-covariance matrix of the corpus — the
    * statistics pass behind embedding whitening / PCA / OPQ rotations.
    * The whole corpus folds into a single 64x64 buffer via a typed
    * Aggregator (map-side partial agg: one 32 KiB buffer per partition
    * crosses the shuffle, independent of corpus size). Cells are exact
    * BIGINT micro-unit sums (per-row product floored BEFORE summing), so
    * the result is summation-order-immune and fully hash-checked; only
    * the upper triangle is emitted (the matrix is symmetric).
    */
  private[queries] val GramDim = 64

  /** Row-major pos-indexed matrix column `g` -> ordered (i, j, g_u) upper
    * triangle — shared by the batch and streaming gram entries so both
    * provably emit the same shape (and share one oracle).
    */
  private[queries] def gramTriangle(df: DataFrame): DataFrame =
    df.select(posexplode(col("g")).as(Seq("pos", "g_u")))
      .select(expr(s"CAST(pos div $GramDim AS INT)").as("i"),
        expr(s"CAST(pos % $GramDim AS INT)").as("j"),
        col("g_u"))
      .filter(col("i") <= col("j"))
      .orderBy(col("i").asc, col("j").asc)

  private def gramMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    gramTriangle(
      emb(s, d).select(col("embedding")).as[Array[Float]]
        .select(new graft.functions.GramMatrixAgg(GramDim).toColumn)
        .toDF("g"))
  }

  /** Capacity-balanced semantic sharding — route every vector to the
    * nearest per-label centroid shard, with a one-pass overflow spill to
    * the second-nearest shard once a shard hits capacity ceil(N/10) (the
    * balanced-assignment step of semantic sharding / curriculum
    * partitioning at corpus scale). Scale shape: the 10x64 centroid table
    * is metadata (broadcast); scoring is one corpus scan; both windows
    * run over N x 1 rows keyed by vec_id / shard_id — no corpus
    * cross-product anywhere. Centroid positions are deterministically
    * rounded to 6 decimals BEFORE the cosine, so the only cross-engine
    * float surface is the per-position mean (the hash-green v_centroids
    * precedent); scores are rnd6 with full (shard, vec) tie-breaks.
    * One-pass semantics: a spilled vector takes its second choice even if
    * that shard is itself full — the bounded-cascade contract, documented
    * rather than iterated.
    */
  private def semanticShard(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val perPos = e.select(col("label"), posexplode(vecAsDouble(col("embedding"))))
      .groupBy(col("label"), col("pos"))
      .agg(rnd(avg(col("col")), 6).as("m"))
    val cents = perPos.groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("shard_id"), expr("transform(pm, x -> x.m)").as("cvec"))
    val n = e.agg(count(lit(1)).as("n"))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("shard_id"),
        rnd(cosineSim(vecAsDouble(col("embedding")), col("cvec")), 6).as("score"))
    val wChoice = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("shard_id").asc)
    val ranked = scored.withColumn("choice", row_number().over(wChoice))
      .filter(col("choice") <= 2)
    val second = ranked.filter(col("choice") === 2)
      .select(col("vec_id"), col("shard_id").as("shard2"), col("score").as("score2"))
    val wLoad = Window.partitionBy(col("shard_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val placed = ranked.filter(col("choice") === 1)
      .withColumn("load_rank", row_number().over(wLoad))
      .crossJoin(broadcast(n))
      .withColumn("cap", expr("CAST((n + 9) div 10 AS INT)"))
    val kept = placed.filter(col("load_rank") <= col("cap"))
      .select(col("vec_id"), col("shard_id"), lit(1).as("placement"), col("score"))
    val spilled = placed.filter(col("load_rank") > col("cap"))
      .join(second, "vec_id")
      .select(col("vec_id"), col("shard2").as("shard_id"),
        lit(2).as("placement"), col("score2").as("score"))
    kept.unionByName(spilled).orderBy(col("vec_id").asc)
  }

  /** Dominant principal direction via EXACT INTEGER power iteration on the
    * mean Gram matrix — the public Spark MLlib `RowMatrix
    * .computePrincipalComponents` pattern: the distributed pass is the
    * one-scan Gram fold (GramMatrixAgg — one 32 KiB buffer per partition),
    * and the eigen-solve runs driver-side on the collected 64x64 matrix,
    * which is METADATA-scale state (4096 longs) at any corpus size.
    *
    * Everything is fixed-point integer so the result hash-checks across
    * engines: gbar = g_u div N (micro-units of E[x_i x_j] — bounded 1e6
    * by unit vectors, so the iteration never overflows at ANY corpus
    * size), v0 = 1e6 (max-norm e6), then 30 rounds of w = gbar.v,
    * v = (w * 1e6) div_trunc max|w| — the matvec fits BIGINT (64 terms of
    * <= 1e12) and only the transient rescale product needs 128 bits
    * (BigInt here, DuckDB's native HUGEINT SUM type there). Divisions
    * truncate toward zero on BOTH engines (the oracle spells the negative
    * branch explicitly — DuckDB's `//` is only pinned on positives).
    * 30 rounds: convergence is gap-limited ((l2/l1)^30), and each extra
    * round is metadata-scale on both sides.
    */
  private val PcaIters = 30
  private val PcaScale = 1000000L

  /** The symmetric mean Gram matrix in exact micro-units (gbar = g_u div
    * N, truncate toward zero) — the metadata-scale driver state all PCA
    * entries share.
    */
  private def meanGram(s: SparkSession, d: String): Array[Array[Long]] = {
    import s.implicits._
    val n = emb(s, d).count()
    require(n > 0, "empty embeddings table")
    val g = emb(s, d).select(col("embedding")).as[Array[Float]]
      .select(new graft.functions.GramMatrixAgg(GramDim).toColumn).head()
    val gb = Array.ofDim[Long](GramDim, GramDim)
    for (i <- 0 until GramDim; j <- i until GramDim) {
      val m = g(i * GramDim + j) / n // Long `/`: truncate toward zero
      gb(i)(j) = m; gb(j)(i) = m
    }
    gb
  }

  private def powerIterate(gb: Array[Array[Long]]): Array[Long] = {
    var v = Array.fill(GramDim)(PcaScale)
    for (_ <- 1 to PcaIters) {
      val w = Array.tabulate(GramDim) { i =>
        var acc = 0L; var j = 0
        while (j < GramDim) { acc += gb(i)(j) * v(j); j += 1 }; acc
      }
      val m = w.map(math.abs).max
      require(m > 0, "power iteration hit the zero vector")
      // BigInt division truncates toward zero — same as Long `/`
      v = w.map(wi => (BigInt(wi) * PcaScale / BigInt(m)).toLong)
    }
    v
  }

  private def powerVec(s: SparkSession, d: String): Array[Long] =
    powerIterate(meanGram(s, d))

  /** Top-2 principal directions via DEFLATION, all exact integer: after
    * the first component converges, lam_u = (v1' G v1) div (v1' v1)
    * (128-bit numerator — BigInt here, DuckDB HUGEINT there), the
    * rank-one projector term (lam_u * v1_i * v1_j) div (v1' v1) is
    * subtracted cell-wise — v1 is MAX-norm fixed point, so the projector
    * normalizer is its actual squared L2 norm, not Scale^2 — and the
    * same 30-round iteration runs on the deflated matrix. Deflation
    * leaves a <= 1-micro-unit-per-cell rank-one residual — far below
    * lambda2, so the second iteration converges to the second component.
    */
  private def powerVec2(s: SparkSession, d: String): (Array[Long], Array[Long]) =
    powerVec2Of(meanGram(s, d))

  private def powerVec2Of(gb: Array[Array[Long]]): (Array[Long], Array[Long]) = {
    val v1 = powerIterate(gb)
    var num = BigInt(0)
    var den = BigInt(0)
    for (i <- 0 until GramDim) {
      den += BigInt(v1(i)) * v1(i)
      for (j <- 0 until GramDim) num += BigInt(gb(i)(j)) * v1(i) * v1(j)
    }
    val lam = (num / den).toLong
    val gb2 = Array.tabulate(GramDim, GramDim) { (i, j) =>
      gb(i)(j) - ((BigInt(lam) * v1(i) * v1(j)) / den).toLong
    }
    (v1, powerIterate(gb2))
  }

  /** Scree readout: the integer Rayleigh eigenvalue (micro-units of
    * variance) of each of the top-2 principal directions against the
    * ORIGINAL mean Gram — the "variance explained" number an operator
    * reads off a PCA. Pure integer division; the 128-bit numerators ride
    * BigInt / HUGEINT exactly like the deflation constant.
    */
  private def pcaEigvals(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val gb = meanGram(s, d)
    val (v1, v2) = powerVec2Of(gb)
    def lam(v: Array[Long]): Long = {
      var num = BigInt(0); var den = BigInt(0)
      for (i <- 0 until GramDim) {
        den += BigInt(v(i)) * v(i)
        for (j <- 0 until GramDim) num += BigInt(gb(i)(j)) * v(i) * v(j)
      }
      (num / den).toLong
    }
    Seq((1, lam(v1)), (2, lam(v2))).toDF("comp", "lam_u")
      .orderBy(col("comp").asc)
  }

  private def pcaTop2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (v1, v2) = powerVec2(s, d)
    (v1.zipWithIndex.map { case (vu, i) => (1, i, vu) } ++
      v2.zipWithIndex.map { case (vu, i) => (2, i, vu) })
      .toSeq.toDF("comp", "i", "v_u")
      .orderBy(col("comp").asc, col("i").asc)
  }

  private def pcaPower(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    powerVec(s, d).zipWithIndex.map { case (vu, i) => (i, vu) }
      .toSeq.toDF("i", "v_u")
      .orderBy(col("i").asc)
  }

  /** Project the corpus onto the learned principal direction: the 64-long
    * direction vector is a broadcast literal, so the projection is ONE
    * narrow scan with a sequential-fold dot product — no join, no shuffle
    * beyond the presentation sort.
    */
  private def pcaProject(s: SparkSession, d: String): DataFrame = {
    val v = powerVec(s, d).map(_.toDouble).toSeq
    emb(s, d).select(col("vec_id"),
        rnd(dotProduct(vecAsDouble(col("embedding")), typedLit(v)) / lit(PcaScale.toDouble), 6)
          .as("proj"))
      .orderBy(col("vec_id").asc)
  }

  /** k-distance OUTLIER scoring — the corrupt/off-manifold embedding
    * detector of a curation pipeline: each vector's mean similarity to
    * its 5 nearest neighbors, low mean = isolated point. Scores are
    * floored to exact micro-units BEFORE ranking and the mean is the
    * integer top-5 sum DIV 5, so the whole output is summation-order-
    * immune. Scale shape: the scored self-join feeds the k-bounded
    * TopKByScore PARTIAL aggregator (<= 5 rows per vector cross the
    * shuffle, never the N x N product); at 100 TB the same downstream
    * (top-k state -> integer mean) rides annJoin candidates instead of
    * the exact cross product.
    */
  private def knnOutlier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = emb(s, d).select(col("vec_id"), col("embedding"))
    val b = emb(s, d).select(col("vec_id").as("other_id"),
      col("embedding").as("eb"))
    val scored = a.join(b, col("vec_id") =!= col("other_id"))
      .select(col("vec_id"), col("other_id"),
        floor(cosineSim(col("embedding"), col("eb")) * lit(1.0e6) + lit(0.5))
          .cast("long").as("s6"))
    scored.as[(Long, Long, Long)]
      .map { case (v, o, s) => (v, o, s.toDouble) }
      .groupByKey(_._1)
      .agg(graft.functions.TopKAggregator.topK(5).toColumn)
      .flatMap { case (vid, hits) =>
        val top = hits.map(_._1.toLong)
        Some((vid, top.sum / top.length, top.length))
      }
      .toDF("vec_id", "mean_s6", "n_nbrs")
      .orderBy(col("vec_id").asc)
  }

  /** Per-DIMENSION feature statistics — the drift/health readout a
    * feature store keeps on an embedding column (a shifted mean or
    * collapsed range on one dimension = a broken producer): count, mean,
    * min, max per position, all in exact micro-units (per-element floor
    * BEFORE aggregation; the mean is an integer division with the
    * negative branch spelled). One scan, map-side partial agg, output =
    * dim rows whatever the corpus size.
    */
  private def dimStats(s: SparkSession, d: String): DataFrame = {
    val el = emb(s, d)
      .select(posexplode(vecAsDouble(col("embedding"))))
      .select(col("pos"),
        floor(col("col") * lit(1.0e6) + lit(0.5)).cast("long").as("s6"))
    el.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("s6")).as("sum_u"),
        min(col("s6")).as("min_u"), max(col("s6")).as("max_u"))
      .select(col("pos"), col("n"),
        when(col("sum_u") >= 0, expr("sum_u div n"))
          .otherwise(-expr("(-sum_u) div n")).as("mean_u"),
        col("min_u"), col("max_u"))
      .orderBy(col("pos").asc)
  }

  /** Embedding DRIFT monitor — the train/serve-skew readout: per-label
    * centroids computed on two corpus halves (even / odd vec_ids
    * standing in for "reference window" vs "live window") and compared
    * by cosine. A label whose halves' centroids diverge is a class whose
    * embedding distribution moved. Same scale shape as v_centroids (the
    * per-position partial agg shuffles |labels| x dim rows whatever the
    * corpus size); positions rnd6 before the sequential-fold cosine (the
    * v_semantic_shard discipline).
    */
  private def centroidShift(s: SparkSession, d: String): DataFrame = {
    def cent(par: Int) =
      emb(s, d).filter(col("vec_id") % 2 === par)
        .select(col("label"), posexplode(vecAsDouble(col("embedding"))))
        .groupBy(col("label"), col("pos"))
        .agg(rnd(avg(col("col")), 6).as("m"), count(lit(1)).as("cn"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"),
          max(col("cn")).as(s"n_$par"))
        .select(col("label"), expr("transform(pm, x -> x.m)").as(s"c$par"),
          col(s"n_$par"))
    cent(0).join(cent(1), "label")
      .select(col("label"), col("n_0"), col("n_1"),
        rnd(cosineSim(col("c0"), col("c1")), 6).as("shift_cos"))
      .orderBy(col("label").asc)
  }

  /** MATRYOSHKA (truncated-dimension) PROGRESSIVE RETRIEVAL — the serving
    * pattern MRL-trained embeddings exist for: stage 1 scores the corpus
    * on only the FIRST 16 of 64 dimensions (4x less arithmetic and, at
    * scale, 4x less scan IO when the prefix is stored as its own
    * column/file group) and keeps a 100-candidate pool; stage 2 reranks
    * just the pool with full-dimension cosine for the final top-10. Both
    * stages are TakeOrderedAndProject with the rnd6 + vec_id tie-break
    * contract; the oracle replays prefix slicing and both rankings, so a
    * wrong slice bound or a pool that silently lost a candidate goes
    * hash-red. (With md5-deterministic embeddings the prefix is not
    * MRL-trained, so stage-1 order differs from full-dim order — which
    * is exactly why the rerank stage exists and is exercised.)
    */
  private def matryoshka(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.similarity
    val e = emb(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qfull"),
        expr("slice(embedding, 1, 16)").as("qpre"))
    val pool = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"), col("qfull"),
        rnd(similarity("cosine")(expr("slice(embedding, 1, 16)"),
          col("qpre")), 6).as("coarse"))
      .orderBy(col("coarse").desc, col("vec_id").asc).limit(100)
    val top = pool
      .select(col("vec_id"), col("coarse"),
        rnd(similarity("cosine")(col("embedding"), col("qfull")), 6)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(WindowUtil.onePartition(col("vec_id")))
      .orderBy(col("score").desc, col("vec_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("vec_id"), col("coarse"), col("score"))
      .orderBy(col("rank").asc)
  }

  /** K-CENTER CORESET SELECTION — Gonzalez farthest-point greedy, the
    * 2-approximation for the k-center objective and the classic
    * diversity-maximizing subset selector for training-data curation
    * (pick K exemplars so no point is far from its nearest exemplar; the
    * geometric complement of the coverage-maximizing d_greedy_cover).
    * Deterministic throughout: per-dim micro-unit quantization
    * (floor(x*1e6 + 0.5), the v_dim_stats convention) makes every
    * distance an exact BIGINT so the whole K-round trajectory replays in
    * SQL; seed = min vec_id; argmax ties break to the smaller vec_id.
    * radius2 of round r is the selected point's squared distance to the
    * r-1 previously chosen centers — the greedy max-min sequence, which
    * the spec asserts is non-increasing (the property the 2-approx proof
    * rests on).
    *
    * 100 TB shape: the min-distance frame is NODES-scale and updated
    * INCREMENTALLY — each round joins it against ONLY the newest center
    * (broadcast 1-row), computes least(md, dist-to-new), and takes one
    * TakeOrdered(1); no round ever re-scans the full center set, so the
    * per-round cost is one corpus scan + K driver-side rows total (the
    * d_greedy_cover / v_mmr_rerank k-bounded driver-state pattern).
    * localCheckpoint per round keeps lineage depth constant.
    */
  private def kcD2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** The shared Gonzalez greedy: returns the K selected (rank, vec_id,
    * radius2) rows and the quantized corpus frame — consumed by both the
    * coreset entry and the silhouette audit so the two provably score
    * the same centers.
    */
  private def kcenterRun(s: SparkSession, d: String)
      : (Vector[(Int, Long, Long)], DataFrame) = {
    val K = 8
    val q = emb(s, d).select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")).as("qe"))
      .localCheckpoint()
    val seedId = q.agg(min(col("vec_id"))).head().getLong(0)
    def centerEmb(id: Long) =
      broadcast(q.filter(col("vec_id") === lit(id)).select(col("qe").as("ce")))
    var sel = Vector((1, seedId, 0L))
    var md = q.crossJoin(centerEmb(seedId))
      .select(col("vec_id"), col("qe"), kcD2(col("qe"), col("ce")).as("md"))
      .localCheckpoint()
    for (r <- 2 to K) {
      val top = md.orderBy(col("md").desc, col("vec_id").asc)
        .select(col("vec_id"), col("md")).limit(1).head()
      val cid = top.getLong(0)
      sel = sel :+ ((r, cid, top.getLong(1)))
      if (r < K)
        md = md.crossJoin(centerEmb(cid))
          .select(col("vec_id"), col("qe"),
            least(col("md"), kcD2(col("qe"), col("ce"))).as("md"))
          .localCheckpoint()
    }
    (sel, q)
  }

  private def kcenterCoreset(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (sel, _) = kcenterRun(s, d)
    sel.toDF("rank", "vec_id", "radius2")
      .select(col("rank").cast("int").as("rank"), col("vec_id"),
        col("radius2"))
      .orderBy(col("rank").asc)
  }

  /** SQUARED-DISTANCE SILHOUETTE of the k-center clustering — the
    * cluster-quality audit over the Gonzalez centers (`measure, don't
    * guess` for the clustering family, as the recall/qerror entries are
    * for ANN): every point is assigned to its nearest center (exact
    * BIGINT micro-unit squared distances, ties to the smaller center
    * id), a = own-center distance², b = runner-up distance², and the
    * simplified per-point silhouette s = (b−a)/max(a,b) is emitted in
    * exact e6 units (squared-distance variant — no sqrt, so every value
    * hash-replays; s∈[0,1e6] since b≥a by assignment). Output: per
    * cluster n, truncating-mean and min silhouette — the weak-cluster
    * (low mean / low min) rebuild signal.
    *
    * 100 TB shape: ONE corpus scan against the broadcast K-row center
    * set (the flat-KNN shape with K=8 constant), per-point state a
    * bounded 8-struct sorted array, then one vec_id-keyed agg to
    * clusters; nothing driver-side beyond the K center rows the greedy
    * already collects.
    */
  private def silhouette(s: SparkSession, d: String): DataFrame = {
    val (sel, q) = kcenterRun(s, d)
    val cids = sel.map(_._2)
    val cent = broadcast(q.filter(col("vec_id").isin(cids: _*))
      .select(col("vec_id").as("cid"), col("qe").as("ce")))
    val ab = q.crossJoin(cent)
      .select(col("vec_id"),
        struct(kcD2(col("qe"), col("ce")).as("d2"), col("cid")).as("p"))
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(col("p"))).as("arr"))
      .select(
        element_at(col("arr"), 1).getField("cid").as("cluster_id"),
        element_at(col("arr"), 1).getField("d2").as("a2"),
        element_at(col("arr"), 2).getField("d2").as("b2"))
    ab.select(col("cluster_id"),
        expr("CASE WHEN greatest(a2, b2) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000000 * (b2 - a2)) div greatest(a2, b2) END").as("s_e6"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"), sum(col("s_e6")).as("ss"),
        min(col("s_e6")).as("min_sil_e6"))
      .select(col("cluster_id"), col("n"),
        expr("ss div n").as("mean_sil_e6"), col("min_sil_e6"))
      .orderBy(col("cluster_id").asc)
  }

  /** Oracle: the identical greedy unrolled as K rounds of MATERIALIZED
    * CTEs (cr = argmax of the min-distance frame, mr = incremental
    * least() against only cr — the same linear recurrence the engine
    * runs), distances replayed with list_zip on the same micro-unit
    * integer lists.
    */
  /** The WITH-clause prefix (q, c1..cK, m1..m{K-1}) shared by the coreset
    * and silhouette oracles — both replay the same greedy trajectory.
    */
  private def kcenterCtesSql(K: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH q AS MATERIALIZED (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |           x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qe
        |  FROM embeddings),
        |c1 AS MATERIALIZED (SELECT vec_id, CAST(0 AS BIGINT) AS md FROM q ORDER BY vec_id ASC LIMIT 1),
        |m1 AS MATERIALIZED (
        |  SELECT a.vec_id,
        |         CAST(list_sum(list_transform(list_zip(a.qe, c.qe),
        |              p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS md
        |  FROM q a, (SELECT q.qe FROM q JOIN c1 USING (vec_id)) c)""".stripMargin)
    for (r <- 2 to K) {
      sb.append(
        s""",\nc$r AS MATERIALIZED (SELECT vec_id, md FROM m${r - 1} ORDER BY md DESC, vec_id ASC LIMIT 1)""")
      if (r < K) sb.append(
        s""",\nm$r AS MATERIALIZED (
           |  SELECT a.vec_id,
           |         LEAST(a.md, CAST(list_sum(list_transform(list_zip(q.qe, c.qe),
           |              p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)) AS md
           |  FROM m${r - 1} a JOIN q ON q.vec_id = a.vec_id
           |  CROSS JOIN (SELECT q.qe FROM q JOIN c$r USING (vec_id)) c)""".stripMargin)
    }
    sb.toString
  }

  private def kcenterOracleSql: String = {
    val K = 8
    kcenterCtesSql(K) + "\n" +
      (1 to K).map { r =>
        s"SELECT CAST($r AS INTEGER) AS rank, vec_id, md AS radius2 FROM c$r"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY rank ASC")
  }

  /** Silhouette oracle: the same greedy CTE chain, then the K-center
    * assignment replayed as a row_number window over the 8 per-point
    * distances (a different argmin enumeration than the engine's sorted
    * 8-struct array that must agree point-for-point), and the identical
    * truncating e6 silhouette arithmetic.
    */
  private def silhouetteOracleSql: String = {
    val K = 8
    kcenterCtesSql(K) +
      s""",
         |cent AS MATERIALIZED (
         |  SELECT q.vec_id AS cid, q.qe AS ce FROM q
         |  JOIN (${(1 to K).map(r => s"SELECT vec_id FROM c$r").mkString(" UNION ALL ")}) cs
         |    ON cs.vec_id = q.vec_id),
         |pr AS (
         |  SELECT a.vec_id, c.cid,
         |         CAST(list_sum(list_transform(list_zip(a.qe, c.ce),
         |              p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
         |  FROM q a CROSS JOIN cent c),
         |rk AS (
         |  SELECT vec_id, cid, d2,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY d2 ASC, cid ASC) AS rn
         |  FROM pr),
         |ab AS (
         |  SELECT a.vec_id, a.cid AS cluster_id, a.d2 AS a2, b.d2 AS b2
         |  FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
         |sil AS (
         |  SELECT cluster_id,
         |         CASE WHEN GREATEST(a2, b2) = 0 THEN CAST(0 AS BIGINT)
         |              ELSE CAST((1000000 * (b2 - a2)) // GREATEST(a2, b2) AS BIGINT) END AS s_e6
         |  FROM ab)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n,
         |       CAST(SUM(s_e6) // count(*) AS BIGINT) AS mean_sil_e6,
         |       MIN(s_e6) AS min_sil_e6
         |FROM sil GROUP BY cluster_id ORDER BY cluster_id ASC""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_matryoshka"     -> (matryoshka _),
    "v_knn_cosine"     -> knn("cosine", 10) _,
    "v_knn_dot"        -> knn("dot_product", 10) _,
    "v_knn_euclidean"  -> knn("euclidean", 10) _,
    "v_knn_batch"      -> (knnBatch _),
    "v_knn_postfilter" -> (knnPostFilter _),
    "v_knn_prefilter"  -> (knnPreFilter _),
    "v_norms"          -> (norms _),
    "v_centroids"      -> (centroids _),
    "v_neardup_pairs"  -> (nearDupPairs _),
    "v_neardup_clusters" -> (nearDupClusters _),
    "v_gram_matrix"    -> (gramMatrix _),
    "v_semantic_shard" -> (semanticShard _),
    "v_pca_power"      -> (pcaPower _),
    "v_pca_project"    -> (pcaProject _),
    "v_knn_outlier"    -> (knnOutlier _),
    "v_pca_top2"       -> (pcaTop2 _),
    "v_pca_eigvals"    -> (pcaEigvals _),
    "v_dim_stats"      -> (dimStats _),
    "v_centroid_shift" -> (centroidShift _),
    "v_kcenter_coreset" -> (kcenterCoreset _),
    "v_silhouette"     -> (silhouette _),
  )

  /** PcaIters unrolled (matvec, max-norm, rescale) rounds over matrix CTE
    * `mat(i, j, gb)`, starting from `${pfx}0(i, v)` (declared by the
    * caller) and ending at `$pfx$PcaIters`. Single-reference MATERIALIZED
    * rounds — see pcaChainSql.
    */
  private def pcaRoundsSql(mat: String, pfx: String): String =
    (1 to PcaIters).map { t =>
      s"""w$pfx$t AS MATERIALIZED (
         |  SELECT i, w, max(abs(w)) OVER () AS m
         |  FROM (SELECT m.i AS i, SUM(m.gb * v.v) AS w
         |        FROM $mat m JOIN $pfx${t - 1} v ON m.j = v.i GROUP BY m.i)),
         |$pfx$t AS (SELECT i, CAST(CASE WHEN w >= 0 THEN (w * $PcaScale) // m
         |                 ELSE -(((0 - w) * $PcaScale) // m) END AS BIGINT) AS v
         |        FROM w$pfx$t)""".stripMargin
    }.mkString(",\n")

  /** Shared CTE chain replaying the integer power iteration in SQL:
    * the Gram fold, symmetrization, mean division, and PcaIters unrolled
    * (matvec, max-norm, rescale) rounds — all exact integer arithmetic
    * with truncate-toward-zero division spelled out for negatives.
    */
  private def pcaChainSql: String = {
    // MATERIALIZED + single-reference rounds: DuckDB inlines plain CTEs
    // at every reference, so a round whose rescale read the matvec twice
    // would double the inline tree per level (2^30 by round 30). The
    // max-norm comes from a whole-frame window instead of a second CTE,
    // and the shared tables are pinned with AS MATERIALIZED.
    val base =
      s"""el AS MATERIALIZED (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS p,
         |         unnest(CAST(embedding AS DOUBLE[])) AS x
         |  FROM embeddings),
         |g0 AS MATERIALIZED (
         |  SELECT CAST(a.p AS INTEGER) AS i, CAST(b.p AS INTEGER) AS j,
         |         CAST(SUM(CAST(floor(a.x * b.x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g_u
         |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.p <= b.p
         |  GROUP BY 1, 2),
         |gsym AS (SELECT i, j, g_u FROM g0
         |         UNION ALL SELECT j, i, g_u FROM g0 WHERE i < j),
         |nn AS (SELECT count(*) AS n FROM embeddings),
         |gb AS MATERIALIZED (SELECT i, j,
         |         CASE WHEN g_u >= 0 THEN g_u // n ELSE -((-g_u) // n) END AS gb
         |       FROM gsym, nn),
         |v0 AS (SELECT DISTINCT i, CAST($PcaScale AS BIGINT) AS v FROM gb)""".stripMargin
    s"$base,\n${pcaRoundsSql("gb", "v")}"
  }

  private val normSql =
    "sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))"
  private val pairSql =
    "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"

  val oracles: Map[String, String] = Map(
    "v_matryoshka" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |s1 AS (
         |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev,
         |         ${rndSql("list_cosine_similarity(CAST(e.embedding AS DOUBLE[])[1:16], q.qv[1:16])", 6)} AS coarse
         |  FROM embeddings e, q WHERE e.vec_id <> 0
         |  ORDER BY coarse DESC, vec_id ASC LIMIT 100),
         |s2 AS (SELECT vec_id, coarse,
         |         ${rndSql("list_cosine_similarity(ev, qv)", 6)} AS score
         |       FROM s1, q)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank,
         |       vec_id, coarse, score
         |FROM s2 ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v_knn_cosine"    -> knnSql(cosSql, 10),
    "v_knn_dot"       -> knnSql(dotSql, 10),
    "v_knn_euclidean" -> knnSql(eucSql, 10),
    "v_knn_batch" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5)
        |SELECT q.query_id, e.vec_id, ${rndSql(cosSql, 6)} AS score
        |FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY score DESC, e.vec_id ASC) <= 5
        |ORDER BY query_id ASC, score DESC, vec_id ASC""".stripMargin,
    "v_knn_postfilter" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |topk AS (
        |  SELECT e.vec_id, e.label, ${rndSql(cosSql, 6)} AS score
        |  FROM embeddings e, q WHERE e.vec_id <> 0
        |  ORDER BY score DESC, vec_id ASC LIMIT 20)
        |SELECT vec_id, label, score FROM topk WHERE label % 2 = 0
        |ORDER BY score DESC, vec_id ASC""".stripMargin,
    "v_knn_prefilter" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label, ${rndSql(cosSql, 6)} AS score
        |FROM embeddings e, q WHERE e.vec_id <> 0 AND e.label % 2 = 0
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v_norms" ->
      s"""SELECT vec_id, ${rndSql(normSql, 6)} AS norm,
        |       abs(${rndSql(normSql, 6)} - 1.0) <= 0.01 AS is_unit
        |FROM embeddings ORDER BY vec_id ASC""".stripMargin,
    "v_centroids" ->
      s"""WITH expl AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |         unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |perpos AS (
        |  SELECT label, pos, avg(x) AS m, count(*) AS n
        |  FROM expl GROUP BY label, pos)
        |SELECT label, ${rndSql("sqrt(sum(m*m))", 6)} AS centroid_norm, max(n) AS n_vectors
        |FROM perpos GROUP BY label ORDER BY label ASC""".stripMargin,
    "v_neardup_pairs" ->
      s"""SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       ${rndSql(pairSql, 6)} AS score
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${rndSql(pairSql, 6)} >= 0.35
        |ORDER BY score DESC, vec_a ASC, vec_b ASC""".stripMargin,
    // v_neardup_clusters: connected components over the same pair graph,
    // replayed as a recursive reachability CTE (the d_dup_clusters
    // pattern on the embedding side)
    "v_neardup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${rndSql(pairSql, 6)} >= 0.35),
         |edges AS (
         |  SELECT va AS src, vb AS dst FROM pairs
         |  UNION ALL SELECT vb, va FROM pairs),
         |reach(v, l) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v),
         |lab AS (SELECT v AS vec_id, min(l) AS cluster_id FROM reach GROUP BY v)
         |SELECT vec_id, cluster_id, vec_id = cluster_id AS is_canonical
         |FROM lab ORDER BY vec_id ASC""".stripMargin,
    // v_gram_matrix: the identical per-element floor(x_i*x_j*1e6 + 0.5)
    // contract — exact BIGINT sums, upper triangle only
    "v_gram_matrix" ->
      s"""WITH el AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS p,
         |         unnest(CAST(embedding AS DOUBLE[])) AS x
         |  FROM embeddings)
         |SELECT CAST(a.p AS INTEGER) AS i, CAST(b.p AS INTEGER) AS j,
         |       CAST(SUM(CAST(floor(a.x * b.x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g_u
         |FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.p <= b.p
         |GROUP BY 1, 2 ORDER BY i ASC, j ASC""".stripMargin,
    // v_semantic_shard: rnd6 centroid positions -> sequential-fold cosine
    // -> the same two row_number windows and ceil(N/10) capacity rule
    "v_semantic_shard" ->
      s"""WITH expl AS (
         |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         |         unnest(CAST(embedding AS DOUBLE[])) AS x
         |  FROM embeddings),
         |perpos AS (
         |  SELECT label, pos, ${rndSql("avg(x)", 6)} AS m
         |  FROM expl GROUP BY label, pos),
         |cents AS (
         |  SELECT label AS shard_id, list(m ORDER BY pos) AS cvec
         |  FROM perpos GROUP BY label),
         |n AS (SELECT count(*) AS n FROM embeddings),
         |scored AS (
         |  SELECT e.vec_id, c.shard_id,
         |         ${rndSql("list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec)", 6)} AS score
         |  FROM embeddings e, cents c),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY score DESC, shard_id ASC) AS choice FROM scored),
         |fst AS (
         |  SELECT *, row_number() OVER (PARTITION BY shard_id
         |    ORDER BY score DESC, vec_id ASC) AS load_rank
         |  FROM ranked WHERE choice = 1),
         |snd AS (SELECT vec_id, shard_id AS shard2, score AS score2
         |        FROM ranked WHERE choice = 2)
         |SELECT f.vec_id, f.shard_id, 1 AS placement, f.score
         |FROM fst f, n WHERE f.load_rank <= (n + 9) // 10
         |UNION ALL
         |SELECT f.vec_id, s.shard2 AS shard_id, 2 AS placement, s.score2 AS score
         |FROM fst f JOIN snd s USING (vec_id), n WHERE f.load_rank > (n + 9) // 10
         |ORDER BY vec_id ASC""".stripMargin,
    // v_dim_stats: identical per-element micro floor, exact aggregates,
    // truncating mean spelled for negatives
    "v_dim_stats" ->
      s"""WITH el AS (
         |  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
         |         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000.0 + 0.5) AS BIGINT) AS s6
         |  FROM embeddings)
         |SELECT CAST(pos AS INTEGER) AS pos, count(*) AS n,
         |       CAST(CASE WHEN SUM(s6) >= 0 THEN SUM(s6) // count(*)
         |            ELSE -((0 - SUM(s6)) // count(*)) END AS BIGINT) AS mean_u,
         |       CAST(min(s6) AS BIGINT) AS min_u, CAST(max(s6) AS BIGINT) AS max_u
         |FROM el GROUP BY pos ORDER BY pos ASC""".stripMargin,
    // v_centroid_shift: rnd6 per-position half-centroids -> sequential
    // list_cosine_similarity, the v_centroids/avg precedent on each half
    "v_centroid_shift" ->
      s"""WITH expl AS (
         |  SELECT label, vec_id % 2 AS par,
         |         generate_subscripts(embedding, 1) - 1 AS pos,
         |         unnest(CAST(embedding AS DOUBLE[])) AS x
         |  FROM embeddings),
         |perpos AS (
         |  SELECT label, par, pos, ${rndSql("avg(x)", 6)} AS m, count(*) AS cn
         |  FROM expl GROUP BY label, par, pos),
         |cents AS (
         |  SELECT label, par, list(m ORDER BY pos) AS cvec, max(cn) AS n
         |  FROM perpos GROUP BY label, par)
         |SELECT a.label, a.n AS n_0, b.n AS n_1,
         |       ${rndSql("list_cosine_similarity(a.cvec, b.cvec)", 6)} AS shift_cos
         |FROM cents a JOIN cents b ON a.label = b.label
         |WHERE a.par = 0 AND b.par = 1
         |ORDER BY a.label ASC""".stripMargin,
    // v_knn_outlier: micro-unit scores BEFORE ranking, integer top-5
    // mean with truncate-toward-zero division spelled for negatives
    "v_knn_outlier" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |sc AS (
         |  SELECT a.vec_id, b.vec_id AS other_id,
         |         CAST(floor(list_cosine_similarity(a.emb, b.emb) * 1000000.0 + 0.5) AS BIGINT) AS s6
         |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
         |top AS (
         |  SELECT vec_id, s6,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY s6 DESC, other_id ASC) AS r
         |  FROM sc),
         |agg AS (SELECT vec_id, SUM(s6) AS ssum, COUNT(*) AS cnt
         |        FROM top WHERE r <= 5 GROUP BY vec_id)
         |SELECT vec_id,
         |       CAST(CASE WHEN ssum >= 0 THEN ssum // cnt
         |            ELSE -((-ssum) // cnt) END AS BIGINT) AS mean_s6,
         |       CAST(cnt AS INTEGER) AS n_nbrs
         |FROM agg ORDER BY vec_id ASC""".stripMargin,
    // v_pca_power / v_pca_project: the full integer power iteration
    // replayed as unrolled CTE rounds (the d_pagerank discipline)
    "v_pca_power" ->
      s"""WITH $pcaChainSql
         |SELECT i, v AS v_u FROM v$PcaIters ORDER BY i ASC""".stripMargin,
    "v_pca_project" ->
      s"""WITH $pcaChainSql,
         |vl AS (SELECT list(CAST(v AS DOUBLE) ORDER BY i) AS vv FROM v$PcaIters)
         |SELECT e.vec_id,
         |       ${rndSql(s"list_dot_product(CAST(e.embedding AS DOUBLE[]), vl.vv) / $PcaScale.0", 6)} AS proj
         |FROM embeddings e, vl ORDER BY vec_id ASC""".stripMargin,
    // v_pca_top2 / v_pca_eigvals: deflate by the integer rank-one term,
    // iterate again — the 128-bit numerators ride DuckDB's native
    // HUGEINT SUM type
    "v_pca_top2" ->
      s"""WITH $pcaDeflatedChainSql
         |SELECT 1 AS comp, i, v AS v_u FROM va
         |UNION ALL
         |SELECT 2 AS comp, i, v AS v_u FROM vb$PcaIters
         |ORDER BY comp ASC, i ASC""".stripMargin,
    "v_pca_eigvals" ->
      s"""WITH $pcaDeflatedChainSql,
         |vbm AS MATERIALIZED (SELECT i, v FROM vb$PcaIters),
         |lam2 AS (
         |  SELECT CAST(CASE WHEN num >= 0 THEN num // den
         |         ELSE -((0 - num) // den) END AS BIGINT) AS lam
         |  FROM (SELECT SUM(CAST(g.gb AS HUGEINT) * a.v * b.v) AS num
         |        FROM gb g JOIN vbm a ON g.i = a.i JOIN vbm b ON g.j = b.i),
         |       (SELECT SUM(v * v) AS den FROM vbm))
         |SELECT 1 AS comp, lam AS lam_u FROM lam
         |UNION ALL
         |SELECT 2 AS comp, lam AS lam_u FROM lam2
         |ORDER BY comp ASC""".stripMargin,
    "v_kcenter_coreset" -> kcenterOracleSql,
    "v_silhouette" -> silhouetteOracleSql,
  )

  /** The top-2 chain: base gram CTEs + comp-1 rounds + lam/deflation +
    * comp-2 rounds (va = converged comp 1, vb$PcaIters = comp 2).
    */
  private def pcaDeflatedChainSql: String =
      s"""$pcaChainSql,
         |va AS MATERIALIZED (SELECT i, v FROM v$PcaIters),
         |lam AS MATERIALIZED (
         |  SELECT CAST(CASE WHEN num >= 0 THEN num // den
         |         ELSE -((0 - num) // den) END AS BIGINT) AS lam,
         |         den
         |  FROM (SELECT SUM(CAST(g.gb AS HUGEINT) * a.v * b.v) AS num
         |        FROM gb g JOIN va a ON g.i = a.i JOIN va b ON g.j = b.i),
         |       (SELECT SUM(v * v) AS den FROM va)),
         |gb2 AS MATERIALIZED (
         |  SELECT i, j, gb - CAST(CASE WHEN t >= 0 THEN t // den
         |         ELSE -((0 - t) // den) END AS BIGINT) AS gb
         |  FROM (SELECT g.i, g.j, g.gb AS gb, lam.lam * a.v * b.v AS t, lam.den AS den
         |        FROM gb g JOIN va a ON g.i = a.i JOIN va b ON g.j = b.i, lam)),
         |vb0 AS (SELECT DISTINCT i, CAST($PcaScale AS BIGINT) AS v FROM gb2),
         |${pcaRoundsSql("gb2", "vb")}""".stripMargin
}
