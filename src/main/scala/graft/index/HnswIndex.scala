package graft.index

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Schemas

/** HNSW — the layered navigable-small-world graph (Malkov & Yashunin,
  * "Efficient and robust approximate nearest neighbor search using
  * Hierarchical Navigable Small World graphs", IEEE TPAMI 2018), built
  * ON TOP of the flat NSW family: layer 0 IS the shared `nsw_edges` base
  * graph, and this object adds the log-scale upper-layer hierarchy the
  * search descends before spending its beam. The reference engine has no
  * graph family at all (`indexing/` is flat/LSH/IVF); this extends the
  * same lifecycle contract (`chunk.py:69-73` incremental adds, rebuild
  * `main.py:61-76`) one step past `nsw_det`.
  *
  * Determinism (the whole point of the `_det` families — every step is
  * arithmetic an independent SQL engine replays):
  *   - node LEVEL is a pure function of the chunk id — the count of
  *     leading '0' characters of md5("h|" + id), capped at [[MaxLevel]].
  *     Each hex character is '0' with probability 1/16, so levels follow
  *     the classic geometric layer rule (HNSW's p = 1/M with M = 16)
  *     with STRING arithmetic instead of RNG draws: no floats, no ln(),
  *     nothing that could differ between JVM and the oracle by one ulp.
  *     Levels are never stored — any reader recomputes them.
  *   - each upper layer l >= 1 is the SAME cell-blocked top-degree edge
  *     build as the base graph ([[NswIndex.buildEdges]]), restricted to
  *     the nodes with level >= l. Layer sizes shrink 16x per level, so
  *     the whole hierarchy costs ~1/15 extra edges over the base graph.
  *   - search = greedy single-node descent from the global max-level
  *     node through the upper layers (bounded rounds per layer), then
  *     the standard fixed-round beam walk on layer 0 seeded from the
  *     descent result's neighborhood — so the beam starts NEAR the
  *     query instead of at a coarse-cell guess.
  *
  * Scale shape: identical to the base family — upper-layer tables are
  * (layer, src, dst) strings read via (layer, src) literal pushdowns;
  * builds shuffle candidate pairs keyed by cell with the k-bounded
  * partial top-degree aggregation; nothing is ever all-pairs.
  */
object HnswIndex {

  /** Level cap: 6 levels at p=1/16 covers corpora to ~16^6 = 1.6e7 nodes
    * per expected-singleton top layer; deeper hierarchies buy nothing
    * below that and the cap bounds the descent's unrolled oracle.
    */
  val MaxLevel = 6

  /** The deterministic geometric level of a chunk id: leading-'0' count
    * of md5("h|" + id), capped. P(level >= l) = 16^-l.
    */
  def levelExpr(id: Column): Column =
    least(lit(MaxLevel),
      length(regexp_extract(md5(concat(lit("h|"), id)), "^0*", 0)))

  /** Driver-side twin of [[levelExpr]] (string arithmetic, bit-exact). */
  def levelOf(id: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(("h|" + id).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    math.min(MaxLevel, hex.takeWhile(_ == '0').length)
  }

  /** Build every upper layer's edge table for the whole corpus: for each
    * layer l in 1..[[MaxLevel]], [[NswIndex.buildEdges]] over the nodes
    * with level >= l (u-side candidates AND v-side targets both
    * restricted — an upper layer only links its own members). Layers
    * whose member count cannot produce an edge (< 2) are skipped — a
    * pure no-op perf cut, since a lone member has no candidate pairs.
    */
  def buildLayers(chunksDf: DataFrame, centroidsDf: DataFrame,
      postingsDf: DataFrame, libraryId: String, nprobe: Int,
      degree: Int): DataFrame = {
    val spark = chunksDf.sparkSession
    // one tiny per-level census (<= MaxLevel+1 rows) decides which layers
    // can hold an edge at all; cumulative counts are monotone in l, so
    // the eligible set {l : counts(l) >= 2} is a prefix 1..lstar
    val counts = cumulativeLevelCounts(
      postingsDf.select(levelExpr(col("chunk_id")).as("lvl")))
    val lstar = (1 to MaxLevel).takeWhile(l => counts(l) >= 2)
      .lastOption.getOrElse(0)
    val cents = NswIndex.collectCentroids(centroidsDf)
    if (lstar == 0 || cents.isEmpty) emptyLayers(spark)
    else
      // ONE join + ONE top-degree aggregation for the whole hierarchy
      // (optimization r15, NswIndex.edgesFromLayered): per-layer results
      // bit-identical to the old per-layer buildEdges pipelines
      NswIndex.edgesFromLayered(
        layeredProbe(chunksDf.select(col("id"), col("embedding")),
          cents, nprobe, lstar),
        layeredTargets(postingsDf, lstar),
        libraryId, degree)
  }

  /** u-side rows for every (node, layer 1..min(level, lstar), probe cell)
    * — [[NswIndex.probeSide]] with the layer replication folded in.
    */
  private def layeredProbe(chunksDf: DataFrame,
      cents: Array[Array[Double]], nprobe: Int, lstar: Int): DataFrame =
    NswIndex.probeSide(NswIndex.normalized(chunksDf), cents, nprobe)
      .withColumn("maxl", least(lit(lstar), levelExpr(col("src_id"))))
      .filter(col("maxl") >= 1)
      .select(col("src_id"), col("svec"), col("cell"),
        explode(sequence(lit(1), col("maxl"))).as("layer"))

  /** v-side rows for every (posting, layer 1..min(level, lstar)). */
  private def layeredTargets(postingsDf: DataFrame, lstar: Int): DataFrame =
    postingsDf.select(col("chunk_id").as("dst_id"),
        col("embedding_norm").as("dvec"), col("centroid_id").as("cell"))
      .withColumn("maxl", least(lit(lstar), levelExpr(col("dst_id"))))
      .filter(col("maxl") >= 1)
      .select(col("dst_id"), col("dvec"), col("cell"),
        explode(sequence(lit(1), col("maxl"))).as("layer"))

  /** Incremental upper-layer edges for a NEW batch against the FROZEN
    * hierarchy: per layer l, the new batch's level>=l members link
    * against the PRE-BATCH layer members only (plus reverse links) —
    * [[NswIndex.edgesForNew]]'s add-after-build contract applied layer
    * by layer.
    */
  def layersForNew(newChunks: DataFrame, centroidsDf: DataFrame,
      basePostings: DataFrame, libraryId: String, nprobe: Int,
      degree: Int): DataFrame = {
    val spark = newChunks.sparkSession
    // {l : newCounts(l) >= 1} is a prefix 1..lstar (cumulative counts)
    val newCounts = cumulativeLevelCounts(
      newChunks.select(levelExpr(col("id")).as("lvl")))
    val lstar = (1 to MaxLevel).takeWhile(l => newCounts(l) >= 1)
      .lastOption.getOrElse(0)
    val cents = NswIndex.collectCentroids(centroidsDf)
    if (lstar == 0 || cents.isEmpty) emptyLayers(spark)
    else
      // same single-pass shape as buildLayers: new members probe the
      // PRE-BATCH layer members only (the add-after-build contract),
      // layer by layer, in one join + one bounded aggregation
      NswIndex.edgesFromLayered(
        layeredProbe(newChunks.select(col("id"), col("embedding")),
          cents, nprobe, lstar),
        layeredTargets(basePostings, lstar),
        libraryId, degree)
  }

  /** nodes-with-level-at-least-l counts, index 0..MaxLevel (one small agg
    * over a single derived column; <= MaxLevel+1 rows to the driver).
    */
  private def cumulativeLevelCounts(lvls: DataFrame): Array[Long] = {
    val byLevel = lvls.groupBy(col("lvl")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    Array.tabulate(MaxLevel + 1)(l =>
      (l to MaxLevel).map(i => byLevel.getOrElse(i, 0L)).sum)
  }

  private def emptyLayers(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      Schemas.hnswEdges)
}
