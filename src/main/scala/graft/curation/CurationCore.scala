package graft.curation

import org.apache.spark.sql.{DataFrame, GraftRddBridge}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** The corpus-curation primitives shared by the documents-table query
  * suite (`graft.queries.DedupQueries` / `TextQueries`) and the engine's
  * store-side curation verb (`VectorEngine.curateLibrary`): banded-minhash
  * candidate generation, iterative connected components, and the
  * Gopher-style repetition filter. Everything here is generic over an
  * (idCol, text) relation so band hashes / cluster membership / keep
  * predicates depend only on the TEXT — the property that lets the spec
  * assert the two surfaces agree row for row on the same corpus.
  */
object CurationCore {

  val MinhashK = 8   // minhash signatures
  val Bands = 4      // 2 sigs per band

  private def toks = tokens(col("text"))

  /** Banded-minhash rows over any (idCol, text) relation: K=8 sigs over
    * word-3-gram shingles, md5-combined into 4 band keys — one row per
    * (id, band).
    */
  def bandRowsOf(df: DataFrame, idCol: String): DataFrame = {
    // numeric minhash: ONE md5 per shingle + K universal-hash variants in
    // one fold. The tokenizer is bound to an attribute ("tk") in its own
    // projection first: shingles() references its input 4x per element,
    // and inlining the O(tokens) tokenizer there would make shingle
    // construction O(tokens^2) per row (measured: it dominated the query).
    // CollapseProject keeps the binding (non-cheap alias, multiple refs).
    val withSigs = df
      .select(col(idCol), toks.as("tk"))
      .select(col(idCol),
        minhashSigsNum(shingles(col("tk"), 3), MinhashK).as("sigs"))
    def sigStr(i: Int) = element_at(col("sigs"), i + 1).cast("string")
    val bands = (0 until Bands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat(sigStr(2 * b), lit(":"), sigStr(2 * b + 1))).as("band_hash"))
    }
    withSigs
      .select(col(idCol), explode(array(bands: _*)).as("b"))
      .select(col(idCol), col("b.band_id"), col("b.band_hash"))
  }

  /** Candidate pairs from a band table: ids sharing any band bucket,
    * emitted once as (id_a < id_b).
    */
  def candidatePairsOf(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id_a"))
    val b = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Min-label CONNECTED COMPONENTS over pair edges — shared by the text
    * (minhash) and embedding (cosine) near-dup families and the engine
    * curation verb. Each round fuses (a) neighbor-min propagation — join
    * neighbor labels, take the min — with (b) a POINTER-JUMP: every node
    * then adopts its label's own label from the same round's map
    * (path-halving through the label forest), so label depth roughly
    * halves per round and convergence is O(log diameter) rounds instead
    * of O(diameter) — the difference between ~35 rounds and ~7 on the
    * sf0.1 ANN-threshold graph, and the difference between converging and
    * throwing on a deep path component at corpus scale. Iterates over the
    * PAIRED nodes only; `nodes` rows absent from any pair rejoin as
    * cluster-of-self at the end. Returns (idCol, cluster_id).
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      idCol: String, maxRounds: Int = 50): DataFrame = {
    import GraftRddBridge.unpersistLocalCheckpoint
    // localCheckpoint materializes the DATA but copies the checkpointed
    // plan's ESTIMATED statistics onto the LogicalRDD — in an iterative
    // loop whose round plan multiplies the previous round's sizeInBytes
    // into itself (two joins referencing `labels`), the estimate's BIT
    // LENGTH compounds per round and the driver ends up in
    // BigInteger.multiply for tens of seconds (observed: round 19 of the
    // sf0.1 ANN graph took 52s with every executor idle). Rebuilding a
    // fresh default-stats leaf over the same InternalRow RDD resets the
    // estimation per round with no row conversion.
    def freshPlan(ckpt: DataFrame): DataFrame =
      GraftRddBridge.freshDefaultStatsFrame(ckpt)
    val Seq(aCol, bCol) = pairs.columns.toSeq
    val edgesCkpt = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    val edges = freshPlan(edgesCkpt)
    var labelsCkpt = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var labels = freshPlan(labelsCkpt)
    // the checkpoint whose blocks back `labels`; once a round's `next` is
    // materialized the previous round's blocks are dead and released —
    // only edges + the latest labels stay resident
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val tRound = System.nanoTime()
      val minN = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label").as("nl"))
        .groupBy(col("id")).agg(min(col("nl")).as("nl"))
      val stepped = labels.join(minN, Seq("id"), "left_outer")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("lab"))
      // pointer jump: adopt the (previous-round) label of the new label —
      // labels are node ids within the component, so label-of-label is
      // also in the component and only ever smaller
      val next = stepped
        .join(labels.select(col("id").as("lab"), col("label").as("ll")),
          Seq("lab"), "left_outer")
        .select(col("id"),
          least(col("lab"), coalesce(col("ll"), col("lab"))).as("label"),
          (least(col("lab"), coalesce(col("ll"), col("lab"))) < col("old")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] round $rounds changed=$changed round_s=${(System.nanoTime() - tRound) / 1e9}%.2f")
      unpersistLocalCheckpoint(labelsCkpt)
      labelsCkpt = next
      labels = freshPlan(next).select(col("id"), col("label"))
      rounds += 1
    }
    // an unconverged labeling is WRONG (some nodes still carry a non-minimal
    // label) — failing loudly beats silently emitting bad cluster ids; dup
    // graphs are near-cliques so diameter ~ a few, and a caller with a
    // genuinely deep path graph raises maxRounds explicitly
    if (changed > 0) {
      unpersistLocalCheckpoint(edgesCkpt); unpersistLocalCheckpoint(labelsCkpt)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          s"($changed labels still changing); component diameter exceeds " +
          "maxRounds — raise it for deep-path graphs")
    }
    unpersistLocalCheckpoint(edgesCkpt)
    // the final labels checkpoint backs the (lazy) result, so its lifetime
    // is the caller's — register it for end-of-suite release
    graft.Caches.track(labelsCkpt)
    nodes.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"))
  }

  /** Gopher-rules repetition stats over any (idCol, text) relation:
    * fraction of the doc taken by its most frequent token / 2-gram, and
    * the keep predicate (<= 0.2 / <= 0.18). Per-doc mode-finding as
    * (id, term) aggregation — never a per-doc sort or corpus window.
    * Unsorted; query entries add their presentation sort.
    */
  def repetitionStatsOf(df: DataFrame, idCol: String): DataFrame = {
    // the Det.rnd formulation (floor(x*1e6+0.5)/1e6) — pure IEEE double
    // arithmetic, bit-identical on any engine; `round()` is NOT (see
    // graft.queries.Det's doc)
    def rnd6(c: org.apache.spark.sql.Column) =
      floor(c * 1.0e6 + 0.5) / 1.0e6
    def modeStats(terms: DataFrame, nCol: String, maxCol: String): DataFrame =
      terms.groupBy(col(idCol), col("term"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col(idCol))
        .agg(sum(col("c")).cast("long").as(nCol),
          max(col("c")).cast("long").as(maxCol))
    val tokStats = modeStats(
      df.select(col(idCol), explode(toks).as("term")),
      "n_tokens", "max_tok")
    val bgStats = modeStats(
      df.select(col(idCol), toks.as("tk"))
        .select(col(idCol), explode(shingles(col("tk"), 2)).as("term")),
      "n_bigrams", "max_bg")
    df.select(col(idCol))
      .join(tokStats, Seq(idCol), "left_outer")
      .join(bgStats, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        rnd6(coalesce(col("max_tok").cast("double") / col("n_tokens"), lit(0.0)))
          .as("top_token_frac"),
        rnd6(coalesce(col("max_bg").cast("double") / col("n_bigrams"), lit(0.0)))
          .as("top_bigram_frac"))
      .withColumn("keep",
        col("top_token_frac") <= 0.2 && col("top_bigram_frac") <= 0.18)
  }
}
