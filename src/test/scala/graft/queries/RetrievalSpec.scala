package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential + property specs for the retrieval suite: BM25 and DSIR
  * against independent driver-side brute force, hybrid RRF against the
  * fusion identity over its own emitted ranks. (Exact values are also
  * DuckDB-hash-checked through the Verify gate.)
  */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "table", "join", "window")

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def docTokens(): Map[Long, Seq[String]] = {
    import org.apache.spark.sql.functions.col
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').toSeq.filter(_.nonEmpty))
      .toMap
  }

  /** Driver-side BM25 with the exact expression association the query
    * uses: integer nano-nat idf, per-(doc, term) floored contribution.
    */
  private def bruteBm25(): Seq[(Long, Long, Int, Double)] = {
    val toks = docTokens()
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }
    val nd = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nd.toDouble
    val tf: Map[(Long, String), Long] = toks.toSeq
      .flatMap { case (id, ts) => ts.filter(terms.contains).map(t => (id, t)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val df: Map[String, Long] =
      tf.keys.toSeq.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val idf9: Map[String, Long] = df.map { case (t, d) =>
      t -> math.floor(math.log(
        (nd.toDouble - d.toDouble + 0.5) / (d.toDouble + 0.5) + 1.0) * 1.0e9).toLong
    }
    tf.toSeq.groupBy(_._1._1).toSeq.map { case (id, entries) =>
      val s9 = entries.map { case ((_, t), f) =>
        val tfd = f.toDouble
        val part = (tfd * 2.2) /
          (tfd + 1.2 * (0.25 + 0.75 * dl(id).toDouble / avgdl))
        math.floor(idf9(t).toDouble * part).toLong
      }.sum
      (id, dl(id), entries.size, rnd6(s9.toDouble / 1.0e9))
    }.sortBy { case (id, _, _, sc) => (-sc, id) }.take(20)
  }

  test("t_bm25 matches a driver-side brute-force BM25 top-20") {
    val got = RetrievalQueries.queries("t_bm25")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got == bruteBm25())
  }

  test("v_hybrid_rrf satisfies the fusion identity over its emitted ranks") {
    val rows = RetrievalQueries.queries("v_hybrid_rrf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.length == 10)
    rows.foreach { case (_, rl, rv, rrf) =>
      // absent ranks are -1 and contribute 0; present ranks are 1-based top-20
      assert(rl == -1 || (rl >= 1 && rl <= 20))
      assert(rv == -1 || (rv >= 1 && rv <= 20))
      assert(rl != -1 || rv != -1)
      val expected = rnd6(
        (if (rl == -1) 0.0 else 1.0 / (rl + 60).toDouble) +
          (if (rv == -1) 0.0 else 1.0 / (rv + 60).toDouble))
      assert(rrf == expected)
    }
    // result is sorted by (rrf desc, doc_id asc) and each rank appears once
    assert(rows.sortBy { case (id, _, _, f) => (-f, id) }.toSeq == rows.toSeq)
    val lexRanks = rows.map(_._2).filter(_ != -1)
    val vecRanks = rows.map(_._3).filter(_ != -1)
    assert(lexRanks.distinct.length == lexRanks.length)
    assert(vecRanks.distinct.length == vecRanks.length)
  }

  test("v_mmr_rerank greedy invariants hold against independent recomputation") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosU(a: Array[Float], b: Array[Float]): Long = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val sa = math.sqrt(na); val sb = math.sqrt(nb)
      val c = if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
      math.floor(c * 1.0e6 + 0.5).toLong
    }
    val qv = embs(0L)
    val pool = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosU(v, qv)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    val poolIds = pool.map(_._1).toSet
    val rows = RetrievalQueries.queries("v_mmr_rerank")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (1 to 10))
    assert(rows.map(_._2).distinct.length == 10)
    rows.foreach { case (_, id, _, _, _) => assert(poolIds.contains(id)) }
    // first pick is pure relevance (max rel_u, vec_id tie-break)
    assert(rows.head._2 == pool.head._1)
    // each pick's bookkeeping re-derived from raw vectors: rel, the max
    // similarity to PRIOR picks, and the objective
    rows.zipWithIndex.foreach { case ((_, id, rel, ms, obj), i) =>
      val relU = pool.find(_._1 == id).get._2
      val msU =
        if (i == 0) 0L
        else rows.take(i).map(p => cosU(embs(id), embs(p._2))).max
      assert(rel == relU.toDouble / 1.0e6)
      assert(ms == msU.toDouble / 1.0e6)
      assert(obj == relU - msU)
    }
    // from rank 2 on, the greedy objective never increases: a fixed
    // candidate's max-sim only grows as the picked set grows, and each
    // pick was the argmax over a superset of the next round's pool.
    // Rank 1 is excluded — it is picked by PURE relevance (ms = 0), and
    // with negative cosines rank 2's rel - ms can legitimately exceed it
    // (observed on this near-orthogonal corpus).
    rows.drop(1).map(_._5).sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("d_dsir prefers the target source's own documents") {
    import org.apache.spark.sql.functions.col
    val srcOf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = RetrievalQueries.queries("d_dsir")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val (target, rest) = rows.partition { case (id, _, _, _) => srcOf(id) == "src0" }
    assert(target.nonEmpty)
    val meanT = target.map(_._3).sum / target.length
    val meanR = rest.map(_._3).sum / rest.length
    // the target LM was trained ON the target docs — importance weighting
    // must score them above the corpus rest on average
    assert(meanT > meanR)
    // keep flag is exactly the sign of the (pre-rounding) score sum:
    // verify against a driver-side brute force of the two LMs
    val toks = docTokens()
    val cc = toks.values.flatten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val tToks = toks.filter { case (id, _) => srcOf(id) == "src0" }
    val ct = tToks.values.flatten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val nc = cc.values.sum; val v = cc.size.toLong; val nt = ct.values.sum
    def ln9(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) * 1.0e9).toLong
    rows.foreach { case (id, n, lr, keep) =>
      val ts = toks(id)
      assert(n == ts.size)
      val s9 = ts.map(t =>
        ln9(ct.getOrElse(t, 0L) + 1, nt + v) - ln9(cc(t) + 1, nc + v)).sum
      assert(keep == (s9 > 0))
      assert(lr == rnd6(s9.toDouble / (1.0e9 * n.toDouble)))
    }
  }

  test("Lloyd-trained recall is at least the md5-det sibling per PQ family") {
    // VERDICT r6 #6: BASELINE.md records "trained >= det recall"; this
    // asserts the headline claim as a spec, at identical parameters per
    // family (the only difference is the codebook/centroid training).
    import graft.engine.IndexConfig
    def recall(cfg: IndexConfig): Double =
      EngineQueries.recallOf(spark, sfDir, cfg)
        .collect().head.getAs[Double]("recall_at_10")
    val families = Seq(
      ("pq", IndexConfig("pq_trained", pqSubspaces = 8, pqCodewords = 16),
        IndexConfig("pq", pqSubspaces = 8, pqCodewords = 16)),
      ("ivfpq",
        IndexConfig("ivfpq_trained", ivfNumCentroids = 8, ivfNprobe = 2,
          pqSubspaces = 8, pqCodewords = 16),
        IndexConfig("ivfpq", ivfNumCentroids = 8, ivfNprobe = 2,
          pqSubspaces = 8, pqCodewords = 16)))
    families.foreach { case (fam, trained, det) =>
      val (rt, rd) = (recall(trained), recall(det))
      assert(rt >= rd,
        s"$fam: trained recall $rt fell below the det sibling's $rd")
    }
    graft.Caches.releaseAll()
  }
}
