package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Differential + property specs for the round-6 pipeline operators:
  * perplexity and tf-idf against independent driver-side brute force,
  * resize against the identity property, semantic dedup against the
  * clustering invariants. (The exact values are also DuckDB-hash-checked
  * through the Verify gate; these specs pin the semantics without SQL.)
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def docTokens(): Map[Long, Seq[String]] = {
    import org.apache.spark.sql.functions.col
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').toSeq.filter(_.nonEmpty))
      .toMap
  }

  test("t_perplexity matches a driver-side brute-force unigram LM") {
    val toks = docTokens()
    val counts = toks.values.flatten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val n = counts.values.sum
    val v = counts.size.toLong
    // zero-token docs have no joined rows and drop out of the query (on
    // both engines) — the brute force mirrors that instead of computing
    // a 0/0 mean for them
    val expected: Map[Long, (Int, Double)] = toks.filter(_._2.nonEmpty)
      .map { case (id, ts) =>
        val s9 = ts.map(t => math.floor(
          math.log((counts(t) + 1).toDouble / (n + v).toDouble) * 1.0e9).toLong).sum
        id -> (ts.size, rnd6(-s9.toDouble / (1.0e9 * ts.size)))
      }
    val got = TextQueries.queries("t_perplexity")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("t_tfidf matches a driver-side brute-force ranking") {
    val toks = docTokens()
    val nd = toks.size.toLong
    val tf: Map[(Long, String), Long] = toks.toSeq
      .flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val df: Map[String, Long] = tf.keys.toSeq.map(_._2)
      .groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val expected: Seq[(Long, Int, String, Int, Int, Double)] =
      tf.toSeq.map { case ((id, t), f) =>
        val idf9 = math.floor(math.log(nd.toDouble / df(t).toDouble) * 1.0e9).toLong
        (id, t, f, f * idf9)
      }.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
        rows.sortBy { case (_, t, _, s9) => (-s9, t) }.take(3).zipWithIndex.map {
          case ((_, t, f, s9), i) =>
            (id, i + 1, t, f.toInt, df(t).toInt, rnd6(s9.toDouble / 1.0e9))
        }
      }.sortBy(r => (r._1, r._2))
    val got = TextQueries.queries("t_tfidf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  test("resizePixels at the source dimensions is the identity on channel sums") {
    import spark.implicits._
    // i = 0 -> 8x6; i = 10 -> 8x7 (w = 8 + i%5, h = 6 + i%3)
    for (i <- Seq(0, 10)) {
      val media = spark.createDataset(Seq(
        Multimodal.MediaRow(i.toLong, "image/png", Multimodal.syntheticPng(i))))
      val w = 8 + i % 5
      val h = 6 + i % 3
      val full = Multimodal.decodePixels(media).collect().head
      val same = Multimodal.resizePixels(media, w, h).collect().head
      assert((same.sum_r, same.sum_g, same.sum_b) == (full.sum_r, full.sum_g, full.sum_b))
      assert((same.src_w, same.src_h) == (w, h))
      // 1x1 resize samples exactly pixel (0, 0): r=(i)%256, g=(2i)%256, b=(3i)%256
      val one = Multimodal.resizePixels(media, 1, 1).collect().head
      assert((one.sum_r, one.sum_g, one.sum_b) ==
        ((i % 256).toLong, (2 * i % 256).toLong, (3 * i % 256).toLong))
    }
  }

  test("AdcDtab kernel matches the driver dtabFlat bit for bit (incl. K=256)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    for ((m, k, subDim) <- Seq((8, 16, 8), (8, 256, 8), (4, 256, 16))) {
      val cb = Array.fill(m, k, subDim)(rnd.nextFloat() * 2 - 1)
      val rows = Seq.fill(5)(Array.fill(m * subDim)(rnd.nextFloat() * 2 - 1))
      val got = rows.map(_.toSeq).toDF("qres")
        .select(graft.functions.PqExpressions.adcDtab(col("qres"), cb).as("dtab"))
        .collect().map(_.getSeq[Long](0))
      val expected = rows.map(r => graft.index.PqIndex.dtabFlat(r, cb).toSeq)
      assert(got.toSeq == expected)
    }
  }

  test("d_incremental plans the batch side as the broadcast build") {
    val plan = DedupQueries.queries("d_incremental")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the corpus band table must be probed, never shuffled: both band
    // joins build on the broadcast batch side
    assert(plan.contains("BroadcastHashJoin"),
      "incremental dedup must probe the band index via broadcast joins")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus bands must not be shuffled for the batch probe")
    graft.Caches.releaseAll()
  }

  test("d_mixture_weights is a valid temperature-2 mixing policy") {
    val rows = DedupQueries.queries("d_mixture_weights")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    // both the raw shares and the tempered weights are distributions
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // temperature flattens but never reorders: w_mix is monotone in p_raw,
    // and the boost is >= 1 exactly for below-uniform-share sources
    val byP = rows.sortBy(_._3)
    assert(byP.map(_._4).toSeq == byP.map(_._4).sorted.toSeq,
      "tempered weights must preserve the raw-share order")
    // boost ~ 1/sqrt(p): anti-monotone in the raw share, and the
    // crossing point sits at p* = (sum_j sqrt(p_j))^-2 — the dominant
    // source is damped iff p_max > p*, which always holds when shares
    // differ (below-uniform boosting at 0.9x uniform is sound
    // unconditionally by Cauchy-Schwarz; a fixed above-uniform damping
    // threshold is NOT, so the damping check uses the true crossing)
    assert(byP.map(_._5).toSeq == byP.map(_._5).sorted.reverse.toSeq,
      "boost must be anti-monotone in the raw share")
    val uniform = 1.0 / rows.length
    val pStar = math.pow(rows.map(r => math.sqrt(r._3)).sum, -2)
    rows.foreach { case (src, _, p, _, boost) =>
      if (p < uniform * 0.9) assert(boost > 1.0, s"$src: rare source not boosted")
      if (p > pStar * 1.01) assert(boost < 1.0, s"$src: source past the crossing not damped")
    }
  }

  test("d_mixture_sample replays the policy with driver-side md5 membership") {
    import org.apache.spark.sql.functions.col
    def md5mod(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 1000000L
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(' ').count(_.nonEmpty).toLong))
    val bySrc = docs.groupBy(_._2)
      .map { case (s0, rs) => s0 -> (rs.length.toLong, rs.map(_._3).sum) }
    val tot = bySrc.values.map(_._2).sum
    val r9 = bySrc.map { case (s0, (_, nt)) =>
      s0 -> math.floor(math.sqrt(nt.toDouble / tot.toDouble) * 1.0e9).toLong }
    val z9 = r9.values.sum
    val expected = bySrc.toSeq.sortBy(_._1).map { case (s0, (nd, nt)) =>
      val f = math.min(1.0,
        r9(s0).toDouble / z9.toDouble * (tot >> 1).toDouble / nt.toDouble)
      val ppm = math.floor(f * 1.0e6).toLong
      val kept = docs.filter(x => x._2 == s0 && md5mod(x._1) < ppm)
      (s0, nd, ppm, kept.length.toLong, kept.map(_._3).sum)
    }
    val got = DedupQueries.queries("d_mixture_sample")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the tempered sample is a real downsample that still covers every source
    assert(got.forall { case (_, nd, _, nk, _) => nk > 0 && nk <= nd })
  }

  test("e_stream_mixture equals the batch mixture policy row for row") {
    val batch = DedupQueries.queries("d_mixture_weights")(spark, sfDir)
      .collect().toSeq
    val stream = SourceQueries.queries("e_stream_mixture")(spark, sfDir)
      .collect().toSeq
    assert(stream == batch)
  }

  test("e_stream_dedup_incremental equals the batch d_incremental report") {
    val batch = DedupQueries.queries("d_incremental")(spark, sfDir)
      .collect().toSeq
    val stream = DedupQueries.queries("e_stream_dedup_incremental")(spark, sfDir)
      .collect().toSeq
    assert(stream == batch,
      "ingest-time streaming dedup diverged from the batch replay")
  }

  test("d_source_overlap matches a driver-side brute-force gram matrix") {
    import org.apache.spark.sql.functions.col
    val bySrc: Map[String, Set[String]] = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1).split(' ').toSeq.filter(_.nonEmpty))
      .groupBy(_._1)
      .map { case (src, docs) =>
        src -> docs.toSeq.flatMap(_._2.sliding(5).filter(_.size == 5)
          .map(_.mkString(" "))).toSet
      }
    val expected = (for {
      (sa, ga) <- bySrc.toSeq; (sb, gb) <- bySrc.toSeq if sa < sb
      shared = (ga & gb).size if shared > 0
    } yield (sa, sb, ga.size.toLong, gb.size.toLong, shared.toLong,
        rnd6(shared.toDouble / (ga.size + gb.size - shared))))
      .sortBy(r => (r._1, r._2))
    val got = DedupQueries.queries("d_source_overlap")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  test("d_source_overlap never shuffles the expanded pair stream") {
    val plan = DedupQueries.queries("d_source_overlap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the pair matrix must come from the map-side set expansion, not a
    // gram self-join (which fans out quadratically on shared grams)
    assert(!plan.contains("SortMergeJoin"),
      "gram pair expansion must not be a corpus-scale join")
    assert(plan.contains("BroadcastHashJoin"),
      "the per-source size table must broadcast onto the pair matrix")
  }

  test("d_semantic_dedup labels are a valid min-label clustering") {
    val rows = EngineQueries.queries("d_semantic_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val labels = rows.map(r => r._1 -> r._2).toMap
    // every corpus vector is labeled exactly once
    assert(rows.length == rows.map(_._1).distinct.length)
    // min-label: the cluster id is a member of its own cluster and is the
    // minimum id in it; is_canonical marks exactly that member
    rows.foreach { case (id, cl, canon) =>
      assert(cl <= id)
      assert(labels(cl) == cl, s"cluster id $cl is not its own root")
      assert(canon == (id == cl))
    }
    graft.Caches.releaseAll()
  }

  test("t_chunk_split windows reconstruct every document exactly") {
    val toks = docTokens()
    val rows = TextQueries.queries("t_chunk_split")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    // every non-empty doc chunks; counts and per-chunk slices match the
    // 32-token window / 24-token stride contract
    toks.filter(_._2.nonEmpty).foreach { case (id, ts) =>
      val chunks = byDoc(id).sortBy(_._2)
      assert(chunks.length == (ts.length - 1) / 24 + 1)
      chunks.foreach { case (_, ci, start, n, text) =>
        assert(start == ci.toLong * 24)
        val expected = ts.slice(ci * 24, math.min(ci * 24 + 32, ts.length))
        assert(n == expected.length)
        assert(text == expected.mkString(" "))
      }
      // consecutive full chunks overlap by exactly 8 tokens
      chunks.sliding(2).foreach {
        case Array((_, _, s1, n1, _), (_, _, s2, _, _)) =>
          if (n1 == 32) assert(s1 + 32 - s2 == 8)
        case _ => ()
      }
    }
    assert(rows.map(_._1).toSet == toks.filter(_._2.nonEmpty).keySet)
  }

  test("v_gram_matrix matches a driver-side brute-force fold") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, sfDir).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    val dim = 64
    val exp = Array.ofDim[Long](dim, dim)
    for (a <- embs; i <- 0 until dim; j <- i until dim)
      exp(i)(j) += math.floor(a(i).toDouble * a(j).toDouble * 1e6 + 0.5).toLong
    val got = VectorQueries.queries("v_gram_matrix")(spark, sfDir)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got.size == dim * (dim + 1) / 2)
    for (i <- 0 until dim; j <- i until dim) assert(got((i, j)) == exp(i)(j))
    // diagonal cells are sums of squares: strictly positive
    for (i <- 0 until dim) assert(got((i, i)) > 0L)
  }

  test("v_semantic_shard places every vector once and respects first-choice capacity") {
    import org.apache.spark.sql.functions.col
    val n = Tables.embeddings(spark, sfDir).count().toInt
    val rows = VectorQueries.queries("v_semantic_shard")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == n)
    val cap = (n + 9) / 10
    // capacity binds on FIRST-choice placements (spills may overfill
    // their second shard by the documented one-pass contract)
    rows.filter(_._3 == 1).groupBy(_._2).values
      .foreach(g => assert(g.size <= cap))
    assert(rows.count(_._3 == 2) < n / 2)
  }

  test("v_pca_power converges to the dominant eigendirection of the mean Gram") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, sfDir).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val dim = 64
    val n = embs.length.toDouble
    val g = Array.ofDim[Double](dim, dim)
    for (a <- embs; i <- 0 until dim; j <- 0 until dim) g(i)(j) += a(i) * a(j) / n
    // double-precision reference: 200 power-iteration rounds, L2-normalized
    var ref = Array.fill(dim)(1.0)
    for (_ <- 1 to 200) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * ref(j)).sum)
      val nw = math.sqrt(w.map(x => x * x).sum)
      ref = w.map(_ / nw)
    }
    def rayleigh(v: Array[Double]): Double = {
      val gv = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      (0 until dim).map(i => v(i) * gv(i)).sum / v.map(x => x * x).sum
    }
    val got = VectorQueries.queries("v_pca_power")(spark, sfDir).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1).toDouble)
    // the captured VARIANCE converges quadratically even when the vector
    // itself is eigengap-limited: the integer direction must capture
    // >= 99% of the dominant eigenvalue the converged reference reaches
    val lam = rayleigh(got)
    val lamRef = rayleigh(ref)
    assert(lam >= 0.99 * lamRef, s"rayleigh $lam vs converged $lamRef")
    // and still point the same way within the fixed-point budget
    val ng = math.sqrt(got.map(x => x * x).sum)
    val cos = math.abs((0 until dim).map(i => got(i) / ng * ref(i)).sum)
    assert(cos >= 0.9, s"cos(integer direction, double reference) = $cos")
  }

  test("v_pca_project equals the driver-side sequential-fold projection") {
    import org.apache.spark.sql.functions.col
    val v = VectorQueries.queries("v_pca_power")(spark, sfDir).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1).toDouble)
    val embs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = VectorQueries.queries("v_pca_project")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == embs.size)
    got.foreach { case (id, proj) =>
      val x = embs(id)
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += x(i).toDouble * v(i); i += 1 }
      assert(proj == rnd6(acc / 1000000.0), s"vec $id")
    }
  }

  test("v_pca_top2 components are near-orthogonal, variance-ordered, and consistent") {
    import org.apache.spark.sql.functions.col
    val rows = VectorQueries.queries("v_pca_top2")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val dim = 64
    assert(rows.length == 2 * dim)
    val v1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3.toDouble)
    val v2 = rows.filter(_._1 == 2).sortBy(_._2).map(_._3.toDouble)
    // comp 1 IS the v_pca_power direction (same iteration, same state)
    val p1 = VectorQueries.queries("v_pca_power")(spark, sfDir).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1))
    assert(v1.map(_.toLong).sameElements(p1))
    val embs = Tables.embeddings(spark, sfDir).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = embs.length.toDouble
    val g = Array.ofDim[Double](dim, dim)
    for (a <- embs; i <- 0 until dim; j <- 0 until dim) g(i)(j) += a(i) * a(j) / n
    def rayleigh(v: Array[Double]): Double = {
      val gv = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      (0 until dim).map(i => v(i) * gv(i)).sum / v.map(x => x * x).sum
    }
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val cos = math.abs((0 until dim).map(i => v1(i) * v2(i)).sum / (norm(v1) * norm(v2)))
    assert(cos <= 0.05, s"components not orthogonal: cos = $cos")
    val (l1, l2) = (rayleigh(v1), rayleigh(v2))
    assert(l1 >= l2 && l2 > 0, s"variance order violated: $l1 vs $l2")
  }

  test("v_knn_outlier matches a driver-side brute-force top-5 mean") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    def dot(a: Array[Double], b: Array[Double]) = (0 until a.length).map(i => a(i) * b(i)).sum
    def cosine(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val got = VectorQueries.queries("v_knn_outlier")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == embs.length)
    got.foreach { case (id, mean, cnt) =>
      val top = embs.filter(_._1 != id)
        .map { case (o, e) => (math.floor(cosine(embs.toMap.apply(id), e) * 1e6 + 0.5).toLong, o) }
        .sortBy { case (s, o) => (-s, o) }.take(5).map(_._1)
      assert(cnt == top.length)
      assert(mean == top.sum / top.length, s"vec $id")
    }
  }

  test("t_winnow_fp satisfies the winnowing density guarantee") {
    // winnowing's defining property: every w-window contains a selected
    // gram, i.e. consecutive selected positions are never more than w
    // apart — verified against a driver-side replay of the selection
    val w = 4
    val k = 4
    val toks = docTokens().filter(_._2.length >= k)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val got = TextQueries.queries("t_winnow_fp")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got.map(_._1).toSet == toks.keySet)
    got.foreach { case (id, nGrams, nSel, fpMd5) =>
      val ts = toks(id)
      val hs = (0 to ts.length - k).map(i => h60(ts.slice(i, i + k).mkString(" ")))
      assert(nGrams == hs.length)
      // replay: rightmost-min per window
      val sel = (w - 1 until hs.length).map { e =>
        val win = (e - w + 1) to e
        val m = win.map(hs).min
        val pos = win.filter(p => hs(p) == m).max
        (hs(pos), pos)
      }.distinct
      assert(nSel == sel.size)
      // density: consecutive selected positions <= w apart
      val poss = sel.map(_._2).sorted
      poss.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= w)
        case _ => ()
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sel.map(_._1.toString).distinct.sorted.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fpMd5 == md, s"doc $id fingerprint mismatch")
    }
  }

  test("e_gapfill spine is continuous and matches the direct aggregation") {
    // sf0.01: the 300-value cutoff leaves 5 of 30 days populated, so both
    // branches (gap and mass) are exercised (sf0.001 has zero qualifying
    // purchases — an all-gap spine would vacuously pass)
    val rows = EventQueries.queries("e_gapfill")(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // continuous daily spine
    rows.sliding(2).foreach {
      case Array((d1, _, _, _), (d2, _, _, _)) => assert(d2 == d1.plusDays(1))
      case _ => ()
    }
    // gap rows are exactly the zero-count rows; non-gap days carry mass
    rows.foreach { case (_, n, total, isGap) =>
      assert(isGap == (n == 0))
      if (isGap) assert(total == 0.0) else assert(total > 0.0)
    }
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

  test("index balance audits account for every vector exactly once") {
    val n = Tables.embeddings(spark, sfDir).count()
    // IVF cells: every vector sits in exactly one cell
    val cells = EngineQueries.queries("x_engine_ivfdet_cellstats")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(cells.length == 8)
    assert(cells.map(_._2).sum == n)
    // LSH: every table holds every vector once; the largest bucket is
    // bounded by the table's entries
    val buckets = EngineQueries.queries("x_engine_lshdet_bucketstats")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(buckets.length == 4)
    buckets.foreach { case (_, nb, ne, mb) =>
      assert(ne == n); assert(mb <= ne); assert(nb <= ne)
    }
    // PQ: every subspace uses at most K codewords, hottest <= corpus
    val codes = EngineQueries.queries("x_engine_pq_codestats")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(codes.length == 8)
    codes.foreach { case (_, used, hot) =>
      assert(used >= 1 && used <= 16); assert(hot >= 1 && hot <= n)
    }
  }

  test("t_tfidf_sim matches a driver-side postings brute force") {
    val toks = docTokens()
    val tf = toks.toSeq.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, d, g.size.toLong) } }
    val dfm = tf.groupBy(_._1).map { case (t, g) => t -> g.size }
      .filter { case (_, c) => c >= 2 && c <= 50 }
    val nd = toks.size.toDouble
    val post = tf.collect { case (t, d, f) if dfm.contains(t) =>
      (t, d, f * math.floor(math.log(nd / dfm(t).toDouble) * 1e6).toLong) }
    val pairs = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    for ((_, ps) <- post.groupBy(_._1); a <- ps; b <- ps if a._2 < b._2) {
      val k = (a._2, b._2)
      val (s0, c0) = pairs.getOrElse(k, (0L, 0L))
      pairs(k) = (s0 + a._3 * b._3, c0 + 1)
    }
    val expTop = pairs.toSeq.map { case ((da, db), (s, c)) => (da, db, s, c) }
      .sortBy { case (da, db, s, _) => (-s, da, db) }.take(20)
    val got = TextQueries.queries("t_tfidf_sim")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expTop)
  }

  test("t_bpe_train matches a driver-side greedy BPE replay") {
    val toks = docTokens()
    val freq = toks.values.flatten.groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    var vocab: Map[String, Vector[String]] =
      freq.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    val exp =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to 64) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) =
          pc.getOrElse((syms(i), syms(i + 1)), 0L) + freq(w)
      if (pc.nonEmpty) {
        val ((a, b), cnt) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        exp += ((r, a, b, a + b, cnt))
        vocab = vocab.map { case (w, syms) =>
          val out = scala.collection.mutable.ArrayBuffer(syms.head)
          for (x <- syms.tail)
            if (out.last == a && x == b) out(out.length - 1) = a + b
            else out += x
          w -> out.toVector
        }
      }
    }
    val got = TextQueries.queries("t_bpe_train")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got == exp.toSeq)
    // the learned segmentation must preserve every word: pieces of each
    // vocab word concatenate back to the word (checked through the encode
    // entry's piece counts: sum of per-doc n_pieces <= total tokens * max
    // word length, and n_pieces >= n_tokens is the trivial lower bound)
    val enc = TextQueries.queries("t_bpe_encode")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val expTok = toks.view.mapValues(_.size).toMap
    enc.foreach { case (d, nt, np) =>
      assert(nt == expTok.getOrElse(d, 0))
      assert(np >= 0 && (nt == 0 || np >= 1))
      // after 64 merges on a 31-word vocab most words are 1 piece
      assert(np <= nt * 12)
    }
  }

  test("CDC chunker matches a driver-side brute force on random corpora") {
    // differential fuzz beyond the fixed corpus: random docs, the
    // boundary rule + chunk reassembly re-implemented sequentially on
    // the driver, full (doc, chunk, n_tok, chash) set compared
    import spark.implicits._
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val words = Vector("a", "bb", "ccc", "dd", "e", "fff", "g", "hh")
    for (seed <- Seq(7, 21)) {
      val rnd = new scala.util.Random(seed)
      val docsV = (1L to 25L).map { id =>
        val n = 1 + rnd.nextInt(60) // includes docs shorter than the gram
        (id, Vector.fill(n)(words(rnd.nextInt(words.length))))
      }
      val expected = docsV.flatMap { case (id, ts) =>
        // cut AFTER pos p (p >= 3) when h60 of gram ending at p masks
        val cuts = (3 until ts.length).filter { p =>
          h60(ts.slice(p - 3, p + 1).mkString(" ")) % 16 == 0
        }.toSet
        val ids = ts.indices.map(q => (0 until q).count(cuts.contains))
        ts.indices.groupBy(ids).map { case (cid, poss) =>
          val ctoks = poss.sorted.map(ts)
          (id, cid.toLong, ctoks.length.toLong,
            java.security.MessageDigest.getInstance("MD5")
              .digest(ctoks.mkString(" ").getBytes("UTF-8"))
              .map("%02x".format(_)).mkString)
        }
      }.toSet
      val df = docsV.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.queries.DedupQueries.cdcChunksOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      assert(got == expected, s"seed $seed: CDC chunker diverges from brute force")
    }
  }

  test("substring-dedup summary matches a driver-side brute force") {
    // random docs with PLANTED cross-shard duplicated runs; the whole
    // long-doc derivation, hot-gram set, run merge and coverage union
    // re-implemented sequentially on the driver
    import spark.implicits._
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val planted = Vector.fill(25)(vocab(rnd.nextInt(vocab.length)))
    val docsV = (0L until 30L).map { id =>
      val base = Vector.fill(5 + rnd.nextInt(35))(vocab(rnd.nextInt(vocab.length)))
      // plant the shared 25-token run into every 5th doc (lands in
      // different shards since 5 and 8 are coprime)
      (id, if (id % 5 == 0) base ++ planted else base)
    }
    // driver brute force
    val shards = docsV.groupBy(_._1 % 8).map { case (ld, ds) =>
      ld -> ds.sortBy(_._1).flatMap(_._2).toVector
    }
    val allGrams = shards.toSeq.flatMap { case (ld, ts) =>
      (0 to ts.length - 20).map(p => (ld, p, h60(ts.slice(p, p + 20).mkString(" "))))
    }
    val hot = allGrams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expected = shards.toSeq.filter(_._2.length >= 20).map { case (ld, ts) =>
      val starts = (0 to ts.length - 20)
        .filter(p => hot.contains(h60(ts.slice(p, p + 20).mkString(" "))))
      val runs = starts.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && acc.last._2 == p - 1 =>
          acc.init :+ (acc.last._1, p)
        case (acc, p) => acc :+ (p, p)
      }
      val covered = runs.flatMap { case (a, b) => a to (b + 19) }.toSet.size
      (ld, ts.length.toLong, starts.length.toLong, runs.length.toLong,
        covered.toLong)
    }.sortBy(_._1).toVector
    // write the corpus as a documents table and run the real entry
    val dir = graft.TempDirs.scratch("graft-substring-fuzz").toString
    docsV.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.DedupQueries.queries("d_substring_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toVector
    assert(got == expected, "substring summary diverges from brute force")
    assert(expected.map(_._4).sum > 0, "planted duplicates must produce runs")

    // the strip TRANSFORM on the same staged corpus: first occurrence
    // per passage md5 by (shard, start) kept, non-first extents
    // stripped (union rule), shards reassembled — driver brute force
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val spans = shards.toSeq.filter(_._2.length >= 20).flatMap { case (ld, ts) =>
      val starts = (0 to ts.length - 20)
        .filter(p => hot.contains(h60(ts.slice(p, p + 20).mkString(" "))))
      val runs = starts.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && acc.last._2 == p - 1 =>
          acc.init :+ (acc.last._1, p)
        case (acc, p) => acc :+ (p, p)
      }
      runs.map { case (a, b) =>
        (ld, a, b + 19, md5hex(ts.slice(a, b + 20).mkString(" ")))
      }
    }
    val firstOf = spans.groupBy(_._4).map { case (m, ss) =>
      m -> ss.minBy(sp => (sp._1, sp._2))
    }
    val stripSet = spans.filterNot(sp => firstOf(sp._4) == sp)
      .groupBy(_._1).map { case (ld, ss) =>
        ld -> ss.flatMap { case (_, a, x, _) => a to x }.toSet
      }
    val expStrip = shards.toSeq.filter(_._2.nonEmpty).map { case (ld, ts) =>
      val strip = stripSet.getOrElse(ld, Set.empty[Int])
      val kept = ts.indices.filterNot(strip.contains).map(ts)
      (ld, ts.length.toLong, kept.length.toLong,
        (ts.length - kept.length).toLong,
        if (kept.isEmpty) "" else md5hex(kept.mkString(" ")))
    }.sortBy(_._1).toVector
    val gotStrip = graft.queries.DedupQueries.queries("d_substring_strip")(
        spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1).toVector
    assert(gotStrip == expStrip, "strip transform diverges from brute force")
    assert(expStrip.exists(_._4 > 0), "planted duplicates must strip tokens")
  }

  test("CDC chunking is edit-resilient: one edit disturbs O(1) chunks") {
    // the property that justifies content-defined over fixed-stride
    // chunking: boundary decisions depend only on the trailing 4-token
    // window, so editing one token can move boundaries only at the
    // CdcW = 4 positions whose gram covers it — in the worst case all 4
    // were cuts and flip off, merging CdcW + 1 = 5 original chunks into
    // the edited region, so <= 5 original chunk hashes can disappear.
    // A fixed-stride chunker would shift EVERY chunk after an insertion.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val toks = Vector.fill(400)(words(rnd.nextInt(words.length)))
    def chunksOf(ts: Vector[String]): Set[String] = {
      val df = Seq((1L, ts.mkString(" "))).toDF("doc_id", "text")
      graft.queries.DedupQueries.cdcChunksOf(df)
        .select("chash").collect().map(_.getString(0)).toSet
    }
    val origTokens = toks
    val orig = chunksOf(origTokens)
    for (editPos <- Seq(50, 199, 350)) {
      // substitution
      val sub = origTokens.updated(editPos, "EDITED")
      val subDiff = (orig diff chunksOf(sub)).size
      assert(subDiff <= 5,
        s"substitution at $editPos disturbed $subDiff chunks (> CdcW + 1)")
      // insertion — the fixed-stride killer
      val ins = (origTokens.take(editPos) :+ "INSERTED") ++
        origTokens.drop(editPos)
      val insDiff = (orig diff chunksOf(ins)).size
      assert(insDiff <= 5,
        s"insertion at $editPos disturbed $insDiff chunks (> CdcW + 1)")
    }
    // sanity: the doc actually chunks into many pieces, so <=5 is a
    // real bound and not "the whole doc is one chunk"
    assert(orig.size >= 10, s"expected many chunks, got ${orig.size}")
  }

  test("d_substring_dedup run invariants hold on every shard") {
    // maximal-run accounting: every run covers at least SubL=20 tokens
    // (dup_tokens >= 20 * n_runs only when runs never overlap-merge, so
    // the safe direction is dup_tokens >= n_runs + 19 per isolated run's
    // minimum — use the exact lower bound: a run of w consecutive starts
    // covers w + 19 tokens, runs are disjoint in starts, so
    // dup_tokens <= n_dup_wins + 19 * n_runs and dup_tokens >= 20 per
    // run is NOT guaranteed under extent overlap across runs; assert the
    // two exact bounds that ARE invariant)
    val rows = graft.queries.DedupQueries.queries("d_substring_dedup")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "derived long-doc shard must be non-empty")
    rows.foreach { r =>
      val nTok = r.getLong(1); val nWins = r.getLong(2)
      val nRuns = r.getLong(3); val dupTok = r.getLong(4)
      assert(nWins >= nRuns, "a run is at least one matched window")
      // each run's covered extent is its windows + 19 tokens of tail,
      // minus whatever later runs' extents overlap — never more
      assert(dupTok <= nWins + 19 * nRuns,
        s"covered tokens exceed the union bound: $r")
      assert(dupTok <= nTok, s"coverage exceeds shard length: $r")
      assert(nRuns == 0 || dupTok >= nWins + 19,
        "at least the last run's tail extends past its windows")
    }
    // the planted cross-doc duplicates must actually light the tier up
    assert(rows.map(_.getLong(3)).sum > 0, "no duplicated runs found")
  }
}
