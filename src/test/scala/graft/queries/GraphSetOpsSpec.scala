package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential specs for the late-round-8 operator batch: each entry's
  * distributed algorithm is checked against an INDEPENDENT driver-side
  * brute force at sf0.001 (tiny enough to enumerate exhaustively), so
  * correctness does not rest on the DuckDB oracle alone — a shared
  * misconception between the Spark query and its SQL replay would slip
  * the hash gate but not these.
  */
class GraphSetOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  /** The co-purchase edge set (qty >= 40, pa < pb), collected. */
  private def edges(): Set[(Long, Long)] = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter("l_quantity >= 40")
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { grp =>
      val parts = grp.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
  }

  test("q_triangles matches a brute-force triple enumeration") {
    val e = edges()
    val adj = (e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expTri = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- e; c <- adj(a) if c > b && adj(b).contains(c)) {
      expTri(a) += 1; expTri(b) += 1; expTri(c) += 1
    }
    val got = RelationalQueries.queries("q_triangles")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (p, deg, nt) =>
      assert(nt == expTri(p), s"triangle count mismatch for part $p")
      assert(deg == adj.get(p).map(_.size.toLong).getOrElse(0L))
    }
    assert(got.map(_._3).sum == 3L * got.map(_._3).sum / 3,
      "corner sum must be divisible by 3")
  }

  test("q_kcore matches driver-side exhaustive peeling") {
    val e = edges()
    var alive = e.flatMap(p => Seq(p._1, p._2))
    val expRound = scala.collection.mutable.Map.empty[Long, Int]
    var r = 1
    var changed = true
    while (changed) {
      val deg = scala.collection.mutable.Map.empty[Long, Int]
        .withDefaultValue(0)
      for ((a, b) <- e if alive(a) && alive(b)) { deg(a) += 1; deg(b) += 1 }
      val removed = alive.filter(deg(_) < 3)
      changed = removed.nonEmpty
      removed.foreach(expRound(_) = r)
      alive = alive -- removed
      r += 1
    }
    alive.foreach(expRound(_) = 0)
    val got = RelationalQueries.queries("q_kcore")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == expRound.keySet)
    got.foreach { case (p, pr) =>
      assert(pr == expRound(p), s"peel round mismatch for part $p")
    }
  }

  private def hash60(sIn: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sIn.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("d_prefix_join is lossless vs brute-force all-pairs Jaccard >= 0.8") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val sets = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val sh = toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      id -> sh.map(hash60).toSet
    }.toMap
    // iterate a Seq, not the Map — a for over a Map would yield a Map
    // keyed by `a`, silently keeping ONE pair per left doc
    val setsSeq = sets.toSeq
    val exp = (for {
      (a, sa) <- setsSeq; (b, sb) <- setsSeq if a < b
      inter = (sa & sb).size
      union = sa.size + sb.size - inter
      if union > 0 && 5 * inter >= 4 * union
    } yield (a, b)).toSet
    val got = DedupQueries.queries("d_prefix_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp, s"prefix join pairs diverge: got ${got.size}, expected ${exp.size}")
  }

  test("q_kmv_distinct: merge law holds and estimates are sane") {
    val rows = SketchQueries.queries("q_kmv_distinct")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (exact, est_d, est_m) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(est_d == est_m, "bottom-k merge law violated")
      assert(exact > 0)
      assert(est_d >= exact / 5 && est_d <= exact * 5,
        s"KMV estimate wildly off: est=$est_d exact=$exact")
    }
  }

  test("BloomMayContain: members always pass, random non-members mostly fail") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val members = (0L until 200L).map(_ * 7919L + 13L)
    val bitmap = new Array[Long](1024)
    members.foreach { h =>
      Seq((h & 0xffffL).toInt, ((h >> 16) & 0xffffL).toInt,
        ((h >> 32) & 0xffffL).toInt)
        .foreach(p => bitmap(p >> 6) |= (1L << (p & 63)))
    }
    val probe = (members ++ (1000000L until 1002000L).map(_ * 104729L))
      .toDF("h")
    val passed = probe.filter(graft.functions.SetExpressions
        .bloomMayContain(col("h"), bitmap))
      .collect().map(_.getLong(0)).toSet
    assert(members.forall(passed), "a true member was pruned")
    val fpr = (passed.size - members.size).toDouble / 2000.0
    assert(fpr < 0.05, s"false-positive rate implausibly high: $fpr")
  }

  test("e_interval_join matches a naive all-pairs overlap count") {
    // events.ts is TIMESTAMP_NTZ in the raw parquet — go through the
    // same Tables loader the entry uses (NTZ-normalizing)
    val iv = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("ts"))).as("s"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("ts"))).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3)))
    val a = iv.filter(_._1 % 2 == 0)
    val b = iv.filter(_._1 % 2 == 1)
    val exp = a.map { case (u, day, s0, e0) =>
      (u, day) -> b.count { case (_, _, s1, e1) => s0 <= e1 && s1 <= e0 }.toLong
    }.toMap
    val got = EventQueries.queries("e_interval_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, n) => assert(n == exp(k), s"overlap count mismatch at $k") }
  }

  /** The entry's md5-derived edge weight, recomputed with
    * java.security.MessageDigest — independent of Spark's md5/conv SQL.
    */
  private def edgeWeight(pa: Long, pb: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$pa:$pb".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 9 + 1
  }

  test("q_shortest_path matches driver-side Bellman-Ford and bounds Dijkstra") {
    val e = edges()
    val w = e.map { case (a, b) => (a, b) -> edgeWeight(a, b) }.toMap
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val adj = e.toSeq.flatMap { case (a, b) =>
      Seq(a -> (b, w((a, b))), b -> (a, w((a, b)))) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val src = nodes.min
    // independent 8-round Bellman-Ford (the spec'd fixed-superstep semantics)
    var bf = Map(src -> 0L)
    for (_ <- 1 to 8) {
      val next = scala.collection.mutable.Map.empty[Long, Long]
      for ((u, du) <- bf) {
        if (!next.get(u).exists(_ <= du)) next(u) = du
        for ((v, wv) <- adj.getOrElse(u, Seq.empty))
          if (!next.get(v).exists(_ <= du + wv)) next(v) = du + wv
      }
      bf = next.toMap
    }
    // true shortest distances (Dijkstra) as a lower-bound invariant
    val dij = scala.collection.mutable.Map(src -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, src))(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (du, u) = pq.dequeue()
      if (dij(u) == du)
        for ((v, wv) <- adj.getOrElse(u, Seq.empty))
          if (!dij.get(v).exists(_ <= du + wv)) { dij(v) = du + wv; pq.enqueue((du + wv, v)) }
    }
    val got = RelationalQueries.queries("q_shortest_path")(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
    assert(got.map(_._1).toSet == nodes)
    got.foreach { case (p, dOpt, reached) =>
      assert(reached == dOpt.isDefined)
      assert(dOpt == bf.get(p), s"8-round BF distance mismatch at node $p")
      dOpt.foreach { dv =>
        assert(dij.contains(p) && dv >= dij(p),
          s"BF distance below true shortest at node $p")
      }
    }
  }

  test("q_skyline matches brute-force dominance") {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
    val exp = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz) }
    }.map(_._1).toSet
    val got = RelationalQueries.queries("q_skyline")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == exp, s"skyline sets differ: got $got exp $exp")
  }

  test("q_assoc_rules metrics match brute-force basket counting") {
    val baskets = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val itemCnt = baskets.groupBy(_._2).map { case (p, v) => p -> v.length.toLong }
      .filter(_._2 >= 5L)
    val pairCnt = baskets.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.filter(itemCnt.contains).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2L)
    val got = RelationalQueries.queries("q_assoc_rules")(spark, sfDir)
      .collect()
    assert(got.length == math.min(20, pairCnt.size))
    got.foreach { r =>
      val (pa, pb, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pairCnt((pa, pb)) == nab)
      assert(r.getLong(3) == itemCnt(pa) && r.getLong(4) == itemCnt(pb))
      assert(r.getLong(5) == nab * 1000000L / itemCnt(pa))
      assert(r.getLong(6) == nab * 1000000L / itemCnt(pb))
      assert(r.getLong(7) == nab * nOrders * 1000000L / (itemCnt(pa) * itemCnt(pb)))
    }
    // the returned rows are the global lift top-k under the id tie-break
    val lift = pairCnt.map { case ((a, b), nab) =>
      (a, b, nab * nOrders * 1000000L / (itemCnt(a) * itemCnt(b))) }.toSeq
      .sortBy { case (a, b, l) => (-l, a, b) }.take(20)
      .map(t => (t._1, t._2)).toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == lift)
  }

  test("q_shard_ring: movers land ONLY on the new shard; assignment matches driver ring") {
    val rows = MiscQueries.queries("q_shard_ring")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // the consistent-hashing contract: adding a shard only STEALS keys
    rows.foreach { case (id, s8, s9, moved) =>
      assert(moved == (s8 != s9))
      if (moved) assert(s9 == 8L, s"doc $id moved to old shard $s9")
      assert(s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9)
    }
    // independent driver-side ring replay (java MD5, not Spark SQL)
    def h60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val vn = for (sh <- 0 until 9; v <- 0 until 16)
      yield (h60(s"s:$sh:$v") / 32) * 256 + sh
    def pick(ring: Seq[Long], dpos: Long): Long = {
      val cand = ring.filter(e => (e / 256) >= dpos)
      (if (cand.nonEmpty) cand.min else ring.min) % 256
    }
    val r8 = vn.filter(_ % 256 < 8)
    rows.foreach { case (id, s8, s9, _) =>
      val dpos = h60(id.toString) / 32
      assert(s8 == pick(r8, dpos) && s9 == pick(vn, dpos),
        s"ring assignment mismatch for doc $id")
    }
  }

  test("t_entropy matches the driver integer formula and its bounds") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = texts.map { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val counts = toks.groupBy(identity).values.map(_.length.toLong)
      val n = counts.sum
      val sc = counts.map(c => c * math.floor(math.log(c.toDouble) * 1e9).toLong).sum
      id -> (n, counts.size.toLong,
        math.floor(math.log(n.toDouble) * 1e9).toLong - sc / n)
    }.toMap
    val got = TextQueries.queries("t_entropy")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == exp.size)
    got.foreach { case (id, v) =>
      assert(v == exp(id), s"entropy mismatch for doc $id")
      val (n, nd, e) = v
      assert(e >= 0L, s"negative entropy for doc $id")
      // H <= ln(n_distinct) up to nano-nat floor slack
      assert(e <= math.floor(math.log(nd.toDouble) * 1e9).toLong + 2,
        s"entropy above the uniform bound for doc $id")
    }
  }

  test("d_greedy_cover matches an exhaustive driver greedy; gains non-increasing") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h60(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val gramSets = texts.map { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      id -> toks.sliding(3).filter(_.length == 3)
        .map(w => h60(w.mkString(" "))).toSet
    }.toMap
    var covered = Set.empty[Long]
    val exp = (1 to 10).map { r =>
      val (bestId, bestGain) = gramSets.toSeq
        .map { case (id, gs) => (id, (gs -- covered).size.toLong) }
        .maxBy { case (id, gain) => (gain, -id) }
      covered = covered ++ gramSets(bestId)
      (r, bestId, bestGain, covered.size.toLong)
    }
    val got = DedupQueries.queries("d_greedy_cover")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp, s"greedy trace differs:\n$got\nvs\n$exp")
    // submodularity: greedy marginal gains never increase
    got.map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a)
      case _ =>
    }
  }

  test("e_rate_limit matches a driver token-bucket simulation") {
    val ev = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        (org.apache.spark.sql.functions.unix_timestamp(
          org.apache.spark.sql.functions.col("ts")) -
          org.apache.spark.sql.functions.lit(1704067200L)).as("rel"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = ev.groupBy(_._1).map { case (uid, rows) =>
      val ts = rows.map(_._2).sorted
      var tok = 2000L; var adm = 1L; var last = ts.head
      for (x <- ts.tail) {
        tok = math.min(3000L, tok + (x - last) * 5 / 216)
        if (tok >= 1000L) { tok -= 1000L; adm += 1 }
        last = x
      }
      uid -> (ts.length.toLong, adm, tok)
    }
    val got = EventQueries.queries("e_rate_limit")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == exp.size)
    got.foreach { case (uid, (n, adm, tokMilli, thr)) =>
      val (en, eadm, etok) = exp(uid)
      assert(n == en && adm == eadm && tokMilli == etok && thr == n - adm,
        s"bucket state mismatch for user $uid")
    }
    assert(got.map(_._2._4).sum > 0, "parameters must actually throttle")
  }

  test("q_dq_checks recounts two checks exactly") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity").collect().map(_.getDouble(0))
    val expTight = li.count(_ <= 45.0).toLong * 1000000L / li.length
    val got = RelationalQueries.queries("q_dq_checks")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got("lineitem.quantity_le_45")._1 == expTight)
    assert(got("lineitem.quantity_le_45")._2 == (expTight >= 1000000L))
    assert(got("orders.orderkey_unique") == ((1000000L, true)))
    assert(got.size == 8 && got.values.forall(v => v._1 >= 0 && v._1 <= 1000000L))
  }

  test("q_communities matches a driver-side synchronous LPA replay") {
    val e = edges()
    val adj = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 5) {
      lab = adj.map { case (v, ns) =>
        val counts = ns.map(lab).groupBy(identity)
          .map { case (l, xs) => l -> xs.size }
        val mx = counts.values.max
        v -> counts.collect { case (l, c) if c == mx => l }.min
      }
    }
    val got = RelationalQueries.queries("q_communities")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lab, "per-node community labels must match the replay")
    assert(got.values.toSet.size < got.size,
      "propagation must actually merge some labels")
  }

  test("v_kcenter_coreset matches a driver greedy; radii non-increasing") {
    val pts = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(cast(embedding as array<double>), x -> cast(floor(x * 1000000.0 + 0.5) as bigint)) qe")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val ids = pts.keys.toSeq.sorted
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var exp = Vector((1, ids.head, 0L))
    val md = scala.collection.mutable.Map.empty[Long, Long]
    ids.foreach(i => md(i) = d2(pts(i), pts(ids.head)))
    for (r <- 2 to 8) {
      val cid = ids.minBy(i => (-md(i), i))
      exp = exp :+ ((r, cid, md(cid)))
      ids.foreach { i =>
        val d = d2(pts(i), pts(cid)); if (d < md(i)) md(i) = d
      }
    }
    val got = VectorQueries.queries("v_kcenter_coreset")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == exp, "greedy selection trajectory must match the replay")
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      "max-min radii must be non-increasing (greedy k-center invariant)")
  }

  test("e_attribution matches a driver last-touch replay") {
    import org.apache.spark.sql.functions.{col, unix_micros, date_trunc, to_date}
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        to_date(date_trunc("day", col("ts"))).cast("string").as("day"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getDouble(5)))
    val H = 7L * 86400L * 1000000L
    val daily = scala.collection.mutable.Map
      .empty[String, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    ev.groupBy(_._1).values.foreach { rows =>
      var clickUs = Option.empty[Long]
      rows.sortBy(r => (r._3, r._2)).foreach { case (_, _, us, day, typ, v) =>
        if (typ == "purchase") {
          val attr = clickUs.exists(c => c < us && us - c <= H)
          val (p, a, rev) = daily(day)
          daily(day) = (p + 1, a + (if (attr) 1L else 0L),
            rev + (if (attr) math.floor(v * 10000.0 + 0.5).toLong else 0L))
        }
        if (typ == "click") clickUs = Some(us)
      }
    }
    val got = EventQueries.queries("e_attribution")(spark, sfDir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == daily.toMap, "daily attribution rollup must match")
    assert(got.values.map(_._2).sum > 0 &&
      got.values.map(_._2).sum < got.values.map(_._1).sum,
      "both the attributed and organic paths must be exercised")
  }

  test("e_acf matches a BigInt driver replay on the gap-filled spine") {
    import org.apache.spark.sql.functions.{col, to_date}
    val days = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).cast("string").as("day"), col("event_type"))
      .collect().map(r => (java.time.LocalDate.parse(r.getString(0)), r.getString(1)))
    val counts = days.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (d, xs) => d -> xs.size.toLong }
    val d0 = days.map(_._1).min
    val d1 = days.map(_._1).max
    val spine = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toVector
    val y = spine.map(d => counts.getOrElse(d, 0L))
    val n = BigInt(y.size); val sS = BigInt(y.sum)
    val dev = y.map(v => BigInt(v) * n - sS)
    val den = dev.map(v => v * v).sum
    val exp = (1 to 7).map { k =>
      val num = (0 until (y.size - k)).map(t => dev(t) * dev(t + k)).sum
      k -> ((y.size - k).toLong, ((BigInt(1000000) * num) / den).toLong)
    }.toMap
    val got = EventQueries.queries("e_acf")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp, "per-lag exact-integer ACF must match the replay")
    assert(got.values.forall { case (_, a) => a.abs <= 1000000L },
      "|acf| is bounded by 1 (Cauchy-Schwarz)")
  }

  test("q_link_predict matches a brute-force distance-2 scorer") {
    val e = edges()
    val adj = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val cand = for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      u = nodes(i); w = nodes(j)
      if !e.contains((u, w))
      cn = (adj(u) & adj(w)).size if cn > 0
    } yield {
      val du = adj(u).size.toLong; val dw = adj(w).size.toLong
      (u, w, cn.toLong, du, dw, 1000000L * cn / (du + dw - cn))
    }
    val exp = cand.sortBy { case (u, w, cn, _, _, j) => (-cn, -j, u, w) }
      .take(20).toVector
    val got = RelationalQueries.queries("q_link_predict")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toVector
    assert(got == exp, "top-20 predicted links must match the brute force")
    assert(exp.nonEmpty, "the graph must yield distance-2 candidates")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("t_clf_auc matches a driver Mann-Whitney replay") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val scored = rows.flatMap { case (text, lang) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None // explode drops token-less docs on both engines
      else Some((toks.map { tok =>
        val bucket = java.lang.Long.parseLong(md5hex(tok).take(8), 16) % 1024
        java.lang.Long.parseLong(md5hex(s"w|$bucket").take(15), 16) % 2000001L - 1000000L
      }.sum, lang == "en"))
    }
    val p = scored.count(_._2).toLong
    val nn = scored.size - p
    // 2U = sum over positives of (2 * negs strictly below + negs tied)
    val negs = scored.filter(!_._2).map(_._1)
    val u2 = scored.filter(_._2).map { case (sc, _) =>
      2L * negs.count(_ < sc) + negs.count(_ == sc)
    }.sum
    val expAuc = BigInt(1000000) * u2 / (2L * p * nn)
    val got = TextQueries.queries("t_clf_auc")(spark, sfDir).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      (p, nn, expAuc.toLong), "exact AUC must match the rank-sum replay")
    assert(got.getLong(2) >= 0 && got.getLong(2) <= 1000000L)
  }

  test("d_split_assign matches a driver hash split; splits exhaust the corpus") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val assigned = rows.map { case (id, lang) =>
      val b = java.lang.Long.parseLong(md5hex(s"split|$id").take(15), 16) % 100
      (lang, if (b < 98) "train" else if (b == 98) "val" else "test")
    }
    val exp = assigned.groupBy(identity).map { case ((lang, sp), xs) =>
      val nLang = assigned.count(_._1 == lang).toLong
      (lang, sp) -> (xs.size.toLong, nLang, 1000000L * xs.size / nLang)
    }
    val got = DedupQueries.queries("d_split_assign")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp, "per-(lang, split) audit must match the replay")
    assert(got.map(_._2._1).sum == rows.length.toLong,
      "splits must partition the corpus exactly")
  }

  test("e_wau matches a driver sliding-window distinct replay") {
    import org.apache.spark.sql.functions.{col, to_date}
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
      .distinct
    val d0 = ud.map(_._2).min; val d1 = ud.map(_._2).max
    val spine = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toVector
    val exp = spine.map { day =>
      val dau = ud.count(_._2 == day).toLong
      val wau = ud.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._1).distinct.size.toLong
      day.toString -> (dau, wau,
        if (wau == 0) 0L else 1000000L * dau / wau)
    }.toMap
    val got = EventQueries.queries("e_wau")(spark, sfDir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == exp, "per-day DAU/WAU/stickiness must match the replay")
    assert(got.values.forall { case (dau, wau, _) => wau >= dau },
      "WAU dominates DAU by containment")
  }

  test("t_clf_calibration matches a driver binning replay") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val scored = rows.flatMap { case (text, lang) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else Some((toks.map { tok =>
        val bucket = java.lang.Long.parseLong(md5hex(tok).take(8), 16) % 1024
        java.lang.Long.parseLong(md5hex(s"w|$bucket").take(15), 16) % 2000001L - 1000000L
      }.sum, if (lang == "en") 1L else 0L))
    }
    val lo = scored.map(_._1).min; val hi = scored.map(_._1).max
    val w = (hi - lo) / 10 + 1
    val exp = scored.groupBy { case (sc, _) => (sc - lo) / w }.map {
      case (bin, xs) =>
        val n = xs.size.toLong; val np = xs.map(_._2).sum
        val ssum = xs.map(_._1).sum
        bin -> (n, np, 1000000L * np / n, ssum / n)
    }
    val got = TextQueries.queries("t_clf_calibration")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp, "per-bin reliability table must match the replay")
    assert(got.keys.forall(b => b >= 0 && b <= 9), "bins stay inside [0, 9]")
  }

  test("q_skew_audit matches a BigInt driver replay") {
    val users = Tables.events(spark, sfDir).select("user_id")
      .collect().map(_.getLong(0))
    val c = users.groupBy(identity).map { case (u, xs) => u -> xs.size.toLong }
    val k = c.size.toLong; val t = users.length.toLong
    val maxC = c.values.max
    val top10 = c.toSeq.sortBy { case (u, n) => (-n, u) }.take(10).map(_._2).sum
    val sc2 = c.values.map(v => BigInt(v) * v).sum
    val imb = BigInt(1000000) * k * sc2 / (BigInt(t) * t)
    val got = RelationalQueries.queries("q_skew_audit")(spark, sfDir).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) ==
      (k, t, maxC, 1000000L * maxC / t, 1000000L * top10 / t, imb.toLong))
    assert(got.getLong(5) >= 1000000L, "imbalance factor is >= 1 (uniform floor)")
  }

  test("e_cusum matches a driver clamped-fold replay; trajectories non-negative") {
    import org.apache.spark.sql.functions.{col, to_date}
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var su = 0L; var sd = 0L
    val exp = daily.map { case (day, y) =>
      su = math.max(0L, su + (y - 70)); sd = math.max(0L, sd + (60 - y))
      day -> (y, su, sd, su >= 12, sd >= 12)
    }.toMap
    val got = EventQueries.queries("e_cusum")(spark, sfDir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got == exp, "CUSUM trajectories and alarms must match the replay")
    assert(got.values.forall { case (_, u, dn, _, _) => u >= 0 && dn >= 0 },
      "clamped statistics never go negative")
  }

  test("e_holt matches a driver two-state smoothing replay") {
    import org.apache.spark.sql.functions.{col, to_date}
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // Scala / truncates toward zero — the spelled contract on both engines
    var l = daily.head._2; var b = 0L
    var prevF = Option.empty[Long]
    val exp = daily.zipWithIndex.map { case ((day, y), i) =>
      if (i > 0) {
        val lt = (y + 3 * (l + b)) / 4
        val bt = ((lt - l) + 3 * b) / 4
        l = lt; b = bt
      }
      val row = (day, y, l, b, prevF)
      prevF = Some(l + b)
      row
    }.toVector
    val got = EventQueries.queries("e_holt")(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toVector
    assert(got == exp, "Holt trajectory must match the replay")
  }

  test("e_correlation matches a driver midrank replay") {
    import org.apache.spark.sql.functions.{col, to_date}
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def rank2(vs: Seq[Long]): Seq[Long] = vs.map { v =>
      2L * (vs.count(_ < v) + 1) + vs.count(_ == v) - 1
    }
    def stats(xs: Seq[Long], ys: Seq[Long]): (Int, BigInt, BigInt, BigInt) = {
      val n = xs.size
      val (sx, sy) = (BigInt(xs.sum), BigInt(ys.sum))
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val sxx = xs.map(a => BigInt(a) * a).sum
      val syy = ys.map(b => BigInt(b) * b).sum
      val num = n * sxy - sx * sy
      (num.signum, num, n * sxx - sx * sx, n * syy - sy * sy)
    }
    def r2e6(num: BigInt, dx: BigInt, dy: BigInt): Long =
      if (dx == 0 || dy == 0) 0L
      else ((BigInt(1000000) * num * num) / (dx * dy)).toLong
    val xs = daily.map(_._1).toSeq; val ys = daily.map(_._2).toSeq
    val (ps, pn, pdx, pdy) = stats(xs, ys)
    val (ss, sn, sdx, sdy) = stats(rank2(xs), rank2(ys))
    val got = EventQueries.queries("e_correlation")(spark, sfDir).collect()(0)
    assert((got.getLong(0), got.getInt(1), got.getLong(2),
      got.getInt(3), got.getLong(4)) ==
      (daily.length.toLong, ps, r2e6(pn, pdx, pdy), ss, r2e6(sn, sdx, sdy)),
      "exact signed r-squared must match the replay")
    assert(got.getLong(2) <= 1000000L && got.getLong(4) <= 1000000L,
      "r-squared is bounded by 1 (Cauchy-Schwarz)")
  }

  test("e_ab_test matches a driver cohort replay") {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val conv = ev.groupBy(_._1).map { case (u, xs) =>
      u -> (if (xs.count(_._2 == "purchase") >= 15) 1L else 0L)
    }
    val co = conv.groupBy { case (u, _) =>
      java.lang.Long.parseLong(md5hex(s"exp1|$u").take(15), 16) % 2
    }
    def stats(c: Long) = {
      val xs = co(c).values
      val users = xs.size.toLong; val cc = xs.sum
      (users, cc, 1000000L * cc / users)
    }
    val (ua, ca, ra) = stats(0L); val (ub, cb, rb) = stats(1L)
    val score = if (ra + rb == 0) 0L else (ra - rb) * (ra - rb) / (ra + rb)
    val got = EventQueries.queries("e_ab_test")(spark, sfDir).collect()(0)
    assert((0 until 8).map(got.getLong) ==
      Seq(ua, ca, ra, ub, cb, rb, ra - rb, score),
      "A/B readout must match the cohort replay")
  }

  test("m_px_histogram bins sum to the image area and match the closed form") {
    val got = MiscQueries.queries("m_px_histogram")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val exp = (0 until 24).flatMap { i =>
      val w = 8 + i % 5; val h = 6 + i % 3
      val hist = new Array[Long](16)
      for (x <- 0 until w; y <- 0 until h) {
        val l = (299 * ((7 * x + 11 * y + i) % 256) +
          587 * ((3 * x + 5 * y + 2 * i) % 256) +
          114 * ((13 * x + 17 * y + 3 * i) % 256)) / 1000
        hist(l >> 4) += 1
      }
      (0 until 16).filter(hist(_) > 0).map(b => (i.toLong, b, hist(b)))
    }
    assert(got.toSeq == exp, "per-bin luma counts must match the formula")
    val areas = got.groupBy(_._1).map { case (i, xs) => i -> xs.map(_._3).sum }
    assert(areas.forall { case (i, n) =>
      n == (8 + i % 5) * (6 + i % 3) }, "bins partition every decoded pixel")
  }

  test("x_engine_filtered_recall: pre-filter dominates post-filter on average") {
    val rows = EngineQueries.queries("x_engine_filtered_recall")(spark, sfDir)
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (np, _, _) => np >= 0 && np <= 10 },
      "post-filter survivors stay within k")
    val meanPost = rows.map(_._2).sum / rows.length
    val meanPre = rows.map(_._3).sum / rows.length
    assert(meanPre >= meanPost,
      s"pre-filter recall ($meanPre) must dominate post-filter ($meanPost): " +
        "the oversample budget is spent inside the filtered subset")
  }

  test("v_silhouette matches a driver replay over the greedy centers") {
    val pts = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(cast(embedding as array<double>), x -> cast(floor(x * 1000000.0 + 0.5) as bigint)) qe")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val ids = pts.keys.toSeq.sorted
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    // the same Gonzalez greedy the coreset spec validates
    var centers = Vector(ids.head)
    val md = scala.collection.mutable.Map.empty[Long, Long]
    ids.foreach(i => md(i) = d2(pts(i), pts(ids.head)))
    for (_ <- 2 to 8) {
      val cid = ids.minBy(i => (-md(i), i))
      centers = centers :+ cid
      ids.foreach { i =>
        val dd = d2(pts(i), pts(cid)); if (dd < md(i)) md(i) = dd
      }
    }
    val perPoint = ids.map { i =>
      val ds = centers.map(cid => (d2(pts(i), pts(cid)), cid)).sorted
      val (a2, own) = ds(0); val b2 = ds(1)._1
      val s = if (math.max(a2, b2) == 0) 0L
        else 1000000L * (b2 - a2) / math.max(a2, b2)
      own -> s
    }
    val exp = perPoint.groupBy(_._1).map { case (cid, xs) =>
      val ss = xs.map(_._2)
      cid -> (ss.size.toLong, ss.sum / ss.size, ss.min)
    }
    val got = VectorQueries.queries("v_silhouette")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == exp, "per-cluster silhouette audit must match the replay")
    assert(got.keys.toSet == centers.toSet, "every center owns a cluster")
  }
}
