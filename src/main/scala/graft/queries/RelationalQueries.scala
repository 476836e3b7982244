package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Det.{rnd, rndSql}

/** Relational analytics over the TPC-H-ish star schema — the general
  * query surface (scan/filter/join/agg/window/sort/limit/pagination) that
  * SURVEY.md §2 maps the reference's operators onto.
  *
  * Scale design notes:
  *   - Aggregations rely on Catalyst's partial (map-side) aggregation; the
  *     shuffle carries |groups| rows per partition, not the fact table.
  *   - Dimension tables (customer/orders at TPC-H ratios, nation/region
  *     always) are broadcast — `broadcast()` hints where the small side is
  *     known, AQE handles the rest at runtime.
  *   - Numeric determinism vs the oracle: every floating sum is computed
  *     as an EXACT decimal sum (inputs cast to decimal, summed, cast back
  *     to double) so the result is independent of partitioning / addition
  *     order — a requirement for hash-compared results on a 1000-executor
  *     cluster, not just for the oracle.
  */
object RelationalQueries {

  /** Exact, order-independent sum of a double column: decimal-sum, then
    * back to double. scale=4 is enough for 2-decimal money columns.
    */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(28,8)")).cast("double")

  /** TPC-H Q1-style pricing summary (full-scan aggregate). */
  private def q1Pricing(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,4)") *
             (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        ).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
      )
      .withColumn("avg_qty", rnd(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_price", rnd(col("sum_base_price") / col("count_order"), 6))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** TPC-H Q3-style: top-10 unshipped orders by revenue.
    * Join shape at scale: lineitem (fact) equi-joins orders on the shuffle
    * key; customer is broadcast; top-k is TakeOrderedAndProject.
    */
  private def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
      ).cast("double").as("revenue"))
      .select(col("l_orderkey"), rnd(col("revenue"), 4).as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation where customer and supplier share
    * the nation, restricted to one region. nation/region/supplier are
    * broadcast; the only shuffle is lineitem->orders and the final agg.
    */
  private def q5NationRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cust = Tables.customer(s, d)
    val supp = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
      ).cast("double").as("revenue"))
      .select(col("n_name"), rnd(col("revenue"), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Per-group top-k (reference T1 batch shape): top-3 orders per customer
    * by total price — row_number window, one shuffle on the partition key.
    */
  private def topOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,4)").cast("double")
          .as("o_totalprice"))
      .orderBy(col("o_custkey").asc, col("rn").asc)
  }

  /** Same top-3-per-customer, via the k-bounded typed Aggregator
    * (`TopKByScore`) instead of a window: partial aggregation caps each
    * map-side partition at k rows per key BEFORE the shuffle — the shape
    * that survives hot keys at 100 TB, where the window plan must shuffle
    * and sort every row of every group. Oracle identical to
    * `q_topk_per_cust`.
    */
  private def topOrdersHeap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .agg(graft.functions.TopKAggregator.topK(3).toColumn)
      .flatMap { case (ck, tops) =>
        tops.zipWithIndex.map { case ((price, ok), i) => (ck, i + 1, ok, price) }
      }
      .toDF("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,4)").cast("double")
          .as("o_totalprice"))
      .orderBy(col("o_custkey").asc, col("rn").asc)
  }

  /** Pagination (reference T6, `repos/documents.py:46-47`): stable total
    * order, rows [offset, offset+limit) via row_number.
    */
  private def paginateOrders(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    // page [100,120): take the top offset+limit rows DISTRIBUTED
    // (TakeOrderedAndProject — every partition contributes its local
    // top-120, no global single-partition window over the full table),
    // then number the tiny capped set; partitionBy(lit) keeps WindowExec
    // off the all-rows-to-one-partition path for the 600k-row input
    val w = Window.partitionBy(WindowUtil.onePartition(col("o_orderkey")))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    ord.orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(120)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 100 && col("rn") <= 120)
      .select(col("rn"), col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,4)").cast("double")
          .as("o_totalprice"))
      .orderBy(col("rn").asc)
  }

  /** Anti-join (reference U3/C5 cascade-delete shape): customers with no
    * orders in the window — the "rows surviving a delete" pattern.
    */
  private def custWithoutRecentOrders(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey").asc)
  }

  /** Semi-join (reference J5/P3 doc_ids-filter shape). */
  private def partsWithBigLineitems(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    val big = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 49).select(col("l_partkey"))
    part.join(big, col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .orderBy(col("p_partkey").asc)
  }

  /** TRIANGLE COUNT + local clustering coefficient over the co-purchase
    * graph (parts appearing in the same order, restricted to high-quantity
    * lineitems so the graph is non-trivially sparse). The canonical graph
    * pattern beyond the r7 PageRank entry, in its scale shape:
    * DEGREE-ORIENTED wedge counting — every undirected edge is directed
    * from its (degree, id)-smaller endpoint to the larger, wedges are
    * generated only from each node's OUT-neighbors, and a wedge closes iff
    * the oriented edge (v, w) exists. Orientation bounds per-node wedge
    * fan-out by the out-degree, which is O(sqrt(|E|)) for every node
    * regardless of hubs (a raw self-join on the hub's full neighbor list
    * is the classic skew blow-up this avoids); the plan is three
    * equi-joins and two aggregations, no driver-side graph state. Each
    * triangle is produced exactly once (its corners are totally ordered by
    * (degree, id)), then exploded to its three corners for per-node
    * counts; cc6 = 2*tri/(deg*(deg-1)) in integer micro-units. The oracle
    * replays triangles with the straightforward id-ordered three-way join
    * — a DIFFERENT enumeration order that must agree corner-for-corner.
    */
  /** The co-purchase graph (parts sharing an order, high-quantity
    * lineitems only) — shared by the triangle and k-core entries so the
    * two graph analytics provably read the same edge set.
    */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    li.as("ea").join(li.as("eb"),
        col("ea.l_orderkey") === col("eb.l_orderkey") &&
          col("ea.l_partkey") < col("eb.l_partkey"))
      .select(col("ea.l_partkey").as("pa"), col("eb.l_partkey").as("pb"))
      .distinct()
  }

  private def triangles(s: SparkSession, d: String): DataFrame = {
    val e = coPurchaseEdges(s, d)
    val deg = e.select(col("pa").as("p")).unionAll(e.select(col("pb").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("degree"))
    val withDeg = e
      .join(deg.select(col("p").as("pa"), col("degree").as("da")), Seq("pa"))
      .join(deg.select(col("p").as("pb"), col("degree").as("db")), Seq("pb"))
    // pa < pb always, so (da, pa) < (db, pb) iff da < db or da == db
    val aFirst = col("da") < col("db") || col("da") === col("db")
    val oriented = withDeg.select(
      when(aFirst, col("pa")).otherwise(col("pb")).as("src"),
      when(aFirst, col("pb")).otherwise(col("pa")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
    val wedges = oriented.as("w1").join(oriented.as("w2"),
        col("w1.src") === col("w2.src") &&
          (col("w1.ddst") < col("w2.ddst") ||
            (col("w1.ddst") === col("w2.ddst") &&
              col("w1.dst") < col("w2.dst"))))
      .select(col("w1.src").as("u"), col("w1.dst").as("v"),
        col("w2.dst").as("w"))
    val tri = wedges.join(oriented.select(col("src").as("v"),
        col("dst").as("w")), Seq("v", "w"))
    val corners = tri.select(col("u").as("p"))
      .unionAll(tri.select(col("v").as("p")))
      .unionAll(tri.select(col("w").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("nt"))
    deg.join(corners, Seq("p"), "left")
      .select(col("p").as("p_partkey"), col("degree"),
        coalesce(col("nt"), lit(0L)).as("n_tri"),
        expr("CASE WHEN degree >= 2 THEN (2000000 * coalesce(nt, 0)) div (degree * (degree - 1)) ELSE 0 END")
          .as("cc6"))
      .orderBy(col("p_partkey").asc)
  }

  /** SKEW-SALTED shuffle join — the standard hot-key recipe, exercised
    * end-to-end with a hash-checked result: events join a 4-row type-dim
    * on `event_type` (cardinality 5 — EVERY key is a hot key; on a
    * shuffled join each key funnels into one reducer). The salted plan
    * adds a deterministic salt (user_id % 8) to the probe side,
    * REPLICATES the dim 8x with an exploded salt column, and equi-joins
    * on (event_type, salt) — each hot key now spreads over 8 reducers,
    * at the cost of an 8x copy of the METADATA-scale side only. The
    * shuffle_hash hint forces the shuffled-join regime under test (the
    * optimizer would rightly broadcast a 32-row dim; at 100 TB the
    * replicated side may be a million-row dim that exceeds the broadcast
    * threshold while the salt factor still bounds per-reducer load).
    * Deterministic salt means the result is provably IDENTICAL to the
    * unsalted join — the oracle runs the plain join, so a lost or
    * double-counted row under salting fails the hash. AQE's runtime
    * skew-split covers sort-merge joins; explicit salting remains the
    * portable fix for hash-partitioned aggregating joins like this one.
    */
  private def saltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val S = 8
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("salt", (col("user_id") % S).cast("int"))
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 5), ("signup", 10))
      .toDF("event_type", "weight")
    val dimSalted = dim.withColumn("salt",
      explode(sequence(lit(0), lit(S - 1))))
      .withColumn("salt", col("salt").cast("int"))
    ev.join(dimSalted.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v") * col("weight")).cast("double").as("weighted"))
      .orderBy(col("event_type").asc)
  }

  /** K-CORE DECOMPOSITION (k=3) by iterative peeling over the shared
    * co-purchase graph — the graph-robustness operator beside PageRank
    * (influence) and triangles (local density): repeatedly delete nodes
    * with degree < k until a fixpoint; what survives is the maximal
    * subgraph where every node keeps >= k neighbors (spam/boilerplate
    * hubs peel early, genuinely dense cores survive — the graph-side
    * dedup signal). Peeling runs R=8 FIXED supersteps (measured
    * convergence: 4 rounds at sf0.01, 5 at sf0.1 — the fixpoint is
    * reached with 3+ rounds of margin, and a converged fixpoint is the
    * true k-core regardless of R). Per round: the edge set is restricted
    * to live endpoints (two semi-joins), degrees recomputed (one agg),
    * survivors kept — every shuffle bounded by the CURRENT subgraph, and
    * the live set is localCheckpoint'ed per superstep (nodes-scale rows)
    * exactly like an iterative graph engine truncates lineage per
    * iteration; without it each round's plan would re-derive the
    * previous round three times (3^R blowup). Output: every node with
    * its peel round (0 = survived into the core) — a coreness readout,
    * not just a membership bit. The oracle unrolls the same 8 rounds as
    * MATERIALIZED CTEs (each live set is referenced three times per
    * round; DuckDB inlines non-materialized CTEs per reference — the
    * 2^R trap the PCA oracle documented).
    */
  private def kcore(s: SparkSession, d: String): DataFrame = {
    val K = 3
    val R = 8
    val e = coPurchaseEdges(s, d).localCheckpoint() // consumed every round
    // BOUNDED LOCAL PEELING (optimization r15, the CC local-finish
    // discipline): each distributed round costs two semi-joins, a degree
    // aggregate, an anti-join, a checkpoint and a count — fixed global
    // barriers whatever the subgraph size. Under a hard edge cap the
    // peel loop runs on the driver with IDENTICAL per-round semantics
    // (same early exit at the fixpoint, same per-occurrence degree
    // counts); larger graphs keep the distributed rounds.
    if (e.count() <= (1L << 22)) {
      val edges = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      var aliveSet = scala.collection.immutable.TreeSet.empty[Long] ++
        edges.flatMap(t => Seq(t._1, t._2))
      val peel = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var lastCount = aliveSet.size.toLong
      var converged = false
      for (r <- 1 to R if !converged) {
        val deg = scala.collection.mutable.HashMap.empty[Long, Long]
        edges.foreach { case (a, b) =>
          if (aliveSet.contains(a) && aliveSet.contains(b)) {
            deg.update(a, deg.getOrElse(a, 0L) + 1)
            deg.update(b, deg.getOrElse(b, 0L) + 1)
          }
        }
        val kept = aliveSet.filter(p => deg.getOrElse(p, 0L) >= K)
        (aliveSet -- kept).foreach(p => peel += ((p, r)))
        aliveSet = kept
        val c = aliveSet.size.toLong
        converged = c == lastCount
        lastCount = c
      }
      val rows = (peel.toSeq ++ aliveSet.toSeq.map(p => (p, 0)))
        .map { case (p, r) => org.apache.spark.sql.Row(p, r, r == 0) }
      return s.createDataFrame(
          s.sparkContext.parallelize(rows, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("p_partkey",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("peel_round",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("in_core",
              org.apache.spark.sql.types.BooleanType))))
        .orderBy(col("p_partkey").asc)
    }
    var alive = e.select(col("pa").as("p"))
      .unionAll(e.select(col("pb").as("p"))).distinct()
      .localCheckpoint()
    var peeled: DataFrame = null
    // early exit at the fixpoint: an empty peel round is idempotent, so
    // stopping when |alive| stops shrinking yields the IDENTICAL output
    // to running all R rounds (the oracle replays the full unrolled R —
    // its post-fixpoint rounds are no-ops); the count is an O(1)-ish
    // action on the just-checkpointed live set
    var lastCount = alive.count()
    var converged = false
    for (r <- 1 to R if !converged) {
      val er = e
        .join(alive.select(col("p").as("pa")), Seq("pa"), "left_semi")
        .join(alive.select(col("p").as("pb")), Seq("pb"), "left_semi")
      val deg = er.select(col("pa").as("p"))
        .unionAll(er.select(col("pb").as("p")))
        .groupBy(col("p")).agg(count(lit(1)).as("c"))
      val kept = deg.filter(col("c") >= K).select(col("p"))
      val removed = alive.join(kept, Seq("p"), "left_anti")
        .withColumn("peel_round", lit(r))
      peeled = if (peeled == null) removed else peeled.unionAll(removed)
      alive = kept.localCheckpoint() // superstep lineage truncation
      val c = alive.count()
      converged = c == lastCount
      lastCount = c
    }
    peeled.unionAll(alive.withColumn("peel_round", lit(0)))
      .select(col("p").as("p_partkey"), col("peel_round").cast("int").as("peel_round"),
        (col("peel_round") === 0).as("in_core"))
      .orderBy(col("p_partkey").asc)
  }

  /** SINGLE-SOURCE SHORTEST PATHS (Bellman-Ford supersteps) over the
    * shared co-purchase graph — the fourth classic graph operator
    * beside PageRank, triangles/clustering and k-core, on provably the
    * SAME edge set. Edge weights are md5-hash-derived integers in
    * [1,9] (the hash60 lottery convention — deterministic, both
    * engines replay them), the source is the minimum node id, and the
    * semantics are exactly 8 relaxation supersteps:
    * d_{r+1}(v) = min over in-edges (d_r(u) + w(u,v)), with a
    * ZERO-WEIGHT SELF-LOOP per node standing in for "keep my current
    * distance" — that folds the keep-vs-relax min into ONE aggregate
    * and, critically, means each round references the previous
    * distance frame exactly ONCE (the same single-reference discipline
    * that keeps PageRank's lazily-chained lineage linear instead of
    * 2^R).
    *
    * 100 TB shape: distance state is NODES-scale; each superstep is one
    * edges->dist equi-join plus one min-aggregate (partial-agg
    * friendly, shuffle keyed on dst). The edge set (bidirected + self
    * loops) is built once and localCheckpoint'ed — it feeds all 8
    * rounds. Distances are exact BIGINTs bounded by R * max(w), so the
    * whole trajectory replays in the oracle's 8 unrolled MATERIALIZED
    * CTEs.
    */
  private def shortestPath(s: SparkSession, d: String): DataFrame = {
    val R = 8
    val base = coPurchaseEdges(s, d).withColumn("w",
      expr("CAST(conv(substring(md5(concat(CAST(pa AS STRING), ':', CAST(pb AS STRING))), 1, 15), 16, 10) AS BIGINT) % 9 + 1"))
    val nodes = base.select(col("pa").as("p"))
      .unionAll(base.select(col("pb").as("p"))).distinct()
    val edges = base.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
      .unionAll(base.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
      .unionAll(nodes.select(col("p").as("src"), col("p").as("dst"),
        lit(0L).as("w")))
      .localCheckpoint() // consumed by all 8 supersteps
    var dist = base.agg(min(col("pa")).as("p")).select(col("p"),
      lit(0L).as("dist"))
    for (_ <- 1 to R) {
      dist = edges.join(dist, edges("src") === dist("p"))
        .groupBy(col("dst")).agg(min(col("dist") + col("w")).as("dist"))
        .withColumnRenamed("dst", "p")
    }
    nodes.join(dist, Seq("p"), "left")
      .select(col("p").as("p_partkey"), col("dist"),
        col("dist").isNotNull.as("reached"))
      .orderBy(col("p_partkey").asc)
  }

  /** COMMUNITY DETECTION by synchronous label propagation (LPA) over the
    * SAME co-purchase edge set as triangles/k-core/SSSP — the
    * linear-time graph-clustering pass pipelines run to group
    * near-identical product neighborhoods before per-community work.
    * Fully deterministic, unlike textbook async LPA: labels start as own
    * ids; each of exactly 5 supersteps replaces every node's label with
    * the most frequent label among its neighbors, ties broken to the
    * SMALLEST label, all nodes updating from the PREVIOUS round's frame
    * (synchronous), so the whole trajectory replays in SQL. Symmetrized
    * edges guarantee every node has >= 1 neighbor and so survives each
    * round. At sf0.01 the 1,956-node graph settles to 142 communities
    * (largest 150) by round 5 — non-degenerate structure, verified
    * against an independent driver replay in the spec.
    *
    * 100 TB shape: label state is NODES-scale; each superstep is one
    * edges->labels equi-join, one (dst,label) count aggregate (partial-agg
    * friendly), and one per-dst argmax window — every shuffle keyed on
    * node id, output |nodes| rows. Fixed 5 supersteps bound plan depth,
    * lazily chained like PageRank's rounds (at graph scale each round's
    * frame would be checkpointed exactly as the CC rounds are).
    */
  private def communities(s: SparkSession, d: String): DataFrame = {
    val R = 5
    val base = coPurchaseEdges(s, d)
    val edges = base.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(base.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint() // consumed by all 5 supersteps
    var lab = edges.select(col("src").as("p")).distinct()
      .select(col("p"), col("p").as("lab"))
    for (_ <- 1 to R) {
      // argmax as max_by over (count, -label): partial-agg friendly on
      // both aggregation steps — no per-round sort window (a window
      // would re-sort every node's neighbor-label list each superstep;
      // max_by keeps the whole round in hash aggregates). The oracle
      // replays the same argmax with a row_number window — a DIFFERENT
      // enumeration that must agree label-for-label.
      lab = edges.join(lab, edges("src") === lab("p"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max_by(col("lab"), struct(col("c"), (-col("lab")).as("nl")))
          .as("lab"))
        .select(col("dst").as("p"), col("lab"))
    }
    lab.select(col("p").as("p_partkey"), col("lab").as("community"))
      .orderBy(col("p_partkey").asc)
  }

  /** The 5 LPA supersteps unrolled; each round's label frame feeds only
    * the next round (single reference, linear lineage) but is
    * MATERIALIZED anyway — the frequency-count + argmax subquery is
    * expensive enough that DuckDB's per-reference inlining of a plain
    * CTE would still recompute it for the planner's cardinality probe.
    */
  private def communitiesOracleSql: String = {
    val R = 5
    val sb = new StringBuilder
    sb.append(
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
        |be AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM be UNION ALL SELECT pb, pa FROM be),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS p, src AS lab FROM e)""".stripMargin)
    for (r <- 1 to R)
      sb.append(
        s""",\nl$r AS MATERIALIZED (
           |  SELECT dst AS p, lab FROM (
           |    SELECT e.dst, l.lab, count(*) AS c,
           |           row_number() OVER (PARTITION BY e.dst
           |             ORDER BY count(*) DESC, l.lab ASC) AS rn
           |    FROM e JOIN l${r - 1} l ON e.src = l.p
           |    GROUP BY e.dst, l.lab)
           |  WHERE rn = 1)""".stripMargin)
    sb.append(s"\nSELECT p AS p_partkey, lab AS community FROM l$R ORDER BY p_partkey ASC")
    sb.toString
  }

  /** LINK PREDICTION over the shared co-purchase graph — the
    * recommender-side readout beside LPA (communities) and PageRank
    * (influence): for every non-adjacent pair at distance 2, the
    * common-neighbor count and the neighbor-set Jaccard, top-20
    * predicted links. cn(u,w) = |N(u)∩N(w)| comes from ONE wedge
    * equi-join through the shared neighbor (the triangle-counting
    * shape) + a hash aggregate; existing edges drop out with an
    * anti-join; Jaccard is exact integer ppm via |N(u)∪N(w)| =
    * du+dw−cn (u,w proved non-adjacent, so no overlap correction).
    * Ranking (cn desc, jacc desc, id asc) is total — compiles to
    * TakeOrderedAndProject.
    *
    * 100 TB shape: the candidate set is wedge-bounded (Σ_v deg(v)²),
    * never |V|² — the same hub-skew exposure as triangle counting,
    * handled there by degree orientation and here by AQE skew-split on
    * the wedge join (production graphs add a degree cap on the hub
    * side); all joins are equi-joins on node keys, the degree side is
    * nodes-scale, and the k-bounded top-20 never materializes a global
    * sort.
    */
  private def linkPredict(s: SparkSession, d: String): DataFrame = {
    val base = coPurchaseEdges(s, d).localCheckpoint() // wedges×2 + anti
    val adj = base.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(base.select(col("pb").as("src"), col("pa").as("dst")))
    val deg = adj.groupBy(col("src").as("p")).agg(count(lit(1)).as("deg"))
    val cand = adj.as("x").join(adj.as("y"),
        col("x.dst") === col("y.src") && col("x.src") < col("y.dst"))
      .select(col("x.src").as("u"), col("y.dst").as("w"))
      .groupBy(col("u"), col("w")).agg(count(lit(1)).as("cn"))
    val nonEdge = cand.join(base,
      cand("u") === base("pa") && cand("w") === base("pb"), "left_anti")
    nonEdge
      .join(deg.select(col("p").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("p").as("w"), col("deg").as("dw")), Seq("w"))
      .select(col("u").as("pa"), col("w").as("pb"), col("cn"),
        col("du"), col("dw"),
        expr("(1000000 * cn) div (du + dw - cn)").as("jacc_e6"))
      .orderBy(col("cn").desc, col("jacc_e6").desc,
        col("pa").asc, col("pb").asc)
      .limit(20)
  }

  private def linkPredictOracleSql: String =
    """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
      |be AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM be UNION ALL SELECT pb, pa FROM be),
      |deg AS (SELECT src AS p, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
      |cand AS (
      |  SELECT x.src AS u, y.dst AS w, CAST(count(*) AS BIGINT) AS cn
      |  FROM e x JOIN e y ON x.dst = y.src AND x.src < y.dst
      |  GROUP BY 1, 2),
      |ne AS (
      |  SELECT u, w, cn FROM cand
      |  WHERE NOT EXISTS (SELECT 1 FROM be WHERE be.pa = cand.u AND be.pb = cand.w))
      |SELECT ne.u AS pa, ne.w AS pb, ne.cn,
      |       du.deg AS du, dw.deg AS dw,
      |       CAST((1000000 * ne.cn) // (du.deg + dw.deg - ne.cn) AS BIGINT) AS jacc_e6
      |FROM ne JOIN deg du ON du.p = ne.u JOIN deg dw ON dw.p = ne.w
      |ORDER BY cn DESC, jacc_e6 DESC, pa ASC, pb ASC LIMIT 20""".stripMargin

  /** ASSOCIATION-RULE MINING over the order/part basket (market-basket
    * analysis, the frequent-itemset surface): pair support, directional
    * confidence, and lift for co-purchased part pairs. Apriori pruning
    * order: items below the support floor are dropped BEFORE pair
    * generation (the classic candidate-explosion guard), so the
    * orderkey self-join runs over frequent items only and its output is
    * bounded by sum over orders of (frequent items per order choose 2)
    * — basket width is bounded (≤13 distinct parts here), never
    * |items|². All metrics are exact BIGINT ppm (lift via integer
    * `div`, no float division), top-20 by lift with (pa, pb) id
    * tie-breaks.
    *
    * 100 TB shape: one distinct-projection shuffle on (order, part); the
    * pair join is an equi-join on l_orderkey (co-partitioned with the
    * basket projection); the item-count joins key on partkey and the
    * total-order count rides along as a one-row crossJoin, never a
    * collect. At catalog scale the item-count side stays |items|-scale —
    * AQE picks broadcast vs shuffle.
    */
  private def assocRules(s: SparkSession, d: String): DataFrame = {
    val minItemSup = 5L
    val minPairSup = 2L
    val basket = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = basket.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCnt = basket.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minItemSup)
    val fb = basket.join(itemCnt, Seq("l_partkey"))
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = fb.as("a")
      .join(fb.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSup)
    pairs
      .join(itemCnt.select(col("l_partkey").as("pa"), col("n_item").as("n_a")), Seq("pa"))
      .join(itemCnt.select(col("l_partkey").as("pb"), col("n_item").as("n_b")), Seq("pb"))
      .crossJoin(nOrders)
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(n_ab * 1000000) div n_a").as("conf_ab_ppm"),
        expr("(n_ab * 1000000) div n_b").as("conf_ba_ppm"),
        expr("((n_ab * n_orders) * 1000000) div (n_a * n_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("pa").asc, col("pb").asc)
      .limit(20)
  }

  /** DATA-QUALITY CONSTRAINT AUDIT (the Deequ/Great-Expectations shape):
    * a declarative check suite — completeness, key uniqueness,
    * referential integrity, range and set-membership bounds — evaluated
    * in ONE conditional-aggregate pass per table plus one anti-join per
    * FK edge, emitted as (check, metric_ppm, threshold_ppm, passed)
    * rows. Every metric is an exact BIGINT ppm ratio; `passed` compares
    * against the check's own threshold so warn-tier rules coexist with
    * hard invariants (one deliberately tightened bound exercises the
    * failure path on this data).
    *
    * 100 TB shape: per-table checks fold into a single partial-agg scan
    * (the shuffle carries one row per table); RI checks are key-only
    * anti-joins (orphan side is empty on clean data, and the join
    * carries just the key column). Nothing is collected; the report is
    * a ~constant-row frame assembled by crossJoining one-row aggregates.
    */
  private def dqChecks(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val c = Tables.customer(s, d)
    val oAgg = o.agg(
      count(lit(1)).as("n_o"),
      count(col("o_custkey")).as("o_cust_nn"),
      countDistinct(col("o_orderkey")).as("o_key_nd"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("o_status_ok"),
      sum(when(col("o_totalprice") > 0, 1L).otherwise(0L)).as("o_price_ok"))
    val liAgg = li.agg(
      count(lit(1)).as("n_l"),
      sum(when(col("l_quantity") >= 1 && col("l_quantity") <= 50, 1L).otherwise(0L)).as("l_qty_ok"),
      sum(when(col("l_quantity") <= 45, 1L).otherwise(0L)).as("l_qty_tight"),
      sum(when(col("l_discount") >= 0 && col("l_discount") <= 0.1, 1L).otherwise(0L)).as("l_disc_ok"))
    val liOrphan = li.join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("l_orphans"))
    val oOrphan = o.join(c.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("o_orphans"))
    oAgg.crossJoin(liAgg).crossJoin(liOrphan).crossJoin(oOrphan)
      .select(expr(
        """stack(8,
          |  'orders.custkey_complete',   (o_cust_nn * 1000000) div n_o,            1000000,
          |  'orders.orderkey_unique',    (o_key_nd * 1000000) div n_o,             1000000,
          |  'orders.status_in_set',      (o_status_ok * 1000000) div n_o,          1000000,
          |  'orders.totalprice_positive',(o_price_ok * 1000000) div n_o,           1000000,
          |  'orders.custkey_ri',         ((n_o - o_orphans) * 1000000) div n_o,    1000000,
          |  'lineitem.orderkey_ri',      ((n_l - l_orphans) * 1000000) div n_l,    1000000,
          |  'lineitem.quantity_in_1_50', (l_qty_ok * 1000000) div n_l,             1000000,
          |  'lineitem.quantity_le_45',   (l_qty_tight * 1000000) div n_l,          1000000
          |) AS (check, metric_ppm, threshold_ppm)""".stripMargin))
      .withColumn("metric_ppm", col("metric_ppm").cast("long"))
      .withColumn("threshold_ppm", col("threshold_ppm").cast("long"))
      .withColumn("passed", col("metric_ppm") >= col("threshold_ppm"))
      .orderBy(col("check").asc)
  }

  /** KEY-DISTRIBUTION SKEW AUDIT over the event log's user_id — the
    * measurement that decides whether a shuffle needs salting BEFORE the
    * job runs (the `q_salted_join` fix, preceded by its diagnostic):
    * key count, max and top-10 key shares in exact ppm, and the
    * partitioning-theory IMBALANCE FACTOR imb = K·Σc²/T² — the expected
    * per-lookup cost ratio vs a uniform distribution (1.0 = uniform; a
    * hash-partitioned shuffle's hottest-reducer blowup grows with it).
    * Pure aggregates, NO global sort: Σc² and max(c) come from the one
    * per-key count pass, the top-10 side is a k-bounded TakeOrdered, and
    * Σc² accumulates in DECIMAL(38,0) (at 100 TB: T≈1e12 rows, K≈1e9
    * keys makes K·Σc²≈1e27 — past BIGINT, inside 38 digits; the oracle's
    * SUM(BIGINT) is already HUGEINT).
    */
  private def skewAudit(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
    val top10 = keyed.orderBy(col("c").desc, col("user_id").asc).limit(10)
      .agg(sum(col("c")).as("top10"))
    keyed.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_c"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .as("sc2"))
      .crossJoin(broadcast(top10))
      .select(col("n_keys"), col("n_rows"), col("max_c"),
        expr("(1000000 * max_c) div n_rows").as("top1_share_ppm"),
        expr("(1000000 * top10) div n_rows").as("top10_share_ppm"),
        expr("(1000000 * CAST(n_keys AS DECIMAL(19,0)) * sc2) div " +
          "(CAST(n_rows AS DECIMAL(19,0)) * CAST(n_rows AS DECIMAL(19,0)))")
          .as("imb_e6"))
  }

  /** 2-D SKYLINE (Pareto frontier) over part — minimize price, maximize
    * size: a part survives iff no other part is cheaper-or-equal AND
    * bigger-or-equal with one strict. Computed WITHOUT the quadratic
    * dominance join: group to one (price, max size) row per distinct
    * price, take a running max of size over strictly-cheaper groups
    * (rows-frame window on the price spine), then a part is dominated
    * iff the strictly-cheaper running max reaches its size (case a) or
    * its own price group holds a strictly larger size (case b). One
    * groupBy + one |distinct price|-scale window + one equi-join back.
    *
    * 100 TB shape: the window runs over the price SPINE (|distinct
    * prices|), not the fact rows; at extreme spine sizes the running
    * max falls to the same range-partitioned two-phase prefix pattern
    * the packing offsets use. Price passes through as raw parquet
    * DOUBLE bits — grouped and compared, never arithmetic — so both
    * engines see identical keys.
    */
  private def skyline(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select(col("p_partkey"),
      col("p_retailprice").as("price"), col("p_size").cast("long").as("size"))
    val g = p.groupBy(col("price")).agg(max(col("size")).as("gmax"))
    val w = Window.partitionBy(WindowUtil.onePartition(col("price")))
      .orderBy(col("price").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = g.withColumn("prevmax", max(col("gmax")).over(w))
    p.join(spine, Seq("price"))
      .filter(coalesce(col("prevmax"), lit(Long.MinValue)) < col("size") &&
        !(col("gmax") > col("size")))
      .select(col("p_partkey"), col("price"), col("size"))
      .orderBy(col("p_partkey").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assoc_rules"     -> (assocRules _),
    "q_dq_checks"       -> (dqChecks _),
    "q_skew_audit"      -> (skewAudit _),
    "q_skyline"         -> (skyline _),
    "q_shortest_path"   -> (shortestPath _),
    "q_communities"     -> (communities _),
    "q_kcore"           -> (kcore _),
    "q_link_predict"    -> (linkPredict _),
    "q_salted_join"     -> (saltedJoin _),
    "q_triangles"       -> (triangles _),
    "q1_pricing"        -> (q1Pricing _),
    "q3_top_orders"     -> (q3TopOrders _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q_topk_per_cust"   -> (topOrdersPerCustomer _),
    "q_topk_heap"       -> (topOrdersHeap _),
    "q_pagination"      -> (paginateOrders _),
    "q_anti_join"       -> (custWithoutRecentOrders _),
    "q_semi_join"       -> (partsWithBigLineitems _),
  )

  private val rev =
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"

  /** The unrolled 8-round peel replay — every per-round live set and
    * restricted edge set is MATERIALIZED (each is referenced more than
    * once; DuckDB inlines plain CTEs per reference — the 2^R trap).
    */
  private def kcoreOracleSql: String = {
    val K = 3
    val R = 8
    val sb = new StringBuilder
    sb.append("WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),\n")
    sb.append("e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),\n")
    sb.append("a0 AS MATERIALIZED (SELECT pa AS p FROM e UNION SELECT pb FROM e)")
    for (r <- 1 to R) {
      sb.append(s""",
         |er$r AS MATERIALIZED (SELECT e.pa, e.pb FROM e
         |  JOIN a${r - 1} x ON e.pa = x.p JOIN a${r - 1} y ON e.pb = y.p),
         |d$r AS (SELECT p, count(*) AS c FROM (
         |  SELECT pa AS p FROM er$r UNION ALL SELECT pb FROM er$r) t GROUP BY p),
         |a$r AS MATERIALIZED (SELECT p FROM d$r WHERE c >= $K)""".stripMargin)
    }
    val removeds = (1 to R).map(r =>
      s"SELECT p, $r AS peel_round FROM a${r - 1} WHERE p NOT IN (SELECT p FROM a$r)")
    sb.append("\nSELECT p AS p_partkey, CAST(peel_round AS INTEGER) AS peel_round, peel_round = 0 AS in_core FROM (\n")
    sb.append((removeds :+ s"SELECT p, 0 AS peel_round FROM a$R").mkString("\nUNION ALL\n"))
    sb.append("\n) t ORDER BY p_partkey ASC")
    sb.toString
  }

  /** The unrolled 8-superstep Bellman-Ford replay — every round
    * MATERIALIZED (the DuckDB plain-CTE inline trap; d0..d8 chain
    * linearly but `e` feeds all eight).
    */
  private def shortestPathOracleSql: String = {
    val R = 8
    val sb = new StringBuilder
    sb.append("WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),\n")
    sb.append("be AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),\n")
    sb.append("bw AS MATERIALIZED (SELECT pa, pb, CAST('0x' || substr(md5(CAST(pa AS VARCHAR) || ':' || CAST(pb AS VARCHAR)), 1, 15) AS BIGINT) % 9 + 1 AS w FROM be),\n")
    sb.append("nodes AS MATERIALIZED (SELECT pa AS p FROM be UNION SELECT pb FROM be),\n")
    sb.append("e AS MATERIALIZED (SELECT pa AS src, pb AS dst, w FROM bw UNION ALL SELECT pb, pa, w FROM bw UNION ALL SELECT p, p, CAST(0 AS BIGINT) FROM nodes),\n")
    sb.append("d0 AS MATERIALIZED (SELECT min(pa) AS p, CAST(0 AS BIGINT) AS dist FROM be)")
    for (r <- 1 to R)
      sb.append(s",\nd$r AS MATERIALIZED (SELECT e.dst AS p, min(d.dist + e.w) AS dist FROM e JOIN d${r - 1} d ON e.src = d.p GROUP BY 1)")
    sb.append(s"\nSELECT n.p AS p_partkey, d.dist, d.dist IS NOT NULL AS reached FROM nodes n LEFT JOIN d$R d ON d.p = n.p ORDER BY p_partkey ASC")
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "q_shortest_path" -> shortestPathOracleSql,
    "q_communities" -> communitiesOracleSql,
    "q_link_predict" -> linkPredictOracleSql,
    // q_skew_audit: one per-key count pass; SUM(BIGINT) is HUGEINT so
    // K·Σc² never overflows; top-10 via LIMIT; all positive, plain //
    "q_skew_audit" ->
      """WITH keyed AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id),
        |t10 AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS top10 FROM (
        |    SELECT c FROM keyed ORDER BY c DESC, user_id ASC LIMIT 10)),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(SUM(c) AS BIGINT) AS n_rows,
        |         CAST(MAX(c) AS BIGINT) AS max_c,
        |         SUM(c * c) AS sc2
        |  FROM keyed)
        |SELECT n_keys, n_rows, max_c,
        |       CAST((1000000 * max_c) // n_rows AS BIGINT) AS top1_share_ppm,
        |       CAST((1000000 * top10) // n_rows AS BIGINT) AS top10_share_ppm,
        |       CAST((1000000 * n_keys * sc2) // (CAST(n_rows AS HUGEINT) * n_rows) AS BIGINT) AS imb_e6
        |FROM a, t10""".stripMargin,
    "q_assoc_rules" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
        |ic AS MATERIALIZED (
        |  SELECT l_partkey, count(*) AS n_item FROM b
        |  GROUP BY 1 HAVING count(*) >= 5),
        |fb AS MATERIALIZED (
        |  SELECT b.l_orderkey, b.l_partkey FROM b JOIN ic USING (l_partkey)),
        |p AS (
        |  SELECT a.l_partkey AS pa, c.l_partkey AS pb, count(*) AS n_ab
        |  FROM fb a JOIN fb c
        |    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        |       (n_ab * 1000000) // ia.n_item AS conf_ab_ppm,
        |       (n_ab * 1000000) // ib.n_item AS conf_ba_ppm,
        |       ((n_ab * n_orders) * 1000000) // (ia.n_item * ib.n_item) AS lift_ppm
        |FROM p JOIN ic ia ON ia.l_partkey = p.pa
        |       JOIN ic ib ON ib.l_partkey = p.pb CROSS JOIN n
        |ORDER BY lift_ppm DESC, pa ASC, pb ASC LIMIT 20""".stripMargin,
    "q_dq_checks" ->
      """WITH oa AS (
        |  SELECT count(*) AS n_o,
        |         count(o_custkey) AS o_cust_nn,
        |         count(DISTINCT o_orderkey) AS o_key_nd,
        |         coalesce(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END), 0) AS o_status_ok,
        |         coalesce(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END), 0) AS o_price_ok
        |  FROM orders),
        |la AS (
        |  SELECT count(*) AS n_l,
        |         coalesce(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END), 0) AS l_qty_ok,
        |         coalesce(SUM(CASE WHEN l_quantity <= 45 THEN 1 ELSE 0 END), 0) AS l_qty_tight,
        |         coalesce(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1 ELSE 0 END), 0) AS l_disc_ok
        |  FROM lineitem),
        |lo AS (SELECT count(*) AS l_orphans FROM lineitem
        |       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |oo AS (SELECT count(*) AS o_orphans FROM orders
        |       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |rows_("check", metric_ppm, threshold_ppm) AS (
        |  SELECT 'orders.custkey_complete',    (o_cust_nn * 1000000) // n_o,         1000000 FROM oa
        |  UNION ALL SELECT 'orders.orderkey_unique', (o_key_nd * 1000000) // n_o,    1000000 FROM oa
        |  UNION ALL SELECT 'orders.status_in_set', (o_status_ok * 1000000) // n_o,   1000000 FROM oa
        |  UNION ALL SELECT 'orders.totalprice_positive', (o_price_ok * 1000000) // n_o, 1000000 FROM oa
        |  UNION ALL SELECT 'orders.custkey_ri', ((n_o - o_orphans) * 1000000) // n_o, 1000000 FROM oa, oo
        |  UNION ALL SELECT 'lineitem.orderkey_ri', ((n_l - l_orphans) * 1000000) // n_l, 1000000 FROM la, lo
        |  UNION ALL SELECT 'lineitem.quantity_in_1_50', (l_qty_ok * 1000000) // n_l, 1000000 FROM la
        |  UNION ALL SELECT 'lineitem.quantity_le_45', (l_qty_tight * 1000000) // n_l, 1000000 FROM la)
        |SELECT "check", CAST(metric_ppm AS BIGINT) AS metric_ppm,
        |       CAST(threshold_ppm AS BIGINT) AS threshold_ppm,
        |       metric_ppm >= threshold_ppm AS passed
        |FROM rows_ ORDER BY "check" ASC""".stripMargin,
    "q_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, p_retailprice AS price, CAST(p_size AS BIGINT) AS size
        |  FROM part),
        |g AS (SELECT price, max(size) AS gmax FROM p GROUP BY 1),
        |g2 AS (
        |  SELECT price, gmax,
        |         max(gmax) OVER (ORDER BY price ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM g)
        |SELECT p.p_partkey, p.price, p.size
        |FROM p JOIN g2 USING (price)
        |WHERE coalesce(prevmax, -9223372036854775807 - 1) < size
        |  AND NOT (gmax > size)
        |ORDER BY p_partkey ASC""".stripMargin,
    "q_kcore" -> kcoreOracleSql,
    "q_salted_join" ->
      """WITH dim(event_type, weight) AS (
        |  VALUES ('click', 1), ('view', 2), ('purchase', 5), ('signup', 10))
        |SELECT e.event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6)) * weight) AS DOUBLE) AS weighted
        |FROM events e JOIN dim USING (event_type)
        |GROUP BY e.event_type ORDER BY event_type ASC""".stripMargin,
    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
        |           FROM lineitem WHERE l_quantity >= 40),
        |e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT p, CAST(count(*) AS BIGINT) AS degree
        |        FROM (SELECT pa AS p FROM e UNION ALL SELECT pb FROM e) t
        |        GROUP BY p),
        |tri AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
        |        FROM e e1 JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
        |                  JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
        |corner AS (SELECT x AS p FROM tri UNION ALL SELECT y FROM tri
        |           UNION ALL SELECT z FROM tri),
        |tc AS (SELECT p, CAST(count(*) AS BIGINT) AS n_tri
        |       FROM corner GROUP BY p)
        |SELECT deg.p AS p_partkey, degree, COALESCE(n_tri, 0) AS n_tri,
        |       CASE WHEN degree >= 2
        |            THEN (2000000 * COALESCE(n_tri, 0)) // (degree * (degree - 1))
        |            ELSE 0 END AS cc6
        |FROM deg LEFT JOIN tc ON tc.p = deg.p
        |ORDER BY p_partkey ASC""".stripMargin,
    "q1_pricing" ->
      s"""WITH base AS (
         |  SELECT l_returnflag, l_linestatus,
         |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sum_base_price,
         |    CAST($rev AS DOUBLE) AS sum_disc_price,
         |    COUNT(*) AS count_order
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |  GROUP BY l_returnflag, l_linestatus)
         |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price, count_order,
         |       ${rndSql("sum_qty / count_order", 6)} AS avg_qty,
         |       ${rndSql("sum_base_price / count_order", 6)} AS avg_price
         |FROM base ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      s"""SELECT l_orderkey, ${rndSql(s"CAST($rev AS DOUBLE)", 4)} AS revenue, o_orderdate, o_orderpriority
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      s"""SELECT n_name, ${rndSql(s"CAST($rev AS DOUBLE)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_topk_per_cust" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 AND o_custkey <= 50
        |ORDER BY o_custkey ASC, rn ASC""".stripMargin,
    "q_topk_heap" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 AND o_custkey <= 50
        |ORDER BY o_custkey ASC, rn ASC""".stripMargin,
    "q_pagination" ->
      """SELECT rn, o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn > 100 AND rn <= 120 ORDER BY rn ASC""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 49)
        |ORDER BY p_partkey ASC""".stripMargin,
  )
}
