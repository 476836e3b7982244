package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60
import graft.queries.Det.{rnd, rndSql}

/** Sketch / OLAP-surface coverage: approximate distinct counting (a
  * DETERMINISTIC HyperLogLog whose md5 register assignment both engines
  * recompute bit-identically — the oracle-able formulation of
  * `approx_count_distinct`), exact interpolated percentiles, GROUPING
  * SETS, pivot, and the window-function family.
  *
  * The reference has no aggregation surface at all (SURVEY §2.4: "grouping
  * sets / cube / rollup / distinct-agg / HLL absent") — these are the
  * canonical analytics-engine extensions the 100 TB pipeline needs.
  */
object SketchQueries {

  /** Deterministic HyperLogLog CORE, m = 64 registers (p = 6) — ONE copy
    * of the sketch arithmetic shared by the global and per-group
    * entries (and mirrored by the one [[hllOracleSql]] template, so
    * Spark and DuckDB cannot drift on just one of them):
    * register = low 6 bits of the 60-bit md5 hash, rho = position of
    * the lowest set bit of the remaining 54 bits (a geometric variable,
    * same distribution as leading-zero HLL), estimate =
    * alpha_64 * m^2 / Z. Z is accumulated as an exact INTEGER
    * (2^(55-rho) per register, max 64 * 2^55 < 2^62) so the only
    * floating-point step is the final fixed-order division —
    * reproducible on any engine, unlike `approx_count_distinct`'s
    * engine-private HLL++ registers. `keys` empty = one global sketch;
    * otherwise one mergeable sketch per key (the GROUP BY form — every
    * partial merge is a max, associative and partitioning-independent).
    * At scale: one shuffle of (keys x 64) register rows.
    */
  private def hllRegisters(hashed: DataFrame, keys: Seq[String]): DataFrame =
    hllZ(hllRegisterRows(hashed, keys), keys)

  /** The materialized per-(keys, register) max-rho rows — the SKETCH
    * itself, exposed so [[hllMerge]] can merge sketches register-wise
    * without re-reading the hashed input.
    */
  private def hllRegisterRows(hashed: DataFrame, keys: Seq[String]): DataFrame = {
    val regs = hashed.select(keys.map(col) ++ Seq(
      (col("h") % 64).cast("int").as("reg"), expr("h div 64").as("w")): _*)
    val rho = when(col("w") === 0, lit(55)).otherwise(
      log2(col("w").bitwiseAND(-col("w"))).cast("int") + 1)
    regs.select(keys.map(col) ++ Seq(col("reg"), rho.as("rho")): _*)
      .groupBy((keys :+ "reg").map(col): _*).agg(max(col("rho")).as("mrho"))
  }

  private def hllZ(regRows: DataFrame, keys: Seq[String]): DataFrame =
    regRows.groupBy(keys.map(col): _*).agg(
      sum(call_function("shiftleft", lit(1L), lit(55) - col("mrho")))
        .cast("long").as("zp"),
      count(lit(1)).as("npresent"))

  private def hllEstimate: org.apache.spark.sql.Column = hllEstimateAs("hll_estimate")
  private def hllEstimateAs(name: String): org.apache.spark.sql.Column =
    rnd(lit(0.709) * lit(4096.0) * pow(lit(2.0), lit(55.0)) /
      (col("zp") + (lit(64L) - col("npresent")) * lit(1L << 55)).cast("double"),
      4).as(name)

  /** SKETCH MERGEABILITY — the property that makes sketches the 100 TB
    * answer to distinct-counting: per-nation HLL sketches are built
    * independently, then every REGION estimate comes from a
    * register-wise max over its nations' sketches — the raw rows are
    * never re-read. The entry emits the merged estimate NEXT TO the
    * directly-built region sketch and the exact count; merged == direct
    * is the mergeability identity (register max is associative), and
    * the oracle replays both paths. At scale the merge input is
    * |groups| x 64 rows, whatever the fact-table size.
    */
  private def hllMerge(s: SparkSession, d: String): DataFrame = {
    val src = Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey").as("regionkey"),
        col("n_nationkey").as("nationkey"), col("c_custkey").as("k"))
    val hashed = src.select(col("regionkey"), col("nationkey"),
      hash60(col("k").cast("string")).as("h"))
    val nationRegs = hllRegisterRows(hashed, Seq("regionkey", "nationkey"))
    val merged = hllZ(nationRegs.groupBy(col("regionkey"), col("reg"))
        .agg(max(col("mrho")).as("mrho")), Seq("regionkey"))
      .select(col("regionkey"), hllEstimateAs("est_merged"))
    val direct = hllZ(hllRegisterRows(hashed.select(col("regionkey"), col("h")),
        Seq("regionkey")), Seq("regionkey"))
      .select(col("regionkey"), hllEstimateAs("est_direct"))
    val exact = src.groupBy(col("regionkey"))
      .agg(countDistinct(col("k")).as("n_exact"))
    exact.join(direct, Seq("regionkey")).join(merged, Seq("regionkey"))
      .select(col("regionkey"), col("n_exact"),
        col("est_direct"), col("est_merged"))
      .orderBy(col("regionkey").asc)
  }

  /** RUNNING CUMULATIVE-DISTINCT CURVE from the HLL sketch — "distinct
    * users to date, per day", the growth metric every corpus/user
    * dashboard needs, WITHOUT ever re-scanning history: per-day
    * sketches (the same md5 register core) become the cumulative
    * sketch at day d by a running register-wise max over the day
    * spine — mergeability applied along TIME instead of across groups
    * (`q_hll_merge`). The exact cumulative count rides beside the
    * estimate (first-seen-day counts, one running sum), so the
    * estimator error is visible per day.
    *
    * 100 TB shape: the heavy input collapses to |days| x 64 register
    * rows at the first aggregate; the spine cross join, running-max
    * window (partitioned BY REGISTER, |days| rows each) and the
    * per-day Z fold all run on that metadata-scale frame. The
    * first-seen exact side is one user-keyed agg + a |days|-scale
    * running sum.
    */
  private def hllRunning(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
    val regRows = hllRegisterRows(
      ev.select(col("day"), hash60(col("user_id").cast("string")).as("h")),
      Seq("day"))
    val days = ev.select(col("day")).distinct()
    val spine = days.crossJoin(
      s.range(64).select(col("id").cast("int").as("reg")))
    val wreg = W.partitionBy(col("reg")).orderBy(col("day").asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val z = spine.join(regRows, Seq("day", "reg"), "left")
      .withColumn("runm", max(col("mrho")).over(wreg))
      .filter(col("runm").isNotNull)
      .groupBy(col("day")).agg(
        sum(call_function("shiftleft", lit(1L), lit(55) - col("runm")))
          .cast("long").as("zp"),
        count(lit(1)).as("npresent"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("nnew"))
    val wday = W.partitionBy(WindowUtil.onePartition(col("day")))
      .orderBy(col("day").asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    days.join(firstSeen, Seq("day"), "left")
      .withColumn("n_exact_cum",
        sum(coalesce(col("nnew"), lit(0L))).over(wday))
      .join(z, Seq("day"))
      .select(col("day"), col("n_exact_cum"), hllEstimateAs("est_cum"))
      .orderBy(col("day").asc)
  }

  private def hllCustkey(s: SparkSession, d: String): DataFrame = {
    val z = hllRegisters(Tables.orders(s, d)
      .select(hash60(col("o_custkey").cast("string")).as("h")), Nil)
    val exact = Tables.orders(s, d)
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    exact.crossJoin(z).select(col("n_exact"), hllEstimate)
  }

  /** PER-GROUP deterministic HLL — the GROUP BY form of [[hllCustkey]]
    * via the shared [[hllRegisters]] core. Both the sketch input and the
    * exact count read ONE distinct (flag, partkey) projection — HLL over
    * a multiset equals HLL over its distinct keys (registers are maxes),
    * so the two consumers share a canonically identical distinct subtree
    * (AQE exchange reuse can then serve both from one scan + shuffle; at
    * worst the duplicated work is a 2-column pruned scan + distinct,
    * never a second pass over the full fact row).
    */
  private def hllByFlag(s: SparkSession, d: String): DataFrame = {
    val distinctKeys = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
    val z = hllRegisters(distinctKeys.select(col("l_returnflag"),
      hash60(col("l_partkey").cast("string")).as("h")), Seq("l_returnflag"))
    val exact = distinctKeys.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_exact"))
    exact.join(z, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_exact"), hllEstimate)
      .orderBy(col("l_returnflag").asc)
  }

  /** TABLE PROFILER — the ANALYZE-equivalent every warehouse runs before
    * planning over a new dataset: per-column row/null counts,
    * lexicographic min/max of the canonical string form, and an
    * HLL distinct estimate, all computed by STACKING the profiled
    * columns into (colname, value) rows so one job covers every column
    * (k-column amplification of a pruned scan — the standard stack-based
    * profiler tradeoff; output is k rows whatever the table size).
    * Distinct counting reuses the deterministic HLL core keyed by
    * colname.
    */
  private def profile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_returnflag")
    val stacked = Tables.lineitem(s, d)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("colname"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.colname").as("colname"), col("s.v").as("v"))
    val base = stacked.groupBy(col("colname")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      min(col("v")).as("min_s"), max(col("v")).as("max_s"))
    val dist = hllRegisters(stacked.filter(col("v").isNotNull)
        .select(col("colname"), hash60(col("v")).as("h")), Seq("colname"))
      .select(col("colname"), hllEstimateAs("n_distinct_est"))
    base.join(dist, Seq("colname")).orderBy(col("colname").asc)
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`: pos = q*(n-1), linear interpolation).
    */
  private def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))")
        .as("ps"))
      .select(col("l_returnflag"),
        rnd(element_at(col("ps"), 1), 4).as("p25"),
        rnd(element_at(col("ps"), 2), 4).as("p50"),
        rnd(element_at(col("ps"), 3), 4).as("p75"),
        rnd(element_at(col("ps"), 4), 4).as("p95"))
      .orderBy(col("l_returnflag").asc)

  /** GROUPING SETS with grouping() markers (finer than cube/rollup: an
    * explicit lattice subset).
    */
  private def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS INT) AS g_status,
        |       count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_flag ASC, g_status ASC,
        |         l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        |""".stripMargin)
  }

  /** Pivot: wide per-category sums (decimal-exact, so column values are
    * order-independent).
    */
  private def pivotQty(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity").cast("decimal(28,8)")).cast("double"))
      .orderBy(col("l_linestatus").asc)

  /** The window-function family over a partitioned+ordered frame:
    * lag/lead, rank/dense_rank/row_number, ntile, percent_rank/cume_dist.
    */
  private def windowSuite(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,4)").cast("double").as("price"))
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("next_price", lead(col("price"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
          .orderBy(col("price").desc)))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", rnd(percent_rank().over(w), 6))
      .withColumn("cume", rnd(cume_dist().over(w), 6))
      .drop("o_orderdate")
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** Deterministic Bloom filter (m = 65536 bits, 3 md5-derived 16-bit
    * probe positions): build over BUILDING-segment customer keys, probe
    * every order's custkey, report probe/pass/true-member counts. The
    * 100 TB use is semi-join pruning: broadcast the 8 KB bit set to the
    * fact scan instead of shuffling the fact table against the dim —
    * passes (incl. the counted false positives) are then exact-checked.
    * Every position is integer md5 arithmetic, so DuckDB rebuilds the
    * identical filter.
    */
  private def bloomProbe(s: SparkSession, d: String): DataFrame = {
    def positions(h: org.apache.spark.sql.Column) = array(
      h.bitwiseAND(lit(65535L)).cast("int"),
      shiftright(h, 16).bitwiseAND(lit(65535L)).cast("int"),
      shiftright(h, 32).bitwiseAND(lit(65535L)).cast("int"))
    val build = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), hash60(col("c_custkey").cast("string")).as("h"))
    val bloomPos = build.select(explode(positions(col("h"))).as("pos")).distinct()
    val probe = Tables.orders(s, d).select(col("o_custkey")).distinct()
      .select(col("o_custkey"), hash60(col("o_custkey").cast("string")).as("h"))
    val probePos = probe.select(col("o_custkey"),
      explode(positions(col("h"))).as("pos"))
    // ONE linear pipeline (r10): the previous crossJoin of three 1-row
    // aggregates re-evaluated the `probe` subtree (orders scan + distinct
    // shuffle) THREE times in one plan — at 100 TB that is two wasted
    // fact scans. Now: per-position membership as a broadcast LEFT join
    // (so zero-hit keys survive with nhit=0 — multiplicity of duplicate
    // positions preserved exactly as the inner-join count did), one agg
    // per custkey, one broadcast LEFT join to the dim for true
    // membership, one final 1-row agg. Same three counts, one scan.
    probePos
      .join(broadcast(bloomPos.withColumn("m", lit(1L))), Seq("pos"), "left_outer")
      .groupBy(col("o_custkey"))
      .agg(sum(coalesce(col("m"), lit(0L))).as("nhit"))
      .join(broadcast(build.select(col("c_custkey").as("o_custkey"),
        lit(1L).as("t"))), Seq("o_custkey"), "left_outer")
      .agg(count(lit(1)).as("n_probed"),
        sum(when(col("nhit") === 3, 1L).otherwise(0L)).cast("long").as("n_bloom_pass"),
        sum(when(col("t").isNotNull, 1L).otherwise(0L)).cast("long").as("n_true"))
  }

  /** Deterministic 10% Bernoulli sample -> decimal-exact aggregate: the
    * portable sampling pattern (md5 of the row key, not engine-private
    * TABLESAMPLE randomness), so the oracle draws the identical sample.
    */
  /** APPROXIMATE percentiles from a fixed-width histogram — the
    * sketch-family answer to quantiles at 100 TB: one map-side-combined
    * aggregation over ~1k bins (vs the exact path's full sort), then the
    * quantile is read off the cumulative bin counts. Deterministic by
    * construction (integer thresholds ceil(p*n/100) computed in integer
    * arithmetic, bin lower bound as the estimate), so DuckDB replays it
    * exactly — unlike t-digest/KLL whose merge order is engine-private.
    * Estimate error is bounded by the bin width (100 here).
    */
  private def approxQuantile(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.lineitem(s, d)
      .select(floor(col("l_extendedprice") / 100.0).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(WindowUtil.onePartition(col("bin"))) // ~1k bins, bounded
      .orderBy(col("bin").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = bins.withColumn("cum", sum(col("c")).over(w))
    val total = bins.agg(sum(col("c")).cast("long").as("n"))
    val ps = { import s.implicits._; Seq(50, 95, 99).toDF("p") }
    // ONE plan for all percentiles: every (bin, p) pair past its
    // threshold, then min(bin) per p — the histogram aggregates once, not
    // once per percentile. Threshold uses integer `div`, matching the
    // oracle's `//` (Spark's `/` would promote to double and shift it).
    cum.crossJoin(broadcast(total)).crossJoin(broadcast(ps))
      .filter(col("cum") >= expr("(n * p + 99) div 100"))
      .groupBy(col("p"))
      .agg(min(col("bin")).as("min_bin"))
      .select(col("p"), (col("min_bin") * 100).cast("double").as("approx_value"))
      .orderBy(col("p").asc)
  }

  private def sampleAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(hash60(concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))) % 100 < 10)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,8)")).cast("double").as("sample_revenue"))
      .orderBy(col("l_returnflag").asc)

  /** COUNT-MIN SKETCH heavy hitters over the corpus token stream — the
    * fourth sketch family (after HLL, Bloom, histogram-quantile): depth
    * 4 x width 32 cells (width deliberately SMALLER than this corpus's
    * ~40-token vocabulary so row collisions actually occur and the min
    * across rows visibly estimates), row hashes = md5 of "r:token",
    * estimate = min over rows of the probed cell, reported against the
    * exact count for the exact top-20 tokens (CMS guarantees
    * est >= exact; the overestimate column shows the collision error).
    *
    * The 100 TB shape: the sketch is built from the (token, count)
    * aggregation — map-side-combined, the same single shuffle any token
    * stat pays — then folded to DEPTH x WIDTH = 128 cells; summing
    * counts per cell is exactly the streaming CMS total, and the ~1 KB
    * cell table broadcasts to wherever point estimates are needed (a
    * production width is thousands — the constant is the demo knob).
    * Deterministic md5 arithmetic end to end, so DuckDB rebuilds the
    * identical sketch (unlike engine-private CMS implementations).
    */
  private val CmsDepth = 4
  private val CmsWidth = 32
  private def cmsTopk(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    def bucket(r: Int, tok: org.apache.spark.sql.Column) =
      hash60(concat(lit(r.toString), lit(":"), tok)) % CmsWidth
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val cells = counts
      .select(explode(array((0 until CmsDepth).map(r =>
        struct(lit(r).as("r"), bucket(r, col("token")).as("b"),
          col("c"))): _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.b").as("b"))
      .agg(sum(col("e.c")).as("cell"))
    val top = counts.orderBy(col("c").desc, col("token").asc).limit(20)
    top
      .select(col("token"), col("c"),
        explode(array((0 until CmsDepth).map(r =>
          struct(lit(r).as("r"), bucket(r, col("token")).as("b"))): _*)).as("p"))
      .join(broadcast(cells),
        col("p.r") === col("r") && col("p.b") === col("b"))
      .groupBy(col("token"), col("c"))
      .agg(min(col("cell")).cast("long").as("c_cms"))
      .select(col("token"), col("c").cast("long").as("c_exact"), col("c_cms"))
      .orderBy(col("c_exact").desc, col("token").asc)
  }

  /** Unpivot/melt: wide per-flag measures back to long (measure, value)
    * rows — `Dataset.unpivot` (Spark's melt), the inverse of q_pivot.
    */
  private def unpivotQty(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(28,8)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(28,8)")).cast("double")
          .as("sum_price"),
        count(lit(1)).cast("double").as("n_items"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_items")),
        "measure", "value")
      .orderBy(col("l_returnflag").asc, col("measure").asc)
  }

  /** KMV (k-minimum-values) distinct sketch — the ORDER-STATISTICS
    * estimator next to the bit-pattern HLL family: keep the k smallest
    * 40-bit hashes per group; estimate = (k-1) * 2^40 div h_(k) (the
    * classic KMV/bottom-k estimator), exact count when the group holds
    * fewer than k values. Two properties the entry proves end-to-end:
    * (1) BOUNDED partial aggregation — per-nation sketches fold through
    * the k-bounded TopKByScore typed Aggregator (score = -h), so the map
    * side ships at most k rows per nation whatever the table size, the
    * same shape every distributed sketch needs; (2) EXACT mergeability —
    * the region sketch built by merging nation sketches (flatten the
    * <= |nations| x k candidate values, keep the k smallest) is
    * IDENTICAL to the sketch built directly from the region's rows,
    * because any region-level bottom-k value is necessarily inside its
    * nation's bottom-k. Both paths are emitted and hash-checked, so the
    * merge law is verified, not asserted. 40-bit hash space (hash60 div
    * 2^20) keeps (k-1) * 2^40 inside a BIGINT on both engines.
    */
  private val KmvK = 16
  private val KmvSpace = 1L << 40

  private def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey").cast("long").as("regionkey"),
        col("n_nationkey").cast("long").as("nationkey"),
        col("c_custkey").as("k"))
    val hashed = src
      .select(col("regionkey"), col("nationkey"),
        hash60(col("k").cast("string")).as("h60"))
      .select(col("regionkey"), col("nationkey"),
        expr("h60 div 1048576").as("h40"))
      .localCheckpoint() // one scan feeds the nation and direct paths
    // caller must have the sketch array bound as column `ks` (h asc)
    def estCols = Seq(
      size(col("ks")).cast("long").as("n_sketch"),
      when(size(col("ks")) < KmvK, size(col("ks")).cast("long"))
        .otherwise(expr(
          s"${(KmvK - 1) * KmvSpace}L div greatest(element_at(ks, $KmvK), 1L)"))
        .cast("long").as("est"))
    // nation sketches: k-bounded partial agg (TopKByScore, score = -h)
    val nationSk = hashed
      .select(col("nationkey").as("gk"), col("h40").as("id"),
        (-col("h40")).cast("double").as("sc"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(graft.functions.TopKAggregator.topK(KmvK).toColumn)
      .toDF("nationkey", "hits")
      .select(col("nationkey"),
        transform(col("hits"), x => x.getField("_2")).as("ks")) // h asc
    val nkey = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("nationkey"),
        col("n_regionkey").cast("long").as("regionkey"))
    // merged region sketch: k smallest of the <= |nations| x k candidates
    val merged = nationSk.join(broadcast(nkey), Seq("nationkey"))
      .groupBy(col("regionkey"))
      .agg(slice(array_sort(flatten(collect_list(col("ks")))), 1, KmvK)
        .as("ks"))
      .select(col("regionkey") +: estCols: _*)
      .withColumnRenamed("est", "est_merged").drop("n_sketch")
    // direct region sketch: same bounded aggregator keyed by region
    val direct = hashed
      .select(col("regionkey").as("gk"), col("h40").as("id"),
        (-col("h40")).cast("double").as("sc"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(graft.functions.TopKAggregator.topK(KmvK).toColumn)
      .toDF("regionkey", "hits")
      .select(col("regionkey"),
        transform(col("hits"), x => x.getField("_2")).as("ks"))
      .select(col("regionkey") +: estCols: _*)
      .withColumnRenamed("est", "est_direct")
    val exact = src.groupBy(col("regionkey"))
      .agg(countDistinct(col("k")).as("n_exact"))
    exact.join(direct, Seq("regionkey")).join(merged, Seq("regionkey"))
      .select(col("regionkey"), col("n_exact"), col("n_sketch"),
        col("est_direct"), col("est_merged"))
      .orderBy(col("regionkey").asc)
  }

  /** RUNTIME-FILTER (bloom-pruned) JOIN — the explicit, deterministic
    * form of the semi-join pushdown Spark's
    * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects: the
    * build side's keys become a 65536-bit / 3-hash bloom bitmap (1024
    * longs, 8 KiB — driver state bounded by the FILTER size, never the
    * data; positions come from the same md5 scheme as `q_bloom_probe`),
    * the bitmap rides into the generated code as ONE reference object
    * (`BloomMayContain`, addReferenceObj — a typedLit variant was
    * measured stringifying the 8 KiB array six times into the plan
    * text), and the fact scan drops non-matching rows with three
    * pure-arithmetic bit tests BEFORE any exchange — at 100 TB this is the difference between
    * shuffling the whole fact table into the join and shuffling only the
    * ~|dim-matching| rows (plus a bounded false-positive trickle). The
    * exact join then removes false positives, so the result is PROVABLY
    * the plain join — the oracle doesn't model the bloom at all, and any
    * pruning error (a bit mis-set, a hash drifted) surfaces as a
    * hash-red row. Money exact as floored e4-unit BIGINTs per item.
    */
  private def bloomJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val positions = dim
      .select(hash60(col("c_custkey").cast("string")).as("h"))
      .select(explode(array(
        col("h").bitwiseAND(lit(65535L)).cast("int"),
        shiftright(col("h"), 16).bitwiseAND(lit(65535L)).cast("int"),
        shiftright(col("h"), 32).bitwiseAND(lit(65535L)).cast("int")))
        .as("pos"))
      .distinct().collect().map(_.getInt(0)) // <= 65536 ints: filter-scale
    val bitmap = new Array[Long](1024)
    positions.foreach(p => bitmap(p >> 6) |= (1L << (p & 63)))
    val fact = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_totalprice"))
      .withColumn("h", hash60(col("o_custkey").cast("string")))
    val pruned = fact.filter(
      graft.functions.SetExpressions.bloomMayContain(col("h"), bitmap))
    pruned.join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 as bigint)"))
          .cast("long").as("total_e4"))
      .orderBy(col("c_custkey").asc)
  }

  /** THETA-SKETCH set algebra from bottom-k sketches — the capability
    * that makes KMV more than a distinct counter: estimate the
    * INTERSECTION and UNION of two huge sets from two k-row sketches
    * without ever joining the raw sets ("how many customers do these
    * two segments share" from 64 rows a side, whatever the table size).
    * The two sides are exactly `q_intersect`'s segments (BUILDING vs
    * acctbal > 5000), so the suite holds the exact answer next to the
    * estimate. Rule: theta = min of the per-side thresholds (k-th
    * smallest 40-bit hash, or the full space when a side holds < k);
    * rows surviving below theta are a uniform sample of the union, so
    * est = count * 2^40 div theta, exact integers end to end. Per side
    * the sketch is TakeOrderedAndProject (k-bounded, no global sort) —
    * at scale each side ships 64 rows to a driver-free 64x64 join.
    */
  private def kmvIntersect(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val M = KmvSpace
    def side(df: DataFrame) = df
      .select(hash60(col("c_custkey").cast("string")).as("h60"))
      .select(expr("h60 div 1048576").as("h"))
      .orderBy(col("h").asc).limit(k)
    val cust = Tables.customer(s, d)
    val aSet = cust.filter(col("c_mktsegment") === "BUILDING")
    val bSet = cust.filter(col("c_acctbal") > 5000)
    val skA = side(aSet).localCheckpoint()
    val skB = side(bSet).localCheckpoint()
    def theta(sk: DataFrame) = sk.agg(
      when(count(lit(1)) === k, max(col("h")) + 1)
        .otherwise(lit(M)).as("th"))
    val th = theta(skA).crossJoin(theta(skB).withColumnRenamed("th", "th2"))
      .select(least(col("th"), col("th2")).as("theta"))
    val interCnt = skA.join(skB, Seq("h")).crossJoin(broadcast(th))
      .filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_si"))
    val unionCnt = skA.unionAll(skB).distinct().crossJoin(broadcast(th))
      .filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_su"))
    val exact = aSet.select(col("c_custkey")).agg(count(lit(1)).as("n_a"))
      .crossJoin(bSet.select(col("c_custkey")).agg(count(lit(1)).as("n_b")))
      .crossJoin(aSet.select(col("c_custkey"))
        .join(bSet.select(col("c_custkey")), Seq("c_custkey"))
        .agg(count(lit(1)).as("n_inter")))
    exact.crossJoin(broadcast(th)).crossJoin(broadcast(interCnt))
      .crossJoin(broadcast(unionCnt))
      .select(col("n_a"), col("n_b"), col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"),
        col("n_si"), col("n_su"), col("theta"),
        expr(s"(n_si * ${M}L) div theta").as("est_inter"),
        expr(s"(n_su * ${M}L) div theta").as("est_union"),
        expr("CASE WHEN n_su = 0 THEN CAST(0 AS BIGINT) ELSE (n_si * 1000000) div n_su END")
          .as("est_j_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv_intersect"  -> (kmvIntersect _),
    "q_bloom_join"     -> (bloomJoin _),
    "q_kmv_distinct"   -> (kmvDistinct _),
    "q_unpivot"        -> (unpivotQty _),
    "q_hll_custkey"    -> (hllCustkey _),
    "q_percentiles"    -> (percentiles _),
    "q_grouping_sets"  -> (groupingSets _),
    "q_pivot"          -> (pivotQty _),
    "sql_window_suite" -> (windowSuite _),
    "q_bloom_probe"    -> (bloomProbe _),
    "q_sample_agg"     -> (sampleAgg _),
    "q_approx_quantile" -> (approxQuantile _),
    "q_cms_topk"       -> (cmsTopk _),
    "q_hll_by_flag"    -> (hllByFlag _),
    "q_hll_merge"      -> (hllMerge _),
    "q_hll_running"    -> (hllRunning _),
    "q_profile"        -> (profile _),
  )

  /** ONE DuckDB template for every deterministic-HLL oracle — the SQL
    * mirror of [[hllRegisters]]/[[hllEstimate]]. `keys` empty = global
    * sketch (scalar cross join, no ORDER BY); otherwise one sketch per
    * key joined to the exact per-key count. Keeping a single copy of
    * the register/rho/estimate arithmetic on EACH engine is what stops
    * a future constant tweak from silently desyncing exactly one of
    * the HLL entries.
    */
  private def hllOracleSql(table: String, hashKey: String,
      keys: Seq[String]): String = {
    val kPfx = keys.map(k => s"$k, ").mkString       // "k1, k2, " or ""
    val kGrp = if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
    val joinTail =
      if (keys.isEmpty) "FROM e, z"
      else s"FROM e JOIN z USING (${keys.mkString(", ")})" +
        s"\nORDER BY ${keys.map(_ + " ASC").mkString(", ")}"
    s"""WITH h AS (
       |  SELECT ${kPfx}CAST('0x' || substr(md5(CAST($hashKey AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM $table),
       |r AS (SELECT ${kPfx}h % 64 AS reg, h // 64 AS w FROM h),
       |rr AS (SELECT ${kPfx}reg,
       |         CASE WHEN w = 0 THEN 55
       |              ELSE CAST(log2(w & (-w)) AS INT) + 1 END AS rho FROM r),
       |m AS (SELECT ${kPfx}reg, MAX(rho) AS mrho FROM rr GROUP BY ${kPfx}reg),
       |z AS (SELECT ${kPfx}CAST(SUM(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS zp,
       |             COUNT(*) AS npresent FROM m$kGrp),
       |e AS (SELECT ${kPfx}COUNT(DISTINCT $hashKey) AS n_exact FROM $table$kGrp)
       |SELECT ${kPfx}n_exact,
       |       ${rndSql("0.709 * 4096.0 * POWER(2.0, 55.0) / CAST(zp + (64 - npresent) * (CAST(1 AS BIGINT) << 55) AS DOUBLE)", 4)} AS hll_estimate
       |$joinTail""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // q_kmv_intersect: both sketches, the theta rule, and the exact
    // sides replayed; 1099511627776 = 2^40
    "q_kmv_intersect" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |ha AS (SELECT CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
        |         // 1048576 AS h FROM a),
        |hb AS (SELECT CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
        |         // 1048576 AS h FROM b),
        |ska AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h ASC) AS rn
        |                       FROM ha) t WHERE rn <= 64),
        |skb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h ASC) AS rn
        |                       FROM hb) t WHERE rn <= 64),
        |tha AS (SELECT CASE WHEN count(*) = 64 THEN max(h) + 1
        |               ELSE 1099511627776 END AS th FROM ska),
        |thb AS (SELECT CASE WHEN count(*) = 64 THEN max(h) + 1
        |               ELSE 1099511627776 END AS th FROM skb),
        |th AS (SELECT least(tha.th, thb.th) AS theta FROM tha, thb),
        |si AS (SELECT CAST(count(*) AS BIGINT) AS n_si
        |       FROM ska JOIN skb USING (h), th WHERE h < theta),
        |su AS (SELECT CAST(count(*) AS BIGINT) AS n_su
        |       FROM (SELECT h FROM ska UNION SELECT h FROM skb) u, th
        |       WHERE h < theta),
        |ex AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
        |              (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
        |              (SELECT CAST(count(*) AS BIGINT)
        |               FROM a JOIN b USING (c_custkey)) AS n_inter)
        |SELECT n_a, n_b, n_inter, n_a + n_b - n_inter AS n_union,
        |       n_si, n_su, theta,
        |       (n_si * 1099511627776) // theta AS est_inter,
        |       (n_su * 1099511627776) // theta AS est_union,
        |       CASE WHEN n_su = 0 THEN CAST(0 AS BIGINT)
        |            ELSE (n_si * 1000000) // n_su END AS est_j_ppm
        |FROM ex, th, si, su""".stripMargin,
    // q_bloom_join: the PLAIN join — the bloom pre-filter is correctness-
    // invisible by construction, so the oracle need not model it
    "q_bloom_join" ->
      """SELECT c_custkey, count(*) AS n_orders,
        |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS total_e4
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_custkey ORDER BY c_custkey ASC""".stripMargin,
    // q_kmv_distinct: both sketch paths replayed by rank windows — the
    // merged path ranks ONLY within the per-nation bottom-k rows, the
    // direct path over all rows; 16492674416640 = (k-1) * 2^40
    "q_kmv_distinct" ->
      """WITH src AS (
        |  SELECT n_regionkey AS regionkey, n_nationkey AS nationkey,
        |         c_custkey AS k
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |h AS (SELECT regionkey, nationkey,
        |        CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
        |          // 1048576 AS h40
        |      FROM src),
        |nk AS (SELECT regionkey, h40,
        |         row_number() OVER (PARTITION BY nationkey ORDER BY h40 ASC) AS rn
        |       FROM h),
        |mrg AS (SELECT regionkey, h40,
        |          row_number() OVER (PARTITION BY regionkey ORDER BY h40 ASC) AS rn
        |        FROM nk WHERE rn <= 16),
        |msk AS (SELECT regionkey, CAST(count(*) AS BIGINT) AS n,
        |          max(CASE WHEN rn = 16 THEN h40 END) AS hk
        |        FROM mrg WHERE rn <= 16 GROUP BY regionkey),
        |dir AS (SELECT regionkey, h40,
        |          row_number() OVER (PARTITION BY regionkey ORDER BY h40 ASC) AS rn
        |        FROM h),
        |dsk AS (SELECT regionkey, CAST(count(*) AS BIGINT) AS n,
        |          max(CASE WHEN rn = 16 THEN h40 END) AS hk
        |        FROM dir WHERE rn <= 16 GROUP BY regionkey),
        |ex AS (SELECT CAST(regionkey AS BIGINT) AS regionkey,
        |         CAST(count(DISTINCT k) AS BIGINT) AS n_exact
        |       FROM src GROUP BY regionkey)
        |SELECT ex.regionkey, ex.n_exact, dsk.n AS n_sketch,
        |       CASE WHEN dsk.n < 16 THEN dsk.n
        |            ELSE 16492674416640 // greatest(dsk.hk, 1) END AS est_direct,
        |       CASE WHEN msk.n < 16 THEN msk.n
        |            ELSE 16492674416640 // greatest(msk.hk, 1) END AS est_merged
        |FROM ex JOIN dsk USING (regionkey) JOIN msk USING (regionkey)
        |ORDER BY regionkey ASC""".stripMargin,
    // q_cms_topk: the identical depth-4 x width-32 md5 sketch rebuilt
    // from the token counts, probed for the same exact top-20
    "q_cms_topk" ->
      """WITH tk AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
        |rs AS (SELECT unnest([0,1,2,3]) AS r),
        |cells AS (
        |  SELECT r,
        |         CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token), 1, 15) AS BIGINT) % 32 AS b,
        |         SUM(c) AS cell
        |  FROM cnt CROSS JOIN rs
        |  GROUP BY 1, 2),
        |top AS (SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT 20),
        |probe AS (
        |  SELECT t.token, t.c, r.r AS r,
        |         CAST('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.token), 1, 15) AS BIGINT) % 32 AS b
        |  FROM top t CROSS JOIN rs r)
        |SELECT p.token, CAST(p.c AS BIGINT) AS c_exact,
        |       CAST(min(cl.cell) AS BIGINT) AS c_cms
        |FROM probe p JOIN cells cl ON cl.r = p.r AND cl.b = p.b
        |GROUP BY p.token, p.c
        |ORDER BY c_exact DESC, token ASC""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sum_price,
        |         CAST(COUNT(*) AS DOUBLE) AS n_items
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'n_items', n_items FROM wide
        |ORDER BY l_returnflag ASC, measure ASC""".stripMargin,
    // q_profile: the stacked per-column stats + the colname-keyed HLL
    // register chain (the hllOracleSql template inlined over the stack)
    "q_profile" ->
      s"""WITH st AS (
         |  SELECT 'l_orderkey' AS colname, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
         |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
         |  UNION ALL SELECT 'l_returnflag', CAST(l_returnflag AS VARCHAR) FROM lineitem),
         |base AS (
         |  SELECT colname, CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |         MIN(v) AS min_s, MAX(v) AS max_s
         |  FROM st GROUP BY colname),
         |h AS (SELECT colname,
         |        CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
         |      FROM st WHERE v IS NOT NULL),
         |r AS (SELECT colname, h % 64 AS reg, h // 64 AS w FROM h),
         |rr AS (SELECT colname, reg,
         |         CASE WHEN w = 0 THEN 55
         |              ELSE CAST(log2(w & (-w)) AS INT) + 1 END AS rho FROM r),
         |m AS (SELECT colname, reg, MAX(rho) AS mrho FROM rr GROUP BY colname, reg),
         |z AS (SELECT colname, CAST(SUM(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS zp,
         |             COUNT(*) AS npresent FROM m GROUP BY colname)
         |SELECT base.colname, base.n_rows, base.n_null, base.min_s, base.max_s,
         |       ${rndSql("0.709 * 4096.0 * POWER(2.0, 55.0) / CAST(zp + (64 - npresent) * (CAST(1 AS BIGINT) << 55) AS DOUBLE)", 4)} AS n_distinct_est
         |FROM base JOIN z USING (colname)
         |ORDER BY colname ASC""".stripMargin,
    "q_hll_custkey" -> hllOracleSql("orders", "o_custkey", Nil),
    "q_hll_by_flag" ->
      hllOracleSql("lineitem", "l_partkey", Seq("l_returnflag")),
    // the mergeability replay: per-nation max-rho register rows (nm),
    // merged region-wise (mm) vs built region-wise directly (dm); the
    // estimate formula is the one hllOracleSql template expression
    "q_hll_running" -> {
      val est = rndSql("0.709 * 4096.0 * POWER(2.0, 55.0) / CAST(zp + (64 - npresent) * (CAST(1 AS BIGINT) << 55) AS DOUBLE)", 4)
      s"""WITH ev AS (
         |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id FROM events),
         |h AS (SELECT day, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM ev),
         |r AS (SELECT day, h % 64 AS reg, h // 64 AS w FROM h),
         |rr AS (SELECT day, reg,
         |         CASE WHEN w = 0 THEN 55 ELSE CAST(log2(w & (-w)) AS INT) + 1 END AS rho FROM r),
         |dm AS (SELECT day, reg, MAX(rho) AS mrho FROM rr GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day FROM ev),
         |spine AS (SELECT d.day, g.reg FROM days d, generate_series(0, 63) AS g(reg)),
         |run AS (
         |  SELECT s.day, s.reg,
         |         MAX(dm.mrho) OVER (PARTITION BY s.reg ORDER BY s.day ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runm
         |  FROM spine s LEFT JOIN dm ON dm.day = s.day AND dm.reg = s.reg),
         |z AS (SELECT day, CAST(SUM(CAST(1 AS BIGINT) << (55 - runm)) AS BIGINT) AS zp,
         |        COUNT(*) AS npresent
         |      FROM run WHERE runm IS NOT NULL GROUP BY 1),
         |fs AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1),
         |nn AS (SELECT day, COUNT(*) AS nnew FROM fs GROUP BY 1),
         |ex AS (
         |  SELECT d.day,
         |         CAST(SUM(coalesce(nn.nnew, 0)) OVER (ORDER BY d.day ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_exact_cum
         |  FROM days d LEFT JOIN nn ON nn.day = d.day)
         |SELECT ex.day, ex.n_exact_cum, $est AS est_cum
         |FROM ex JOIN z USING (day) ORDER BY day ASC""".stripMargin
    },
    "q_hll_merge" -> {
      val est = rndSql("0.709 * 4096.0 * POWER(2.0, 55.0) / CAST(zp + (64 - npresent) * (CAST(1 AS BIGINT) << 55) AS DOUBLE)", 4)
      s"""WITH src AS (
         |  SELECT n.n_regionkey AS regionkey, n.n_nationkey AS nationkey,
         |         c.c_custkey AS k
         |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
         |h AS (SELECT regionkey, nationkey,
         |        CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |      FROM src),
         |r AS (SELECT regionkey, nationkey, h % 64 AS reg, h // 64 AS w FROM h),
         |rr AS (SELECT regionkey, nationkey, reg,
         |         CASE WHEN w = 0 THEN 55
         |              ELSE CAST(log2(w & (-w)) AS INT) + 1 END AS rho FROM r),
         |nm AS (SELECT regionkey, nationkey, reg, MAX(rho) AS mrho
         |       FROM rr GROUP BY regionkey, nationkey, reg),
         |mm AS (SELECT regionkey, reg, MAX(mrho) AS mrho
         |       FROM nm GROUP BY regionkey, reg),
         |zm AS (SELECT regionkey,
         |         CAST(SUM(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS zp,
         |         COUNT(*) AS npresent FROM mm GROUP BY regionkey),
         |dm AS (SELECT regionkey, reg, MAX(rho) AS mrho
         |       FROM rr GROUP BY regionkey, reg),
         |zd AS (SELECT regionkey,
         |         CAST(SUM(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT) AS zp,
         |         COUNT(*) AS npresent FROM dm GROUP BY regionkey),
         |em AS (SELECT regionkey, $est AS est_merged FROM zm),
         |ed AS (SELECT regionkey, $est AS est_direct FROM zd),
         |e AS (SELECT regionkey, COUNT(DISTINCT k) AS n_exact FROM src GROUP BY regionkey)
         |SELECT e.regionkey, e.n_exact, ed.est_direct, em.est_merged
         |FROM e JOIN ed USING (regionkey) JOIN em USING (regionkey)
         |ORDER BY regionkey ASC""".stripMargin
    },
    "q_percentiles" ->
      s"""SELECT l_returnflag,
         |       ${rndSql("quantile_cont(l_extendedprice, 0.25)", 4)} AS p25,
         |       ${rndSql("quantile_cont(l_extendedprice, 0.50)", 4)} AS p50,
         |       ${rndSql("quantile_cont(l_extendedprice, 0.75)", 4)} AS p75,
         |       ${rndSql("quantile_cont(l_extendedprice, 0.95)", 4)} AS p95
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |       count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_flag ASC, g_status ASC,
        |         l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(28,8)) END) AS DOUBLE) AS "A",
        |       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(28,8)) END) AS DOUBLE) AS "N",
        |       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(28,8)) END) AS DOUBLE) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus ASC""".stripMargin,
    "q_bloom_probe" ->
      """WITH build AS (
        |  SELECT c_custkey,
        |         CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM customer WHERE c_mktsegment = 'BUILDING'),
        |bloom AS (
        |  SELECT DISTINCT CAST(unnest([h & 65535, (h >> 16) & 65535, (h >> 32) & 65535]) AS INT) AS pos
        |  FROM build),
        |probe AS (
        |  SELECT DISTINCT o_custkey FROM orders),
        |probeh AS (
        |  SELECT o_custkey,
        |         CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM probe),
        |probepos AS (
        |  SELECT o_custkey, CAST(unnest([h & 65535, (h >> 16) & 65535, (h >> 32) & 65535]) AS INT) AS pos
        |  FROM probeh),
        |passed AS (
        |  SELECT o_custkey FROM probepos JOIN bloom USING (pos)
        |  GROUP BY o_custkey HAVING COUNT(*) = 3),
        |trues AS (
        |  SELECT o_custkey FROM probe WHERE o_custkey IN (SELECT c_custkey FROM build))
        |SELECT (SELECT COUNT(*) FROM probe) AS n_probed,
        |       (SELECT COUNT(*) FROM passed) AS n_bloom_pass,
        |       (SELECT COUNT(*) FROM trues) AS n_true""".stripMargin,
    "q_approx_quantile" ->
      """WITH bins AS (
        |  SELECT CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS bin, count(*) AS c
        |  FROM lineitem GROUP BY bin),
        |cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin ASC) AS cum FROM bins),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM bins)
        |SELECT q.p,
        |       CAST((SELECT min(bin) FROM cum, tot
        |             WHERE cum.cum >= (tot.n * q.p + 99) // 100) * 100 AS DOUBLE)
        |         AS approx_value
        |FROM (VALUES (50), (95), (99)) AS q(p)
        |ORDER BY q.p ASC""".stripMargin,
    "q_sample_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n_sampled,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS sample_revenue
        |FROM lineitem
        |WHERE CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 10
        |GROUP BY l_returnflag ORDER BY l_returnflag ASC""".stripMargin,
    "sql_window_suite" ->
      s"""SELECT o_custkey, o_orderkey,
         |       CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS price,
         |       lag(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE), 1) OVER w AS prev_price,
         |       lead(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE), 1) OVER w AS next_price,
         |       CAST(row_number() OVER w AS INT) AS rn,
         |       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) DESC) AS INT) AS rnk,
         |       CAST(ntile(4) OVER w AS INT) AS quartile,
         |       ${rndSql("percent_rank() OVER w", 6)} AS pct_rank,
         |       ${rndSql("cume_dist() OVER w", 6)} AS cume
         |FROM orders
         |WHERE o_custkey < 200
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
  )
}
