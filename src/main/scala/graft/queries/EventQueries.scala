package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log queries: the mutable-state and time-ordered semantics of the
  * reference re-expressed as batch plans over the `events` table.
  *
  *   - `e_latest_state` is the C1 optimistic-versioning pattern
  *     (SURVEY §2.10, reference `repos/chunks.py:38-60`): latest row per key
  *     wins, resolved with one row_number window — the same plan resolves a
  *     CAS-versioned snapshot at any scale.
  *   - `e_tumbling_daily` is the batch shape of a Structured Streaming
  *     tumbling-window aggregation (same groupBy(window) plan compiles to a
  *     streaming query on `readStream`).
  *   - `e_sessionize` is gaps-and-islands sessionization (30-min idle gap),
  *     one shuffle on user_id, windows within partitions.
  *   - `e_created_after` preserves the reference's strict `>` filter
  *     semantics (quirk Q8, `services/search.py:61`).
  */
object EventQueries {

  private def dsum6(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Latest event per user — CAS/version resolution (C1). */
  private def latestState(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value").cast("decimal(18,6)").cast("double").as("value"))
      .orderBy(col("user_id").asc)
  }

  /** Tumbling daily window per event_type: count + exact sum. */
  private def tumblingDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum6(col("value")).as("total"))
      .orderBy(col("day").asc, col("event_type").asc)
  }

  /** Sessionization: a session ends after a 30-minute idle gap.
    * Output: per-user session count + total events.
    */
  private def sessionize(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).cast("long").as("n_sessions"),
           count(lit(1)).as("n_events"))
      .orderBy(col("user_id").asc)
  }

  /** Strict `>` created_after filter (quirk Q8) + per-type counts. */
  private def createdAfter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum6(col("value")).as("total"))
      .orderBy(col("event_type").asc)
  }

  /** JSON extraction from the props column (scalar function surface):
    * get_json_object / ->> parity.
    */
  private def jsonExtract(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") >= 95)
      .orderBy(col("event_id").asc)
  }

  /** Z-order (Morton) clustering audit: interleave the bits of two 8-bit
    * keys — user bucket × value bucket — into one z-value, then show that
    * each 1024-wide z-range spans NARROW ranges in BOTH dimensions. That
    * is the 100 TB data-layout property: writing the corpus sorted by
    * z-value (`repartitionByRange(zvalue)` + sortWithinPartitions before
    * the parquet sink) gives every file tight min/max stats on BOTH
    * columns, so 2-D predicates prune files the way a 1-D sort only
    * prunes one. The interleave is plain integer arithmetic (shift / and
    * / multiply — codegen'd, engine-portable), no UDF.
    */
  private def zorderLayout(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def nn(c: org.apache.spark.sql.Column) = ((c % 256) + 256) % 256
    val a = nn(col("user_id"))
    val b = nn(floor(col("value")).cast("long"))
    val z = (0 until 8).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    ev.select(a.as("ua"), b.as("vb"), z.as("zv"))
      .groupBy((col("zv") / 1024).cast("int").as("zbucket"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        min(col("ua")).cast("int").as("min_user_bucket"),
        max(col("ua")).cast("int").as("max_user_bucket"),
        min(col("vb")).cast("int").as("min_value_bucket"),
        max(col("vb")).cast("int").as("max_value_bucket"))
      .orderBy(col("zbucket").asc)
  }

  /** STRICT-ORDER FUNNEL (view -> click -> purchase): stage k counts the
    * users whose earliest stage-k event strictly follows their earliest
    * completion of stage k-1 — the canonical product-analytics operator.
    * Each stage is one conditional min-agg on user_id joined back to the
    * previous stage's timestamps; every shuffle in the chain is keyed on
    * user_id, so AQE reuses one partitioning across the three stages
    * (never a per-user sort or a window over the full log). Output is
    * |stages| rows whatever the log size.
    */
  private def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def stageMin(src: DataFrame, evType: String, after: Option[DataFrame]): DataFrame = {
      val base = ev.filter(col("event_type") === evType)
      val scoped = after match {
        case None => base
        case Some(prev) => base.join(prev, Seq("user_id"))
          .filter(col("ts") > col("prev_ts"))
      }
      scoped.groupBy(col("user_id")).agg(min(col("ts")).as("prev_ts"))
    }
    val t1 = stageMin(ev, "view", None)
    val t2 = stageMin(ev, "click", Some(t1))
    val t3 = stageMin(ev, "purchase", Some(t2))
    Seq((1, t1), (2, t2), (3, t3))
      .map { case (k, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(k).as("stage"), col("n_users"))
      }
      .reduce(_ unionAll _)
      .orderBy(col("stage").asc)
  }

  /** WEEKLY COHORT RETENTION: users grouped by first-activity ISO week,
    * counted per week offset they return in — the other canonical
    * product-analytics operator. One min-agg for cohorts, one distinct
    * active-day projection, one user_id-keyed join, one (cohort, offset)
    * agg; output is |cohorts| x |offsets| rows whatever the log size.
    */
  private def retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cohorts = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = ev.select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    active.join(cohorts, Seq("user_id"))
      .select(col("cohort_week"),
        expr("int(datediff(cast(d as date), cast(cohort_week as date)) div 7)")
          .as("week_off"), col("user_id"))
      .groupBy(col("cohort_week"), col("week_off"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week").asc, col("week_off").asc)
  }

  /** SCD2 (type-2 slowly-changing-dimension) reconstruction: each user's
    * event stream becomes validity INTERVALS — state valid from its own
    * timestamp until the next event's (NULL = current). One lead() window
    * per user partition; at 100 TB the only shuffle is the user_id
    * partitioning, and output rows == input rows. Orders carry an
    * event_id tie-break so equal timestamps resolve identically on both
    * engines.
    */
  private def scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d).filter(col("user_id") < 30)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id").asc, col("valid_from").asc, col("event_id").asc)
  }

  /** Calendar GAP FILLING: daily high-value purchase totals joined onto a
    * generated continuous day spine (derived from the table's own min/max
    * day), absent days emitted as explicit zero rows — the resampling step
    * every time-series consumer needs before rolling metrics. The spine is
    * |days| rows (metadata-scale) broadcast against the aggregated (not
    * raw) dailies.
    */
  private def gapfill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cal = ev.agg(min(to_date(date_trunc("day", col("ts")))).as("d0"),
        max(to_date(date_trunc("day", col("ts")))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val daily = ev
      .filter(col("event_type") === "purchase" && col("value") >= 300)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"), dsum6(col("value")).as("total"))
    cal.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"),
        (coalesce(col("n"), lit(0L)) === 0).as("is_gap"))
      .orderBy(col("day").asc)
  }

  /** Robust ANOMALY detection on the daily event series: median /
    * median-absolute-deviation flags (|n - med| > 3 * MAD), all exact
    * integers — the lower median is picked by rank (row_number with a
    * day tie-break), so there is no interpolating quantile to disagree
    * across engines. Every window runs over the BOUNDED daily table
    * (|days| rows), never the event log; the log is touched by exactly
    * one count aggregation.
    */
  private def anomalyDays(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.agg(count(lit(1)).as("tot"))
    // |days|-bounded frames: both median-rank windows run over the daily
    // table, never the event log — single partition on purpose, stated
    // via the onePartition idiom so WindowExec stays warning-free.
    val wN = Window.partitionBy(WindowUtil.onePartition(col("day")))
      .orderBy(col("n").asc, col("day").asc)
    val med = daily.withColumn("rn", row_number().over(wN))
      .crossJoin(broadcast(tot))
      .filter(col("rn") === expr("(tot + 1) div 2"))
      .select(col("n").as("med"))
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("n") - col("med")))
    val wD = Window.partitionBy(WindowUtil.onePartition(col("day")))
      .orderBy(col("dev").asc, col("day").asc)
    val mad = dev.withColumn("rn", row_number().over(wD))
      .crossJoin(broadcast(tot))
      .filter(col("rn") === expr("(tot + 1) div 2"))
      .select(col("dev").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("n"), col("med"), col("mad"), col("dev"),
        (col("dev") > col("mad") * 3).as("is_anomaly"))
      .orderBy(col("day").asc)
  }

  /** INTERVAL-OVERLAP JOIN (interval x interval) via time-bucket blocking
    * with an exactly-once "meet at the greatest-start bucket" residual.
    * Distinct from `e_asof_join` (point -> latest interval) and
    * `e_band_join` (point +- W): BOTH sides here are intervals — per-user
    * DAILY activity spans [min ts, max ts] — and a pair matches when the
    * spans intersect. The naive plan is a nested-loop inequality join
    * (per-row range scan of the whole other side); the scale shape is to
    * explode each interval into the fixed-width time buckets it spans
    * (bounded: a day-bounded span covers <= 5 six-hour buckets), equi-join
    * on the bucket, and keep a pair ONLY in the bucket containing
    * greatest(a_start, b_start). Both intervals provably span that bucket,
    * so every overlapping pair meets there and NOWHERE else — exactly-once
    * without a distinct/dedup shuffle. At 100 TB the bucket width W is
    * tuned to the typical interval length (candidate count ~ concurrent
    * intervals per bucket, never all-pairs), and the only shuffles are the
    * two bucket-keyed exchanges. The oracle is DuckDB's native IEJoin on
    * the raw inequality predicate — two different algorithms, row-for-row
    * identical. Sides are even-user intervals (A, kept with zero counts)
    * vs odd-user intervals (B), so the pair space is bipartite by
    * construction. Reference anchor: `services/search.py:40-62` filter
    * composition (time-range predicates) generalized to range x range.
    */
  private val IvW = 21600000000L // 6 hours in micros

  private def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(unix_micros(min(col("ts"))).as("s_us"),
           unix_micros(max(col("ts"))).as("e_us"))
    val a = iv.filter(col("user_id") % 2 === 0)
      .select(col("user_id").as("a_user"), col("day").as("a_day"),
        col("s_us").as("a_s"), col("e_us").as("a_e"))
    val b = iv.filter(col("user_id") % 2 === 1)
      .select(col("s_us").as("b_s"), col("e_us").as("b_e"))
    val aExp = a.withColumn("bucket",
      explode(sequence(expr(s"a_s div $IvW"), expr(s"a_e div $IvW"))))
    val bExp = b.withColumn("bucket",
      explode(sequence(expr(s"b_s div $IvW"), expr(s"b_e div $IvW"))))
    val matched = aExp.join(bExp,
        aExp("bucket") === bExp("bucket") &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
          aExp("bucket") === expr(s"greatest(a_s, b_s) div $IvW"))
      .groupBy(col("a_user").as("m_user"), col("a_day").as("m_day"))
      .agg(count(lit(1)).as("n_c"))
    a.join(matched, col("a_user") === col("m_user") &&
        col("a_day") === col("m_day"), "left")
      .select(col("a_user").as("user_id"), col("a_day").as("day"),
        coalesce(col("n_c"), lit(0L)).as("n_concurrent"))
      .orderBy(col("user_id").asc, col("day").asc)
  }

  /** INCREMENTAL VIEW MAINTENANCE of a mergeable aggregate — the pattern
    * that keeps a 100 TB rollup current WITHOUT rescanning the corpus:
    * the maintained view is base-aggregate MERGED with delta-aggregate
    * (counts add, exact decimal sums add; the split lands mid-day on
    * purpose so one (day, type) group genuinely exists in BOTH halves
    * and the merge arithmetic is exercised, not just unioned). The entry
    * emits the maintained columns NEXT TO a full recompute and the hash
    * check proves maintained == direct — the IVM identity for
    * append-only deltas. At scale the delta agg touches only delta rows
    * and the merge is |groups|-bounded; the full recompute exists here
    * only as the verification side. (Non-append deltas need retractions
    * or the engine store's snapshot CDC — `x_engine_snapshot_diff`.)
    */
  private def ivmMerge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cut = lit("2024-01-20 06:00:00").cast("timestamp")
    def aggOf(df: DataFrame) =
      df.groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).as("t"))
    val base = aggOf(ev.filter(col("ts") < cut))
      .select(col("day"), col("event_type"),
        col("n").as("n0"), col("t").as("t0"))
    val delta = aggOf(ev.filter(col("ts") >= cut))
      .select(col("day"), col("event_type"),
        col("n").as("n1"), col("t").as("t1"))
    val zero = lit(0).cast("decimal(28,6)")
    val maintained = base.join(delta, Seq("day", "event_type"), "full_outer")
      .select(col("day"), col("event_type"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
          .as("n_m"),
        (coalesce(col("t0"), zero) + coalesce(col("t1"), zero))
          .cast("double").as("total_m"))
    val direct = aggOf(ev).select(col("day"), col("event_type"),
      col("n").as("n_d"), col("t").cast("double").as("total_d"))
    maintained.join(direct, Seq("day", "event_type"))
      .orderBy(col("day").asc, col("event_type").asc)
  }

  /** NEXT-EVENT TRANSITION MATRIX — the Markov-chain readout of user
    * journeys (what follows what): one lag/lead window per user
    * partition pairs each event with its successor, then a
    * (from, to)-keyed count; transition probabilities are exact integer
    * ppm against the from-state's outgoing total, computed on the
    * AGGREGATED |states|^2 table (a broadcast-scale join, never a second
    * pass over the log). The event_id tie-break pins equal timestamps on
    * both engines. One user_id shuffle at any scale.
    */
  private def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables.events(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_out"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        col("n_out").cast("long").as("n_out"),
        expr("(n * 1000000) div n_out").as("p_ppm"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  /** EXACT LEAST-SQUARES TREND per event type over the daily series —
    * slope of counts vs day index from the closed-form normal equation
    * slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), every sufficient
    * statistic an exact BIGINT (the five sums are also the MERGEABLE
    * state — two half-corpus fits combine by adding them, the same
    * property `e_ivm_merge` proves for count/sum). Slope is emitted in
    * micro-units with truncate-toward-zero division (negative slopes
    * exist; the oracle spells the sign-safe // form — DuckDB floors
    * negatives). The window is the BOUNDED daily table; the log pays one
    * count aggregation.
    */
  private def trendFit(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val x0 = daily.agg(min(col("day")).as("d0"))
    val st = daily.crossJoin(broadcast(x0))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("x"), col("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    st.select(col("event_type"), col("n"),
        col("sx").cast("long").as("sx"), col("sy").cast("long").as("sy"),
        col("sxy").cast("long").as("sxy"), col("sxx").cast("long").as("sxx"),
        expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)")
          .as("slope6"))
      .orderBy(col("event_type").asc)
  }

  /** LOCF (last-observation-carried-forward) IMPUTATION — the
    * time-series gap repair step after `e_gapfill` materializes the
    * missing days: each gap day inherits the most recent observed total
    * via last(value, ignoreNulls) over an unbounded-preceding frame
    * (days before the first observation stay NULL — LOCF has nothing to
    * carry; the flag column says which values are imputed). The window
    * runs over the BOUNDED day spine, never the raw log; at scale it
    * partitions by series key. Cross-engine note: Spark's
    * last(ignoreNulls) frame semantics match DuckDB's
    * last_value(... IGNORE NULLS) on the same ROWS frame.
    */
  private def locf(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cal = ev.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val daily = ev
      .filter(col("event_type") === "purchase" && col("value") >= 300)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(dsum6(col("value")).as("total"))
    val w = Window.partitionBy(WindowUtil.onePartition(col("day")))
      .orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("day"), "left")
      .withColumn("total_locf", last(col("total"), ignoreNulls = true).over(w))
      .select(col("day"), col("total"), col("total_locf"),
        col("total").isNull.as("is_imputed"))
      .orderBy(col("day").asc)
  }

  /** EWMA CONTROL CHART on the daily series — the smoothing-based
    * monitor beside the median/MAD flags (`e_anomaly_days`): e_t =
    * (7*e_{t-1} + y_t) div 8 (alpha = 1/8) as an EXACT INTEGER
    * recursion, seeded e_1 = y_1. A recursion is not expressible as a
    * closed-form window, so the BOUNDED daily series (|days| rows —
    * never the log) is folded per prefix with the aggregate() HOF; the
    * sentinel-init fold (acc < 0 -> first element) reproduces DuckDB's
    * list_reduce first-element-init semantics exactly, and truncating
    * integer division makes the whole trajectory engine-portable where
    * a float alpha*y + (1-alpha)*e would be at the mercy of rounding.
    * Spike flag: 2*n > 3*prev_ewma (n > 1.5x the smoothed level as an
    * exact rational). O(|days|^2) prefix folds on a 30-row series is
    * nothing; at scale the series is per-key and the fold runs inside
    * one row per key.
    */
  private def ewma(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val arr = daily
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("ds"))
      .select(transform(col("ds"), x => x.getField("day")).as("days"),
        transform(col("ds"), x => x.getField("n")).as("ys"))
    val traj = arr
      .select(col("days"), col("ys"),
        expr("""transform(sequence(1, size(ys)),
               |  i -> aggregate(slice(ys, 1, i), CAST(-1 AS BIGINT),
               |         (acc, x) -> IF(acc < 0, x, (7 * acc + x) div 8)))""".stripMargin)
          .as("es"))
      .select(explode(arrays_zip(col("days"), col("ys"), col("es"))).as("r"))
      .select(col("r.days").as("day"), col("r.ys").as("n"),
        col("r.es").as("ewma"))
    val w = Window.partitionBy(WindowUtil.onePartition(col("day")))
      .orderBy(col("day").asc)
    traj.withColumn("prev_ewma", lag(col("ewma"), 1).over(w))
      .select(col("day"), col("n"), col("ewma"),
        when(col("prev_ewma").isNull, lit(false))
          .otherwise(col("n") * 2 > col("prev_ewma") * 3).as("is_spike"))
      .orderBy(col("day").asc)
  }

  /** TOKEN-BUCKET RATE-LIMIT REPLAY per user — admission-control audit
    * over the event log (quota/throttling semantics every serving stack
    * enforces; replaying it over history is how limits get tuned):
    * bucket of 5 tokens, 1 token per 600 s refill, every event takes
    * one token or is throttled. The clamped recursion (min(capacity,
    * tokens + refill)) has no window-function closed form, so it runs
    * as the [[ewma]]-family exact-integer fold — but with the WHOLE
    * bucket state packed into one BIGINT (admitted * 2^42 +
    * milli_tokens * 2^23 + rel_seconds), because DuckDB's list_reduce
    * initializes from the raw FIRST ELEMENT: the Spark side folds
    * slice(2..n) with init = element 1 (identical semantics, no
    * sentinel), and the step lambda decodes "raw element" vs "packed
    * state" by magnitude (a packed state always carries admitted >= 1
    * in the high bits). rel_seconds is anchored at 2024-01-01 and the
    * 23-bit field holds 97 days — the fold is exact while a per-user
    * window stays under that horizon (at scale the keyed state would
    * roll per (user, month), like every quota ledger).
    *
    * 100 TB shape: one user-keyed shuffle; per-user lists are
    * per-key-bounded (the quota window), the fold is per-row compute;
    * output one row per user.
    */
  private def rateLimit(s: SparkSession, d: String): DataFrame = {
    val step = (acc: String, x: String) =>
      s"""(CAST(IF($acc < 8388608, 1, $acc div 4398046511104) +
         |   IF(least(3000, IF($acc < 8388608, 2000, ($acc div 8388608) % 524288)
         |        + (($x - $acc % 8388608) * 5) div 216) >= 1000, 1, 0) AS BIGINT)
         |    * 4398046511104
         | + (least(3000, IF($acc < 8388608, 2000, ($acc div 8388608) % 524288)
         |        + (($x - $acc % 8388608) * 5) div 216)
         |    - IF(least(3000, IF($acc < 8388608, 2000, ($acc div 8388608) % 524288)
         |        + (($x - $acc % 8388608) * 5) div 216) >= 1000, 1000, 0)) * 8388608
         | + $x)""".stripMargin.replace("\n", " ")
    Tables.events(s, d)
      .select(col("user_id"),
        (unix_timestamp(col("ts")) - lit(1704067200L)).as("rel"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("rel"))).as("tss"),
        count(lit(1)).as("n_events"))
      .withColumn("fin", expr(
        s"""aggregate(slice(tss, 2, greatest(size(tss) - 1, 0)),
           |  element_at(tss, 1), (acc, x) -> ${step("acc", "x")})""".stripMargin))
      .select(col("user_id"), col("n_events"),
        expr("IF(fin < 8388608, CAST(1 AS BIGINT), fin div 4398046511104)").as("n_admitted"),
        expr("IF(fin < 8388608, CAST(2000 AS BIGINT), (fin div 8388608) % 524288)").as("tokens_milli"))
      .withColumn("n_throttled", col("n_events") - col("n_admitted"))
      .orderBy(col("user_id").asc)
  }

  /** LAST-TOUCH ATTRIBUTION — the marketing/conversion-analytics join of
    * the funnel family: every purchase is attributed to the user's most
    * recent click strictly before it and within a 7-day lookback, daily
    * rollup of attributed vs organic purchases plus attributed revenue.
    * One pass, no self-join: an IGNORE-NULLS running `last` window per
    * user (ordered by ts, event_id — the total-order contract) carries
    * the latest click timestamp onto every row, then the purchase filter
    * and a daily aggregate. The horizon test runs on epoch MICROSECOND
    * integers (unix_micros/epoch_us — identical on both engines; no
    * interval arithmetic), strict `<` so a same-instant click never
    * attributes to itself, and revenue is per-item floor(value*1e4+0.5)
    * BIGINT e4 units summed exactly (the sql_returned_revenue rule).
    *
    * 100 TB shape: one user_id-keyed shuffle for the window (the
    * sessionize/funnel partitioning), then a |days|-bounded aggregate
    * with map-side partials; no state beyond the one carried column and
    * no driver-side anything.
    */
  private def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val H = 7L * 86400L * 1000000L // 7-day lookback in microseconds
    Tables.events(s, d)
      .withColumn("click_us",
        last(when(col("event_type") === "click", unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("is_attr",
        col("click_us").isNotNull && col("click_us") < col("us") &&
          (col("us") - col("click_us")) <= lit(H))
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("purchases"),
        sum(when(col("is_attr"), 1L).otherwise(0L)).as("attributed"),
        sum(when(col("is_attr"),
            floor(col("value") * lit(10000.0) + lit(0.5)).cast("long"))
          .otherwise(0L)).as("attributed_value_e4"))
      .orderBy(col("day").asc)
  }

  /** AUTOCORRELATION FUNCTION (lags 1..7) of the daily purchase-count
    * series — the seasonality probe of the time-series family (weekly
    * cadence shows as a lag-7 peak), beside `e_trend_fit` (trend) and
    * `e_ewma` (smoothing). Exact-integer estimator: with n = |days| and
    * S = Σy, the centered deviation n·y_t − S is an exact integer (no
    * rational mean anywhere), and
    *   acf_e6(k) = (1e6 · Σ_t dev_t·dev_{t+k}) div (Σ_t dev_t²)
    * — the classic biased ACF estimator scaled by n² in both numerator
    * and denominator, so the n² cancels and every intermediate is an
    * exact product of integers. Deviations are DECIMAL(18,0) so products
    * are exact DECIMAL(37,0) (at 100 TB: y≈1e11/day over a 30-day spine
    * makes dev≈3e12, dev²≈1e25, lag-sums≈3e26 — inside DECIMAL(28,0)
    * for the final 1e6 rescale, spelled with an explicit down-cast so
    * Spark's precision-loss rules never engage). Division truncates
    * toward zero on both engines (Spark `div`; the oracle spells the
    * sign-safe `//` CASE — DuckDB floors negatives).
    *
    * 100 TB shape: the raw log collapses to |days| rows at the first
    * count aggregate; the spine join, the 7-lag self-join, and both
    * sufficient-statistic aggregates all run on that bounded series
    * (gap days count 0 so lag-k is a true calendar shift). Driver state:
    * nothing — the scalar stats ride a broadcast one-row crossJoin.
    */
  private def acf(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cal = ev.agg(to_date(min(col("ts"))).as("d0"),
        to_date(max(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val series = cal.join(daily, Seq("day"), "left_outer")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val st = series.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val dev = series.crossJoin(broadcast(st))
      .select(col("day"),
        (col("y") * col("n") - col("s")).cast("decimal(18,0)").as("dev"))
    val den = dev.agg(sum(col("dev") * col("dev")).as("den"))
    val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
    dev.as("a").crossJoin(broadcast(lags))
      .withColumn("day2", date_add(col("day"), col("lag")))
      .join(dev.as("b"), col("day2") === col("b.day"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("npairs"),
        sum(col("a.dev") * col("b.dev")).as("num0"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("npairs"),
        expr("(1000000 * CAST(num0 AS DECIMAL(28,0))) div den").as("acf_e6"))
      .orderBy(col("lag").asc)
  }

  /** EXACT TRAILING-7-DAY ACTIVE USERS (DAU/WAU + stickiness) — the
    * engagement readout beside `q_hll_running`'s sketch curve, computed
    * EXACTLY without any per-day rescan of history: the distinct
    * (user, day) pairs each cover the ≤7 report days they make "active"
    * (one bounded explode — a 7x blowup of the DEDUPLICATED user-day
    * frame, not the raw log), then one count-distinct per report day.
    * Stickiness = DAU/WAU in truncating ppm — the ratio product teams
    * actually watch. The day spine left-join keeps silent days visible
    * as zeros.
    *
    * 100 TB shape: the raw log collapses to distinct user-days first
    * (one keyed shuffle with partial agg); the cover explode is bounded
    * by 7x that; both count-distincts shuffle on (day, user) — no
    * global window, no driver state. The HLL entry is the sketch path
    * when even user-days are too hot; this is the exact path.
    */
  private def wau(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(explode(sequence(col("d0"), col("d1"),
      expr("interval 1 day"))).as("day"))
    val cover = ud.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("day"),
          least(date_add(col("day"), 6), col("d1")),
          expr("interval 1 day"))).as("rday"))
    val wauD = cover.groupBy(col("rday").as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val dauD = ud.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    spine.join(wauD, Seq("day"), "left_outer")
      .join(dauD, Seq("day"), "left_outer")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
      .withColumn("stickiness_ppm",
        expr("CASE WHEN wau = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000000 * dau) div wau END"))
      .orderBy(col("day").asc)
  }

  /** TWO-SIDED CUSUM CHANGE-POINT DETECTION on the daily purchase
    * series — the sequential shift detector beside the EWMA control
    * chart (EWMA flags spiky LEVELS; CUSUM accumulates small persistent
    * SHIFTS that never individually breach a band): S⁺_t = max(0,
    * S⁺_{t−1} + y_t − 70), S⁻_t = max(0, S⁻_{t−1} + 60 − y_t), alarm at
    * ≥ 12 (targets bracket the series mean 66 so both sides fire on
    * this data). The clamped recursion has no window closed form — it
    * runs as the [[ewma]]-family exact-integer fold over the sorted
    * day array, and because the CUSUM init is the IDENTITY value 0,
    * the DuckDB replay needs no packed-state magnitude trick: the
    * oracle list_prepends a literal 0 so list_reduce's
    * first-element-init semantics start the fold at the true S_0 (the
    * e_rate_limit workaround, reduced to its trivial case).
    *
    * 100 TB shape: the log collapses to |days| rows at the first agg;
    * the fold is over the bounded day array (at scale: one fold per
    * (series, month) key, like every control chart).
    */
  private def cusum(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val arr = daily
      .agg(array_sort(collect_list(struct(col("day"), col("y")))).as("ds"))
      .select(transform(col("ds"), x => x.getField("day")).as("days"),
        transform(col("ds"), x => x.getField("y")).as("ys"))
    arr.select(col("days"), col("ys"),
        expr("""transform(sequence(1, size(ys)), i ->
               |  aggregate(slice(ys, 1, i), CAST(0 AS BIGINT),
               |    (acc, x) -> greatest(CAST(0 AS BIGINT), acc + (x - 70))))"""
          .stripMargin).as("up"),
        expr("""transform(sequence(1, size(ys)), i ->
               |  aggregate(slice(ys, 1, i), CAST(0 AS BIGINT),
               |    (acc, x) -> greatest(CAST(0 AS BIGINT), acc + (60 - x))))"""
          .stripMargin).as("dn"))
      .select(explode(arrays_zip(col("days"), col("ys"),
        col("up"), col("dn"))).as("r"))
      .select(col("r.days").as("day"), col("r.ys").as("y"),
        col("r.up").as("cusum_up"), col("r.dn").as("cusum_dn"))
      .withColumn("alarm_up", col("cusum_up") >= 12)
      .withColumn("alarm_dn", col("cusum_dn") >= 12)
      .orderBy(col("day").asc)
  }

  /** A/B EXPERIMENT READOUT — the analysis step downstream of
    * hash-based assignment (`d_split_assign`'s machinery pointed at
    * experimentation): users land in cohort hash60("exp1|"+user_id)%2
    * (stable under re-runs and appends, the property that makes
    * exposure logs replayable), conversion = repeat purchaser (≥15
    * purchases — 50/150 users at sf0.01, 561/1500 at sf0.1, so both
    * outcomes are live at every test SF), and the
    * one-row readout carries both cohorts' exact-ppm conversion rates,
    * the signed rate difference, and the RATE-SPACE chi-square score
    * (rA−rB)²/(rA+rB) — the `t_token_drift` statistic, exact BIGINT at
    * any corpus size and scale-STABLE (rates converge as N grows, so
    * alert thresholds survive a 100× scale-up where a raw-count
    * statistic inflates linearly).
    *
    * 100 TB shape: one user-keyed partial-agg pass (conversion flag),
    * one 2-group agg; the cohort split is map-side arithmetic — no
    * assignment table to join.
    */
  private def abTest(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val perUser = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 15L).cast("long").as("conv"))
      .select((hash60(concat(lit("exp1|"), col("user_id").cast("string")))
        % 2).as("cohort"), col("conv"))
    val g = perUser.groupBy(col("cohort"))
      .agg(count(lit(1)).as("users"), sum(col("conv")).as("conv"))
      .select(col("cohort"), col("users"), col("conv").cast("long").as("conv"),
        expr("(1000000 * conv) div users").as("rate_ppm"))
    val a = g.filter(col("cohort") === 0)
      .select(col("users").as("users_a"), col("conv").as("conv_a"),
        col("rate_ppm").as("rate_a_ppm"))
    val b = g.filter(col("cohort") === 1)
      .select(col("users").as("users_b"), col("conv").as("conv_b"),
        col("rate_ppm").as("rate_b_ppm"))
    a.crossJoin(b)
      .withColumn("diff_ppm", col("rate_a_ppm") - col("rate_b_ppm"))
      .withColumn("score",
        expr("CASE WHEN rate_a_ppm + rate_b_ppm = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (diff_ppm * diff_ppm) div (rate_a_ppm + rate_b_ppm) END"))
  }

  /** The Holt fold step, templated once for both engines (the
    * e_rate_limit pattern): state = (level + 2^20)·2^24 + (trend +
    * 2^23) packed in one BIGINT; a raw element (daily count < 2^23)
    * IS the init state level=y₁/trend=0, decoded by magnitude. The two
    * α=β=1/4 recursion divisions truncate toward zero on BOTH engines
    * (Spark `div` natively; DuckDB via the sign-safe `//` CASE — the
    * trend numerator goes negative on down-slopes).
    */
  private def holtStep(spark: Boolean)(acc: String, x: String): String = {
    def sdiv(a: String) =
      if (spark) s"(($a) div 4)"
      else s"(CASE WHEN ($a) >= 0 THEN ($a) // 4 ELSE -((0 - ($a)) // 4) END)"
    val lp =
      if (spark) s"IF($acc < 8388608, $acc, ($acc div 16777216) - 1048576)"
      else s"(CASE WHEN $acc < 8388608 THEN $acc ELSE ($acc // 16777216) - 1048576 END)"
    val bp =
      if (spark) s"IF($acc < 8388608, CAST(0 AS BIGINT), ($acc % 16777216) - 8388608)"
      else s"(CASE WHEN $acc < 8388608 THEN 0 ELSE ($acc % 16777216) - 8388608 END)"
    val lt = sdiv(s"$x + 3 * (($lp) + ($bp))")
    val bt = sdiv(s"(($lt) - ($lp)) + 3 * ($bp)")
    s"((($lt) + 1048576) * 16777216 + (($bt) + 8388608))"
  }

  /** HOLT LINEAR SMOOTHING + ONE-STEP FORECAST on the daily purchase
    * series — the forecasting capstone of the control-chart family
    * (EWMA smooths level, CUSUM detects shifts, trend-fit is a global
    * slope, ACF reads seasonality; Holt tracks level AND trend
    * adaptively and emits tomorrow's forecast with its tracking error):
    * l_t = (y_t + 3(l+b)) div 4, b_t = ((l_t−l) + 3b) div 4 — exact
    * integer α=β=1/4 smoothing with TWO state components, so the fold
    * packs (level, trend) into one BIGINT and decodes raw-vs-packed by
    * magnitude ([[holtStep]]; the e_rate_limit machinery on a signed
    * two-field state). forecast_t = l_{t−1} + b_{t−1} via one lag over
    * the bounded trajectory; err_t = y_t − forecast_t (day 1 has no
    * forecast — NULLs replay identically). Field widths: daily counts
    * < 2^23 and |trend| < 2^23 — at 100 TB a per-series daily count can
    * exceed that; the fold then keys per (series, month) with wider
    * fields, like every packed-state ledger here.
    *
    * 100 TB shape: log → |days| rows at the first agg; the O(|days|²)
    * prefix folds run on the bounded day array (at scale: one fold per
    * series key).
    */
  private def holt(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val arr = daily
      .agg(array_sort(collect_list(struct(col("day"), col("y")))).as("ds"))
      .select(transform(col("ds"), x => x.getField("day")).as("days"),
        transform(col("ds"), x => x.getField("y")).as("ys"))
    val traj = arr.select(col("days"), col("ys"),
        expr(s"""transform(sequence(1, size(ys)), i ->
               |  aggregate(slice(ys, 2, i - 1), element_at(ys, 1),
               |    (acc, x) -> ${holtStep(spark = true)("acc", "x")}))"""
          .stripMargin.replace("\n", " ")).as("ps"))
      .select(explode(arrays_zip(col("days"), col("ys"), col("ps"))).as("r"))
      .select(col("r.days").as("day"), col("r.ys").as("y"),
        expr("IF(r.ps < 8388608, r.ps, (r.ps div 16777216) - 1048576)")
          .as("level"),
        expr("IF(r.ps < 8388608, CAST(0 AS BIGINT), (r.ps % 16777216) - 8388608)")
          .as("trend"))
    val w = Window.partitionBy(WindowUtil.onePartition(col("day")))
      .orderBy(col("day").asc)
    traj
      .withColumn("forecast", lag(col("level") + col("trend"), 1).over(w))
      .withColumn("err", col("y") - col("forecast"))
      .orderBy(col("day").asc)
  }

  /** EXACT PEARSON + SPEARMAN CORRELATION between the daily click and
    * purchase series — the cross-series dependence readout beside the
    * single-series family (ACF = self-dependence): both coefficients as
    * exact SIGNED r² in e6 units (r itself needs a sqrt; r² = num² /
    * (denx·deny) is an exact rational, and the sign is num's sign —
    * together they carry exactly what r does). Spearman handles TIES
    * properly by running the same Pearson sufficient statistics over
    * DOUBLED MIDRANKS r2 = 2·rank + cnt_eq − 1 (= twice the average
    * rank, always an integer; the textbook 1−6Σd²/... closed form is
    * tie-broken, this is the general definition). Products accumulate
    * in DECIMAL(38,0)/HUGEINT (num² at 100 TB daily volumes needs the
    * e_acf rescale note: at extreme per-day counts run it on weekly or
    * rate-scaled units). Ranks come from rank()+count() windows over
    * the BOUNDED day series (onePartition — |days| rows by
    * construction); the raw log pays one count aggregation.
    */
  private def correlation(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    def rank2(c: String) = {
      val wOrd = Window.partitionBy(WindowUtil.onePartition(col("day")))
        .orderBy(col(c).asc)
      val wEq = Window.partitionBy(col(c))
      lit(2L) * rank().over(wOrd) + count(lit(1)).over(wEq) - lit(1L)
    }
    val ranked = daily
      .withColumn("rx", rank2("x"))
      .withColumn("ry", rank2("y"))
    val st = ranked.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("rx")).as("tx"), sum(col("ry")).as("ty"),
      sum(col("rx") * col("ry")).as("txy"),
      sum(col("rx") * col("rx")).as("txx"),
      sum(col("ry") * col("ry")).as("tyy"))
    def r2e6(num: String, dx: String, dy: String) =
      (s"CASE WHEN ($dx) = 0 OR ($dy) = 0 THEN CAST(0 AS BIGINT) ELSE " +
        s"(1000000 * CAST($num AS DECIMAL(19,0)) * CAST($num AS DECIMAL(19,0)))" +
        s" div (CAST($dx AS DECIMAL(19,0)) * CAST($dy AS DECIMAL(19,0))) END")
    st.select(col("n").cast("long").as("n"),
        expr("CASE WHEN n * sxy - sx * sy > 0 THEN 1 " +
          "WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END").as("pearson_sign"),
        expr(r2e6("n * sxy - sx * sy",
          "n * sxx - sx * sx", "n * syy - sy * sy")).as("pearson_r2_e6"),
        expr("CASE WHEN n * txy - tx * ty > 0 THEN 1 " +
          "WHEN n * txy - tx * ty < 0 THEN -1 ELSE 0 END").as("spearman_sign"),
        expr(r2e6("n * txy - tx * ty",
          "n * txx - tx * tx", "n * tyy - ty * ty")).as("spearman_r2_e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_ab_test"       -> (abTest _),
    "e_correlation"   -> (correlation _),
    "e_holt"          -> (holt _),
    "e_acf"           -> (acf _),
    "e_cusum"         -> (cusum _),
    "e_wau"           -> (wau _),
    "e_attribution"   -> (attribution _),
    "e_rate_limit"    -> (rateLimit _),
    "e_ewma"          -> (ewma _),
    "e_locf"          -> (locf _),
    "e_transitions"   -> (transitions _),
    "e_trend_fit"     -> (trendFit _),
    "e_ivm_merge"     -> (ivmMerge _),
    "e_interval_join" -> (intervalJoin _),
    "e_scd2"          -> (scd2 _),
    "e_gapfill"       -> (gapfill _),
    "e_anomaly_days"  -> (anomalyDays _),
    "e_funnel"        -> (funnel _),
    "e_retention"     -> (retention _),
    "e_latest_state"  -> (latestState _),
    "e_tumbling_daily"-> (tumblingDaily _),
    "e_sessionize"    -> (sessionize _),
    "e_created_after" -> (createdAfter _),
    "e_json_extract"  -> (jsonExtract _),
    "e_zorder_layout" -> (zorderLayout _),
  )

  val oracles: Map[String, String] = Map(
    // e_acf: the identical n-scaled integer deviations; HUGEINT products
    // (SUM(BIGINT) is already HUGEINT), sign-safe truncating division
    "e_acf" ->
      """WITH b AS (SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
        |                  CAST(date_trunc('day', max(ts)) AS DATE) AS d1 FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |series AS (
        |  SELECT cal.day, COALESCE(y, 0) AS y FROM cal LEFT JOIN daily USING (day)),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(y) AS s FROM series),
        |dev AS (
        |  SELECT day, CAST(y * n - s AS HUGEINT) AS dev FROM series, st),
        |den AS (SELECT SUM(dev * dev) AS den FROM dev),
        |num AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS npairs,
        |         SUM(a.dev * b.dev) AS num0
        |  FROM dev a, (SELECT unnest(generate_series(1, 7)) AS lag) l,
        |       dev b
        |  WHERE b.day = a.day + CAST(lag AS INTEGER)
        |  GROUP BY lag)
        |SELECT CAST(lag AS INTEGER) AS lag, npairs,
        |       CAST(CASE WHEN num0 >= 0 THEN (1000000 * num0) // den
        |                 ELSE -((0 - 1000000 * num0) // den) END AS BIGINT) AS acf_e6
        |FROM num, den ORDER BY lag ASC""".stripMargin,
    // e_ab_test: identical hash-cohort split and rate-space score; the
    // only possibly-negative division input is squared first
    "e_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
        |              THEN 1 ELSE 0 END AS BIGINT) AS conv
        |  FROM events GROUP BY user_id),
        |co AS (
        |  SELECT CAST('0x' || substr(md5('exp1|' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS cohort,
        |         conv
        |  FROM pu),
        |g AS (
        |  SELECT cohort, CAST(count(*) AS BIGINT) AS users,
        |         CAST(SUM(conv) AS BIGINT) AS conv,
        |         CAST((1000000 * SUM(conv)) // count(*) AS BIGINT) AS rate_ppm
        |  FROM co GROUP BY cohort),
        |ab AS (
        |  SELECT a.users AS users_a, a.conv AS conv_a, a.rate_ppm AS rate_a_ppm,
        |         b.users AS users_b, b.conv AS conv_b, b.rate_ppm AS rate_b_ppm
        |  FROM (SELECT * FROM g WHERE cohort = 0) a,
        |       (SELECT * FROM g WHERE cohort = 1) b)
        |SELECT users_a, conv_a, rate_a_ppm, users_b, conv_b, rate_b_ppm,
        |       rate_a_ppm - rate_b_ppm AS diff_ppm,
        |       CAST(CASE WHEN rate_a_ppm + rate_b_ppm = 0 THEN 0
        |                 ELSE ((rate_a_ppm - rate_b_ppm) * (rate_a_ppm - rate_b_ppm))
        |                      // (rate_a_ppm + rate_b_ppm) END AS BIGINT) AS score
        |FROM ab""".stripMargin,
    // e_holt: the identical packed fold via list_reduce's native
    // first-element init; both decodes and the lag replayed
    "e_holt" ->
      s"""WITH daily AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(count(*) AS BIGINT) AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |arr AS (SELECT list(day ORDER BY day ASC) AS days,
         |               list(y ORDER BY day ASC) AS ys FROM daily),
         |idx AS (SELECT generate_subscripts(ys, 1) AS i, days, ys FROM arr),
         |tr AS (
         |  SELECT days[i] AS day, ys[i] AS y,
         |         CAST(list_reduce(ys[1:i],
         |           (acc, x) -> ${holtStep(spark = false)("acc", "x")}) AS BIGINT) AS p
         |  FROM idx),
         |dec AS (
         |  SELECT day, y,
         |         CAST(CASE WHEN p < 8388608 THEN p
         |              ELSE (p // 16777216) - 1048576 END AS BIGINT) AS level,
         |         CAST(CASE WHEN p < 8388608 THEN 0
         |              ELSE (p % 16777216) - 8388608 END AS BIGINT) AS trend
         |  FROM tr),
         |f AS (
         |  SELECT day, y, level, trend,
         |         lag(level + trend) OVER (ORDER BY day ASC) AS forecast
         |  FROM dec)
         |SELECT day, y, level, trend, forecast, y - forecast AS err
         |FROM f ORDER BY day ASC""".stripMargin,
    // e_correlation: identical doubled-midranks and sufficient stats;
    // SUM(BIGINT) is HUGEINT, the r2 numerator is a square (plain //)
    "e_correlation" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |rk AS (
        |  SELECT day, x, y,
        |         2 * rank() OVER (ORDER BY x ASC) + count(*) OVER (PARTITION BY x) - 1 AS rx,
        |         2 * rank() OVER (ORDER BY y ASC) + count(*) OVER (PARTITION BY y) - 1 AS ry
        |  FROM daily),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
        |         SUM(x*x) AS sxx, SUM(y*y) AS syy,
        |         SUM(rx) AS tx, SUM(ry) AS ty, SUM(rx*ry) AS txy,
        |         SUM(rx*rx) AS txx, SUM(ry*ry) AS tyy
        |  FROM rk)
        |SELECT n,
        |  CASE WHEN n*sxy - sx*sy > 0 THEN 1
        |       WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 0 END AS pearson_sign,
        |  CAST(CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN 0
        |       ELSE (1000000 * (n*sxy - sx*sy) * (n*sxy - sx*sy))
        |            // ((n*sxx - sx*sx) * (n*syy - sy*sy)) END AS BIGINT) AS pearson_r2_e6,
        |  CASE WHEN n*txy - tx*ty > 0 THEN 1
        |       WHEN n*txy - tx*ty < 0 THEN -1 ELSE 0 END AS spearman_sign,
        |  CAST(CASE WHEN (n*txx - tx*tx) = 0 OR (n*tyy - ty*ty) = 0 THEN 0
        |       ELSE (1000000 * (n*txy - tx*ty) * (n*txy - tx*ty))
        |            // ((n*txx - tx*tx) * (n*tyy - ty*ty)) END AS BIGINT) AS spearman_r2_e6
        |FROM st""".stripMargin,
    // e_cusum: identical clamped folds; a literal 0 is prepended so
    // list_reduce's first-element init IS the true S_0
    "e_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |arr AS (SELECT list(day ORDER BY day ASC) AS days,
        |               list(y ORDER BY day ASC) AS ys FROM daily),
        |idx AS (SELECT generate_subscripts(ys, 1) AS i, days, ys FROM arr),
        |traj AS (
        |  SELECT days[i] AS day, ys[i] AS y,
        |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ys[1:i]),
        |           (acc, x) -> greatest(CAST(0 AS BIGINT), acc + (x - 70))) AS BIGINT) AS cusum_up,
        |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ys[1:i]),
        |           (acc, x) -> greatest(CAST(0 AS BIGINT), acc + (60 - x))) AS BIGINT) AS cusum_dn
        |  FROM idx)
        |SELECT day, y, cusum_up, cusum_dn,
        |       cusum_up >= 12 AS alarm_up, cusum_dn >= 12 AS alarm_dn
        |FROM traj ORDER BY day ASC""".stripMargin,
    // e_wau: identical cover-day explode on the deduplicated user-day
    // frame; all counts non-negative so plain truncating //
    "e_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
        |cal AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |cover AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(day, LEAST(day + 6, (SELECT d1 FROM b)), INTERVAL 1 DAY)) AS DATE) AS rday
        |  FROM ud),
        |w AS (SELECT rday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM cover GROUP BY 1),
        |da AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM ud GROUP BY 1)
        |SELECT cal.day, COALESCE(da.dau, 0) AS dau, COALESCE(w.wau, 0) AS wau,
        |       CAST(CASE WHEN COALESCE(w.wau, 0) = 0 THEN 0
        |                 ELSE (1000000 * COALESCE(da.dau, 0)) // w.wau END AS BIGINT) AS stickiness_ppm
        |FROM cal LEFT JOIN w USING (day) LEFT JOIN da USING (day)
        |ORDER BY day ASC""".stripMargin,
    // e_attribution: identical IGNORE-NULLS carry + integer-microsecond
    // horizon + e4-unit revenue replay
    "e_attribution" ->
      """WITH wc AS (
        |  SELECT ts, event_type, value, epoch_us(ts) AS us,
        |         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_us
        |  FROM events),
        |p AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         (click_us IS NOT NULL AND click_us < us
        |          AND us - click_us <= 604800000000) AS is_attr,
        |         value
        |  FROM wc WHERE event_type = 'purchase')
        |SELECT day, CAST(count(*) AS BIGINT) AS purchases,
        |       CAST(sum(CASE WHEN is_attr THEN 1 ELSE 0 END) AS BIGINT) AS attributed,
        |       CAST(sum(CASE WHEN is_attr
        |                THEN CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
        |                ELSE 0 END) AS BIGINT) AS attributed_value_e4
        |FROM p GROUP BY day ORDER BY day ASC""".stripMargin,
    // e_rate_limit: the identical packed-state fold; list_reduce's raw
    // first-element init is decoded by magnitude inside the step
    "e_rate_limit" -> {
      def tok0(acc: String) =
        s"(CASE WHEN $acc < 8388608 THEN 2000 ELSE ($acc // 8388608) % 524288 END)"
      def adm0(acc: String) =
        s"(CASE WHEN $acc < 8388608 THEN 1 ELSE $acc // 4398046511104 END)"
      val t1 = s"least(3000, ${tok0("acc")} + ((x - acc % 8388608) * 5) // 216)"
      val step = s"(${adm0("acc")} + (CASE WHEN $t1 >= 1000 THEN 1 ELSE 0 END)) * 4398046511104" +
        s" + ($t1 - (CASE WHEN $t1 >= 1000 THEN 1000 ELSE 0 END)) * 8388608 + x"
      s"""WITH ev AS (
         |  SELECT user_id, epoch_ms(ts) // 1000 - 1704067200 AS rel FROM events),
         |arr AS (SELECT user_id, count(*) AS n_events,
         |               list(rel ORDER BY rel ASC) AS tss
         |        FROM ev GROUP BY 1),
         |f AS (SELECT user_id, n_events,
         |             list_reduce(tss, (acc, x) -> $step) AS fin
         |      FROM arr)
         |SELECT user_id, n_events,
         |  CAST(CASE WHEN fin < 8388608 THEN 1 ELSE fin // 4398046511104 END AS BIGINT) AS n_admitted,
         |  CAST(CASE WHEN fin < 8388608 THEN 2000 ELSE (fin // 8388608) % 524288 END AS BIGINT) AS tokens_milli,
         |  n_events - CAST(CASE WHEN fin < 8388608 THEN 1 ELSE fin // 4398046511104 END AS BIGINT) AS n_throttled
         |FROM f ORDER BY user_id ASC""".stripMargin
    },
    // e_ewma: list_reduce's first-element-init matches the Spark fold's
    // sentinel init; generate_subscripts per the no-lateral-series rule
    "e_ewma" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |arr AS (SELECT list(day ORDER BY day ASC) AS days,
        |               list(n ORDER BY day ASC) AS ys FROM daily),
        |idx AS (SELECT generate_subscripts(ys, 1) AS i, days, ys
        |        FROM arr),
        |traj AS (SELECT days[i] AS day, ys[i] AS n,
        |           CAST(list_reduce(ys[1:i],
        |             (acc, x) -> (7 * acc + x) // 8) AS BIGINT) AS ewma
        |         FROM idx),
        |t2 AS (SELECT day, n, ewma,
        |         lag(ewma) OVER (ORDER BY day ASC) AS prev_ewma FROM traj)
        |SELECT day, n, ewma,
        |       CASE WHEN prev_ewma IS NULL THEN false
        |            ELSE n * 2 > prev_ewma * 3 END AS is_spike
        |FROM t2 ORDER BY day ASC""".stripMargin,
    "e_locf" ->
      """WITH b AS (SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
        |                  CAST(date_trunc('day', max(ts)) AS DATE) AS d1 FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM events WHERE event_type = 'purchase' AND value >= 300
        |  GROUP BY 1)
        |SELECT cal.day, total,
        |       last_value(total IGNORE NULLS) OVER (
        |         ORDER BY cal.day ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_locf,
        |       total IS NULL AS is_imputed
        |FROM cal LEFT JOIN daily USING (day)
        |ORDER BY day ASC""".stripMargin,
    "e_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out
        |      FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, t.n_out,
        |       (c.n * 1000000) // t.n_out AS p_ppm
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type ASC, to_type ASC""".stripMargin,
    // e_trend_fit: sign-safe truncating division (DuckDB // floors
    // negatives; Spark div truncates toward zero)
    "e_trend_fit" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |x0 AS (SELECT min(day) AS d0 FROM daily),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(SUM(datediff('day', d0, day)) AS BIGINT) AS sx,
        |         CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(datediff('day', d0, day) * y) AS BIGINT) AS sxy,
        |         CAST(SUM(datediff('day', d0, day) * datediff('day', d0, day)) AS BIGINT) AS sxx
        |  FROM daily, x0 GROUP BY event_type),
        |f AS (SELECT event_type, n, sx, sy, sxy, sxx,
        |        1000000 * (n * sxy - sx * sy) AS num,
        |        n * sxx - sx * sx AS den
        |      FROM st)
        |SELECT event_type, n, sx, sy, sxy, sxx,
        |       CASE WHEN num >= 0 THEN num // den
        |            ELSE -((0 - num) // den) END AS slope6
        |FROM f ORDER BY event_type ASC""".stripMargin,
    "e_ivm_merge" ->
      """WITH b AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |         count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS t
        |  FROM events WHERE ts < TIMESTAMP '2024-01-20 06:00:00'
        |  GROUP BY 1, 2),
        |d2 AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |         count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS t
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-20 06:00:00'
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT COALESCE(b.day, d2.day) AS day,
        |         COALESCE(b.event_type, d2.event_type) AS event_type,
        |         CAST(COALESCE(b.n, 0) + COALESCE(d2.n, 0) AS BIGINT) AS n_m,
        |         CAST(COALESCE(b.t, 0) + COALESCE(d2.t, 0) AS DOUBLE) AS total_m
        |  FROM b FULL OUTER JOIN d2
        |    ON b.day = d2.day AND b.event_type = d2.event_type),
        |dir AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |         count(*) AS n_d,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_d
        |  FROM events GROUP BY 1, 2)
        |SELECT m.day, m.event_type, n_m, total_m, n_d, total_d
        |FROM m JOIN dir ON m.day = dir.day AND m.event_type = dir.event_type
        |ORDER BY m.day ASC, m.event_type ASC""".stripMargin,
    "e_interval_join" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT * FROM iv WHERE user_id % 2 = 0),
        |b AS (SELECT * FROM iv WHERE user_id % 2 = 1)
        |SELECT a.user_id, a.day,
        |       CAST(count(b.user_id) AS BIGINT) AS n_concurrent
        |FROM a LEFT JOIN b ON a.s_us <= b.e_us AND b.s_us <= a.e_us
        |GROUP BY 1, 2 ORDER BY a.user_id ASC, a.day ASC""".stripMargin,
    "e_scd2" ->
      """SELECT user_id, event_id, event_type AS state, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id
        |         ORDER BY ts ASC, event_id ASC) AS valid_to,
        |       lead(ts) OVER (PARTITION BY user_id
        |         ORDER BY ts ASC, event_id ASC) IS NULL AS is_current
        |FROM events WHERE user_id < 30
        |ORDER BY user_id ASC, valid_from ASC, event_id ASC""".stripMargin,
    "e_anomaly_days" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS tot FROM daily),
        |medr AS (SELECT n, row_number() OVER (ORDER BY n ASC, day ASC) AS rn
        |         FROM daily),
        |med AS (SELECT n AS med FROM medr, tot WHERE rn = (tot + 1) // 2),
        |dev AS (SELECT day, n, med, abs(n - med) AS dev FROM daily, med),
        |madr AS (SELECT dev, row_number() OVER (ORDER BY dev ASC, day ASC) AS rn
        |         FROM dev),
        |mad AS (SELECT dev AS mad FROM madr, tot WHERE rn = (tot + 1) // 2)
        |SELECT day, n, med, mad, dev, dev > mad * 3 AS is_anomaly
        |FROM dev, mad ORDER BY day ASC""".stripMargin,
    "e_gapfill" ->
      """WITH b AS (SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
        |                  CAST(date_trunc('day', max(ts)) AS DATE) AS d1 FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM events WHERE event_type = 'purchase' AND value >= 300
        |  GROUP BY 1)
        |SELECT cal.day, COALESCE(n, 0) AS n, COALESCE(total, 0.0) AS total,
        |       COALESCE(n, 0) = 0 AS is_gap
        |FROM cal LEFT JOIN daily USING (day) ORDER BY day ASC""".stripMargin,
    "e_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS prev_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS prev_ts
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.prev_ts
        |  GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS prev_ts
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.prev_ts
        |  GROUP BY e.user_id)
        |SELECT CAST(1 AS INTEGER) AS stage, CAST(count(*) AS BIGINT) AS n_users FROM t1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), CAST(count(*) AS BIGINT) FROM t2
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), CAST(count(*) AS BIGINT) FROM t3
        |ORDER BY stage ASC""".stripMargin,
    "e_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        |  FROM events)
        |SELECT c.cohort_week,
        |       CAST(datediff('day', CAST(c.cohort_week AS DATE), CAST(a.d AS DATE)) // 7 AS INTEGER) AS week_off,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM active a JOIN cohorts c USING (user_id)
        |GROUP BY c.cohort_week, week_off
        |ORDER BY cohort_week ASC, week_off ASC""".stripMargin,
    "e_latest_state" ->
      """SELECT user_id, event_id, event_type,
        |       CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id ASC""".stripMargin,
    "e_tumbling_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |       count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY day ASC, event_type ASC""".stripMargin,
    "e_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id ASC""".stripMargin,
    "e_created_after" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "e_json_extract" ->
      """SELECT event_id, CAST(props ->> '$.k' AS INTEGER) AS k
        |FROM events WHERE CAST(props ->> '$.k' AS INTEGER) >= 95
        |ORDER BY event_id ASC""".stripMargin,
    "e_zorder_layout" -> {
      val zSql = (0 until 8).map(i =>
        s"((ua >> $i) & 1) * ${1L << (2 * i)} + ((vb >> $i) & 1) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      s"""WITH base AS (
         |  SELECT ((user_id % 256) + 256) % 256 AS ua,
         |         ((CAST(floor(value) AS BIGINT) % 256) + 256) % 256 AS vb
         |  FROM events),
         |zc AS (SELECT ua, vb, $zSql AS zv FROM base)
         |SELECT CAST(zv // 1024 AS INTEGER) AS zbucket,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(min(ua) AS INTEGER) AS min_user_bucket,
         |       CAST(max(ua) AS INTEGER) AS max_user_bucket,
         |       CAST(min(vb) AS INTEGER) AS min_value_bucket,
         |       CAST(max(vb) AS INTEGER) AS max_value_bucket
         |FROM zc GROUP BY 1 ORDER BY zbucket ASC""".stripMargin
    },
  )
}
