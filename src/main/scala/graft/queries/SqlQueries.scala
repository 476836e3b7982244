package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `spark.sql` entry point: these queries register the driver tables
  * as temp views and run ANSI SQL that is VERBATIM-identical to the oracle
  * SQL (one string, two engines) — subquery decorrelation (EXISTS / IN /
  * scalar subqueries) is Catalyst's job, not hand-written join code.
  *
  * Float determinism: every money/quantity output is integer units
  * (BIGINT cents via round(x*100) on the exact-cent DOUBLE columns, or
  * BIGINT quantities) — never a DECIMAL cast on a DOUBLE column, whose
  * rounding is a per-DuckDB-build choice (the r7/r8 sql_returned_revenue
  * red hash), and never a float sum whose value depends on partition
  * order.
  *
  * CONVENTION (r9 judge root-cause): every integer aggregate in a FINAL
  * projection — plain or windowed — must be wrapped `CAST(SUM(...) AS
  * BIGINT)`. DuckDB promotes SUM(BIGINT) to HUGEINT (int128) while Spark
  * keeps LongType; the driver's hash compare tolerates INTEGER↔BIGINT
  * width drift but NOT HUGEINT↔BIGINT, so an uncast final SUM hashes red
  * with byte-identical values (the only two r9 reds were exactly the two
  * uncast final SUMs here). The earlier DECIMAL-rounding theory explained
  * the r8 red only; the HUGEINT promotion is the r9 mechanism.
  */
object SqlQueries {

  private val sqls: Map[String, String] = Map(
    "sql_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey ASC""".stripMargin,
    "sql_in_subquery" ->
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
        |  AND p_size >= 30
        |ORDER BY p_partkey ASC""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM events) AS share
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    // TPC-H Q10 shape: revenue of returned items per customer, top 20.
    // Revenue is emitted as BIGINT ten-thousandths (e4 units) derived with
    // ZERO decimal casts: prices/discounts are exact cent multiples stored
    // as DOUBLE, so round(x*100) recovers the integer cents bit-identically
    // on both engines, and revenue_e4 = cents * (100 - disc_cents) is pure
    // BIGINT arithmetic from there. The final SUM is CAST(... AS BIGINT)
    // per the header convention: DuckDB promotes SUM(BIGINT) to HUGEINT
    // (the r9 red-hash mechanism), Spark stays LongType — the wrapper
    // pins both engines to the same 64-bit result type.
    "sql_returned_revenue" ->
      """SELECT c_custkey,
        |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |       count(*) AS n_items
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |     JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey
        |ORDER BY revenue_e4 DESC, c_custkey ASC LIMIT 20""".stripMargin,
    // TPC-H Q18 shape (large-volume orders): the GROUP BY ... HAVING
    // semi-join pattern — membership computed by an aggregate subquery.
    // Quantities are integral by data contract, so sums are exact BIGINT.
    "sql_big_orders" ->
      """SELECT c_custkey, o_orderkey,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |     JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        |GROUP BY c_custkey, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    // TPC-H Q17 shape (small-quantity revenue): correlated per-part
    // average rewritten multiplicatively (qty*5*cnt < sum) so the whole
    // predicate is exact integer arithmetic — no decimal AVG, whose
    // division rounding differs across engines. Catalyst/DuckDB both
    // decorrelate the two scalar subqueries into one per-part aggregate
    // join; revenue follows the e4-unit convention via integer cents
    // (round(x*100), zero DECIMAL casts — the sql_returned_revenue rule).
    "sql_small_qty_revenue" ->
      """SELECT CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |            * 100), 0) AS BIGINT) AS revenue_e4,
        |       count(*) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_size = 1
        |  AND CAST(l.l_quantity AS BIGINT) * 5 *
        |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT SUM(CAST(l3.l_quantity AS BIGINT))
        |       FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)""".stripMargin,
    // VALUE-RANGE window frame (RANGE, not ROWS): per customer, the
    // rolling exact sum over orders whose key lies within 5 of the
    // current one — the frame the ROWS variants can't express. Output is
    // BIGINT cents (round(x*100)); the windowed SUM is CAST(... AS
    // BIGINT) per the header convention (DuckDB HUGEINT promotion applies
    // to window SUMs too — this entry went red in r9 when the cast was
    // dropped).
    "sql_range_window" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_sum_e2
        |FROM orders
        |ORDER BY o_orderkey ASC""".stripMargin,
    // Above-1.5x-the-customer-mean filter, decimal-free: integer cents,
    // and the mean comparison multiplied out (2*p*cnt > 3*tot) so the
    // whole predicate is exact BIGINT — no division, no DOUBLE compare.
    "sql_above_avg_window" ->
      """WITH w AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS p_e2,
        |         SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |           OVER (PARTITION BY o_custkey) AS tot_e2,
        |         COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, p_e2
        |FROM w
        |WHERE 2 * p_e2 * cnt > 3 * tot_e2
        |ORDER BY o_orderkey ASC""".stripMargin,
  )

  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.events(s, d).createOrReplaceTempView("events")
    s.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sqls.map { case (name, q) =>
      name -> ((s: SparkSession, d: String) => withViews(s, d)(q))
    }

  /** Same text, verbatim. */
  val oracles: Map[String, String] = sqls
}
