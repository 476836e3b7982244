package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding.
  *
  * `round(double, n)` is NOT portable: Spark rounds the exact binary value
  * through BigDecimal HALF_UP, while DuckDB multiplies by 10^n and rounds
  * the (error-carrying) product — they disagree on values near a half-ulp
  * boundary (observed: 0.505619 vs 0.505618 on a stopword ratio).
  *
  * `floor(x * 10^n + 0.5) / 10^n` is pure IEEE double arithmetic, so any
  * engine computes the identical bit pattern. Use `rnd`/`rndSql` as a PAIR
  * — the Spark expression and the oracle SQL must share the formulation,
  * not just the nominal precision.
  */
object Det {
  private def p10(n: Int): Double = math.pow(10, n)

  def rnd(c: Column, n: Int): Column =
    floor(c * p10(n) + 0.5) / p10(n)

  def rndSql(e: String, n: Int): String =
    s"(floor(($e) * ${p10(n)} + 0.5) / ${p10(n)})"
}
