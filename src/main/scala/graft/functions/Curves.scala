package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Space-filling-curve arithmetic over a fixed 32 x 32 bucket grid — ONE
  * implementation shared by the layout-audit entries
  * ([[graft.queries.SourceQueries]], which also emits the DuckDB oracle
  * CTEs from the same templates) and the engine's physical layout rewrite
  * ([[graft.engine.VectorEngine.optimizeLayout]]). Everything is plain
  * integer DIV/%/CASE arithmetic — no bit intrinsics — so the identical
  * template renders as a Spark `selectExpr` (divOp = "DIV") and as DuckDB
  * SQL (divOp = "//") and the two engines cannot drift.
  */
object Curves {

  /** Buckets per dimension (5 bits; curve keys span [0, 1024)). */
  val Grid = 32

  /** Morton z-value of bucket columns `cb`, `db`: the two 5-bit bucket ids
    * bit-interleaved into a 10-bit key (cb bits land at odd positions).
    */
  def zInterleaveExpr(divOp: String): String =
    (0 until 5).map { i =>
      s"((cb $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)}" +
        s" + ((db $divOp ${1L << i}) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** One unrolled round of the classic Hilbert xy→d rotate-and-reflect
    * recurrence at step size `s`.
    *
    * rx = bit s of x, ry = bit s of y; dInc = s^2 * ((3*rx) XOR ry)
    * spelled as a CASE over rx*2+ry (values 0,1,3,2); rotation (the
    * classic rot()): when ry = 0 -> reflect with the FULL grid width
    * (x' = rx = 1 ? N-1-y : y) — N-1-v complements every bit of v, so
    * the low bits later rounds read are the same as s-1-v would give,
    * but the value stays in [0, N) where s-1-v would go NEGATIVE for
    * full-width coordinates and break the DIV/% bit reads (caught by
    * the bijectivity spec — the oracle alone could NOT catch it, since
    * it replays the same template).
    */
  case class HRound(s: Long) {
    def exprs(x: String, y: String, d: String, divOp: String,
        xo: String, yo: String, dout: String): Seq[String] = {
      val nm1 = Grid - 1
      val rx = s"(($x $divOp $s) % 2)"
      val ry = s"(($y $divOp $s) % 2)"
      val term = s"(CASE $rx * 2 + $ry WHEN 0 THEN 0 WHEN 1 THEN 1 " +
        s"WHEN 2 THEN 3 ELSE 2 END)"
      Seq(
        s"$d + ${s * s} * $term AS $dout",
        s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $nm1 - $y " +
          s"ELSE $y END) ELSE $x END AS $xo",
        s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $nm1 - $x " +
          s"ELSE $x END) ELSE $y END AS $yo")
    }
  }

  val HRounds: Seq[HRound] = Seq(16L, 8L, 4L, 2L, 1L).map(HRound.apply)

  /** Appends `hd` (the order-5 Hilbert index of the `cb`, `db` bucket
    * columns) via the five unrolled rounds.
    */
  def hilbertOf(df: DataFrame): DataFrame = {
    var b = df.withColumn("x0", col("cb")).withColumn("y0", col("db"))
      .withColumn("d0", lit(0L))
    HRounds.zipWithIndex.foreach { case (r, i) =>
      // one selectExpr per round; the SAME template emits the oracle CTEs
      b = b.selectExpr((b.columns.toSeq ++ r.exprs(s"x$i", s"y$i", s"d$i",
        "DIV", s"x${i + 1}", s"y${i + 1}", s"d${i + 1}")): _*)
    }
    b.withColumn("hd", col("d5"))
  }

  /** The five Hilbert rounds as nested subselects over `from` (a relation
    * exposing `cb`, `db`), emitted from the SAME [[HRound.exprs]] template
    * the Spark plan uses (DuckDB `//` for Spark `DIV`).
    */
  def hilbertRoundsSql(from: String): String =
    HRounds.zipWithIndex.foldLeft(
      s"SELECT *, cb AS x0, db AS y0, CAST(0 AS BIGINT) AS d0 FROM $from") {
      case (inner, (r, i)) =>
        val es = r.exprs(s"x$i", s"y$i", s"d$i", "//",
          s"x${i + 1}", s"y${i + 1}", s"d${i + 1}")
        s"SELECT *, ${es.mkString(", ")} FROM ($inner)"
    }
}
