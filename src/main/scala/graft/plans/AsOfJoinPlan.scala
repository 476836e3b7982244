package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — the whole-operator extension
  * path (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), for the
  * one temporal operator Spark's built-ins can't express as a single
  * node. Semantics: left outer; for each left row, attach the right row
  * with the same key and the greatest time <= the left row's time
  * (inclusive, DuckDB `ASOF LEFT JOIN ... ON lk = rk AND lt >= rt`).
  *
  * Scale shape: both sides hash-cluster on the key and sort within
  * partitions by (key, time) — EnsureRequirements inserts the exchanges
  * and sorts — then a single forward merge walk per partition joins them
  * with O(1) state (ONE retained right row), never materializing a
  * per-key right-side buffer. Compare the composed formulation
  * (`e_asof_join`): union + running `last(when(...))` window, which
  * carries every right row through the window sort. Both are one shuffle
  * of each side; the custom node does strictly less per-row work and is
  * the natural home for a later range-partitioned variant.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lEval = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rEval = UnsafeProjection.create(Seq(rk, rt), rightOut)
      val outProj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      val rBuf = rIter.buffered
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      lIter.map { lrow =>
        val lkt = lEval(lrow)
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          outProj(joiner(lrow, nullRight))
        } else {
          val lKey = lkt.getLong(0); val lTime = lkt.getLong(1)
          var advance = true
          while (advance && rBuf.hasNext) {
            val peek = rEval(rBuf.head)
            if (!peek.isNullAt(0) && !peek.isNullAt(1) &&
                (peek.getLong(0) < lKey ||
                  (peek.getLong(0) == lKey && peek.getLong(1) <= lTime))) {
              val r = rBuf.next()
              val rKey = rEval(r).getLong(0)
              if (rKey == lKey) { lastMatch = r.copy(); lastMatchKey = rKey }
            } else if (peek.isNullAt(0) || peek.isNullAt(1)) {
              rBuf.next() // skip null-keyed right rows
            } else advance = false
          }
          val m = if (lastMatch != null && lastMatchKey == lKey) lastMatch
                  else nullRight
          outProj(joiner(lrow, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** DataFrame-level entry: `asofJoin(purchases, clicks, key, key, t, t)`.
    * Registers the planner strategy on the session (idempotent) and
    * builds the logical node from the analyzed children, so the key/time
    * Columns must come from the passed DataFrames (already resolved).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lkE = resolve(leftKey, left, "leftKey")
    val rkE = resolve(rightKey, right, "rightKey")
    val ltE = resolve(leftTime, left, "leftTime")
    val rtE = resolve(rightTime, right, "rightTime")
    val node = AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      lkE, rkE, ltE, rtE)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark, node)
  }

  /** The merge walk in AsOfJoinExec compares key/time via getLong, which
    * is only sound for long-backed physical types — reject anything else
    * at construction instead of silently producing garbage (ADVICE r2).
    * LongType and TimestampType (micros-as-long) qualify; IntegerType does
    * NOT (an int occupies different InternalRow storage — getLong on it is
    * undefined), nor do string/decimal.
    */
  private def resolve(c: Column, df: DataFrame, role: String): Expression = {
    val e = GraftColumnBridge.expression(c) transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        df.queryExecution.analyzed.output.filter(_.name == u.name) match {
          case Seq(one) => one
          case Seq()    => u // reported as unresolved below
          case many     => throw new IllegalArgumentException(
            s"asofJoin $role reference '${u.name}' is ambiguous: " +
              s"${many.size} columns share that name — select/alias first")
        }
    }
    val ok = e.resolved && (e.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    })
    if (!ok)
      throw new IllegalArgumentException(
        s"asofJoin $role must be LONG or TIMESTAMP-typed (long-backed), got " +
          (if (e.resolved) e.dataType.simpleString else s"unresolved: $e"))
    e
  }
}
