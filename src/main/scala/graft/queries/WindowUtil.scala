package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Windows over BOUNDED inputs (a TakeOrdered-capped page, a <=C-row
  * centroid set, a ~1k-bin histogram) must run in one partition — that is
  * the point, the input is tiny by construction. `Window.partitionBy(
  * lit(0))` used to express that, but Spark 4's EliminateWindowPartitions
  * strips FOLDABLE partition keys, leaving an empty spec and making
  * WindowExec log the "all data to a single partition" warning as if an
  * unbounded table were being funneled. `onePartition(col)` is the same
  * single-partition spec via a non-foldable expression (pmod(hash(c), 1)
  * == 0 for every row), which the rule cannot strip — the plan says what
  * it means: one partition, on purpose, over bounded rows.
  */
object WindowUtil {
  def onePartition(c: Column): Column = pmod(hash(c), lit(1))
}
