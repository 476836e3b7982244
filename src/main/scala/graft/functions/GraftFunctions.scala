package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the custom kernels: after `register(spark)`,
  * `vec_dot`, `vec_cosine`, `vec_l2_dist`, and `set_intersect_count` are
  * callable from `spark.sql` text — the engine's function surface is
  * available to SQL users, not just the DataFrame API.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine",
      exprs => VecCosine(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_l2_dist",
      exprs => VecL2Dist(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("set_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
  }
}
