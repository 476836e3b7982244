package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SortedIntersectCount, VecCosine, VecDot, VecL2Dist}

/** `SparkSessionExtensions` entry point: sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` get the engine's codegen
  * kernels as BUILT-IN SQL functions (catalog-resolvable, no per-session
  * `register` call) — the deployment shape for a shared cluster where
  * users submit plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of two float arrays"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity (zero vectors -> 0.0)"),
      (exprs: Seq[Expression]) => VecCosine(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_l2_dist"),
      info("vec_l2_dist", "vec_l2_dist(a, b) - euclidean distance"),
      (exprs: Seq[Expression]) => VecL2Dist(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("set_intersect_count"),
      info("set_intersect_count",
        "set_intersect_count(a, b) - |A inter B| of sorted distinct long arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
  }
}
