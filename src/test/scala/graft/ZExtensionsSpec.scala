package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `GraftExtensions` e2e: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the engine's
  * kernels as catalog functions from plain SQL, with no register() call.
  *
  * Named Z* so it runs after the other (sequentially executed, forked-JVM)
  * suites: it must STOP any active session — extensions only apply at
  * session construction — and later suites would inherit the stopped
  * context otherwise.
  */
class ZExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions injects SQL kernels") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT vec_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c,
          |       vec_dot(array(CAST(2.0 AS FLOAT)), array(CAST(5.0 AS FLOAT))) AS d,
          |       vec_l2_dist(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS l2,
          |       set_intersect_count(array(1L, 5L, 9L), array(5L, 9L, 11L)) AS n
          |""".stripMargin).collect().head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getDouble(1) == 10.0)
      assert(r.getDouble(2) == 5.0)
      assert(r.getInt(3) == 2)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
