package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the dedup pair queries (delete when done). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    for (q <- Seq("d_minhash_bands", "d_minhash_pairs", "d_simhash_pairs",
        "d_jaccard_pairs"); rep <- 1 to 2)
      t(s"$q#$rep")(SparkEntry.queries(q)(spark, d).count())
    println(SparkEntry.queries("d_simhash_pairs")(spark, d).queryExecution.executedPlan
      .toString.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
