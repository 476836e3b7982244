package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{IndexConfig, VectorEngine}
import graft.queries.Tables

/** Scratch profiler for the engine e2e bench queries (not part of the
  * driver contract — delete when done).
  */
object ProfileScratch {
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

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobCount.get(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  ${jobCount.get() - j0} jobs")
      r
    }

    val fixedClock = () => Timestamp.valueOf("2026-01-01 00:00:00")
    val cfg = sys.env.getOrElse("PROF_INDEX", "lsh") match {
      case "ivf" => IndexConfig("ivf", ivfNumCentroids = 16, ivfNprobe = 4)
      case _     => IndexConfig("lsh", lshNumTables = 8, lshHyperplanesPerTable = 6)
    }
    val eng = new VectorEngine(spark,
      Files.createTempDirectory("graft-prof").toString, fixedClock)
    val lib = t("createLibrary")(eng.createLibrary("p", 64, cfg))
    val doc = t("createDocument")(eng.createDocument(lib))
    t("bulkIngest")(eng.bulkIngest(lib, doc, Tables.embeddings(spark, d).select(
      format_string("c%06d", col("vec_id")).as("id"),
      format_string("vec %d", col("vec_id")).as("text"),
      col("embedding"),
      array(concat(lit("label"), col("label"))).as("tags"))))
    val q = t("collect query vec")(Tables.embeddings(spark, d)
      .filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray)
    t("rebuildIndex")(eng.rebuildIndex(lib))
    t("search+collect 1")(eng.search(lib, q, k = 10).collect())
    t("search+collect 2")(eng.search(lib, q, k = 10).collect())
    t("exact scan")(Tables.embeddings(spark, d)
      .crossJoin(broadcast(Tables.embeddings(spark, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosineSim(col("embedding"), col("qvec")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10).collect())
    spark.stop()
  }
}
