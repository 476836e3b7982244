package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** package-private internals of the dedup family: the connected-components
  * convergence guard and the session-cache lifecycle (release -> no pinned
  * blocks from these caches -> correct rebuild).
  */
class DedupInternalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("connectedComponents converges on a path graph and fails loudly when capped") {
    import spark.implicits._
    // path 0-1-2-3-4-5: diameter 5, so min-label propagation needs 5
    // rounds (+1 to observe no change)
    val nodes = (0L to 5L).toDF("doc_id")
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("a", "b")
    // localFinishCap = 0 forces the distributed star-contraction rounds
    // (the default cap would finish this 5-edge graph on the driver)
    val labels = DedupQueries.connectedComponents(nodes, pairs, "doc_id",
        localFinishCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 5L).forall(labels(_) == 0L))
    // a 2-round cap exits with labels still changing: an unconverged
    // labeling is WRONG, so the guard must throw, not return it
    val e = intercept[IllegalStateException] {
      DedupQueries.connectedComponents(nodes, pairs, "doc_id", maxRounds = 2,
        localFinishCap = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("releaseCaches drops this suite's pinned blocks and rebuilds correctly") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val q = DedupQueries.queries("d_minhash_bands")
    val first = q(spark, sfDir).collect().toSeq
    // the band checkpoint is resident now
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty)
    graft.Caches.releaseAll()
    // every block this library pinned is gone (other suites sharing the
    // JVM-wide context may have their own, hence the diff-vs-before)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
    // a released cache rebuilds from the source and matches
    val second = q(spark, sfDir).collect().toSeq
    assert(second == first)
    graft.Caches.releaseAll()
  }
}
