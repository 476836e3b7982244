package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative contract for the four seeded/trained `no_oracle` engine
  * families (VERDICT r9 #6): each seeded top-10 must overlap BOTH its
  * md5-deterministic hash-checked sibling's top-10 AND the exact flat
  * top-10 by at least a recorded floor. The seeded paths were previously
  * rows-only (seeded Gaussian hyperplanes / Lloyd float trajectories are
  * not oracle-replayable); this spec pins their RESULT QUALITY to the
  * hash-verified siblings, so a regression that silently degraded the
  * seeded search (broken bucket probe, bad codebook train) now fails a
  * spec instead of passing a row count. Floors are the measured sf0.01
  * values minus slack, recorded in BASELINE.md (seeded paths are
  * deterministic run-to-run — fixed seeds — so the measured overlap is
  * stable; the slack covers corpus regeneration, not run noise).
  */
class SeededOverlapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.01"

  private def ids(name: String): Set[Int] =
    SparkEntry.queries(name)(spark, d).collect()
      .map(_.getInt(0)).toSet

  private lazy val exactTop = ids("x_engine_flat")

  // (seeded entry, det sibling, floor vs det, floor vs exact) — floors
  // are the measured sf0.01 overlap minus 2 (of 10); measured 2026-08-15:
  // lsh 5/8, ivf 4/4, pq_trained 5/7, ivfpq_trained 3/5 (det/exact).
  // See BASELINE.md r10 notes.
  private val families = Seq(
    ("x_engine_lsh", "x_engine_lsh_det", 3, 6),
    ("x_engine_ivf", "x_engine_ivf_det", 2, 2),
    ("x_engine_pq_trained", "x_engine_pq", 3, 5),
    ("x_engine_ivfpq_trained", "x_engine_ivfpq", 1, 3))

  for ((seeded, det, floorDet, floorExact) <- families)
    test(s"$seeded overlaps $det and the exact top-10 above the floor") {
      val sIds = ids(seeded)
      assert(sIds.size == 10, s"$seeded must return a full top-10")
      val dIds = ids(det)
      val nDet = (sIds intersect dIds).size
      val nExact = (sIds intersect exactTop).size
      info(s"$seeded: overlap vs $det = $nDet/10, vs exact = $nExact/10")
      assert(nDet >= floorDet,
        s"$seeded vs $det overlap $nDet < floor $floorDet")
      assert(nExact >= floorExact,
        s"$seeded vs exact overlap $nExact < floor $floorExact")
    }
}
