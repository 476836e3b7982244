package graft.index

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Schemas
import graft.functions.VectorFunctions._

/** Random-hyperplane (cosine) LSH as derived DataFrames — the Spark
  * re-expression of the reference's `indexing/lsh.py`.
  *
  *   - Hyperplanes: L tables x H planes ~ N(0,1), generated DRIVER-side
  *     from a fixed seed (reproducible regardless of executor parallelism,
  *     FIXTURES.md §4) and persisted to the `lsh_planes` table.
  *   - Signatures: H sign-bits of plane dots packed into a long
  *     (`lsh.py:20-25`); H is capped at 63 to fit (the reference DTO
  *     nominally allows 512 but its own model caps at 64).
  *   - Buckets: `(library_id, table_id, signature, chunk_id,
  *     embedding_norm)` — zero vectors are EXCLUDED (normalize -> null,
  *     quirk Q4). Stored vectors are L2-normalized (quirk Q1): rerank uses
  *     the normalized stored vector against the UNNORMALIZED query.
  *
  * Scale shape: the bucket table is an equi-join target on
  * `(table_id, signature)` — candidate generation is a hash join that
  * touches only matching buckets, never the corpus. The signature
  * computation itself is one codegen'd expression over the scan.
  */
object LshIndex {

  val Oversample = 6 // reference LSH_OVERSAMPLE, lsh.py:10

  /** Deterministic hyperplanes: `Random(seed)` gaussians, table-major. */
  def makePlanes(spark: SparkSession, libraryId: String, numTables: Int,
      planesPerTable: Int, dim: Int, seed: Long = 42L): DataFrame = {
    val rnd = new Random(seed)
    val rows = for {
      t <- 0 until numTables
      p <- 0 until planesPerTable
    } yield org.apache.spark.sql.Row(
      libraryId, t, p, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.lshPlanes)
  }

  /** CONTENT-DERIVED deterministic hyperplanes ("lsh_det" mode): component
    * (t, p, j) = md5("lshdet|t|p|j") -> first 15 hex chars -> long ->
    * scaled to [-1, 1) -> float. Not Gaussian (uniform per component), but
    * random-hyperplane LSH only needs direction diversity — and unlike the
    * seeded-Random planes this derivation is pure arithmetic over md5, so
    * an independent SQL engine (the DuckDB oracle) replays the ENTIRE
    * build+search pipeline bit-for-bit. Every op below (long->double,
    * /2^60, *2-1, ->float) is a correctly-rounded IEEE step that DuckDB
    * performs identically.
    */
  def makePlanesDet(spark: SparkSession, libraryId: String, numTables: Int,
      planesPerTable: Int, dim: Int): DataFrame = {
    val rows = for {
      t <- 0 until numTables
      p <- 0 until planesPerTable
    } yield org.apache.spark.sql.Row(
      libraryId, t, p,
      (0 until dim).map { j =>
        val hex = md5Hex(s"lshdet|$t|$p|$j").substring(0, 15)
        (java.lang.Long.parseLong(hex, 16).toDouble /
          (1L << 60).toDouble * 2.0 - 1.0).toFloat
      })
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.lshPlanes)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Signature of `vec` against one table's planes (plane-id ascending):
    * bit i set iff dot(vec, plane_i) >= 0 (`lsh.py:20-25`).
    */
  def signatureOf(vec: Array[Float], planes: Seq[Array[Float]]): Long =
    planes.zipWithIndex.foldLeft(0L) { case (sig, (p, i)) =>
      var dot = 0.0
      var j = 0
      while (j < vec.length) { dot += vec(j).toDouble * p(j).toDouble; j += 1 }
      if (dot >= 0.0) sig | (1L << i) else sig
    }

  /** Build bucket rows for `chunks` (id, embedding): normalize, drop zero
    * vectors, one row per (chunk, table) with the packed signature.
    * The planes are broadcast as literals inside the expression — at scale
    * this is a map-only stage over the chunk scan.
    */
  def buildBuckets(chunksDf: DataFrame, planesDf: DataFrame, libraryId: String): DataFrame = {
    val planes = collectPlanes(planesDf)
    val normed = chunksDf
      .filter(col("embedding").isNotNull)
      .select(col("id").as("chunk_id"),
        l2Normalize(col("embedding")).as("vnorm"))
      .filter(col("vnorm").isNotNull)
      .select(col("chunk_id"),
        transform(col("vnorm"), _.cast("float")).as("embedding_norm"))
    // ONE pass over the corpus: all L signatures are computed in a single
    // projection (L·H codegen'd dot products per row) and exploded to L
    // bucket rows — not L separate scans unioned (which re-reads and
    // re-normalizes the corpus L times)
    val sigStructs = planes.map { case (tableId, tablePlanes) =>
      val sigBits = tablePlanes.zipWithIndex.map { case (p, i) =>
        when(dotProduct(col("embedding_norm"),
          typedLit(p.toSeq)) >= 0.0, lit(1L << i)).otherwise(lit(0L))
      }
      struct(lit(tableId).as("table_id"), sigBits.reduce(_ + _).as("signature"))
    }
    normed
      .select(col("chunk_id"), col("embedding_norm"),
        explode(array(sigStructs: _*)).as("ts"))
      .select(
        lit(libraryId).as("library_id"),
        col("ts.table_id").as("table_id"),
        col("ts.signature").as("signature"),
        col("chunk_id"), col("embedding_norm"))
  }

  /** (table_id -> planes ordered by plane_id); driver-side, tiny. */
  def collectPlanes(planesDf: DataFrame): Seq[(Int, Seq[Array[Float]])] =
    planesDf.orderBy(col("table_id"), col("plane_id"))
      .collect()
      .map(r => (r.getInt(1), r.getSeq[Float](3).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, ps) => (t, ps.map(_._2).toSeq) }

  /** Candidate chunk ids for a query (reference `lsh.py:80-110`):
    * per-table signature equi-join, union+dedup, cap at 6k (deterministic
    * chunk_id order where the reference relies on set order, Q7), then the
    * <k fallback pad from all indexed vectors up to 2k.
    */
  def candidates(bucketsDf: DataFrame, query: Array[Float],
      planes: Seq[(Int, Seq[Array[Float]])], k: Int): DataFrame = {
    val spark = bucketsDf.sparkSession
    import spark.implicits._
    val qnorm = normalizeDriver(query)
    require(qnorm.isDefined, "zero-vector query handled by caller")
    // multi-probe (extension beyond the reference's single-probe
    // `lsh.py:89-93`): also probe every signature at Hamming distance 1 —
    // L x (H+1) probe keys, still a tiny broadcast, but neighbors that
    // differ by one marginal hyperplane now surface. Measured recall@10 on
    // sf0.01 embeddings at L=8,H=12: 0.2 (single-probe) -> see BASELINE.
    val sigs = planes.flatMap { case (t, ps) =>
      val s = signatureOf(qnorm.get, ps)
      (t, s) +: ps.indices.map(i => (t, s ^ (1L << i)))
    }
    val sigDf = sigs.toDF("table_id", "signature")
    // Rank candidates by multiplicity (how many tables matched) before the
    // oversample cap — a documented improvement over the reference, which
    // truncates in arbitrary Python-set order (`lsh.py:94-98`): multi-table
    // matches are likelier true neighbors, so the cap keeps the best
    // candidates instead of arbitrary ones. Deterministic total order:
    // (matches desc, chunk_id asc). Measured recall@10 on the sf0.01
    // embeddings: 0.2 -> 0.9 at L=8,H=12.
    // localCheckpoint: the bucket join + rank runs ONCE — the <k fallback
    // decision below needs an eager count, and without materialization the
    // whole join would re-run when the rerank consumes the candidates
    val fromBuckets = bucketsDf
      .join(broadcast(sigDf), Seq("table_id", "signature"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_matches"), first(col("embedding_norm")).as("embedding_norm"))
      .orderBy(col("n_matches").desc, col("chunk_id").asc)
      .limit(Oversample * k)
      .select(col("chunk_id"), col("embedding_norm"))
      .localCheckpoint()
    graft.Caches.track(fromBuckets) // released at suite end (lazy result reads it)
    val have = fromBuckets.count()
    if (have >= k) fromBuckets
    else {
      // pad from the full indexed set, up to 2k total (lsh.py:101-110)
      val pad = bucketsDf.select(col("chunk_id"), col("embedding_norm"))
        .dropDuplicates("chunk_id")
        .join(fromBuckets.select("chunk_id"), Seq("chunk_id"), "left_anti")
        .orderBy(col("chunk_id").asc)
        .limit((2 * k - have).toInt.max(0))
      fromBuckets.unionAll(pad)
    }
  }

  def normalizeDriver(v: Array[Float]): Option[Array[Float]] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    if (n == 0.0) None else Some(v.map(x => (x / n).toFloat))
  }
}
