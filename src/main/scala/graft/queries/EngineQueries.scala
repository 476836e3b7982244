package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ChunkIn, IndexConfig, SearchFilters, VectorEngine}
import graft.queries.Det.{rnd, rndSql}

/** End-to-end engine-path queries: the full reference lifecycle (create
  * library -> create document -> bulk upsert -> [rebuild index] -> search)
  * driven against the driver's `embeddings` table.
  *
  * `x_engine_flat*` is exact search, so the DuckDB oracle recomputes it
  * from the raw table — this proves the whole state-store + search stack,
  * not just the scoring expression. LSH/IVF results depend on seeded
  * hyperplanes / k-means, which no independent SQL engine can re-derive:
  * those entries are declared WITHOUT oracle SQL (driver rows-only check),
  * and their algorithm-level correctness is covered by EngineSpec.
  */
object EngineQueries {

  private val fixedClock = () => Timestamp.valueOf("2026-01-01 00:00:00")

  /** Ingest the embeddings table as one library via the DISTRIBUTED bulk
    * path (`bulkIngest` — the corpus never touches the driver; only the
    * single query vector is collected). Chunk id = c<vec_id> zero-padded
    * so lexicographic id order == numeric order for the Q7 tie-break;
    * tag = label<label>.
    */
  private def buildEngine(s: SparkSession, d: String,
      config: IndexConfig): (VectorEngine, String, Array[Float]) = {
    val eng = new VectorEngine(s,
      Files.createTempDirectory("graft-engine-q").toString, fixedClock)
    val lib = eng.createLibrary("engine-bench", 64, config)
    val doc = eng.createDocument(lib)
    eng.bulkIngest(lib, doc, Tables.embeddings(s, d).select(
      format_string("c%06d", col("vec_id")).as("id"),
      format_string("vec %d", col("vec_id")).as("text"),
      col("embedding"),
      array(concat(lit("label"), col("label"))).as("tags")))
    val q = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray
    (eng, lib, q)
  }

  /** ONE lazily built engine per (session, dataset, config family), index
    * already rebuilt — r2's bench conflated ingest+index-build fixed costs
    * with query latency by rebuilding a fresh engine inside EVERY
    * `x_engine_*` entry (x_lsh_recall rebuilt the exact engine
    * x_engine_lsh had just built). All entries are read-only against the
    * fixture, so sharing is sound; keying by session keeps Verify/Bench
    * runs in one JVM isolated.
    */
  private val fixtureCache = scala.collection.mutable.Map
    .empty[(SparkSession, String, String), (VectorEngine, String, Array[Float])]

  private def engineFixture(s: SparkSession, d: String,
      config: IndexConfig): (VectorEngine, String, Array[Float]) =
    fixtureCache.synchronized {
      fixtureCache.getOrElseUpdate((s, d, config.indexType), {
        val built = buildEngine(s, d, config)
        if (config.indexType != "flat") built._1.rebuildIndex(built._2)
        built
      })
    }

  private def hitsOut(hits: DataFrame): DataFrame =
    hits.select(
        expr("CAST(substring(chunk_id, 2, 10) AS INT)").as("vec_id"),
        rnd(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)

  private def engineFlat(s: SparkSession, d: String): DataFrame = {
    val (eng, lib, q) = engineFixture(s, d, IndexConfig("flat"))
    hitsOut(eng.search(lib, q, k = 10))
  }

  /** Post-filter through the engine: top-20, then tag ANY-overlap. */
  private def engineFlatFiltered(s: SparkSession, d: String): DataFrame = {
    val (eng, lib, q) = engineFixture(s, d, IndexConfig("flat"))
    hitsOut(eng.search(lib, q, k = 20,
      filters = Some(SearchFilters(tags = Seq("label0", "label2")))))
  }

  private def engineLsh(s: SparkSession, d: String): DataFrame = {
    // L=8, H=6: on this near-orthogonal corpus (nearest neighbors at
    // cosine ~0.4) high H makes sign-bucket collisions vanishingly rare;
    // 6 bits + multi-probe measures recall@10 = 0.8 (see BASELINE.md)
    val (eng, lib, q) = engineFixture(s, d,
      IndexConfig("lsh", lshNumTables = 8, lshHyperplanesPerTable = 6))
    hitsOut(eng.search(lib, q, k = 10))
  }

  private def engineIvf(s: SparkSession, d: String): DataFrame = {
    val (eng, lib, q) = engineFixture(s, d,
      IndexConfig("ivf", ivfNumCentroids = 16, ivfNprobe = 4))
    hitsOut(eng.search(lib, q, k = 10))
  }

  /** Recall@10 of the seeded LSH index vs the exact scan — the quality
    * metric BASELINE.md commits to measuring alongside latency. Rows-only
    * (hyperplanes are seeded RNG), but deterministic run-to-run.
    */
  private def lshRecall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (eng, lib, q) = engineFixture(s, d,
      IndexConfig("lsh", lshNumTables = 8, lshHyperplanesPerTable = 6))
    val approx = eng.search(lib, q, k = 10).collect()
      .map(r => r.getString(0)).toSet
    val exact = Tables.embeddings(s, d)
      .crossJoin(broadcast(Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))))
      .select(col("vec_id"),
        rnd(graft.functions.VectorFunctions.cosineSim(col("embedding"), col("qvec")), 6)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10).collect()
      .map(r => f"c${r.getLong(0)}%06d").toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    Seq((0L, recall, approx.size)).toDF("query_id", "recall_at_10", "n_hits")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_engine_flat"          -> (engineFlat _),
    "x_engine_flat_filtered" -> (engineFlatFiltered _),
    "x_engine_lsh"           -> (engineLsh _),
    "x_engine_ivf"           -> (engineIvf _),
    "x_lsh_recall"           -> (lshRecall _),
  )

  private val cosSql =
    "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)"

  val oracles: Map[String, String] = Map(
    "x_engine_flat" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${rndSql(cosSql, 6)} AS score
         |FROM embeddings e, q
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "x_engine_flat_filtered" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |topk AS (
         |  SELECT e.vec_id, e.label, ${rndSql(cosSql, 6)} AS score
         |  FROM embeddings e, q
         |  ORDER BY score DESC, vec_id ASC LIMIT 20)
         |SELECT vec_id, score FROM topk WHERE label IN (0, 2)
         |ORDER BY score DESC, vec_id ASC""".stripMargin,
    // x_engine_lsh / x_engine_ivf: seeded-RNG index paths — rows-only check.
  )
}
