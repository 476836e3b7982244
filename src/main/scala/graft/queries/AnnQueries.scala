package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.Det.{rnd, rndSql}

/** Oracle-checkable approximate-nearest-neighbor paths + an as-of join.
  *
  * `v_ann_ivf`: the IVF search SHAPE (centroids -> postings -> nprobe
  * pruning -> exact rerank) made fully deterministic WITHOUT RNG: the C
  * "centroids" are the embeddings of the C vectors with the smallest
  * md5(vec_id) (a content-derived pseudo-random sample — exactly what a
  * seeded k-means init does, minus the iterations). Because every step is
  * pure SQL, DuckDB replays the whole index build + search and the result
  * is hash-compared — the strongest possible check on the partition-prune
  * + rerank machinery that the seeded engine IVF also uses.
  *
  * `e_asof_join`: each purchase matched to the user's most recent prior
  * click. Spark composes it from a union + running-last window (one
  * shuffle on user_id); the oracle uses DuckDB's NATIVE `ASOF JOIN` — two
  * entirely different implementations agreeing row-for-row.
  */
object AnnQueries {

  private val C = 8      // pseudo-centroids
  private val NPROBE = 2

  private def annIvf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // pseudo-centroids: C smallest md5(vec_id), normalized
    val cents = e.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h").asc).limit(C)
      .select(col("vec_id").as("centroid_of"), l2Normalize(col("embedding")).as("cvec"))
      .withColumn("centroid_id",
        // <= C rows; constant partition key avoids the global-window path
        row_number().over(Window.partitionBy(lit(0)).orderBy(col("centroid_of").asc)))
    // assignment: argmax dot(embedding, centroid), earliest centroid on ties
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("dot").desc, col("centroid_id").asc)
    val postings = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        rnd(dotProduct(col("embedding"), col("cvec")), 6).as("dot"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    // query vec 0: top-NPROBE centroids
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val topCent = cents.crossJoin(broadcast(q))
      .select(col("centroid_id"),
        rnd(dotProduct(col("qvec"), col("cvec")), 6).as("cdot"))
      .orderBy(col("cdot").desc, col("centroid_id").asc)
      .limit(NPROBE)
    // candidates = postings of probed centroids; exact rerank top-10
    postings
      .join(broadcast(topCent.select("centroid_id")), Seq("centroid_id"), "left_semi")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        rnd(cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  private def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val tagged = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // running last click per user: order by (ts, click-before-purchase)
    // so an equal-ts click is visible to the purchase — matching ASOF's
    // INCLUSIVE ts >= semantics — then event_id for a total order
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc,
        when(col("event_type") === "click", 0).otherwise(1).asc,
        col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("last_click_ts"),
        when(col("last_click_ts").isNotNull,
          expr("(unix_micros(ts) - unix_micros(last_click_ts)) div 1000000"))
          .as("gap_s"))
      .orderBy(col("event_id").asc)
  }

  /** The same as-of semantics through the CUSTOM operator
    * (`graft.plans.AsOfJoin`: LogicalPlan + Strategy + SparkPlan, merge
    * walk over co-clustered sorted partitions) — same oracle as
    * `e_asof_join` proves the custom node against DuckDB's native ASOF.
    */
  private def asofCustom(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOfJoinPlan.asofJoin(purchases, clicks,
        purchases("user_id"), clicks("c_user"), purchases("ts"), clicks("c_ts"))
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("c_ts").as("last_click_ts"),
        when(col("c_ts").isNotNull,
          expr("(unix_micros(ts) - unix_micros(c_ts)) div 1000000")).as("gap_s"))
      .orderBy(col("event_id").asc)
  }

  /** Cube over two dimensions (grouping-sets family). */
  private def cubePricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,8)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_ann_ivf"   -> (annIvf _),
    "e_asof_join" -> (asofJoin _),
    "e_asof_custom" -> (asofCustom _),
    "q_cube"      -> (cubePricing _),
  )

  val oracles: Map[String, String] = Map(
    "v_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |seeds AS (
         |  SELECT vec_id AS centroid_of, emb FROM e
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC LIMIT $C),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY centroid_of ASC) AS centroid_id,
         |         list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb))) AS cvec
         |  FROM seeds),
         |assign AS (
         |  SELECT vec_id, emb, centroid_id,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY ${rndSql("list_dot_product(emb, cvec)", 6)} DESC, centroid_id ASC) AS rn
         |  FROM e, cents),
         |postings AS (SELECT vec_id, emb, centroid_id FROM assign WHERE rn = 1),
         |q AS (SELECT emb AS qv FROM e WHERE vec_id = 0),
         |topcent AS (
         |  SELECT centroid_id FROM cents, q
         |  ORDER BY ${rndSql("list_dot_product(q.qv, cvec)", 6)} DESC, centroid_id ASC
         |  LIMIT $NPROBE)
         |SELECT p.vec_id, ${rndSql("list_cosine_similarity(p.emb, q.qv)", 6)} AS score
         |FROM postings p, q
         |WHERE p.centroid_id IN (SELECT centroid_id FROM topcent) AND p.vec_id <> 0
         |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "e_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
        |       c.ts AS last_click_ts,
        |       CASE WHEN c.ts IS NOT NULL
        |            THEN (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 END AS gap_s
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id ASC""".stripMargin,
    "e_asof_custom" ->
      """SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
        |       c.ts AS last_click_ts,
        |       CASE WHEN c.ts IS NOT NULL
        |            THEN (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 END AS gap_s
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id ASC""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
  )
}
