package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions.cosineSim
import graft.queries.Det.{rnd, rndSql}

/** Retrieval suite: lexical BM25 ranking, hybrid lexical+vector fusion
  * (reciprocal-rank fusion), and DSIR-style importance weighting — the
  * retrieval/data-selection half a production vector store pairs with its
  * ANN search (the reference covers only the vector side; hybrid search is
  * the standard extension, and DSIR is the modern data-selection step of
  * training-corpus assembly).
  *
  * Cross-engine determinism follows the suite-wide discipline: `ln` is not
  * IEEE-correctly-rounded, so every log lands as a FLOORED integer
  * nano-nat BEFORE any sum; per-doc accumulation is exact BIGINT
  * arithmetic on both engines, and only final presentation divisions are
  * floating (rounded with the shared [[Det.rnd]]/[[Det.rndSql]] pair).
  *
  * Scale shape: BM25 is two keyed aggregations (term df over the
  * query-term-filtered postings, then a per-doc sum) with the |terms|-row
  * idf table and the 2-value corpus stats broadcast — the corpus never
  * shuffles except by doc_id for the final per-doc agg, and the top-k is
  * TakeOrderedAndProject, never a global sort. The fusion joins two
  * k-row rankings (k=20) — metadata-scale regardless of corpus size.
  */
object RetrievalQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  private def toks = tokens(col("text"))

  /** The fixed lexical query — four terms present in the corpus vocab
    * (shared with the engine hybrid-verb entry in [[EngineQueries]]).
    */
  private[queries] val QueryTerms = Seq("spark", "table", "join", "window")
  private val TopK = 20

  /** BM25 scoring frame (doc_id, n_tokens, n_hit, s9): Robertson
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1), k1 = 1.2, b = 0.75. Each
    * (doc, term)'s contribution is floor(idf9 * tf_part) — idf9 is an
    * integer nano-nat, tf_part a single-expression double both engines
    * evaluate with the identical association — so the per-doc score sum
    * is exact long arithmetic. Only docs containing >= 1 query term
    * appear (inner join on the filtered postings).
    */
  private def bm25Scores(s: SparkSession, d: String): DataFrame =
    graft.retrieval.RetrievalCore.bm25ScoresOf(docs(s, d), "doc_id", QueryTerms)

  /** BM25 TOP-K RETRIEVAL — the lexical ranking of hybrid search. */
  private def bm25(s: SparkSession, d: String): DataFrame =
    bm25Scores(s, d)
      .select(col("doc_id"), col("n_tokens"), col("n_hit"),
        rnd(col("s9").cast("double") / lit(1.0e9), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(TopK)

  /** HYBRID SEARCH via RECIPROCAL-RANK FUSION: the BM25 top-20 (lexical)
    * fused with the exact-cosine top-20 for query vector 0 (the corpus
    * shares one id space: doc_id = vec_id), rrf = sum over present
    * rankings of 1/(60 + rank). Both inputs are TakeOrderedAndProject
    * top-k; the rank windows run over the ALREADY-LIMITED 20-row frames
    * (single tiny partition by construction — never a corpus-wide
    * window), and the fusion itself is a 20x20-row full-outer join:
    * metadata-scale at any corpus size. Absent ranks emit -1 and
    * contribute 0.
    */
  private def hybridRrf(s: SparkSession, d: String): DataFrame = {
    // k-bounded frames: the rank windows run over ALREADY-LIMITED top-k
    // inputs, so the single partition is the point — the onePartition
    // idiom states that and keeps WindowExec's "moving all data to a
    // single partition" warning out of the logs (ADVICE r10: every such
    // warning must be a deliberate, bounded plan).
    val wLex = Window.partitionBy(WindowUtil.onePartition(col("doc_id")))
      .orderBy(col("score").desc, col("doc_id").asc)
    val lex = bm25(s, d)
      .withColumn("rank_lex", row_number().over(wLex))
      .select(col("doc_id").as("id"), col("rank_lex"))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val wVec = Window.partitionBy(WindowUtil.onePartition(col("vec_id")))
      .orderBy(col("score").desc, col("vec_id").asc)
    val vec = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        rnd(cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(TopK)
      .withColumn("rank_vec", row_number().over(wVec))
      .select(col("vec_id").as("id"), col("rank_vec"))
    def rrfTerm(rank: Column): Column =
      when(rank.isNotNull, lit(1.0) / (rank + lit(60)).cast("double"))
        .otherwise(lit(0.0))
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("rank_lex"), lit(-1)).as("rank_lex"),
        coalesce(col("rank_vec"), lit(-1)).as("rank_vec"),
        rnd(rrfTerm(col("rank_lex")) + rrfTerm(col("rank_vec")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(10)
  }

  /** DSIR-STYLE IMPORTANCE WEIGHTING — the data-selection step of
    * training-corpus assembly (Xie et al. 2023): score every document by
    * the mean per-token log-ratio of a TARGET-domain unigram LM (docs
    * from source 'src0', add-one smoothed over the corpus vocab) to the
    * corpus LM; positive means target-like, and the keep flag is the
    * importance-resampling selection at threshold 0. Both LMs share the
    * corpus vocabulary V, the standard add-one formulation. Per-token
    * contributions are differences of two floored nano-nat logs, so the
    * per-doc sum is exact BIGINT on both engines. Scale shape: one
    * token-count aggregation per LM (the target one is a filtered
    * subset), an equi-join of the exploded corpus against the count
    * tables, a per-doc agg — the [[TextQueries]] perplexity shape with a
    * second, smaller model table.
    */
  private val DsirTarget = graft.curation.CurationCore.DefaultDsirTarget
  private def dsir(s: SparkSession, d: String): DataFrame =
    graft.curation.CurationCore.dsirScoresOf(
        docs(s, d).select(col("doc_id"), col("source"), col("text")),
        "doc_id", DsirTarget)
      .select(col("doc_id"), col("n_tokens"),
        rnd(col("s9").cast("double") /
          (lit(1.0e9) * col("n_tokens").cast("double")), 6).as("logratio"),
        (col("s9") > 0).as("keep"))
      .orderBy(col("doc_id").asc)

  /** MMR DIVERSITY RERANK (maximal marginal relevance, lambda = 0.5):
    * greedily re-rank the cosine top-20 for query vec 0 so each pick
    * maximizes relevance MINUS its max similarity to the already-picked
    * set — the standard result-diversification step downstream of any
    * similarity search. The candidate generation is the distributed
    * top-k scan; the greedy itself runs on the DRIVER over the k-bounded
    * candidate rows (20 x 64 floats by construction — a reranker's input
    * is already k rows; same bounded-collect class as the nprobe
    * centroids). Determinism: relevance and pair similarities are
    * floored to integer micro-units first (the cosine fold is the
    * VecCosine arithmetic DuckDB's list_cosine_similarity matches
    * bitwise), so every comparison in the greedy — and the recursive-CTE
    * oracle replaying it — is exact integer arithmetic with a vec_id
    * tie-break.
    */
  private val MmrPool = 20
  private val MmrK = 10
  private def mmrRerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val cands: Array[(Long, Array[Float], Long)] = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        floor(cosineSim(col("embedding"), col("qvec")) * lit(1.0e6) + lit(0.5))
          .cast("long").as("rel_u"))
      .orderBy(col("rel_u").desc, col("vec_id").asc)
      .limit(MmrPool)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    // the VecCosine fold (dot / (sqrt(na) * sqrt(nb)), sequential), then
    // the shared micro-unit floor
    def cosU(a: Array[Float], b: Array[Float]): Long = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val sa = math.sqrt(na); val sb = math.sqrt(nb)
      val c = if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
      math.floor(c * 1.0e6 + 0.5).toLong
    }
    var selected = Vector.empty[(Long, Array[Float], Long, Long)]
    var rest = cands.toList
    while (selected.length < MmrK && rest.nonEmpty) {
      val pick = rest.map { case (id, v, rel) =>
        val ms = if (selected.isEmpty) 0L else selected.map(p => cosU(v, p._2)).max
        (id, v, rel, ms)
      }.minBy { case (id, _, rel, ms) => (-(rel - ms), id) }
      selected = selected :+ pick
      rest = rest.filterNot(_._1 == pick._1)
    }
    val rows = selected.zipWithIndex.map { case ((id, _, rel, ms), i) =>
      (i + 1, id, rel.toDouble / 1.0e6, ms.toDouble / 1.0e6, rel - ms)
    }
    rows.toDF("rank", "vec_id", "rel", "max_sim_sel", "obj_u")
      .select(col("rank").cast("int").as("rank"), col("vec_id"),
        col("rel"), col("max_sim_sel"), col("obj_u"))
      .orderBy(col("rank").asc)
  }

  /** LATE-INTERACTION (ColBERT-shape) MaxSim retrieval: the query is a
    * SET of vectors, a candidate is a SET of vectors (here vec_id % 100
    * buckets of 5 corpus embeddings stand in for a document's
    * token/chunk vectors), and score(candidate) = sum over query vectors
    * of the MAX cosine against the candidate's vectors. Per-pair cosines
    * drop to exact micro-units BEFORE the max/sum, so the ranking is
    * exact BIGINT on both engines.
    *
    * 100 TB shape: ONE corpus scan against the broadcast query set, two
    * partial-aggregating groupBys (max, then sum — both combine
    * map-side), and a k-bounded TakeOrdered; nothing is ever pairwise
    * across candidates. The bucketed corpus stands in for a multi-vector
    * table keyed by doc_id — the plan is unchanged when the bucket key
    * is a real document id.
    */
  private def maxSim(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    emb.crossJoin(broadcast(q))
      .select((col("vec_id") % 100).cast("int").as("grp"), col("qid"),
        floor(cosineSim(col("embedding"), col("qvec")) * lit(1000000.0)
          + lit(0.5)).cast("long").as("cu"))
      .groupBy(col("grp"), col("qid")).agg(max(col("cu")).as("mx"))
      .groupBy(col("grp")).agg(sum(col("mx")).as("score_u"))
      .orderBy(col("score_u").desc, col("grp").asc)
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bm25"       -> (bm25 _),
    "v_hybrid_rrf" -> (hybridRrf _),
    "v_mmr_rerank" -> (mmrRerank _),
    "v_maxsim"     -> (maxSim _),
    "d_dsir"       -> (dsir _),
  )

  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"
  private val termsSql = QueryTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  // the BM25 CTE chain shared by the t_bm25 oracle, the hybrid fusion's
  // lexical side, and the engine hybrid-verb replay (`EngineQueries`) —
  // same idf/tf_part association as [[graft.retrieval.RetrievalCore
  // .bm25ScoresOf]], token for token; parameterized over the (relation,
  // id column) pair exactly as the Scala side is
  private[queries] def bm25CtesFor(srcRel: String, idCol: String): String =
    s"""tk AS (SELECT $idCol, $toksSql AS tk FROM $srcRel),
       |dl AS (SELECT $idCol, CAST(len(tk) AS BIGINT) AS dl FROM tk),
       |st AS (SELECT CAST(SUM(dl) AS BIGINT) AS sdl, CAST(count(*) AS BIGINT) AS nd FROM dl),
       |tf AS (
       |  SELECT $idCol, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT $idCol, unnest(tk) AS term FROM tk)
       |  WHERE term IN $termsSql GROUP BY $idCol, term),
       |dfT AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |idf AS (
       |  SELECT term,
       |         CAST(floor(ln((CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |             / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000000.0) AS BIGINT) AS idf9
       |  FROM dfT, st),
       |sc AS (
       |  SELECT t.$idCol, max(d.dl) AS n_tokens,
       |         CAST(count(*) AS INTEGER) AS n_hit,
       |         CAST(SUM(CAST(floor(CAST(i.idf9 AS DOUBLE) *
       |           ((CAST(t.tf AS DOUBLE) * 2.2)
       |             / (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE)
       |                 / (CAST(st.sdl AS DOUBLE) / CAST(st.nd AS DOUBLE)))))) AS BIGINT))
       |           AS BIGINT) AS s9
       |  FROM tf t JOIN idf i USING (term) JOIN dl d USING ($idCol), st
       |  GROUP BY t.$idCol)""".stripMargin

  private val bm25Ctes = bm25CtesFor("documents", "doc_id")

  val oracles: Map[String, String] = Map(
    "v_maxsim" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS qid, emb AS qv FROM e WHERE vec_id < 3),
        |cu AS (
        |  SELECT CAST(e.vec_id % 100 AS INT) AS grp, q.qid,
        |         CAST(floor(list_cosine_similarity(e.emb, q.qv) * 1000000.0 + 0.5) AS BIGINT) AS cu
        |  FROM e, q),
        |mx AS (SELECT grp, qid, MAX(cu) AS mx FROM cu GROUP BY grp, qid)
        |SELECT grp, CAST(SUM(mx) AS BIGINT) AS score_u
        |FROM mx GROUP BY grp
        |ORDER BY score_u DESC, grp ASC LIMIT 10""".stripMargin,
    "t_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, n_tokens, n_hit,
         |       ${rndSql("CAST(s9 AS DOUBLE) / 1000000000.0", 6)} AS score
         |FROM sc ORDER BY score DESC, doc_id ASC LIMIT $TopK""".stripMargin,
    "v_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         |lex AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank_lex
         |  FROM (
         |    SELECT doc_id, ${rndSql("CAST(s9 AS DOUBLE) / 1000000000.0", 6)} AS score
         |    FROM sc ORDER BY score DESC, doc_id ASC LIMIT $TopK)),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |vec AS (
         |  SELECT vec_id, CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank_vec
         |  FROM (
         |    SELECT e.vec_id,
         |           ${rndSql("list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)", 6)} AS score
         |    FROM embeddings e, q WHERE e.vec_id <> 0
         |    ORDER BY score DESC, vec_id ASC LIMIT $TopK))
         |SELECT coalesce(l.doc_id, v.vec_id) AS doc_id,
         |       CAST(coalesce(l.rank_lex, -1) AS INTEGER) AS rank_lex,
         |       CAST(coalesce(v.rank_vec, -1) AS INTEGER) AS rank_vec,
         |       ${rndSql("coalesce(1.0 / CAST(l.rank_lex + 60 AS DOUBLE), 0.0) + coalesce(1.0 / CAST(v.rank_vec + 60 AS DOUBLE), 0.0)", 6)} AS rrf
         |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id
         |ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin,
    // v_mmr_rerank: the greedy replayed as a RECURSIVE CTE — the working
    // table holds exactly the previous pick, the LATERAL argmax re-scores
    // the remaining candidates against the accumulated id list, and every
    // comparison is the same floored micro-unit integer the Spark greedy
    // uses (the ms subquery sits in a derived table: DuckDB cannot ORDER
    // BY a subquery-bearing alias directly)
    "v_mmr_rerank" ->
      s"""WITH RECURSIVE
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |cand AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         |         CAST(floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)) * 1000000.0 + 0.5) AS BIGINT) AS rel_u
         |  FROM embeddings WHERE vec_id <> 0
         |  ORDER BY rel_u DESC, vec_id ASC LIMIT $MmrPool),
         |sims AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |         CAST(floor(list_cosine_similarity(a.emb, b.emb) * 1000000.0 + 0.5) AS BIGINT) AS sim_u
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |sel(rank, vec_id, rel_u, maxsim_u, ids) AS (
         |  SELECT 1, vec_id, rel_u, CAST(0 AS BIGINT), [vec_id]
         |  FROM (SELECT vec_id, rel_u FROM cand ORDER BY rel_u DESC, vec_id ASC LIMIT 1)
         |  UNION ALL
         |  SELECT s.rank + 1, p.vec_id, p.rel_u, p.ms, list_append(s.ids, p.vec_id)
         |  FROM sel s, LATERAL (
         |    SELECT vec_id, rel_u, ms FROM (
         |      SELECT c.vec_id, c.rel_u,
         |             (SELECT max(sim_u) FROM sims WHERE va = c.vec_id AND list_contains(s.ids, vb)) AS ms
         |      FROM cand c
         |      WHERE NOT list_contains(s.ids, c.vec_id)) t
         |    ORDER BY rel_u - ms DESC, vec_id ASC
         |    LIMIT 1) p
         |  WHERE s.rank < $MmrK)
         |SELECT CAST(rank AS INTEGER) AS rank, vec_id,
         |       CAST(rel_u AS DOUBLE) / 1000000.0 AS rel,
         |       CAST(maxsim_u AS DOUBLE) / 1000000.0 AS max_sim_sel,
         |       CAST(rel_u - maxsim_u AS BIGINT) AS obj_u
         |FROM sel ORDER BY rank ASC""".stripMargin,
    // d_dsir: both LMs replayed with the shared nano-nat floor guard; the
    // target LM's counts left-join onto the corpus postings
    "d_dsir" ->
      s"""WITH tk AS (SELECT doc_id, source, unnest($toksSql) AS tok FROM documents),
         |cc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cc FROM tk GROUP BY tok),
         |ct AS (SELECT tok, CAST(count(*) AS BIGINT) AS ct FROM tk
         |       WHERE source = '$DsirTarget' GROUP BY tok),
         |tot AS (SELECT CAST(SUM(cc) AS BIGINT) AS nc, CAST(count(*) AS BIGINT) AS v FROM cc),
         |tt AS (SELECT CAST(coalesce(SUM(ct), 0) AS BIGINT) AS nt FROM ct)
         |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
         |       ${rndSql(
             "CAST(SUM(c9) AS DOUBLE) / (1000000000.0 * count(*))", 6)} AS logratio,
         |       CAST(SUM(c9) AS BIGINT) > 0 AS keep
         |FROM (
         |  SELECT t.doc_id,
         |         CAST(floor(ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE)
         |             / CAST(nt + v AS DOUBLE)) * 1000000000.0) AS BIGINT)
         |         - CAST(floor(ln(CAST(cc + 1 AS DOUBLE)
         |             / CAST(nc + v AS DOUBLE)) * 1000000000.0) AS BIGINT) AS c9
         |  FROM tk t JOIN cc USING (tok) LEFT JOIN ct USING (tok), tot, tt)
         |GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin,
  )
}
