package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** BM25 + rank-fusion primitives shared by the documents-table retrieval
  * suite (`graft.queries.RetrievalQueries`) and the engine's hybrid-search
  * verb (`VectorEngine.hybridSearch`) — generic over an (idCol, text)
  * relation, the [[graft.curation.CurationCore]] discipline, so both
  * surfaces provably rank with the same arithmetic.
  *
  * Determinism: the Robertson idf is floored to an integer nano-nat and
  * each (doc, term) contribution is floor(idf9 * tf_part) — tf_part a
  * single-association double expression — so per-doc score sums are exact
  * long arithmetic on any engine (the suite-wide `ln` guard).
  */
object RetrievalCore {

  // k1 = 1.2, b = 0.75 — but the expression literals below are written
  // OUT (2.2, 1.2, 0.25, 0.75), never derived: `1.2 + 1.0` rounds to a
  // DIFFERENT double than the decimal literal `2.2` both engines parse,
  // and the oracle SQL carries the literals verbatim
  val RrfK = 60

  /** BM25 scoring frame over any (idCol, text) relation:
    * (idCol, n_tokens, n_hit, s9) for docs containing >= 1 query term.
    * Scale shape: two keyed aggregations over the query-term-filtered
    * postings with the |terms|-row idf table and the 2-value corpus
    * stats broadcast; the per-doc-length side is left unhinted so the
    * optimizer broadcasts it only while it fits.
    */
  def bm25ScoresOf(df: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val qTerms = terms.distinct
    val tk = df.select(col(idCol), tokens(col("text")).as("tk"))
    val dl = tk.select(col(idCol), size(col("tk")).cast("long").as("dl"))
    val st = dl.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("nd"))
    val tf = tk.select(col(idCol), explode(col("tk")).as("term"))
      .filter(col("term").isInCollection(qTerms))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = dfT.crossJoin(broadcast(st))
      .select(col("term"),
        floor(log((col("nd").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1.0e9))
          .cast("long").as("idf9"))
    val tfd = col("tf").cast("double")
    val avgdl = col("sdl").cast("double") / col("nd").cast("double")
    val tfPart = (tfd * lit(2.2)) /
      (tfd + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(idf), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(st))
      .select(col(idCol), col("dl"),
        floor(col("idf9").cast("double") * tfPart).cast("long").as("c9"))
      .groupBy(col(idCol))
      .agg(max(col("dl")).as("n_tokens"),
        count(lit(1)).cast("int").as("n_hit"),
        sum(col("c9")).as("s9"))
  }

  /** One ranking's reciprocal-rank contribution: 1/(RrfK + rank) when
    * present, 0 when the null-padded outer join left the rank absent.
    */
  def rrfTerm(rank: Column): Column =
    when(rank.isNotNull, lit(1.0) / (rank + lit(RrfK)).cast("double"))
      .otherwise(lit(0.0))

  /** The shared floor-formulation 6-dp rounding (`graft.queries.Det`'s
    * pair), exposed here so the engine verb rounds identically without an
    * engine -> queries dependency.
    */
  def rnd6(c: Column): Column = floor(c * 1.0e6 + 0.5) / 1.0e6
}
