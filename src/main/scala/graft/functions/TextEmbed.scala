package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The deterministic hashed bag-of-tokens random-projection embedder —
  * ONE implementation shared by the query suite (`t_embed`,
  * `x_engine_embed_search`, which also replays it as DuckDB CTEs from
  * [[graft.queries.TextQueries.embedCtesSql]]) and the engine's
  * text-query verb ([[graft.engine.VectorEngine.searchText]]).
  *
  * token → md5 bucket (1024); ONE md5 of "e|<bucket>" yields all
  * [[EDim]]=16 projection weights (2 hex chars per dim, minus 128 →
  * integers in [-128, 127]); embedding[j] = Σ over tokens of
  * w(bucket, j). All-integer arithmetic, so DuckDB replays it
  * bit-for-bit AND the per-doc sums stay far inside float32's 2^24
  * exact-integer range — float-cast embeddings are exact too.
  *
  * 100 TB shape: the hashing trick means there is NO weight table to
  * train, broadcast, or join — embedding is per-row expression work
  * folded into the token scan plus one per-id agg; a trained projection
  * swaps the md5 weight expression for a broadcast row lookup in the
  * same plan shape. (Reference seam: the external sentence-transformer
  * it assumes at `settings.py:29-31` but never calls.)
  */
object TextEmbed {

  val EDim = 16

  /** (idCol, e0..e15) integer embeddings for an (idCol, text) frame.
    * Rows with zero tokens produce no output row (nothing to embed).
    */
  def embedded(df: DataFrame, idCol: String): DataFrame = {
    val bucket = conv(substring(md5(col("tok")), 1, 8), 16, 10)
      .cast("long") % 1024
    val dims = (0 until EDim).map { j =>
      sum(conv(substring(col("wh"), 2 * j + 1, 2), 16, 10).cast("long")
        - 128).as(s"e$j")
    }
    df.select(col(idCol), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col(idCol),
        md5(concat(lit("e|"), bucket.cast("string"))).as("wh"))
      .groupBy(col(idCol))
      .agg(dims.head, dims.tail: _*)
  }
}
